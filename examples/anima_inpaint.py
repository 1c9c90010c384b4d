"""Anima inpainting (reference README.md:272-286, workflow embedded in
examples/Example_26/InPainted_Drag_Me_to_ComfyUI.png: anima-preview3-base,
Qwen3-0.6B text features, Qwen-Image VAE; er_sde/simple, 30 steps, cfg 5,
5 think-steps).

ANIMA_CONFIG is a structural stand-in on the generic MMDiT — the encoder
width (1024) and VAE pairing are workflow-pinned facts, the DiT topology is
not retrievable offline (docs/family_facts.md)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.dit import ANIMA_CONFIG, TINY_DIT_CONFIG
from lanpaint_tpu.models.load import import_dit_guarded, load_safetensors
from lanpaint_tpu.models.zoo import build_anima, build_tiny_dit


def main():
    args = example_argparser("Anima LanPaint inpainting").parse_args()
    if args.checkpoint:
        cfg = ANIMA_CONFIG
        params = import_dit_guarded(load_safetensors(args.checkpoint), cfg,
                                    family="anima")
        model, _ = build_anima(params)
        b, hw = 1, 128
        cond = {"context": jnp.zeros((b, 256, cfg.context_dim), jnp.float32)}
    else:
        model, _ = build_tiny_dit()
        cfg = TINY_DIT_CONFIG
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}

    latent = jnp.zeros((b, cfg.latent_channels, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)

    out = ksampler(
        model, seed=args.seed, steps=30, cfg=5.0, sampler_name="er_sde",
        scheduler="simple", positive=cond, latent=latent, mask=mask,
        num_steps=5,
    )
    report("anima_inpaint", out)


if __name__ == "__main__":
    main()
