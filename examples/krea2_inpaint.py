"""Krea2 (FLUX.1-Krea) inpainting (reference example_workflows/
Krea2_LanPaint_Inpaint.json: 8 steps, cfg 1, euler/simple, 5 think-steps;
Krea shares the flux-dev topology/keys)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.dit import KREA_CONFIG, TINY_DIT_CONFIG
from lanpaint_tpu.models.load import import_dit, load_safetensors
from lanpaint_tpu.models.zoo import build_dit, build_tiny_dit


def main():
    args = example_argparser("Krea2 LanPaint inpainting").parse_args()
    if args.checkpoint:
        cfg = KREA_CONFIG
        params = import_dit(load_safetensors(args.checkpoint), cfg)
        model, _ = build_dit(cfg, params, shift=1.15, is_flux=True,
                             name="krea2")
        b, hw = 1, 128
        cond = {"context": jnp.zeros((b, 512, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}
    else:
        model, _ = build_tiny_dit()
        cfg = TINY_DIT_CONFIG
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}

    latent = jnp.zeros((b, cfg.latent_channels, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)

    out = ksampler(
        model, seed=args.seed, steps=8, cfg=1.0, sampler_name="euler",
        scheduler="simple", positive=cond, latent=latent, mask=mask,
        num_steps=5,
    )
    report("krea2_inpaint", out)


if __name__ == "__main__":
    main()
