"""HiDream-I1 inpainting (reference supported-model matrix README.md:131-139;
MoE-MMDiT with per-block Llama text injection; standard LanPaint defaults)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.hidream import HIDREAM_I1_CONFIG, TINY_HIDREAM_CONFIG
from lanpaint_tpu.models.load import import_hidream, load_safetensors
from lanpaint_tpu.models.zoo import build_hidream, build_tiny_hidream


def main():
    args = example_argparser("HiDream LanPaint inpainting").parse_args()
    if args.checkpoint:
        cfg = HIDREAM_I1_CONFIG
        params = import_hidream(load_safetensors(args.checkpoint), cfg)
        model, _ = build_hidream(cfg, params, name="hidream")
        b, hw = 1, 128
        cond = {
            "context": jnp.zeros((b, 128, cfg.context_dim), jnp.float32),
            "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32),
            # per-layer Llama-3.1 hidden states: (L, B, S, llama_dim)
            "llama": jnp.zeros((32, b, 128, cfg.llama_dim), jnp.float32),
        }
    else:
        model, _ = build_tiny_hidream()
        cfg = TINY_HIDREAM_CONFIG
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32),
                "llama": jnp.zeros((2, b, 4, cfg.llama_dim), jnp.float32)}

    latent = jnp.zeros((b, cfg.latent_channels, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)

    out = ksampler(
        model, seed=args.seed, steps=args.steps, cfg=1.0,
        sampler_name="euler", scheduler="simple", positive=cond,
        latent=latent, mask=mask, num_steps=args.think_steps,
    )
    report("hidream_inpaint", out)


if __name__ == "__main__":
    main()
