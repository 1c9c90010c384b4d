"""Flux-dev inpainting (reference example_workflows/Flux_Inpaint.json:
5 think-steps; FLUX rule forces cfg_big = 1.0)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.dit import FLUX_DEV_CONFIG, TINY_DIT_CONFIG
from lanpaint_tpu.models.load import import_dit, load_safetensors
from lanpaint_tpu.models.zoo import build_dit, build_tiny_dit


def main():
    args = example_argparser("Flux LanPaint inpainting").parse_args()
    if args.checkpoint:
        params = import_dit(load_safetensors(args.checkpoint), FLUX_DEV_CONFIG)
        model, _ = build_dit(FLUX_DEV_CONFIG, params, shift=1.15, is_flux=True,
                             name="flux-dev")
        b, c, hw = 1, 16, 128
        cond = {
            "context": jnp.zeros((b, 512, 4096), jnp.float32),  # T5
            "vec": jnp.zeros((b, 768), jnp.float32),            # pooled CLIP
            "guidance": jnp.full((b,), 3.5, jnp.float32),
        }
    else:
        model, _ = build_tiny_dit()
        b, c, hw = 1, TINY_DIT_CONFIG.latent_channels, 16
        cond = {"context": jnp.zeros((b, 8, TINY_DIT_CONFIG.context_dim),
                                     jnp.float32),
                "vec": jnp.zeros((b, TINY_DIT_CONFIG.vec_dim), jnp.float32)}

    latent = jnp.zeros((b, c, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)

    out = ksampler(
        model, seed=args.seed, steps=args.steps, cfg=1.0,
        sampler_name="euler", scheduler="simple", positive=cond,
        latent=latent, mask=mask, num_steps=args.think_steps,
    )
    report("flux_inpaint", out)


if __name__ == "__main__":
    main()
