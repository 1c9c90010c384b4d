"""Flux2-Klein inpainting (reference example_workflows/
Flux2_Klein_inpainting.json: LanPaint_SamplerCustomAdvanced with 2
think-steps, lambda 8, step-size 0.2, CFGGuider cfg 5, euler, 20 steps)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import sample_custom_advanced
from lanpaint_tpu.models.dit import FLUX2_DEV_CONFIG, TINY_DIT_CONFIG
from lanpaint_tpu.models.load import import_dit, load_safetensors
from lanpaint_tpu.models.zoo import build_dit, build_tiny_dit
from lanpaint_tpu.sigmas import calculate_sigmas


def main():
    args = example_argparser("Flux2-Klein LanPaint inpainting").parse_args()
    if args.checkpoint:
        cfg = FLUX2_DEV_CONFIG  # Klein is the distilled Flux.2 topology
        params = import_dit(load_safetensors(args.checkpoint), cfg)
        model, _ = build_dit(cfg, params, shift=1.15, is_flux=True,
                             name="flux2-klein")
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
    sigmas = jnp.asarray(
        calculate_sigmas(model.sigma_table, "simple", args.steps))

    out, denoised = sample_custom_advanced(
        model, noise_seed=args.seed, cfg=5.0, positive=cond,
        sampler_name="euler", sigmas=sigmas, latent=latent, mask=mask,
        num_steps=2, lamb=8.0, step_size=0.2,
    )
    report("flux2_klein_inpaint", out)


if __name__ == "__main__":
    main()
