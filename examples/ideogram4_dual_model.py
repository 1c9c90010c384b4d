"""Ideogram4-style dual-model inpainting (reference example_workflows/
Ideogram4_LanPaint_Inpaint.json: DualModelGuider cfg 4 switching experts at
half the schedule, Ideogram4Scheduler 20 steps, euler,
LanPaint_SamplerCustomAdvanced with 5 think-steps / lambda 16 / step 0.2).

The DualModelGuider pattern is the same timestep-switched two-expert
denoiser used by the Wan2.2 high/low pair: `switching_denoiser` under jit
runs only the active expert per step (`lax.cond`)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import sample_custom_advanced
from lanpaint_tpu.models.zoo import build_tiny_dit, switching_denoiser
from lanpaint_tpu.sigmas import calculate_sigmas


def main():
    p = example_argparser("Ideogram4-style dual-model LanPaint inpainting")
    p.add_argument("--switch-at", type=float, default=0.5,
                   help="flow-time boundary between the two experts")
    args = p.parse_args()

    # two experts (plug real checkpoints into the same pattern)
    high, _ = build_tiny_dit(seed=0)
    low, _ = build_tiny_dit(seed=1)
    model = switching_denoiser(high, low, boundary=args.switch_at,
                               name="ideogram4-dual")
    cfg_latent = high.latent_channels
    b, hw = 1, 16
    cond = {"context": jnp.zeros((b, 8, 32), jnp.float32),
            "vec": jnp.zeros((b, 16), jnp.float32)}

    latent = jnp.zeros((b, cfg_latent, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)
    sigmas = jnp.asarray(calculate_sigmas(model.sigma_table, "simple", 20))

    out, denoised = sample_custom_advanced(
        model, noise_seed=args.seed, cfg=4.0, positive=cond,
        sampler_name="euler", sigmas=sigmas, latent=latent, mask=mask,
        num_steps=5, lamb=16.0, step_size=0.2,
    )
    report("ideogram4_dual_model", out)


if __name__ == "__main__":
    main()
