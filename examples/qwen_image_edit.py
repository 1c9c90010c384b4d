"""Qwen-Image-Edit masked edit with reference-latent conditioning
(reference example_workflows/Qwen_Image_Edit_2509.json: custom-sampler path,
reference latents appended as extra image tokens)."""

import jax.numpy as jnp

from common import example_argparser, outpaint_mask, report
from lanpaint_tpu import sample_custom_advanced
from lanpaint_tpu.models.dit import QWEN_IMAGE_CONFIG, TINY_DIT_CONFIG, pack_latent
from lanpaint_tpu.models.load import import_dit, load_safetensors
from lanpaint_tpu.models.zoo import build_dit, build_tiny_dit
from lanpaint_tpu.sigmas import calculate_sigmas


def main():
    args = example_argparser("Qwen-Image-Edit LanPaint").parse_args()
    if args.checkpoint:
        params = import_dit(load_safetensors(args.checkpoint), QWEN_IMAGE_CONFIG)
        model, _ = build_dit(QWEN_IMAGE_CONFIG, params, shift=2.2,
                             is_flux=False, name="qwen-image")
        b, c, hw, ctx_d = 1, 16, 128, 3584
    else:
        model, _ = build_tiny_dit()
        b, c, hw, ctx_d = 1, TINY_DIT_CONFIG.latent_channels, 16, \
            TINY_DIT_CONFIG.context_dim

    latent = jnp.zeros((b, c, hw, hw), jnp.float32)
    # the edit source image enters as reference tokens (packed latent space)
    ref_latent = jnp.ones((b, c, hw, hw), jnp.float32) * 0.1
    cond = {
        "context": jnp.zeros((b, 8, ctx_d), jnp.float32),
        "ref_tokens": pack_latent(ref_latent, 2),
    }
    if model.name == "tiny-dit":
        cond["vec"] = jnp.zeros((b, TINY_DIT_CONFIG.vec_dim), jnp.float32)

    sigmas = jnp.asarray(calculate_sigmas(model.sigma_table, "simple", args.steps))
    out, denoised = sample_custom_advanced(
        model, noise_seed=args.seed, cfg=1.0, positive=cond,
        sampler_name="euler", sigmas=sigmas, latent=latent,
        mask=outpaint_mask(hw * 8, hw * 8), num_steps=args.think_steps,
    )
    report("qwen_image_edit", out)


if __name__ == "__main__":
    main()
