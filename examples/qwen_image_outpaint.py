"""Qwen-Image outpainting (reference example_workflows/
Qwen_Image_Outpaint.json: 20 steps, cfg 4, euler/simple, 5 think-steps;
border mask = outpaint)."""

import jax.numpy as jnp

from common import example_argparser, outpaint_mask, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.dit import QWEN_IMAGE_CONFIG, TINY_DIT_CONFIG
from lanpaint_tpu.models.load import import_mmdit_auto, load_safetensors
from lanpaint_tpu.models.zoo import build_dit, build_tiny_dit


def main():
    args = example_argparser("Qwen-Image LanPaint outpainting").parse_args()
    if args.checkpoint:
        cfg = QWEN_IMAGE_CONFIG
        params = import_mmdit_auto(load_safetensors(args.checkpoint), cfg)
        model, _ = build_dit(cfg, params, shift=2.2, is_flux=False,
                             name="qwen-image")
        b, hw = 1, 128
        cond = {"context": jnp.zeros((b, 256, cfg.context_dim), jnp.float32)}
    else:
        model, _ = build_tiny_dit()
        cfg = TINY_DIT_CONFIG
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}

    latent = jnp.zeros((b, cfg.latent_channels, hw, hw), jnp.float32)
    mask = outpaint_mask(hw * 8, hw * 8)

    out = ksampler(
        model, seed=args.seed, steps=20, cfg=4.0, sampler_name="euler",
        scheduler="simple", positive=cond, latent=latent, mask=mask,
        num_steps=5,
    )
    report("qwen_image_outpaint", out)


if __name__ == "__main__":
    main()
