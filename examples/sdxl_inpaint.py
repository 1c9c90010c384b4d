"""SDXL inpainting (reference example_workflows/SDXL_Inpaint.json:
5 think-steps, euler/karras, cfg 5)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.load import import_unet, load_safetensors
from lanpaint_tpu.models.unet import SDXL_CONFIG, TINY_UNET_CONFIG, sdxl_pooled_y
from lanpaint_tpu.models.zoo import build_tiny_unet, build_unet


def main():
    args = example_argparser("SDXL LanPaint inpainting").parse_args()
    if args.checkpoint:
        params = import_unet(load_safetensors(args.checkpoint), SDXL_CONFIG)
        model, _ = build_unet(SDXL_CONFIG, params, name="sdxl")
        b, hw, ctx_d = 1, 128, 2048  # 1024x1024 pixels
        cond = {
            # plug in real CLIP-G/CLIP-L embeddings here
            "context": jnp.zeros((b, 77, ctx_d), jnp.float32),
            "y": sdxl_pooled_y(jnp.zeros((b, 1280), jnp.float32), 1024, 1024),
        }
    else:
        model, _ = build_tiny_unet()
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, TINY_UNET_CONFIG.context_dim),
                                     jnp.float32)}

    latent = jnp.zeros((b, 4, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)

    out = ksampler(
        model, seed=args.seed, steps=args.steps, cfg=5.0,
        sampler_name="euler", scheduler="karras", positive=cond,
        latent=latent, mask=mask, num_steps=args.think_steps,
    )
    report("sdxl_inpaint", out)


if __name__ == "__main__":
    main()
