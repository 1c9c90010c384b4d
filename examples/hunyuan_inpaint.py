"""HunyuanImage inpainting (reference example_workflows/Hunyuan_Inpaint.json:
20 steps, cfg 1, euler/simple, 5 think-steps)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.dit import HUNYUAN_IMAGE_CONFIG, TINY_DIT_CONFIG
from lanpaint_tpu.models.load import import_dit, load_safetensors
from lanpaint_tpu.models.zoo import build_hunyuan_image, build_tiny_dit


def main():
    args = example_argparser("HunyuanImage LanPaint inpainting").parse_args()
    if args.checkpoint:
        cfg = HUNYUAN_IMAGE_CONFIG
        params = import_dit(load_safetensors(args.checkpoint), cfg)
        model, _ = build_hunyuan_image(params)
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
        model, seed=args.seed, steps=20, cfg=1.0, sampler_name="euler",
        scheduler="simple", positive=cond, latent=latent, mask=mask,
        num_steps=5,
    )
    report("hunyuan_inpaint", out)


if __name__ == "__main__":
    main()
