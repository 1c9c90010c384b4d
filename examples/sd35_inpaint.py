"""SD3.5-Large inpainting (reference supported-model matrix README.md:131-139;
standard LanPaint KSampler defaults: 5 think-steps, euler/simple)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.load import import_sd3, load_safetensors
from lanpaint_tpu.models.sd3 import SD35_LARGE_CONFIG, TINY_SD3_CONFIG
from lanpaint_tpu.models.zoo import build_sd3, build_tiny_sd3


def main():
    args = example_argparser("SD3.5 LanPaint inpainting").parse_args()
    if args.checkpoint:
        cfg = SD35_LARGE_CONFIG
        params = import_sd3(load_safetensors(args.checkpoint), cfg)
        model, _ = build_sd3(cfg, params, name="sd3.5-large")
        b, hw = 1, 128  # 1024x1024 pixels
        cond = {
            # plug in real T5+CLIP sequence features / pooled CLIP here
            "context": jnp.zeros((b, 154, cfg.context_dim), jnp.float32),
            "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32),
        }
    else:
        model, _ = build_tiny_sd3()
        cfg = TINY_SD3_CONFIG
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}

    latent = jnp.zeros((b, cfg.in_channels, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)

    out = ksampler(
        model, seed=args.seed, steps=args.steps, cfg=4.5,
        sampler_name="euler", scheduler="simple", positive=cond,
        latent=latent, mask=mask, num_steps=args.think_steps,
    )
    report("sd35_inpaint", out)


if __name__ == "__main__":
    main()
