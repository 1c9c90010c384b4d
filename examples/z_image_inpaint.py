"""Z-Image inpainting (reference example_workflows/Z_image_Inpaint.json:
9 steps, cfg 1, euler/simple, 5 think-steps; --base switches to the
Z_image_base_Inpaint.json advanced variant: 20 steps, cfg 4, 3 think-steps,
lambda 8, step-size 0.05, friction 25)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import ksampler, ksampler_advanced
from lanpaint_tpu.models.dit import TINY_DIT_CONFIG, Z_IMAGE_CONFIG
from lanpaint_tpu.models.load import import_dit, load_safetensors
from lanpaint_tpu.models.zoo import build_dit, build_tiny_dit


def main():
    p = example_argparser("Z-Image LanPaint inpainting")
    p.add_argument("--base", action="store_true",
                   help="Z-image-base advanced-knob variant")
    args = p.parse_args()
    if args.checkpoint:
        cfg = Z_IMAGE_CONFIG
        params = import_dit(load_safetensors(args.checkpoint), cfg)
        model, _ = build_dit(cfg, params, shift=3.0, is_flux=False,
                             name="z-image")
        b, hw = 1, 128
        cond = {"context": jnp.zeros((b, 77, cfg.context_dim), jnp.float32)}
    else:
        model, _ = build_tiny_dit()
        cfg = TINY_DIT_CONFIG
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}

    latent = jnp.zeros((b, cfg.latent_channels, hw, hw), jnp.float32)
    mask = center_square_mask(hw * 8, hw * 8)

    if args.base:
        out = ksampler_advanced(
            model, noise_seed=args.seed, steps=20, cfg=4.0,
            sampler_name="euler", scheduler="simple", positive=cond,
            latent=latent, mask=mask, num_steps=3, lamb=8.0, step_size=0.05,
            friction=25.0)
    else:
        out = ksampler(
            model, seed=args.seed, steps=9, cfg=1.0, sampler_name="euler",
            scheduler="simple", positive=cond, latent=latent, mask=mask,
            num_steps=5)
    report("z_image_inpaint", out)


if __name__ == "__main__":
    main()
