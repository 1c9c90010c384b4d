"""Wan2.2 video inpainting with the high/low-noise expert pair
(reference example_workflows/video_Inpaint.json and README.md:205-268:
t2v 14B fp8_scaled, 2 think-steps, partial-frame masks).

--pixel runs the full pixel-level path instead (Wan2.2 48-ch VAE encode ->
LanPaint -> decode -> per-frame MaskBlend), the TI2V-5B-style deployment;
pass --vae wan2.2_vae.safetensors with a real checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np

from common import example_argparser, report
from lanpaint_tpu import inpaint_video, ksampler
from lanpaint_tpu.models.load import import_wan, load_safetensors
from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WAN22_T2V_14B_CONFIG
from lanpaint_tpu.models.zoo import build_tiny_wan, build_wan, switching_denoiser


def run_pixel(args):
    """Pixel video -> Wan2.2 VAE latents -> LanPaint -> pixels."""
    import dataclasses

    from lanpaint_tpu.models.load import import_wan_vae
    from lanpaint_tpu.models.video_vae import (
        TINY_WAN22_VAE_CONFIG, WAN22_VAE_CONFIG, WanVAE,
    )

    if getattr(args, "vae", None):
        vae_cfg = WAN22_VAE_CONFIG
        vae = WanVAE(vae_cfg)
        vae_params = import_wan_vae(load_safetensors(args.vae), vae_cfg)
        den, _ = build_wan(WAN22_T2V_14B_CONFIG,
                           import_wan(load_safetensors(args.checkpoint),
                                      WAN22_T2V_14B_CONFIG),
                           shift=5.0, name="wan22-pixel")
        t, hw = 1 + 4 * ((args.frames - 1) // 4), 256
    else:
        vae_cfg = TINY_WAN22_VAE_CONFIG
        vae = WanVAE(vae_cfg)
        video0 = jnp.zeros((1, 3, 5, 32, 32), jnp.float32)
        vae_params = vae.init(jax.random.PRNGKey(0), video0)
        wan_cfg = dataclasses.replace(TINY_WAN_CONFIG,
                                      in_channels=vae_cfg.z_channels,
                                      out_channels=vae_cfg.z_channels)
        den, _ = build_wan(wan_cfg, name="wan22-pixel-tiny")
        t, hw = 5, 32
    video = jnp.tanh(jax.random.normal(jax.random.PRNGKey(1),
                                       (1, 3, t, hw, hw), jnp.float32))
    mask = np.zeros((hw, hw), np.float32)
    mask[hw // 4: 3 * hw // 4, hw // 4: 3 * hw // 4] = 1.0
    ctx_d = (4096 if getattr(args, "vae", None)
             else TINY_WAN_CONFIG.context_dim)
    cond = {"context": jnp.zeros((1, 8, ctx_d), jnp.float32)}
    out = inpaint_video(
        den, vae, vae_params, video=video, mask=jnp.asarray(mask),
        positive=cond, seed=args.seed, steps=args.steps, cfg=1.0,
        num_steps=2, blend_overlap=5)
    report("wan22_video_inpaint_pixel", out)


def main():
    p = example_argparser("Wan2.2 video LanPaint inpainting")
    p.add_argument("--checkpoint-low", default=None,
                   help="low-noise expert (fp8_scaled safetensors)")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--pixel", action="store_true",
                   help="pixel-level path through the Wan2.2 VAE")
    p.add_argument("--vae", default=None,
                   help="wan2.2_vae.safetensors (with --pixel + --checkpoint)")
    args = p.parse_args()

    if args.pixel:
        run_pixel(args)
        return

    if args.checkpoint:
        cfgm = WAN22_T2V_14B_CONFIG
        high, _ = build_wan(cfgm, import_wan(load_safetensors(args.checkpoint), cfgm),
                            shift=5.0, name="wan22-high")
        low, _ = build_wan(cfgm, import_wan(load_safetensors(args.checkpoint_low), cfgm),
                           shift=5.0, name="wan22-low")
        model = switching_denoiser(high, low, boundary=0.875)
        b, c, f, hw, ctx_d = 1, 16, args.frames, 60, 4096
    else:
        high, _ = build_tiny_wan(seed=0)
        low, _ = build_tiny_wan(seed=1)
        model = switching_denoiser(high, low, boundary=0.875)
        b, c, f, hw, ctx_d = 1, TINY_WAN_CONFIG.in_channels, args.frames, 16, \
            TINY_WAN_CONFIG.context_dim

    latent = jnp.zeros((b, c, f, hw, hw), jnp.float32)
    # frame-stack mask: repaint the second half of the frames
    mask = np.zeros((f, 1, hw * 8, hw * 8), np.float32)
    mask[f // 2:] = 1.0
    cond = {"context": jnp.zeros((b, 8, ctx_d), jnp.float32)}

    out = ksampler(
        model, seed=args.seed, steps=args.steps, cfg=1.0,
        sampler_name="euler", scheduler="simple", positive=cond,
        latent=latent, mask=jnp.asarray(mask), num_steps=2, video=True,
        # long-video runs must bound single-execution device time
        # (docs/serving.md "Chunked launches"; 81-frame measured 139 s
        # at chunk_steps=4 on one v5e chip)
        chunk_steps=4 if args.checkpoint else None,
    )
    report("wan22_video_inpaint", out)


if __name__ == "__main__":
    main()
