"""Wan2.2 video inpainting with the high/low-noise expert pair
(reference example_workflows/video_Inpaint.json and README.md:205-268:
t2v 14B fp8_scaled, 2 think-steps, partial-frame masks)."""

import jax.numpy as jnp
import numpy as np

from common import example_argparser, report
from lanpaint_tpu import ksampler
from lanpaint_tpu.models.load import import_wan, load_safetensors
from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WAN22_T2V_14B_CONFIG
from lanpaint_tpu.models.zoo import build_tiny_wan, build_wan, switching_denoiser


def main():
    p = example_argparser("Wan2.2 video LanPaint inpainting")
    p.add_argument("--checkpoint-low", default=None,
                   help="low-noise expert (fp8_scaled safetensors)")
    p.add_argument("--frames", type=int, default=4)
    args = p.parse_args()

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
