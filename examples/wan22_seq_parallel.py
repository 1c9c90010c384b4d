"""Wan2.2 81-frame-scale video inpainting over a multi-chip mesh: ring
attention on the frame axis + Megatron tensor parallelism in one shard_map
program (reference README.md:240-260 runs 81 frames on one 96 GB GPU in
~14-16 min; the TPU build spreads both compute and weights over ICI).

Run on real hardware with a pod slice, or simulate:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/wan22_seq_parallel.py --frames 8
"""

import jax
import jax.numpy as jnp
import numpy as np

from common import example_argparser, report
from lanpaint_tpu import LanPaintConfig, LanPaintSampler
from lanpaint_tpu.models.load import import_wan, load_safetensors
from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WAN22_T2V_14B_CONFIG
from lanpaint_tpu.models.zoo import build_tiny_wan, build_wan_seq_parallel
from lanpaint_tpu.parallel import MeshSpec, make_mesh
from lanpaint_tpu.sigmas import calculate_sigmas


def main():
    p = example_argparser("Wan2.2 sequence-parallel video inpainting")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--seq", type=int, default=0,
                   help="seq-axis size (default: all devices)")
    p.add_argument("--tensor", type=int, default=1,
                   help="tensor-parallel axis size (weights sharded)")
    args = p.parse_args()

    n = jax.device_count()
    seq = args.seq or (n // args.tensor)
    mesh = make_mesh(MeshSpec(data=n // (seq * args.tensor), seq=seq,
                              tensor=args.tensor))
    print(f"mesh: {dict(mesh.shape)} over {n} devices")

    if args.checkpoint:
        cfgm = WAN22_T2V_14B_CONFIG
        params = import_wan(load_safetensors(args.checkpoint), cfgm)
        c, hw, ctx_d = 16, 60, 4096
    else:
        cfgm = TINY_WAN_CONFIG
        _, params = build_tiny_wan(seed=0)
        c, hw, ctx_d = cfgm.in_channels, 16, cfgm.context_dim

    model, _ = build_wan_seq_parallel(
        cfgm, params, mesh,
        tp_axis="tensor" if args.tensor > 1 else None)

    b, f = 1, args.frames
    latent = jnp.zeros((b, c, f, hw, hw), jnp.float32)
    mask = np.zeros((b, c, f, hw, hw), np.float32)
    mask[:, :, f // 2:] = 1.0  # repaint the second half of the frames
    cond = {"context": jnp.zeros((b, 8, ctx_d), jnp.float32)}
    sigmas = jnp.asarray(calculate_sigmas(model.sigma_table, "simple",
                                          args.steps))

    sam = LanPaintSampler(model, config=LanPaintConfig(n_steps=2),
                          sampler_name="euler", cfg=1.0)
    with mesh:
        out, _ = sam(latent=latent, sigmas=sigmas, cond=cond,
                     mask=jnp.asarray(mask), seed=args.seed)
        out.block_until_ready()
    report("wan22_seq_parallel", out)


if __name__ == "__main__":
    main()
