"""True per-forward FLOP counts via XLA cost analysis (scan-unrolled).

XLA's `compiled.cost_analysis()` counts a while/scan body ONCE regardless
of trip count (verified on a synthetic `lax.scan`: an 8-iteration scanned
matmul reports ~1 body's flops).  Every scanned-depth model therefore
needs its depth scans UNROLLED before cost analysis or the number drops
(depth-1)/depth of the transformer work — the r2-r4 SDXL constant 2.605
TFLOP was exactly that artifact; the true number is 6.310 TFLOP.

This script reproduces the vendored constants:
* SDXL (bench.SDXL_FWD_TFLOPS_B1): full forward at the 1024px headline
  shape with LANPAINT_DEPTH_UNROLL >= 10 so SpatialTransformer's nn.scan
  fully unrolls (layers.py DEPTH_SCAN_UNROLL).
* Wan (bench.wan_forward_tflops): the ANALYTIC formula is validated here
  against a single unrolled WanBlock + the extras, since WanModel's depth
  scan has no unroll flag (depth is the only multiplier).

Run CPU-only:  JAX_PLATFORMS=cpu LANPAINT_DEPTH_UNROLL=10 \
               python scripts/model_flops.py [--skip-sdxl]
(SDXL full-unroll lower+compile is ~5 min on the 1-CPU host.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp


def _flops(compiled) -> float:
    c = compiled.cost_analysis()
    c = c if isinstance(c, dict) else c[0]
    return float(c["flops"])


def sdxl_flops() -> float:
    from lanpaint_tpu.models import layers
    from lanpaint_tpu.models.unet import SDXL_CONFIG
    from lanpaint_tpu.models.zoo import build_unet

    assert layers.DEPTH_SCAN_UNROLL >= 10, (
        "set LANPAINT_DEPTH_UNROLL=10 (or more) BEFORE running: with the "
        "depth scans rolled, cost analysis counts each stack body once and "
        "the result is the old 2.605 artifact")
    den, params = build_unet(SDXL_CONFIG, init_hw=32, name="sdxl")
    x = jnp.zeros((1, 4, 128, 128), jnp.float32)
    t = jnp.full((1,), 0.5)
    cond = {"context": jnp.zeros((1, 77, 2048), jnp.float32),
            "y": jnp.zeros((1, 2816), jnp.float32)}
    if den.precompute is not None:
        cond = den.precompute(params, cond)
    fn = jax.jit(lambda p, xx, cc: den.raw_apply(p, xx, t, cc))
    t0 = time.time()
    comp = fn.lower(params, x, cond).compile()
    print(f"sdxl lower+compile {time.time() - t0:.0f}s", file=sys.stderr)
    return _flops(comp) / 1e12


def wan_block_check() -> None:
    """Validate bench.wan_forward_tflops against one unrolled WanBlock."""
    import dataclasses

    import importlib.util

    import numpy as np

    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WanBlock

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # GEMM-dominated tiny config (h=256) so pointwise/norm flops the
    # analytic model ignores stay small
    cfg = dataclasses.replace(TINY_WAN_CONFIG, hidden=256, num_heads=4,
                              ffn_dim=1024, context_dim=128,
                              axes_dim=(32, 16, 16))
    s_tokens, lt = 1024, 64
    blk = WanBlock(cfg)
    x = jnp.zeros((1, s_tokens, cfg.hidden), jnp.bfloat16)
    e = jnp.zeros((1, 6, cfg.hidden), jnp.float32)
    ctx = jnp.zeros((1, lt, cfg.hidden), jnp.bfloat16)
    from lanpaint_tpu.models.layers import rope_freqs
    from lanpaint_tpu.models.wan import video_ids

    pe = rope_freqs(video_ids(1, 4, 16, 16), cfg.axes_dim)
    params = blk.init(jax.random.PRNGKey(0), x, e, ctx, pe)
    fn = jax.jit(lambda p: blk.apply(p, x, e, ctx, pe))
    xla = _flops(fn.lower(params).compile())
    # analytic per-block share: total(depth=1) minus extras, +cross-kv
    # (the block projects k/v itself when no kv_pre is passed)
    h, f = cfg.hidden, cfg.ffn_dim
    analytic = (8 * s_tokens * h * h + 4 * s_tokens * s_tokens * h
                + 4 * s_tokens * h * h + 4 * s_tokens * lt * h
                + 4 * s_tokens * h * f + 4 * lt * h * h)
    ratio = analytic / xla
    print(f"wan block: xla {xla / 1e9:.3f} GF vs analytic "
          f"{analytic / 1e9:.3f} GF (ratio {ratio:.3f})")
    assert 0.9 < ratio < 1.1, "analytic Wan block formula drifted from XLA"
    np.testing.assert_allclose(
        bench.wan_forward_tflops(cfg, s_tokens, lt, kv_hoisted=False) * 1e12,
        cfg.depth * analytic
        + 2 * s_tokens * cfg.in_channels * 4 * h  # patchify (patch 1,2,2)
        + 2 * s_tokens * h * cfg.out_channels * 4  # head
        + 2 * lt * cfg.context_dim * h + 2 * lt * h * h,  # text embed
        rtol=1e-6)
    print("bench.wan_forward_tflops matches the validated per-block formula")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-sdxl", action="store_true",
                    help="only run the fast Wan-block validation")
    args = ap.parse_args()
    wan_block_check()
    if not args.skip_sdxl:
        tf = sdxl_flops()
        print(f"SDXL-1024 B=1 forward: {tf:.3f} TFLOP "
              f"(bench.SDXL_FWD_TFLOPS_B1)")


if __name__ == "__main__":
    main()
