"""Splash-attention block-size sweep at the SDXL S=4096 / D=64 shape.

VERDICT r4 item 2: "sweep splash block_q/block_kv/block_kv_compute at
S=4096/D=64".  Uses the measure_attention chained harness (50 serial calls
in one program so tunnel dispatch amortizes); each trial re-tunes the
module-level SPLASH_BLOCK_* knobs — layers._splash_attention passes them
into the kernel cache key, so every configuration builds its own kernel.

Usage:  python scripts/sweep_splash.py [--s 4096] [--h 10] [--d 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TRIALS = [
    # (block_q, block_kv, block_kv_compute).  bkv=4096 configs measured
    # VMEM-OOM at compile ("scoped allocation 17.07M > 16.00M limit",
    # 2026-08-20) — the sweep skips failures and reports them.
    (1024, 2048, 128),
    (1024, 2048, 256),
    (1024, 2048, 512),   # shipped default until the r5 sweep
    (1024, 2048, 1024),  # r5 sweep winner (1060 us vs 1072 at 512)
    (1024, 2048, 2048),
    (1024, 4096, 512),
    (1024, 1024, 512),
    (1024, 1024, 1024),
    (512, 2048, 512),
    (512, 2048, 1024),
    (2048, 2048, 512),
    (2048, 2048, 1024),
    (2048, 2048, 2048),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=4096)
    ap.add_argument("--h", type=int, default=10)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--b", type=int, default=1)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "run on the real chip"

    from measure_attention import time_impl

    from lanpaint_tpu.models import layers

    flops = 4 * args.b * args.s * args.s * args.h * args.d
    base = time_impl(args.b, args.s, args.h, args.d, use_splash=False)
    print(f"legacy flash: {base * 1e6:.0f} us/call "
          f"({flops / base / 1e12:.1f} TF/s)", flush=True)

    prev = (layers.SPLASH_BLOCK_Q, layers.SPLASH_BLOCK_KV,
            layers.SPLASH_BLOCK_KV_COMPUTE)
    best = (base, "legacy flash")
    try:
        for bq, bkv, bkvc in TRIALS:
            if bq > args.s or bkv > args.s:
                continue
            layers.SPLASH_BLOCK_Q = bq
            layers.SPLASH_BLOCK_KV = bkv
            layers.SPLASH_BLOCK_KV_COMPUTE = bkvc
            tag = f"splash bq={bq} bkv={bkv} bkvc={bkvc}"
            try:
                t = time_impl(args.b, args.s, args.h, args.d, use_splash=True)
            except Exception as e:  # e.g. VMEM OOM at large bkv
                print(f"{tag}: FAILED ({repr(e)[:120]})", flush=True)
                continue
            print(f"{tag}: {t * 1e6:.0f} us/call "
                  f"({flops / t / 1e12:.1f} TF/s)", flush=True)
            if t < best[0]:
                best = (t, tag)
    finally:
        (layers.SPLASH_BLOCK_Q, layers.SPLASH_BLOCK_KV,
         layers.SPLASH_BLOCK_KV_COMPUTE) = prev
    print(f"BEST: {best[1]} at {best[0] * 1e6:.0f} us/call "
          f"(flash baseline {base * 1e6:.0f})")


if __name__ == "__main__":
    main()
