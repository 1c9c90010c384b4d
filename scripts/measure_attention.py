"""Kernel-level attention A/B on the real TPU chip.

Times legacy flash vs splash for given (B, S, H, D) self-attention shapes
inside a scan harness (N chained calls in ONE program, so per-call tunnel
dispatch amortizes away; the carry feeds each call's q so XLA cannot CSE
the chain).  Used for the Wan S=5400 video shape measurement
(VERDICT r3 task 5) and re-checking the SDXL shapes.

Usage (chip must be free — the bench serializes terribly against it):
    python scripts/measure_attention.py                    # default shapes
    python scripts/measure_attention.py --b 1 --s 5400 --h 24 --d 128
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_impl(b: int, s: int, h: int, d: int, use_splash: bool,
              n_calls: int = 50, repeats: int = 3,
              min_s: int | None = None) -> float:
    from lanpaint_tpu.models import layers

    prev = layers.USE_SPLASH
    prev_min = layers.SPLASH_MIN_S
    layers.USE_SPLASH = use_splash
    if min_s is not None:
        layers.SPLASH_MIN_S = min_s
    try:
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)
        q0 = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)

        @jax.jit
        def chain(q):
            def body(c, _):
                o = layers.attention_bshd(c, k, v, impl="auto")
                # feed output back as next q: serial dependence, no CSE
                return o, ()

            out, _ = jax.lax.scan(body, q, None, length=n_calls)
            return out

        chain(q0).block_until_ready()  # compile + warmup
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(chain(q0).astype(jnp.float32)))  # forced readback
            best = min(best, time.perf_counter() - t0)
        return best / n_calls
    finally:
        layers.USE_SPLASH = prev
        layers.SPLASH_MIN_S = prev_min


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=None)
    ap.add_argument("--s", type=int, default=None)
    ap.add_argument("--h", type=int, default=None)
    ap.add_argument("--d", type=int, default=None)
    ap.add_argument("--calls", type=int, default=50)
    ap.add_argument("--min-s", type=int, default=None,
                    help="override layers.SPLASH_MIN_S (e.g. 1024 to force "
                         "the splash kernel onto the short SDXL shape)")
    args = ap.parse_args()

    if args.s is not None:
        shapes = [(args.b or 1, args.s, args.h or 24, args.d or 128)]
    else:
        shapes = [
            (1, 5400, 24, 128),   # Wan2.2-5B video, 40f 880x480 tokens
            (1, 4096, 10, 64),    # SDXL-1024 level-1 self-attn
        ]
    assert jax.default_backend() == "tpu", "run on the real chip"
    for b, s, h, d in shapes:
        flash = time_impl(b, s, h, d, use_splash=False, n_calls=args.calls,
                          min_s=args.min_s)
        splash = time_impl(b, s, h, d, use_splash=True, n_calls=args.calls,
                           min_s=args.min_s)
        # 4*S^2*H*D fwd flops (2 matmuls), bf16
        fl = 4.0 * s * s * h * d * b
        print(f"B{b} S{s} H{h} D{d}: flash {flash*1e6:.0f} us "
              f"({fl/flash/1e12:.1f} TF/s) | splash {splash*1e6:.0f} us "
              f"({fl/splash/1e12:.1f} TF/s) | delta "
              f"{(splash-flash)/flash*100:+.1f}%")


if __name__ == "__main__":
    main()
