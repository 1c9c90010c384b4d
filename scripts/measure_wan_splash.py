"""A/B splash vs legacy flash attention on the Wan video self-attention.

Splash's original motivation was the long-video shape (S=5400, padded to
6144 with segment-id masking — layers._splash_attention), but BENCH only
A/Bs it on the SDXL S=4096 headline (VERDICT r3 task 5: "A/B splash on
the Wan S=5400 video shape").  This times an N-forward Wan2.2-5B chain
(one jitted program) with layers.USE_SPLASH flipped between traces —
the same module-flag flip bench.py's LANPAINT_BENCH_SPLASH block uses.

Reuses the /dev/shm param cache from measure_wan_kv.py.

Usage:  python scripts/measure_wan_splash.py [--frames 10] [--hw 40 54]
        [--calls 8] [--text-tokens 512] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(40, 54),
                    help="latent H W; (40, 54) x 10 frames = 5400 tokens, "
                         "the shape splash was built for (pads to 6144)")
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--text-tokens", type=int, default=512)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from lanpaint_tpu.models import layers
    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WAN22_TI2V_5B_CONFIG
    from lanpaint_tpu.models.zoo import build_wan
    from measure_wan_kv import get_params

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = TINY_WAN_CONFIG
        shape = (1, cfg.in_channels, 4, 16, 16)
    else:
        assert jax.default_backend() == "tpu", "run on the real chip"
        cfg = WAN22_TI2V_5B_CONFIG
        h, w = args.hw
        shape = (1, cfg.in_channels, args.frames, h, w)

    params = jax.device_put(get_params(cfg, args.tiny))
    den, _ = build_wan(cfg, params)

    x0 = jnp.zeros(shape, jnp.float32)
    cond = {"context": jax.random.normal(
        jax.random.PRNGKey(0), (1, args.text_tokens, cfg.context_dim),
        jnp.float32) * 0.02}
    if den.precompute is not None:
        cond = den.precompute(params, cond)
    t = jnp.full((1,), 0.6)
    tok = (shape[2] // cfg.patch[0]) * (shape[3] // cfg.patch[1]) \
        * (shape[4] // cfg.patch[2])
    print(f"shape {shape} -> {tok} tokens, {args.calls}-call chain",
          file=sys.stderr)

    def chain(p, x, c):
        def body(carry, _):
            out = den.raw_apply(p, carry, t, c)
            return out.astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=args.calls)
        return out

    results = {}
    for label, use_splash in [("splash", True), ("flash", False)]:
        layers.USE_SPLASH = use_splash
        fn = jax.jit(chain)
        tc0 = time.perf_counter()
        fn(params, x0, cond).block_until_ready()
        print(f"{label}: compile+warmup {time.perf_counter() - tc0:.0f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            tt = time.perf_counter()
            float(jnp.sum(fn(params, x0, cond).astype(jnp.float32)))
            best = min(best, time.perf_counter() - tt)
        per_call = best / args.calls
        results[label] = per_call
        print(f"{label}: {per_call * 1e3:.1f} ms/forward")
    layers.USE_SPLASH = True
    d = results["splash"] - results["flash"]
    print(f"splash - flash = {d * 1e3:+.2f} ms/forward "
          f"({d / results['flash'] * 100:+.1f}%)")


if __name__ == "__main__":
    main()
