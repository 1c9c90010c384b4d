"""Measure the Wan cross-KV hoist (WanKVPrecompute) on the real chip.

Unlike the UNet (where the per-forward cross-KV einsum is loop-invariant
and XLA's LICM already hoists it — measured kvhoist_delta_s ~= 0 on the
SDXL headline), Wan's k/v projections run INSIDE the depth scan with
per-block stacked weights, which XLA cannot hoist.  Denoiser.precompute
moves them out of the per-forward program entirely; this script times an
N-forward chain (one jitted program, serial dependence through x) with the
hoist on vs off at the Wan2.2-5B video shape.

Params are random-init bf16 and pickled to /dev/shm for reuse across runs
(init on the 1-CPU host is ~15-20 min for 5B).

Usage:  python scripts/measure_wan_kv.py [--frames 10] [--hw 60 104]
        [--calls 8] [--text-tokens 512] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PARAMS_PKL = "/dev/shm/wan5b_params_r4.pkl"


def get_params(cfg, tiny: bool):
    import ml_dtypes
    import numpy as onp

    from lanpaint_tpu.models.zoo import init_params_host
    from lanpaint_tpu.models.wan import WanModel

    if not tiny and os.path.exists(PARAMS_PKL):
        print(f"loading cached params {PARAMS_PKL}", file=sys.stderr)
        with open(PARAMS_PKL, "rb") as f:
            return pickle.load(f)
    module = WanModel(cfg)
    x = jnp.zeros((1, cfg.in_channels, 2, 16, 16), jnp.float32)
    ctx = jnp.zeros((1, 8, cfg.context_dim), jnp.float32)
    t0 = time.perf_counter()
    params = init_params_host(module, x, jnp.full((1,), 0.5), ctx)
    params = jax.tree.map(
        lambda p: onp.asarray(p).astype(ml_dtypes.bfloat16), params)
    print(f"init {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    if not tiny:
        with open(PARAMS_PKL, "wb") as f:
            pickle.dump(params, f)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10,
                    help="latent frames (10 latent = 40 video frames)")
    ap.add_argument("--hw", type=int, nargs=2, default=(40, 54),
                    help="latent H W; (40, 54) with 10 frames = 5400 tokens "
                         "(the r3 Wan-5B kernel-measurement shape).  The "
                         "14B-geometry (60, 104) = 15600 tokens compiles "
                         ">40 min through the relay — avoid")
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--text-tokens", type=int, default=512)
    ap.add_argument("--tiny", action="store_true",
                    help="debug on the tiny config (any backend)")
    args = ap.parse_args()

    import dataclasses

    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WAN22_TI2V_5B_CONFIG
    from lanpaint_tpu.models.zoo import build_wan

    if args.tiny:
        # debug mode must not touch (or wait on) the real chip
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
    assert den.precompute is not None

    x0 = jnp.zeros(shape, jnp.float32)
    cond = {"context": jax.random.normal(
        jax.random.PRNGKey(0), (1, args.text_tokens, cfg.context_dim),
        jnp.float32) * 0.02}
    t = jnp.full((1,), 0.6)
    tok = (shape[2] // cfg.patch[0]) * (shape[3] // cfg.patch[1]) \
        * (shape[4] // cfg.patch[2])
    print(f"shape {shape} -> {tok} tokens, {args.calls}-call chain",
          file=sys.stderr)

    results = {}
    for label, hoist in [("hoist", True), ("per-forward", False)]:
        def chain(p, x, c):
            if hoist:
                c = den.precompute(p, c)

            def body(carry, _):
                out = den.raw_apply(p, carry, t, c)
                return out.astype(carry.dtype), ()

            out, _ = jax.lax.scan(body, x, None, length=args.calls)
            return out

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
    d = results["hoist"] - results["per-forward"]
    print(f"hoist - per-forward = {d * 1e3:+.2f} ms/forward "
          f"({d / results['per-forward'] * 100:+.1f}%)")


if __name__ == "__main__":
    main()
