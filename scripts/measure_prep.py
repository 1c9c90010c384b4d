"""Measure the per-call EAGER prep cost of LanPaintSampler.__call__.

The headline sampler is one jitted launch, but __call__ surrounds it with
~15 eager ops (PRNGKey/split/normal, noise_scaling, jnp.asarray(mask) +
nearest-exact resize, float(sigmas[0]) / np.asarray(sigmas) readbacks,
jnp.int32 scalars).  On the tunneled TPU backend every eager op is a
host<->device round trip, so this fixed per-call cost is part of the
wall - device gap (VERDICT r3 task 3's "tunnel dispatch share").

This times JUST that prep (everything __call__ does before _jit_inpaint,
replicated op-for-op) at the SDXL headline shapes.

Usage:  python scripts/measure_prep.py [--repeats 20]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()

    from lanpaint_tpu.masks import prepare_mask
    from lanpaint_tpu.schedule import ModelKind, noise_scaling
    from lanpaint_tpu.sigmas import EpsSigmaTable, calculate_sigmas

    EPS_TABLE = EpsSigmaTable()

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    latent = jnp.zeros((1, 4, 128, 128), jnp.float32)
    mask_host = np.zeros((1024, 1024), np.float32)
    mask_host[256:768, 256:768] = 1.0
    sigmas = jnp.asarray(calculate_sigmas(EPS_TABLE, "karras", 20))

    def prep(seed):
        # bench.run() does jnp.asarray(mask) per call; __call__ then:
        mask = jnp.asarray(mask_host)
        key = jax.random.PRNGKey(seed)
        k_init, k_think, k_solve = jax.random.split(key, 3)
        noise = jax.random.normal(k_init, latent.shape, jnp.float32)
        # _max_denoise: float(sigmas[0]) device->host readback
        s0 = float(sigmas[0])
        md = math.isclose(s0, float(EPS_TABLE.sigma_max), rel_tol=1e-5) or \
            s0 > float(EPS_TABLE.sigma_max)
        x_init = noise_scaling(
            ModelKind.EPS, jnp.broadcast_to(sigmas[0], (1,)), noise, latent,
            max_denoise=md)
        dm = prepare_mask(mask, latent.shape)
        sig_host = np.asarray(sigmas)
        a, b = jnp.int32(0), jnp.int32(20)
        jax.block_until_ready((x_init, dm, a, b, k_solve))
        return sig_host

    prep(0)  # warmup (eager op compiles)
    best, tot = float("inf"), 0.0
    for i in range(args.repeats):
        t0 = time.perf_counter()
        prep(i + 1)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        tot += dt
    print(f"eager prep: best {best * 1e3:.1f} ms, "
          f"mean {tot / args.repeats * 1e3:.1f} ms per call")
    print("headline context: 12 s wall / 230 forwards — prep is a fixed "
          "per-__call__ cost", file=sys.stderr)


if __name__ == "__main__":
    main()
