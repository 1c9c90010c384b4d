"""Compile-time census of the solver suite at the SDXL-1024 headline shape.

VERDICT r4 weakness 5: multi-model-call solvers (heun/dpm_2/dpmpp_sde/
heunpp2/seeds_2/seeds_3) call `model` inside lax.cond branches, so the
compiled program contains 2-4 LanPaint-think-loop (and hence backbone)
instances — exactly the compile-time multiplier the engine's single-call-
site design avoids (engine.py "one backbone instance per program").  This
measures jit trace+lower+compile wall-clock per solver, cold (unique dummy
constant per run defeats the persistent cache), on the requested backend.

The backbone is the REAL SDXL UNet at the 1024px headline shape (batch 1,
2-step ladder, 5 think-steps) — solver structure is the only variable.

Usage:
  python scripts/measure_solver_compile.py --solvers euler heun seeds_2
  JAX_PLATFORMS=cpu python ... --solvers all     (relative ratios on CPU)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MULTI_CALL = ["heun", "dpm_2", "dpm_2_ancestral", "dpmpp_sde", "heunpp2",
              "seeds_2", "seeds_3"]
SINGLE_CALL = ["euler", "dpmpp_2m"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solvers", nargs="+", default=["euler", "heun", "seeds_3"])
    ap.add_argument("--tiny", action="store_true",
                    help="tiny UNet (any backend; structure-only check)")
    ap.add_argument("--steps", type=int, default=2,
                    help="ladder steps (2 = minimal: one full + one tail)")
    args = ap.parse_args()
    solvers = (SINGLE_CALL + MULTI_CALL if args.solvers == ["all"]
               else args.solvers)

    import ml_dtypes

    from lanpaint_tpu import LanPaintConfig, LanPaintSampler
    from lanpaint_tpu.models.unet import SDXL_CONFIG, TINY_UNET_CONFIG
    from lanpaint_tpu.models.zoo import build_unet
    from lanpaint_tpu.sigmas import calculate_sigmas

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg_model, hw, ctx_d, y_d = TINY_UNET_CONFIG, 16, 32, None
    else:
        cfg_model, hw, ctx_d, y_d = SDXL_CONFIG, 128, 2048, 2816

    print(f"init UNet params (host) ...", file=sys.stderr)
    den, params = build_unet(cfg_model, init_hw=32, name="sdxl")
    params = jax.tree.map(
        lambda p: np.asarray(p).astype(ml_dtypes.bfloat16), params)
    den, _ = build_unet(cfg_model, params, name="sdxl")

    b = 1
    latent = jnp.zeros((b, 4, hw, hw), jnp.float32)
    mask = np.zeros((hw * 8, hw * 8), np.float32)
    mask[hw * 2:hw * 6, hw * 2:hw * 6] = 1.0
    cond = {"context": jnp.zeros((b, 77, ctx_d), jnp.float32)}
    uncond = {"context": jnp.ones((b, 77, ctx_d), jnp.float32) * 0.1}
    if y_d:
        cond["y"] = jnp.zeros((b, y_d), jnp.float32)
        uncond["y"] = jnp.zeros((b, y_d), jnp.float32)
    sigmas = np.asarray(
        calculate_sigmas(den.sigma_table, "karras", args.steps), np.float32)

    results = {}
    for name in solvers:
        # a per-solver nonce constant folded into the program defeats both
        # the in-process jit cache and the persistent compile cache, so
        # every row is a COLD compile
        nonce = float(time.time() % 1e6)
        sam = LanPaintSampler(
            den, config=LanPaintConfig(n_steps=5),
            sampler_name=name, cfg=5.0 + nonce * 1e-9, sequential_cfg=True)
        t0 = time.perf_counter()
        out, _ = sam(latent=latent, sigmas=sigmas, cond=cond, uncond=uncond,
                     mask=mask, seed=0)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        results[name] = dt
        base = results.get("euler", dt)
        print(f"{name}: {dt:.1f}s compile+first-run "
              f"({dt / base:.2f}x euler)", flush=True)
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
