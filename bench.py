"""Headline benchmark: SDXL-1024 inpainting, 20 steps x 5 think-steps.

The BASELINE.json north star: "SDXL-1024 inpaint, 5 think-steps on TPU
matching A100 wall-clock".  The reference publishes no SDXL latency, so the
baseline is the reference's cost model applied to A100 hardware:
(NumSteps+1) = 6 CFG-batched UNet forwards per outer step x 20 steps = 120
forwards + 6 extra (heun-free euler tail) ~= 126 forwards of SDXL-1024 at
batch 2; at the commonly-measured ~0.25 s/forward on A100 (fp16, 1024x1024,
batch 2) that is ~31.5 s wall-clock.  vs_baseline reports
baseline_seconds / measured_seconds (>1 means faster than the A100
reference estimate).

Runs on the single real TPU chip; weights are random-init bf16 (timing is
architecture-dependent, not weight-dependent).  A persistent JAX compilation
cache under .jax_cache amortizes the first-compile cost across rounds.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache across processes/rounds (the env-var route does
# not engage on this backend; the explicit config update does)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

BASELINE_SECONDS = 31.5
STEPS = 20
THINK_STEPS = 5


def main():
    import sys

    from lanpaint_tpu import LanPaintConfig, LanPaintSampler
    from lanpaint_tpu.models.unet import SDXL_CONFIG
    from lanpaint_tpu.models.zoo import build_unet
    from lanpaint_tpu.sigmas import calculate_sigmas

    import ml_dtypes
    import numpy as onp

    log = lambda m: print(m, file=sys.stderr, flush=True)
    log("bench: init SDXL params (host)")
    den, params = build_unet(SDXL_CONFIG, init_hw=32, name="sdxl")
    # bf16 weights (TPU serving layout); cast on host — per-leaf device casts
    # through the tunnel are slow
    params = jax.tree.map(
        lambda p: onp.asarray(p).astype(ml_dtypes.bfloat16), params
    )
    den_bf16, _ = build_unet(SDXL_CONFIG, params, name="sdxl")
    del params

    b = 1
    latent = jnp.zeros((b, 4, 128, 128), jnp.float32)
    mask = np.zeros((1024, 1024), np.float32)
    mask[256:768, 256:768] = 1.0  # center square inpaint
    cond = {
        "context": jnp.zeros((b, 77, 2048), jnp.float32),
        "y": jnp.zeros((b, 2816), jnp.float32),
    }
    uncond = {
        "context": jnp.ones((b, 77, 2048), jnp.float32) * 0.1,
        "y": jnp.zeros((b, 2816), jnp.float32),
    }
    sigmas = jnp.asarray(calculate_sigmas(den_bf16.sigma_table, "karras", STEPS))

    sam = LanPaintSampler(
        den_bf16, config=LanPaintConfig(n_steps=THINK_STEPS),
        sampler_name="euler", cfg=5.0,
        # measured faster than the 2B-batched CFG pass at 1024px
        # (2 x 77.1 ms vs 161.7 ms per pair on v5e)
        sequential_cfg=True,
    )

    def run(seed):
        out, _ = sam(latent=latent, sigmas=sigmas, cond=cond, uncond=uncond,
                     mask=jnp.asarray(mask), seed=seed)
        # force full synchronization incl. device->host readback (the
        # tunneled backend's block_until_ready can return early)
        return float(jnp.sum(out.astype(jnp.float32)))

    log("bench: compile + warmup run")
    t0 = time.perf_counter()
    run(0)
    log(f"bench: compile+first run {time.perf_counter() - t0:.1f}s; timing")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    secs = min(times)

    print(json.dumps({
        "metric": "sdxl1024_inpaint_20x5think_wallclock",
        "value": round(secs, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / secs, 3),
    }))


if __name__ == "__main__":
    main()
