"""Headline benchmark: SDXL-1024 inpainting, 20 steps x 5 think-steps.

The BASELINE.json north star: "SDXL-1024 inpaint, 5 think-steps on TPU
matching A100 wall-clock".  The reference publishes no SDXL latency, so the
A100 number is an ESTIMATE from the reference's cost model: (NumSteps+1) = 6
CFG-batched UNet forwards per outer step x 19 steps + 1 (outer early stop
tail) = 115 pair-forwards of SDXL-1024; at the commonly-cited ~0.25 s per
CFG pair on A100 (fp16, 1024x1024) that is ~28.8 s wall-clock.  vs_baseline
reports baseline_seconds / measured_seconds (>1 = faster than the estimate).

Judgable-performance fields (independent of that estimate):
* per_forward_ms — wall-clock / single-model-forward count (2 per CFG pair;
  sequential_cfg runs cond and uncond as separate batch-1 forwards).
* model_tflops — XLA cost analysis of one SDXL-1024 batch-1 forward:
  2.605 TFLOP (measured via jit(...).lower().compile().cost_analysis() on
  the XLA-CPU backend, 2026-08-17; config-determined, so vendored as a
  constant — recompute with scripts in docs/architecture.md if SDXL_CONFIG
  changes).
* mfu — model FLOPs utilization vs the v5e peak 197 TFLOP/s (bf16).

Optional same-run measurement blocks (each adds a full compile+timing):
* LANPAINT_BENCH_FUSED=1  — the fused Pallas pointwise path (historically
  +0.88 s: XLA already fuses the think-loop pointwise chain, the kernel
  adds HBM materialization; hence use_fused_kernels=False).  The delta is
  emitted ONLY when measured in the same run — never a replayed constant.
* LANPAINT_BENCH_QKV=1    — the UNFUSED-QKV layout A/B (r3 measured the
  shipped fusion at -1.058 s / MFU 0.227 -> 0.249).
* LANPAINT_BENCH_KVHOIST=1 — the run-constant cross-KV hoist A/B
  (r4 measured -0.012 s: XLA LICM already hoists the SDXL einsum; the
  hoist stays for programs where LICM declines — docs/architecture.md).
* LANPAINT_BENCH_SPLASH (default ON; 0 disables) — legacy-flash A/B of the
  same program (module-level USE_SPLASH flip): splash_delta_s < 0 means the
  splash kernel is faster end-to-end.
* LANPAINT_BENCH_B4 (default ON; 0 disables) — B=4 serving-lane
  throughput (r3: 0.91x of 4 x B=1 — batching does NOT amortize this
  workload; see docs/architecture.md).
* LANPAINT_BENCH_QUALITY=1 — deterministic masked PSNR/SSIM canary.

tpu_selftest runs the on-chip test set (test_fused/test_attention/test_norms/
test_onchip — the Makefile's check-chip) on the real chip: the CPU-only CI
cannot see Pallas regressions.  Tunnel compiles dominate its runtime; the
persistent compile cache (tests/conftest.py) makes warm reruns minutes vs
>15 min cold, and the 2400 s timeout covers a cold run.  Disable with
LANPAINT_BENCH_SELFTEST=0.

Runs on the single real TPU chip; weights are random-init bf16 (timing is
architecture-dependent, not weight-dependent).
"""

import json
import os
import subprocess
import sys
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

STEPS = 20
THINK_STEPS = 5
OUTER_EARLY_STOP = 1
# pair-forwards: (think+1) per outer step, except the early-stop tail (1)
PAIR_CALLS = (STEPS - OUTER_EARLY_STOP) * (THINK_STEPS + 1) + OUTER_EARLY_STOP
FORWARDS = PAIR_CALLS * 2          # cond + uncond (sequential_cfg)
SDXL_FWD_TFLOPS_B1 = 2.605         # XLA cost analysis, see module docstring
V5E_PEAK_TFLOPS = 197.0            # bf16
BASELINE_SECONDS = PAIR_CALLS * 0.25   # A100 estimate (see docstring)

log = lambda m: print(m, file=sys.stderr, flush=True)


def _build_sampler(fused: bool, batch: int = 1, fused_qkv: bool = True,
                   kv_hoist: bool = True):
    from lanpaint_tpu import LanPaintConfig, LanPaintSampler
    from lanpaint_tpu.models.unet import SDXL_CONFIG
    from lanpaint_tpu.models.zoo import build_unet
    from lanpaint_tpu.sigmas import calculate_sigmas

    import dataclasses
    import ml_dtypes
    import numpy as onp

    cfg_model = dataclasses.replace(SDXL_CONFIG, fused_qkv=fused_qkv)
    log(f"bench: init SDXL params (host), b={batch} qkv_fused={fused_qkv}")
    den, params = build_unet(cfg_model, init_hw=32, name="sdxl")
    # bf16 weights (TPU serving layout); cast on host — per-leaf device casts
    # through the tunnel are slow
    params = jax.tree.map(
        lambda p: onp.asarray(p).astype(ml_dtypes.bfloat16), params
    )
    den_bf16, _ = build_unet(cfg_model, params, name="sdxl")
    del params
    if not kv_hoist:
        # A/B lever: disable the run-constant cross-KV hoist
        # (zoo.unet_precompute_kv) so the einsum runs per forward again
        den_bf16 = dataclasses.replace(den_bf16, precompute=None)

    b = batch
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
        den_bf16,
        config=LanPaintConfig(n_steps=THINK_STEPS, use_fused_kernels=fused,
                              outer_early_stop=OUTER_EARLY_STOP),
        sampler_name="euler", cfg=5.0,
        # measured faster than the 2B-batched CFG pass at 1024px
        # (2 x 77.1 ms vs 161.7 ms per pair on v5e)
        sequential_cfg=True,
    )

    def run(seed):
        out, _ = sam(latent=latent, sigmas=sigmas, cond=cond, uncond=uncond,
                     mask=mask, seed=seed)
        # force full synchronization incl. device->host readback (the
        # tunneled backend's block_until_ready can return early)
        return float(jnp.sum(out.astype(jnp.float32)))

    return run


def _time_path(fused: bool, batch: int = 1, fused_qkv: bool = True,
               kv_hoist: bool = True, repeats: int = 3) -> float:
    run = _build_sampler(fused, batch=batch, fused_qkv=fused_qkv,
                         kv_hoist=kv_hoist)
    log(f"bench: compile + warmup run (fused={fused}, b={batch})")
    t0 = time.perf_counter()
    run(0)
    log(f"bench: compile+first run {time.perf_counter() - t0:.1f}s; timing")
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    return min(times)


def _tpu_selftest() -> str:
    """Run the TPU-only Pallas/attention tests on the chip (CPU CI can't)."""
    try:
        proc = subprocess.run(
            # -n 0 overrides pytest.ini's xdist sharding: four workers
            # contending for the ONE real chip through the tunnel serialize
            # terribly (observed >15 min vs ~2 min single-process)
            # test_onchip FIRST: if the tunnel drops mid-run (observed r4), the
            # end-to-end cases have already produced their verdict
            [sys.executable, "-m", "pytest", "tests/test_onchip.py",
             "tests/test_attention.py", "tests/test_norms.py",
             "tests/test_fused.py",
             "-q", "-n", "0", "-p", "no:cacheprovider"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=2400,
            # run on the REAL chip: without this the tests/conftest.py
            # CPU-forcing makes every skipif(backend=="cpu") case skip and
            # the selftest is vacuous (caught r3)
            env={**os.environ, "LANPAINT_TEST_TPU": "1"},
        )
        if proc.returncode == 0:
            tail = proc.stdout.strip().splitlines()
            return "pass " + (tail[-1] if tail else "")
        return "fail: " + proc.stdout[-300:].replace("\n", " ")
    except Exception as e:  # never fail the headline bench on the gate
        return f"error: {e}"


def _probe_device(timeout_s: float = 600.0) -> None:
    """Fail fast (clear JSON on stdout, rc=1) if the TPU tunnel is dead.

    jax.devices() through the axon relay blocks forever when nothing is
    listening on the loopback relay port; a bench that hangs silently is
    worse than one that reports the outage."""
    import threading

    done = threading.Event()
    err: list = []

    def probe():
        try:
            jax.devices()
        except Exception as e:  # noqa: BLE001 — report, don't hang
            err.append(e)
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s) or err:
        reason = (f"device discovery raised: {err[0]}" if err else
                  f"device discovery hung > {timeout_s:.0f}s (relay down?)")
        print(json.dumps({
            "metric": "sdxl1024_inpaint_20x5think_wallclock",
            "value": None, "unit": "seconds", "vs_baseline": None,
            "error": f"TPU unreachable: {reason}",
        }))
        sys.exit(1)


def _quality_canary() -> dict:
    """Deterministic masked PSNR/SSIM regression canary (latent space,
    random-init SDXL, fixed seed): the value is meaningless as absolute
    quality but any cross-round drift flags an unintended numerics change.
    LPIPS (pixel space, real VGG weights) lives in examples/common.report
    behind LANPAINT_LPIPS_VGG — one flag the day weights exist."""
    from lanpaint_tpu.quality import masked_psnr, masked_ssim

    from lanpaint_tpu import LanPaintConfig, LanPaintSampler
    from lanpaint_tpu.models.unet import SDXL_CONFIG
    from lanpaint_tpu.models.zoo import build_unet
    from lanpaint_tpu.sigmas import calculate_sigmas

    den, _ = build_unet(SDXL_CONFIG, init_hw=32, name="sdxl-quality")
    hw = 64  # 512px latent — the canary needs determinism, not scale
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    orig = np.stack([np.sin(xx / 9.0), np.cos(yy / 7.0),
                     np.sin((xx + yy) / 11.0), np.cos((xx - yy) / 13.0)])
    latent = jnp.asarray(orig[None])
    mask = np.zeros((hw * 8, hw * 8), np.float32)
    mask[hw * 2:hw * 6, hw * 2:hw * 6] = 1.0
    cond = {"context": jnp.zeros((1, 77, 2048), jnp.float32),
            "y": jnp.zeros((1, 2816), jnp.float32)}
    sigmas = jnp.asarray(calculate_sigmas(den.sigma_table, "karras", 6))
    sam = LanPaintSampler(den, config=LanPaintConfig(n_steps=2),
                          sampler_name="euler", cfg=1.0, sequential_cfg=True)
    out, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=jnp.asarray(mask),
                 seed=0)
    m = jnp.asarray(np.asarray(
        jax.image.resize(jnp.asarray(mask), (hw, hw), "nearest")))
    return {
        "psnr_masked": round(float(masked_psnr(latent, out, m)), 4),
        "ssim_masked": round(float(masked_ssim(latent, out, m)), 4),
        "note": "regression canary (random weights, latent space); "
                "LPIPS: LANPAINT_LPIPS_VGG + examples/common.report",
    }


def main():
    _probe_device()
    secs = _time_path(fused=False)
    result = {
        "metric": "sdxl1024_inpaint_20x5think_wallclock",
        "value": round(secs, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / secs, 3),
        "baseline_note": f"A100 estimate {BASELINE_SECONDS:.1f}s "
                         f"({PAIR_CALLS} pairs x ~0.25s folklore)",
        "per_forward_ms": round(secs / FORWARDS * 1e3, 2),
        "model_tflops": SDXL_FWD_TFLOPS_B1,
        "mfu": round(FORWARDS * SDXL_FWD_TFLOPS_B1 / (secs * V5E_PEAK_TFLOPS), 4),
        "fused": False,
        "qkv_fused": True,
    }
    if os.environ.get("LANPAINT_BENCH_FUSED") == "1":
        # fused Pallas pointwise path: measured in the SAME run or not at
        # all — never a replayed dated constant (VERDICT r2 item 5)
        secs_fused = _time_path(fused=True)
        result["fused_delta_s"] = round(secs_fused - secs, 3)
        result["fused_seconds"] = round(secs_fused, 3)
    else:
        result["fused_delta_s_note"] = (
            "not measured this run; LANPAINT_BENCH_FUSED=1 measures both "
            "paths live (2026-08-17 measurement was +0.88 s — the reason "
            "use_fused_kernels defaults off)")
    if os.environ.get("LANPAINT_BENCH_KVHOIST") == "1":
        # lever measurement: the same program WITHOUT the run-constant
        # cross-KV hoist (Denoiser.precompute=None) — negative delta means
        # the hoist is faster
        secs_nohoist = _time_path(fused=False, kv_hoist=False)
        result["kvhoist_off_seconds"] = round(secs_nohoist, 3)
        result["kvhoist_delta_s"] = round(secs - secs_nohoist, 3)
    if os.environ.get("LANPAINT_BENCH_QKV") == "1":
        # lever measurement: unfused-QKV layout of the same program
        secs_unfused = _time_path(fused=False, fused_qkv=False)
        result["qkv_unfused_seconds"] = round(secs_unfused, 3)
        result["qkv_fusion_delta_s"] = round(secs - secs_unfused, 3)
    if os.environ.get("LANPAINT_BENCH_SPLASH") != "0":
        # splash-attention A/B (default ON this round): same program with
        # LANPAINT_SPLASH=0 semantics — the legacy flash kernel at the
        # S=4096 SDXL shape.  Measured in the SAME run (the r3 crash means
        # no prior end-to-end splash number exists).  negative delta =
        # splash is faster.
        from lanpaint_tpu.models import layers as _layers

        _layers.USE_SPLASH = False
        try:
            secs_flash = _time_path(fused=False)
        finally:
            _layers.USE_SPLASH = True
        result["flash_seconds"] = round(secs_flash, 3)
        result["splash_delta_s"] = round(secs - secs_flash, 3)
    if os.environ.get("LANPAINT_BENCH_B4") != "0":
        # serving-batch throughput: B=4 data-parallel lanes on the one chip
        # (the serve.py batcher's shape, serve.py:314) — amortizes weight
        # reads over 4 lanes, lifting GEMM efficiency
        secs_b4 = _time_path(fused=False, batch=4, repeats=2)
        result["throughput_b4"] = {
            "seconds": round(secs_b4, 3),
            "images_per_min": round(4 * 60.0 / secs_b4, 2),
            "mfu": round(4 * FORWARDS * SDXL_FWD_TFLOPS_B1
                         / (secs_b4 * V5E_PEAK_TFLOPS), 4),
            "speedup_vs_4x_b1": round(4 * secs / secs_b4, 2),
        }
    if os.environ.get("LANPAINT_BENCH_QUALITY") == "1":
        log("bench: quality canary")
        result["quality"] = _quality_canary()
    if os.environ.get("LANPAINT_BENCH_SELFTEST") != "0":
        log("bench: running on-chip Pallas/attention selftest")
        result["tpu_selftest"] = _tpu_selftest()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
