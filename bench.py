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
  6.310 TFLOP (jit(...).lower().compile().cost_analysis() on the XLA-CPU
  backend with the depth scans FULLY UNROLLED via LANPAINT_DEPTH_UNROLL=10,
  2026-08-20; reproduce with scripts/model_flops.py).  CORRECTION from the
  2.605 used in r2-r4: XLA's cost analysis counts a while/scan body ONCE
  regardless of trip count (verified on a synthetic lax.scan), so the old
  scanned-program number dropped 9 of every 10 transformer-block bodies —
  r2-r4 "mfu" fields are understated by the same 2.42x factor.
* mfu — model FLOPs utilization vs the v5e peak 197 TFLOP/s (bf16).
* wan — the REFERENCE-anchored video metric (LANPAINT_BENCH_WAN, default
  on): Wan2.2-5B per-forward ms measured on-chip at the S=5400 video shape,
  plus a projected 81-frame/20-step wall-clock against the reference's only
  published runtime row (880x480, 81 frames: 16:23 min on RTX Pro 6000,
  reference README.md:240-246).  Projection model documented in _wan_metric.

Delivery protocol (VERDICT r4 item 1 — two rounds of perf work went
unrecorded because the old bench printed ONE JSON line at the very end,
after every optional block and the selftest, under a hard driver timeout):
* the headline JSON line is printed (flushed) IMMEDIATELY after the
  headline timing, before any optional block;
* after every optional block the FULL updated JSON is re-printed — the
  driver parses the last valid line, so a timeout mid-block still records
  everything measured so far;
* every optional block has a wall-clock budget check against
  LANPAINT_BENCH_BUDGET_S (default 1900 s total — the measured warm full
  run is 1811 s): blocks that do not fit are skipped with a note in
  `skipped_blocks`, and the on-chip selftest gets whatever remains
  (min 300 s to bother).

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
* LANPAINT_BENCH_WAN (default ON; 0 disables) — the Wan video metric above.
* LANPAINT_BENCH_QUALITY=1 — deterministic masked PSNR/SSIM canary.

tpu_selftest runs the on-chip test set (test_fused/test_attention/test_norms/
test_onchip — the Makefile's check-chip) on the real chip: the CPU-only CI
cannot see Pallas regressions.  Tunnel compiles dominate its runtime; the
persistent compile cache (tests/conftest.py) makes warm reruns minutes vs
>15 min cold.  Disable with LANPAINT_BENCH_SELFTEST=0.

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

T_START = time.perf_counter()
# default sized from the measured warm full run (1811 s, 2026-08-20:
# headline+wan+splash+b4+selftest): every block fits; if the driver's own
# timeout is tighter, the incremental emission still preserves everything
# measured up to the kill
BUDGET_S = float(os.environ.get("LANPAINT_BENCH_BUDGET_S", "1900"))

STEPS = 20
THINK_STEPS = 5
OUTER_EARLY_STOP = 1
# pair-forwards: (think+1) per outer step, except the early-stop tail (1)
PAIR_CALLS = (STEPS - OUTER_EARLY_STOP) * (THINK_STEPS + 1) + OUTER_EARLY_STOP
FORWARDS = PAIR_CALLS * 2          # cond + uncond (sequential_cfg)
SDXL_FWD_TFLOPS_B1 = 6.310         # XLA cost analysis, see module docstring
V5E_PEAK_TFLOPS = 197.0            # bf16
BASELINE_SECONDS = PAIR_CALLS * 0.25   # A100 estimate (see docstring)

log = lambda m: print(m, file=sys.stderr, flush=True)


def _elapsed() -> float:
    return time.perf_counter() - T_START


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _emit(result: dict) -> None:
    """Print the full result JSON as one flushed stdout line.  Called after
    the headline and again after every optional block — the driver records
    the LAST parseable line, so partial progress is never lost to a
    timeout."""
    result["bench_elapsed_s"] = round(_elapsed(), 1)
    print(json.dumps(result), flush=True)


_DEN_CACHE: dict = {}


def _get_sdxl(fused_qkv: bool, kv_hoist: bool):
    """Build (and cache) the bf16 SDXL denoiser.  Host param init costs
    ~1 min on the 1-CPU host; the splash/B4 blocks reuse the headline's."""
    import dataclasses

    import ml_dtypes
    import numpy as onp

    from lanpaint_tpu.models.unet import SDXL_CONFIG
    from lanpaint_tpu.models.zoo import build_unet

    den = _DEN_CACHE.get(fused_qkv)
    if den is None:
        cfg_model = dataclasses.replace(SDXL_CONFIG, fused_qkv=fused_qkv)
        log(f"bench: init SDXL params (host), qkv_fused={fused_qkv}")
        _, params = build_unet(cfg_model, init_hw=32, name="sdxl")
        # bf16 weights (TPU serving layout); cast on host — per-leaf device
        # casts through the tunnel are slow
        params = jax.tree.map(
            lambda p: onp.asarray(p).astype(ml_dtypes.bfloat16), params
        )
        den, _ = build_unet(cfg_model, params, name="sdxl")
        _DEN_CACHE[fused_qkv] = den
    if not kv_hoist:
        # A/B lever: disable the run-constant cross-KV hoist
        # (zoo.unet_precompute_kv) so the einsum runs per forward again
        den = dataclasses.replace(den, precompute=None)
    return den


def _build_sampler(fused: bool, batch: int = 1, fused_qkv: bool = True,
                   kv_hoist: bool = True):
    from lanpaint_tpu import LanPaintConfig, LanPaintSampler
    from lanpaint_tpu.sigmas import calculate_sigmas

    den_bf16 = _get_sdxl(fused_qkv, kv_hoist)

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


# ---------------------------------------------------------------------------
# Wan video metric (reference-anchored)

WAN_REF_81F_SECONDS = 983.0   # 16:23 min, reference README.md:240-246
WAN_TEXT_TOKENS = 512


def wan_forward_tflops(cfg, tokens: int, text_len: int,
                       kv_hoisted: bool = True) -> float:
    """Analytic FLOPs (TFLOP, 2*MACs) of one WanModel forward at B=1.

    Counts every GEMM + attention contraction in models/wan.py; validated
    against XLA cost analysis on TINY_WAN_CONFIG
    (tests/test_models.py::test_wan_flops_model_matches_xla, within 2%)."""
    h, f, d = cfg.hidden, cfg.ffn_dim, cfg.depth
    s, lt = tokens, text_len
    blk = (
        8 * s * h * h          # self q,k,v,o
        + 4 * s * s * h        # self attention QK^T + PV
        + 4 * s * h * h        # cross q,o
        + 4 * s * lt * h       # cross attention QK^T + PV
        + 4 * s * h * f        # ffn in+out
    )
    if not kv_hoisted:
        blk += 4 * lt * h * h  # cross k,v per forward
    pin = cfg.in_channels * cfg.patch[0] * cfg.patch[1] * cfg.patch[2]
    pout = cfg.out_channels * cfg.patch[0] * cfg.patch[1] * cfg.patch[2]
    extras = (
        2 * s * pin * h        # patchify
        + 2 * s * h * pout     # head
        + 2 * lt * cfg.context_dim * h + 2 * lt * h * h  # text embedding
    )
    return (d * blk + extras) / 1e12


def _fast_wan_params(cfg):
    """Random bf16 Wan params WITHOUT tracing flax init on the 1-CPU host
    (init_params_host takes 15-20 min for 5B; eval_shape + numpy fill is
    ~1 min).  Values are irrelevant for timing — MXU matmul latency is
    data-independent."""
    import pickle

    import ml_dtypes

    from lanpaint_tpu.models.wan import WanModel

    cache = "/dev/shm/wan5b_params_fast.pkl"
    # any compatible cached tree works (values are timing-irrelevant):
    # scripts/measure_wan_kv.py's init_params_host pickle has the same
    # structure, so reuse it rather than generating a second 10 GB copy
    for path in (cache, "/dev/shm/wan5b_params_r4.pkl"):
        if os.path.exists(path):
            log(f"bench: loading cached Wan params {path}")
            with open(path, "rb") as fh:
                return pickle.load(fh)
    module = WanModel(cfg)
    x = jnp.zeros((1, cfg.in_channels, 2, 16, 16), jnp.float32)
    ctx = jnp.zeros((1, 8, cfg.context_dim), jnp.float32)
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), x,
                            jnp.full((1,), 0.5), ctx)
    rng = np.random.default_rng(0)

    def fill(s):
        a = rng.random(s.shape, np.float32)
        a -= 0.5
        a *= 0.04
        return a.astype(ml_dtypes.bfloat16)

    params = jax.tree.map(fill, shapes)
    try:
        with open(cache, "wb") as fh:
            pickle.dump(params, fh)
    except OSError:
        pass
    return params


def _wan_metric() -> dict:
    """Wan2.2 video metric anchored to the reference's published runtime.

    Measures the Wan2.2-5B per-forward wall-clock on the real chip at the
    S=5400 video shape (latent 10x40x54 — the largest shape that compiles
    through the tunnel in minutes; the 81-frame 14B geometry takes >40 min
    to compile remotely) and projects the reference's benchmark workload:

      reference row: Wan2.2-t2v-14B (high+low fp8), 880x480, 81 frames,
      20 steps x 2 think-steps -> 16:23 min on RTX Pro 6000
      (reference README.md:240-246, BASELINE.md).

    Projection model (stated assumptions, all fields emitted):
    * forwards = ((20-1) x (2+1) + 1) pair calls x 2 (cond+uncond CFG) = 116
      14B forwards (reference cost model README.md:528; outer early stop 1).
    * 14B @ 81f latent = (16ch, 21, 60, 110), patch (1,2,2) -> 34650 tokens;
      analytic FLOPs per forward from wan_forward_tflops (same formula the
      5B measurement's achieved-TFLOP/s uses).
    * projected time = forwards x flops_14b / achieved_rate — i.e. the 14B
      is assumed to sustain the 5B's measured TFLOP/s.  Conservative for
      GEMMs (larger M/K/N), optimistic for attention (54% of 14B-81f FLOPs
      vs 18% at the measured shape); the two biases partially cancel.
    * single-chip value assumes the 28 GB bf16 weights fit (they do not on
      one 16 GB v5e — the 14B REQUIRES the tensor=2+ mesh, see
      parallel/mesh.py + MULTICHIP dryrun); the v5e-8 value assumes linear
      scaling over the mesh (ICI efficiency unmeasured without hardware).
    """
    from lanpaint_tpu.models.wan import WAN22_T2V_14B_CONFIG, WAN22_TI2V_5B_CONFIG
    from lanpaint_tpu.models.zoo import build_wan

    cfg = WAN22_TI2V_5B_CONFIG
    frames, hh, ww = 10, 40, 54
    calls = 4
    params = jax.device_put(_fast_wan_params(cfg))
    den, _ = build_wan(cfg, params)

    x0 = jnp.zeros((1, cfg.in_channels, frames, hh, ww), jnp.float32)
    cond = {"context": jax.random.normal(
        jax.random.PRNGKey(0), (1, WAN_TEXT_TOKENS, cfg.context_dim),
        jnp.float32) * 0.02}
    t = jnp.full((1,), 0.6)
    tokens = (frames // cfg.patch[0]) * (hh // cfg.patch[1]) * (ww // cfg.patch[2])

    def chain(p, x, c):
        c = den.precompute(p, c)

        def body(carry, _):
            out = den.raw_apply(p, carry, t, c)
            return out.astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=calls)
        return out

    fn = jax.jit(chain)
    t0 = time.perf_counter()
    fn(params, x0, cond).block_until_ready()
    log(f"bench: wan compile+warmup {time.perf_counter() - t0:.0f}s")
    best = float("inf")
    for _ in range(3):
        tt = time.perf_counter()
        float(jnp.sum(fn(params, x0, cond).astype(jnp.float32)))
        best = min(best, time.perf_counter() - tt)
    fwd_s = best / calls

    flops_5b = wan_forward_tflops(cfg, tokens, WAN_TEXT_TOKENS)
    rate = flops_5b / fwd_s                      # achieved TFLOP/s
    # reference workload: 14B, 880x480 x 81f -> latent (21, 60, 110)
    tokens_14b = 21 * (60 // 2) * (110 // 2)
    flops_14b = wan_forward_tflops(WAN22_T2V_14B_CONFIG,
                                   tokens_14b, WAN_TEXT_TOKENS)
    pair_calls = (STEPS - 1) * (2 + 1) + 1       # 20 steps x 2 think
    forwards = pair_calls * 2
    proj_chip = forwards * flops_14b / rate
    proj_v5e8 = proj_chip / 8.0
    return {
        "forward_ms_5b_s5400": round(fwd_s * 1e3, 1),
        "tokens": tokens,
        "model_tflops_5b": round(flops_5b, 2),
        "achieved_tflops": round(rate, 1),
        "mfu": round(rate / V5E_PEAK_TFLOPS, 4),
        "model_tflops_14b_81f": round(flops_14b, 1),
        "forwards_81f": forwards,
        "wan_projected_81f_s": round(proj_chip, 1),
        "wan_projected_81f_v5e8_s": round(proj_v5e8, 1),
        "ref_81f_s": WAN_REF_81F_SECONDS,
        "vs_reference_v5e8": round(WAN_REF_81F_SECONDS / proj_v5e8, 2),
        "note": "projection: measured 5B rate applied to 14B-81f FLOPs; "
                "14B needs tensor>=2 mesh for memory; v5e-8 assumes linear "
                "scaling (see _wan_metric docstring for the full model)",
    }


def _tpu_selftest(timeout_s: float) -> str:
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
            capture_output=True, text=True, timeout=timeout_s,
            # run on the REAL chip: without this the tests/conftest.py
            # CPU-forcing makes every skipif(backend=="cpu") case skip and
            # the selftest is vacuous (caught r3)
            env={**os.environ, "LANPAINT_TEST_TPU": "1"},
        )
        if proc.returncode == 0:
            tail = proc.stdout.strip().splitlines()
            return "pass " + (tail[-1] if tail else "")
        return "fail: " + proc.stdout[-300:].replace("\n", " ")
    except subprocess.TimeoutExpired:
        return f"skipped: exceeded {timeout_s:.0f}s budget"
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
        }), flush=True)
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
    try:
        secs = _time_path(fused=False)
    except Exception as e:  # r3 failure mode: a crash before ANY output
        print(json.dumps({
            "metric": "sdxl1024_inpaint_20x5think_wallclock",
            "value": None, "unit": "seconds", "vs_baseline": None,
            "error": f"headline run failed: {repr(e)[:500]}",
        }), flush=True)
        raise
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
        "skipped_blocks": [],
    }
    _emit(result)  # the official record exists from this point on

    def block(name: str, est_s: float, gate: bool, fn) -> None:
        """Run one optional measurement block under the wall-clock budget;
        re-emit the full JSON after it (success, failure or skip)."""
        if not gate:
            return
        if _remaining() < est_s:
            result["skipped_blocks"].append(
                f"{name}: est {est_s:.0f}s > remaining {_remaining():.0f}s")
            _emit(result)
            return
        log(f"bench: block {name} (est {est_s:.0f}s, "
            f"remaining {_remaining():.0f}s)")
        try:
            fn()
        except Exception as e:  # record, keep the headline alive
            result[f"{name}_error"] = repr(e)[:300]
        _emit(result)

    env = os.environ.get

    def wan_block():
        result["wan"] = _wan_metric()

    def splash_block():
        # splash-attention A/B: same program with the legacy flash kernel at
        # the S=4096 SDXL shape (module-level USE_SPLASH flip), measured in
        # the SAME run.  negative delta = splash is faster.
        from lanpaint_tpu.models import layers as _layers

        _layers.USE_SPLASH = False
        try:
            secs_flash = _time_path(fused=False)
        finally:
            _layers.USE_SPLASH = True
        result["flash_seconds"] = round(secs_flash, 3)
        result["splash_delta_s"] = round(secs - secs_flash, 3)

    def b4_block():
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

    def fused_block():
        # fused Pallas pointwise path: measured in the SAME run or not at
        # all — never a replayed dated constant (VERDICT r2 item 5)
        secs_fused = _time_path(fused=True)
        result["fused_delta_s"] = round(secs_fused - secs, 3)
        result["fused_seconds"] = round(secs_fused, 3)

    def kvhoist_block():
        # the same program WITHOUT the run-constant cross-KV hoist
        # (Denoiser.precompute=None) — negative delta = the hoist is faster
        secs_nohoist = _time_path(fused=False, kv_hoist=False)
        result["kvhoist_off_seconds"] = round(secs_nohoist, 3)
        result["kvhoist_delta_s"] = round(secs - secs_nohoist, 3)

    def qkv_block():
        # unfused-QKV layout of the same program
        secs_unfused = _time_path(fused=False, fused_qkv=False)
        result["qkv_unfused_seconds"] = round(secs_unfused, 3)
        result["qkv_fusion_delta_s"] = round(secs - secs_unfused, 3)

    def quality_block():
        result["quality"] = _quality_canary()

    if env("LANPAINT_BENCH_FUSED") != "1":
        result["fused_delta_s_note"] = (
            "not measured this run; LANPAINT_BENCH_FUSED=1 measures both "
            "paths live (2026-08-17 measurement was +0.88 s — the reason "
            "use_fused_kernels defaults off)")

    # order: cheapest-per-value first under a tight budget; the wan metric
    # is the only reference-anchored number, so it goes before the A/Bs
    block("wan", 600, env("LANPAINT_BENCH_WAN") != "0", wan_block)
    block("splash", 360, env("LANPAINT_BENCH_SPLASH") != "0", splash_block)
    block("b4", 480, env("LANPAINT_BENCH_B4") != "0", b4_block)
    block("fused", 360, env("LANPAINT_BENCH_FUSED") == "1", fused_block)
    block("kvhoist", 360, env("LANPAINT_BENCH_KVHOIST") == "1", kvhoist_block)
    block("qkv", 420, env("LANPAINT_BENCH_QKV") == "1", qkv_block)
    block("quality", 180, env("LANPAINT_BENCH_QUALITY") == "1", quality_block)

    if env("LANPAINT_BENCH_SELFTEST") != "0":
        if _remaining() < 300:
            result["tpu_selftest"] = (
                f"skipped: {_remaining():.0f}s left of "
                f"LANPAINT_BENCH_BUDGET_S={BUDGET_S:.0f}")
        else:
            log(f"bench: on-chip selftest ({_remaining():.0f}s budget)")
            result["tpu_selftest"] = _tpu_selftest(_remaining())
        _emit(result)


if __name__ == "__main__":
    main()
