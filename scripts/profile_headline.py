"""Profile the SDXL headline sampler on the real chip; print a device-time
breakdown by op class plus wall vs device totals.

The wall/device split is THE dispatch-overhead measurement (VERDICT r3
task 3: "the ~10% tunnel dispatch share"): the headline is one XLA
execution, so wall - device = launch + transport + host prep, not
per-op dispatch.

Usage:  python scripts/profile_headline.py [--steps 4] [--think 2]
Writes the raw trace under /tmp/lanpaint_headline_trace (xplane.pb).
"""

from __future__ import annotations

import argparse
import collections
import glob
import re
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/lanpaint_headline_trace"


def build_run(steps: int, think: int, sequential_cfg: bool = True):
    import dataclasses

    import ml_dtypes
    import numpy as onp

    from lanpaint_tpu import LanPaintConfig, LanPaintSampler
    from lanpaint_tpu.models.unet import SDXL_CONFIG
    from lanpaint_tpu.models.zoo import build_unet
    from lanpaint_tpu.sigmas import calculate_sigmas

    cfg_model = dataclasses.replace(SDXL_CONFIG, fused_qkv=True)
    den, params = build_unet(cfg_model, init_hw=32, name="sdxl")
    params = jax.tree.map(
        lambda p: onp.asarray(p).astype(ml_dtypes.bfloat16), params)
    den_bf16, _ = build_unet(cfg_model, params, name="sdxl")

    latent = jnp.zeros((1, 4, 128, 128), jnp.float32)
    mask = np.zeros((1024, 1024), np.float32)
    mask[256:768, 256:768] = 1.0
    cond = {"context": jnp.zeros((1, 77, 2048), jnp.float32),
            "y": jnp.zeros((1, 2816), jnp.float32)}
    uncond = {"context": jnp.ones((1, 77, 2048), jnp.float32) * 0.1,
              "y": jnp.zeros((1, 2816), jnp.float32)}
    sigmas = jnp.asarray(calculate_sigmas(den_bf16.sigma_table, "karras", steps))
    sam = LanPaintSampler(
        den_bf16, config=LanPaintConfig(n_steps=think, outer_early_stop=1),
        sampler_name="euler", cfg=5.0, sequential_cfg=sequential_cfg)

    def run(seed):
        out, _ = sam(latent=latent, sigmas=sigmas, cond=cond, uncond=uncond,
                     mask=mask, seed=seed)
        return float(jnp.sum(out.astype(jnp.float32)))

    return run


_CLASSES = [
    ("dynamic-slice", re.compile(r"dynamic.?slice", re.I)),
    ("dynamic-update-slice", re.compile(r"dynamic.?update", re.I)),
    ("copy", re.compile(r"^copy", re.I)),
    ("convolution", re.compile(r"conv", re.I)),
    ("flash/splash kernel", re.compile(r"flash|splash|custom-call", re.I)),
    ("pallas norm", re.compile(r"norm_kernel|pallas", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("dot/gemm fusion", re.compile(r"dot|gemm|matmul", re.I)),
    ("other fusion", re.compile(r"fusion", re.I)),
]


def classify(name: str) -> str:
    for label, pat in _CLASSES:
        if pat.search(name):
            return label
    return "misc"


def summarize(trace_dir: str) -> None:
    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    pd = jax.profiler.ProfileData.from_file(paths[-1])
    per_class = collections.Counter()
    per_op = collections.Counter()
    device_total = 0.0
    for plane in pd.planes:
        is_device = ("TPU" in plane.name or "/device" in plane.name.lower()
                     ) and "host" not in plane.name.lower()
        if not is_device:
            continue
        for line in plane.lines:
            # XLA op lines carry the per-op events; step lines duplicate
            lname = line.name.lower()
            if "xla op" not in lname and "ops" not in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e9
                per_class[classify(ev.name)] += dur
                per_op[ev.name] += dur
                device_total += dur
    print(f"\ndevice total (XLA-op lines): {device_total:.3f} s")
    for label, t in per_class.most_common():
        print(f"  {label:24s} {t:8.3f} s  {t / device_total * 100:5.1f}%")
    print("\ntop 15 ops:")
    for name, t in per_op.most_common(15):
        print(f"  {t:8.4f} s  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--think", type=int, default=2)
    ap.add_argument("--batched-cfg", action="store_true")
    ap.add_argument("--parse-only", action="store_true",
                    help="just summarize an existing trace dir")
    args = ap.parse_args()
    if args.parse_only:
        summarize(TRACE_DIR)
        return

    assert jax.default_backend() == "tpu", "run on the real chip"
    run = build_run(args.steps, args.think,
                    sequential_cfg=not args.batched_cfg)
    print("compile + warmup...", file=sys.stderr)
    t0 = time.perf_counter()
    run(0)
    print(f"warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    run(1)
    wall_untraced = time.perf_counter() - t0
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    run(2)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    pairs = (args.steps - 1) * (args.think + 1) + 1
    print(f"wall (untraced) {wall_untraced:.3f} s | wall (traced) {wall:.3f} s"
          f" | {pairs} pair-forwards")
    summarize(TRACE_DIR)


if __name__ == "__main__":
    main()
