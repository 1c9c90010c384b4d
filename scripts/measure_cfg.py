"""Re-measure sequential vs batched CFG on the SDXL headline (real chip).

The shipped default (`sequential_cfg=True`) was measured BEFORE the
import-time QKV fusion landed (r3): per-pair 2 x 77.1 ms sequential vs
161.7 ms batched.  The fusion changed every GEMM M-dimension the batched
pass doubles, so the comparison must be redone on the current program
(VERDICT r3 task 3 lever list).

Usage:  python scripts/measure_cfg.py [--steps 20] [--think 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--think", type=int, default=5)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "run on the real chip"

    from scripts.profile_headline import build_run

    results = {}
    for label, seq in [("sequential", True), ("batched", False)]:
        run = build_run(args.steps, args.think, sequential_cfg=seq)
        print(f"{label}: compile + warmup...", file=sys.stderr)
        run(0)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            run(i + 1)
            best = min(best, time.perf_counter() - t0)
        results[label] = best
        print(f"{label}: {best:.3f} s")
    d = results["batched"] - results["sequential"]
    print(f"batched - sequential = {d:+.3f} s "
          f"({d / results['sequential'] * 100:+.1f}%)")


if __name__ == "__main__":
    main()
