"""Kernel-scaling window probe: run ONLY the graded kernel phases
(scaling + ceiling calibration + skew twin) and print their JSON — used
to find a quiet measurement window without paying for the full suite.

Usage: python tools/bench_kernel_probe.py [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else bench.KERNEL_TRIALS
    t0 = time.time()
    ks = bench._kernel_scaling(trials)
    c_lo = bench._calibration_run(bench.SCALE_LO)
    c_hi = bench._calibration_run(bench.SCALE_HI)
    ratio = bench.SCALE_HI / bench.SCALE_LO
    c_speed = c_lo["wall_s"] / c_hi["wall_s"]
    k_speed = ks["low"]["wall_s"] / ks["high"]["wall_s"]
    skew = bench._kernel_skew(ks["high"]["wall_s"])
    out = {
        "probe": True,
        "n_trials": ks["n_trials"],
        "per_trial_efficiency": ks["per_trial_efficiency"],
        "scaling_efficiency": ks["best_within_window_efficiency"],
        "median_within_window_efficiency":
            ks["median_within_window_efficiency"],
        "crosswindow_efficiency": round(k_speed / ratio, 3),
        "contended_window": ks["best_within_window_efficiency"] < 0.8,
        "machine_ceiling_efficiency": round(c_speed / ratio, 3),
        "efficiency_vs_machine_ceiling": round(k_speed / c_speed, 3),
        "low_walls": ks["low"]["trial_walls"],
        "mid_walls": ks["mid"]["trial_walls"],
        "high_walls": ks["high"]["trial_walls"],
        "high_urls_per_sec": ks["high"]["urls_per_sec"],
        "skew_per_pair": skew["per_pair_skew_over_uniform"],
        "skew_over_uniform": skew["skew_over_uniform"],
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
