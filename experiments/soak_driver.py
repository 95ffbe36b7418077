"""Soak driver: the reference-default experiment grid, end-to-end on TPU.

Runs the L5 driver exactly as the reference's __main__ would
(/root/reference/main.py:258-365 defaults: subset<=150k, experiments
subset_size/label_mode/noise_rate/sorting x 6 approaches x 2 label passes)
and reports wall time + peak host RSS (VERDICT r2 next #1: prove the system
at its own default scale).  Results land in logs/soak_r3/ + plots/soak_r3/;
the committed record is SOAK.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def vm_peak_gib() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return int(line.split()[1]) / 1024 / 1024
    return float("nan")


def main() -> int:
    from mused_tpu.main import cli
    t0 = time.time()
    rc = cli(["--dataset", "synthetic",
              "--log-dir", "logs/soak_r3/",
              "--plot-dir", "plots/soak_r3/"])
    wall_min = (time.time() - t0) / 60
    print(f"SOAK wall_minutes={wall_min:.1f} peak_rss_gib={vm_peak_gib():.2f}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
