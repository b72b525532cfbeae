"""Spark-free host scaling calibration: the same 32 units of pure-python
spin work executed on 8 pinned cores vs 32 pinned cores. The resulting
t8/(4*t32) is the host's raw scaling ceiling in the current measurement
window (shared host: frequency scaling + steal vary by the hour) —
context for BENCH/BASELINE.md's efficiency numbers.

Usage: python tools/spin_calibration.py
"""

from __future__ import annotations

import subprocess
import sys
import time

WORK = "n=0\nfor i in range(60_000_000): n+=i\n"


def run(cpus: int) -> float:
    t0 = time.time()
    ps = [
        subprocess.Popen(
            ["taskset", "-c", str(c % cpus), sys.executable, "-c", WORK]
        )
        for c in range(32)  # identical total work at both sizes
    ]
    for p in ps:
        p.wait()
    return time.time() - t0


def main() -> None:
    run(32)  # warm
    t32 = min(run(32) for _ in range(2))
    t8 = min(run(8) for _ in range(2))
    eff = (t8 / t32) / 4
    print(f"t8={t8:.2f}s t32={t32:.2f}s ceiling_efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
