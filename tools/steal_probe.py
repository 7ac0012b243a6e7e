"""Measure box-weather from inside the guest: CPU steal under full
demand, single-core compute throughput, and memory-copy bandwidth.

Usage: python tools/steal_probe.py [seconds]   (default 5)

This box is a Firecracker microVM: host-level contention is invisible
to loadavg/ps inside the guest. Three probes, three failure modes:

- steal_pct — share of *demanded* cycles the host withheld while all
  cores spin (scheduling contention). Samples on an idle guest ranged
  0.3% to 22.4% within minutes (2026-08-17).
- sgemm_gflops — single-core numpy matmul (compute-bound; sensitive
  to host clock/turbo, blind to scheduling steal when cores are idle).
- memcpy_gbps — 512 MiB array copy (memory-bound; sensitive to host
  memory-bandwidth/LLC contention, which NEITHER other probe sees —
  a bench run measured uniformly +25% slow with steal at 0.3-1.2%).

Run immediately before/after a bench to bracket its box-weather;
compare against the committed baselines in SCALE.md. Prints one JSON
line; exits 0 always (it is a measurement, not a gate).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

# Pin BLAS to one thread BEFORE numpy loads so sgemm_gflops measures
# one core's throughput, not the threadpool's scheduling luck.
for _v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "BLIS_NUM_THREADS",
):
    os.environ.setdefault(_v, "1")


def _ticks() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def _spin(seconds: float) -> None:
    end = time.time() + seconds
    while time.time() < end:
        pass


def steal(seconds: float) -> tuple[float, float]:
    """(steal % of demanded cycles, busy % of total) over a full-demand
    spin of every core."""
    ncpu = os.cpu_count() or 1
    before = _ticks()
    procs = [
        mp.Process(target=_spin, args=(seconds,)) for _ in range(ncpu)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    delta = [b - a for a, b in zip(before, _ticks())]
    total = sum(delta[:8])
    busy = total - delta[3] - delta[4]  # minus idle, iowait
    return (
        round(100.0 * delta[7] / busy, 1) if busy > 0 else 0.0,
        round(100.0 * busy / total, 1) if total > 0 else 0.0,
    )


def sgemm_gflops() -> float | None:
    """Single-core 1024x1024 float64 matmul, best of 3."""
    try:
        import numpy as np
    except ImportError:
        return None
    a = np.random.default_rng(7).random((1024, 1024))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a @ a
        best = min(best, time.perf_counter() - t0)
    return round(2 * 1024**3 / best / 1e9, 1)


def memcpy_gbps() -> float | None:
    """512 MiB contiguous copy (read+write bytes), best of 3."""
    try:
        import numpy as np
    except ImportError:
        return None
    a = np.zeros(512 * 1024 * 1024 // 8, dtype=np.float64)
    # ADVICE r11: materialize the source — an untouched np.zeros stays
    # backed by the shared copy-on-write zero page, so reads never hit
    # DRAM and the "copy bandwidth" was write bandwidth + fault
    # overhead. A throwaway copy also pre-faults the allocator path.
    a[:] = 1.0
    a.copy()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a.copy()
        best = min(best, time.perf_counter() - t0)
    return round(2 * a.nbytes / best / 1e9, 1)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    s, b = steal(seconds)
    print(
        json.dumps(
            {
                "steal_pct": s,
                "busy_pct": b,
                "sgemm_gflops": sgemm_gflops(),
                "memcpy_gbps": memcpy_gbps(),
                "seconds": seconds,
            }
        )
    )


if __name__ == "__main__":
    main()
