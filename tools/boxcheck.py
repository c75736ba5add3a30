#!/usr/bin/env python
"""One-shot box-health probe: is this machine fit to benchmark on?

Rounds 4-7 repeatedly needed the same engine-vs-environment
separation: bench numbers inflate, and the question is whether the
ENGINE regressed or the BOX is sick (co-tenant CPU steal, AVX/vector
throttling, IO stall).  This tool runs the round-7 evidence chain in
~5 s and prints ONE JSON line:

- ``py_loop_s``     — 1e7-iteration pure-Python loop.  Tests scalar
                      CPU + interpreter health; ~1.4 s on this box
                      class.  Slow here = general CPU contention.
- ``blas_matmul_s`` — 2000x64 @ 64x2000 OpenBLAS matmul (~512 MFLOP);
                      ~0.005-0.05 s healthy.  Slow here while the
                      loop is normal = vector/FP-unit degradation
                      (the 05:00 round-7 event measured 6-8 s: ~1000x)
                      — co-tenant AVX pressure, not engine code.
- ``steal_pct``     — hypervisor steal from /proc/stat deltas over
                      0.5 s.  Nonzero = a neighbor VM is taking cycles.
- ``loadavg1``      — with ``n_running``; loadavg >> running tasks
                      means D-state/steal inflation, not our work.
- ``verdict``       — "healthy" | "degraded_fp" | "contended":
                      degraded_fp = matmul > 20x its healthy bound
                      while the python loop is within 3x; contended =
                      both slow or steal/load high.

Exit code 0 = healthy, 1 = anything else, so scripts can gate:

    python tools/boxcheck.py || echo "do not trust bench numbers now"
"""

from __future__ import annotations

import json
import os
import time

PY_LOOP_HEALTHY_S = 1.5
MATMUL_HEALTHY_S = 0.08


def py_loop() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    assert s == 49999995000000
    return round(time.perf_counter() - t0, 3)


def blas_matmul() -> float:
    """WARM matmul cost: one untimed warm-up call, then min of 3.

    Round-8 finding: the first matmul in a fresh process pays OpenBLAS
    thread-pool spin-up + page faults + frequency ramp — 0.2-2.4 s of
    pure init on a perfectly healthy box (all 32 cores then read
    ~0.023 s warm).  The round-8 morning's "oscillating degradation"
    (readings flipping 0.04 ↔ 1.8 between 5-min watcher samples) was
    exactly this artifact: every watcher sample was a cold process.
    Warm min-of-3 measures the FP units themselves; the genuinely
    degraded r07 event still reads 6-8 s here (1000× the warm bound,
    far past any init cost).  Use :func:`blas_matmul_cold` when the
    init cost itself is the question."""
    import numpy as np

    x = np.random.rand(2000, 64)
    (x @ x.T).sum()  # warm-up: thread pool, pages, clocks
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (x @ x.T).sum()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def blas_matmul_cold() -> float:
    """First-call matmul including library/thread/page init — the
    pre-round-8 probe semantics, kept for init-latency diagnostics."""
    import numpy as np

    x = np.random.rand(2000, 64)
    t0 = time.perf_counter()
    (x @ x.T).sum()
    return round(time.perf_counter() - t0, 3)


def fp_load_spread(n_procs: int = 16, seconds: float = 1.5) -> float:
    """Max/min per-process matmul rate under SUSTAINED all-core FP
    load — the round-8 partial-degradation signature.

    The round-8 co-tenant state throttles the vector units of a SUBSET
    of cores only under sustained load: a 3 s 32-process sweep measured
    per-process rates of 2..35 matmuls/s (17× spread) while the
    single-shot warm probe read a healthy 0.014 s, scalar scaling was
    near-perfect, and steal was ~0.  Spark stages running Arrow/BLAS
    workers on every core are gated by the straggler cores, which is
    exactly how the ANN/embedding query family inflated 1.7-2.2× while
    every point probe stayed green.  Healthy boxes read < 3; the
    observed event reads > 10.  Returns -1.0 on any failure (never
    raises)."""
    import multiprocessing as mp

    try:
        ctx = mp.get_context("fork")
        with ctx.Pool(n_procs) as pool:
            rates = pool.map(_fp_worker, [seconds] * n_procs)
        lo = min(rates)
        return round(max(rates) / lo, 1) if lo > 0 else float("inf")
    except Exception:
        return -1.0


def _fp_worker(seconds: float) -> float:
    import numpy as np

    x = np.random.rand(2000, 64)
    (x @ x.T).sum()
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        (x @ x.T).sum()
        n += 1
    return n / seconds


def steal_pct(interval: float = 0.5) -> float:
    def snap():
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        vals = [int(v) for v in f[1:]]
        return sum(vals), (vals[7] if len(vals) > 7 else 0)

    try:
        t1, s1 = snap()
        time.sleep(interval)
        t2, s2 = snap()
        dt = t2 - t1
        return round(100.0 * (s2 - s1) / dt, 2) if dt else 0.0
    except OSError:
        return -1.0


def main() -> int:
    # loadavg/n_running first: the fp_load_spread pool would inflate
    # them with the probe's own 16 runners
    try:
        la1 = round(os.getloadavg()[0], 2)
    except OSError:
        la1 = -1.0
    try:
        with open("/proc/loadavg") as fh:
            n_running = int(fh.read().split()[3].split("/")[0])
    except (OSError, ValueError, IndexError):
        n_running = -1
    loop_s = py_loop()
    mat_s = blas_matmul()
    spread = fp_load_spread()
    steal = steal_pct()

    fp_bad = mat_s > 20 * MATMUL_HEALTHY_S
    cpu_bad = loop_s > 3 * PY_LOOP_HEALTHY_S
    if fp_bad and not cpu_bad:
        verdict = "degraded_fp"
    elif spread > 5 and not cpu_bad:
        verdict = "degraded_fp_partial"
    elif cpu_bad or steal > 5 or (la1 > 8 and n_running <= 2):
        verdict = "contended"
    else:
        verdict = "healthy"

    print(json.dumps({
        "py_loop_s": loop_s,
        "blas_matmul_s": mat_s,
        "fp_load_spread": spread,
        "steal_pct": steal,
        "loadavg1": la1,
        "n_running": n_running,
        "verdict": verdict,
    }))
    return 0 if verdict == "healthy" else 1


if __name__ == "__main__":
    raise SystemExit(main())
