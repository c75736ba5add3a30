"""bench.py guard logic (no Spark session needed): the v5 history
guard that catches SUSTAINED contamination — both runs of a query
equally slow, so first/min spread and loadavg stay quiet (the r05
driver tail's failure mode) — and the committed-history loader that
feeds it."""

from __future__ import annotations

import json
import re
import subprocess

import bench


def test_history_suspects_flags_sustained_contamination():
    history = {"sla_trend": 0.79, "cohort_ltv": 0.49, "fast_q": 0.05,
               "steady": 2.0}
    timings = {
        "sla_trend": 10.63,   # the r05 driver tail numbers
        "cohort_ltv": 7.43,
        "steady": 2.1,        # within band -> clean
        "fast_q": 0.4,        # micro-query, absolute floor -> ignored
        "new_query": 3.0,     # no history -> ignored
    }
    got = bench._history_suspects(timings, history)
    assert set(got) == {"sla_trend", "cohort_ltv"}
    assert got["sla_trend"] > 13 and got["cohort_ltv"] > 15


def test_history_suspects_thresholds_exact():
    # ratio must EXCEED 2.5; timings <= 0.5s and history <= 0.2s are out
    assert bench._history_suspects({"q": 2.5}, {"q": 1.0}) == {}
    assert bench._history_suspects({"q": 2.51}, {"q": 1.0}) == {"q": 2.51}
    assert bench._history_suspects({"q": 0.5}, {"q": 0.1}) == {}
    assert bench._history_suspects({"q": 5.0}, {"q": 0.2}) == {}


def test_committed_history_is_elementwise_min_over_last_three():
    """The loader must take the per-query MIN across the last three
    committed sidecars — a single-version guard would compare against
    a contaminated committed record (the r05 driver run committed
    sla_trend at 10.6 s).  Recomputed independently from git here."""
    hist = bench._committed_history()
    if not hist:  # fresh clone without sidecar history: loader is a no-op
        return
    hashes = subprocess.run(
        ["git", "-C", bench.REPO, "log", "-n", "3", "--format=%H",
         "--", "bench_last.json"],
        capture_output=True, text=True, timeout=30,
    ).stdout.split()
    want: dict[str, float] = {}
    for h in hashes:
        blob = subprocess.run(
            ["git", "-C", bench.REPO, "show", f"{h}:bench_last.json"],
            capture_output=True, text=True, timeout=30,
        )
        if blob.returncode != 0:
            continue
        for k, v in json.loads(blob.stdout).get("queries", {}).items():
            if isinstance(v, (int, float)) and v > 0:
                want[k] = min(want.get(k, v), v)
    assert hist == want
    # the r05 contamination case: the driver-committed 10.6 s sla_trend
    # must NOT be the reference when an older committed sidecar carries
    # the true sub-second cost
    if "sla_trend" in want:
        assert want["sla_trend"] < 2.0


def test_quarantine_replaces_contaminated_timings_in_place():
    """v6 quarantine: history-flagged suspects are re-measured; a
    faster fresh number replaces the contaminated one in `timings`
    (original preserved in the return), a slower or failed re-measure
    changes nothing, and non-suspects are never re-measured."""
    history = {"hot": 0.4, "truly_slow": 0.4, "clean": 1.0, "broken": 0.4}
    timings = {"hot": 1.35, "truly_slow": 1.5, "clean": 1.1,
               "broken": 1.4, "no_history": 9.9}
    fresh = {"hot": 0.40, "truly_slow": 1.45, "broken": -1.0}
    calls: list[str] = []

    def remeasure(name):
        calls.append(name)
        return fresh[name]

    q = bench._quarantine(timings, history, remeasure)
    assert calls == ["broken", "hot", "truly_slow"]  # suspects only, sorted
    assert q == {"hot": 1.35, "truly_slow": 1.5}
    assert timings["hot"] == 0.40          # contamination replaced
    assert timings["truly_slow"] == 1.45   # still slow: best-known cost
    assert timings["broken"] == 1.4        # failed re-measure: unchanged
    assert timings["clean"] == 1.1 and timings["no_history"] == 9.9
    # post-quarantine, the guard no longer flags the healed query
    assert "hot" not in bench._history_suspects(timings, history)


def test_quarantine_replay_of_r06_driver_numbers_heals_the_record():
    """The v6 design criterion (round-6 verdict #4): replaying the r06
    driver sidecar's contaminated interleaved numbers with the judge's
    standalone re-measurements as the 'fresh' timings must produce a
    queries map whose history guard flags none of that cluster.

    The history is FROZEN at the r06-era committed floors: the live
    ``_committed_history()`` min keeps dropping as the engine gets
    faster (the r10 clean anchor put range_join_months at 0.26 s), and
    against a newer, lower floor the same 0.69 s re-measure is
    LEGITIMATELY still suspect — this test checks the healing
    mechanism, not the current repo's speed."""
    # r06-era committed floors (what _committed_history() returned then)
    hist = {"range_join_months": 0.66, "anti_join_inactive": 0.40,
            "semi_join_active": 0.42}
    # r06 contaminated values (driver sidecar) / judge standalone truths
    timings = {"range_join_months": 1.65, "anti_join_inactive": 1.35,
               "semi_join_active": 0.92}
    fresh = {"range_join_months": 0.69, "anti_join_inactive": 0.40,
             "semi_join_active": 0.44}
    q = bench._quarantine(timings, hist, lambda n: fresh[n])
    assert bench._history_suspects(timings, hist) == {}
    assert set(q) <= set(fresh)


def test_replaying_r05_driver_numbers_flags_the_tail_cluster():
    """The guard's design criterion (round-5 verdict #3): the driver's
    own r05 bench numbers, judged against the committed history, must
    flag the sustained-contamination tail cluster that the v4 spread
    guard missed."""
    try:
        raw = json.load(open(f"{bench.REPO}/BENCH_r05.json"))
    except FileNotFoundError:
        return
    tail = raw.get("tail", "")
    drv = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
    }
    hist = bench._committed_history()
    if not drv or not hist:
        return
    flagged = bench._history_suspects(drv, hist)
    for name in ("sla_trend", "cohort_ltv", "bandit_replay"):
        if name in drv and name in hist:
            assert name in flagged


def test_boxcheck_fields_and_verdicts():
    """tools/boxcheck.py: probes return plausible values and the
    verdict logic separates the round-7 failure classes."""
    import tools.boxcheck as bc

    assert 0 < bc.py_loop() < 60
    assert 0 < bc.blas_matmul() < 120
    s = bc.steal_pct(interval=0.1)
    assert s == -1.0 or 0.0 <= s <= 100.0
    # bench integration: the sidecar helper never raises
    got = bench._boxcheck()
    assert ("py_loop_s" in got and "blas_matmul_s" in got) or "error" in got


def test_wait_healthy_requires_sustained_window(monkeypatch):
    """The r08 gate: 5 consecutive sub-0.2 probe readings pass; an
    oscillating box (the round-8 event flipped healthy->degraded within
    seconds) keeps resetting the streak until the budget runs out."""
    sleeps: list[float] = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)

    stable = iter([0.05, 0.1, 0.02, 0.15, 0.08])
    assert bench._wait_healthy(10, probe=lambda: next(stable)) is True
    # between-probe spacing is the 20 s confirmation cadence
    assert sleeps == [20, 20, 20, 20]

    # oscillation: every 4th reading degrades -> streak never hits 5
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: clock["t"])

    def osc_probe(state={"i": 0}):
        state["i"] += 1
        clock["t"] += 30.0  # advance the budget clock per probe
        return 1.4 if state["i"] % 4 == 0 else 0.05

    assert bench._wait_healthy(5, probe=osc_probe) is False

    # probe failure -> proceed (False), never raise
    def broken():
        raise OSError("no numpy")

    assert bench._wait_healthy(1, probe=broken) is False


def test_fp_flip_suspects_detects_midrun_flip():
    """Synthetic throttle scenario (round-9 verdict #4): a mid-run FP
    flip between canary samples must flag exactly the queries timed
    from the last clean reading to the next clean one — the windows the
    round-8 endpoint gates were blind to."""
    run_order = [f"q{i}" for i in range(1, 101)]
    series = [
        {"at": 0, "query": "<pre-loop>", "seconds": 0.30},
        {"at": 25, "query": "q25", "seconds": 0.31},
        {"at": 50, "query": "q50", "seconds": 2.90},   # flip
        {"at": 75, "query": "q75", "seconds": 0.32},   # recovered
        {"at": 100, "query": "<end>", "seconds": 0.30},
    ]
    got = bench._fp_flip_suspects(series, run_order)
    assert got == {f"q{i}" for i in range(26, 76)}


def test_fp_flip_suspects_edges_and_failures():
    run_order = [f"q{i}" for i in range(1, 51)]
    # clean run -> nothing flagged
    clean = [{"at": a, "seconds": 0.3} for a in (0, 25, 50)]
    assert bench._fp_flip_suspects(clean, run_order) == set()
    # flip on the FINAL reading: window extends to end of run
    tail = [{"at": 0, "seconds": 0.3}, {"at": 25, "seconds": 0.3},
            {"at": 50, "seconds": 1.2}]
    assert bench._fp_flip_suspects(tail, run_order) == {
        f"q{i}" for i in range(26, 51)}
    # flip on the BASELINE reading: window starts at query 1
    head = [{"at": 0, "seconds": 1.2}, {"at": 25, "seconds": 0.3},
            {"at": 50, "seconds": 0.3}]
    assert bench._fp_flip_suspects(head, run_order) == {
        f"q{i}" for i in range(1, 26)}
    # failed readings neither flag nor clear
    failed = [{"at": 0, "seconds": 0.3}, {"at": 25, "seconds": -1.0},
              {"at": 50, "seconds": 0.31}]
    assert bench._fp_flip_suspects(failed, run_order) == set()
    # two consecutive flips merge into one window
    double = [{"at": 0, "seconds": 0.3}, {"at": 25, "seconds": 1.0},
              {"at": 50, "seconds": 1.1}, {"at": 75, "seconds": 0.3}]
    assert bench._fp_flip_suspects(double, run_order) == {
        f"q{i}" for i in range(1, 51)}
    # all-failed series -> no baseline, nothing flagged
    assert bench._fp_flip_suspects(
        [{"at": 0, "seconds": -1.0}], run_order) == set()


def test_quarantine_extra_names_remeasured():
    """FP-flip windows re-measure through the same quarantine pass even
    when the history ratio stays under the 2.5x gate."""
    timings = {"a": 1.0, "b": 3.0}
    history = {"a": 0.9, "b": 2.8}       # neither is a history suspect
    calls = []

    def remeasure(name):
        calls.append(name)
        return 0.5

    got = bench._quarantine(timings, history, remeasure, extra={"b"})
    assert calls == ["b"]
    assert got == {"b": 3.0} and timings["b"] == 0.5
    assert timings["a"] == 1.0
