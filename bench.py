"""Benchmark harness: run every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the sum of per-query best-of-2 wall-clock seconds (each
query fully materialized through the noop sink, cache cleared between
runs). Session/JVM startup is excluded; warm-up queries prime the JVM,
parquet footer cache, Arrow workers, MLlib, and streaming machinery so
timings reflect execution, not first-touch overhead; the best-of-2 rule
suppresses competing-load outliers (round 1 recorded a 32 s timing for
a query that re-times at 2 s).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def _committed_history() -> dict[str, float]:
    """Per-query best timings from the last COMMITTED sidecar.

    Round-5 verdict #3: the v4 load guard keys on first/min spread and
    loadavg — both blind to SUSTAINED contamination where every run of
    a query is equally slow (the r05 driver run's 10.6 s sla_trend /
    7.4 s cohort_ltv tail cluster sailed through unflagged, spread≈1.0).
    Committed bench_last.json versions are the cross-run reference the
    spread can't see.  Elementwise MIN over the last three committed
    versions, because a committed sidecar can itself be contaminated
    (the r05 driver run landed sla_trend at 10.6 s — a single-version
    guard would compare against the contamination); inflation only ever
    raises timings, so the min is the best-known true cost.  Replayed
    against the r05 driver numbers this flags exactly the
    sla_trend/cohort_ltv/bandit_replay tail cluster at 13-16x."""
    try:
        hashes = subprocess.run(
            ["git", "-C", REPO, "log", "-n", "3", "--format=%H",
             "--", "bench_last.json"],
            capture_output=True, text=True, timeout=30,
        ).stdout.split()
        hist: dict[str, float] = {}
        for h in hashes:
            blob = subprocess.run(
                ["git", "-C", REPO, "show", f"{h}:bench_last.json"],
                capture_output=True, text=True, timeout=30,
            )
            if blob.returncode != 0:
                continue
            for k, v in json.loads(blob.stdout).get("queries", {}).items():
                if isinstance(v, (int, float)) and v > 0:
                    hist[k] = min(hist.get(k, v), v)
        return hist
    except Exception:
        return {}


def _history_suspects(timings: dict[str, float],
                      history: dict[str, float]) -> dict[str, float]:
    """Queries whose best-of-2 exceeds 2.5x their best-known committed
    cost (> 0.5 s absolute, history > 0.2 s so micro-queries can't
    trip on scheduler jitter).  Returns {name: ratio}."""
    return {
        n: round(timings[n] / history[n], 2)
        for n in timings
        if n in history and timings[n] > 0.5 and history[n] > 0.2
        and timings[n] / history[n] > 2.5
    }


def _fp_flip_suspects(series: list[dict], run_order: list[str],
                      factor: float = 1.8) -> set[str]:
    """Map in-run worker-core FP-canary flips to the query names they
    contaminate (round-9 verdict #4: round 8 lost two full gated runs
    to mid-run partial-FP flips the ENDPOINT gates could not see).

    ``series`` is time-ordered ``[{"at": n_done_when_sampled,
    "seconds": s}, ...]`` (``at=0`` = the pre-loop baseline reading);
    ``run_order`` is the loop's query order, so the query timed as
    n_done=k is ``run_order[k-1]``.  A reading FLIPS when it exceeds
    ``factor`` × the run's own minimum clean reading (self-baselined:
    the canary's absolute cost depends on the box, its ratio does not).
    Every query timed between the last clean reading before a flip and
    the first clean reading after it ran under possible throttle —
    those names are returned for the end-of-run re-measure pass.
    Failed readings (seconds <= 0) are skipped: they neither flag nor
    clear a window."""
    good = [s["seconds"] for s in series if s.get("seconds", -1) > 0]
    if not good:
        return set()
    base = min(good)
    suspects: set[str] = set()
    for i, s in enumerate(series):
        sec = s.get("seconds", -1)
        if sec <= 0 or sec <= factor * base:
            continue
        prev_at = 0
        for p in reversed(series[:i]):
            if 0 < p.get("seconds", -1) <= factor * base:
                prev_at = p["at"]
                break
        next_at = len(run_order)
        for p in series[i + 1:]:
            if 0 < p.get("seconds", -1) <= factor * base:
                next_at = min(next_at, p["at"])
                break
        suspects.update(run_order[prev_at:next_at])
    return suspects


def _make_fp_canary(spark):
    """Build the ~0.3 s in-run worker-core FP micro-canary: 32 Arrow
    batches, each doing a sustained 96×96 matmul chain INSIDE a python
    worker — the embedding_topk-shaped load class that round 8 proved
    is the only reliable witness of partial per-core FP throttling
    (driver-side probes and pure-JVM canaries read healthy through it,
    SCALE.md round-8 finding #3).  Returns a zero-arg callable that
    runs one sample and returns wall seconds (-1 on failure)."""
    def work(batches):
        import numpy as np
        import pandas as pd

        a = np.random.RandomState(0).normal(size=(96, 96))
        for pdf in batches:
            acc = a.copy()
            for _ in range(60):
                acc = a @ acc
                acc *= 1.0 / np.abs(acc).max()  # keep finite
            yield pd.DataFrame({"x": [float(acc[0, 0]) + len(pdf)]})

    probe_df = spark.range(0, 32, 1, 32).mapInPandas(work, schema="x double")

    def run() -> float:
        try:
            t0 = time.perf_counter()
            probe_df.count()
            return round(time.perf_counter() - t0, 3)
        except Exception:
            return -1.0

    return run


def _quarantine(timings: dict[str, float], history: dict[str, float],
                remeasure, extra=frozenset()) -> dict[str, float]:
    """Round-6 verdict #4: re-measure every history-flagged suspect via
    ``remeasure(name) -> float`` (a fresh end-of-run timing, not the
    contaminated interleaved one), move the better number into
    ``timings`` IN PLACE, and return {name: contaminated_original} for
    the sidecar's ``quarantined`` field.  Inflation only ever raises a
    timing, so min(original, re-measure) is the best-known true cost; a
    re-measure that is slower or fails (<= 0) changes nothing.

    ``extra`` (round 9): additional names to re-measure regardless of
    the history ratio — the in-run FP-canary flip windows
    (:func:`_fp_flip_suspects`): a flip contaminates queries whose
    history ratio may stay under the 2.5× gate, so the per-window
    normalization happens here, through the same min(old, fresh)
    estimator.

    Methodology asymmetry (r07 advice): history-flagged queries get
    min(contaminated best-of-2..3, fresh best-of-2..3) — effectively
    best-of-up-to-6 samples — while unflagged queries stay best-of-2/3.
    That is a mild DOWNWARD estimator bias for exactly the flagged set,
    so cross-round totals are comparable only to within that bias; the
    sidecar's ``quarantined`` field identifies which entries carry it.
    Healed entries' ``spread`` is recomputed from the re-measure's OWN
    first run (not contaminated-first / fresh-best, which would inflate
    the spread diagnostic for healed queries)."""
    quarantined: dict[str, float] = {}
    names = set(_history_suspects(
        {n: t for n, t in timings.items() if t > 0}, history))
    names |= {n for n in extra if timings.get(n, -1) > 0}
    for name in sorted(names):
        best = remeasure(name)
        if 0 < best < timings[name]:
            quarantined[name] = timings[name]
            timings[name] = best
    return quarantined


def _boxcheck() -> dict:
    """Box-health snapshot (tools/boxcheck.py): pure-Python loop vs
    BLAS matmul vs hypervisor steal.  Run at start AND end of the
    bench so the sidecar itself says whether the box was fit to
    measure on — the round-7 closing run caught a co-tenant event
    that degraded ONLY vector/FP throughput ~1000× (scalar CPU
    normal), which no loadavg or spread guard can express."""
    try:
        import tools.boxcheck as bc

        return {
            "py_loop_s": bc.py_loop(),
            "blas_matmul_s": bc.blas_matmul(),
            "fp_load_spread": bc.fp_load_spread(),
            "steal_pct": bc.steal_pct(),
        }
    except Exception as e:  # diagnostics must never kill the bench
        return {"error": str(e)[:200]}


def _jvm_diag(spark) -> dict:
    """JVM health snapshot via java.lang.management (round-5 verdict
    #4): code-cache occupancy (the r05 positional-degradation root
    cause — a full code cache silently stops the JIT and tail queries
    run interpreted), cumulative GC time, heap, and Spark storage
    memory.  Lets the next reader of a contaminated-looking sidecar
    distinguish code-cache relapse / GC pressure / storage-memory leak
    (all visible here) from box co-tenancy (none of them move)."""
    out: dict = {}
    try:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        gc_ms = 0
        for b in mf.getGarbageCollectorMXBeans():
            t = b.getCollectionTime()
            if t > 0:
                gc_ms += t
        out["gc_ms"] = int(gc_ms)
        cc_used = cc_max = 0
        for pool in mf.getMemoryPoolMXBeans():
            if "CodeHeap" in pool.getName() or "Code Cache" in pool.getName():
                u = pool.getUsage()
                cc_used += u.getUsed()
                cc_max += u.getMax()
        out["code_cache_used_mb"] = round(cc_used / 2**20, 1)
        out["code_cache_max_mb"] = round(cc_max / 2**20, 1)
        heap = mf.getMemoryMXBean().getHeapMemoryUsage()
        out["heap_used_mb"] = round(heap.getUsed() / 2**20, 1)
    except Exception as e:  # diagnostics must never kill the bench
        out["error"] = str(e)[:200]
    try:
        env = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
        out["storage_mb"] = round(
            env.memoryManager().storageMemoryUsed() / 2**20, 1
        )
    except Exception:
        pass
    return out


def _wait_healthy(budget_min: float, probe=None) -> bool:
    """Block until the box's FP units look STABLY healthy, or the
    budget runs out.  Returns True if the gate passed, False on budget
    exhaustion / probe failure (caller proceeds either way — the
    in-run blas series and quarantine pass still document whatever
    hits mid-run).

    Rounds 5-8 all lost bench runs to co-tenant events that degrade
    ONLY vector/FP throughput; the round-8 event additionally
    OSCILLATES on a sub-minute timescale (gate passed on two < 0.2 s
    readings, the immediately-following boxcheck read 1.12 s, and the
    first ~50 queries ran degraded).  So the pass condition is a
    sustained window, not a streak of instants: 5 consecutive
    readings < 0.2 s with 20 s sleeps between them — an ~1:20 min
    continuously-clean window (4 × 20 s gaps plus probe runtime) —
    before declaring the box fit.  ``probe`` is injectable for tests;
    defaults to tools.boxcheck.blas_matmul."""
    if probe is None:
        try:
            import tools.boxcheck as _bc

            probe = _bc.blas_matmul
        except Exception:
            return False
    deadline = time.time() + budget_min * 60
    streak = 0
    while time.time() < deadline:
        try:
            mat = probe()
        except Exception:
            return False
        streak = streak + 1 if mat < 0.2 else 0
        if streak >= 5:
            return True
        print(f"bench --wait-healthy: blas_matmul_s={mat:.3f} "
              f"(streak {streak}/5 of < 0.2 s readings 20 s apart); "
              "waiting", file=sys.stderr)
        time.sleep(20 if streak else 60)
    print("bench --wait-healthy: budget exhausted, proceeding on a "
          "possibly-degraded box (in-run series will document it)",
          file=sys.stderr)
    return False


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # --queries a,b,c: time only the named queries (regression triage in
    # one command).  The filtered run skips the sidecar overwrite so a
    # targeted re-measurement never clobbers the full round record.
    only: set[str] = set()
    argv = sys.argv[1:]
    if "--queries" in argv:
        only = set(argv[argv.index("--queries") + 1].split(","))
    # --wait-healthy [max_minutes]: poll boxcheck before starting and
    # refuse to measure on a box in an FP-degradation wave (rounds 5-8
    # all lost runs to co-tenant events that ONLY hit vector/FP
    # throughput — loadavg looks calm, scalar Python is normal, and the
    # numbers are garbage).  Polls until boxcheck's matmul probe reads
    # < 0.2 s (the r07-healthy level, well under the 20x degraded_fp
    # threshold) for 5 consecutive readings 20 s apart (see
    # _wait_healthy; failed readings retry every 60 s) or the budget
    # runs out; on timeout the run proceeds — the in-run blas series
    # and quarantine pass still document whatever hits mid-run.
    wait_deadline = None
    if "--wait-healthy" in argv:
        idx = argv.index("--wait-healthy")
        try:
            budget_min = float(argv[idx + 1])
        except (IndexError, ValueError):
            budget_min = 30.0
        wait_deadline = time.time() + budget_min * 60
        _wait_healthy(budget_min)
    import __spark_entry__ as entry_mod
    from sf_datalake_spark.session import get_spark_session

    box_before = _boxcheck()
    spark = get_spark_session("bench")

    qs = entry_mod.queries()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown --queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        qs = {k: v for k, v in qs.items() if k in only}

    # Warm up: JVM codegen, parquet footers, the Arrow python workers
    # (so the first mapInPandas query doesn't pay worker spawn), the
    # MLlib optimizer path (class loading + BLAS + JIT is worth tens of
    # seconds on the first .fit of a session), and the Structured
    # Streaming machinery.
    def _warm(label, fn):
        # Independent try per step: a failure in one warmup must not
        # silently skip the others (the skipped JIT cost would land on
        # whichever timed query touches that machinery first).
        try:
            fn()
        except Exception as e:
            print(f"bench warmup '{label}' failed: {e}", file=sys.stderr)

    def _warm_ml():
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.linalg import Vectors

        tiny = spark.createDataFrame(
            [(Vectors.dense([0.0, 1.0]), 0.0), (Vectors.dense([1.0, 0.0]), 1.0)]
            * 8,
            ["features", "label"],
        )
        LogisticRegression(maxIter=2).fit(tiny)

    _warm("first query", lambda: next(iter(qs.values()))(spark, sf_dir).limit(1).collect())
    _warm("arrow workers", lambda: spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long").count())
    _warm("mllib fit", _warm_ml)
    _warm("streaming", lambda: (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .writeStream.format("memory").queryName("_bench_warmup")
        .trigger(availableNow=True).start().awaitTermination()
    ))

    # Best-of-2 per query: single-shot timings on a shared box see
    # 5-15× outliers from competing load and first-touch effects (round
    # 1 recorded 32 s for a query that re-times at 2 s); the minimum of
    # two back-to-back runs is the standard noise-robust estimator of a
    # query's actual cost and keeps per-query numbers comparable across
    # rounds. The cache is cleared between runs, so the repeat measures
    # the same cold-cache plan, not a cached result.
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    load_at: dict[str, float] = {}
    spread: dict[str, float] = {}
    n_cores = os.cpu_count() or 32
    history = _committed_history()
    jvm_diag: list[dict] = [{"at": 0, "query": "<warmup-done>",
                             **_jvm_diag(spark)}]
    n_done = 0

    def _bench_one(name: str, fn) -> tuple[float, float]:
        """Best-of-2 (adaptive 3rd) timing of one query through the noop
        sink; cache cleared between runs.  Returns (best, first)."""
        best = -1.0
        worst = -1.0
        first = -1.0
        # Adaptive third run: when even the best-of-2 pair disagrees by
        # >2.5× both runs may have straddled one long interference
        # window (GC pause, competing JVM) — a single extra timing
        # resolves phantom-vs-real far more often than it costs.
        runs_planned = 2
        run_i = 0
        while run_i < runs_planned:
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # The noop sink fully materializes every column (count()
                # would let Catalyst prune computed columns) with no
                # driver transfer.
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 3)
                if run_i == 0:
                    first = elapsed
                best = elapsed if best < 0 else min(best, elapsed)
                worst = max(worst, elapsed)
                if (
                    run_i == 1
                    and runs_planned == 2
                    and best > 0.5
                    and worst / best > 2.5
                ):
                    runs_planned = 3
            except Exception as e:
                print(f"bench error in {name}: {e}", file=sys.stderr)
                break
            finally:
                # A query that leaks persisted frames would tax every
                # later timing; clearing between runs keeps CacheManager
                # entries independent.  localCheckpoint blocks are
                # OUTSIDE clearCache's reach and normally wait for the
                # ContextCleaner after a JVM GC — across a 300-query
                # run they accumulate into storage-memory pressure that
                # inflated late-run timings up to 6x (r05 audit:
                # ssjoin_exact 41.6 s in the full run vs 6.6 s
                # standalone), so unpersist every persistent RDD
                # explicitly between runs.  Never let the cleanup
                # itself kill the harness before the JSON line prints.
                try:
                    spark.catalog.clearCache()
                    jrdds = spark.sparkContext._jsc.getPersistentRDDs()
                    for jrdd in jrdds.values():
                        jrdd.unpersist(False)
                except Exception:
                    pass
            run_i += 1
        return best, first

    # (Tried and rejected: an explicit System.gc() every 25 queries —
    # full collections on the 48 GB heap cost more than they save and
    # RAISED the suite total 244 s -> 275 s. The unpersist hygiene in
    # the finally block plus the 1 GB code cache are the fixes that
    # hold; residual ±1-2 s per-query wobble is ordinary GC timing.)

    # Spark-level canary gate (round 8).  The probe gate above is
    # blind to the contention class that matters most: a live round-8
    # event inflated pricing_summary 1.06 → 3.41 s (5.3× history)
    # while scalar CPU, WARM matmul, memory bandwidth, 32-core scalar
    # scaling and steal% all read perfectly healthy — only actual
    # Spark work sees it.  So after warm-up, time the canaries (cheap,
    # stable queries) best-of-2 against committed history; while one
    # exceeds 1.5×, sleep and retry on the warm JVM — but only when
    # --wait-healthy granted a budget (without it the gate measures
    # once, stamps the sidecar, and proceeds).  The last ratios land in
    # the sidecar as `canary_ratio`/`canary_ratios` either way.
    # Methodology note (r08 advice #4): the gate itself gives the two
    # canary queries 2-3 extra warm executions immediately before the
    # timed loop — a mild downward bias for exactly those two entries
    # relative to pre-r08 rounds; their timed best-of-2 below is
    # therefore "extra-warm" and cross-round comparisons of
    # pricing_summary / embedding_topk alone should use the sidecar's
    # canary history, not the per-query timings.
    # Two canaries because the round-8 partial-FP event is selective:
    # pricing_summary (pure JVM scan+agg) sees scheduler/LLC
    # contention but NOT worker-side FP throttling, while
    # embedding_topk (Arrow + BLAS in python workers) sees exactly
    # that — run c measured canary 1.1x on the JVM side while the
    # ANN/embedding family ran 1.7-2.2x (fp_load_spread read 13-24).
    canary_names = ("pricing_summary", "embedding_topk")
    canary_ratios: dict[str, float] = {}
    canary_ratio = None
    gates = [n for n in canary_names
             if not only and n in qs and history.get(n, 0) > 0.2]
    while gates:
        # Rebuilt EVERY iteration (r08 advice #2): a canary whose
        # _bench_one fails on a retry must drop out of the dict rather
        # than silently carry a stale earlier ratio into the sidecar —
        # `healthy` below is decided only from this round's readings.
        canary_ratios = {}
        worst = None
        for n in gates:
            t = _bench_one(n, qs[n])[0]
            if t > 0:
                canary_ratios[n] = round(t / history[n], 2)
                worst = max(worst or 0, canary_ratios[n])
            else:
                print(f"bench canary gate: {n} failed to measure this "
                      "iteration (t <= 0); its ratio is absent from this "
                      "round's sidecar stamp", file=sys.stderr)
        canary_ratio = max(canary_ratios.values()) if canary_ratios else None
        healthy = worst is not None and worst <= 1.5
        if healthy and wait_deadline is not None:
            # The canary samples one instant; the round-8 partial-FP
            # state flips fast enough that run d passed both canaries
            # at 1.08-1.11x and then measured 337 s with fp_load_spread
            # 49-74 at its endpoints.  Under --wait-healthy, also
            # require the sustained-load spread probe to confirm.
            try:
                import tools.boxcheck as _bc

                spread_now = _bc.fp_load_spread()
                if spread_now > 5:
                    healthy = False
                    print(f"bench canary gate: canaries {canary_ratios} ok "
                          f"but fp_load_spread={spread_now} (need <= 5); "
                          "partial FP throttling active, retrying in 120s",
                          file=sys.stderr)
            except Exception:
                pass
        if healthy or wait_deadline is None or time.time() >= wait_deadline:
            if not healthy and wait_deadline is not None:
                print("bench canary gate: budget exhausted at ratios "
                      f"{canary_ratios}; proceeding (sidecar will carry "
                      "canary_ratios + history_median_ratio)",
                      file=sys.stderr)
            break
        print(f"bench canary gate: {canary_ratios} vs committed history "
              "(need all <= 1.5x); box is Spark-slow right now, "
              "retrying in 120s", file=sys.stderr)
        time.sleep(120)

    # In-run worker-core FP canary (round-9 verdict #4): the round-8
    # partial-FP state flips on sub-run timescales — two gated runs
    # passed every ENDPOINT probe and still measured 317-337 s with
    # fp_load_spread 49-74 at their ends.  Sample the Arrow+BLAS
    # micro-canary every 25 queries (~0.3 s each, ~4 s per full run);
    # flips are detected against the run's own minimum reading
    # (_fp_flip_suspects) and the contaminated windows feed the
    # end-of-run quarantine re-measure, normalizing per-window instead
    # of discarding the run.
    fp_canary = _make_fp_canary(spark)
    run_order = list(qs)
    fp_series = [{"at": 0, "query": "<pre-loop>", "seconds": fp_canary()}]

    for name, fn in qs.items():
        try:
            load_at[name] = round(os.getloadavg()[0], 2)
        except OSError:
            load_at[name] = -1.0
        best, first = _bench_one(name, fn)
        timings[name] = best
        if first > 0:
            first_run[name] = first
        if best > 0:
            spread[name] = round(first_run.get(name, best) / best, 2)
        n_done += 1
        if n_done % 25 == 0:
            sec = fp_canary()
            fp_series.append({"at": n_done, "query": name, "seconds": sec})
            clean = [s["seconds"] for s in fp_series if s["seconds"] > 0]
            if sec > 0 and clean and sec > 1.8 * min(clean):
                print(f"bench fp-canary: {sec:.3f}s at query {n_done} "
                      f"({name}) vs run-min {min(clean):.3f}s — worker-core "
                      "FP throttle flip; window will be re-measured in the "
                      "quarantine pass", file=sys.stderr)
        if n_done % 50 == 0:
            # blas_matmul_s rides along every 50 queries: the round-7
            # degradation came in WAVES — healthy boxchecks at both
            # endpoints bracketed a run whose middle was hit (27
            # spread suspects) — so endpoint-only sampling can't
            # attribute it.  ~0.1 s per sample on a healthy box.
            try:
                import tools.boxcheck as _bc

                mat = _bc.blas_matmul()
            except Exception:
                mat = -1.0
            jvm_diag.append({"at": n_done, "query": name,
                             **_jvm_diag(spark), "blas_matmul_s": mat})
    jvm_diag.append({"at": n_done, "query": "<end>", **_jvm_diag(spark)})
    fp_series.append({"at": n_done, "query": "<end>", "seconds": fp_canary()})
    fp_suspects = _fp_flip_suspects(fp_series, run_order)
    if fp_suspects:
        print(f"bench fp-canary: {len(fp_suspects)} queries ran inside "
              f"FP-flip windows ({sorted(fp_suspects)[:8]}…); re-measuring "
              "in the quarantine pass", file=sys.stderr)

    # Quarantine pass (round-6 verdict #4): contaminated timings used to
    # land in `queries` as the committed record (r06: anti_join_inactive
    # 1.35 s vs true 0.40 s), poisoning the next round's history-guard
    # baseline.  Re-measure every history-flagged suspect at the END of
    # the run (fresh, not interleaved with whatever co-tenant burst hit
    # it the first time), keep the better number in `queries`, and park
    # the contaminated one in `quarantined`.  Inflation only ever raises
    # timings, so min(original, re-measure) is the best-known true cost.
    remeasure_first: dict[str, float] = {}

    def _remeasure(name: str) -> float:
        best, first = _bench_one(name, qs[name])
        if first > 0:
            remeasure_first[name] = first
        return best

    quarantined = _quarantine(timings, history, _remeasure,
                              extra=fp_suspects)
    for name in quarantined:
        # spread from the re-measure's own first run (r07 advice) — the
        # contaminated first run over the fresh best would inflate the
        # spread diagnostic for exactly the healed entries
        spread[name] = round(
            remeasure_first.get(name, timings[name]) / timings[name], 2)
    if quarantined:
        jvm_diag.append({"at": n_done, "query": "<quarantine-done>",
                         **_jvm_diag(spark)})

    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # Load guard (round-4 verdict task #4): the r04 sidecar recorded
    # 2.2-2.3x phantom regressions for three ML/iterative queries that
    # re-timed clean on an idle box — competing load, not code.  Flag
    # entries whose first/min spread exceeds 2 (the run straddled an
    # interference window) or that started while the 1-min loadavg
    # exceeded half the cores (the box was already busy); both
    # component lists land in the sidecar so a regression reader can
    # discount them before burning an optimization round.
    suspect_ratio = sorted(
        n for n, r in spread.items() if r > 2 and timings[n] > 0.5
    )
    suspect_load = sorted(
        n for n, l in load_at.items()
        if l > n_cores / 2 and timings.get(n, -1) > 0.5
    )
    # History guard (round-5 verdict #3): sustained contamination makes
    # BOTH runs of a query equally slow — first/min spread ≈ 1 and
    # loadavg can look calm, so the v4 guards miss it (the r05 tail
    # cluster).  A query whose best-of-2 exceeds 2.5x its value in the
    # last COMMITTED sidecar is suspect regardless of spread; replaying
    # the driver's r05 numbers against the committed r05 sidecar flags
    # exactly the sla_trend/cohort_ltv cluster this was built for.
    # (run AFTER the quarantine pass, so a name it lists stayed >2.5x
    # its committed history even on a fresh end-of-run re-measure —
    # either a real regression or sustained box contamination.  NB the
    # history min is a 3-sidecar ratchet: a query made deliberately
    # slower — algorithm change, added guard cost — stays flagged until
    # three newer sidecars are committed; that persistence is the
    # advisory cost of never comparing against a contaminated record.)
    hist_ratio = _history_suspects(timings, history)
    suspect_history = sorted(hist_ratio)
    suspects = sorted(
        set(suspect_ratio) | set(suspect_load) | set(suspect_history)
    )
    if suspects:
        print(f"bench load guard: {len(suspects)} suspect timings "
              f"(ratio>2: {suspect_ratio}; load>{n_cores // 2}: "
              f"{suspect_load}; >2.5x committed history even after the "
              f"end-of-run re-measure: {suspect_history}; history is the "
              f"3-sidecar elementwise min, so an intentional slowdown "
              f"stays flagged for three rounds) — re-measure standalone "
              f"before trusting",
              file=sys.stderr)
    if quarantined:
        print(f"bench quarantine: {len(quarantined)} contaminated "
              f"interleaved timings replaced by end-of-run re-measures "
              f"(originals kept in the sidecar's 'quarantined' field): "
              f"{sorted(quarantined)}", file=sys.stderr)

    sf = None
    try:
        base = os.path.basename(sf_dir.rstrip("/"))
        if base.startswith("sf"):
            sf = float(base[2:])
    except ValueError:
        pass

    # Methodology tag: best-of-2 mechanically lowers numbers versus a
    # single-shot run, so cross-round comparisons must be like-for-like
    # on the estimator.  first_run preserves the single-shot timing for
    # anyone comparing against a runs=1 round.
    payload = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": 2,
        "estimator": "min",
        "adaptive_third_run": True,  # extra timing when the pair spreads >2.5x
        # Methodology version, bumped whenever the timing protocol
        # changes so cross-round BENCH_r{N} comparisons are honest:
        #   v1 (r01-r02): best-of-2, no cache clearing between queries
        #   v2 (r03):     + clearCache between runs, adaptive 3rd timing
        #   v3 (r04+):    + --queries filter (protocol itself unchanged
        #                 from v2 — v2/v3 numbers are comparable)
        #   v4 (r05):     + load guard (per-query loadavg + first/min
        #                 spread recorded; suspect list in the sidecar)
        #   v5 (r06):     + history guard (best-of-2 vs the last
        #                 COMMITTED sidecar, flags sustained
        #                 contamination the spread can't see) + jvm_diag
        #                 series every 50 queries; timing protocol
        #                 unchanged — v2..v5 numbers are comparable
        #   v6 (r07+):    + quarantine pass: history-flagged suspects
        #                 re-measured fresh at end of run, the better
        #                 number lands in `queries`, the contaminated
        #                 interleaved one is preserved under
        #                 `quarantined`; per-query estimator unchanged
        #                 (still best-of-N through the noop sink), so
        #                 v2..v6 totals remain comparable — v6 just
        #                 stops contamination from becoming the record
        #   v7 (r09+):    + in-run worker-core FP canary every 25
        #                 queries (fp_canary_series in the sidecar);
        #                 queries inside a flip window join the
        #                 quarantine re-measure (same min(old, fresh)
        #                 estimator) — v2..v7 totals comparable, v7
        #                 additionally normalizes mid-run FP flips the
        #                 endpoint gates cannot see
        "methodology": "v7",
        "n_suspect": len(suspects),
        "n_quarantined": len(quarantined),
        "n_fp_flagged": len(fp_suspects),
        # Post-warmup canaries (best-of-2 over committed history) — the
        # start-of-run box-state stamp (see canary gate): JVM-side
        # (pricing_summary) and Arrow/BLAS-side (embedding_topk).
        "canary_ratio": canary_ratio,
        "canary_ratios": canary_ratios or None,
        # Uniform-box-factor estimate (round 8): median of this run's
        # per-query ratios against the committed 3-sidecar-min history.
        # ≈1.0 = box comparable to the best committed rounds; ≈1.3 =
        # everything uniformly ~30% slow (the round-8 morning state —
        # invisible to every point probe: scalar, warm-FP, bandwidth,
        # 32-core scaling and steal all read healthy while every query
        # ran 1.2-1.4× its r06-day time).  A ratio like this, WITHOUT a
        # matching cluster of per-query history suspects, reads as
        # environment, not regression.
        "history_median_ratio": (
            round(sorted(rs)[len(rs) // 2], 3)
            if (rs := [t / history[n] for n, t in timings.items()
                       if n in history and history[n] > 0.2 and t > 0])
            else None
        ),
    }
    # Keep the printed line compact (the driver's capture truncates long
    # lines); the full record with single-shot timings goes to the
    # sidecar only.
    print(json.dumps(payload))
    payload = {**payload, "first_run": first_run, "loadavg1": load_at,
               "first_over_min": spread, "suspect": suspects,
               "suspect_ratio": suspect_ratio, "suspect_load": suspect_load,
               "suspect_history": suspect_history,
               "history_ratio": hist_ratio, "quarantined": quarantined,
               "fp_canary_series": fp_series,
               "fp_canary_suspect": sorted(fp_suspects),
               "jvm_diag": jvm_diag,
               "boxcheck": {"before": box_before, "after": _boxcheck()}}
    # Durable sidecar (atomic rename): the driver's BENCH file tail can
    # truncate the printed line; bench_last.json keeps the full
    # per-query map for every round.
    if not only:
        sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_last.json")
        tmp = sidecar + ".tmp"
        try:
            with open(tmp, "w") as f:
                json.dump(payload, f, indent=1)
            os.replace(tmp, sidecar)
        except OSError as e:
            print(f"bench sidecar write failed: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
