"""Structured Streaming tests: file source → window/session/dedup →
memory sink, with the session operator cross-checked against its batch
twin (``operators.intervals.sessionize``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.operators.intervals import sessionize
from sf_datalake_spark.streaming import (
    read_file_stream,
    run_to_memory,
    session_aggregate,
    streaming_dedup,
    windowed_aggregate,
)

from tests.conftest import ts

SCHEMA = "uid string, t timestamp, v double"

ROWS = [
    ("u1", ts("2023-01-01 10:00:00"), 1.0),
    ("u1", ts("2023-01-01 10:10:00"), 2.0),
    ("u1", ts("2023-01-01 11:00:00"), 3.0),   # > 30 min gap → new session
    ("u2", ts("2023-01-01 10:05:00"), 4.0),
]


@pytest.fixture()
def stream_dir(spark, tmp_path):
    p = str(tmp_path / "in")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(p)
    return p


def test_windowed_aggregate(spark, stream_dir):
    stream = read_file_stream(spark, stream_dir, SCHEMA)
    agg = windowed_aggregate(
        stream, "t", "1 hour",
        aggs=[F.sum("v").alias("sum_v"), F.count("*").alias("n")],
        keys=["uid"],
    )
    out = run_to_memory(agg, "win_test", output_mode="complete")
    got = {(r["uid"], r["window_start"]): (r["sum_v"], r["n"]) for r in out.collect()}
    assert got[("u1", ts("2023-01-01 10:00:00"))] == (3.0, 2)
    assert got[("u1", ts("2023-01-01 11:00:00"))] == (3.0, 1)
    assert got[("u2", ts("2023-01-01 10:00:00"))] == (4.0, 1)


def test_session_aggregate_matches_batch_sessionize(spark, stream_dir):
    stream = read_file_stream(spark, stream_dir, SCHEMA)
    agg = session_aggregate(
        stream, "t", "30 minutes",
        aggs=[F.count("*").alias("n"), F.sum("v").alias("sum_v")],
        keys=["uid"],
    )
    out = run_to_memory(agg, "sess_test", output_mode="complete")
    streaming_sessions = {
        (r["uid"], r["session_start"]): (r["n"], r["sum_v"]) for r in out.collect()
    }

    batch = (
        sessionize(spark.createDataFrame(ROWS, SCHEMA), ["uid"], "t", gap_seconds=1800)
        .groupBy("uid", "session_id")
        .agg(F.min("t").alias("start"), F.count("*").alias("n"),
             F.sum("v").alias("sum_v"))
    )
    batch_sessions = {
        (r["uid"], r["start"]): (r["n"], r["sum_v"]) for r in batch.collect()
    }
    assert streaming_sessions == batch_sessions
    assert len(streaming_sessions) == 3


def test_running_total_alerts_stateful(spark, tmp_path):
    """applyInPandasWithState: per-key accumulator emits an alert row at
    every crossing of threshold multiples."""
    from sf_datalake_spark.streaming import running_total_alerts

    p = str(tmp_path / "state_in")
    rows = [
        ("u1", ts("2023-01-01 10:00:00"), 6.0),    # total 6
        ("u1", ts("2023-01-01 10:01:00"), 5.0),    # 11 → alerts 1 (≥10)
        ("u1", ts("2023-01-01 10:02:00"), 12.0),   # 23 → alert 2 (≥20)
        ("u2", ts("2023-01-01 10:00:00"), 3.0),    # never crosses
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(p)
    stream = read_file_stream(spark, p, SCHEMA)
    alerts = running_total_alerts(stream, ["uid"], "t", "v", threshold=10.0)
    out = run_to_memory(alerts, "alerts_test")
    got = sorted((r["uid"], r["alert_no"], r["total"]) for r in out.collect())
    assert got == [("u1", 1, 11.0), ("u1", 2, 23.0)]


def test_stream_static_join(spark, stream_dir):
    """Stream-static broadcast join: enrich streaming events with a
    static dimension — no state, per-batch hash join."""
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], "uid string, tier string"
    )
    stream = read_file_stream(spark, stream_dir, SCHEMA)
    enriched = stream.join(F.broadcast(dim), "uid")
    out = run_to_memory(enriched, "join_test")
    got = {(r["uid"], r["tier"]) for r in out.collect()}
    assert got == {("u1", "gold"), ("u2", "silver")}
    assert out.count() == 4


def test_streaming_dedup(spark, tmp_path):
    p = str(tmp_path / "dup")
    rows = ROWS + ROWS[:2]  # duplicate first two events
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(p)
    stream = read_file_stream(spark, p, SCHEMA)
    # dedup key = (uid, t): the two replayed events collapse, the four
    # distinct (uid, t) combinations survive
    out = run_to_memory(
        streaming_dedup(stream, ["uid", "t"], ts_col="t"), "dedup_test"
    )
    assert out.count() == 4
    # key-only dedup: one row per uid
    out2 = run_to_memory(streaming_dedup(stream, ["uid"], ts_col="t"), "dedup_test2")
    assert out2.count() == 2


def test_upsert_sink_merges_across_micro_batches(spark, tmp_path):
    """Three source files replayed one per micro-batch: the foreachBatch
    MERGE must accumulate the per-key aggregate across batches (update
    branch, not just the first-write branch) and converge to the batch
    GROUP BY."""
    from sf_datalake_spark.streaming import read_file_stream, run_upsert_sink

    src = str(tmp_path / "src")
    for i, rows in enumerate([[(1, 1.0), (2, 2.0)], [(1, 3.0)], [(2, 5.0), (3, 7.0)]]):
        spark.createDataFrame(rows, "k int, v double").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = read_file_stream(
        spark, src, "k int, v double", max_files_per_trigger=1
    )
    agg = stream.groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")
    )
    target = str(tmp_path / "state")
    run_upsert_sink(agg, target, ["k"], query_name="t_upsert_multi")

    got = {r["k"]: (r["n"], r["s"]) for r in spark.read.parquet(target).collect()}
    assert got == {1: (2, 4.0), 2: (2, 7.0), 3: (1, 7.0)}


def test_upsert_sink_schema_reorder_and_empty_batch(spark, tmp_path):
    """Robustness of the staged-swap MERGE sink: (a) a later stream
    whose aggregate projects the SAME columns in a DIFFERENT order
    upserts cleanly (the target is aligned to the batch's column order
    by name, not position); (b) an empty micro-batch leaves the target
    intact rather than truncating it; (c) after every invocation the
    target directory is fully swapped — no .staging-* residue, parquet
    always readable."""
    import glob
    import os

    from sf_datalake_spark.streaming import read_file_stream, run_upsert_sink

    target = str(tmp_path / "state")

    # batch 1: columns (k, n, s)
    src1 = str(tmp_path / "src1")
    spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double").coalesce(1) \
        .write.parquet(src1)
    agg1 = read_file_stream(spark, src1, "k int, v double").groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")
    )
    run_upsert_sink(agg1, target, ["k"], query_name="t_reorder_1")

    # batch 2 comes from a stream whose projection REORDERS the columns:
    # (s, k, n) — schema-compatible by name, different positions
    src2 = str(tmp_path / "src2")
    spark.createDataFrame([(1, 10.0), (3, 30.0)], "k int, v double").coalesce(1) \
        .write.parquet(src2)
    agg2 = read_file_stream(spark, src2, "k int, v double").groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")
    ).select("s", "k", "n")
    run_upsert_sink(agg2, target, ["k"], query_name="t_reorder_2")

    got = {r["k"]: (r["n"], r["s"]) for r in spark.read.parquet(target).collect()}
    assert got == {1: (1, 10.0), 2: (1, 2.0), 3: (1, 30.0)}

    # (b) empty micro-batch: a filter that matches nothing still runs
    # the foreachBatch body with an empty frame; the merge must keep
    # every existing row and the swap must not corrupt the directory
    agg3 = read_file_stream(spark, src2, "k int, v double").filter(
        F.col("k") > 999
    ).groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")
    )
    run_upsert_sink(agg3, target, ["k"], query_name="t_empty_batch")

    got2 = {r["k"]: (r["n"], r["s"]) for r in spark.read.parquet(target).collect()}
    assert got2 == got

    # (c) staged-swap hygiene: no half-written staging dirs anywhere
    assert glob.glob(f"{target}.staging-*") == []
    assert os.path.isdir(target)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Deterministic micro-case: clicks joined to purchases within 10
    minutes per user; late-side events beyond the delay never match;
    the availableNow drain equals the hand-computed pairs."""
    import datetime as dt

    from sf_datalake_spark.streaming import run_to_memory, stream_stream_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click at 12:00 -> purchase at 12:05 (match) and
        # purchase at 12:20 (too late)
        (1, t0, "click", 100),
        (1, t0 + dt.timedelta(minutes=5), "purchase", 101),
        (1, t0 + dt.timedelta(minutes=20), "purchase", 102),
        # user 2: purchase BEFORE the click -> no match
        (2, t0 + dt.timedelta(minutes=1), "purchase", 200),
        (2, t0 + dt.timedelta(minutes=2), "click", 201),
        # user 3: two clicks share one purchase (both match)
        (3, t0, "click", 300),
        (3, t0 + dt.timedelta(minutes=3), "click", 301),
        (3, t0 + dt.timedelta(minutes=8), "purchase", 302),
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string, event_id long"
    ).parquet(src)
    clicks = stream.filter("event_type = 'click'").drop("event_type")
    buys = stream.filter("event_type = 'purchase'").drop("event_type")
    out = run_to_memory(
        stream_stream_join(clicks, buys, ["user_id"], watermark="1 hour",
                           max_delay="10 minutes"),
        "t_ssj", output_mode="append",
    )
    got = {(r["user_id"], r["event_id_l"], r["event_id_r"]) for r in out.collect()}
    assert got == {(1, 100, 101), (3, 300, 302), (3, 301, 302)}


def test_running_total_alerts_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API, RocksDB
    store): must produce exactly the applyInPandasWithState twin's
    output — same accumulator, same threshold-multiple emission."""
    # the transformWithState Python protocol speaks protobuf to the JVM
    # state server; absent/broken protobuf → the driver worker can't
    # start (this container ships no google.protobuf) — skip, the
    # applyInPandasWithState twin above still covers the semantics
    pytest.importorskip("google.protobuf.descriptor")
    from sf_datalake_spark.streaming import (
        running_total_alerts,
        running_total_alerts_tws,
    )

    p = str(tmp_path / "tws_in")
    rows = [
        ("u1", ts("2023-01-01 10:00:00"), 6.0),
        ("u1", ts("2023-01-01 10:01:00"), 5.0),
        ("u1", ts("2023-01-01 10:02:00"), 12.0),
        ("u2", ts("2023-01-01 10:00:00"), 3.0),
        ("u2", ts("2023-01-01 10:03:00"), 25.0),  # 28 → alerts 1 and 2
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(p)

    tws = running_total_alerts_tws(
        read_file_stream(spark, p, SCHEMA), ["uid"], "t", "v", threshold=10.0
    )
    got_tws = sorted(
        (r["uid"], r["alert_no"], r["total"])
        for r in run_to_memory(tws, "tws_test").collect()
    )
    legacy = running_total_alerts(
        read_file_stream(spark, p, SCHEMA), ["uid"], "t", "v", threshold=10.0
    )
    got_legacy = sorted(
        (r["uid"], r["alert_no"], r["total"])
        for r in run_to_memory(legacy, "tws_legacy_test").collect()
    )
    assert got_tws == got_legacy
    assert got_tws == [
        ("u1", 1, 11.0), ("u1", 2, 23.0), ("u2", 1, 28.0), ("u2", 2, 28.0),
    ]


def test_near_dup_gate_admits_only_novel_documents(spark, tmp_path):
    """Streaming admission gate over three micro-batches: corpus-vs-
    batch duplicates are rejected, within-batch duplicates keep the
    minimum id, novel documents append — the stored signature table
    ends exactly one row per distinct document."""
    from sf_datalake_spark.streaming import read_file_stream, run_near_dup_gate

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight nine"
    c = "red orange yellow green blue indigo violet ultraviolet"
    src = str(tmp_path / "src")
    batches = [
        [(1, a), (2, b)],            # batch 1: two novel docs
        [(3, a), (4, c), (5, c)],    # batch 2: 3 dups corpus-a; 4/5 dup pair
        [(6, b), (7, c)],            # batch 3: both already stored
    ]
    for rows in batches:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
            .write.mode("append").parquet(src)

    corpus = str(tmp_path / "corpus")
    stream = read_file_stream(
        spark, src, "doc_id long, text string", max_files_per_trigger=1
    )
    run_near_dup_gate(stream, corpus, query_name="t_near_dup_gate")

    stored = spark.read.parquet(corpus)
    ids = sorted(r["doc_id"] for r in stored.collect())
    assert ids == [1, 2, 4]  # a→1, b→2, c→4 (5 lost the min-id tie)
    assert stored.columns[0] == "doc_id" and "signature" in stored.columns


def test_bloom_gate_admits_exact_novel_documents(spark, tmp_path):
    """Bloom-prefiltered exact-dedup gate over three micro-batches:
    exact duplicates of stored docs are rejected via the maybe-member
    verification join, definitely-new docs admit without a corpus read,
    within-batch duplicates keep the min id, and the sketch parquet
    tracks every admitted fingerprint (no false rejections ever)."""
    from sf_datalake_spark.streaming import read_file_stream, run_bloom_gate

    a, b, c = "alpha beta gamma", "one two three", "red green blue"
    src = str(tmp_path / "src")
    batches = [
        [(1, a), (2, b)],
        [(3, a), (4, c), (5, c)],    # 3 dup of stored a; 4/5 in-batch pair
        [(6, b), (7, c), (8, "brand new text")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
            .write.mode("append").parquet(src)

    corpus = str(tmp_path / "corpus")
    sketch = str(tmp_path / "sketch")
    stream = read_file_stream(
        spark, src, "doc_id long, text string", max_files_per_trigger=1
    )
    run_bloom_gate(stream, corpus, sketch, m_bits=1 << 12, num_hashes=3,
                   query_name="t_bloom_gate")

    stored = spark.read.parquet(corpus)
    ids = sorted(r["doc_id"] for r in stored.collect())
    assert ids == [1, 2, 4, 8]
    # the sketch must contain every admitted fingerprint (no false negatives)
    from sf_datalake_spark.operators.bloom import bloom_maybe_contains

    sk = spark.read.parquet(sketch)
    probed = bloom_maybe_contains(stored.select("fp"), "fp", sk, 1 << 12, 3)
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_event_transitions_stateful_bridges_micro_batches(spark, tmp_path):
    """The per-key state must carry the last event type ACROSS
    micro-batches: two files replayed with maxFilesPerTrigger=1 must
    yield the same transition pairs as one batch over the union."""
    from sf_datalake_spark.streaming import event_transitions_stateful

    schema = "uid string, t timestamp, seq bigint, etype string"
    f1 = [
        ("u1", ts("2023-01-01 10:00:00"), 1, "view"),
        ("u1", ts("2023-01-01 10:01:00"), 2, "click"),
        ("u2", ts("2023-01-01 10:00:00"), 3, "view"),
    ]
    f2 = [
        ("u1", ts("2023-01-01 10:02:00"), 4, "purchase"),
        ("u2", ts("2023-01-01 10:03:00"), 5, "error"),
    ]
    p = str(tmp_path / "trans_in")
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(p)
    spark.createDataFrame(f2, schema).coalesce(1).write.mode("append").parquet(p)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p)
    )
    pairs = event_transitions_stateful(
        stream, ["uid"], "t", "seq", "etype"
    )
    out = run_to_memory(pairs, "trans_test")
    got = sorted(
        (r["uid"], r["from_type"], r["to_type"]) for r in out.collect()
    )
    assert got == [
        ("u1", "click", "purchase"),   # bridges the file boundary
        ("u1", "view", "click"),
        ("u2", "view", "error"),
    ]


def test_event_transitions_stateful_sorts_within_batch(spark, tmp_path):
    """Rows inside one micro-batch may arrive unordered; the operator
    must emit transitions in the (ts, seq) total order."""
    from sf_datalake_spark.streaming import event_transitions_stateful

    schema = "uid string, t timestamp, seq bigint, etype string"
    rows = [  # deliberately shuffled
        ("u1", ts("2023-01-01 10:02:00"), 3, "purchase"),
        ("u1", ts("2023-01-01 10:00:00"), 1, "view"),
        ("u1", ts("2023-01-01 10:01:00"), 2, "click"),
    ]
    p = str(tmp_path / "trans_sort")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
    stream = spark.readStream.schema(schema).parquet(p)
    out = run_to_memory(
        event_transitions_stateful(stream, ["uid"], "t", "seq", "etype"),
        "trans_sort_test",
    )
    got = sorted((r["from_type"], r["to_type"]) for r in out.collect())
    assert got == [("click", "purchase"), ("view", "click")]


def test_streaming_sample_admissions_matches_batch_topk(spark, tmp_path):
    """Two micro-batches of shuffled keys: re-ranking the admitted
    superset must equal the batch k-smallest, and warm state must
    reject most of the second batch (bounded sink growth)."""
    from sf_datalake_spark.streaming import streaming_sample_admissions

    schema = "id bigint, sk bigint, shard int"
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(10**9), i % 2) for i in range(200)]
    p = str(tmp_path / "eks")
    spark.createDataFrame(rows[:100], schema).coalesce(1).write.parquet(p)
    spark.createDataFrame(rows[100:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(p)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p)
    )
    out = run_to_memory(
        streaming_sample_admissions(stream, "shard", "sk", k=10), "eks_test"
    )
    admitted = [(r["id"], r["sk"]) for r in out.collect()]
    k = 10
    got = sorted(admitted, key=lambda r: (r[1], r[0]))[:k]
    want = sorted(((i, sk) for i, sk, _ in rows), key=lambda r: (r[1], r[0]))[:k]
    assert got == want
    # admissions are a strict subset of the stream (state rejected rows)
    assert len(admitted) < len(rows)


def test_scd2_sink_out_of_order_batches_equal_batch_build(spark, tmp_path):
    """run_scd2_sink rebuilds from the accumulated log, so two
    micro-batches delivering a key's changes OUT of sequence order
    must still converge to the batch scd2_build of the full log."""
    import datetime as dt

    from sf_datalake_spark.operators.scd import scd2_build
    from sf_datalake_spark.streaming import run_scd2_sink

    d = dt.date
    schema = "k int, ts date, op_id int, status string"
    # batch 1 carries the LATER change for key 1; batch 2 the earlier
    # ones (out-of-order across batches) plus key 2
    b1 = [(1, d(2023, 3, 1), 3, "B")]
    b2 = [
        (1, d(2023, 1, 1), 1, "A"),
        (1, d(2023, 2, 1), 2, "A"),
        (2, d(2023, 1, 5), 4, "X"),
    ]
    src = str(tmp_path / "scd2_in")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    log_path = str(tmp_path / "log")
    dim_path = str(tmp_path / "dim")
    run_scd2_sink(
        stream, log_path, dim_path, ["k"], "ts", ["status"],
        tiebreak_col="op_id", query_name="t_scd2_sink",
    )
    got = {
        (r.k, r.status, r.valid_from, r.valid_to, r.version_n, r.is_current)
        for r in spark.read.parquet(dim_path).collect()
    }
    full_log = spark.createDataFrame(b1 + b2, schema)
    want = {
        (r.k, r.status, r.valid_from, r.valid_to, r.version_n, r.is_current)
        for r in scd2_build(
            full_log, ["k"], "ts", ["status"], tiebreak_col="op_id"
        ).collect()
    }
    assert got == want
    # sanity: A(compressed) -> B for key 1, single version for key 2
    assert (1, "A", dt.date(2023, 1, 1), dt.date(2023, 3, 1), 1, False) in got
    assert (2, "X", dt.date(2023, 1, 5), None, 1, True) in got


def test_skyline_sink_incremental_equals_batch(spark, tmp_path):
    """Frontier maintained over two micro-batches — with the second
    batch dominating part of the first's frontier — must equal the
    batch skyline of the union."""
    from sf_datalake_spark.operators.skyline import skyline_2d
    from sf_datalake_spark.streaming import run_skyline_sink

    schema = "id int, a int, b int"
    b1 = [(1, 10, 5), (2, 8, 3), (3, 12, 9)]
    b2 = [(4, 10, 2), (5, 12, 9), (6, 1, 1)]   # 4 dominates 1 and 2
    src = str(tmp_path / "sky_in")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    target = str(tmp_path / "sky_dim")
    run_skyline_sink(stream, target, "a", "b", query_name="t_sky_sink")
    got = {(r.id, r.a, r.b) for r in spark.read.parquet(target).collect()}
    want = {
        (r.id, r.a, r.b)
        for r in skyline_2d(
            spark.createDataFrame(b1 + b2, schema), "a", "b"
        ).collect()
    }
    assert got == want
    assert (4, 10, 2) in got and (1, 10, 5) not in got


def test_events_stream_reads_directory_layout(spark, tmp_path):
    """Round-7 regression guard: the driver testdata ships
    events.parquet as a single FILE, but any Spark re-write (scaled
    copies, user exports) produces a DIRECTORY of part files — and the
    old pathGlobFilter-based stream matched no part file names,
    silently processing ZERO rows (caught because every streaming twin
    'sped up' at x8). Both layouts must yield the same rows, and the
    micros-timestamp dtype of a normalized re-write must be handled."""
    import shutil

    from sf_datalake_spark.queries import _t
    from sf_datalake_spark.queries_ext import _events_stream
    from sf_datalake_spark.streaming import run_to_memory

    src = "/root/testdata/sf0.001"
    n_expect = _t(spark, src, "events").count()
    assert n_expect > 0

    # directory layout: normalized re-write (ts becomes plain timestamp)
    scaled = str(tmp_path / "sfdir")
    _t(spark, src, "events").write.parquet(f"{scaled}/events.parquet")
    for t in ("region",):  # _events_stream only touches events.parquet
        shutil.copy(f"{src}/{t}.parquet", f"{scaled}/{t}.parquet")

    got = run_to_memory(
        _events_stream(spark, scaled).groupBy().count(),
        "t_dir_layout_stream", output_mode="complete",
    ).collect()
    assert got[0]["count"] == n_expect

    # file layout (the shipped testdata) still works through the glob
    got_file = run_to_memory(
        _events_stream(spark, src).groupBy().count(),
        "t_file_layout_stream", output_mode="complete",
    ).collect()
    assert got_file[0]["count"] == n_expect
