"""Property-based tests (hypothesis): randomized inputs, invariant
assertions — the formalized version of the reference's tolerance-band
randomized tests (SURVEY.md §5 pattern 2).

Spark jobs are slow per-example, so each property runs few, large
examples (deadline disabled; the generator builds whole tables)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sf_datalake_spark.operators.asof import merge_asof
from sf_datalake_spark.operators.intervals import union_intervals
from sf_datalake_spark.operators.skew import salted_aggregate

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_day = st.integers(min_value=0, max_value=400)


@pytest.fixture(scope="module")
def skipping_layout(spark, tmp_path_factory):
    """A 4-file range-clustered layout + its stats table, built once."""
    from sf_datalake_spark.functions.skipping import collect_file_stats

    path = str(tmp_path_factory.mktemp("skip") / "layout")
    spark.range(0, 4000).withColumn("v", F.col("id") % 13) \
        .repartitionByRange(4, "id").write.mode("overwrite").parquet(path)
    return path, collect_file_stats(spark, path, ["id"])


@st.composite
def asof_tables(draw):
    n_left = draw(st.integers(2, 15))
    n_right = draw(st.integers(1, 15))
    groups = ["g1", "g2"]
    left = [
        (draw(st.sampled_from(groups)), dt.date(2022, 1, 1) + dt.timedelta(draw(_day)))
        for _ in range(n_left)
    ]
    right = [
        (
            draw(st.sampled_from(groups)),
            dt.date(2022, 1, 1) + dt.timedelta(draw(_day)),
            float(draw(st.integers(0, 1000))),
        )
        for _ in range(n_right)
    ]
    # pandas merge_asof requires unique-ish ordering; dedupe right on (g, t)
    right = list({(g, t): (g, t, v) for g, t, v in right}.values())
    return left, right


@given(tables=asof_tables(), direction=st.sampled_from(["backward", "forward"]),
       tolerance=st.sampled_from([None, 30, 365]))
@SLOW
def test_asof_matches_pandas(spark, tables, direction, tolerance):
    left_rows, right_rows = tables
    left = spark.createDataFrame(left_rows, "g string, t date")
    right = spark.createDataFrame(right_rows, "g string, t date, v double")
    got = (
        merge_asof(left, right, on="t", by=["g"], direction=direction,
                   tolerance=tolerance)
        .orderBy("g", "t")
        .toPandas()
    )
    lp = pd.DataFrame(left_rows, columns=["g", "t"]).sort_values(["t", "g"])
    rp = pd.DataFrame(right_rows, columns=["g", "t", "v"]).sort_values(["t", "g"])
    lp["t"] = pd.to_datetime(lp["t"])
    rp["t"] = pd.to_datetime(rp["t"])
    exp = pd.merge_asof(
        lp, rp, on="t", by="g", direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(days=tolerance),
    ).sort_values(["g", "t"]).reset_index(drop=True)
    # compare multisets of (g, t, v): left may contain duplicate (g, t)
    got_set = sorted((r.g, str(r.t), -1 if pd.isna(r.v) else r.v)
                     for r in got.itertuples())
    exp_set = sorted((r.g, str(r.t.date()), -1 if pd.isna(r.v) else r.v)
                     for r in exp.itertuples())
    assert got_set == exp_set


@st.composite
def interval_tables(draw):
    n = draw(st.integers(1, 20))
    rows = []
    for _ in range(n):
        start = draw(_day)
        length = draw(st.integers(0, 40))
        rows.append(
            ("e", dt.date(2022, 1, 1) + dt.timedelta(start),
             dt.date(2022, 1, 1) + dt.timedelta(start + length))
        )
    return rows


@given(rows=interval_tables())
@SLOW
def test_interval_union_invariants(spark, rows):
    df = spark.createDataFrame(rows, "k string, s date, e date")
    merged = union_intervals(df, ["k"], "s", "e").collect()
    merged = sorted((r["s"], r["e"]) for r in merged)
    # 1. disjoint and strictly separated (no touching spans remain)
    for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
        assert e1 < s2
    # 2. coverage: every input interval lies inside some merged interval
    for _, s, e in rows:
        assert any(ms <= s and e <= me for ms, me in merged)
    # 3. conservation: merged bounds come from the input
    starts = {s for _, s, _ in rows}
    ends = {e for _, _, e in rows}
    for ms, me in merged:
        assert ms in starts and me in ends


@st.composite
def panels(draw):
    rows = []
    for ent in ("x", "y"):
        months = sorted(draw(st.sets(st.integers(0, 18), min_size=2, max_size=10)))
        for m in months:
            rows.append((ent, dt.date(2022 + m // 12, m % 12 + 1, 1),
                         float(draw(st.integers(0, 100)))))
    return rows


@given(rows=panels(), n=st.sampled_from([1, 2, 3]))
@SLOW
def test_lag_and_moving_average_vs_pandas(spark, rows, n):
    """Row-based lag == pandas groupby.shift; calendar moving average ==
    pandas rolling over the month-indexed series (gaps as NaN)."""
    from sf_datalake_spark.operators.windows import with_lag, with_moving_average

    df = spark.createDataFrame(rows, "siren string, `période` date, ca double")
    out = with_lag(df, "ca", n)
    out = with_moving_average(out, "ca", n).toPandas()
    out = out.sort_values(["siren", "période"]).reset_index(drop=True)

    pdf = pd.DataFrame(rows, columns=["siren", "période", "ca"])
    pdf = pdf.sort_values(["siren", "période"]).reset_index(drop=True)
    exp_lag = pdf.groupby("siren")["ca"].shift(n)
    assert list(out[f"ca_lag{n}m"].fillna(-1)) == list(exp_lag.fillna(-1))

    # calendar-aware MA: reindex each entity to a dense monthly grid,
    # rolling(n, min_periods=1), then read back at the original months
    for ent, g in pdf.groupby("siren"):
        idx = pd.PeriodIndex(pd.to_datetime(g["période"]), freq="M")
        dense = g.set_index(idx)["ca"].reindex(
            pd.period_range(idx.min(), idx.max(), freq="M")
        )
        rolled = dense.rolling(n, min_periods=1).mean()
        got = out[out["siren"] == ent][f"ca_mean{n}m"].to_numpy()
        exp = rolled.loc[idx].to_numpy()
        assert np.allclose(got, exp), (ent, got, exp)


@given(
    values=st.lists(st.tuples(st.sampled_from(["a", "b", "hot"]),
                              st.floats(-1e6, 1e6)), min_size=1, max_size=60),
    n_salts=st.sampled_from([2, 7, 16]),
)
@SLOW
def test_salted_aggregate_equals_plain(spark, values, n_salts):
    df = spark.createDataFrame(values, "k string, v double")
    plain = {r["k"]: (r["s"], r["n"]) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("n")).collect()}
    salted = {r["k"]: (r["v"], r["n"]) for r in
              salted_aggregate(
                  df.select("k", "v", F.col("v").alias("n")),
                  ["k"], {"v": "sum", "n": "count"}, n_salts=n_salts).collect()}
    assert plain.keys() == salted.keys()
    for k, (s, n) in plain.items():
        assert salted[k][1] == n
        assert abs(salted[k][0] - s) < 1e-6 * max(1.0, abs(s))


@st.composite
def corpora(draw):
    vocab = ["aa", "bb", "cc", "dd", "longword", "x"]
    n_docs = draw(st.integers(1, 8))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(0, 30))
        docs.append((i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n_tok))))
    return docs


@given(corpora(), st.integers(2, 8))
@SLOW
def test_chunks_reassemble_to_document(spark, docs, chunk):
    """With overlap=0, concatenating a doc's chunks in order restores
    its exact token sequence; every chunk except the last is full."""
    from sf_datalake_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=0)
    rows = sorted(
        ((r["doc_id"], r["chunk_index"], r["chunk_text"], r["n_tokens"])
         for r in out.collect())
    )
    by_doc = {}
    for d, i, t, n in rows:
        by_doc.setdefault(d, []).append((i, t, n))
    for d, text in docs:
        toks = text.split()
        if not toks:
            assert d not in by_doc
            continue
        parts = by_doc[d]
        assert [i for i, _, _ in parts] == list(range(len(parts)))
        rebuilt = " ".join(t for _, t, _ in parts).split()
        assert rebuilt == toks
        assert all(n == chunk for _, _, n in parts[:-1])


@given(corpora())
@SLOW
def test_entropy_bounds(spark, docs):
    """0 ≤ H ≤ log2(n_distinct), with equality at the degenerate and
    uniform extremes."""
    import math

    from sf_datalake_spark.functions.text import text_entropy

    df = spark.createDataFrame(docs, "doc_id long, text string")
    for r in text_entropy(df).collect():
        assert -1e-9 <= r["entropy"] <= math.log2(r["n_distinct"]) + 1e-6
        if r["n_distinct"] == 1:
            assert r["entropy"] == 0.0


@given(corpora(), st.integers(1, 3))
@SLOW
def test_boilerplate_extremes(spark, docs, line_tokens):
    """min_docs beyond the corpus size removes nothing — every cleaned
    document equals its line-reassembled self."""
    from sf_datalake_spark.operators.corpus import remove_boilerplate_lines

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = remove_boilerplate_lines(
        df, line_tokens=line_tokens, min_docs=len(docs) + 1
    )
    for r in out.collect():
        assert r["n_kept"] == r["n_lines"]
        original = dict(docs)[r["doc_id"]].split()
        assert r["clean_text"].split() == original


@given(corpora(), st.integers(1, 10))
@SLOW
def test_weighted_sample_is_subset_and_exact(spark, docs, k):
    """Output size is min(k, n_eligible); rows come from the input;
    deterministic across calls."""
    from sf_datalake_spark.operators.corpus import weighted_sample

    rows = [(d, t, len(t) + 1) for d, t in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    got = [r["doc_id"] for r in weighted_sample(df, k, "w", "doc_id").collect()]
    assert len(got) == min(k, len(rows))
    assert set(got) <= {d for d, _ in docs}
    again = [r["doc_id"] for r in weighted_sample(df, k, "w", "doc_id").collect()]
    assert got == again


@given(
    ranges=st.lists(
        st.tuples(st.integers(-100, 4100), st.integers(-100, 4100)).map(
            lambda t: (min(t), max(t))
        ),
        min_size=1,
        max_size=4,
    )
)
@SLOW
def test_file_skipping_equals_full_scan(spark, skipping_layout, ranges):
    """For ANY range predicate, pruned_read == full scan + filter —
    skipping may only remove files the predicate cannot touch."""
    from sf_datalake_spark.functions.skipping import pruned_read

    path, stats = skipping_layout
    full = spark.read.parquet(path)
    for lo, hi in ranges:
        got = pruned_read(spark, stats, {"id": (lo, hi)})
        want = full.filter((F.col("id") >= lo) & (F.col("id") <= hi))
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0


def _brute_force_spans(docs, w):
    """Reference ExactSubstr: duplicated-window positions via dict, span
    union via sorted interval sweep."""
    from collections import defaultdict

    grams = defaultdict(set)
    tok = {i: t.split() for i, t in docs}
    for i, ts in tok.items():
        for p in range(len(ts) - w + 1):
            grams[" ".join(ts[p : p + w])].add(i)
    shared = {g for g, ds in grams.items() if len(ds) >= 2}
    out = {}
    for i, ts in tok.items():
        pos = [p + 1 for p in range(len(ts) - w + 1)
               if " ".join(ts[p : p + w]) in shared]
        if not pos:
            continue
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + w - 1)
            else:
                spans.append([p, p + w - 1])
        out[i] = (len(spans), sum(e - s + 1 for s, e in spans),
                  max(e - s + 1 for s, e in spans))
    return out


@given(corpora(), st.integers(2, 4))
@SLOW
def test_substring_spans_match_brute_force(spark, docs, w):
    from sf_datalake_spark.operators.substrings import duplicated_span_stats

    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["max_span"])
        for r in duplicated_span_stats(df, "doc_id", "text", window=w).collect()
    }
    assert got == _brute_force_spans(docs, w)


@given(
    corpus=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                   min_size=0, max_size=40),
    probes=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                   min_size=1, max_size=40),
    m_bits=st.sampled_from([256, 1024, 4096]),
    k=st.integers(1, 5),
)
@SLOW
def test_bloom_never_false_negative(spark, corpus, probes, m_bits, k):
    from sf_datalake_spark.operators.bloom import (
        bloom_maybe_contains,
        bloom_sketch,
    )

    cdf = spark.createDataFrame([(x,) for x in corpus] or [("",)], "key string")
    if not corpus:
        cdf = cdf.filter("key <> ''")
    pdf = spark.createDataFrame([(x,) for x in probes], "key string")
    sketch = bloom_sketch(cdf, "key", m_bits, k)
    out = {
        r["key"]: r["maybe_member"]
        for r in bloom_maybe_contains(pdf, "key", sketch, m_bits, k).collect()
    }
    for key in probes & corpus:
        assert out[key], f"false negative for {key!r}"


# ---------------------------------------------------------------------------
# Analytics invariants (round 4): funnel stage counts are monotone
# non-increasing for ANY event stream, and every frequent pair's
# support is bounded by its items' supports (anti-monotonicity — the
# fact the Apriori prune relies on).
# ---------------------------------------------------------------------------

@st.composite
def event_streams(draw):
    n = draw(st.integers(1, 30))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.integers(1, 5)),                      # user
                dt.datetime(2024, 1, 1)
                + dt.timedelta(minutes=draw(st.integers(0, 5000))),
                i,                                            # unique seq
                draw(st.sampled_from(["view", "click", "purchase"])),
            )
        )
    return rows


@given(rows=event_streams())
@SLOW
def test_funnel_counts_monotone_nonincreasing(spark, rows):
    from sf_datalake_spark.operators.funnel import funnel_counts

    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    out = sorted(
        (r["stage_idx"], r["n_users"])
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    )
    counts = [n for _, n in out]
    assert counts == sorted(counts, reverse=True)
    # every non-first stage requires a strictly-later prior stage
    assert all(n >= 0 for n in counts)


@st.composite
def basket_tables(draw):
    n = draw(st.integers(1, 40))
    return [
        (draw(st.integers(1, 6)), draw(st.integers(1, 8)))
        for _ in range(n)
    ]


@given(rows=basket_tables(), min_support=st.integers(1, 3))
@SLOW
def test_pair_support_antimonotone(spark, rows, min_support):
    from sf_datalake_spark.operators.itemsets import frequent_pairs

    m = spark.createDataFrame(rows, "b bigint, i bigint")
    item_support = {
        r["i"]: r["s"]
        for r in m.distinct().groupBy("i").agg(F.count("*").alias("s")).collect()
    }
    out = frequent_pairs(m, "b", "i", min_support=min_support).collect()
    for r in out:
        assert r["support"] >= min_support
        assert r["support"] <= item_support[r["item_1"]]
        assert r["support"] <= item_support[r["item_2"]]
        assert r["item_1"] < r["item_2"]


@st.composite
def join_split_tables(draw):
    nl = draw(st.integers(0, 25))
    nr = draw(st.integers(0, 25))
    left = [(draw(st.integers(1, 8)), i) for i in range(nl)]
    right = [(draw(st.integers(1, 8)), 100 + i) for i in range(nr)]
    lmask = [draw(st.booleans()) for _ in left]
    rmask = [draw(st.booleans()) for _ in right]
    return left, right, lmask, rmask


@given(data=join_split_tables())
@SLOW
def test_incremental_join_view_equals_rebuild_any_split(spark, data):
    """For ANY partition of each input into (old, delta), delta-join
    maintenance must equal the full rebuild — multiplicities included
    (duplicate keys on both sides multiply)."""
    from sf_datalake_spark.operators.merge import incremental_join_view

    left, right, lmask, rmask = data
    ldf = spark.createDataFrame(left or [(0, -1)], "k bigint, lv bigint")
    rdf = spark.createDataFrame(right or [(0, -1)], "k bigint, rv bigint")
    if not left:
        ldf = ldf.filter("lv >= 0")
    if not right:
        rdf = rdf.filter("rv >= 0")
    lo = spark.createDataFrame(
        [r for r, m in zip(left, lmask) if m] or [(0, -1)], "k bigint, lv bigint"
    ).filter("lv >= 0")
    dl = spark.createDataFrame(
        [r for r, m in zip(left, lmask) if not m] or [(0, -1)],
        "k bigint, lv bigint",
    ).filter("lv >= 0")
    ro = spark.createDataFrame(
        [r for r, m in zip(right, rmask) if m] or [(0, -1)], "k bigint, rv bigint"
    ).filter("rv >= 0")
    dr = spark.createDataFrame(
        [r for r, m in zip(right, rmask) if not m] or [(0, -1)],
        "k bigint, rv bigint",
    ).filter("rv >= 0")

    v1 = incremental_join_view(lo.join(ro, "k"), lo, dl, ro, dr, ["k"])
    got = sorted((r["k"], r["lv"], r["rv"]) for r in v1.collect())
    want = sorted(
        (r["k"], r["lv"], r["rv"]) for r in ldf.join(rdf, "k").collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Round-4c batch properties
# ---------------------------------------------------------------------------


@st.composite
def grouped_values(draw):
    n = draw(st.integers(4, 40))
    groups = ["a", "b", "c"]
    return [
        (draw(st.sampled_from(groups)), draw(st.integers(-1000, 1000)), i)
        for i in range(n)
    ]


@given(rows=grouped_values())
@SLOW
def test_quantile_normalize_pooled_image_property(spark, rows):
    """The multiset of normalized values is drawn from the pooled
    value multiset, and within each group the map is monotone in the
    original value (rank transforms preserve order)."""
    from sf_datalake_spark.operators.aggregates import quantile_normalize

    df = spark.createDataFrame(rows, "g string, v bigint, id bigint")
    out = quantile_normalize(df, ["g"], "v", "id").collect()
    pooled = sorted(v for _, v, _ in rows)
    assert all(r["norm_value"] in pooled for r in out)
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["v"], r["id"], r["norm_value"]))
    for vals in by_g.values():
        vals.sort()
        normed = [n for _, _, n in vals]
        assert normed == sorted(normed)  # monotone within the group
        # highest-ranked row maps to the pooled maximum
        assert normed[-1] == pooled[-1]


@st.composite
def weighted_graphs(draw):
    n_nodes = draw(st.integers(3, 10))
    n_edges = draw(st.integers(2, 25))
    edges = [
        (
            draw(st.integers(1, n_nodes)),
            draw(st.integers(1, n_nodes)),
            draw(st.integers(1, 50)),
        )
        for _ in range(n_edges)
    ]
    edges = [(a, b, w) for a, b, w in edges if a != b]
    seeds = sorted({a for a, _, _ in edges})[:1]
    return edges, seeds


@given(gs=weighted_graphs())
@SLOW
def test_bellman_matches_networkx_free_reference(spark, gs):
    """k-hop Bellman-Ford equals a plain Python dynamic program over
    the same relaxation count."""
    from sf_datalake_spark.operators.components import bellman_k_hops

    edges, seeds = gs
    if not edges or not seeds:
        return
    k = 3
    df = spark.createDataFrame(edges, "src bigint, dst bigint, wgt bigint")
    sf = spark.createDataFrame([(s,) for s in seeds], "id bigint")
    got = {
        r["id"]: r["min_cost"]
        for r in bellman_k_hops(df, sf, k).collect()
    }
    und = edges + [(b, a, w) for a, b, w in edges]
    dist = {s: 0 for s in seeds}
    for _ in range(k):
        nxt = dict(dist)
        for a, b, w in und:
            if a in dist and dist[a] + w < nxt.get(b, float("inf")):
                nxt[b] = dist[a] + w
        dist = nxt
    assert got == dist


@given(
    revs=st.lists(st.integers(1, 10**9), min_size=1, max_size=30),
    budget=st.integers(1, 5000),
)
@SLOW
def test_hamilton_apportionment_properties(spark, revs, budget):
    """Σ slots == budget exactly, and every allocation is within one
    slot of its exact quota (the Hamilton quota property)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(revs)], "k int, rev bigint"
    )
    w_all = Window.partitionBy()
    based = df.select(
        "k",
        "rev",
        (F.lit(budget) * F.col("rev")).alias("num"),
        F.sum("rev").over(w_all).alias("den"),
    ).select(
        "k",
        "rev",
        "den",
        F.expr("num div den").alias("base"),
        F.expr("num % den").alias("frac"),
        (F.lit(budget) - F.sum(F.expr("num div den")).over(w_all)).alias("r"),
    )
    w_f = Window.orderBy(F.col("frac").desc(), F.col("k").asc())
    out = based.select(
        "k",
        "rev",
        "den",
        (
            F.col("base")
            + F.when(F.row_number().over(w_f) <= F.col("r"), 1).otherwise(0)
        ).alias("slots"),
    ).collect()
    total = sum(r["slots"] for r in out)
    assert total == budget
    for r in out:
        quota = budget * r["rev"] / r["den"]
        assert quota - 1 < r["slots"] < quota + 1


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2, 2, allow_nan=False, width=32), min_size=3,
            max_size=3
        ),
        min_size=1,
        max_size=25,
    )
)
@SLOW
def test_gram_matrix_equals_numpy_reference(spark, vecs):
    from sf_datalake_spark.operators.similarity import gram_matrix_int

    df = spark.createDataFrame([(v,) for v in vecs], "embedding array<float>")
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in gram_matrix_int(df, quant=1000).collect()
    }
    x = np.array(vecs, dtype=np.float64) * 1000.0
    q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)
    ref = q.T @ q
    for (i, j), v in got.items():
        assert v == ref[i - 1, j - 1]
