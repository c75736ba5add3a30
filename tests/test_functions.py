"""Tests for scalar/column function layers (dates, numeric, text, vector)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sf_datalake_spark.functions.dates import (
    month_index,
    month_trunc,
    monthly_date_dim,
    spread_over_months,
)
from sf_datalake_spark.functions.numeric import (
    clip,
    count_missing_values,
    count_nan_values,
    sigmoid,
)
from sf_datalake_spark.functions.text import (
    text_fingerprint,
    token_count,
    tokenize,
    word_shingles,
)
from sf_datalake_spark.functions.vector import (
    array_cosine_similarity,
    array_dot,
    array_norm,
)

from tests.conftest import d


def test_month_trunc_and_index(spark):
    df = spark.createDataFrame([(d("2023-07-15"),)], "x date")
    row = df.select(
        month_trunc("x").alias("m"), month_index("x").alias("i")
    ).first()
    assert row["m"] == d("2023-07-01")
    assert row["i"] == (2023 - 1970) * 12 + 6


def test_monthly_date_dim(spark):
    dim = monthly_date_dim(spark, "2023-01-01", "2023-04-30", "p")
    assert [r["p"] for r in dim.collect()] == [
        d("2023-01-01"), d("2023-02-01"), d("2023-03-01"), d("2023-04-01")
    ]


def test_spread_over_months_inclusive_exclusive(spark):
    df = spark.createDataFrame(
        [(d("2023-01-15"), d("2023-03-01"))], "s date, e date"
    )
    inc = spread_over_months(df, "s", "e", "p").select("p").collect()
    assert [r["p"] for r in inc] == [d("2023-01-01"), d("2023-02-01"), d("2023-03-01")]
    exc = spread_over_months(df, "s", "e", "p", end_exclusive=True).select("p").collect()
    assert [r["p"] for r in exc] == [d("2023-01-01"), d("2023-02-01")]


def test_clip_and_sigmoid(spark):
    df = spark.createDataFrame([(0.0,), (10.0,), (-10.0,)], "x double")
    rows = df.select(
        clip("x", -5.0, 5.0).alias("c"), sigmoid("x").alias("s")
    ).collect()
    got = {r["c"] for r in rows}
    assert got == {0.0, 5.0, -5.0}
    s = {r["s"] for r in rows}
    assert 0.5 in s
    assert all(0.0 < v < 1.0 for v in s)


def test_count_missing_and_nan(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (None, None), (float("nan"), "c")], "x double, y string"
    )
    nulls = count_missing_values(df).first()
    assert (nulls["x"], nulls["y"]) == (1, 1)
    nans = count_nan_values(df).first()
    assert nans["x"] == 1
    assert "y" not in nans.asDict()


def test_tokenize_and_shingles(spark):
    df = spark.createDataFrame([("  a  b c d ",), ("x y",)], "text string")
    rows = df.select(
        tokenize("text").alias("t"),
        token_count("text").alias("n"),
        word_shingles("text", 3).alias("sh"),
    ).collect()
    assert rows[0]["t"] == ["a", "b", "c", "d"]
    assert rows[0]["n"] == 4
    assert rows[0]["sh"] == ["a b c", "b c d"]
    assert rows[1]["sh"] == []  # shorter than n


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",)], "text string"
    )
    fps = [r["fp"] for r in df.select(text_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [4.0, 3.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        array_dot("a", "b").alias("dot"),
        array_norm("a").alias("na"),
        array_cosine_similarity("a", "b").alias("cos"),
    ).first()
    assert row["dot"] == 24.0
    assert row["na"] == 5.0
    assert abs(row["cos"] - 24.0 / 25.0) < 1e-12


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert df.select(array_cosine_similarity("a", "b").alias("c")).first()["c"] is None


def test_unicode_column_names_roundtrip(spark, tmp_path):
    """The reference's columns are accented French (période, dû) —
    SURVEY.md §1.2 requires unicode-safe end-to-end handling."""
    df = spark.createDataFrame(
        [("123456789", d("2023-01-01"), 1.5)],
        "siren string, `période` date, `dette_sociale_ouvrière` double",
    )
    p = str(tmp_path / "uni.parquet")
    df.write.parquet(p)
    back = spark.read.parquet(p)
    assert set(back.columns) == {"siren", "période", "dette_sociale_ouvrière"}
    assert back.first()["dette_sociale_ouvrière"] == 1.5


def test_check_constraints_one_pass(spark):
    from sf_datalake_spark.functions.profile import check_constraints

    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, None, -3.0), (2, "y", None), (3, "z", 10.0)],
        "id int, name string, v double",
    )
    out = {
        r["constraint"]: (r["n_rows"], r["n_violations"], r["satisfied"])
        for r in check_constraints(
            df,
            row_checks={
                "complete(name)": F.col("name").isNotNull(),
                "bound(v >= 0)": F.col("v") >= 0,  # NULL v counts as violation
            },
            unique_keys=["id"],
        ).collect()
    }
    assert out["complete(name)"] == (4, 1, 0)
    assert out["bound(v >= 0)"] == (4, 2, 0)  # -3.0 and NULL
    assert out["unique(id)"] == (4, 1, 0)  # id=2 twice


def test_check_constraints_all_green_single_job(spark):
    from sf_datalake_spark.functions.profile import check_constraints

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    res = check_constraints(
        df, row_checks={"complete(s)": F.col("s").isNotNull()}, unique_keys=["id"]
    )
    assert [r["satisfied"] for r in res.collect()] == [1, 1]


def test_bpe_token_count_classes(spark):
    """Contractions split off, letter/digit/punct runs are separate
    pieces, whitespace never counts."""
    from sf_datalake_spark.functions.text import bpe_token_count, token_count

    rows = [
        (1, "I'll go"),          # I | 'll | _go                     → 3
        (2, "abc123!?"),         # abc | 123 | !?                    → 3
        (3, "  spaced   out "),  # _spaced | _out (+ws runs dropped) → 2
        (4, "don't"),            # don | 't                          → 2
        (5, ""),                 # empty                             → 0
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: (r["bpe"], r["ws"])
        for r in df.select(
            "id",
            bpe_token_count("text").alias("bpe"),
            token_count("text").alias("ws"),
        ).collect()
    }
    assert got == {1: (3, 2), 2: (3, 1), 3: (2, 2), 4: (2, 1), 5: (0, 0)}


def test_z_value_interleaves_bits(spark):
    from sf_datalake_spark.functions.zorder import z_value

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a int, b int"
    )
    got = [r["z"] for r in df.select(z_value("a", "b").alias("z")).collect()]

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]
    assert got[1] == 1 and got[2] == 2  # a in even bits, b in odd bits


def test_write_zordered_tightens_file_boxes(spark, tmp_path):
    """Z-ordered files each cover a small min/max box in BOTH dimensions
    — the property parquet footer pruning exploits. Compare the mean box
    area against a layout sorted by only one dimension."""
    import pyarrow.parquet as pq

    from sf_datalake_spark.functions.zorder import write_zordered

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int")

    z_dir, lin_dir = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(df, z_dir, ("x", "y"), n_files=16)
    df.repartitionByRange(16, "x").write.mode("overwrite").parquet(lin_dir)

    def y_ranges(d):
        import glob

        out = []
        for f in glob.glob(f"{d}/*.parquet"):
            t = pq.read_table(f)
            ys = t["y"].to_pylist()
            if ys:
                out.append((min(ys), max(ys)))
        return out

    # Pruning for a predicate on y ALONE (the dimension the linear
    # layout ignores): which files' [min,max] boxes intersect y == 17?
    z_hit = sum(1 for lo, hi in y_ranges(z_dir) if lo <= 17 <= hi)
    lin_rngs = y_ranges(lin_dir)
    lin_hit = sum(1 for lo, hi in lin_rngs if lo <= 17 <= hi)
    # x-only sort leaves y unconstrained: EVERY file spans all of y
    assert lin_hit == len(lin_rngs)
    # Z-order tiles bound y per file: most files are pruned
    assert z_hit * 2 <= lin_hit, (z_hit, lin_hit)


def test_check_constraints_empty_raises(spark):
    import pytest

    from sf_datalake_spark.functions.profile import check_constraints

    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="no constraints"):
        check_constraints(df)


def test_bpe_token_count_vertical_tab_cross_engine(spark):
    """Java \\s includes \\x0B, RE2's does not — the pattern pins an
    explicit whitespace class so both engines count identically."""
    import duckdb

    from sf_datalake_spark.functions.text import BPE_PRETOKEN_PATTERN, bpe_token_count

    text = "a\x0bb c"
    df = spark.createDataFrame([(1, text)], "id int, text string")
    spark_n = df.select(bpe_token_count("text").alias("n")).collect()[0]["n"]
    duck_n = duckdb.sql(
        "SELECT len(list_filter(regexp_extract_all(?, ?), "
        "x -> regexp_matches(x, '[^ \\t\\n\\f\\r]')))",
        params=[text, BPE_PRETOKEN_PATTERN],
    ).fetchone()[0]
    assert spark_n == duck_n


def test_z_value_n_three_columns(spark):
    """3-way interleave: bit i of column j lands at position i*3 + j,
    and the 2-column form is exactly z_value_n([a, b])."""
    from pyspark.sql import functions as F

    from sf_datalake_spark.functions.zorder import (
        z_value,
        z_value_n,
        z_value_sql_n,
    )

    df = spark.createDataFrame(
        [(1, 0, 0), (0, 1, 0), (0, 0, 1), (3, 5, 6)], "a long, b long, c long"
    )
    got = [
        r["z"] for r in df.select(z_value_n(["a", "b", "c"], 4).alias("z")).collect()
    ]

    def ref(a, b, c):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (3 * i)
            z |= ((b >> i) & 1) << (3 * i + 1)
            z |= ((c >> i) & 1) << (3 * i + 2)
        return z

    assert got == [ref(1, 0, 0), ref(0, 1, 0), ref(0, 0, 1), ref(3, 5, 6)]
    # SQL twin is the same arithmetic
    sql = z_value_sql_n(["a", "b", "c"], 4)
    got_sql = [r["z"] for r in df.selectExpr(f"{sql} AS z").collect()]
    assert got_sql == got
    # 2-col compatibility
    two = [r["z"] for r in df.select(z_value("a", "b", 4).alias("z")).collect()]
    two_n = [
        r["z"] for r in df.select(z_value_n(["a", "b"], 4).alias("z")).collect()
    ]
    assert two == two_n


def test_z_value_n_rejects_overflowing_dims():
    import pytest as _pytest

    from sf_datalake_spark.functions.zorder import z_value_n

    with _pytest.raises(ValueError, match="> 63"):
        z_value_n(["a", "b", "c", "d"], 16)  # 64 bits


def test_write_zordered_three_col_files_are_boxed(spark, tmp_path):
    """3-column Z-ordered files must carry tight per-file min/max boxes
    in every dimension (the property footer pruning relies on)."""
    from pyspark.sql import functions as F

    from sf_datalake_spark.functions.zorder import write_zordered

    df = spark.range(0, 4096).select(
        (F.col("id") % 16).alias("x"),
        (F.floor(F.col("id") / 16) % 16).alias("y"),
        (F.floor(F.col("id") / 256) % 16).alias("z3"),
    )
    p = str(tmp_path / "z3")
    write_zordered(df, p, ["x", "y", "z3"], n_bits=4, n_files=8)
    widths = (
        spark.read.parquet(p)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            *(
                (F.max(c) - F.min(c)).alias(f"w_{c}")
                for c in ("x", "y", "z3")
            )
        )
        .collect()
    )
    assert len(widths) == 8
    # Aggregate quality bound, robust to range-exchange SAMPLING (a
    # file may straddle a top Z bit, blowing up its box in one dim):
    # the mean per-file min/max box volume must be well under the full
    # 16^3 domain — an unclustered layout puts every file at ~4096.
    volumes = [
        (r["w_x"] + 1) * (r["w_y"] + 1) * (r["w_z3"] + 1) for r in widths
    ]
    assert sum(volumes) / len(volumes) <= 2048, volumes
