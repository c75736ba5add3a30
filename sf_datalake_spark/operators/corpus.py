"""Corpus-preparation operators for LLM training data: chunking,
sequence packing, deterministic stratified sampling, benchmark
contamination screening, PII redaction.

These extend the reference's surface (it has no corpus layer; SURVEY.md
§2's training-data addendum) with the operations a 100 TB text pipeline
runs between raw ingest and tokenization.  Every operator is pure
Column arithmetic — zero Python in the row path — and every one has a
DuckDB-expressible twin so the cross-engine oracle gate covers them.

Scale notes per operator are in each docstring; the common theme: the
only shuffle anywhere is (a) packing's per-group window and (b) the
contamination join on hashed shingles — chunking, sampling, and
redaction are narrow (pipelined, no exchange), so they compose with
scans and filters for free.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sf_datalake_spark.functions.text import tokenize, word_shingles
from sf_datalake_spark.operators.split import hash_bucket


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
    keep: list[str] | None = None,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows —
    (id, chunk_index, chunk_text, n_tokens), the standard pre-embedding
    / pre-tokenization chunking pass.

    Chunk ``i`` covers tokens ``[i·stride, i·stride + chunk_tokens)``
    with ``stride = chunk_tokens − overlap``; the last chunk is short
    rather than padded; empty documents yield no rows.  All JVM: one
    tokenize, one ``sequence``+``explode`` (row explosion inside the
    scan stage, no shuffle), slices + ``concat_ws`` — whole-stage
    codegen end to end, linear in output tokens.  At 100 TB this is
    the shape you want: chunking parallelism equals scan parallelism
    and Catalyst pushes any post-chunk filter into the same stage.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = tokenize(text_col)
    n = F.size(toks)
    # ceil((n - chunk)/stride) + 1 for n > chunk, else 1 (integer form)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        (n - F.lit(chunk_tokens) + F.lit(2 * stride - 1)).cast("bigint") / F.lit(stride)
    ).cast("bigint")
    out = (
        df.filter(n > 0)
        .select(
            *(keep or []),
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
                "chunk_index"
            ),
        )
    )
    piece = F.slice(
        F.col("__toks"), (F.col("chunk_index") * stride + 1).cast("int"), chunk_tokens
    )
    return out.select(
        *(keep or []),
        id_col,
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    budget: int,
    partition_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-budget bins for training-sequence
    packing: contiguous streaming packing in deterministic ``id_col``
    order — bin = ⌊exclusive-cumsum(weight) / budget⌋, offset =
    exclusive-cumsum mod budget.

    This is the STREAMING approximation of bin packing (a document may
    straddle its bin's boundary by less than its own length — the
    consumer truncates or spills to the next sequence), chosen because
    it is a single window expression: exact first-fit-decreasing is
    inherently sequential and cannot scale past one core.

    Scale: the window partitions by ``partition_col`` (shard/source) so
    packing parallelizes across groups — one hash exchange total.  A
    ``partition_col=None`` call packs GLOBALLY through a single
    partition: correct, but a driver-style bottleneck — only for small
    curated sets (the docstring is the warning; the operator refuses
    nothing).
    """
    part = [partition_col] if partition_col else []
    w = Window.partitionBy(*part).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_excl = F.coalesce(F.sum(weight_col).over(w), F.lit(0)).cast("bigint")
    return df.select(
        *part,
        id_col,
        F.col(weight_col).alias("weight"),
        F.floor(cum_excl / budget).cast("bigint").alias("bin_id"),
        (cum_excl % budget).alias("bin_offset"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key's
    md5 bucket (basis points, :func:`operators.split.hash_bucket`)
    falls below its stratum's fraction — the corpus-mixing primitive
    (e.g. keep 100% of curated sources, 10% of web crawl).

    Unlike ``df.sampleBy`` (seeded RNG, resample on every retry, not
    reproducible across engines) this is a PURE FILTER: zero shuffle,
    composes with pushdown, bit-reproducible anywhere md5 exists —
    which is what makes it oracle-checkable and re-runnable on 100 TB
    without a materialized sample table.
    """
    bucket = hash_bucket(key_col, 10_000, salt)
    expr: Column = F.lit(int(round(default_fraction * 10_000)))
    for stratum, frac in fractions.items():
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * 10_000)))
        ).otherwise(expr)
    return df.filter(bucket < expr)


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_common: int = 1,
) -> DataFrame:
    """Benchmark-contamination screen: which corpus documents share ≥
    ``min_common`` distinct word n-grams with ANY benchmark document
    (the standard train/test decontamination pass before LLM training).

    Returns (id, n_common, n_shingles, contamination) where
    ``contamination = n_common / n_shingles`` is the fraction of the
    document's shingle set that appears anywhere in the benchmark.

    Plan: both sides shingle → hash to a 60-bit key → distinct;
    benchmark shingles collapse to ONE small distinct set joined on the
    hashed key (never text), then one groupBy(doc).  Corpus side
    shuffles (sh, id) pairs only; the benchmark side is tiny by
    construction (benchmarks are KBs against a 100 TB corpus) so AQE
    broadcasts it.  No all-pairs anything.
    """
    def sh(d: DataFrame) -> DataFrame:
        return (
            d.select(
                F.col(id_col),
                F.explode(word_shingles(text_col, shingle_n)).alias("__s"),
            )
            .select(
                id_col,
                F.conv(F.substring(F.md5("__s"), 1, 15), 16, 10)
                .cast("bigint")
                .alias("sh"),
            )
            .distinct()
        )

    corpus_sh = sh(corpus)
    bench_sh = sh(benchmark).select("sh").distinct()
    sizes = corpus_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    common = (
        corpus_sh.join(bench_sh, "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_common"))
    )
    return (
        sizes.join(common, id_col)
        .filter(F.col("n_common") >= min_common)
        .select(
            id_col,
            "n_common",
            "n_shingles",
            F.round(F.col("n_common") / F.col("n_shingles"), 6).alias("contamination"),
        )
    )


#: Email / simple phone patterns shared verbatim by Java regex (Spark)
#: and RE2 (DuckDB) — no lookarounds, no shorthand classes that diverge.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b555-[0-9]{4}\b"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    output_col: str = "redacted",
) -> DataFrame:
    """Redact e-mail addresses and (toy-pattern) phone numbers from a
    text column, counting both — the minimal PII-scrub pass every
    training corpus gets.  Pure ``regexp_replace``/``regexp_count``
    Column expressions: narrow, codegen'd, zero shuffle; patterns are
    the lookaround-free subset shared by Java regex and RE2 so the
    DuckDB oracle replays them bit-for-bit.  Swap/extend the pattern
    list for production (SSNs, credit cards, addresses) — the plan
    shape does not change.
    """
    c = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(c, F.lit(EMAIL_PATTERN)))
        .withColumn("n_phones", F.regexp_count(c, F.lit(PHONE_PATTERN)))
        .withColumn(
            output_col,
            F.regexp_replace(
                F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"),
                PHONE_PATTERN,
                "<PHONE>",
            ),
        )
    )
