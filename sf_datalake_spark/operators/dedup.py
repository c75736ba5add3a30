"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators (beyond the reference's surface). All
hash functions derive from md5 so results are deterministic and
reproducible by external engines (oracle-checkable) — no dependence on
Spark's partition-order or JVM hash seeds.

Scale design:
- Exact dedup: one hash-groupBy on a 32-byte fingerprint — the shuffle
  carries (fingerprint, id), not the document text.
- MinHash: explode shingles → ONE groupBy(doc) computing all K minima
  as K aggregate columns (one shuffle, map-side partial aggregation).
- LSH banding: candidate generation is an equi-join on (band, band_hash)
  buckets — a hash join on small keys, never an all-pairs comparison.
- SimHash: 64 aggregate columns over exploded tokens; near-dup pairs via
  ``bit_count(xor)`` hamming distance inside LSH-style prefix buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sf_datalake_spark.functions.text import text_fingerprint, tokenize, word_shingles


from sf_datalake_spark.operators.skew import spread_narrow_scan  # noqa: F401
# (re-exported here for the dedup call sites; canonical home is skew.py,
#  the scale-mitigation module, so multimodal/similarity share it)


def md5_hash64(col: Column, seed: int | str = "") -> Column:
    """Deterministic signed 60-bit hash: first 15 hex chars of md5."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f";{seed}"))), 1, 15), 16, 10
    ).cast("bigint")


#: Mersenne prime 2^61 − 1 for the MinHash Carter-Wegman family.
MINHASH_PRIME = 2305843009213693951


def minhash_constants(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Per-seed (c_i, d_i) constants for h_i = (c_i·x + d_i) mod p.

    Seeded and driver-side so any engine (the DuckDB oracle included)
    can reproduce the exact family; c_i < 2^30 bounds c_i·x (x 32-bit)
    under 2^62 in a signed-64 lane."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, 1 << 30)), int(rng.randint(0, 1 << 30)))
        for _ in range(num_hashes)
    ]


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per exact-normalized-text group."""
    return (
        df.withColumn("__fp", text_fingerprint(text_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_duplicates"))
        .drop("__fp")
    )


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<bigint>) — MinHash over word shingles.

    One explode + one groupBy computing all ``num_hashes`` minima as
    aggregate columns. Documents with no shingle (shorter than
    ``shingle_n`` tokens) are dropped, like datasketch's convention.
    """
    shingled = spread_narrow_scan(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("__sh")
    )
    # ONE md5 per shingle; the K hash functions are an independent
    # Carter-Wegman family h_i = (c_i·x + d_i) mod p over a 32-bit digest
    # slice, with per-seed driver constants (c_i < 2^30 keeps c_i·x under
    # 2^62 — signed-64 safe; p = 2^61−1). Independent constants per seed
    # keep band collisions on the theoretical (1−(1−J^r)^b) curve — a
    # shared-slope affine-in-i family would correlate the bands.
    x = F.conv(F.substring(F.md5(F.col("__sh")), 1, 8), 16, 10).cast("bigint")
    shingled = shingled.select(id_col, x.alias("__x"))
    mins = [
        F.min((F.lit(c) * F.col("__x") + F.lit(d)) % F.lit(MINHASH_PRIME)).alias(
            f"__h{i}"
        )
        for i, (c, d) in enumerate(minhash_constants(num_hashes))
    ]
    sig = shingled.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 4,
    signature_length: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs from banded MinHash signatures.

    Band b's key is md5 of signature[b*r : (b+1)*r]; docs sharing any
    band key become a candidate pair (id_1 < id_2, distinct).

    Pass ``signature_length`` (the ``num_hashes`` used upstream) to
    validate the banding for free; without it one row is materialized to
    check — out-of-range slots would otherwise silently collapse whole
    bands into a single all-pairs bucket (null ``element_at`` →
    ``concat_ws`` skips → every doc shares ``md5('')``).

    ``max_bucket_size`` is the whale-bucket guard: a degenerate family
    of n near-identical docs puts all n in one bucket per band, and the
    self-join emits C(n,2) pairs — 5·10⁷ for one 10k family, the stage
    that never finishes at crawl scale.  With the cap set, buckets
    larger than it switch to STAR linking (every member pairs with the
    bucket's min id only): O(n) pairs instead of O(n²), and downstream
    connected-components still unions the whole family into one cluster
    because the star is connected.  Pair-level recall inside whale
    buckets is traded for bounded cost — the members remain reachable
    through the hub, which is what near-dup *dedup* (cluster → keep
    one) needs.  Buckets at or under the cap keep exact full pairs.
    """
    banded = _band_keys(
        signatures, id_col, bands, rows_per_band, signature_length
    )
    if max_bucket_size is not None:
        if max_bucket_size < 2:
            raise ValueError("max_bucket_size must be >= 2")
        w = Window.partitionBy("band", "bucket")
        banded = banded.withColumn("__bn", F.count("*").over(w)).withColumn(
            "__bmin", F.min(id_col).over(w)
        )
        small = banded.filter(F.col("__bn") <= max_bucket_size).drop(
            "__bn", "__bmin"
        )
        star = (
            banded.filter(
                (F.col("__bn") > max_bucket_size)
                & (F.col(id_col) > F.col("__bmin"))
            )
            .select(
                F.col("__bmin").alias("id_1"), F.col(id_col).alias("id_2")
            )
        )
        a = small.alias("a")
        b = small.alias("b")
        full = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_1"),
            F.col(f"b.{id_col}").alias("id_2"),
        )
        return full.unionByName(star).distinct()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_1"), F.col(f"b.{id_col}").alias("id_2")
        )
        .distinct()
    )


def _band_keys(
    signatures: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    signature_length: int | None = None,
) -> DataFrame:
    """(id, band, bucket) banding rows shared by the self-join and the
    incremental (new-vs-base) LSH paths; validates the banding against
    the signature length (see :func:`lsh_candidate_pairs`)."""
    n = signature_length
    if n is None:
        row = signatures.select(F.size("signature").alias("n")).head(1)
        n = row[0]["n"] if row else None
    if n is not None and bands * rows_per_band > n:
        raise ValueError(
            f"bands × rows_per_band = {bands * rows_per_band} exceeds the "
            f"signature length {n} — out-of-range slots would collapse "
            "those bands into one all-pairs bucket"
        )
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", b * rows_per_band + r + 1).cast(
                                        "string"
                                    )
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_pairs_against(
    new_sigs: DataFrame,
    base_sigs: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 4,
    signature_length: int | None = None,
    include_new_pairs: bool = True,
) -> DataFrame:
    """Incremental dedup: candidate near-dup pairs of an INCOMING batch
    against an EXISTING corpus — plus (by default) within-batch pairs —
    with the signature-agreement Jaccard estimate attached.

    Output ``(new_id, match_id, match_side, est_jaccard)``:
    ``match_side`` is ``'base'`` for batch-vs-corpus hits and ``'new'``
    for within-batch hits (emitted once, ``new_id < match_id``);
    ``est_jaccard`` is the fraction of agreeing signature slots — the
    unbiased MinHash estimate of Jaccard similarity, the standard
    pre-verification score.  Ids must be disjoint across the two inputs
    (they identify which side a document lives on).

    This is the continuous-ingest shape at 100 TB: the corpus side's
    ``(id, band, bucket)`` table and signatures are computed ONCE and
    stored (bucketed by ``(band, bucket)``); each incoming batch
    computes only its own signatures, and the band equi-join prunes the
    corpus to matching buckets — cost scales with the batch, not the
    corpus.  Within-batch pairs reuse :func:`lsh_candidate_pairs`.
    """
    new_b = _band_keys(new_sigs, id_col, bands, rows_per_band, signature_length)
    base_b = _band_keys(base_sigs, id_col, bands, rows_per_band, signature_length)
    n = new_b.alias("n")
    e = base_b.alias("e")
    cross = (
        n.join(
            e,
            (F.col("n.band") == F.col("e.band"))
            & (F.col("n.bucket") == F.col("e.bucket")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"e.{id_col}").alias("match_id"),
            F.lit("base").alias("match_side"),
        )
        .distinct()
    )
    pairs = cross
    if include_new_pairs:
        within = lsh_candidate_pairs(
            new_sigs, id_col, bands, rows_per_band, signature_length
        ).select(
            F.col("id_1").alias("new_id"),
            F.col("id_2").alias("match_id"),
            F.lit("new").alias("match_side"),
        )
        pairs = cross.unionAll(within)
    sigs = new_sigs.unionAll(base_sigs)
    s1 = sigs.select(F.col(id_col).alias("new_id"), F.col("signature").alias("__s1"))
    s2 = sigs.select(F.col(id_col).alias("match_id"), F.col("signature").alias("__s2"))
    agree = F.size(
        F.filter(
            F.zip_with("__s1", "__s2", lambda x, y: x == y), lambda v: v
        )
    )
    return (
        pairs.join(s1, "new_id")
        .join(s2, "match_id")
        .select(
            "new_id",
            "match_id",
            "match_side",
            F.round(agree / F.size("__s1"), 6).alias("est_jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_frequency: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    shingle-inverted-index self-join: |A∩B| per pair from the join,
    |A|,|B| from per-doc distinct counts, J = ∩ / (|A|+|B|−∩).
    The shared-shingle prefilter keeps this far from all-pairs.

    ``max_doc_frequency`` is the hot-shingle guard for scale: a shingle
    appearing in ``> max_doc_frequency`` documents (boilerplate headers,
    license blocks) is dropped as a stopword BEFORE the self-join —
    without it one hot key makes the join quadratic in that shingle's
    document count. Stopword semantics are principled: the shingle
    leaves both the intersection AND the per-doc sizes, so ``jaccard``
    is the exact Jaccard over the filtered shingle space (docs whose
    every shingle is hot drop out entirely). Costs one extra
    groupBy(shingle) + a broadcast anti-join against the (tiny) hot
    set. Default ``None`` preserves unfiltered semantics.

    Plan shape: the shingle subtree (scan → explode → md5 → distinct)
    feeds four consumers (doc-frequency count, anti-join, both
    self-join sides), but its terminal distinct exchange is deduped by
    ReuseExchange, so the guard costs NO extra corpus scan — measured
    on the executed AQE plan (collect, not count — plan strings lie
    under count): 2 scans / 2 ReusedExchange both with and without the
    guard; an explicit ``repartition("sh")`` between dedup and the
    consumers was tried and is strictly worse (+2 exchanges, same
    scans).

    The join/shuffle key is a 60-bit md5 of the shingle, not the string
    — fixed-width numeric keys shuffle and compare far faster; a
    colliding pair of distinct shingles (P ≈ n²/2⁶¹) would only nudge
    one intersection count by 1.
    """
    sh = spread_narrow_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(word_shingles(text_col, shingle_n)).alias("__s"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5("__s"), 1, 15), 16, 10).cast("bigint").alias("sh"),
    ).distinct()
    if max_doc_frequency is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_doc_frequency)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_1"), F.col(f"b.{id_col}").alias("id_2"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_1"), F.col("sz").alias("sz_1"))
    sb = sizes.select(F.col(id_col).alias("id_2"), F.col("sz").alias("sz_2"))
    return (
        common.join(sa, "id_1")
        .join(sb, "id_2")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_1") + F.col("sz_2") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 48) -> DataFrame:
    """(id, simhash bigint) — classic SimHash over whitespace tokens.

    Token hash = first ``bits/4`` hex chars of md5 (``bits`` ≤ 60 keeps
    every intermediate positive in a signed 64-bit lane — portable to
    external engines with no unsigned/overflow gymnastics); each output
    bit is the sign of the sum of (±1) contributions across tokens.
    Computed as ``bits`` aggregate columns over one explode — single
    shuffle with map-side combine.
    """
    if bits % 4 or not 4 <= bits <= 60:
        raise ValueError("bits must be a multiple of 4 in [4, 60]")
    toks = spread_narrow_scan(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("__t")
    )
    h = F.conv(F.substring(F.md5(F.col("__t")), 1, bits // 4), 16, 10).cast("bigint")
    toks = toks.select(id_col, h.alias("__h"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"__b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"__b{i}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim + term
    return agg.select(id_col, sim.alias("simhash"))


def simhash_near_dup_pairs(
    sims: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 48,
    num_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by hamming distance ≤ ``max_hamming``, multi-block
    SimHash (Manku et al., WWW'07 "Detecting near-duplicates for web
    crawling" — public algorithm): split the ``bits``-bit hash into
    ``num_blocks`` contiguous blocks and join on each block's exact
    value.  With the default ``num_blocks = max_hamming + 1`` the
    pigeonhole principle makes candidate recall EXACT — ≤ ``max_hamming``
    differing bits cannot touch all blocks, so every qualifying pair
    shares at least one block verbatim.  Candidates are verified with
    ``bit_count(xor)``.

    Cost scales with ``num_blocks`` explodes + one equi-join on
    (block_idx, block_value) — still bucketed, never all-pairs.  Passing
    a smaller ``num_blocks`` trades recall for fewer/larger buckets
    (recall loss begins at ``max_hamming ≥ num_blocks``).
    """
    nb = num_blocks if num_blocks is not None else max_hamming + 1
    if not 1 <= nb <= bits:
        raise ValueError(f"num_blocks must be in [1, {bits}], got {nb}")
    widths = [bits // nb + (1 if i < bits % nb else 0) for i in range(nb)]
    offsets = [sum(widths[:i]) for i in range(nb)]
    blocked = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("val"),
                    )
                    for i, (off, w) in enumerate(zip(offsets, widths))
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val"))
    a, b = blocked.alias("a"), blocked.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_1"),
            F.col(f"b.{id_col}").alias("id_2"),
            F.col("a.simhash").alias("__s1"),
            F.col("b.simhash").alias("__s2"),
        )
        .distinct()  # a pair can match in several blocks
    )
    return (
        candidates.withColumn(
            "hamming", F.bit_count(F.col("__s1").bitwiseXOR(F.col("__s2")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
    )


def ncd_scores(
    pairs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    level: int = 6,
) -> DataFrame:
    """Normalized compression distance for CANDIDATE pairs (Cilibrasi &
    Vitányi 2005): NCD(x,y) = (C(xy) − min(Cx,Cy)) / max(Cx,Cy) with C
    = zlib-compressed byte length — the parameter-free similarity that
    catches structural near-dups (reordered paragraphs, templated
    spam) that shingle Jaccard underrates.

    Exact-integer contract: zlib sizes are deterministic integers for
    a fixed level, so ``ncd_ppm = (c_ab − least) · 10⁶ div greatest``
    is reproducible across runs and machines (same zlib, documented).

    Scale contract: the caller BLOCKS first (LSH buckets, cluster
    candidates — same rule as every pair operator in this module);
    this operator prices candidates only. One Arrow stage (zlib is the
    justification — no JVM codec surface), no shuffle of its own.
    Compressing x·y per pair is inherently O(|x|+|y|) per candidate —
    the reason NCD is a RERANKER after cheap blocking, never a
    generator.
    """
    import pandas as pd

    keep = [c for c in pairs.columns if c not in (text_a, text_b)]

    def score(batches):
        import zlib

        for pdf in batches:
            if pdf.empty:
                continue
            ca, cb, cab = [], [], []
            for xa, xb in zip(pdf[text_a], pdf[text_b]):
                ba = (xa or "").encode("utf-8")
                bb = (xb or "").encode("utf-8")
                ca.append(len(zlib.compress(ba, level)))
                cb.append(len(zlib.compress(bb, level)))
                cab.append(len(zlib.compress(ba + bb, level)))
            out = pdf[keep].copy()
            out["c_a"], out["c_b"], out["c_ab"] = ca, cb, cab
            yield out

    id_schema = ", ".join(
        f"{c} {t}" for c, t in pairs.dtypes if c not in (text_a, text_b)
    )
    scored = pairs.mapInPandas(
        score, schema=f"{id_schema}, c_a long, c_b long, c_ab long"
    )
    return scored.withColumn(
        "ncd_ppm",
        F.expr("(c_ab - least(c_a, c_b)) * 1000000L div greatest(c_a, c_b)"),
    )
