"""Text-analysis column helpers for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) — language ID, quality
scoring, token counting, fingerprinting run at full scan speed with no
Python in the hot path. These extend the engine beyond the reference's
surface (the reference has no text processing) per the large-scale
training-data-pipeline requirement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language
#: heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "a"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "los", "de", "que", "es", "un", "una"],
}


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, strip — canonical form for dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(col))


# GPT-2-style pre-tokenizer classes, simplified to the lookahead-free
# subset shared by Java regex (Spark) and RE2 (DuckDB): contractions,
# space-prefixed letter runs, digit runs, punctuation runs, residual
# whitespace. A real BPE pass only ever SPLITS these pieces further, so
# this count is the standard cheap lower bound used for corpus budgeting.
# Whitespace is the EXPLICIT class [ \t\n\f\r], not \s — Java's \s
# includes \x0B (vertical tab) while RE2's does not, and a shorthand
# divergence would silently shift counts between engines.
_WS = " \\t\\n\\f\\r"
BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    rf"| ?[A-Za-z]+| ?[0-9]+| ?[^{_WS}A-Za-z0-9]+|[{_WS}]+"
)


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2 pre-tokenizer classes
    (word pieces, digit runs, punctuation runs; trailing whitespace runs
    excluded) — the budgeting twin of :func:`token_count` for LLM
    training data, pure JVM regex, no vocabulary needed."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))
    return F.size(F.filter(pieces, lambda p: p.rlike(f"[^{_WS}]")))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined), for MinHash/Jaccard.

    Implementation note (hot path at corpus scale): higher-order
    functions are interpreted, and a lambda that references an outer
    expression re-evaluates it PER ELEMENT — the naive
    ``transform(sequence(...), i -> slice(toks, i, n))`` retokenizes the
    document once per shingle (quadratic). Here the lambda touches only
    its own argument: ``arrays_zip`` of ``n`` shifted slices is built
    once per row, then each zipped struct is joined — tokenization cost
    is O(n) per row, not O(tokens).
    """
    toks = tokenize(col)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, F.size(toks) - n + 1) for i in range(n)]
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
        )
    )


def char_ngrams(col: Column | str, n: int = 4) -> Column:
    """Array of character n-grams of the normalized text.

    Same HOF discipline as :func:`word_shingles`: the lambda must not
    reference the normalized-text expression (interpreted HOFs
    re-evaluate captured outer expressions per element — O(len²) per
    row); ``arrays_zip`` of shifted character slices keeps normalization
    at O(n) evaluations per row."""
    c = normalize_text(col)
    chars = F.split(c, "")
    zipped = F.arrays_zip(
        *[F.slice(chars, i + 1, F.length(c) - n + 1) for i in range(n)]
    )
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(
        F.transform(zipped, lambda s: F.concat(*[s[str(i)] for i in range(n)]))
    )


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """Count of stopword occurrences (word-boundary regex, case-insensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(1)))


def text_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def tf_idf_topk(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    broadcast_vocab: bool = False,
):
    """Top-``top_k`` TF-IDF terms per document.

    tfidf = tf · (ln((N+1)/(df+1)) + 1) — smoothed idf, so terms present
    in every document still score > 0. Returns
    ``(id_col, term, tf, tfidf)``, ``top_k`` rows per document.

    Determinism across engines: ranking uses the ROUNDED score (6
    decimals) with the term string as tiebreak — a last-ULP difference
    in two engines' ``ln`` can perturb the 16th digit but not the
    rounded key, so the selected top-k set is oracle-exact.

    Scale design: one explode + two key-partial aggregations (doc-term
    counts, then vocabulary document frequencies — both combine
    map-side); the corpus size joins in as a broadcast 1-row aggregate;
    the vocabulary join shuffles on term unless ``broadcast_vocab``
    (set it when the vocabulary fits in memory — stopword-heavy hot
    terms then never shuffle, removing the one skewable key).
    """
    from pyspark.sql import Window

    toks = docs.select(id_col, F.explode(tokenize(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    vocab = tf.groupBy("term").agg(F.count("*").alias("df"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = tf.join(vocab, "term").crossJoin(F.broadcast(n))
    tfidf = F.round(
        F.col("tf")
        * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + 1),
        6,
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("tfidf", tfidf)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(id_col, "term", "tf", "tfidf")
    )


def text_entropy(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "token",
):
    """Per-document Shannon entropy of the token (or character)
    distribution, in bits — the information-density quality signal:
    near-zero entropy means a degenerate repeated-symbol document,
    unusually high char-entropy flags binary junk in a text corpus.

    Returns ``(id_col, n_units, n_distinct, entropy)`` with ``entropy =
    −Σ (c/n)·log2(c/n)`` rounded at 6 (cross-engine log ULP drift is
    ~1e-16 relative and cannot move a 6-decimal rounding).

    Scale: one explode + groupBy(doc, unit) with map-side combine +
    groupBy(doc) — the exact shape of every other per-doc distribution
    op here; for ``unit="char"`` the exploded row count is the corpus
    character count, which is why the aggregation combines map-side
    before any exchange.
    """
    if unit == "token":
        units = F.explode(tokenize(text_col)).alias("__u")
    elif unit == "char":
        units = F.explode(F.split(F.col(text_col), "")).alias("__u")
    else:
        raise ValueError(f"unit must be 'token' or 'char', got {unit!r}")
    counts = (
        docs.select(id_col, units)
        .filter(F.col("__u") != "")
        .groupBy(id_col, "__u")
        .agg(F.count("*").alias("__c"))
    )
    n = F.sum("__c")
    return counts.groupBy(id_col).agg(
        n.cast("bigint").alias("n_units"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.round(
            F.log2(n) - F.sum(F.col("__c") * F.log2("__c")) / n, 6
        ).alias("entropy"),
    )


def compression_ratio(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
):
    """Per-document zlib compression ratio — the Gopher-style
    "compressibility" quality signal: highly compressible text is
    repetitive boilerplate; incompressible "text" is often binary junk
    or ciphertext. Returns ``(id_col, n_bytes, n_compressed, ratio)``
    with ``ratio = n_compressed / n_bytes`` rounded at 6 (empty
    documents are skipped — the ratio is undefined).

    A justified Python stage: DEFLATE is a codec, not a Column
    expression. Runs as a narrow Arrow ``mapInPandas`` (no shuffle, no
    state; batch memory bounded by maxPartitionBytes) with a fixed
    compression level, so output is deterministic for a given zlib.
    """

    def compress(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [t.encode("utf-8") for t in pdf[text_col].fillna("")]
            n_bytes = [len(b) for b in raw]
            n_comp = [len(zlib.compress(b, level)) for b in raw]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                }
            )
            out = out[out["n_bytes"] > 0]
            out["ratio"] = (out["n_compressed"] / out["n_bytes"]).round(6)
            yield out

    id_type = dict(docs.dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        compress,
        schema=f"{id_col} {id_type}, n_bytes bigint, n_compressed bigint, ratio double",
    )


def bm25_topk(
    docs,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-``top_k`` documents for a keyword query under BM25
    (Robertson-Sparck-Jones idf, Okapi tf saturation).

    ``score(d) = Σ_t ln(1 + (N−df_t+0.5)/(df_t+0.5)) ·
    tf_td·(k1+1) / (tf_td + k1·(1−b+b·|d|/avgdl))`` — the ``ln(1+·)``
    form keeps idf positive for terms in over half the corpus.

    Determinism across engines: the score is rounded at 6 and ranked
    with ``id_col`` as tiebreak (same discipline as
    :func:`tf_idf_topk` — ``ln`` ULP drift can't flip the rounded
    key), and the per-document term sum is an aggregation over ≤
    |query| exact-rational addends whose float images are identical in
    both engines, summed via ``sum()``; with ≤ a handful of query
    terms the 6-decimal round absorbs association drift.

    Scale design: the query is a broadcast literal — the corpus scan
    explodes tokens, counts tf for QUERY TERMS ONLY (the filter lands
    before the shuffle, so the aggregation state is |docs|·|query|,
    not |docs|·|vocab|), df and avgdl are two scalar/tiny aggregates
    broadcast back, and top-k compiles to TakeOrderedAndProject — no
    global sort ever materializes.  Returns ``(id_col, n_hit_terms,
    score)``.
    """
    terms = F.array(*[F.lit(t) for t in query_terms])
    toks = docs.select(
        id_col,
        F.size(tokenize(text_col)).alias("dl"),
        F.explode(tokenize(text_col)).alias("term"),
    ).filter(F.array_contains(terms, F.col("term")))
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokenize(text_col))).alias("total_dl"),
    )
    scored = tf.join(F.broadcast(df_), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_hit_terms"),
        F.round(F.sum(idf * tf_part), 6).alias("score"),
    )
    return per_doc.orderBy(
        F.desc("score"), F.asc(id_col)
    ).limit(top_k)


def feature_hash_score(
    col: Column | str,
    n_buckets: int = 2001,
    salt: str = "fh",
) -> Column:
    """Hashing-trick linear score of a text column: each whitespace
    token hashes to an integer weight in [-(n_buckets-1)/2,
    +(n_buckets-1)/2] via md5 (the feature-hashing kernel of
    Weinberger et al. 2009, with the weight TABLE itself replaced by a
    hash — the degenerate but deterministic "random projection" case
    used for smoke-scoring and lsh-style signatures).

    Pure JVM higher-order functions: transform(tokens, md5-weight) →
    aggregate(sum). Integer arithmetic end-to-end, so the score is
    engine-exact; external systems reproduce it from the md5 contract
    alone (same idiom as operators/split.hash_bucket). Real models
    swap the md5 weight for a lookup into a broadcast weight map —
    the plumbing (tokenize → hash → sum at scan stage, zero joins,
    zero shuffles) is identical.
    """
    half = (n_buckets - 1) // 2
    toks = tokenize(col)
    return F.aggregate(
        F.transform(
            toks,
            lambda t: (
                F.conv(
                    F.substring(F.md5(F.concat(t, F.lit(salt))), 1, 8), 16, 10
                ).cast("bigint")
                % n_buckets
            )
            - F.lit(half),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
