"""Fuzzy (edit-distance) join with symmetric-delete blocking — the
entity-resolution primitive (dirty ids, OCR'd names, typo'd URLs) at
datalake scale.

The naive fuzzy join is a cartesian product with a levenshtein filter —
O(|L|·|R|) and dead at any scale.  The symmetric-delete scheme (the
SymSpell blocking idea, public domain) makes it an EQUI-join with
EXACT recall for ``lev(a, b) ≤ d``:

    every pair within edit distance d shares at least one common
    string among the variants obtained by deleting up to d characters
    from each side

(substitution = delete the differing position on both sides; insertion
/ deletion = delete the extra character on the longer side).  So each
side explodes into its ≤d-deletion variants (C(len, ≤d)+1 strings — a
bounded, data-independent factor), candidates meet in one hash join on
the variant, and the exact ``levenshtein(…, threshold=d)`` predicate
verifies survivors.  No pair outside the blocks is lost — unlike
phonetic/prefix blocking, this is recall-exact by construction.

Scale shape: one explode (×~len for d=1) + one shuffle on the variant
key + a verify filter.  Skew bound: a variant's bucket holds only
strings within distance d of each other's neighborhood — for id-like
vocabularies this is the digit-neighbor count, not a hot-key hazard;
for natural-language tokens cap the bucket like the n-gram DF cap
(``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column | str, max_deletions: int = 1) -> Column:
    """All distinct strings obtainable from ``col`` by deleting up to
    ``max_deletions`` characters (the string itself included) — the
    symmetric-delete candidate key set, as an ``array<string>``.

    Pure codegen'd higher-order functions: ``transform(sequence(...))``
    builds the single-deletion set; ``max_deletions=2`` nests it once
    and flattens.  Lengths are data-bounded, so the explode factor is
    len (d=1) or ~len²/2 (d=2) — size the join accordingly.
    """
    if max_deletions not in (1, 2):
        raise ValueError("max_deletions must be 1 or 2")
    s = F.col(col) if isinstance(col, str) else col

    def one_del(x: Column) -> Column:
        # delete position i (1-based): prefix [1, i-1] + suffix [i+1, …]
        return F.transform(
            F.sequence(F.lit(1), F.length(x)),
            lambda i: F.concat(
                F.substring(x, F.lit(1), i - 1),
                x.substr(i + 1, F.length(x)),
            ),
        )

    variants = F.array_union(F.array(s), one_del(s))
    if max_deletions == 2:
        variants = F.array_union(
            variants, F.array_distinct(F.flatten(F.transform(one_del(s), one_del)))
        )
    return variants


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose ``left_col``/``right_col`` strings are within
    ``max_distance`` Levenshtein edits, via symmetric-delete blocking
    (exact recall — see module docstring) and a thresholded
    ``levenshtein`` verify.

    Output: all columns of both inputs plus ``edit_distance``.  Columns
    must not collide (alias beforehand).  ``how`` is ``inner`` only —
    outer fuzzy semantics (best-match-or-null) belong to a ranking
    layer on top of this candidate generator.

    Contract: each side's ROWS must be distinct (include an id
    column).  A pair matching through several common variants is
    deduplicated with ``distinct()`` over the joined row, which cannot
    tell "same pair via two variants" apart from "two identical input
    rows" — with fully duplicate rows the join multiplicity of the
    naive levenshtein join would be lost.
    """
    if how != "inner":
        raise ValueError("fuzzy_join supports inner joins only")
    # array_distinct: strings with repeated characters produce the same
    # deletion variant several times ("aa" → "a" twice) — exploding the
    # distinct set avoids guaranteed-duplicate candidates
    lv = left.withColumn(
        "__lvar",
        F.explode(F.array_distinct(deletion_variants(left_col, max_distance))),
    )
    rv = right.withColumn(
        "__rvar",
        F.explode(F.array_distinct(deletion_variants(right_col, max_distance))),
    )
    cand = (
        lv.join(rv, lv["__lvar"] == rv["__rvar"])
        .drop("__lvar", "__rvar")
        .distinct()
    )
    dist = F.levenshtein(F.col(left_col), F.col(right_col), max_distance)
    return cand.withColumn("edit_distance", dist).filter(
        F.col("edit_distance") >= 0  # thresholded levenshtein: -1 = over
    )
