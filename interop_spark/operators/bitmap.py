"""Bitmap-rollup exact distinct counting.

The warehouse pattern for EXACT COUNT(DISTINCT entity) at scale when
the entity id is a dense non-negative integer (the dictionary-encoded
surrogate key a 100 TB warehouse assigns anyway): pack ids into 64-bit
words (word = shiftright(id, 6), bit = pmod(id, 64)), OR-fold the words per
(group, word) — `bit_or` is associative/commutative, so the partial
aggregate collapses each map task's billions of events to at most
|groups| x |id_space|/64 rows BEFORE the exchange — then popcount-sum
per group.

Why it beats COUNT(DISTINCT) at scale: the plain form shuffles the
distinct (group, id) PAIRS (cardinality = sum of per-group distincts);
the bitmap form's shuffle is bounded by the id-space geometry alone
and is INDEPENDENT of event count. And the word frame re-merges with
another bit_or — giving roll-ups across groups (or across streaming
batches: see ``stream_bitmap_distinct``) without touching raw ids
again, which COUNT(DISTINCT) results can never do.

This is the plain-long core of the roaring-bitmap idea; sparse id
spaces would add a compressed container per word range, which the
dense TPC-H-style surrogate keys here don't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


WORD_COL = "_bm_word"  # internal word-index column (collision-guarded)


def bitmap_words(df: DataFrame, group_cols: list[str], id_col: str) -> DataFrame:
    """(group, word_index, bits) frame: bit i of ``bits`` set iff id
    64*word_index + i appears in the group. Any integer id is counted
    correctly — word = shiftright(id, 6) is the arithmetic shift
    (= floor division, so negative ids land in negative word indexes)
    and bit = pmod(id, 64) is the non-negative remainder, so the
    (word, bit) mapping stays injective over the full BIGINT range
    instead of wrapping negative ids onto word 0 (ADVICE r17 #1;
    Spark's ``div``/``%`` truncate toward zero). Dense non-negative
    ids keep the frame small; sparse or signed ids still count
    exactly, just with more words."""
    if WORD_COL in df.columns:
        raise ValueError(
            f"bitmap_words: input already has a {WORD_COL!r} column"
        )
    if "bits" in group_cols:
        # a 'bits' group column would survive the groupBy alongside the
        # bit_or alias, leaving two 'bits' columns and ambiguous
        # downstream bit_or/bit_count references (ADVICE r18 #3 — the
        # WORD_COL guard's twin; a 'bits' column NOT in group_cols is
        # dropped by the aggregation and is harmless)
        raise ValueError(
            "bitmap_words: 'bits' is the reserved output column and"
            " cannot be a group column"
        )
    word = F.expr(
        f"shiftright(CAST({id_col} AS BIGINT), 6)"
    ).alias(WORD_COL)
    # expr, not F.shiftleft: the python wrapper only takes a literal
    # shift count, while SQL shiftleft accepts a per-row column
    bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({id_col}, 64) AS INT))"
    )
    return (
        df.groupBy(*group_cols, word)
        .agg(F.bit_or(bit).alias("bits"))
    )


def popcount(words: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exact distinct count per group from a word frame. The sum is
    coalesced to 0 so a GLOBAL rollup (``group_cols=[]``) over an
    empty word frame reports 0 — matching what COUNT(DISTINCT) SQL
    returns for the degenerate input (ADVICE r17 #2), instead of
    Spark's sum(NULL) over the always-emitted global-agg row."""
    return words.groupBy(*group_cols).agg(
        F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
        .cast("long")
        .alias("n_distinct")
    )


def merge_words(words: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-merge word frames to a coarser grouping (or across streaming
    batches): bit_or is exactly mergeable, so this is lossless."""
    return words.groupBy(*group_cols, WORD_COL).agg(
        F.bit_or("bits").alias("bits")
    )
