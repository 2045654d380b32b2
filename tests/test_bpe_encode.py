"""True-BPE merge loop: pin the one-at-a-time leftmost fusion against a
fuse-all-occurrences reference (the paper's step), against hand-computed
encodings, and against the DuckDB recursive-CTE twin on real vocabulary."""

from __future__ import annotations

import pytest

from interop_spark.operators.text import (
    DEFAULT_BPE_MERGES,
    bpe_pieces_udf,
    bpe_word_pieces,
)


def _bpe_reference_fuse_all(word, merges):
    """Sennrich 2016 reference step: find the min-rank pair present,
    fuse ALL its occurrences left-to-right (non-overlapping), repeat."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    pieces = list(word)
    while len(pieces) > 1:
        present = {
            ranks[(a, b)]
            for a, b in zip(pieces, pieces[1:])
            if (a, b) in ranks
        }
        if not present:
            break
        a, b = merges[min(present)]
        out, i = [], 0
        while i < len(pieces):
            if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(pieces[i])
                i += 1
        pieces = out
    return pieces


def test_bpe_known_encodings():
    assert bpe_word_pieces("the") == ["the"]
    assert bpe_word_pieces("then") == ["the", "n"]  # (t,h),(th,e) beat (e,n)
    assert bpe_word_pieces("and") == ["and"]
    assert bpe_word_pieces("xyz") == ["x", "y", "z"]  # no merge applies
    assert bpe_word_pieces("") == []
    assert bpe_word_pieces("a") == ["a"]
    # uppercase never matches the lowercase toy table
    assert bpe_word_pieces("THE") == ["T", "H", "E"]


def test_bpe_rank_order_not_length_order():
    # "in" (rank 2) fuses before "it" (rank 14) in "init":
    # i n i t -> in i t -> in it
    assert bpe_word_pieces("init") == ["in", "it"]


def test_bpe_matches_fuse_all_reference_on_fixture_vocab():
    import duckdb

    con = duckdb.connect()
    words = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+'))"
            " FROM '/root/testdata/sf0.01/documents.parquet'"
        ).fetchall()
    ]
    con.close()
    assert len(words) > 20
    adversarial = [
        "ananan", "ththe", "thethethe", "attat", "alall", "ononon",
        "restate", "interesting", "condescending", "thereof",
    ]
    for w in words + adversarial:
        assert bpe_word_pieces(w) == _bpe_reference_fuse_all(
            w, DEFAULT_BPE_MERGES
        ), w


def test_bpe_pieces_concat_invariant():
    for w in ("understanding", "constant", "theoretical", "a1b2", "église"):
        assert "".join(bpe_word_pieces(w)) == w


def test_bpe_udf_matches_pure_python(spark):
    words = ["the", "understanding", "xyz", "init", "allocate", ""]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.p
        for r in df.select("w", bpe_pieces_udf()(df.w).alias("p")).collect()
    }
    for w in words:
        assert got[w] == " ".join(bpe_word_pieces(w)), w


def test_bpe_merge_table_is_consistent():
    """Every merge's parts must be base characters or products of
    earlier merges — the precondition for the fuse-one ≡ fuse-all
    equivalence the docstring claims."""
    known = set()
    for a, b in DEFAULT_BPE_MERGES:
        for part in (a, b):
            assert len(part) == 1 or part in known, (a, b, part)
        known.add(a + b)


def test_bpe_train_merges_classic_example(spark):
    """The Sennrich §3.2 walkthrough word, hand-traced under this
    trainer's fixed tie order (count desc, then (a, b) asc):
    aa(4) -> ab(2; beats (aa,a) on the tie) -> aa+ab(2) -> ac(1).
    Also pins greedy overlap handling: 'aaa' merges to [aa, a],
    never [a, aa] or [aa, aa]."""
    from interop_spark.operators.text import bpe_train_merges

    wf = spark.createDataFrame([("aaabdaaabac", 1)], "w string, c long")
    got = sorted(
        (r.merge_round, r.a, r.b, r.merged, r.pair_count)
        for r in bpe_train_merges(wf, 4).collect()
    )
    assert got == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 2),
        (3, "aa", "ab", "aaab", 2),
        (4, "a", "c", "ac", 1),
    ]


def test_bpe_train_merges_degenerate_inputs(spark):
    """A corpus of only single-character words has no adjacent pair even
    in round 1: the trainer returns the EMPTY merge frame (matching the
    oracle CTE chain's zero rows) instead of raising, and rounds < 1 is
    rejected up front (ADVICE r13)."""
    import pytest as _pytest

    from interop_spark.operators.text import bpe_train_merges

    wf = spark.createDataFrame([("a", 3), ("b", 2)], "w string, c long")
    out = bpe_train_merges(wf, 4)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "merge_round", "a", "b", "merged", "pair_count",
    ]
    with _pytest.raises(ValueError, match="rounds"):
        bpe_train_merges(wf, 0)


def test_bpe_train_encode_composition(spark):
    """Train→encode composition: merges learned from the corpus drive
    the encoder (not the fixed toy vocab). On the Sennrich walkthrough
    word the learned table is aa/ab/aaab/ac, so 'aaabdaaabac' encodes
    to [aaab, d, aaab, ac] — 4 pieces the DEFAULT table could never
    produce (it has no 'a'+'a' merge)."""
    from interop_spark.operators.text import (
        bpe_pieces_udf,
        bpe_train_merges,
        bpe_word_pieces,
    )
    from pyspark.sql import functions as F

    wf = spark.createDataFrame([("aaabdaaabac", 1)], "w string, c long")
    merges = [
        (r.a, r.b)
        for r in bpe_train_merges(wf, 4).orderBy("merge_round").collect()
    ]
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab"), ("a", "c")]
    # the local reference encoder and the Arrow UDF agree on the
    # learned table
    assert bpe_word_pieces("aaabdaaabac", merges) == [
        "aaab", "d", "aaab", "ac",
    ]
    (row,) = (
        spark.createDataFrame([("aaabdaaabac",)], "w string")
        .select(bpe_pieces_udf(merges)(F.col("w")).alias("p"))
        .collect()
    )
    assert row.p == "aaab d aaab ac"
    # and the default table gives a different segmentation
    assert bpe_word_pieces("aaabdaaabac") != ["aaab", "d", "aaab", "ac"]
