"""Property tests: blocked_pairs and the bitmap fold vs independent
python references (the asof/range/funnel property-test pattern —
`786800a` / `cd1bf72`): hypothesis generates the frame, pure python
computes the truth, the Spark operator must agree exactly.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from interop_spark.operators.bitmap import bitmap_words, merge_words, popcount
from interop_spark.operators.linkage import blocked_pairs

# (id is made unique by index; block keys collide on purpose)
ROWS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3)),  # (block, payload)
    min_size=1,
    max_size=24,
)


@settings(max_examples=10, deadline=None)
@given(rows=ROWS, cap=st.integers(1, 8))
def test_blocked_pairs_matches_bruteforce(spark, rows, cap):
    """blocked_pairs == {unordered same-block pairs with the block under
    the size cap}, computed by brute force in python."""
    data = [(i, f"b{blk}", pay) for i, (blk, pay) in enumerate(rows)]
    df = spark.createDataFrame(data, ["id", "blk", "payload"])
    got = {
        (r.blk, r.id_a, r.id_b)
        for r in blocked_pairs(df, ["blk"], "id", max_block_size=cap)
        .collect()
    }
    from collections import Counter

    sizes = Counter(blk for _, blk, _ in data)
    want = {
        (blk_a, i, j)
        for i, blk_a, _ in data
        for j, blk_b, _ in data
        if i < j and blk_a == blk_b and sizes[blk_a] <= cap
    }
    assert got == want


# NEGATIVE ids included (ADVICE r17 #1): shiftright/pmod keep the
# (word, bit) mapping injective over the full signed range, where the
# old div/% pair wrapped negatives onto word 0 and silently collided
IDS = st.lists(st.integers(-300, 300), min_size=1, max_size=60)


@settings(max_examples=10, deadline=None)
@given(ids=IDS)
def test_bitmap_popcount_matches_set_distinct(spark, ids):
    """Bitmap OR-fold popcount == len(set(ids)) for arbitrary
    (duplicated, sparse, word-straddling, SIGNED) id multisets;
    re-merging the word frame with itself changes nothing
    (idempotence)."""
    df = spark.createDataFrame([("g", i) for i in ids], ["g", "uid"])
    words = bitmap_words(df, ["g"], "uid")
    n = popcount(words, ["g"]).collect()[0].n_distinct
    assert n == len(set(ids))
    doubled = merge_words(words.unionByName(words), ["g"])
    assert popcount(doubled, ["g"]).collect()[0].n_distinct == n


def test_bitmap_negative_ids_do_not_collide(spark):
    """Regression (ADVICE r17 #1): -1 and any id in word 0 used to
    collide (truncating % mapped -1 to bit -1 -> shift wrap). The
    floor/pmod mapping must count {-1, 0, 63, -64, -65} as 5."""
    ids = [-1, 0, 63, -64, -65, -1, 63]
    df = spark.createDataFrame([("g", i) for i in ids], ["g", "uid"])
    n = popcount(bitmap_words(df, ["g"], "uid"), ["g"]).collect()
    assert n[0].n_distinct == len(set(ids)) == 5


def test_bitmap_empty_global_rollup_is_zero(spark):
    """Regression (ADVICE r17 #2): a GLOBAL popcount over an empty
    word frame must report 0 (what COUNT(DISTINCT) SQL returns), not
    the sum(NULL) of Spark's always-emitted global-agg row."""
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("uid", T.LongType())])
    )
    rows = popcount(merge_words(bitmap_words(empty, [], "uid"), []), []).collect()
    assert len(rows) == 1 and rows[0].n_distinct == 0


def test_bitmap_word_col_collision_raises(spark):
    """Regression (ADVICE r17 #3): an input already carrying the
    internal word column name must fail loudly, not silently
    self-join ambiguously."""
    import pytest

    from interop_spark.operators.bitmap import WORD_COL

    df = spark.createDataFrame([(1, 2)], ["uid", WORD_COL])
    with pytest.raises(ValueError, match=WORD_COL):
        bitmap_words(df, [WORD_COL], "uid")


def test_bitmap_bits_group_col_raises(spark):
    """Regression (ADVICE r18 #3): 'bits' as a GROUP column would
    survive the groupBy beside the bit_or alias — two 'bits' columns,
    ambiguous downstream popcount/merge references — so it must fail
    loudly. A 'bits' column NOT in group_cols is dropped by the
    aggregation and stays legal."""
    import pytest

    df = spark.createDataFrame([(1, 2)], ["uid", "bits"])
    with pytest.raises(ValueError, match="bits"):
        bitmap_words(df, ["bits"], "uid")
    # non-grouped 'bits' input column: allowed, output has exactly one
    out = bitmap_words(df, [], "uid")
    assert out.columns.count("bits") == 1


EDGES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(edges=EDGES)
def test_triangle_count_matches_bruteforce(spark, edges):
    """Degree-oriented triangle_count == the O(n³) python reference on
    arbitrary small multigraphs (dups, self-loops, both directions)."""
    from itertools import combinations

    from interop_spark.operators.graph import triangle_count

    df = spark.createDataFrame(
        edges or [(0, 0)], ["src", "dst"]
    )  # empty frames need a schema; (0,0) is a self-loop and drops
    r = triangle_count(df).collect()[0]
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    tri = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    assert r.n_nodes == len(nodes)
    assert r.n_edges == len(und)
    assert r.n_triangles == tri


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=20,
    )
)
def test_z_value_matches_python_morton(spark, pts):
    """operators/zorder.z_value == the python bit-interleave reference
    over arbitrary 16-bit points."""
    from pyspark.sql import functions as F

    from interop_spark.operators.zorder import z_value

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["i", "x", "y"]
    )
    got = {
        r.i: r.z
        for r in df.select(
            "i", z_value(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert got == {i: morton(x, y) for i, (x, y) in enumerate(pts)}


ORDERS = st.lists(
    st.tuples(
        st.integers(0, 3),            # custkey
        st.integers(0, 5),            # day (eff_date)
        st.sampled_from("OFP"),       # status
        st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),  # priority
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(rows=ORDERS)
def test_scd2_core_matches_bruteforce(spark, rows):
    """scd2_core == a pure-python gap-and-island reference: same runs,
    same validity chaining, same versions, for arbitrary (key, date,
    attrs) multisets (okey = index keeps the order total)."""
    from collections import defaultdict

    from interop_spark.queries.analytics_q import scd2_core

    data = [
        (ck, f"2024-01-{d + 1:02d}", i, s, p)
        for i, (ck, d, s, p) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, ["custkey", "eff_date", "okey", "status", "priority"]
    )
    got = {
        (r.custkey, r.version): (
            r.status, r.priority, r.valid_from, r.valid_to,
            r.is_current, r.n_orders,
        )
        for r in scd2_core(df).collect()
    }
    by_key = defaultdict(list)
    for ck, ed, i, s, p in data:
        by_key[ck].append((ed, i, s, p))
    want = {}
    for ck, evs in by_key.items():
        evs.sort()
        runs = []
        for ed, _i, s, p in evs:
            if runs and runs[-1][0] == (s, p):
                runs[-1][1].append(ed)
            else:
                runs.append([(s, p), [ed]])
        for v, ((s, p), dates) in enumerate(runs, start=1):
            nxt = runs[v][1][0] if v < len(runs) else None
            want[(ck, v)] = (
                s, p, dates[0], nxt, v == len(runs), len(dates)
            )
    assert got == want


BATCH = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 3)),  # (block, tag)
    min_size=0,
    max_size=15,
)
REG = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 3)),
    min_size=0,
    max_size=15,
)


@settings(max_examples=10, deadline=None)
@given(batch=BATCH, reg=REG)
def test_incremental_pairs_matches_bruteforce(spark, batch, reg):
    """incremental_pairs == the full (batch x registry) co-block cross
    product, computed by brute force in python."""
    from interop_spark.operators.linkage import incremental_pairs

    bdata = [(blk, 1000 + i, f"b{tag}") for i, (blk, tag) in enumerate(batch)]
    rdata = [(blk, i, f"r{tag}") for i, (blk, tag) in enumerate(reg)]
    cols_b = ["block_key", "rec_id", "payload"]
    cols_r = ["block_key", "entity_id", "payload"]
    if not bdata or not rdata:
        return  # createDataFrame needs rows to infer types; vacuous case
    bdf = spark.createDataFrame(bdata, cols_b)
    rdf = spark.createDataFrame(rdata, cols_r)
    got = {
        (r.block_key, r.rec_id_new, r.entity_id_reg)
        for r in incremental_pairs(bdf, rdf, "block_key").collect()
    }
    want = {
        (bb, rid, eid)
        for bb, rid, _ in bdata
        for rb, eid, _ in rdata
        if bb == rb
    }
    assert got == want


PAIRS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-40, 40)),  # (type, user)
    min_size=1,
    max_size=50,
)


@settings(max_examples=10, deadline=None)
@given(pairs=PAIRS)
def test_jaccard_readout_matches_python_sets(spark, pairs):
    """_jaccard_readout over bitmap word frames == python set algebra
    (intersection, inclusion-exclusion union, floor ppm) for arbitrary
    signed-id (type, user) multisets."""
    from collections import defaultdict

    from interop_spark.queries.analytics_q import _jaccard_readout

    df = spark.createDataFrame(
        [(f"t{t}", u) for t, u in pairs], ["event_type", "user_id"]
    )
    words = bitmap_words(df, ["event_type"], "user_id")
    got = {
        (r.type_a, r.type_b): (r.n_inter, r.n_union, r.jaccard_ppm)
        for r in _jaccard_readout(words).collect()
    }
    sets = defaultdict(set)
    for t, u in pairs:
        sets[f"t{t}"].add(u)
    types = sorted(sets)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            want[(a, b)] = (inter, union, inter * 1_000_000 // union)
    assert got == want
