"""Local mirror of the driver's DuckDB-oracle correctness gate.

For every query with an oracle twin: run the Spark DataFrame and the DuckDB
SQL over the same parquet fixture dir, sort columns by name, canonicalize
values, and require the exact same multiset of rows.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round was already applied in the queries; normalize -0.0 and
        # float formatting only
        if v == 0:
            v = 0.0
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(r[c]) for c in cols)
        for r in df[cols].to_dict("records")
    ]
    return sorted(rows)


def _pairs():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from interop_spark.queries import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, sf_dir, name, qfn, sql):
    sdf = qfn(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    ddf = con.execute(sql).df()
    con.close()

    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} "
        f"duckdb={sorted(ddf.columns)}"
    )
    s_rows, d_rows = _canon(sdf), _canon(ddf)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_all_queries_have_oracle_or_are_whitelisted():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from interop_spark.queries import all_oracles, all_queries

    missing = set(all_queries()) - set(all_oracles())
    # names here intentionally rely on the driver's rows-only check
    allowed_rows_only = {n for n in missing if n.startswith("ro_")}
    assert missing == allowed_rows_only, (
        f"queries without oracle twin: {sorted(missing - allowed_rows_only)}"
    )
