"""Pin the driver check-window contract: the first 50 registry entries
are exactly `_WINDOW` (the driver's correctness gate covers them), every
window name resolves, and every registry query has an oracle twin."""

from __future__ import annotations


def test_window_is_exactly_50_unique_known_names():
    from interop_spark.queries import _WINDOW, all_oracles, all_queries

    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50
    q = all_queries()
    o = all_oracles()
    assert list(q)[:50] == list(_WINDOW)
    assert set(o) == set(q)


def test_entry_module_contract():
    import __spark_entry__ as em

    q = em.queries()
    o = em.oracle_sql()
    assert set(o) == set(q)
    assert callable(next(iter(q.values())))
