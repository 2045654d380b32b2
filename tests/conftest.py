from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session", autouse=True)
def _fixture_schema_guard():
    """Fail fast, with an explanation, when the driver regenerates the
    testdata with an encoding the loader doesn't know (the round-6
    events.ts drift cost a whole round) — one clear assertion beats 30
    identical mid-suite tracebacks."""
    import pyarrow.parquet as pq

    path = os.path.join(SF_DIR, "events.parquet")
    if os.path.exists(path):
        ts = pq.read_schema(path).field("ts").type
        known = ("timestamp[us]", "timestamp[ns]", "timestamp[ms]", "int64")
        assert str(ts) in known, (
            f"events.parquet ts encoding drifted to {ts}; teach "
            f"interop_spark.io.load's type-adaptive branch about it"
        )
    # the other drift-sensitive dtypes: embeddings' element type feeds
    # as_double casts (float/double both fine, anything else is not),
    # and the TPC-H date columns feed date arithmetic
    checks = {
        ("embeddings.parquet", "embedding"): (
            "list<element: float>",
            "list<item: float>",
            "list<element: double>",
            "list<item: double>",
        ),
        ("orders.parquet", "o_orderdate"): (
            "date32[day]",
            "timestamp[us]",
            "timestamp[ns]",
        ),
        ("lineitem.parquet", "l_shipdate"): (
            "date32[day]",
            "timestamp[us]",
            "timestamp[ns]",
        ),
    }
    for (fname, field), ok in checks.items():
        fpath = os.path.join(SF_DIR, fname)
        if os.path.exists(fpath):
            t = str(pq.read_schema(fpath).field(field).type)
            assert t in ok, (
                f"{fname} {field} encoding drifted to {t} (known: {ok}); "
                f"audit the queries reading it before trusting results"
            )
    # the embedding DIMENSION (64) is baked into every ANN/PQ/BSQ/MRL
    # constant and oracle; a regenerated fixture with another dim would
    # fail loudly under ANSI element_at but confusingly — assert it here
    epath = os.path.join(SF_DIR, "embeddings.parquet")
    if os.path.exists(epath):
        first = next(pq.ParquetFile(epath).iter_batches(batch_size=1))
        dim = len(first.column("embedding")[0])
        assert dim == 64, (
            f"embeddings dim drifted to {dim} (expected 64); update "
            f"EMB_DIM and every dim-dependent oracle before trusting "
            f"results"
        )


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from interop_spark.session import get_spark

    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="interop_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": str(wh),
            "javax.jdo.option.ConnectionURL":
                f"jdbc:derby:;databaseName={wh}/metastore_db;create=true",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
