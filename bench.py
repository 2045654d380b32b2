#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs once to warm (JVM/code-gen/file-listing costs a
long-lived cluster session would not pay per query), then
$SPARK_GRAFT_REPS (default 5) timed runs; the per-query MEDIAN is
reported — round-2 showed n<=2 lets single-run noise masquerade as
regressions (lsh_bucket_sizes +40% with zero code change on its path).
``value`` is the sum of medians.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# the queries a user of the reference would consider the workload's core:
# scan-agg, star join, dedupe flags, top-k, event windowing, plus the
# north-star pipeline ops (text, dedup, similarity)
HEADLINE = [
    "pricing_summary",
    "multiway_join_agg",
    "inner_equi_join",
    "left_outer_exists_flag",
    "merge_upsert",
    "rollup_agg",
    "topk_orders",
    "latest_event_per_user",
    "sessionize",
    "tumbling_window",
    "conditional_agg",
    "text_token_stats",
    "lang_id",
    "exact_dedup",
    "minhash_lsh_neardup",
    "simhash_neardup_pairs",
    "embedding_neardup",
    "knn_cosine",
    "ivf_probe_topk",
    "lsh_bucket_sizes",
    "fhir_ingest_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from interop_spark.session import get_spark

    spark = get_spark(
        app_name="interop_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_warm_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf else None,
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
