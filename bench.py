#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE minimal JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
(kept under the driver's ~2 KB stdout tail capture); per-query spread
and the scaling probes are written to BENCH_DETAIL.json in the repo
root, which is committed alongside the round artifacts.

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
    # round-9: the post-r5 operator families get headline timing guard
    # (r8 verdict item 2) — PQ-chain ANN, substring/paragraph dedup,
    # BM25 retrieval, BPE tokenization, and the composed cleaning
    # pipeline were previously invisible to regression tracking
    "ivfpq_search",
    "substring_dup_runs",
    "paragraph_dedup",
    "bm25_topk",
    "bpe_encode",
    "corpus_clean",
    # round-10: the composed pretraining-data accounting pipeline
    "pretrain_pipeline",
    # round-13: the new sketch/sampling/linalg operators get headline
    # timing guard from their first round
    "weighted_sample_topk",
    "hll_distinct_estimate",
    "pca_top_component",
    # round-14: the rank sketch, the trained-tokenizer composition, and
    # the bridge-fed era derivation
    "quantile_sketch_estimate",
    "bpe_train_encode",
    "fhir_omop_device_era",
    "domain_quantile_sketch",
    "fhir_omop_note",
    # round-15: the DoReMi loop, the ext-corpus CDM/promotion rows, and
    # the writer canonical row get timing guard from their first round
    "domain_reweight_converge",
    "fhir_omop_visit_detail",
    "fhir_request_group_actions",
    "fhir_writer_canonical_leaves",
    # round-15b: the theta/heavy-hitter/co-occurrence/int4 corpus
    # operators and the episode/fact_relationship/batch-13 CDM rows get
    # timing guard from their first round
    "theta_sketch_setops",
    "heavy_hitter_tokens",
    "cooccurrence_topk",
    "int4_roundtrip",
    "fhir_omop_episode",
    "fhir_omop_fact_relationship",
    "fhir_medication_knowledge_costs",
    "fhir_contract_terms",
    # round-16: new rows under the timing guard from their first round
    # (streaming rows stay out of HEADLINE per the standing convention)
    "mmr_rerank",
    "unicode_normalize_stats",
    "fhir_notebook_e2e",
    # round-16 third pass: the product-analytics rows
    "funnel_conversion",
    "cohort_retention",
    "salted_agg_skew",
    "mad_outliers",
    # round-16 fourth pass
    "rolling_7d_users",
    "event_transition_matrix",
    "zipf_fit_slope",
    "js_divergence_sources",
    # round-16 fifth pass
    "ndcg_bsq_eval",
    "gini_user_activity",
    "anomaly_days_zscore",
    # round-16 sixth pass (the write cost IS the operation being
    # measured: a physical-design row re-lays both tables per rep)
    "bucketed_join_agg",
    # round-17: the registered staged rows + the record-linkage family
    # get timing guard from their first round
    "topk_per_group",
    "percent_change_wow",
    "patient_record_linkage",
    "bitmap_distinct_users",
    # round-18: the seven registered staged rows + the two new rows
    # (streaming rows stay out of HEADLINE per the standing convention)
    "linkage_entities",
    "linkage_incremental",
    "scd2_history",
    "twap_per_user",
    "ab_test_zstat",
    "triangle_count",
    "zorder_layout",
    "rolling_7d_users_bitmap",
    "top_paths",
    # round-19: the four registered staged rows + the two new rows
    # (streaming rows stay out of HEADLINE per the standing convention)
    "event_type_jaccard",
    "cohort_retention_bitmap",
    "rfm_segments",
    "grouped_percentile_approx",
    "stratified_reservoir",
]

# Cross-round drift accounting (r14 verdict item 2), written into
# BENCH_DETAIL so the note travels with the numbers. The r15 re-bench
# started from a genuinely idle machine (1-min loadavg 0.25; the
# recorded loadavg_1m is sampled AFTER the headline loop, so it
# includes the bench's own 32-thread load — interpret the field as
# "machine state the run ENDED at", not ambient quiet).
DRIFT_NOTE = (
    "r16 root-cause of the two r15 watch items (both MEASURED, not "
    "re-baselined). (1) corpus_clean headline creep 2.29->2.62s: "
    "MECHANISM = it is the FIRST headline query, so its 5 timed reps "
    "absorb the whole JVM's JIT warm-up; a quiet 9-rep run descends "
    "3.1->2.2s with steady state 2.2-2.4s == r13's 2.29. Fix: one "
    "untimed JVM warm-up execution before the headline loop (below). "
    "(2) corpus_clean probe band 3.2-3.4 -> 3.5-4.5: MECHANISM = the "
    "10x leg's within-session spread (6.5-13.3s across 8 same-code "
    "samples; GC/checkpoint churn) makes a 2-sample min a noisy "
    "estimator; steady state ~6.5s/2.1s ~= 3.1x, IN band. Fix: 4 "
    "samples on corpus_clean's 10x leg (_PROBE_REPS). Accumulated-"
    "state hypothesis REJECTED by experiment: ratio after running the "
    "five r15b probes first = 3.75 vs 3.96 fresh. (3) simhash probe "
    "7.5x vs the 4.6x decomposition floor: the decomposition was "
    "rerun per-stage — the candidate JOIN adds ~1s on BOTH legs "
    "(guard working as designed); ~90% of the 10x leg is the md5 "
    "signature stage, which is linear in TOKEN BYTES, and the "
    "retokened fixture carries 14.9x the bytes at the '10x' leg "
    "(rN_-prefixed tokens inflate short tokens ~1.66x): measured "
    "signature-stage ratio 6.5x at 14.9x bytes = 0.44x per byte, "
    "decisively sublinear. The probe now publishes bytes_x1/bytes_x10/"
    "ratio_per_byte for both simhash probes so the band is read "
    "against byte volume, not replica count. Read the band as "
    "ratio_per_byte <= ~0.6 (quiet r16 runs measure ~0.5-0.6); the "
    "raw ratio_10x lands ~7-8 at this fixture's 14.9x bytes and is "
    "NOT the sublinearity signal. r17: fhir_ingest_corpus's band is "
    "likewise per-byte now — the artifact stamps fhir_corpus_bytes "
    "(the on-disk JSON volume at the stamped corpus_version); read "
    "the row as sec/MB across rounds (r12's 1.46s was recorded "
    "against the smaller v10 corpus; the v16 corpus carries ~2.5x "
    "the JSON per file, so the raw-seconds trend is fixture growth, "
    "not reader creep — flat sec/byte is the invariant). r17 host-"
    "variance measurement: two SAME-CODE headline captures in one "
    "session read 48.5s (loadavg_pre 0.91) and 57.1s (loadavg_pre "
    "0.07), a third full run 54.5s (loadavg_pre 0.90; the committed "
    "artifact — it carries the round's full 30-probe set incl. the "
    "linkage guard pair) — start loadavg does NOT predict run "
    "quality on this shared host; the quiet-wait gates the "
    "predictable kind of contention (a loud start), the residual "
    "10-20% spread is exogenous. Read cross-round totals against the committed "
    "capture's per-query `spread` (min/sd), and treat any UNIFORM "
    "all-query multiplier vs a prior round as environment, not "
    "engine (the r16 quiet capture's 36.1s total was recorded on a "
    "visibly faster machine-state; every r17/r16 per-query ratio is "
    "a near-constant multiple of it). r18: the uniform-multiplier "
    "argument is now MEASURED, not inferred — the artifact stamps "
    "calibration_sec (fixed in-memory hash+agg+sort, zero repo/"
    "fixture dependence): read cross-round per-query ratios against "
    "the calibration ratio first. fhir_notebook_e2e (the r17 2.23x "
    "watch item): fixture generation is pre-run untimed "
    "(fhir_fixture_gen_sec) and BENCH_DETAIL carries per-leg stamps "
    "(fhir_notebook_e2e_legs: fixture/ingest/sink/rejoin/writer) so "
    "the next drift names a leg."
)


def _scaled_documents(spark, sf_dir: str, mult: int):
    """documents × ``mult`` derived from the driver's own parquet (no
    sf1.0 fixture exists): each replica gets a distinct doc_id range and
    a per-replica text suffix so neither fingerprints nor signatures
    collapse across replicas."""
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    d = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # the sf0.1 parquet is ONE file → one input split → one task; without
    # an explicit repartition the whole probe runs single-core and the
    # replicated corpus concentrates in one partition (the round-4 OOM).
    # A 100 TB table has thousands of splits and never hits this; the
    # probe must model that, not the single-file degenerate case.
    par = spark.sparkContext.defaultParallelism
    if mult == 1:
        return d.repartition(par)
    reps = spark.range(mult).select(col("id").alias("rep"))
    return (
        d.crossJoin(reps)
        .select(
            (col("doc_id") * mult + col("rep")).alias("doc_id"),
            F.when(col("rep") == 0, col("text"))
            .otherwise(F.concat(col("text"), F.lit(" v"), col("rep")))
            .alias("text"),
        )
        .repartition(par)
    )


# (reps_at_1x, reps_at_10x) overrides; default (3, 2). See the r16
# drift note: corpus_clean's 10x leg needs 4 samples to reach steady
# state reliably.
_PROBE_REPS = {"corpus_clean": (3, 4)}


def _scaling_probes(spark, sf_dir: str) -> dict:
    """Scaling-curve evidence (round-3 verdict item 7): the dedup
    operators' claimed linear-in-corpus behavior, measured. Each probe
    runs the REAL operator over the full documents table at 1x and 10x
    volume; with plan/codegen cost fixed, the 10x time must come in well
    under 10x the 1x time at this scale."""
    import time as _time

    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from interop_spark.operators import dedup as dd

    def simhash_pairs(d):
        # the q_simhash_neardup_pairs operator body (shared function as
        # of r15), with the hot-band guard ON — the posture a 100 TB run
        # uses (the r14 verdict item-3 fix: the 7.5x@10x probe band was
        # dominated by hot-band candidate output, not signature work)
        return dd.simhash_candidate_pairs(
            d, "doc_id", "text", hamming_max=12, max_band_docs=64
        )

    def simhash_pairs_noguard(d):
        # no-guard CONTROL (r14 verdict item 3): measures the inherent
        # banded-Hamming candidate floor at this fixture shape, so the
        # guarded probe's ratio is attributable to the guard
        return dd.simhash_candidate_pairs(
            d, "doc_id", "text", hamming_max=12, max_band_docs=None
        )

    def _scaled_embeddings(mult: int):
        import os as _os

        e = spark.read.parquet(
            _os.path.join(sf_dir, "embeddings.parquet")
        ).select("vec_id", "embedding")
        par = spark.sparkContext.defaultParallelism
        if mult == 1:
            return e.repartition(par)
        reps = spark.range(mult).select(col("id").alias("rep"))
        return (
            e.crossJoin(reps)
            .select(
                (col("vec_id") * mult + col("rep")).alias("vec_id"),
                "embedding",
            )
            .repartition(par)
        )

    def ivf_assign_probe(d):
        # the ANN scale path's per-vector cost: broadcast one-row
        # centroid array + per-row argmax fold (no vector-side shuffle)
        from interop_spark.operators.similarity import ivf_assign

        cents = (
            spark.read.parquet(
                __import__("os").path.join(sf_dir, "embeddings.parquet")
            )
            .where(col("vec_id") < 8)
            .select(
                col("vec_id").alias("centroid_id"),
                col("embedding").alias("centroid"),
            )
        )
        return ivf_assign(d, cents)

    def lm_score_probe(d):
        from interop_spark.operators import lm

        ref = d.where(col("doc_id") % 10 == 0)
        uni, big, vocab = lm.bigram_lm_tables(ref, "text")
        return lm.score_nll(d, "doc_id", "text", uni, big, vocab)

    def corpus_clean_probe(d):
        # the composed cleaning pipeline's text stages (exact
        # fingerprint keep-list → minhash near-dup drop → survivor
        # anti-join) over the FULL scaled corpus — the keep-list flow
        # q_corpus_clean pins on its planted fixture, at throughput
        # scale. Stage 3 (semdedup) runs on embeddings, which don't
        # replicate with the text corpus; its per-vector cost is the
        # ivf_assign probe's.
        from interop_spark.operators import text as tx

        fp = d.select("doc_id", "text", tx.fingerprint(col("text")).alias("_fp"))
        reps = fp.groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
        keep1 = (
            fp.join(reps, ["_fp", "doc_id"]).select("doc_id", "text")
            .localCheckpoint()
        )
        # spread=True: keep1 exits the keep-list join with the join's
        # output partitioning (32 shuffle partitions sized by the JOIN,
        # not by the CPU-heavy shingle work that follows) — rebalancing
        # to defaultParallelism before signature hashing is the r9
        # verdict item-7 experiment and mirrors what the 100 TB run
        # does after any selective filter stage.
        pairs = dd.minhash_candidate_pairs(
            keep1, "doc_id", "text", spread=True
        ).where(col("jaccard_sim") >= 0.5)
        drop2 = pairs.select(col("doc_b").alias("doc_id")).distinct()
        return keep1.join(drop2, "doc_id", "left_anti")

    def _theta_probe(d):
        from interop_spark.operators import dedup as _dd
        from interop_spark.operators.theta import theta_items, theta_sketch

        sh = d.select(
            (col("doc_id") % 4).cast("string").alias("g"),
            F.explode(_dd.word_shingles(col("text"), 3)).alias("k"),
        )
        items = theta_items(sh, col("g"), col("k"))
        kept, _theta = theta_sketch(items, k=64)
        return kept

    def _hh_probe(d):
        from interop_spark.queries.corpus_ext import _cms_bucket
        from interop_spark.operators.text import tokens as _toks

        t = d.select(F.explode(_toks(col("text"))).alias("w")).where(
            col("w") != ""
        )
        rows = t.select(
            "w", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j")
        )
        sketch = (
            rows.withColumn("b", _cms_bucket(col("j"), col("w")))
            .groupBy("j", "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        probes_ = (
            t.distinct()
            .select(
                col("w").alias("token"),
                F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j"),
            )
            .withColumn("b", _cms_bucket(col("j"), col("token")))
        )
        return (
            probes_.join(F.broadcast(sketch), ["j", "b"], "left")
            .groupBy("token")
            .agg(F.min(F.coalesce(col("cnt"), F.lit(0))).alias("cms_est"))
        )

    def _cooc_probe(d):
        from interop_spark.operators.text import tokens as _toks

        dt = d.select(
            "doc_id",
            F.explode(F.array_distinct(_toks(col("text")))).alias("w"),
        ).where(col("w") != "")
        return (
            dt.alias("a")
            .join(
                dt.alias("b"),
                (col("a.doc_id") == col("b.doc_id"))
                & (col("a.w") < col("b.w")),
            )
            .groupBy(col("a.w").alias("w1"), col("b.w").alias("w2"))
            .agg(F.count(F.lit(1)).alias("pair_n"))
        )

    def _int4_probe(e):
        from interop_spark.operators.quantize import int4_decode, int4_encode

        return e.select(
            "vec_id",
            F.array_max(int4_decode(int4_encode(col("embedding")))).alias(
                "mx"
            ),
        )

    probes = {
        "exact_dedup": lambda d: dd.exact_dup_groups(d, "text", "doc_id"),
        "minhash_lsh_neardup": lambda d: dd.minhash_candidate_pairs(
            d, "doc_id", "text", spread=False  # input pre-repartitioned
        ),
        "simhash_neardup_pairs": simhash_pairs,
        "simhash_noguard": simhash_pairs_noguard,
        "ivf_assign": ivf_assign_probe,
        # the substring-dedup family's full window-hash → frequency
        # guard → candidate join → run-merge pipeline. NOTE: this probe
        # uses ROTATED replica text (not the shared-prefix suffix
        # variant) — a suffix leaves every prefix window identical
        # across replicas, which inflates candidate pairs QUADRATICALLY
        # in the replication factor and would measure the corpus's
        # duplication, not the operator's scaling.
        "substring_dup_runs": lambda d: dd.substring_dup_runs(d),
        # round-8: the LM-scoring shape (train bigram tables on the
        # reference slice, score the whole corpus through two keyed
        # LEFT joins + a per-doc aggregate). Replicated docs keep the
        # vocabulary fixed, so the LM table is constant and scoring
        # should scale with the corpus, not the model.
        "lm_score": lm_score_probe,
        # round-15b: the theta/KMV sketch build (distinct projection →
        # level-histogram prefilter → survivor bottom-k; retokened so
        # the distinct key set genuinely grows 10x), the CMS
        # heavy-hitter detector (sketch + full-vocab probe + exact
        # verify; replication grows counts, not vocabulary), the
        # co-occurrence pair join (per-doc distinct self-join, blowup
        # bounded by per-doc vocabulary), and the int4 block quantizer
        # (pure HOF map over embeddings).
        # two theta probes: retokened input grows the DISTINCT key set
        # 10x (the corpus-side distinct is inherently linear in that —
        # expect a high ratio bounded by fixed overhead), replicated
        # input keeps keys constant (the distinct collapses — expect a
        # low ratio measuring the pre-distinct scan). Together they
        # bracket the operator: state is O(k), cost is the distinct.
        "theta_sketch": _theta_probe,
        "theta_sketch_repl": _theta_probe,
        "heavy_hitters": _hh_probe,
        "cooccurrence": _cooc_probe,
        "int4_encode": _int4_probe,
        # round-9 (r8 verdict item 2): the composed cleaning pipeline
        # at corpus scale
        "corpus_clean": corpus_clean_probe,
        # round-10 (ADVICE r9 #1: the r9 probe never created the skew it
        # claimed — plain replication leaves every window hash under the
        # guard). SKEWED-KEY dedup, skew now PLANTED in the input (see
        # _planted_skew_documents): every 50th ORIGINAL doc's text is
        # overwritten with one fixed ~17-window boilerplate string,
        # constant across replicas — its window hashes appear in 100
        # docs at 1x / 1000 at 10x, both over the max_hash_docs=64
        # frequency guard (dedup.py), which must drop them BEFORE the
        # self-join. The other 98% of the input is the SAME rotated
        # replication as the uniform substring probe, so planted skew
        # is the only variable (ADVICE r9 #2). Done = ratio_10x within
        # ~2x of the uniform probe's.
        "substring_dup_skew": lambda d: dd.substring_dup_runs(d),
        # guard-OFF control on the identical planted input: without the
        # frequency guard the hot cluster's pairs enter the join —
        # ~0.02n² x ~17 window rows, quadratic in the cluster — so this
        # ratio_10x diverging far above substring_dup_skew's is the
        # direct evidence of what the guard prevents.
        "substring_dup_skew_noguard": lambda d: dd.substring_dup_runs(
            d, max_hash_docs=None
        ),
        # round-10 (r9 verdict item 6): the minhash band join under the
        # same planted cluster. Identical texts produce identical band
        # keys, so the cluster lands in 4 hot bands of 100/1000 docs;
        # max_band_docs=64 (the band twin of max_hash_docs) drops those
        # bands before the self-join. Done = ratio_10x within ~2x of
        # the uniform minhash probe's.
        "minhash_skew": lambda d: dd.minhash_candidate_pairs(
            d, "doc_id", "text", spread=False, max_band_docs=64
        ),
        # round-11 (r10 verdict item 5): ivfpq_search drifted up two
        # rounds on untouched code; the headline query re-TRAINS the PQ
        # codebooks inside itself (amortized once at real scale), so the
        # drift could live in training or in search. This probe splits
        # them: codebooks + centroids are trained ONCE on the 1x corpus
        # (driver-side literals thereafter), then the SEARCH path —
        # ivf_assign → pq_encode → probe join → ADC top-k, the part that
        # scales with the corpus — is timed at 1x and 10x. Done-bar:
        # search-side ratio_10x ≲ 2 (the plan is a zero-corpus-shuffle
        # projection chain, so it should scale with bytes scanned).
        "ivfpq_search_only": "_IVFPQ_SPECIAL",
        # round-11 continuation: the incremental-ingest Bloom probe —
        # bitmap trained ONCE on the 1x history (fixed 4096-bit row,
        # like a real nightly-ingest job reusing yesterday's filter),
        # then the zero-shuffle probe over the 1x/10x batch. Done-bar:
        # ratio_10x ~linear-in-bytes (pure broadcast + projection).
        "bloom_probe": "_BLOOM_SPECIAL",
        # round-12: the incremental MINHASH probe — near-dup sibling of
        # bloom_probe. History index (shingle + band tables) built ONCE
        # on the 1x history (a real pipeline persists it per corpus
        # build), then the 1x/10x RETOKENED batch probes it: rep-0 docs
        # match their identical history twins, retokened replicas have
        # disjoint vocabularies (zero cross-replica candidates), so the
        # ratio isolates the probe path — new-side hashing + the
        # new×history band join — not quadratic match output. Done-bar:
        # ratio_10x sublinear (the history side is never shuffled; the
        # small new band table broadcasts).
        "minhash_probe": "_MINHASH_INC_SPECIAL",
        # round-11 continuation: 3 integer-PageRank iterations over the
        # 2-out-link graph derived from the scaled corpus — K chained
        # join+agg shuffles on uniform id keys; linear edge volume.
        "pagerank": "_PAGERANK",
        # round-12 (r11 verdict item 6): containment rides the SAME
        # band join as minhash but re-joins FULL shingle arrays to the
        # surviving candidates — this probe proves those two keyed
        # equi-joins scale with the corpus. Retokened input (disjoint
        # per-replica vocabularies), because with identical replicas
        # every replica pair is a genuine candidate and the ratio
        # would measure the quadratic pair OUTPUT, not the operator
        # (the simhash r9 lesson).
        "containment": lambda d: dd.containment_verified_pairs(
            d, "doc_id", "text", max_band_docs=64
        ),
        # round-12 (r11 verdict item 6): within-doc repeated-line
        # removal — per-document window on (doc, line-hash), no
        # corpus-global key exists, so ~linear is the expectation.
        "dup_line_removal": lambda d: dd.remove_repeated_lines(d),
        # round-12 continuation: per-source quota cap with a PLANTED
        # HOT HOST (half the corpus lands in one source): the
        # under-quota long tail bypasses shuffle-free, and the
        # over-quota branch's rank exchange is pruned map-side by the
        # partial WindowGroupLimit to ≤quota rows per (task, source) —
        # the hot key inflates the scan, never the shuffle. Done-bar:
        # ~linear in bytes.
        "source_quota": lambda d: _source_quota_hot(d),
        # round-13: the new sketch/sampling/linalg operators.
        # hll: one token explode -> 256-key max agg; ~linear in bytes.
        "hll": lambda d: _hll_probe(d),
        # weighted sample: per-row priority + TakeOrderedAndProject —
        # zero Exchange, so the ratio is pure scan scaling.
        "weighted_sample": lambda d: _weighted_sample_probe(d),
        # pca covariance: one dxd mapInPandas partial per Arrow batch +
        # a d^2-key agg — the corpus-scaled stage of pca_top_component
        # (the power iteration is fixed-size and untimed here).
        "pca_covariance": "_PCA_COV",
        # round-14 rank sketch: two pruned scans (histogram pass +
        # broadcast-threshold survivor filter) + bounded aggregates —
        # ~linear in bytes; estimation is capacity-bounded and untimed
        # separately.
        "rank_sketch": lambda d: _rank_sketch_probe(d),
        # round-17 bitmap distinct: partial bit_or collapses each map
        # task to |types| x |id_space|/64 rows before the exchange, so
        # with the user base constant the shuffle is CONSTANT while the
        # scan grows 10x — expect ~linear-in-scan, and the word frame
        # (the state a rollup would persist) identical at both legs.
        "bitmap_distinct": lambda ev: _bitmap_probe(ev),
        # round-19 bitmap pairwise Jaccard (the bit_and intersection
        # half; bitmap_distinct covers the bit_or fold): 10x events
        # at CONSTANT id space — the word frame is |types| x
        # |id_space|/64 rows at BOTH legs (stamped words_x1/words_x10,
        # equal by construction), so the pair-intersection stage is
        # CONSTANT work and the ratio is scan/word-build dominated —
        # read against bitmap_distinct's band.
        "bitmap_jaccard": lambda ev: _jaccard_probe(ev),
        # round-19 native grouped percentile: 10x events at constant
        # type count — the exchange moves one sketch per (task, type)
        # regardless of rows, so the ratio is scan/sketch-fold
        # dominated (~linear in rows at fixed accuracy).
        "grouped_percentile": lambda ev: _gpa_probe(ev),
        # round-19 stratified reservoir: 10x events, same strata —
        # rank-limit pushdown caps every map task at k per window
        # group, so the exchanges carry <= P*k rows regardless of
        # stratum growth; expect ~linear (the scan + phase-1 sort),
        # never superlinear in the hot stratum.
        "stratified_reservoir": lambda ev: _strat_probe(ev),
        # round-17 blocked record linkage under a PLANTED HOT BLOCK
        # (the substring_dup_skew design applied to structured rows):
        # every 20th record's blocking key is overwritten with one
        # constant (1800, 0) — the hot block holds ~5% of ALL records
        # and grows linearly with the corpus (750 at 1x / 7500 at 10x
        # at sf0.1 => ~2.8e5 vs ~2.8e7 within-block pairs), while
        # normal blocks stay constant-size (each replica gets its own
        # birth_year band). max_block_size=64 must drop the hot block
        # BEFORE pairing at both legs, so the guarded ratio measures
        # the linear rest; the no-guard control lets the hot block's
        # |B|^2 pairs into the join — its ratio diverging far above
        # the guarded probe's is the direct evidence of what the
        # guard prevents.
        "linkage_blocked": lambda r: _linkage_probe(r, 64),
        "linkage_blocked_noguard": lambda r: _linkage_probe(r, None),
        # round-18 incremental linkage: the survivor registry is built
        # and bucket-written ONCE from the 1x records (untimed — a real
        # pipeline persists the crosswalk), then the 1x/10x BATCH
        # probes it through the block-key join + verify + min-survivor
        # assignment. Replicas carry disjoint birth_year bands (no
        # registry co-block) except the planted hot block, whose
        # candidates grow linearly in the batch against the FIXED
        # registry side — so ratio_10x ~linear is the done-bar, and
        # the registry is never re-shuffled (the plan-asserted
        # batch-side-only Exchange).
        "linkage_incremental": "_LINKINC_SPECIAL",
        # round-18 SCD2 dimension build: orders x10 with the CUSTOMER
        # BASE CONSTANT (per-key history grows 10x — the window-state
        # dimension), through the full lag-change -> run groupBy ->
        # versioning-window chain. One custkey exchange serves all
        # three stages, so ~linear-in-rows is the done-bar.
        "scd2_history": lambda o: _scd2_probe(o),
    }

    def _linkage_probe(records, cap):
        from pyspark.sql import functions as _F

        from interop_spark.operators.linkage import blocked_pairs

        pairs = blocked_pairs(
            records,
            ["birth_year", "state"],
            "rec_id",
            max_block_size=cap if cap is not None else 1 << 40,
        )
        dist = _F.levenshtein(col("family_a"), col("family_b"))
        return pairs.where(
            (col("given_a") == col("given_b")) & (dist <= 2)
        ).select("rec_id_a", "rec_id_b", dist.alias("d"))

    def _bitmap_probe(ev):
        from interop_spark.operators.bitmap import bitmap_words, popcount

        return popcount(
            bitmap_words(ev, ["event_type"], "user_id"), ["event_type"]
        )

    def _jaccard_probe(ev):
        # the registered row's own core (shared _jaccard_readout — the
        # probe can never time a different pair algebra than the row);
        # the word build + checkpoint is inside the timed section, as
        # in the row
        from interop_spark.operators.bitmap import bitmap_words
        from interop_spark.queries.analytics_q import _jaccard_readout

        return _jaccard_readout(
            bitmap_words(ev, ["event_type"], "user_id").localCheckpoint()
        )

    def _gpa_probe(ev):
        from interop_spark.queries.selection_q import GPA_ACCURACY, GPA_PS

        return ev.groupBy("event_type").agg(
            *[
                F.percentile_approx(
                    "value", F.lit(p), F.lit(GPA_ACCURACY)
                ).alias(f"p{int(p * 100)}")
                for p in GPA_PS
            ]
        )

    def _strat_probe(ev):
        # the registered row's own core (shared salted_grouped_topk —
        # the probe can never time a different shape than the row)
        from interop_spark.operators.scale import salted_grouped_topk
        from interop_spark.queries.selection_q import (
            STRAT_K,
            STRAT_SALTS,
        )

        h = F.md5(col("event_id").cast("string"))
        return salted_grouped_topk(
            ev.select("*", h.alias("_h")),
            ["event_type"],
            "_h",
            STRAT_K,
            F.pmod(col("event_id"), F.lit(STRAT_SALTS)),
            STRAT_SALTS,
        ).select("event_type", "event_id", "user_id", "rk")

    def _scd2_probe(o):
        # the registered row's own core (shared function — the probe
        # can never time a different run segmentation than the row)
        from pyspark.sql import functions as _F

        from interop_spark.queries.analytics_q import scd2_core

        return scd2_core(
            o.select(
                col("o_custkey").alias("custkey"),
                _F.date_format("o_orderdate", "yyyy-MM-dd").alias(
                    "eff_date"
                ),
                col("o_orderkey").alias("okey"),
                col("o_orderstatus").alias("status"),
                col("o_orderpriority").alias("priority"),
            )
        )

    def _scaled_orders(mult: int):
        # orders x mult with the customer base CONSTANT: each replica
        # extends every customer's order history (distinct order keys),
        # so per-key window state grows 10x while the key space holds.
        import os as _os

        o = spark.read.parquet(
            _os.path.join(sf_dir, "orders.parquet")
        ).select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
        )
        par = spark.sparkContext.defaultParallelism
        if mult == 1:
            return o.repartition(par)
        reps = spark.range(mult).select(col("id").alias("rep"))
        return (
            o.crossJoin(reps)
            .select(
                "o_custkey",
                "o_orderdate",
                (col("o_orderkey") * mult + col("rep")).alias(
                    "o_orderkey"
                ),
                "o_orderstatus",
                "o_orderpriority",
            )
            .repartition(par)
        )

    def _make_linkage_inc_fn():
        # registry built + bucket-written ONCE from the 1x records
        # (untimed); the returned closure is the pure per-batch path
        import shutil as _sh
        from urllib.parse import urlparse as _up

        from interop_spark.operators.linkage import incremental_pairs
        from interop_spark.operators.scale import write_bucketed

        reg = _scaled_records(1).select(
            col("rec_id").alias("entity_id"),
            "given",
            "family",
            (col("birth_year") * 100 + col("state"))
            .cast("int")
            .alias("block_key"),
        )
        t = "linkage_probe_reg"
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        wh = _up(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if wh:
            _sh.rmtree(
                __import__("os").path.join(wh, t), ignore_errors=True
            )
        write_bucketed(reg, t, "block_key", 8)
        table = spark.table(t)

        def fn(records):
            b = records.select(
                "rec_id",
                "given",
                "family",
                (col("birth_year") * 100 + col("state"))
                .cast("int")
                .alias("block_key"),
            )
            cand = incremental_pairs(b, table, "block_key")
            hits = cand.where(
                (col("given_new") == col("given_reg"))
                & (F.levenshtein("family_new", "family_reg") <= 2)
            )
            return hits.groupBy(col("rec_id_new").alias("rec_id")).agg(
                F.min("entity_id_reg").alias("entity_id")
            )

        return fn

    def _rank_sketch_probe(d):
        from interop_spark.operators.sketch import (
            rank_sketch_build,
            rank_sketch_quantiles,
        )

        return rank_sketch_quantiles(
            rank_sketch_build(
                d, F.length("text").cast("double"), col("doc_id")
            )
        )

    def _hll_probe(d):
        from interop_spark.operators.sketch import hll_estimate, hll_registers
        from interop_spark.operators.text import tokens as _tx

        toks = d.select(F.explode(_tx(col("text"))).alias("w")).where(
            col("w") != ""
        )
        return hll_estimate(hll_registers(toks, col("w")))

    def _weighted_sample_probe(d):
        from interop_spark.operators.text import tokens as _tx

        w = F.greatest(F.size(_tx(col("text"))), F.lit(1)).cast("long")
        h = F.conv(
            F.substring(F.md5(col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        return (
            d.select(
                "doc_id",
                w.alias("weight"),
                (h.cast("double") / w.cast("double")).alias("priority"),
            )
            .orderBy("priority", "doc_id")
            .limit(100)
        )

    def _source_quota_hot(d):
        from interop_spark.queries.selection_q import source_quota_kept

        skewed = d.select(
            F.when(col("doc_id") % 2 == 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("s"), (col("doc_id") % 50).cast("string"))
            )
            .alias("source"),
            "doc_id",
        )
        return source_quota_kept(skewed, quota=10)

    def _scaled_records(mult: int):
        # planted patient registry from customer x mult: replicas get
        # DISTINCT birth_year bands (normal block sizes stay constant
        # as the corpus grows) except the planted hot block — every
        # 20th base customer collapses to the constant key (1800, 0)
        # across ALL replicas, so only the hot block grows.
        import os as _os

        from interop_spark.queries.linkage_q import (
            FAMILY_NAMES,
            GIVEN_NAMES,
        )

        c = spark.read.parquet(
            _os.path.join(sf_dir, "customer.parquet")
        ).select("c_custkey", "c_nationkey")
        par = spark.sparkContext.defaultParallelism
        reps = spark.range(mult).select(col("id").alias("rep"))
        from pyspark.sql import functions as _F

        given = _F.element_at(
            _F.array(*[_F.lit(g) for g in GIVEN_NAMES]),
            (col("c_custkey") % 16 + 1).cast("int"),
        )
        family = _F.element_at(
            _F.array(*[_F.lit(f) for f in FAMILY_NAMES]),
            (_F.expr("c_custkey div 16") % 16 + 1).cast("int"),
        )
        base = c.crossJoin(reps).select(
            (col("c_custkey") * mult + col("rep")).alias("rec_id"),
            given.alias("given"),
            family.alias("family"),
            _F.when(col("c_custkey") % 20 == 0, _F.lit(1800))
            .otherwise(
                1900 + col("rep") * 60 + col("c_custkey") % 50
            )
            .cast("int")
            .alias("birth_year"),
            _F.when(col("c_custkey") % 20 == 0, _F.lit(0))
            .otherwise(col("c_nationkey"))
            .alias("state"),
        )
        return base.repartition(par)

    def _scaled_events_cols(mult: int):
        # events x mult with the USER BASE CONSTANT (the daily-active
        # shape: 10x more events, same id space) — the bitmap probe's
        # word frame must stay id-space-bounded while the scan grows.
        import os as _os

        ev = spark.read.parquet(
            _os.path.join(sf_dir, "events.parquet")
        ).select("event_type", "user_id")
        par = spark.sparkContext.defaultParallelism
        if mult == 1:
            return ev.repartition(par)
        reps = spark.range(mult).select(col("id").alias("rep"))
        return (
            ev.crossJoin(reps)
            .select("event_type", "user_id")
            .repartition(par)
        )

    def _scaled_events_pv(mult: int):
        # events x mult, (event_type, value) — the grouped-percentile
        # probe's shape: rows grow, the per-(task, type) sketch state
        # does not
        import os as _os

        ev = spark.read.parquet(
            _os.path.join(sf_dir, "events.parquet")
        ).select("event_type", "value")
        par = spark.sparkContext.defaultParallelism
        if mult == 1:
            return ev.repartition(par)
        reps = spark.range(mult).select(col("id").alias("rep"))
        return (
            ev.crossJoin(reps)
            .select("event_type", "value")
            .repartition(par)
        )

    def _scaled_events_ids(mult: int):
        # events x mult with DISTINCT event_ids per replica (unique
        # hash keys, as production ids are) — the reservoir probe's
        # shape: strata grow 10x, k stays fixed
        import os as _os

        ev = spark.read.parquet(
            _os.path.join(sf_dir, "events.parquet")
        ).select("event_type", "event_id", "user_id")
        par = spark.sparkContext.defaultParallelism
        if mult == 1:
            return ev.repartition(par)
        reps = spark.range(mult).select(col("id").alias("rep"))
        return (
            ev.crossJoin(reps)
            .select(
                "event_type",
                (col("event_id") * mult + col("rep")).alias("event_id"),
                "user_id",
            )
            .repartition(par)
        )

    def _rotated_documents(mult: int):
        import os as _os

        d = spark.read.parquet(
            _os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        par = spark.sparkContext.defaultParallelism
        if mult == 1:
            return d.repartition(par)
        reps = spark.range(mult).select(col("id").alias("rep"))
        big = 1 << 20
        rotated = F.concat(
            F.substring(col("text"), col("rep") + 1, F.lit(big)),
            F.substring(col("text"), F.lit(1), col("rep")),
        )
        return (
            d.crossJoin(reps)
            .select(
                (col("doc_id") * mult + col("rep")).alias("doc_id"),
                rotated.alias("text"),
            )
            .repartition(par)
        )
    # One fixed multi-window boilerplate (~210 chars => ~18 w=40/stride=10
    # window hashes, and >3 word-shingle bands), planted VERBATIM (never
    # rotated) on every 50th original doc so replicas share it exactly.
    _BOILERPLATE = (
        "This document is provided as is without warranty of any kind. "
        "Redistribution and use in source and binary forms with or without "
        "modification are permitted provided that the above copyright "
        "notice and this permission notice appear in all copies."
    )

    def _planted_skew_documents(mult: int):
        d = _rotated_documents(mult)
        return d.select(
            "doc_id",
            F.when(
                F.floor(col("doc_id") / mult) % 50 == 0, F.lit(_BOILERPLATE)
            )
            .otherwise(col("text"))
            .alias("text"),
        )

    def _retokened_documents(mult: int):
        # SimHash is a bag-of-token-hashes signature — it is invariant to
        # word order AND rotation, so both replication modes above make
        # every replica a GENUINE near-dup of its source (one token
        # differs), and the probe's 10x ratio measures the quadratic
        # cross-replica pair OUTPUT, not the operator's scaling (the r9
        # "simhash 10.3 at the linear boundary" watch item was exactly
        # this). Prefixing every token with the replica id gives replicas
        # disjoint vocabularies — independent signatures, zero
        # cross-replica candidates — so the ratio isolates the operator.
        import os as _os

        d = spark.read.parquet(
            _os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        par = spark.sparkContext.defaultParallelism
        if mult == 1:
            return d.repartition(par)
        reps = spark.range(mult).select(col("id").alias("rep"))
        retok = F.concat_ws(
            " ",
            F.transform(
                F.split(F.trim(col("text")), r"\s+"),
                lambda w: F.concat(
                    F.lit("r"), col("rep").cast("string"), F.lit("_"), w
                ),
            ),
        )
        return (
            d.crossJoin(reps)
            .select(
                (col("doc_id") * mult + col("rep")).alias("doc_id"),
                F.when(col("rep") == 0, col("text")).otherwise(retok).alias(
                    "text"
                ),
            )
            .repartition(par)
        )

    _SKEW_PROBES = frozenset(
        {"substring_dup_skew", "substring_dup_skew_noguard", "minhash_skew"}
    )

    def _make_ivfpq_search_fn():
        # one-time training on the 1x corpus; the returned closure is the
        # pure SEARCH path over driver-side literal codebooks/centroids
        from interop_spark.operators import pq as pqm

        base = _scaled_embeddings(1)
        query = [
            float(x)
            for x in base.orderBy("vec_id").select("embedding").first()[0]
        ]
        dim = len(query)
        m = next(m for m in (8, 4, 2, 1) if dim % m == 0)
        cbs = pqm.pq_train(base, m_subspaces=m, k=16, iters=1, dim=dim)
        cents = (
            spark.read.parquet(
                __import__("os").path.join(sf_dir, "embeddings.parquet")
            )
            .where(col("vec_id") < 8)
            .select(
                col("vec_id").alias("centroid_id"),
                col("embedding").alias("centroid"),
            )
        )
        return lambda d: pqm.ivfpq_search(
            d, cents, cbs, query, k=10, nprobe=2
        )

    def _make_bloom_fn():
        hist = _scaled_documents(spark, sf_dir, 1).where(
            col("doc_id") % 2 == 0
        )
        bits = dd.bloom_bits(hist, "text").localCheckpoint()
        return lambda d: dd.bloom_probe(d, bits)

    def _make_minhash_inc_fn():
        # index build is UNTIMED (localCheckpoint inside the builder is
        # eager) — the probe measures only the per-batch path
        hist = _scaled_documents(spark, sf_dir, 1).where(
            col("doc_id") % 2 == 0
        )
        idx = dd.build_minhash_index(hist, "doc_id", "text")
        return lambda d: dd.minhash_incremental_dedup(
            d, None, history_index=idx, max_band_docs=64
        )

    def _pagerank_probe(d):
        from interop_spark.operators.graph import pagerank_int

        n = d.agg(F.count(F.lit(1)).alias("n"))
        nodes = d.select(col("doc_id").alias("node"))
        edges = d.crossJoin(F.broadcast(n)).select(
            col("doc_id").alias("src"),
            F.explode(
                F.array(
                    (col("doc_id") * 7 + 1) % col("n"),
                    (col("doc_id") * 13 + 3) % col("n"),
                )
            ).alias("dst"),
            F.lit(2).alias("outdeg"),
        )
        return pagerank_int(nodes, edges, iterations=3)

    _EMB_PROBES = frozenset(
        {"ivf_assign", "ivfpq_search_only", "pca_covariance", "int4_encode"}
    )
    out: dict = {}
    for name, fn in probes.items():
        entry = {}
        if fn == "_PCA_COV":
            from interop_spark.operators.linalg import covariance as _cov

            fn = _cov
        if fn == "_IVFPQ_SPECIAL":
            try:
                fn = _make_ivfpq_search_fn()
            except Exception as e:
                out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                continue
        elif fn == "_BLOOM_SPECIAL":
            try:
                fn = _make_bloom_fn()
            except Exception as e:
                out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                continue
        elif fn == "_MINHASH_INC_SPECIAL":
            try:
                fn = _make_minhash_inc_fn()
            except Exception as e:
                out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                continue
        elif fn == "_LINKINC_SPECIAL":
            try:
                fn = _make_linkage_inc_fn()
            except Exception as e:
                out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                continue
        elif fn == "_PAGERANK":
            fn = _pagerank_probe
        scaled = (
            _scaled_records
            if name in ("linkage_blocked", "linkage_blocked_noguard",
                        "linkage_incremental") else
            _scaled_orders if name == "scd2_history" else
            _scaled_events_cols
            if name in ("bitmap_distinct", "bitmap_jaccard") else
            _scaled_events_pv if name == "grouped_percentile" else
            _scaled_events_ids if name == "stratified_reservoir" else
            _scaled_embeddings if name in _EMB_PROBES else
            _planted_skew_documents if name in _SKEW_PROBES else
            _rotated_documents if name == "substring_dup_runs" else
            _retokened_documents
            if name
            in ("simhash_neardup_pairs", "simhash_noguard", "containment",
                "minhash_probe", "theta_sketch")
            else
            lambda m: _scaled_documents(spark, sf_dir, m)
        )
        # per-probe sample counts: corpus_clean's 10x leg spreads
        # 6.5-13.3s across identical samples (GC/checkpoint churn — the
        # r15 "probe band drift" was this estimator noise, not the
        # operator); 4 samples reliably reach the ~6.5s steady state a
        # 2-sample min only sometimes sees.
        reps1, reps10 = _PROBE_REPS.get(name, (3, 2))
        try:
            for mult, nrep in ((1, reps1), (10, reps10)):
                d = scaled(mult)
                samples = []
                for _ in range(nrep):
                    t0 = _time.time()
                    fn(d).write.format("noop").mode("overwrite").save()
                    samples.append(_time.time() - t0)
                    # free each sample's localCheckpoint blocks (signature
                    # frames checkpoint internally); ContextCleaner drops
                    # RDD blocks once the JVM refs are collected
                    spark._jvm.System.gc()
                entry[f"x{mult}"] = round(min(samples), 3)
            entry["ratio_10x"] = round(entry["x10"] / max(entry["x1"], 1e-9), 1)
            if name in ("simhash_neardup_pairs", "simhash_noguard"):
                # the signature stage is linear in token BYTES, and the
                # retokened fixture inflates bytes ~1.49x beyond the
                # replica count (rN_ prefixes on short tokens) — publish
                # the byte volumes so the ratio is read against bytes,
                # not the nominal 10x (r15 verdict item 5)
                b1 = scaled(1).agg(F.sum(F.length("text"))).collect()[0][0]
                b10 = scaled(10).agg(F.sum(F.length("text"))).collect()[0][0]
                entry["bytes_x1"] = int(b1)
                entry["bytes_x10"] = int(b10)
                entry["ratio_per_byte"] = round(
                    entry["ratio_10x"] / (b10 / b1), 2
                )
            if name == "bitmap_jaccard":
                # the flat word-frame claim, stamped: constant id
                # space => identical word-frame size at both legs
                from interop_spark.operators.bitmap import (
                    bitmap_words as _bw,
                )

                entry["words_x1"] = int(
                    _bw(scaled(1), ["event_type"], "user_id").count()
                )
                entry["words_x10"] = int(
                    _bw(scaled(10), ["event_type"], "user_id").count()
                )
        except Exception as e:  # a probe failure must not void the bench
            entry["error"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = entry
    return out


def main() -> None:
    # AMBIENT load, sampled BEFORE the JVM spins up and the headline
    # loop runs (r15 verdict item 1: the post-loop `loadavg_1m` stamp
    # cannot distinguish "machine was busy when we started" from "our
    # own 32 threads" — r15's final refresh captured a degraded session
    # that its own post-loop stamp of 1.61 made look quiet). Anything
    # >~1 here means external contention: the artifact flags itself.
    ambient = os.getloadavg()[0]
    # r16 verdict item 1: don't just FLAG contention — WAIT IT OUT.
    # Two rounds running, the driver-visible artifact recorded a
    # contended upper bound (~30% above the committed quiet run) while
    # correctly self-flagging it; the flag is one step short of the
    # fix. Bounded quiet-wait: while the pre-JVM 1-min loadavg exceeds
    # the threshold, sleep-and-resample for up to
    # $SPARK_GRAFT_QUIET_WAIT seconds (default 10 min). Only if the
    # host is STILL loud do we run anyway and keep the existing
    # ambient_load_warning; the wait itself is stamped into the
    # artifact (quiet_wait_sec) so a judge can see which path ran.
    quiet_wait_max = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "600"))
    waited = 0.0
    while ambient > 1.0 and waited < quiet_wait_max:
        step = 30.0
        print(
            f"quiet-wait: 1-min loadavg {ambient:.2f} > 1.0, sleeping "
            f"{step:.0f}s ({waited:.0f}/{quiet_wait_max:.0f}s waited)",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(step)
        waited += step
        ambient = os.getloadavg()[0]
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
    spread: dict[str, dict] = {}
    errors: dict[str, str] = {}
    # JVM warm-up, once, before any timed rep: the FIRST headline query
    # otherwise absorbs the whole JVM's JIT compilation in its timed
    # reps (r16 drift note: corpus_clean's quiet samples descend
    # 3.1->2.2s across 9 reps purely from C2 warm-up; one extra untimed
    # execution of the first query moves that cost out of the medians).
    try:
        queries[HEADLINE[0]](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass  # the per-query loop below records the real error
    # r17 verdict item 2 (first half): FIXTURE GENERATION OUT OF THE
    # TIMED REGION — materialize both FHIR JSON corpora before any
    # timed rep (idempotent: a _COMPLETE marker makes later calls a
    # stat()), so a cold warehouse never bills corpus generation to
    # fhir_ingest_corpus / fhir_notebook_e2e's first warm rep, and
    # stamp what it cost so the artifact shows which path ran.
    fixture_gen_sec = None
    try:
        from interop_spark.fhir.gen import write_corpus
        from interop_spark.queries.fhir_queries import (
            _CORPUS_LIMIT,
            _E2E_LIMIT,
        )

        t0 = time.time()
        write_corpus(spark, sf_dir, max_custkey=_CORPUS_LIMIT)
        write_corpus(spark, sf_dir, max_custkey=_E2E_LIMIT)
        fixture_gen_sec = round(time.time() - t0, 3)
    except Exception as e:
        print(f"fixture pre-gen failed: {e}", file=sys.stderr)
    # r17 verdict item 7: HOST-SPEED CALIBRATION — a fixed-work probe
    # (constant-cardinality in-memory hash + aggregate + sort, zero
    # repo code, zero fixture dependence) whose runtime moves ONLY
    # with the host. Cross-round per-query ratios are read against
    # the calibration ratio first: a uniform multiplier that tracks
    # calibration_sec is environment, not plan drift. Median of 3
    # after one untimed JIT rep.
    from pyspark.sql import functions as F

    def _calibration_sec() -> float:
        def _work() -> None:
            (
                spark.range(8_000_000)
                .select((F.xxhash64("id") % 1000003).alias("k"))
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy("k")
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        _work()  # untimed JIT warm-up
        samples = []
        for _ in range(3):
            t0 = time.time()
            _work()
            samples.append(time.time() - t0)
        samples.sort()
        return round(samples[1], 3)

    try:
        calibration_sec = _calibration_sec()
    except Exception as e:
        calibration_sec = None
        print(f"calibration probe failed: {e}", file=sys.stderr)
    for name in HEADLINE:
        # per-query fault isolation (the round-6 lesson: one query's
        # loader assumption going stale must cost that query's row, not
        # the whole artifact)
        try:
            fn = queries[name]
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            samples = []
            for _ in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.time() - t0)
            samples.sort()
            times[name] = round(samples[len(samples) // 2], 3)
            # min + sd alongside the median (r9 verdict item 1: the
            # text/dedup family drifted 1.6-3.8x on untouched code —
            # a regression call needs the same-run noise floor next to
            # the point estimate; min is the machine's best case, sd
            # the within-run jitter)
            mean = sum(samples) / len(samples)
            sd = (sum((s - mean) ** 2 for s in samples) / len(samples)) ** 0.5
            spread[name] = {
                "min": round(samples[0], 3),
                "max": round(samples[-1], 3),
                "sd": round(sd, 3),
            }
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # STDOUT CONTRACT (r10 verdict item 1): the driver records only the
    # LAST ~2000 bytes of stdout, and r10's spread block pushed the
    # medians dict off the front — the regression-tracking payload was
    # lost. stdout therefore carries ONLY the minimal headline JSON
    # (metric/value/queries/sf/reps/loadavg, ~1 KB at 28 queries);
    # spread + scaling probes go to the committed BENCH_DETAIL.json.
    result = {
        "metric": "headline_queries_warm_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf else None,
        "reps": reps,
        # exogenous machine noise next to the numbers it skews: this
        # host carries external load (observed 1-min loadavg 8-11 with
        # zero local jobs; a loaded run measured every query uniformly
        # ~2x a quiet run's median on identical code). Interpret any
        # cross-round per-query drift against this first.
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "loadavg_pre": round(ambient, 2),
        "quiet_wait_sec": round(waited, 1),
        # fixed-work host-speed stamp (r17 verdict item 7): compare a
        # round's per-query ratios against the calibration ratio first
        "calibration_sec": calibration_sec,
    }
    if fixture_gen_sec is not None:
        result["fhir_fixture_gen_sec"] = fixture_gen_sec
    if ambient > 1.0:
        result["ambient_load_warning"] = (
            f"pre-run 1-min loadavg {ambient:.2f} > 1.0 — external "
            "contention; timings are upper bounds, re-record quiet"
        )
    # fixture provenance (r12 verdict item on cross-round comparability):
    # fhir_ingest_corpus cost scales with the bundle corpus's content
    # revision, so growth between rounds (v9->v16 added ~2.5x JSON per
    # file) must be attributable to the fixture, not read as a plan
    # regression. Stamp both generator versions into the artifact.
    try:
        from interop_spark.fhir.gen import CORPUS_VERSION, NDJSON_VERSION

        result["corpus_version"] = CORPUS_VERSION
        result["ndjson_version"] = NDJSON_VERSION
    except Exception:
        pass
    # r16 verdict item 5: fhir_ingest_corpus is a READER-THROUGHPUT
    # row, so its band must read per-BYTE (the simhash-probe
    # convention) — the corpus's on-disk JSON volume grows with
    # CORPUS_VERSION (v10->v16 the 1.46s->1.83s trend's denominator),
    # and a flat sec/byte across corpus versions means reader cost,
    # not engine creep. Stamp the byte volume the query parsed.
    try:
        from interop_spark.fhir.gen import corpus_dir
        from interop_spark.queries.fhir_queries import _CORPUS_LIMIT

        cdir = corpus_dir(sf_dir, _CORPUS_LIMIT)
        if os.path.isdir(cdir):
            result["fhir_corpus_bytes"] = sum(
                e.stat().st_size
                for e in os.scandir(cdir)
                if e.is_file() and e.name.endswith(".json")
            )
    except Exception:
        pass
    if errors:
        result["errors"] = errors
    detail = {
        "spread": spread,
        # per-query MIN-of-reps as an explicit map (r17 verdict item 7:
        # the machine's best case is the noise-robust cross-round
        # comparator; spread duplicates it per-query but this map is
        # directly diffable against the `queries` medians)
        "queries_min": {n: s["min"] for n, s in spread.items()},
        "loadavg_1m_post_headline": round(os.getloadavg()[0], 2),
        "drift_note": DRIFT_NOTE,
    }
    # safety net: the headline numbers exist in the output even if the
    # probes below take the JVM down (round-4 lost the whole artifact
    # that way). Prefixed + stderr so the driver's one-JSON-line stdout
    # contract still holds.
    print("HEADLINE (pre-probe): " + json.dumps(result), file=sys.stderr, flush=True)
    # r17 verdict item 2 (second half): per-leg timing for the e2e
    # chain — the next fhir_notebook_e2e drift names a LEG (fixture /
    # ingest / sink / rejoin / writer), not a lump. AFTER the safety-
    # net print and behind the probe gate: this re-runs the heaviest
    # chain in the suite, and a JVM-killing failure here must cost the
    # probe block, never the headline artifact (the round-4 lesson).
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        try:
            from interop_spark.queries.fhir_queries import (
                notebook_e2e_leg_times,
            )

            detail["fhir_notebook_e2e_legs"] = notebook_e2e_leg_times(
                spark, sf_dir
            )
        except Exception as e:
            detail["fhir_notebook_e2e_legs"] = {
                "error": f"{type(e).__name__}: {e}"[:300]
            }
        try:
            detail["scaling"] = _scaling_probes(spark, sf_dir)
        except Exception as e:
            detail["scaling"] = {"error": f"{type(e).__name__}: {e}"[:300]}
    detail_path = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump({**result, **detail}, f, indent=1)
            f.write("\n")
    except OSError as e:  # read-only checkout must not void the bench
        print(f"BENCH_DETAIL write failed: {e}", file=sys.stderr)
    print(stdout_line(result))


def stdout_line(result: dict) -> str:
    """The ONE stdout JSON line, minimal (r20, VERDICT r19 item 3): the
    driver keeps only a bounded tail of stdout, and the full artifact
    outgrew it three rounds running (r16-r18 `parsed: None`; the r19
    line squeaked through at 2565 bytes). The line carries exactly the
    driver contract — metric/value/unit/queries/sf (+reps, +errors if
    any) — with 2-decimal per-query values and compact separators;
    every other field (loadavg, calibration, fixture provenance,
    3-decimal medians, spread, scaling) lives in BENCH_DETAIL.json and
    the stderr safety-net line, which keep full precision. All 81
    query names stay (the driver contract forbids removing/renaming),
    which floors the line at ~2.1 KB; `test_bench_stdout_line_bounded`
    pins the ceiling so new HEADLINE rows can't silently push it back
    over the observed parse limit."""
    out = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "queries": {n: round(v, 2) for n, v in result["queries"].items()},
        "sf": result["sf"],
        "reps": result["reps"],
    }
    if result.get("errors"):
        out["errors"] = {
            n: str(e)[:80] for n, e in result["errors"].items()
        }
    return json.dumps(out, separators=(",", ":"))


if __name__ == "__main__":
    main()
