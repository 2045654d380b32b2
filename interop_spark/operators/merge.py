"""Relational emulation of Delta Lake ``MERGE INTO``.

``delta-spark`` is not installable in this environment, so the reference's
Delta sinks land as parquet tables (parity boundary documented in
STATUS.md). This operator gives the MERGE *semantics* a user relies on,
following the public Delta contract:

- ``ON`` an equi-key set;
- ``WHEN MATCHED THEN UPDATE SET *`` (source row replaces target row) or
  ``WHEN MATCHED THEN DELETE``;
- ``WHEN NOT MATCHED THEN INSERT *``;
- multiple source rows matching the SAME target row raise at execution
  time (Delta's multiple-source-row-matching error) — enforced with a
  windowed count over matched source rows feeding ``raise_error`` inside a
  filter (a filter is never pruned, unlike a projection). Pass
  ``source_unique=True`` to skip the check and its window shuffle when the
  caller guarantees key-uniqueness.

Unlike Delta this returns the merged DataFrame rather than transactionally
rewriting a table: the write layer (`interop_spark/fhir/write.py`)
overwrites parquet tables wholesale, which is the non-transactional
equivalent.

Scale shape: one shuffle join per clause on the merge keys (left_semi /
left_anti), all AQE-eligible; no window unless the duplicate check runs,
and that window shares the merge-key partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checked_unique(matched: DataFrame, keys: list[str]) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys)
    msg = F.concat(
        F.lit("MERGE: multiple source rows match target key ("),
        F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
        F.lit(")"),
    )
    return (
        matched.withColumn("_match_cnt", F.count(F.lit(1)).over(w))
        .where(
            F.when(
                F.col("_match_cnt") > 1, F.raise_error(msg).isNull()
            ).otherwise(F.lit(True))
        )
        .drop("_match_cnt")
    )


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    source_unique: bool = False,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys`` with Delta MERGE
    semantics; returns the merged DataFrame. Schemas must align by name
    (``UPDATE SET *`` / ``INSERT *`` form).

    when_matched: ``"update"`` | ``"delete"``;
    when_not_matched: ``"insert"`` | ``"ignore"``.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(
            f"when_not_matched must be insert|ignore, got {when_not_matched!r}"
        )
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(
            f"UPDATE SET * / INSERT * needs source to cover target columns; "
            f"missing {missing}"
        )
    source = source.select(*target.columns)
    tkeys = target.select(*keys)

    if when_matched == "delete" and not source_unique:
        # Delta raises the same multiple-source-rows-match error for
        # WHEN MATCHED DELETE. The matched set is not part of the output
        # here, so route the anti-join's build side THROUGH the checked
        # frame — the anti-join must evaluate every checked row to build
        # its hash table, which forces the raise_error filter to run.
        matched = source.join(tkeys, keys, "left_semi")
        anti_keys = _checked_unique(matched, keys).select(*keys)
    else:
        anti_keys = source.select(*keys)

    parts: list[DataFrame] = [target.join(anti_keys, keys, "left_anti")]
    if when_matched == "update":
        matched = source.join(tkeys, keys, "left_semi")
        if not source_unique:
            matched = _checked_unique(matched, keys)
        parts.append(matched)
    # "delete": matched target rows are simply absent from the output
    if when_not_matched == "insert":
        parts.append(source.join(tkeys, keys, "left_anti"))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_into_conditional(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_condition: str,
    when_not_matched: str = "insert",
    source_unique: bool = False,
) -> DataFrame:
    """The conditional matched clause of the public Delta contract —
    ``WHEN MATCHED AND <condition> THEN UPDATE SET *`` — which plain
    ``merge_into`` cannot express: a matched target row is replaced by
    its source row ONLY when ``matched_condition`` holds, and kept
    as-is otherwise. The condition is a SQL expression referencing the
    source row as ``s.<col>`` and the target row as ``t.<col>``
    (e.g. ``"s.ts > t.ts"`` — the idempotent CDC upsert guard); a NULL
    condition counts as NOT matched-for-update, per Delta.

    This is the clause that makes streaming ``foreachBatch`` upserts
    batch-split independent: with a last-writer-wins guard in the
    condition, applying batches in any grouping converges to the same
    per-key winner. Appended alongside ``merge_into`` (same validation,
    same duplicate-source-rows error path, same scale shape: equi-joins
    on the merge keys only; the matched branch is ONE join evaluated
    once — per-column ``CASE WHEN cond THEN s ELSE t`` — not two)."""
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(
            f"when_not_matched must be insert|ignore, got {when_not_matched!r}"
        )
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(
            f"UPDATE SET * / INSERT * needs source to cover target columns; "
            f"missing {missing}"
        )
    cols = target.columns
    source = source.select(*cols)
    tkeys = target.select(*keys)

    matched_src = source.join(tkeys, keys, "left_semi")
    if not source_unique:
        matched_src = _checked_unique(matched_src, keys)

    cond = F.coalesce(F.expr(matched_condition), F.lit(False))
    # Plain (null-unsafe) equality, matching Delta's ON semantics and the
    # semi/anti clauses above/below: a null-keyed row never "matches",
    # so it is preserved by the anti join exactly once. (A null-SAFE
    # inner join here would emit null-keyed target rows twice if the
    # semi join were ever made null-safe too.)
    joined = target.alias("t").join(
        matched_src.alias("s"),
        [F.col(f"s.{k}") == F.col(f"t.{k}") for k in keys],
        "inner",
    )
    merged_matched = joined.select(
        *[
            F.when(cond, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )

    parts = [target.join(source.select(*keys), keys, "left_anti"), merged_matched]
    if when_not_matched == "insert":
        parts.append(source.join(tkeys, keys, "left_anti"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
