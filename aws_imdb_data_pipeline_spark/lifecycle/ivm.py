"""Incremental view maintenance (IVM) for grouped aggregates over a
CDC feed.

The warehouse pattern one level above `lifecycle.cdc.apply_changelog`:
a derived GROUPED AGGREGATE (a reporting view — users per segment,
revenue per type) is kept current from row-level changes WITHOUT
recomputing it from the full state. Classic delta-processing: every
state transition of a key emits a retraction (−1, old row) and an
assertion (+1, new row); the view update is the group-aggregated
deltas merged into the base view — COUNT and SUM are self-maintainable
under retractions (no per-group history needed; MIN/MAX are not and
would need the state, which is exactly why this module stops at the
self-maintainable aggregates).

Scale shape (the apply_changelog inheritance): the snapshot is never
shuffled — touched keys arrive as a broadcast semi-join probe — so one
maintenance cycle costs O(slice + touched keys + |groups|), while the
recompute alternative pays a full-state shuffle per refresh. The final
merge joins two GROUP-CARDINALITY frames (the vocabulary-merge shape,
extensions.tokenindex.merge_dfl).

Float policy: delta sums change the summation ORDER vs a from-scratch
aggregate (base partial + delta partials), so view sums stay RAW
internally and are rounded only at presentation — the same
round-only-SUMs rule every oracle in this repo follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_state_agg(
    state: DataFrame,
    group_cols: list[str],
    val_col: str,
    count_alias: str = "n_keys",
    sum_alias: str = "sum_value",
) -> DataFrame:
    """The maintained view's definition: per group, COUNT of live keys
    and raw (unrounded) SUM of ``val_col`` over the current state."""
    return state.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_alias),
        F.sum(val_col).alias(sum_alias),
    )


def state_transition_deltas(
    snapshot: DataFrame,
    slice_log: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """±1 delta rows for every key the slice touches: −1 carrying the
    key's OLD state row (if it existed), +1 carrying its NEW state row
    (if it survives — a closing delete emits only the retraction).
    Untouched keys emit nothing, so delta volume ∝ slice, not state.

    The new state of touched keys comes from
    `lifecycle.cdc.apply_changelog` restricted to the touched subset —
    the same broadcast-probe merge the row-level path uses, inheriting
    its replay/ordering semantics."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import apply_changelog

    touched = slice_log.select(*keys).distinct()
    # PERSIST the touched subset: three consumers derive from it (the
    # retraction branch, and apply_changelog's kept + resolve sides),
    # and without the pin each replans the full snapshot scan — probed
    # at 10M keys the un-pinned form paid 3 scans and LOST to a plain
    # recompute (SCALE.md §28). The pinned frame is slice-sized
    # (touched keys only), so memory is bounded by the slice.
    old_touched = (
        snapshot.join(F.broadcast(touched), keys, "left_semi").persist()
    )
    new_touched = apply_changelog(
        old_touched, slice_log, keys, seq_cols, op_col=op_col,
        delete_op=delete_op,
    )
    cols = [c for c in snapshot.columns]
    return new_touched.select(*cols).withColumn(
        "__mult", F.lit(1)
    ).unionByName(
        old_touched.select(*cols).withColumn("__mult", F.lit(-1))
    )


def maintain_grouped_agg(
    base_agg: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    val_col: str,
    count_alias: str = "n_keys",
    sum_alias: str = "sum_value",
) -> DataFrame:
    """Merge ±1 delta rows into the base view: aggregate the deltas to
    group cardinality, FULL OUTER sum against the base, drop groups
    whose count reaches zero. COUNT/SUM self-maintainability is the
    whole trick — no group ever needs its member rows again."""
    delta_agg = deltas.groupBy(*group_cols).agg(
        F.sum("__mult").alias("__dn"),
        F.sum(F.col("__mult") * F.col(val_col)).alias("__dsum"),
    )
    merged = base_agg.join(delta_agg, group_cols, "full_outer").select(
        *group_cols,
        (
            F.coalesce(F.col(count_alias), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias(count_alias),
        (
            F.coalesce(F.col(sum_alias), F.lit(0.0))
            + F.coalesce(F.col("__dsum"), F.lit(0.0))
        ).alias(sum_alias),
    )
    return merged.filter(F.col(count_alias) > 0)
