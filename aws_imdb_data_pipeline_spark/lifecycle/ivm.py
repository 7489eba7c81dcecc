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

# One-time flag for the legacy n_vals reconstruction warning below.
_LEGACY_NVALS_WARNED = False


def grouped_state_agg(
    state: DataFrame,
    group_cols: list[str],
    val_col: str,
    count_alias: str = "n_keys",
    sum_alias: str = "sum_value",
    nval_alias: str = "n_vals",
) -> DataFrame:
    """The maintained view's definition: per group, COUNT of live keys
    and raw (unrounded) SUM of ``val_col`` over the current state.

    The third column — COUNT of NON-NULL ``val_col`` — is the extra
    sufficient statistic SQL-exact SUM maintenance requires: SUM over a
    group whose every value is NULL is NULL, not 0, and only the
    non-null count can tell the merge when a retraction drains the last
    non-null value (the count/sum pair alone cannot distinguish
    "sum is 0" from "sum is empty")."""
    return state.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_alias),
        F.sum(val_col).alias(sum_alias),
        F.count(val_col).alias(nval_alias),
    )


def state_transition_deltas(
    snapshot: DataFrame,
    slice_log: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    pin_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """±1 delta rows for every key the slice touches: −1 carrying the
    key's OLD state row (if it existed), +1 carrying its NEW state row
    (if it survives — a closing delete emits only the retraction).
    Untouched keys emit nothing, so delta volume ∝ slice, not state.

    The new state of touched keys comes from
    `lifecycle.cdc.apply_changelog` restricted to the touched subset —
    the same broadcast-probe merge the row-level path uses, inheriting
    its replay/ordering semantics.

    ``pin_registry``: the touched-subset frame is persist()ed (see the
    comment below); a long-lived caller (the streaming sink runs this
    every micro-batch) passes a list here, receives the pinned frame,
    and MUST unpersist it once the deltas are materialized — otherwise
    cached slice-sized blocks accumulate for the stream's lifetime."""
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
    if pin_registry is not None:
        pin_registry.append(old_touched)
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
    nval_alias: str = "n_vals",
) -> DataFrame:
    """Merge ±1 delta rows into the base view: union the base rows
    with per-delta contribution rows and re-aggregate to group
    cardinality, dropping groups whose count reaches zero. COUNT/SUM
    self-maintainability is the whole trick — no group ever needs its
    member rows again.

    SQL-exact on two NULL fronts a naive merge gets wrong, and
    structured as a UNION + ONE aggregate rather than a join:
    (1) a NULL group key is a legitimate groupBy group — groupBy
    merges NULL keys natively, where a null-unsafe full-outer join
    splits them into two rows and a null-safe (eqNullSafe) join fixes
    that but re-exchanges BOTH sides on derived (coalesce, isnull)
    keys (+2 shuffles measured, bench-flagged);
    (2) the merged SUM is NULL (not 0.0) exactly when the maintained
    non-null value count reaches zero — matching a from-scratch SUM,
    which is NULL over a group whose surviving values are all NULL.
    The non-null count comes from the ``nval_alias`` column
    :func:`grouped_state_agg` carries for precisely this purpose.

    Plan: base rows and per-delta contribution rows union into ONE
    partial+final hash aggregate on the group key — a single shuffle
    of |groups| + delta-combined rows, strictly fewer than any
    delta-aggregate + outer-join formulation."""
    if nval_alias not in base_agg.columns:
        # Legacy-view migration: a state dir whose `view` parquet was
        # committed before the n_vals column existed would otherwise
        # fail with an unresolved-column error on stream restart.
        # Reconstruct conservatively: NULL sum => zero non-null values;
        # non-NULL sum => assume all counted rows were non-null. The
        # reconstruction is exact unless the legacy group mixed NULL
        # and non-NULL values AND a later retraction drains the
        # non-null ones (sum then reads 0.0 instead of NULL for that
        # group until it is rebuilt) — documented next to the replay
        # guard's legacy-checkpoint handling. Warn once per process so
        # operators know the view carries reconstructed (approximate)
        # n_vals until rebuilt (round-10 advice).
        global _LEGACY_NVALS_WARNED
        if not _LEGACY_NVALS_WARNED:
            _LEGACY_NVALS_WARNED = True
            import logging

            logging.getLogger(__name__).warning(
                "maintain_grouped_agg: base view lacks %r — "
                "reconstructing non-null value counts from the legacy "
                "columns. Groups that mixed NULL and non-NULL values "
                "may report SUM 0.0 instead of NULL after retractions "
                "drain the non-null values; rebuild the view to clear "
                "this.",
                nval_alias,
            )
        base_agg = base_agg.withColumn(
            nval_alias,
            F.when(F.col(sum_alias).isNull(), F.lit(0)).otherwise(
                F.col(count_alias)
            ),
        )
    contrib_base = base_agg.select(
        *group_cols,
        F.col(count_alias).cast("long").alias("__n"),
        F.col(sum_alias).alias("__s"),
        F.col(nval_alias).cast("long").alias("__nn"),
    )
    contrib_delta = deltas.select(
        *group_cols,
        F.col("__mult").cast("long").alias("__n"),
        (F.col("__mult") * F.col(val_col)).alias("__s"),
        F.when(F.col(val_col).isNotNull(), F.col("__mult"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__nn"),
    )
    merged = (
        contrib_base.unionByName(contrib_delta)
        .groupBy(*group_cols)
        .agg(
            F.sum("__n").alias(count_alias),
            F.sum("__s").alias("__rawsum"),
            F.sum("__nn").alias(nval_alias),
        )
        .select(
            *group_cols,
            count_alias,
            # SUM already skips NULL contributions; the n_vals gate
            # restores NULL when a retraction drains the last non-null
            F.when(F.col(nval_alias) > 0, F.col("__rawsum")).alias(
                sum_alias
            ),
            nval_alias,
        )
    )
    return merged.filter(F.col(count_alias) > 0)
