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

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """Merge ±1 delta rows into the base view: aggregate the deltas to
    group cardinality, FULL OUTER sum against the base, drop groups
    whose count reaches zero. COUNT/SUM self-maintainability is the
    whole trick — no group ever needs its member rows again.

    SQL-exact on two NULL fronts a naive merge gets wrong:
    (1) the join is NULL-SAFE per group column (`eqNullSafe`) — a NULL
    group key is a legitimate groupBy group, and a null-unsafe
    full-outer join would split it into two rows instead of merging;
    (2) the merged SUM is NULL (not 0.0) exactly when the maintained
    non-null value count reaches zero — matching a from-scratch SUM,
    which is NULL over a group whose surviving values are all NULL.
    The non-null count comes from the ``nval_alias`` column
    :func:`grouped_state_agg` carries for precisely this purpose."""
    delta_agg = deltas.groupBy(*group_cols).agg(
        F.sum("__mult").alias("__dn"),
        F.sum(F.col("__mult") * F.col(val_col)).alias("__dsum"),
        F.sum(
            F.when(F.col(val_col).isNotNull(), F.col("__mult")).otherwise(0)
        ).alias("__dnn"),
    )
    b, d = base_agg.alias("__base"), delta_agg.alias("__delta")
    cond = functools.reduce(
        operator.and_,
        [
            F.col(f"__base.{c}").eqNullSafe(F.col(f"__delta.{c}"))
            for c in group_cols
        ],
    )
    n_vals = F.coalesce(F.col(f"__base.{nval_alias}"), F.lit(0)) + F.coalesce(
        F.col("__dnn"), F.lit(0)
    )
    raw_sum = F.coalesce(F.col(f"__base.{sum_alias}"), F.lit(0.0)) + F.coalesce(
        F.col("__dsum"), F.lit(0.0)
    )
    merged = b.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__base.{c}"), F.col(f"__delta.{c}")).alias(c)
            for c in group_cols
        ],
        (
            F.coalesce(F.col(f"__base.{count_alias}"), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias(count_alias),
        F.when(n_vals > 0, raw_sum).alias(sum_alias),
        n_vals.alias(nval_alias),
    )
    return merged.filter(F.col(count_alias) > 0)
