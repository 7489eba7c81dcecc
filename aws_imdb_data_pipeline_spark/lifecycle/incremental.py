"""Incremental aggregate maintenance (materialized-view style).

The reference recomputes its marts from scratch every run (dbt
full-refresh models over the whole warehouse). At 100 TB a daily full
recompute of "revenue by customer since inception" is the dominant
cost; the standard fix is to keep MERGEABLE partial aggregates as a
small state table and fold each new slice in:

    state' = re-aggregate( state  UNION ALL  partial_agg(new slice) )

sum/count/min/max are mergeable as-is (and avg = sum/count at read
time); the state has one row per group, so the fold touches data
proportional to the NEW slice + the group count, never the history.

Exactly-once: the fold is NOT idempotent — feed each slice once.
Callers pair it with the run-manifest machinery (lifecycle/runs.py):
record the slice id in the state directory's manifest and skip slices
already applied (see ``update_aggregate_state``'s ``slice_id``).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# measure kind -> (partial aggregator, merge aggregator)
_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),  # counts merge by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

_APPLIED = "_applied_slices.txt"


def partial_aggregate(
    df: DataFrame, group_cols: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """One partial-aggregate row per group: ``measures`` maps
    out_col -> (kind, src_col), kind in sum|count|min|max."""
    aggs = []
    for out, (kind, src) in measures.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported measure kind: {kind!r}")
        aggs.append(_KINDS[kind][0](F.col(src)).alias(out))
    return df.groupBy(*group_cols).agg(*aggs)


def merge_aggregate_states(
    state: DataFrame, delta: DataFrame, group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold a partial-aggregate delta into an existing state frame."""
    aggs = [
        _KINDS[kind][1](F.col(out)).alias(out)
        for out, (kind, _) in measures.items()
    ]
    return state.unionByName(delta).groupBy(*group_cols).agg(*aggs)


def applied_slices(state_path: str) -> set[str]:
    marker = os.path.join(state_path, _APPLIED)
    if not os.path.exists(marker):
        return set()
    with open(marker) as f:
        return {line.strip() for line in f if line.strip()}


def update_aggregate_state(
    spark: SparkSession,
    state_path: str,
    new_df: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    slice_id: str | None = None,
) -> DataFrame:
    """Fold ``new_df`` into the parquet state table at ``state_path``
    (created on first call) and return the new state.

    With ``slice_id`` set, a slice that was already applied is skipped
    (no-op returning current state) and each applied id is recorded in
    a marker file inside the state directory — re-running a failed
    orchestration step cannot double-count. The state is rewritten via
    a staging swap (read-then-overwrite of the same path must not
    share one lazy plan); state size is O(groups), so the rewrite cost
    is independent of history length.
    """
    exists = os.path.exists(state_path)
    if slice_id is not None and exists and slice_id in applied_slices(state_path):
        return spark.read.parquet(state_path)
    delta = partial_aggregate(new_df, group_cols, measures)
    if exists:
        state = spark.read.parquet(state_path)
        merged = merge_aggregate_states(state, delta, group_cols, measures)
        staging = f"{state_path}__staging_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(staging)
        applied = applied_slices(state_path)
        shutil.rmtree(state_path)
        shutil.move(staging, state_path)
    else:
        delta.write.mode("overwrite").parquet(state_path)
        applied = set()
    if slice_id is not None:
        applied.add(slice_id)
        with open(os.path.join(state_path, _APPLIED), "w") as f:
            f.write("\n".join(sorted(applied)) + "\n")
    return spark.read.parquet(state_path)
