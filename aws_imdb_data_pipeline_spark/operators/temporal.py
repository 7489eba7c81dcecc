"""Temporal join operators Spark lacks natively: as-of join and
bounded-interval (range) join — composed from built-in operators per
the engine's custom-operator policy (composition first, pandas UDF
only if semantics demand it; here they don't).

as-of join (merge-scan formulation):
    union(left tagged 1, right tagged 0) → one shuffle+sort on
    (key, ts, side) → last(right_value ignoreNulls) over the ordered
    window gives every left row the most recent right row with
    right.ts <= left.ts. Linear in rows, ONE shuffle — the same cost
    as a sort-merge join, with no per-key quadratic blowup. (The naive
    inequality join + row_number is O(L*R) per key.)

interval join (bucketed formulation):
    right rows replicate into ceil(gap/bucket)+1 time buckets; join on
    (key, bucket) equi-keys, then exact-filter the interval. Candidate
    set is bounded by bucket co-residency instead of the full per-key
    cross product — the standard stream-stream interval-join layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row (same keys,
    right.ts <= left.ts, inclusive). Missing match → NULLs. If right
    has several rows at one (keys, ts), dedupe it first — survivor
    choice is the caller's semantic decision.

    Returns all left columns plus ``right_value_cols`` and
    ``__matched_ts`` (the matched right timestamp).

    ``right_value_cols`` may not collide with left column names: the
    union-based fill would treat the left row's own value as the most
    recent right value and silently produce wrong fills.
    """
    collisions = set(right_value_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            "asof_join right_value_cols collide with left columns: "
            f"{sorted(collisions)}; rename them on the right side first"
        )
    lcols = left.columns
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tagged = (
        right.select(
            *on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_value_cols],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__matched_ts", F.col("__ts"))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows sort before left rows at equal ts → inclusive <=
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_value_cols + ["__matched_ts"]
        ],
    )
    out = filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__f_{c}").alias(c) for c in right_value_cols],
        F.col("__f___matched_ts").alias("__matched_ts"),
    )
    if tolerance_seconds is not None:
        # microsecond precision, matching interval_join: unix_timestamp
        # truncates to whole seconds and can keep matches ~1s past the
        # tolerance on sub-second data
        within = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("__matched_ts"))
        ) <= int(tolerance_seconds * 1_000_000)
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in right_value_cols
            ],
            F.when(within, F.col("__matched_ts")).otherwise(F.lit(None)).alias(
                "__matched_ts"
            ),
        )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    direction: str = "forward",
) -> DataFrame:
    """Pairs (left, right) with the same keys whose timestamps are
    within ``max_gap_seconds``: 'forward' keeps right.ts <= left.ts <=
    right.ts + gap; 'both' keeps |left.ts - right.ts| <= gap.

    Right rows replicate into adjacent time buckets of width gap; the
    join is a plain equi-join on (keys, bucket) + exact filter.
    """
    # microsecond precision throughout: unix_timestamp() truncates to
    # seconds, which silently shifts gaps computed on sub-second data
    gap_us = int(max_gap_seconds) * 1_000_000
    l_b = left.withColumn(
        "__bucket", F.floor(F.unix_micros(left_ts) / gap_us).cast("long")
    )
    r_base = right.withColumn(
        "__rb", F.floor(F.unix_micros(right_ts) / gap_us).cast("long")
    )
    offsets = [0, 1] if direction == "forward" else [-1, 0, 1]
    r_b = r_base.withColumn(
        "__bucket", F.explode(F.array(*[F.col("__rb") + o for o in offsets]))
    ).drop("__rb")
    joined = l_b.join(r_b, [*on, "__bucket"]).drop("__bucket")
    dt = F.unix_micros(left_ts) - F.unix_micros(right_ts)
    cond: Column = (
        (dt >= 0) & (dt <= gap_us)
        if direction == "forward"
        else (F.abs(dt) <= gap_us)
    )
    return joined.filter(cond)
