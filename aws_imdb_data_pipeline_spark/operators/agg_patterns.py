"""Reusable aggregation patterns (A1, A6-A11).

- ``ordered_collect_concat``: the reference's ordered top-cast string —
  ``sort_array(collect_list(struct(order, value)))`` → ``transform`` →
  ``concat_ws`` (glue.py:157-168). All built-in higher-order functions;
  no Python boundary.
- ``grouped_profile``: single-pass multi-aggregate per group (A1,
  glue.py:300-308) generalized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_collect_concat(
    df: DataFrame,
    group_by: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str,
    sep: str = ", ",
) -> DataFrame:
    """Per group: values joined by ``sep`` in ``order_col`` order.

    One hash-aggregate (partial+final); the sort happens inside the
    collected array per group, not as a global sort
    (reference: glue.py:157-168).
    """
    pairs = F.sort_array(F.collect_list(F.struct(F.col(order_col), F.col(value_col))))
    joined = F.concat_ws(sep, F.transform(pairs, lambda x: x[value_col]))
    return df.groupBy(*group_by).agg(joined.alias(out_col))


def grouped_profile(
    df: DataFrame, group_by: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Grouped multi-aggregate in one shuffle (glue.py:300-308)."""
    return df.groupBy(*group_by).agg(*aggs)


def salted_aggregate(
    df: DataFrame,
    group_by: Sequence[str],
    sum_cols: Sequence[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted sum-aggregate for skewed keys.

    Phase 1 groups on (keys, random salt) so a hot key's rows spread
    over ``salt_buckets`` reducers; phase 2 merges the partials per
    key. Count is carried so downstream averages stay exact. AQE's
    skew handling covers joins; extreme aggregate skew (one key = 30%
    of a 100 TB table) still needs this explicit spread.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*group_by, "__salt").agg(
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("__n"),
    )
    return partial.groupBy(*group_by).agg(
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("__n").alias("n_rows"),
    )
