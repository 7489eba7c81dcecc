r"""Data-quality profile snapshots (Q1, Q2).

Port of the reference's single-pass DQ profiler (glue.py:67-114): one
``df.agg(*exprs)`` computes row_count, per-column nullish counts
(NULL ∨ '\N' ∨ blank), min/max for numerics, and distinct counts for
keys — deliberately ONE scan per dataset (glue.py:87 notes this).

``exact_distinct=False`` uses HLL++ (approx_count_distinct, A8) like
the reference; ``True`` uses exact count(distinct) so the profile can
be verified against a SQL oracle.

Scale: the single-pass agg is a 1-row global aggregate — partial
aggregation reduces each partition to one row, so the shuffle is
O(partitions), independent of data size. HLL sketches keep distinct
counting O(1) memory per column at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.functions.cleaning import NULL_SENTINEL


def _nullish(col: str, sentinel: str) -> Column:
    """Nullish predicate: NULL, the literal sentinel, or blank
    (glue.py:90-96)."""
    c = F.col(col)
    return (
        c.isNull()
        | (c.cast("string") == F.lit(sentinel))
        | (F.length(F.trim(c.cast("string"))) == 0)
    )


def dq_profile(
    df: DataFrame,
    dataset: str,
    null_cols: Sequence[str] = (),
    numeric_cols: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
    run_date: str | None = None,
    sentinel: str = NULL_SENTINEL,
    exact_distinct: bool = False,
) -> DataFrame:
    """One-row profile DataFrame for ``df`` (single scan)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for c in null_cols:
        aggs.append(
            F.sum(F.when(_nullish(c, sentinel), 1).otherwise(0))
            .cast("long")
            .alias(f"null_{c}")
        )
    for c in numeric_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    for c in distinct_cols:
        if exact_distinct:
            aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"distinct_{c}"))
    out = df.agg(*aggs).select(F.lit(dataset).alias("dataset"), "*")
    if run_date is not None:
        out = out.withColumn("run_date", F.lit(run_date))
    return out


def dq_union(profiles: Sequence[DataFrame]) -> DataFrame:
    """Union differently-shaped profiles, missing columns → NULL
    (glue.py:347-350)."""
    it = iter(profiles)
    out = next(it)
    for p in it:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
