"""Top-k operators (W1, W2, O1, O2).

- ``top_n_per_group``: row_number over (partition, order) then rn <= n —
  the reference's cast-cap (glue.py:154-155) and top-25-per-genre-decade
  (marts_top_movies_by_genre.sql:3-19) pattern.
- ``top_k_global``: ORDER BY ... LIMIT k (docs/top_movies_by_rating.sql:15-18).

Scale notes: global top-k plans as TakeOrderedAndProject (per-partition
heap + driver merge of k rows — no full sort, no full shuffle).
Per-group top-n shuffles once on the partition keys; with AQE skew-join
splitting, a hot group (e.g. one brand with 10^9 rows) is handled by
partial top-n per map task only if n pushes into the window — Spark
>= 3.x applies WindowGroupLimit pushdown for rank/row_number filters,
which keeps the shuffle input bounded. Verify via .explain().
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-n rows per group by row_number (deterministic given a
    total order in ``order_by``)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
    return out if keep_rank else out.drop(rank_col)


def top_k_global(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global ORDER BY + LIMIT; Spark executes a real top-k
    (TakeOrderedAndProject), not a full sort."""
    return df.orderBy(*order_by).limit(k)
