"""Latest-run selection (J5, A12, L1).

The reference's consumers pick the newest run_date slice via a
``CROSS JOIN (SELECT max(run_key) ...)`` + equality filter
(marts_movie_facts_view.sql:9-16) or a scalar-subquery macro
(imdb_analytics/macros/latest_run_date.sql:1-3), because Athena hides
the physical partition column behind ``$path`` regexes.

Spark exposes partition columns natively, so the idiomatic form is a
1-row aggregate cross-joined and filtered — Catalyst broadcasts the
1-row side, and when the filter lands on a partition column, dynamic
partition pruning skips the stale slices entirely at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_run_filter(df: DataFrame, run_col: str = "run_date") -> DataFrame:
    """Keep only rows whose ``run_col`` equals the global max."""
    latest = df.agg(F.max(run_col).alias("__latest_run"))
    return (
        df.crossJoin(F.broadcast(latest))
        .filter(F.col(run_col) == F.col("__latest_run"))
        .drop("__latest_run")
    )
