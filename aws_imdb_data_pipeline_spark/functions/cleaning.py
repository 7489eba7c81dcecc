r"""Null-sentinel normalization, tolerant casts, CASE banding (P6-P9).

Reference patterns re-expressed as composable Column functions:
- ``when(col != '\N', col).otherwise(None).cast(T)``
  (glue.py:130-131,148,210-211,239-240)
- Snowflake ``TRY_TO_NUMBER`` / ``NULLIF`` (batch.py:228-239)
- ``COALESCE(TRY_TO_NUMBER(x), IFF(LOWER(x)='true',1,0))``
  (batch.py:268-273)
- ``VOTE_BUCKET`` / ``RATING_BAND`` CASE chains
  (airflow/dags/dbt/models/marts/movie_facts_anl.sql:27-40)

All stay inside Catalyst (no Python UDFs) so they codegen and push down.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = r"\N"


def null_sentinel_cast(
    col: Column | str, dtype: str, sentinel: str = NULL_SENTINEL
) -> Column:
    """``'\\N'``/empty/whitespace → NULL, then cast.

    Mirrors the reference's nullish predicate (glue.py:90-96): a value
    is nullish if NULL, the sentinel, or blank after trim.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.when(
        c.isNull() | (c == F.lit(sentinel)) | (F.length(F.trim(c)) == 0), F.lit(None)
    ).otherwise(c)
    # try_cast: malformed → NULL. Matches the reference's Spark-3
    # non-ANSI cast semantics; plain .cast raises under ANSI (Spark 4).
    return cleaned.try_cast(dtype)


def try_cast(col: Column | str, dtype: str) -> Column:
    """Tolerant cast: malformed input → NULL instead of error
    (Snowflake TRY_TO_NUMBER/TRY_TO_DOUBLE, batch.py:228-239)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def coalesce_bool_as_int(col: Column | str) -> Column:
    """Numeric-or-boolean tolerance: number if parseable, else
    'true'/'false' → 1/0 (batch.py:268-273)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        c.try_cast("int"),
        F.when(F.lower(c) == "true", F.lit(1))
        .when(F.lower(c) == "false", F.lit(0))
        .otherwise(F.lit(None)),
    )


def banding(
    col: Column | str,
    bounds: Sequence[float],
    labels: Sequence[str],
    null_label: str | None = None,
) -> Column:
    """Chained CASE banding: value >= bounds[i] (descending) → labels[i],
    else labels[-1] (movie_facts_anl.sql:27-40).

    ``bounds`` has one fewer element than ``labels``; bounds must be in
    descending order so the first match wins, like the SQL CASE.
    """
    if len(labels) != len(bounds) + 1:
        raise ValueError("need len(labels) == len(bounds) + 1")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for bound, label in zip(bounds, labels[:-1]):
        branch = (c >= F.lit(bound), F.lit(label))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    expr = expr.otherwise(F.lit(labels[-1])) if expr is not None else F.lit(labels[-1])
    if null_label is not None:
        expr = F.when(c.isNull(), F.lit(null_label)).otherwise(expr)
    return expr
