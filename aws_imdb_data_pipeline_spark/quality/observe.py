"""Zero-extra-scan pipeline metrics via Spark's Observation API.

The expectation gate (quality/expectations.py) answers "is this frame
acceptable" with its own aggregate jobs — fine at validation points,
but a 100 TB pipeline also wants COUNTERS on every write (rows in,
nulls seen, value sums for reconciliation) without paying a second
scan per counter. ``df.observe`` attaches named aggregate expressions
that are computed AS A SIDE EFFECT of whatever action already runs —
the write itself is the only pass over the data.

Batch: ``observed, obs = attach_metrics(df, ...); observed.write...;
obs.get`` — the metrics materialize with the action. Streaming: the
same ``observe`` call surfaces per-micro-batch metrics in
``StreamingQueryProgress.observedMetrics`` (same expressions, no
second pass per batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def standard_metrics(df: DataFrame, null_cols: list[str]) -> dict[str, Column]:
    """The counters every lake write wants: row count plus per-column
    null counts for ``null_cols`` (reconciliation + drift signals)."""
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in null_cols:
        out[f"n_null_{c}"] = F.count(F.when(F.col(c).isNull(), 1))
    return out


def attach_metrics(
    df: DataFrame, metrics: dict[str, Column], name: str = "metrics"
) -> tuple[DataFrame, Observation | None]:
    """Attach named aggregate metrics to ``df``. Returns the observed
    frame (use it in place of ``df`` for the action) and, for BATCH
    frames, the Observation — ``observation.get`` blocks until the
    FIRST action on the observed frame completes and returns
    ``{name: value}``.

    Streaming frames can't take an Observation object (Spark requires
    a string observation name there); the same expressions are
    attached under ``name`` and surface per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]`` — the returned
    observation is None.

    Either way the metrics ride the existing job — zero additional
    scans — which is exactly what the expectation gate cannot do (it
    must run its own jobs because it gates BEFORE the action)."""
    named = [expr.alias(n) for n, expr in metrics.items()]
    if df.isStreaming:
        return df.observe(name, *named), None
    obs = Observation()
    return df.observe(obs, *named), obs
