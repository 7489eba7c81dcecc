"""Preferential pick: the DAX COALESCE-of-measures pattern as one
relational operator.

The reference's Power BI measure layer (README.md:152-161) expresses
per-entity values as ordered fallback chains — "prefer S1E1 pilot with
a rating; else any S1 pilot; else S1E1 rated; else earliest rated;
else 0". In DAX that is nested COALESCE(CALCULATE(...)); relationally
it is: union the candidate tiers with a preference rank, take the
best-ranked row per key, left-join back to the entity dim and default.

Scale: the union is narrow (key + ordering + value columns) and the
pick is ONE window shuffle on the key — no per-tier joins, no driver
loops; tiers share the input scan when they come from the same frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pick_best(
    tagged: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    value_cols: list[str],
    keys: DataFrame | None,
    defaults: dict[str, float] | None,
) -> DataFrame:
    """Shared tail of both pick forms: per key the (pref, order_by)
    argmin of a ``__pref``-tagged frame, then the optional left-join
    back to the entity dim with COALESCE'd defaults."""
    cols = key_cols + value_cols
    w = Window.partitionBy(*key_cols).orderBy(F.col("__pref"), *order_by)
    best = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*cols)
    )
    if keys is None:
        return best
    out = keys.join(best, key_cols, "left")
    for c in value_cols:
        if defaults and c in defaults:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(defaults[c])))
    return out


def preferential_pick(
    tiers: list[DataFrame],
    key_cols: list[str],
    order_by: list[Column],
    value_cols: list[str],
    keys: DataFrame | None = None,
    defaults: dict[str, float] | None = None,
) -> DataFrame:
    """Per key, the first row of the first non-empty tier.

    Each tier DataFrame must carry ``key_cols``, the columns referenced
    by ``order_by``, and ``value_cols``. Rows from tier *i* beat every
    row from tier *i+1*; within a tier, ``order_by`` decides (make it
    total — include a unique id — for deterministic output).

    With ``keys`` (an entity dim), keys matched by no tier still appear,
    with ``defaults`` (or NULL) for each value column — the COALESCE-
    to-zero tail of the DAX pattern.

    When every tier is a filter of ONE frame, prefer
    :func:`preferential_pick_predicates` — same semantics, no union
    fan-out (one scan instead of one subtree per tier).
    """
    tagged = None
    base_cols: list[str] = []
    for i, t in enumerate(tiers):
        tt = t.withColumn("__pref", F.lit(i))
        if tagged is None:
            base_cols = tt.columns
            tagged = tt
        else:  # every tier must carry the first tier's columns
            tagged = tagged.unionByName(tt.select(*base_cols))
    return _pick_best(tagged, key_cols, order_by, value_cols, keys, defaults)


def preferential_pick_predicates(
    df: DataFrame,
    preds: list[Column],
    key_cols: list[str],
    order_by: list[Column],
    value_cols: list[str],
    keys: DataFrame | None = None,
    defaults: dict[str, float] | None = None,
) -> DataFrame:
    """``preferential_pick([df.filter(p) for p in preds], ...)`` without
    the union, for the common case where every tier is a predicate over
    ONE frame.

    Equivalence: in the union form a row satisfying predicates
    {i, j, ...} appears once per satisfied tier, tagged with each tier
    index; the per-key (pref, order_by) argmin can only ever select its
    MINIMUM tag (any higher-tagged copy is beaten by the lower-tagged
    copy of the same row). So tagging each row ONCE with its first
    satisfied predicate — a first-match-wins CASE — picks the identical
    winner. Rows satisfying no predicate are dropped, exactly as the
    union drops them.

    Plan consequence: one scan + one window shuffle, versus one input
    subtree per tier + union (which tempts callers into persist() pins
    that outlive the query — the round-8 bench-regression suspect)."""
    expr = None
    for i, p in enumerate(preds):
        expr = F.when(p, F.lit(i)) if expr is None else expr.when(p, F.lit(i))
    tagged = df.withColumn("__pref", expr).filter(F.col("__pref").isNotNull())
    return _pick_best(tagged, key_cols, order_by, value_cols, keys, defaults)
