"""CDC changelog queries: collapse-to-state and MERGE-style fold
(lifecycle.cdc). The events table plays the changelog: signup=insert,
error=delete tombstone, everything else=update, sequenced by
(ts, event_id).

The reference's only refresh strategy is a full staged reload; these
queries are the row-level-change path a 100 TB lake needs instead
(see lifecycle/cdc.py module docstring for the scale argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
    apply_changelog,
    latest_state,
    scd2_from_changelog,
)
from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import load_table

# Mid-span of the events table (all SFs span Jan 2024): both slices
# must be NON-EMPTY or the merge demo degenerates to a pass-through —
# round 5 found the prior 2024-03-01 split left the "new" slice empty.
_SPLIT = "2024-01-15"

# shared oracle body: collapse the whole events changelog to state
_LATEST_STATE_SQL = """
    WITH ranked AS (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           ts AS last_ts,
           event_type AS last_event_type,
           value AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
"""


def _as_changelog(ev: DataFrame) -> DataFrame:
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )


def _present(state: DataFrame) -> DataFrame:
    return state.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@register(
    "cdc_user_latest_state",
    oracle=_LATEST_STATE_SQL,
    operators=("L-cdc", "W1", "P2"),
)
def cdc_user_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current state: last op per user wins, users whose
    final op is the delete tombstone disappear. One shuffle on the key
    (lifecycle.cdc.latest_state window)."""
    ev = _as_changelog(load_table(spark, sf_dir, "events"))
    return _present(latest_state(ev, ["user_id"], ["ts", "event_id"]))


@register(
    "cdc_apply_changelog",
    oracle=_LATEST_STATE_SQL,
    operators=("L-cdc", "J-anti", "U1", "W1"),
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a changelog slice into a prior snapshot and land on the
    same state a full collapse gives (the fold invariant — the oracle
    is the whole-changelog collapse). Snapshot side is never shuffled:
    anti-join on the slice's touched keys + union."""
    ev = _as_changelog(load_table(spark, sf_dir, "events"))
    old = ev.filter(F.col("ts") < F.lit(_SPLIT).cast("timestamp"))
    new = ev.filter(F.col("ts") >= F.lit(_SPLIT).cast("timestamp"))
    snapshot = latest_state(old, ["user_id"], ["ts", "event_id"])
    merged = apply_changelog(snapshot, new, ["user_id"], ["ts", "event_id"])
    return _present(merged)


@register(
    "cdc_apply_out_of_order",
    oracle=_LATEST_STATE_SQL,
    operators=("L-cdc", "J-anti", "J-semi", "U1", "W1"),
)
def cdc_apply_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay safety: MERGE a STALE slice (everything before the
    split) into the already-complete snapshot with seq-aware
    resolution — the state must come out unchanged (oracle = the full
    collapse). The naive fast path would regress every replayed key
    to its pre-split value; resolve_by_seq compares (ts, event_id)
    per touched key and keeps the newer snapshot row, with retained
    delete tombstones guarding against resurrecting users whose
    final op is the delete. Snapshot side still never shuffles
    (broadcast semi/anti joins on slice-derived keys)."""
    ev = _as_changelog(load_table(spark, sf_dir, "events"))
    snapshot = latest_state(
        ev, ["user_id"], ["ts", "event_id"], keep_tombstones=True
    )
    stale = ev.filter(F.col("ts") < F.lit(_SPLIT).cast("timestamp"))
    merged = apply_changelog(
        snapshot, stale, ["user_id"], ["ts", "event_id"], resolve_by_seq=True
    )
    return _present(merged.filter(F.col("op") != "D").drop("op"))


@register(
    "cdc_scd2_history",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               event_type <> 'error' AS live,
               CASE WHEN event_type <> 'error' THEN event_type END
                   AS event_type,
               CASE WHEN event_type <> 'error' THEN value END AS value
        FROM events
    ), marked AS (
        SELECT *,
               lag(live)       OVER w AS p_live,
               lag(event_type) OVER w AS p_et,
               lag(value)      OVER w AS p_val
        FROM log
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), kept AS (
        SELECT * FROM marked
        WHERE live IS DISTINCT FROM p_live
           OR event_type IS DISTINCT FROM p_et
           OR value IS DISTINCT FROM p_val
    ), iv AS (
        SELECT user_id, live, event_type, value, event_id,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM kept
    )
    SELECT user_id, event_type, value, valid_from, valid_to,
           valid_to IS NULL AS is_current,
           CAST(row_number() OVER (
               PARTITION BY user_id
               ORDER BY valid_from, event_id) AS INTEGER)
               AS version
    FROM iv WHERE live
    """,
    operators=("L-cdc", "L-scd2", "W4", "W2"),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → full SCD2 HISTORY (lifecycle.cdc.scd2_from_changelog):
    validity intervals per user over (event_type, value) state, deletes
    (the error tombstone) CLOSING intervals, re-inserts opening new ones
    even at an unchanged value, versions counting live intervals only.
    The warehouse-history form the reference's staged DELETE+INSERT
    reload cannot express — it overwrites, so prior attribute values
    are lost. One hash shuffle on the key (all windows share the key
    partitioning); replay-safe (same history for re-delivered or
    out-of-order slices — property-tested in tests/test_cdc.py)."""
    ev = _as_changelog(load_table(spark, sf_dir, "events"))
    return scd2_from_changelog(
        ev,
        keys=["user_id"],
        seq_cols=["ts", "event_id"],
        attr_cols=["event_type", "value"],
    )


@register(
    "ivm_event_type_stats",
    oracle="""
    WITH ranked AS (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    state AS (
        SELECT user_id, event_type, value
        FROM ranked WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT event_type,
           COUNT(*) AS n_keys,
           ROUND(SUM(value), 4) AS sum_value
    FROM state GROUP BY event_type
    """,
    operators=("L-cdc", "L-ivm", "A2", "J-full", "U1"),
)
def ivm_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained grouped aggregate (lifecycle.ivm): the
    per-event-type (live users, value sum) VIEW is built from the
    pre-split state, then brought current by merging the ±1 state-
    transition deltas of the post-split slice — never recomputed from
    full state. The oracle IS the from-scratch recompute (full
    changelog collapse, then aggregate), so the driver hash-match
    verifies the IVM identity: base ⊕ Δ == recompute. Maintenance
    cost is O(slice + touched keys + |groups|); the snapshot is
    probe-side of broadcast joins throughout (apply_changelog's
    contract), and the final merge joins two group-cardinality
    frames."""
    from aws_imdb_data_pipeline_spark.lifecycle.ivm import (
        grouped_state_agg,
        maintain_grouped_agg,
        state_transition_deltas,
    )

    ev = _as_changelog(load_table(spark, sf_dir, "events"))
    old = ev.filter(F.col("ts") < F.lit(_SPLIT).cast("timestamp"))
    new = ev.filter(F.col("ts") >= F.lit(_SPLIT).cast("timestamp"))
    snapshot = latest_state(old, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    base = grouped_state_agg(snapshot, ["event_type"], "value")
    deltas = state_transition_deltas(
        snapshot, new, ["user_id"], ["ts", "event_id"]
    )
    view = maintain_grouped_agg(base, deltas, ["event_type"], "value")
    return view.select(
        "event_type",
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.round("sum_value", 4).alias("sum_value"),
    )
