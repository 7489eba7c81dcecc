"""CDC changelog application (lifecycle.cdc): tombstone semantics,
the fold invariant (apply over any split == collapse over all), and
the no-snapshot-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.lifecycle.cdc import apply_changelog, latest_state


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, seq bigint, op string, v string"
    )


def test_latest_state_last_op_wins_and_deletes_drop(spark):
    log = _changelog(
        spark,
        [
            (1, 1, "I", "a"), (1, 2, "U", "b"),          # update wins
            (2, 1, "I", "x"), (2, 2, "D", None),          # deleted
            (3, 1, "I", "m"),                             # plain insert
            (4, 1, "I", "p"), (4, 2, "D", None), (4, 3, "I", "q"),  # re-insert
        ],
    )
    got = {r.k: r.v for r in latest_state(log, ["k"], ["seq"]).collect()}
    assert got == {1: "b", 3: "m", 4: "q"}


def test_latest_state_keep_tombstones(spark):
    log = _changelog(spark, [(2, 1, "I", "x"), (2, 2, "D", None)])
    rows = latest_state(log, ["k"], ["seq"], keep_tombstones=True).collect()
    assert len(rows) == 1 and rows[0].op == "D"


def test_apply_changelog_merge_semantics(spark):
    snapshot = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "x"), (3, 1, "m")], "k bigint, seq bigint, v string"
    )
    slice_ = _changelog(
        spark,
        [
            (2, 2, "D", None),      # delete an existing key
            (3, 2, "U", "m2"),      # update an existing key
            (9, 2, "I", "new"),     # insert a fresh key
        ],
    )
    got = {r.k: r.v for r in
           apply_changelog(snapshot, slice_, ["k"], ["seq"]).collect()}
    assert got == {1: "a", 3: "m2", 9: "new"}


def test_fold_invariant_any_split(spark, sf_dir):
    """Folding the events changelog in two arbitrary time-slices equals
    the one-pass collapse — for several split points."""
    from aws_imdb_data_pipeline_spark.plans.cdc import _as_changelog
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    ev = _as_changelog(load_table(spark, sf_dir, "events"))
    full = latest_state(ev, ["user_id"], ["ts", "event_id"])
    want = sorted((r.user_id, r.ts, r.value) for r in full.collect())
    for split in ("2024-02-01", "2024-06-15"):
        old = ev.filter(F.col("ts") < F.lit(split).cast("timestamp"))
        new = ev.filter(F.col("ts") >= F.lit(split).cast("timestamp"))
        snap = latest_state(old, ["user_id"], ["ts", "event_id"])
        merged = apply_changelog(snap, new, ["user_id"], ["ts", "event_id"])
        got = sorted((r.user_id, r.ts, r.value) for r in merged.collect())
        assert got == want, f"fold mismatch at split {split}"


def test_apply_changelog_broadcasts_touched_keys(spark):
    """The snapshot side must not shuffle: the anti-join on touched
    keys should be a broadcast join, so merge cost scales with the
    slice, not the snapshot."""
    snapshot = spark.range(0, 100_000).select(
        F.col("id").alias("k"), F.lit(1).alias("seq"), F.lit("v").alias("v")
    )
    slice_ = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(2).alias("seq"),
        F.lit("U").alias("op"), F.lit("w").alias("v"),
    )
    plan = apply_changelog(snapshot, slice_, ["k"], ["seq"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
