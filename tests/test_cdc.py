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
    for split in ("2024-01-10", "2024-01-20"):
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


def test_apply_changelog_seq_aware_replay_and_out_of_order(spark):
    """resolve_by_seq: a stale/duplicated slice cannot regress newer
    state, deletes are guarded by retained tombstones, tie goes to the
    snapshot, and genuinely newer slice rows still apply."""
    # snapshot with tombstones: k=1 live@3, k=2 deleted@4, k=3 live@2
    snapshot = spark.createDataFrame(
        [(1, 3, "U", "a3"), (2, 4, "D", None), (3, 2, "U", "m2")],
        "k bigint, seq bigint, op string, v string",
    )
    slice_ = _changelog(
        spark,
        [
            (1, 2, "U", "a2"),     # stale update -> ignored
            (2, 3, "I", "x3"),     # stale insert on deleted key -> no resurrect
            (3, 2, "U", "tie"),    # tie -> snapshot wins
            (3, 5, "U", "m5"),     # newer update -> applies
            (9, 1, "I", "new"),    # fresh key -> applies
        ],
    )
    merged = apply_changelog(
        snapshot, slice_, ["k"], ["seq"], resolve_by_seq=True
    )
    got = {r.k: (r.seq, r.op, r.v) for r in merged.collect()}
    assert got == {
        1: (3, "U", "a3"),
        2: (4, "D", None),   # tombstone retained, not resurrected
        3: (5, "U", "m5"),
        9: (1, "I", "new"),
    }
    # applying the SAME slice again is a no-op (idempotent replay)
    again = apply_changelog(
        merged, slice_, ["k"], ["seq"], resolve_by_seq=True
    )
    got2 = {r.k: (r.seq, r.op, r.v) for r in again.collect()}
    assert got2 == got


def test_seq_aware_fold_invariant_overlapping_slices(spark, sf_dir):
    """Seq-aware fold over OVERLAPPING, out-of-order slices still lands
    on the one-pass collapse: apply(collapse(A, tombstones), B) ==
    collapse(A ∪ B) even when B ⊂ earlier data or B duplicates A."""
    from aws_imdb_data_pipeline_spark.plans.cdc import _as_changelog
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    ev = _as_changelog(load_table(spark, sf_dir, "events"))
    keys, seq = ["user_id"], ["ts", "event_id"]
    full = latest_state(ev, keys, seq)
    want = sorted((r.user_id, r.ts, r.value) for r in full.collect())
    split = F.lit("2024-01-15").cast("timestamp")
    old = ev.filter(F.col("ts") < split)
    # slices arrive newest-first AND the old slice overlaps everything
    snap = latest_state(ev.filter(F.col("ts") >= split), keys, seq,
                        keep_tombstones=True)
    merged = apply_changelog(snap, old, keys, seq, resolve_by_seq=True)
    merged = apply_changelog(merged, ev, keys, seq, resolve_by_seq=True)
    state = merged.filter(F.col("op") != "D").drop("op")
    got = sorted((r.user_id, r.ts, r.value) for r in state.collect())
    assert got == want


def test_compact_tombstones_gc_and_replay_safety(spark):
    """Tombstones below the replay horizon are dropped, those at/above
    it survive, live rows are untouched — and the compacted snapshot
    still rejects a replayed slice that is NEWER than the horizon."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import compact_tombstones

    snap = spark.createDataFrame(
        [(1, 9, "U", "a"), (2, 3, "D", None), (3, 7, "D", None)],
        "k bigint, seq bigint, op string, v string",
    )
    out = {r.k: r.op for r in
           compact_tombstones(snap, ["seq"], [5]).collect()}
    assert out == {1: "U", 3: "D"}  # seq-3 tombstone GC'd, seq-7 kept
    # a replay at seq 6 (>= horizon 5) on key 3 must still be blocked
    compacted = compact_tombstones(snap, ["seq"], [5])
    stale = _changelog(spark, [(3, 6, "I", "zombie")])
    merged = apply_changelog(compacted, stale, ["k"], ["seq"],
                             resolve_by_seq=True)
    rows = {r.k: (r.seq, r.op) for r in merged.collect()}
    assert rows[3] == (7, "D")  # tombstone newer than replay -> wins


def test_incremental_band_index_join_is_broadcast(spark, sf_dir, tmp_path):
    """The incremental near-dup plan must broadcast the BATCH side
    against the corpus band index (never shuffle the index) — the plan
    shape the 100 TB claim rests on."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        build_minhash_band_index,
        incremental_near_dup_pairs,
    )
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter("doc_id % 7 = 0").select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    path = str(tmp_path / "bands")
    build_minhash_band_index(docs, "doc_id", "text", path)
    plan = (
        incremental_near_dup_pairs(batch, docs, path, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_scd2_from_changelog_semantics(spark):
    """Interval algebra: dup states collapse, deletes CLOSE intervals,
    re-insert at the SAME value opens a new interval, versions count
    live intervals only."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        scd2_from_changelog,
    )

    log = _changelog(
        spark,
        [
            (1, 1, "I", "a"), (1, 2, "U", "a"),   # dup state collapses
            (1, 3, "U", "b"),                      # change
            (2, 1, "I", "x"), (2, 2, "D", None),   # delete closes
            (2, 3, "I", "x"),                      # re-insert SAME value
            (3, 1, "D", None),                     # delete of unknown key
            (4, 1, "I", "p"), (4, 2, "D", None),   # ends deleted
        ],
    )
    hist = {
        (r.k, r.version): (r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_from_changelog(
            log, keys=["k"], seq_cols=["seq"], attr_cols=["v"]
        ).collect()
    }
    assert hist == {
        (1, 1): ("a", 1, 3, False),
        (1, 2): ("b", 3, None, True),
        (2, 1): ("x", 1, 2, False),   # closed by the delete
        (2, 2): ("x", 3, None, True),  # NEW interval despite same value
        (4, 1): ("p", 1, 2, False),    # final delete -> not current
    }
    # key 3 (delete-only) emits nothing
    assert not any(k == 3 for k, _ in hist)


def test_scd2_from_changelog_replay_safe(spark):
    """History is a pure function of the changelog SET: duplicating a
    random slice, re-delivering it, and arbitrary physical order all
    yield bit-identical history."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        scd2_from_changelog,
    )

    rows = [
        (k, s, op, v)
        for k in range(1, 8)
        for s, (op, v) in enumerate(
            [("I", f"a{k}"), ("U", f"a{k}"), ("U", f"b{k}"),
             ("D", None), ("I", f"b{k}")][: (k % 5) + 1],
            start=1,
        )
    ]
    log = _changelog(spark, rows)
    replayed = (
        log.unionAll(log.sample(0.5, seed=7))   # duplicate delivery
        .unionAll(log.filter(F.col("seq") >= 2))  # a re-shipped slice
        .repartition(7)                            # arbitrary order
    )

    def canon(df):
        return sorted(map(tuple, df.collect()))

    a = canon(scd2_from_changelog(log, ["k"], ["seq"], ["v"]))
    b = canon(scd2_from_changelog(replayed, ["k"], ["seq"], ["v"]))
    assert a == b and len(a) > 0


def test_scd2_from_changelog_one_key_shuffle(spark):
    """Plan shape: the whole history build hash-partitions on the key
    struct once — window exchanges beyond the first are reused."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        scd2_from_changelog,
    )

    log = _changelog(spark, [(1, 1, "I", "a"), (1, 2, "U", "b")])
    plan = (
        scd2_from_changelog(log, ["k"], ["seq"], ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    # exchanges on data (hash) — createDataFrame scans aside, the
    # window chain must not introduce a second distinct hash exchange
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1


def test_ivm_maintained_view_equals_recompute(spark):
    """base ⊕ Δ == from-scratch aggregate of the merged state, for
    counts exactly and sums to float tolerance (delta path changes
    only summation order)."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        apply_changelog,
        latest_state,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.ivm import (
        grouped_state_agg,
        maintain_grouped_agg,
        state_transition_deltas,
    )

    base_log = _changelog(
        spark,
        [(1, 1, "I", "a"), (2, 1, "I", "a"), (3, 1, "I", "b"),
         (4, 1, "I", "b"), (5, 1, "I", "c")],
    )
    slice_log = _changelog(
        spark,
        [(1, 2, "U", "b"),   # a -> b move
         (2, 2, "D", None),  # delete: a loses a member
         (5, 2, "D", None),  # c group empties entirely
         (6, 2, "I", "a")],  # brand-new key
    )
    snapshot = latest_state(base_log, ["k"], ["seq"])
    base = grouped_state_agg(snapshot, ["v"], "seq", "n_keys", "sum_seq")
    deltas = state_transition_deltas(snapshot, slice_log, ["k"], ["seq"])
    got = {
        r.v: (r.n_keys, r.sum_seq)
        for r in maintain_grouped_agg(
            base, deltas, ["v"], "seq", "n_keys", "sum_seq"
        ).collect()
    }
    full = apply_changelog(snapshot, slice_log, ["k"], ["seq"])
    want = {
        r.v: (r.n_keys, r.sum_seq)
        for r in grouped_state_agg(
            full, ["v"], "seq", "n_keys", "sum_seq"
        ).collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert abs(got[g][1] - want[g][1]) < 1e-9
    # group 'c' emptied: must be ABSENT, not present with n=0
    assert "c" not in got


def test_ivm_null_group_and_null_sum_exactness(spark):
    """The two NULL fronts the merge must get SQL-exact (round-8
    advice): a NULL group KEY is one group (null-safe join — not two
    half-rows), and a group whose surviving values are all NULL has
    SUM NULL — not 0.0 — even when a retraction drains the last
    non-null value. Oracle = from-scratch recompute."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        apply_changelog,
        latest_state,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.ivm import (
        grouped_state_agg,
        maintain_grouped_agg,
        state_transition_deltas,
    )

    schema = "k int, seq int, op string, g string, x double"
    base_log = spark.createDataFrame(
        [
            (1, 1, "I", None, 1.0),   # NULL group, the only non-null x
            (2, 1, "I", None, None),
            (3, 1, "I", "a", 5.0),    # group a's only non-null x
            (4, 1, "I", "a", None),
        ],
        schema,
    )
    slice_log = spark.createDataFrame(
        [
            (1, 2, "D", None, None),   # NULL group: sum must go NULL
            (3, 2, "U", "a", None),    # a: last non-null drained -> NULL
            (5, 2, "I", None, 2.0),    # NULL group gains a value again
        ],
        schema,
    )
    snapshot = latest_state(base_log, ["k"], ["seq"])
    base = grouped_state_agg(snapshot, ["g"], "x")
    deltas = state_transition_deltas(snapshot, slice_log, ["k"], ["seq"])
    got = {
        r.g: (r.n_keys, r.sum_value, r.n_vals)
        for r in maintain_grouped_agg(base, deltas, ["g"], "x").collect()
    }
    full = apply_changelog(snapshot, slice_log, ["k"], ["seq"])
    want = {
        r.g: (r.n_keys, r.sum_value, r.n_vals)
        for r in grouped_state_agg(full, ["g"], "x").collect()
    }
    assert got == want
    # pin the interesting shapes, not just merge==recompute:
    assert got["a"] == (2, None, 0)      # all-NULL group -> SUM NULL
    assert got[None] == (2, 2.0, 1)      # ONE merged NULL-key group


def test_ivm_legacy_view_without_n_vals_migrates(spark):
    """A `view` parquet committed BEFORE the n_vals column existed must
    still restart (round-9 advice): maintain_grouped_agg reconstructs
    n_vals from the legacy columns (NULL sum -> 0 non-null values, else
    count) instead of failing with an unresolved-column error. For
    groups that never mixed NULL and non-NULL values the reconstruction
    is exact — merge == from-scratch recompute."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        apply_changelog,
        latest_state,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.ivm import (
        grouped_state_agg,
        maintain_grouped_agg,
        state_transition_deltas,
    )

    schema = "k int, seq int, op string, g string, x double"
    base_log = spark.createDataFrame(
        [
            (1, 1, "I", "a", 1.0),
            (2, 1, "I", "a", 2.0),
            (3, 1, "I", "b", None),  # all-NULL group in the legacy view
        ],
        schema,
    )
    slice_log = spark.createDataFrame(
        [(2, 2, "D", None, None), (4, 2, "I", "b", 7.0)], schema
    )
    snapshot = latest_state(base_log, ["k"], ["seq"])
    legacy = grouped_state_agg(snapshot, ["g"], "x").drop("n_vals")
    deltas = state_transition_deltas(snapshot, slice_log, ["k"], ["seq"])
    got = {
        r.g: (r.n_keys, r.sum_value, r.n_vals)
        for r in maintain_grouped_agg(legacy, deltas, ["g"], "x").collect()
    }
    full = apply_changelog(snapshot, slice_log, ["k"], ["seq"])
    want = {
        r.g: (r.n_keys, r.sum_value, r.n_vals)
        for r in grouped_state_agg(full, ["g"], "x").collect()
    }
    assert got == want
    assert got["b"] == (2, 7.0, 1)  # NULL-sum legacy group gains a value


def test_ivm_untouched_keys_emit_no_deltas(spark):
    """Delta volume ∝ slice: keys the slice never mentions produce
    zero delta rows (the snapshot is probed, never re-emitted)."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import latest_state
    from aws_imdb_data_pipeline_spark.lifecycle.ivm import (
        state_transition_deltas,
    )

    base_log = _changelog(
        spark, [(i, 1, "I", "a") for i in range(1, 50)]
    )
    slice_log = _changelog(spark, [(1, 2, "U", "b")])
    snapshot = latest_state(base_log, ["k"], ["seq"])
    deltas = state_transition_deltas(snapshot, slice_log, ["k"], ["seq"])
    rows = deltas.collect()
    assert {r.k for r in rows} == {1}
    assert sorted((r.v, r["__mult"]) for r in rows) == [("a", -1), ("b", 1)]
