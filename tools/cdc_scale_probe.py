"""CDC apply at scale: wall-clock for folding a small changelog slice
into a large snapshot, vs recomputing state from the full changelog —
the claim under test is lifecycle/cdc.py's: merge cost scales with the
SLICE (snapshot is probe-side of a broadcast anti-join, never
shuffled), so apply beats recompute by the snapshot/slice ratio.

Synthetic data is a pure function of spark.range ids (no driver-side
rows): a snapshot of N keys and a slice touching N/500 keys (80%
updates / 10% deletes / 10% inserts).

Usage: python tools/cdc_scale_probe.py [n_keys ...]  (default 10M 50M)
       python tools/cdc_scale_probe.py --scd2 [n_rows ...]  (default 10M 100M)
       python tools/cdc_scale_probe.py --ivm  [n_keys ...]  (default 10M 50M)
Prints one JSON line per size.

--ivm probes lifecycle.ivm (round 8): maintain a grouped COUNT/SUM
view from a slice touching n/500 keys via state-transition deltas, vs
recomputing the aggregate from the merged full state. The claim under
test: maintenance cost ∝ slice + |groups| (snapshot probe-side of
broadcast joins, full state never reshuffled).

--scd2 probes scd2_from_changelog (round 8): a changelog of n_rows
(R=5 versions per key; ~1/3 of versions change state, ~1/11 delete)
built as a pure function of spark.range. Measures the full-history
build, asserts its ONE-key-shuffle plan (the dedup lag runs under the
same partitioning as the compression windows — no second exchange),
and compares against the snapshot-diff alternative the docstring
argues against: R-1 FULL OUTER joins of consecutive key-level
snapshots, each shuffling two full snapshots."""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.lifecycle.cdc import apply_changelog  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def scd2_probe(spark, sizes: list[int]) -> None:
    import re

    from aws_imdb_data_pipeline_spark.lifecycle.cdc import scd2_from_changelog

    R = 5
    for n in sizes:
        keys = n // R
        # changelog: R versions per key; state changes on ~1/3 of
        # versions (the rest collapse as consecutive duplicates);
        # ~1/11 of observations are deletes that close intervals
        log = spark.range(n).select(
            (F.col("id") % keys).alias("k"),
            (F.col("id") / keys).cast("long").alias("seq"),
            F.when(
                (F.col("id") % keys + F.col("id") / keys).cast("long") % 11
                == 0,
                F.lit("D"),
            )
            .otherwise(F.lit("U"))
            .alias("op"),
            (
                (F.col("id") % keys + (F.col("id") / keys).cast("long") / 2)
                % 3
            ).cast("long").alias("v"),
        )
        # sparse form: a real CDC feed captures only CHANGED rows —
        # keep ~1/3 of observations (state transitions) + deletes.
        # The dense log above is the changelog worst case (every key
        # re-observed every refresh, most rows collapsing as
        # consecutive duplicates).
        sparse = log.filter(
            ((F.col("k") + F.col("seq")) % 3 == 0) | (F.col("op") == "D")
        )
        hist = scd2_from_changelog(log, ["k"], ["seq"], ["v"])
        plan = hist._jdf.queryExecution().executedPlan().toString()
        n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
        t0 = time.perf_counter()
        hist.write.format("noop").mode("overwrite").save()
        scd2_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        scd2_from_changelog(sparse, ["k"], ["seq"], ["v"]).write.format(
            "noop"
        ).mode("overwrite").save()
        scd2_sparse_s = round(time.perf_counter() - t0, 2)

        # the snapshot-diff alternative: per refresh, FULL OUTER join
        # consecutive key-level snapshots to find opens/closes/changes
        def snap(t):
            s = spark.range(keys).select(
                F.col("id").alias("k"),
                ((F.col("id") + F.lit(t) / 2) % 3).cast("long").alias("v"),
            )
            return s.filter((F.col("k") + F.lit(t)) % 11 != 0)

        t0 = time.perf_counter()
        for t in range(1, R):
            prev, cur = snap(t - 1), snap(t)
            diff = prev.join(cur, "k", "full_outer").filter(
                prev["v"].isNull()
                | cur["v"].isNull()
                | (prev["v"] != cur["v"])
            )
            diff.write.format("noop").mode("overwrite").save()
        diff_s = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "mode": "scd2",
                    "n_rows": n,
                    "n_keys": keys,
                    "refreshes": R,
                    "scd2_dense_sec": scd2_s,
                    "scd2_sparse_sec": scd2_sparse_s,
                    "snapshot_diff_sec": diff_s,
                    "sparse_speedup": round(diff_s / scd2_sparse_s, 1)
                    if scd2_sparse_s
                    else None,
                    "scd2_hash_exchanges": n_exch,
                }
            ),
            flush=True,
        )


def ivm_probe(spark, sizes: list[int]) -> None:
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import apply_changelog
    from aws_imdb_data_pipeline_spark.lifecycle.ivm import (
        grouped_state_agg,
        maintain_grouped_agg,
        state_transition_deltas,
    )

    for n in sizes:
      for n_groups in (1000, n // 10):
        # snapshot: n live keys; slice touches n/500. Two view
        # cardinalities: 1000 groups (map-side combine collapses the
        # recompute to a near-free scan — IVM's worst case) and n/10
        # groups (the recompute must shuffle an n/10-row aggregate —
        # the regime IVM exists for).
        snapshot = spark.range(n).select(
            F.col("id").alias("k"),
            F.lit(1).alias("seq"),
            (F.col("id") % n_groups).alias("g"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        n_slice = n // 500
        slice_ = spark.range(n_slice).select(
            (F.col("id") * 500).alias("k"),
            F.lit(2).alias("seq"),
            F.when(F.col("id") % 10 == 8, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            ((F.col("id") + 7) % n_groups).alias("g"),
            F.lit(3.5).alias("v"),
        )
        # the base view is PERSISTED state from the prior cycle — it
        # must not be recomputed inside the maintenance timing
        import tempfile

        base_dir = tempfile.mkdtemp(prefix="ivm_probe_base_")
        grouped_state_agg(snapshot, ["g"], "v").write.mode(
            "overwrite"
        ).parquet(base_dir)
        base = spark.read.parquet(base_dir)
        t0 = time.perf_counter()
        deltas = state_transition_deltas(snapshot, slice_, ["k"], ["seq"])
        maintain_grouped_agg(base, deltas, ["g"], "v").write.format(
            "noop"
        ).mode("overwrite").save()
        ivm_s = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        full = apply_changelog(snapshot, slice_, ["k"], ["seq"])
        grouped_state_agg(full, ["g"], "v").write.format("noop").mode(
            "overwrite"
        ).save()
        rec_s = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "mode": "ivm",
                    "n_keys": n,
                    "n_slice": n_slice,
                    "n_groups": n_groups,
                    "maintain_sec": ivm_s,
                    "recompute_sec": rec_s,
                    "speedup": round(rec_s / ivm_s, 1) if ivm_s else None,
                }
            ),
            flush=True,
        )


def main() -> None:
    args = list(sys.argv[1:])
    if "--ivm" in args:
        args.remove("--ivm")
        spark = get_spark("cdc-probe")
        spark.sparkContext.setLogLevel("ERROR")
        ivm_probe(spark, [int(a) for a in args] or [10_000_000, 50_000_000])
        return
    if "--scd2" in args:
        args.remove("--scd2")
        spark = get_spark("cdc-probe")
        spark.sparkContext.setLogLevel("ERROR")
        scd2_probe(spark, [int(a) for a in args] or [10_000_000, 100_000_000])
        return
    sizes = [int(a) for a in args] or [10_000_000, 50_000_000]
    spark = get_spark("cdc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        snapshot = spark.range(n).select(
            F.col("id").alias("k"),
            F.lit(1).alias("seq"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        n_slice = n // 500
        # touch every 500th key; op mix by residue
        slice_ = spark.range(n_slice).select(
            (F.col("id") * 500 + (F.col("id") % 10 == 9).cast("long") * n).alias(
                "k"
            ),  # residue 9 → brand-new key (id*500+n)
            F.lit(2).alias("seq"),
            F.when(F.col("id") % 10 == 8, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.lit(-1.0).alias("v"),
        )
        t0 = time.perf_counter()
        merged = apply_changelog(snapshot, slice_, ["k"], ["seq"])
        merged.write.format("noop").mode("overwrite").save()
        apply_s = round(time.perf_counter() - t0, 2)

        # the full-recompute strawman: re-collapse snapshot ∪ slice as
        # one changelog (what a full refresh effectively pays)
        from aws_imdb_data_pipeline_spark.lifecycle.cdc import latest_state

        full_log = snapshot.withColumn("op", F.lit("I")).unionByName(slice_)
        t0 = time.perf_counter()
        latest_state(full_log, ["k"], ["seq"]).write.format("noop").mode(
            "overwrite"
        ).save()
        recompute_s = round(time.perf_counter() - t0, 2)

        plan = (
            apply_changelog(snapshot, slice_, ["k"], ["seq"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        print(
            json.dumps(
                {
                    "n_keys": n,
                    "n_slice": n_slice,
                    "apply_sec": apply_s,
                    "recompute_sec": recompute_s,
                    "speedup": round(recompute_s / apply_s, 1),
                    "anti_join_broadcast": "BroadcastHashJoin" in plan
                    and "LeftAnti" in plan,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
