"""CDC apply at scale: wall-clock for folding a small changelog slice
into a large snapshot, vs recomputing state from the full changelog —
the claim under test is lifecycle/cdc.py's: merge cost scales with the
SLICE (snapshot is probe-side of a broadcast anti-join, never
shuffled), so apply beats recompute by the snapshot/slice ratio.

Synthetic data is a pure function of spark.range ids (no driver-side
rows): a snapshot of N keys and a slice touching N/500 keys (80%
updates / 10% deletes / 10% inserts).

Usage: python tools/cdc_scale_probe.py [n_keys ...]  (default 10M 50M)
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.lifecycle.cdc import apply_changelog  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000_000, 50_000_000]
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
