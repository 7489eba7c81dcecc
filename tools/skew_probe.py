"""Skew probe: planted hot-key data at 10-50M rows, measuring what
actually needs intervention and what Spark already solves.

Three experiments, each naive vs mitigated:

1. SUM aggregate on a 30%-hot key — expectation: partial aggregation
   (map-side combine) already collapses the hot key to one row per map
   partition BEFORE the shuffle, so salting buys nothing. The probe
   measures this instead of asserting it, because "salt your skewed
   aggregations" folklore costs an extra shuffle when applied blindly.
2. COUNT DISTINCT per key (non-collapsible partial: the shuffle
   carries every distinct (key, sub) pair, so the hot key's pairs all
   land on one reducer) — naive vs the two-phase dedup-then-count
   rewrite (first shuffle keyed by (key, sub) = well distributed;
   second shuffle partial-combines to one row per key).
3. Sort-merge JOIN with a skewed probe side — naive (AQE skew-join
   OFF) vs AQE skew-split ON vs explicit salting (facts carry a salt,
   the dim side is replicated salt_buckets times). AQE's split is free
   to turn on and needs no data change; salting pays dim replication
   and is the fallback when the engine can't split (e.g. aggregates
   after the join need the same partitioning).

Usage: python tools/skew_probe.py [N ...]   (default 10_000_000)
Prints one JSON line per N; copy results into SCALE.md §12.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.operators.agg_patterns import (  # noqa: E402
    salted_aggregate,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

HOT_PCT = 30          # hot key share of all rows
N_KEYS = 2_000_000    # distinct cold keys (also the dim size)
SALT = 32


def synth_facts(spark, n: int):
    """n rows; key 0 holds HOT_PCT% of them, the rest uniform over
    N_KEYS cold keys. All JVM-side, deterministic."""
    return spark.range(n).select(
        F.when(
            F.pmod(F.xxhash64("id"), 100) < HOT_PCT, F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), N_KEYS) + 1)
        .alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 1000) / 10.0).alias("v"),
        # sub-key for the distinct experiment: hot key gets many
        # distinct subs (worst case), cold keys a handful
        F.pmod(F.xxhash64("id", F.lit(3)), 100_000).alias("sub"),
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000_000]
    spark = get_spark(
        "skew-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # keep the dim join a sort-merge join so skew is visible
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    dim = spark.range(N_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
    ).persist()
    dim.count()

    for n in sizes:
        facts = synth_facts(spark, n).persist()
        facts.count()
        out: dict = {"n": n, "hot_pct": HOT_PCT, "n_keys": N_KEYS}

        # 1. algebraic agg: partial combine should already fix skew
        out["agg_sum_naive"] = timed(
            facts.groupBy("k").agg(F.sum("v").alias("s"))
        )
        out["agg_sum_salted"] = timed(
            salted_aggregate(facts, ["k"], ["v"], salt_buckets=SALT)
        )

        # 2. distinct agg: hot key's pairs hit one reducer
        out["distinct_naive"] = timed(
            facts.groupBy("k").agg(F.countDistinct("sub").alias("d"))
        )
        out["distinct_two_phase"] = timed(
            facts.select("k", "sub")
            .distinct()
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("d"))
        )

        # 3. skewed SMJ probe side
        def join_naive():
            return facts.join(dim, "k").groupBy("attr").agg(
                F.sum("v").alias("s")
            )

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out["join_naive_noskewfix"] = timed(join_naive())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        out["join_aqe_skew_split"] = timed(join_naive())

        # per-ROW salt (a key-derived salt would be constant on the hot
        # key and spread nothing)
        salted_facts = facts.withColumn(
            "__salt", (F.rand(seed=7) * SALT).cast("int")
        )
        dim_rep = dim.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
        )
        out["join_salted"] = timed(
            salted_facts.join(dim_rep, ["k", "__salt"])
            .groupBy("attr")
            .agg(F.sum("v").alias("s"))
        )

        facts.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
