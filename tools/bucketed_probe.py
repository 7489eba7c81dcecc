"""Bucketed-table amortization probe.

sources/bucketed.py's claim: paying ONE write-time shuffle to store a
fact table bucketed by its hot key makes every later aggregate/join on
that key exchange-free. This probe puts numbers on the break-even: a
high-cardinality-key fact table (partial aggregation can't collapse
it map-side, so the plain path really shuffles ~the whole table per
query) written plain vs bucketed, then K repeated aggregates and a
self-join on the key.

Usage: python tools/bucketed_probe.py [N [K]] (default 20M rows, 5 reps)
Prints one JSON line; copy into SCALE.md §17.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.bucketed import (  # noqa: E402
    write_bucketed_table,
)

N_KEYS = 2_000_000
BUCKETS = 32


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "bucketed-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), N_KEYS).alias("key"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("v"),
    )
    work = tempfile.mkdtemp(prefix="bucketed_probe_")
    plain = os.path.join(work, "plain")

    t_write_plain = timed(
        lambda: df.repartition(BUCKETS).write.mode("overwrite").parquet(plain)
    )
    t_write_bucketed = timed(
        lambda: write_bucketed_table(df, "bp_fact", "key", BUCKETS)
    )

    def agg(frame):
        frame.groupBy("key").agg(F.sum("v").alias("s")).write.format(
            "noop"
        ).mode("overwrite").save()

    def self_join(frame):
        a = frame
        b = frame.select(F.col("key"), F.col("v").alias("v2"))
        a.join(b, "key").groupBy("key").agg(
            F.sum(F.col("v") * F.col("v2")).alias("s")
        ).write.format("noop").mode("overwrite").save()

    # force shuffle joins so the comparison is about the Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plain_df = spark.read.parquet(plain)
    bucketed_df = spark.table("bp_fact")

    agg_plain = [timed(lambda: agg(plain_df)) for _ in range(k)]
    agg_bucketed = [timed(lambda: agg(bucketed_df)) for _ in range(k)]
    join_plain = timed(lambda: self_join(plain_df))
    join_bucketed = timed(lambda: self_join(bucketed_df))

    plan = (
        bucketed_df.groupBy("key").agg(F.sum("v"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    print(
        json.dumps(
            {
                "n": n,
                "n_keys": N_KEYS,
                "buckets": BUCKETS,
                "write_plain_sec": t_write_plain,
                "write_bucketed_sec": t_write_bucketed,
                "agg_plain_sec": agg_plain,
                "agg_bucketed_sec": agg_bucketed,
                "join_plain_sec": join_plain,
                "join_bucketed_sec": join_bucketed,
                "bucketed_agg_has_exchange": "Exchange hashpartitioning(key"
                in plan,
            }
        ),
        flush=True,
    )
    spark.sql("DROP TABLE IF EXISTS bp_fact")


if __name__ == "__main__":
    main()
