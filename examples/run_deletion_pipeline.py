"""Compliance lifecycle: serve from persisted artifacts, then honor a
right-to-be-forgotten batch WITHOUT rebuilding or re-tokenizing.

    build artifacts (token-stats vocabulary + MinHash band index)
    → stream events into the exact-distinct bitmap state
    → GDPR deletion batch arrives
    → retract vocabulary counts from the artifact's own tfl rows
      (extensions.tokenindex.retract_dfl — one semi-join, no corpus
      re-read), filter the band index rows, anti-join the lake
    → verify retraction == rebuild-from-survivors, exactly

Every stage is the operator a registered query or test exercises
(`token_stats_retraction`, `bitmap_distinct_users_daily`,
test_dedup.py's band-index filter≡rebuild pin, the streaming
replay-idempotent distinct in streaming/distinctserve.py); this
example proves they compose into the production deletion path: at
100 TB the deletion batch touches KB-to-MB of artifact and one
anti-join over the affected partitions, never the corpus.

Run: python examples/run_deletion_pipeline.py [workdir]
Reads /root/testdata/sf0.001 unless $SPARK_GRAFT_SF_DIR points
elsewhere.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark import get_spark
from aws_imdb_data_pipeline_spark.extensions.dedup import (
    build_minhash_band_index,
)
from aws_imdb_data_pipeline_spark.extensions.tokenindex import (
    batch_token_stats,
    retract_dfl,
    retract_scalars,
)
from aws_imdb_data_pipeline_spark.streaming.distinctserve import (
    current_distinct,
    stream_distinct_bitmaps,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(workdir: str) -> None:
    spark = get_spark("deletion-pipeline")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))

    # -- 1. build the serving artifacts once ---------------------------------
    tfl, dfl = batch_token_stats(docs)
    tfl_path = os.path.join(workdir, "tfl")
    dfl_path = os.path.join(workdir, "dfl")
    tfl.write.mode("overwrite").parquet(tfl_path)
    dfl.write.mode("overwrite").parquet(dfl_path)
    index_path = os.path.join(workdir, "band_index")
    build_minhash_band_index(docs, "doc_id", "text", index_path)
    print(f"artifacts: vocabulary terms={spark.read.parquet(dfl_path).count()}")

    # -- 2. stream events into the exact-distinct bitmap state ---------------
    feed = os.path.join(workdir, "feed")
    ev = events.withColumn("day", F.date_trunc("day", "ts"))
    ev.limit(0).write.parquet(feed)  # fix schema, then two batches
    ev.filter(F.dayofmonth("ts") <= 15).write.mode("append").parquet(feed)
    ev.filter(F.dayofmonth("ts") > 15).write.mode("append").parquet(feed)
    state = os.path.join(workdir, "distinct_state")
    q = stream_distinct_bitmaps(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed),
        state,
        os.path.join(workdir, "ckpt"),
        key_cols=["day"],
        value_col="user_id",
        trigger_available_now=True,
    )
    q.awaitTermination(180)
    q.stop()
    served = current_distinct(spark, state, ["day"]).orderBy("day")
    exact = ev.groupBy("day").agg(F.count_distinct("user_id").alias("d"))
    n_days = served.count()
    ok_stream = (
        served.join(exact, "day")
        .filter(F.col("distinct_exact") != F.col("d"))
        .count()
        == 0
    )
    print(f"stream distinct: {n_days} days, exact={'PASSED' if ok_stream else 'FAILED'}")

    # -- 3. the deletion batch ------------------------------------------------
    deleted = docs.filter(F.col("doc_id") % 23 == 0).select("doc_id")
    n_del = deleted.count()

    base_tfl = spark.read.parquet(tfl_path)
    base_dfl = spark.read.parquet(dfl_path)
    new_dfl = retract_dfl(base_dfl, base_tfl, deleted)
    scal = retract_scalars(base_tfl, deleted).first()

    bands = spark.read.parquet(os.path.join(index_path, "bands"))
    new_bands = bands.join(
        deleted.withColumnRenamed("doc_id", "id"), "id", "left_anti"
    )
    survivors = docs.join(deleted, "doc_id", "left_anti")
    print(
        f"deletion batch: {n_del} docs retracted "
        f"(n_docs_gone={scal.n_docs_gone}, sum_dl_gone={scal.sum_dl_gone})"
    )

    # -- 4. verify retraction == rebuild-from-survivors ----------------------
    _stfl, want_dfl = batch_token_stats(survivors)
    vocab_ok = sorted(map(tuple, new_dfl.collect())) == sorted(
        map(tuple, want_dfl.collect())
    )
    print(f"vocabulary retraction vs rebuild: {'PASSED' if vocab_ok else 'FAILED'}")

    rebuilt_path = os.path.join(workdir, "band_index_rebuilt")
    build_minhash_band_index(survivors, "doc_id", "text", rebuilt_path)
    want_bands = spark.read.parquet(os.path.join(rebuilt_path, "bands"))
    sel = ["id", "bucket", "band"]
    bands_ok = sorted(
        map(tuple, new_bands.select(*sel).collect())
    ) == sorted(map(tuple, want_bands.select(*sel).collect()))
    print(f"band-index filter vs rebuild: {'PASSED' if bands_ok else 'FAILED'}")

    if not (ok_stream and vocab_ok and bands_ok):
        raise SystemExit("deletion pipeline FAILED")
    print("deletion pipeline: PASSED")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="del_"))
