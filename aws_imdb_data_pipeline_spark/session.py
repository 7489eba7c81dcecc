"""SparkSession factory with the engine's scale-oriented defaults.

The reference tunes its Glue session with
``spark.sql.shuffle.partitions=96`` and
``spark.sql.files.maxRecordsPerFile=5_000_000``
(reference: glue_jobs/etl_movies_episodes_analytics_advanced.py:34-35).
We keep the intent (bounded shuffle width, bounded output files) but let
AQE coalesce shuffle partitions at runtime, which is the idiomatic
Spark >= 3.2 approach and the one that survives a 1000-executor scale-up.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffles, split skewed joins,
    # switch to broadcast when runtime stats allow. This is the main
    # lever that makes one set of settings work from sf0.001 to 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalescing sizes partitions by BYTES, but this engine's
    # candidate-pair kernels (exact-cosine verify, per-cell SemDeDup
    # scans, banded hamming) carry kilobytes of ids/vectors per second
    # of compute — at the default 1 MB floor a 5 MB/5 s-CPU verify
    # stage coalesces to ~5 tasks and serializes on any cluster size
    # (measured at sf0.1: embedding_near_dup_lsh wall 3.6->1.8 s,
    # semantic_dedup_check 4.0->3.3 s with the floor at 64k;
    # per-stage evidence in OPTIMIZATION_r14.md). 64k only changes
    # stages whose TOTAL input is under cores x 1 MB — compute-dense
    # small exchanges — and leaves every data-proportional stage
    # untouched at any scale. Env knob for A/B.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_MIN_PARTITION_SIZE", "65536"
    ),
    # Bounded output files (reference: glue.py:35).
    "spark.sql.files.maxRecordsPerFile": "5000000",
    # Idempotent run_date replacement (replaces the reference's
    # Snowflake DELETE+INSERT, batch.py:211-299).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow for the (rare) pandas-UDF paths and fast toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics regardless of host TZ — keeps
    # results comparable with external oracles.
    "spark.sql.session.timeZone": "UTC",
    # Partition discovery/pruning over the parquet lake.
    "spark.sql.parquet.filterPushdown": "true",
    # Let Python DataSources (sources.docgen) absorb pushed filters.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Cost-based join reordering: inert without table stats, effective
    # once lifecycle.catalog.register_lake_table(analyze=True) has
    # recorded rowCount/size (the Spark-side ANALYZE TABLE step).
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Spill-merge memory is proportional to SPILL COUNT, not data:
    # HashAggregate's finishAggregate opens one reader per spill file
    # simultaneously, each with a >= 1 MB buffer (the conf floor) PLUS
    # a read-ahead double-buffer — a memory-pressured partial
    # aggregate that spilled a few hundred small files needs
    # numSpills x 2 MB x concurrent-tasks of pure heap just to merge.
    # The round-12 local-cluster sweep OOMed 4 GB executors on exactly
    # this signature (stack = UnsafeSorterSpillReader ->
    # ReadAheadInputStream ByteBuffer.allocate; SCALE.md §49), which
    # single-JVM local[*] never sees (the 16 GB driver heap absorbs
    # the buffers). Disabling read-ahead halves the per-reader cost
    # (spill merge is sequential IO the OS already read-ahead-caches);
    # the structural fix — keeping spill counts low in the first place
    # — is the adaptive pre-aggregate shuffle in
    # extensions.retrieval.bm25_scores.
    "spark.unsafe.sorter.spill.read.ahead.enabled": "false",
    # Parquet TIMESTAMP(NANOS) columns surface as long (ns since epoch);
    # sources.tables converts them to microsecond timestamps by
    # truncation, matching how SQL engines (e.g. DuckDB) read the same
    # files. Without this flag Spark refuses nanos parquet outright.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "aws-imdb-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``$SPARK_GRAFT_MASTER`` if set (e.g.
    ``local-cluster[2,8,4096]`` — the multi-process substrate the
    round-11 verdict asked for: real Netty shuffle transport, remote
    broadcast, task/closure serialization), else
    ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) for the test rig;
    on a real cluster pass ``None`` master via spark-submit and this
    builder leaves it untouched.
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master.startswith("local-cluster"):
        # executor JVMs spawn their own python workers; pin them to
        # this interpreter (local[*] inherits it implicitly)
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
        # Cross-process python workers deserialize pandas-UDF closures
        # by MODULE REFERENCE — the package must be importable on the
        # executor side, which single-JVM local[*] masks (its workers
        # inherit the driver's sys.path). Found by the round-12
        # local-cluster sweep: ModuleNotFoundError on the first
        # mapInPandas stage. Ship the package parent on the executor
        # PYTHONPATH here; a real cluster deploy uses --py-files or a
        # pip-installed wheel on the workers (SCALE.md §49).
    if shuffle_partitions is None:
        # Local rig: match core count. Partition-count A/B tests at
        # sf0.1 were dominated by JIT warmth and co-tenant host load
        # (same setting varied 20s..28s); with no clean signal, core
        # count is the principled default and AQE coalesces below it
        # at runtime. On a real cluster, ~2-3x total cores.
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local-cluster"):
        pkg_parent = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        prior = os.environ.get("PYTHONPATH", "")
        conf.setdefault(
            "spark.executorEnv.PYTHONPATH",
            pkg_parent + (os.pathsep + prior if prior else ""),
        )
    if master.startswith("local"):
        # Local mode runs every executor thread inside the driver JVM,
        # whose default 1g heap OOMs 32 concurrent tasks long before
        # the host's RAM is touched (measured: pair-explode at N=16k
        # embeddings). On a real cluster spark-submit owns this knob.
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
