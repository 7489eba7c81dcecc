"""Zone-map (CLUSTER BY) pruning probe.

sources/lake.py's ``cluster_by`` claims two pruning granularities:
row groups within a file (min/max stats on the sorted key) and whole
files (repartitionByRange gives each file a disjoint key range). This
probe measures both against the unsorted baseline on a selective range
scan, plus the footer-level evidence (what fraction of row groups /
files overlap the predicate — the upper bound on what ANY reader must
touch).

Layouts compared, same 40M-row data:
- shuffled: hash-distributed writes, no order (the default lake state)
- clustered: write_partitioned(cluster_by=["ts_s"]) — range partition
  + sort within

Usage: python tools/zonemap_probe.py [N] (default 40_000_000)
Prints one JSON line; copy into SCALE.md §15.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.lake import (  # noqa: E402
    write_partitioned,
)

DOMAIN = 100_000_000
SEL = 0.01  # 1% range predicate


def footer_overlap(path: str, lo: int, hi: int) -> dict:
    files = glob.glob(path + "/*.parquet")
    rg_total = rg_hit = f_hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
            "ts_s"
        ]
        file_hits = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            rg_total += 1
            if st.min <= hi and st.max >= lo:
                rg_hit += 1
                file_hits += 1
        f_hit += 1 if file_hits else 0
    return {
        "files": len(files),
        "files_overlapping": f_hit,
        "row_groups": rg_total,
        "row_groups_overlapping": rg_hit,
    }


def timed_count(spark, path: str, lo: int, hi: int) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = (
        spark.read.parquet(path)
        .filter((F.col("ts_s") >= lo) & (F.col("ts_s") < hi))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()[0]
        .n
    )
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    spark = get_spark(
        "zonemap-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), DOMAIN).alias("ts_s"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    work = tempfile.mkdtemp(prefix="zonemap_")
    shuffled, clustered = os.path.join(work, "shuf"), os.path.join(work, "clust")
    t0 = time.perf_counter()
    write_partitioned(df.repartition(32), shuffled, [], mode="overwrite")
    t_write_shuf = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    write_partitioned(df, clustered, [], mode="overwrite", cluster_by=["ts_s"])
    t_write_clust = round(time.perf_counter() - t0, 2)

    lo = int(DOMAIN * 0.4)
    hi = lo + int(DOMAIN * SEL)
    out = {
        "n": n,
        "selectivity": SEL,
        "write_sec_shuffled": t_write_shuf,
        "write_sec_clustered": t_write_clust,
    }
    for name, path in (("shuffled", shuffled), ("clustered", clustered)):
        # cold-ish: drop FS cache is not possible here; alternate order
        # and best-of-2 to be fair to both
        walls = []
        for _ in range(2):
            w, cnt = timed_count(spark, path, lo, hi)
            walls.append(w)
        out[f"scan_sec_{name}"] = min(walls)
        out[f"rows_{name}"] = cnt
        out[f"footer_{name}"] = footer_overlap(path, lo, hi)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
