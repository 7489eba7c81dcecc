"""Crawl-diff at scale: fingerprint + bucketing, measured (SCALE.md §24).

crawl_diff_summary's contract: at 100 TB the FULL OUTER text compare
must not ship document bodies through the shuffle (xxhash64
fingerprints instead — 16-byte join rows), and on bucketed corpus
versions it must not shuffle at all. This probe measures all three
shapes on one host run over a 20M-doc synthetic corpus pair
(every 13th changed, 17th removed, 19th added):

- plain parquet, raw-text compare (bodies through both exchanges);
- plain parquet, fingerprint=True (16-byte rows through the join —
  the hash computes in the scan projection, pre-shuffle);
- bucketed-by-doc_id tables, fingerprint=True (ZERO exchanges,
  asserted from the executed plan).

Bodies are ~1 KB (the regime the fingerprint is FOR: the raw form
ships ~n_docs KB through both join exchanges, the hashed form 16
bytes/row); each shape reports the median of 3 runs.

Usage: python tools/crawl_diff_probe.py [n_docs]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(label, fn, extra=None, trials=3):
    walls = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 2))
    wall = sorted(walls)[len(walls) // 2]
    row = {"step": label, "sec": wall, "runs": walls}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    return wall


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark("crawl-diff-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from aws_imdb_data_pipeline_spark.extensions.corpus import crawl_diff

    work = tempfile.mkdtemp(prefix="crawl_diff_probe_")
    # per-run unique table names so a concurrent test/bench run on the
    # shared warehouse can't collide (round-7 ADVICE)
    tok = os.path.basename(work).rsplit("_", 1)[-1]
    t_cur, t_nxt = f"cdp_cur_{tok}", f"cdp_nxt_{tok}"
    body = (
        "concat('body ', id, ' ',"
        " repeat(concat('w', pmod(id, 97), ' '), 200))"  # ~1 KB
    )
    cur = spark.range(0, n).selectExpr("id AS doc_id", f"{body} AS text")
    nxt = spark.range(0, n).filter("id % 17 != 0").selectExpr(
        "id AS doc_id",
        f"IF(id % 13 = 0, concat({body}, ' updated'), {body}) AS text",
    ).unionByName(
        spark.range(n, n + n // 19).selectExpr(
            "id AS doc_id", f"{body} AS text"
        )
    )
    try:
        cur.write.mode("overwrite").parquet(f"{work}/cur")
        nxt.write.mode("overwrite").parquet(f"{work}/nxt")
        c = spark.read.parquet(f"{work}/cur")
        x = spark.read.parquet(f"{work}/nxt")

        def run(fp):
            crawl_diff(c, x, "doc_id", "text", fingerprint=fp).groupBy(
                "status"
            ).count().write.format("noop").mode("overwrite").save()

        run(True)  # untimed warmup
        timed("plain_rawtext", lambda: run(False))
        timed("plain_fingerprint", lambda: run(True))

        for name, df in (((t_cur), c), ((t_nxt), x)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        t_bwrite = timed("bucketed_write_both", lambda: [
            df.write.bucketBy(32, "doc_id").sortBy("doc_id")
              .mode("overwrite").saveAsTable(name)
            for name, df in (((t_cur), c), ((t_nxt), x))
        ], trials=1)
        j = crawl_diff(
            spark.table(t_cur), spark.table(t_nxt),
            "doc_id", "text", fingerprint=True,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hash")
        timed(
            "bucketed_fingerprint",
            lambda: j.groupBy("status").count()
                     .write.format("noop").mode("overwrite").save(),
            extra={"exchanges_in_plan": n_exchanges},
        )
        print(json.dumps({
            "step": "summary", "n_docs": n,
            "zero_exchange_bucketed": n_exchanges == 0,
            "bucketed_write_sec": t_bwrite,
        }), flush=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_cur}")
        spark.sql(f"DROP TABLE IF EXISTS {t_nxt}")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
