"""Quarantine-reader throughput probe (SCALE.md §21).

read_imdb_tsv_with_quarantine buys pruning-proof malformedness (the
clean/bad split is a property of the DATA, not of which columns a
query touches) at the price of parsing lines with the ``from_csv``
EXPRESSION instead of the CSV datasource, and of an eager quarantine
write whose side re-parses the text. This probe prices that trade on
a synthetic gz TSV with a planted bad-row rate:

- baseline: csv datasource typed read, count + full aggregate;
- quarantine: the eager bad-row write + clean-side aggregate
  (unpersisted — each action re-parses, the documented contract);
- quarantine+persist: caller persists the returned clean frame —
  the recommended shape when consuming clean rows more than once.

Usage: python tools/quarantine_throughput_probe.py [n_rows] [bad_pct]
Defaults 2_000_000 rows, 0.5% bad. One JSON line per variant.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.tsv import (  # noqa: E402
    read_imdb_tsv,
    read_imdb_tsv_with_quarantine,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    bad_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    # bad_pct=0 is a valid clean-baseline run: plant nothing
    bad_every = max(int(100 / bad_pct), 1) if bad_pct > 0 else None
    work = tempfile.mkdtemp(prefix="quarantine_probe_")
    src = os.path.join(work, "rows.tsv.gz")
    with gzip.open(src, "wt") as f:
        f.write("tconst\tyear\n")
        for i in range(n):
            if bad_every is not None and i % bad_every == 0:
                f.write(f"tt{i}\tnot_a_year_{i}\n")
            else:
                f.write(f"tt{i}\t{1900 + i % 120}\n")

    schema = StructType(
        [StructField("tconst", StringType()), StructField("year", IntegerType())]
    )
    spark = get_spark("quarantine-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def agg(df):
        return df.agg(
            F.count(F.lit(1)), F.sum("year"), F.countDistinct("year")
        ).collect()[0]

    # baseline: csv datasource (malformed ints silently null)
    t0 = time.perf_counter()
    base = read_imdb_tsv(spark, src, schema=schema)
    agg(base)
    print(json.dumps({
        "variant": "csv_datasource_silent_nulls",
        "rows": n, "sec": round(time.perf_counter() - t0, 2),
    }), flush=True)

    # quarantine: eager bad write + one clean aggregate (re-parses)
    t0 = time.perf_counter()
    clean = read_imdb_tsv_with_quarantine(
        spark, src, schema, os.path.join(work, "q1")
    )
    agg(clean)
    print(json.dumps({
        "variant": "quarantine_unpersisted_1_action",
        "rows": n, "sec": round(time.perf_counter() - t0, 2),
    }), flush=True)

    # quarantine + caller persist, two consuming actions
    t0 = time.perf_counter()
    clean = read_imdb_tsv_with_quarantine(
        spark, src, schema, os.path.join(work, "q2")
    ).persist()
    agg(clean)
    agg(clean)
    sec_two = round(time.perf_counter() - t0, 2)
    clean.unpersist()
    print(json.dumps({
        "variant": "quarantine_persisted_2_actions",
        "rows": n, "sec": sec_two,
    }), flush=True)

    try:
        n_bad = spark.read.parquet(os.path.join(work, "q1")).count()
    except Exception:  # zero bad rows -> no parquet written
        n_bad = 0
    planted = (n + bad_every - 1) // bad_every if bad_every else 0
    print(json.dumps({"planted_bad": planted, "quarantined": n_bad,
                      "workdir": work}), flush=True)
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
