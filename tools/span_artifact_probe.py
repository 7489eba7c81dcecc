"""Hot-shingle artifact amortization probe (SCALE.md §23).

Round 6's span operators (dup_span_coverage / corpus_trim_dup_spans)
computed the shingle posexplode + per-window xxhash64 transform TWICE
per call — once for the hot-set aggregate, once for the consumer join —
because the lazy kernel frame feeds both sides. Round 7 moved the hot
set into a persisted per-corpus-version artifact (the IVF-assignment
amortization, SCALE.md §19). This probe measures both shapes ON THE
SAME HOST RUN:

- r6 twin: each operator with an in-call hot aggregate (hot=None),
  the double-pass shape the artifact replaced;
- cold: delete the artifact, time the one-off hot-set build;
- warm: each operator served from the artifact (one shingle pass +
  a join against the persisted key set).

Usage: python tools/span_artifact_probe.py [sf_dir]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    if out is not None:
        out.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    print(json.dumps({"step": label, "sec": wall}), flush=True)
    return wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("span-artifact-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        dup_span_coverage_metric,
        trim_duplicated_spans,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import artifact_dir
    from aws_imdb_data_pipeline_spark.plans.extensions3 import (
        _augmented_span_docs,
        _hot_shingle_set,
    )

    aug, shift = _augmented_span_docs(spark, sf_dir)

    # untimed warmup: absorb JVM/codegen startup
    dup_span_coverage_metric(
        aug.limit(500), "doc_id", "text"
    ).write.format("noop").mode("overwrite").save()

    # round-6 shape: hot set aggregated inside every call (the lazy
    # kernel frame feeds both the aggregate and the join → the shingle
    # transform plans twice per call)
    t_r6_cov = timed("r6_coverage_infit", lambda: dup_span_coverage_metric(
        aug, "doc_id", "text").filter(F.col("doc_id") < shift))
    t_r6_trim = timed("r6_trim_infit", lambda: trim_duplicated_spans(
        aug, "doc_id", "text").filter(F.col("doc_id") < shift))

    # cold build (delete artifact first), then warm consumers
    shutil.rmtree(artifact_dir("hot_shingles", sf_dir), ignore_errors=True)
    t_build = timed("artifact_build", lambda: (
        _hot_shingle_set(spark, sf_dir), None)[1])
    hot = _hot_shingle_set(spark, sf_dir)
    t_cov = timed("warm_coverage", lambda: dup_span_coverage_metric(
        aug, "doc_id", "text", hot=hot).filter(F.col("doc_id") < shift))
    t_trim = timed("warm_trim", lambda: trim_duplicated_spans(
        aug, "doc_id", "text", hot=hot).filter(F.col("doc_id") < shift))

    saved_per_pair = (t_r6_cov + t_r6_trim) - (t_cov + t_trim)
    print(json.dumps({
        "step": "summary",
        "r6_pair_sec": round(t_r6_cov + t_r6_trim, 2),
        "warm_pair_sec": round(t_cov + t_trim, 2),
        "build_sec": t_build,
        "saved_per_pair_sec": round(saved_per_pair, 2),
        "breakeven_pairs": (
            round(t_build / saved_per_pair, 2) if saved_per_pair > 0 else None
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
