"""IVF-assignment artifact amortization probe (SCALE.md §19).

Round 5's curation/ANN queries each refit the k-means coarse quantizer
inside their own query path (cluster_balanced_sample twice). Round 6
moved the fit into one persisted artifact (ensure_ivf_assignments).
This probe measures both shapes ON THE SAME HOST RUN:

- cold: delete the artifact, time the one-off build;
- warm: time each of the four consumers served from the artifact;
- round-5 twin: time the same operators with an IN-CALL fit
  (assignments=None), the shape the artifact replaced.

Usage: python tools/ivf_artifact_probe.py [sf_dir]
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
    spark = get_spark("ivf-artifact-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from aws_imdb_data_pipeline_spark.extensions.ivf import cosine_topk_ivf
    from aws_imdb_data_pipeline_spark.extensions.similarity import (
        cluster_balanced_sample,
        semantic_dedup,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import artifact_dir
    from aws_imdb_data_pipeline_spark.plans import REGISTRY
    from aws_imdb_data_pipeline_spark.plans.extensions import (
        _ivf_assignments_df,
    )
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    # untimed warmup: absorb JVM/codegen/KMeans-class startup so the
    # first timed row isn't charged for it
    cluster_balanced_sample(
        emb, "vec_id", "embedding", cap_per_cell=20, n_lists=16,
        fit_fraction=0.25,
    ).write.format("noop").mode("overwrite").save()

    # round-5 shape: quantizer fit inside every call
    timed("r5_semantic_dedup_infit", lambda: semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.8, n_lists=16,
        fit_fraction=0.25))
    timed("r5_balanced_sample_infit", lambda: cluster_balanced_sample(
        emb, "vec_id", "embedding", cap_per_cell=20, n_lists=16,
        fit_fraction=0.25))
    timed("r5_ann_ivf_infit", lambda: cosine_topk_ivf(
        emb.filter(F.col("vec_id") < 5), emb, "vec_id", "embedding",
        k=5, n_lists=16, n_probe=4, fit_fraction=0.25))

    # cold build (delete artifact first), then warm consumers
    shutil.rmtree(artifact_dir("ivf_assignments", sf_dir), ignore_errors=True)
    timed("artifact_build_cold", lambda: (
        _ivf_assignments_df(spark, sf_dir) and None))
    for name in (
        "ann_ivf_index_build",
        "embedding_cluster_sizes",
        "cluster_balanced_sample",
        "ann_cosine_topk_ivf",
        "semantic_dedup_survivors",
    ):
        timed(f"warm_{name}", lambda n=name: REGISTRY[n].fn(spark, sf_dir))


if __name__ == "__main__":
    main()
