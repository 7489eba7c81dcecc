"""Determinism probe for the serving-twin digest oracles (round 12).

Before pinning literal digests for rows-only serving twins (the
bm25_zipf_retrieval_digest pattern), verify their output is a pure
function of (corpus, seed, params) — i.e. INVARIANT to partitioning,
parallelism, and session config. Run this twice with different
SPARK_GRAFT_CPUS / shuffle settings and diff the JSON lines; any
difference means the twin is partition-dependent and must keep the
contract-check companion instead of an exact digest.

Usage: python tools/digest_probe.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

TWINS = {
    "ann_cosine_topk_lsh": ("query_id", "neighbor_id", "cosine"),
    "ann_cosine_topk_ivf": ("query_id", "neighbor_id", "cosine"),
    "ann_cosine_topk_ivf_pq": ("query_id", "neighbor_id", "cosine"),
    "rrf_hybrid_retrieval_ivf": ("query_id", "doc_id", "rrf_score"),
}


def digest(df, idc, nc, sc):
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(idc).alias("n_queries"),
        F.expr(f"bit_xor(xxhash64({idc}, {nc}))").alias("pair_xor"),
        F.sum(F.col(sc).cast("decimal(18,6)")).cast("double").alias(
            "score_sum"
        ),
    ).first()


def artifact_digests(spark, dirs) -> None:
    """r13 verdict #6: measure the artifact-frame digests (k-means
    cell consumers) with the exact agg specs the pinned oracles use —
    run twice at different SPARK_GRAFT_CPUS (and once after an
    .artifacts wipe for the rebuild leg) and diff the lines."""
    from aws_imdb_data_pipeline_spark.plans.checks import (
        _ARTIFACT_DIGEST_SPECS,
    )
    from aws_imdb_data_pipeline_spark.plans.fingerprints import (
        embeddings_fingerprint,
    )

    for d in dirs:
        fp = embeddings_fingerprint(spark, d)
        for name, spec in _ARTIFACT_DIGEST_SPECS.items():
            r = REGISTRY[name].fn(spark, d).agg(
                *[F.expr(sql).cast("bigint").alias(c) for c, sql in spec]
            ).first()
            print(json.dumps({
                "sf_dir": d, "fp": fp, "query": name,
                "digest": [r[c] for c, _ in spec],
            }))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dirs = args or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark(
        "digest-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--artifact" in sys.argv:
        artifact_digests(spark, dirs)
        return
    for d in dirs:
        for name, (idc, nc, sc) in TWINS.items():
            r = digest(REGISTRY[name].fn(spark, d), idc, nc, sc)
            print(json.dumps({
                "sf_dir": d, "query": name, "n_rows": r.n_rows,
                "n_queries": r.n_queries, "pair_xor": r.pair_xor,
                "score_sum": r.score_sum,
            }))


if __name__ == "__main__":
    main()
