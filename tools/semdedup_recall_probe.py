"""SemDeDup cell-boundary recall probe (SCALE.md §18).

semantic_dedup's accepted trade: a near-dup pair split across two
k-means cells is MISSED (the per-cell scan never compares them). The
docstring states the trade; this probe MEASURES it the way §10/§12
measured the LSH and skew claims: plant ground-truth near-dup twins
(augment_with_near_dups — deterministic eps-perturbed copies at cosine
≈ 0.89-0.93), sweep n_lists, and report

- co-location recall: fraction of planted pairs whose two members land
  in the SAME cell (the only pairs the per-cell scan can recover; the
  cosine verify itself cannot miss a co-located planted pair since the
  perturbation keeps them above threshold — spot-checked each run);
- pairwise work: sum over cells of c·(c−1)/2, as a fraction of the
  corpus-quadratic N·(N−1)/2 (the term n_lists exists to bound);
- cell skew: the largest cell's share of that work.

Both metrics are O(N) to compute (an assignment join + cell-size
aggregation), so the probe runs at 10^6 vectors locally — no quadratic
scan is executed, because the QUESTION is how much quadratic work the
cells would admit and how many true pairs they would forfeit.

The recall-oriented alternative at the same threshold is banded
sign-LSH (auto_lsh_params): analytic recall ≥ target by construction,
candidate fraction bands/2^planes. The probe prints that side too, so
the crossover guidance (grow cells vs switch to LSH) is a table, not
an opinion.

Usage: python tools/semdedup_recall_probe.py [N] [n_lists ...]
Defaults: N=1_000_000, n_lists 4 16 64 256. One JSON line per config.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.ivf import (  # noqa: E402
    build_ivf_assignments,
)
from aws_imdb_data_pipeline_spark.extensions.similarity import (  # noqa: E402
    _dot,
    augment_with_near_dups,
    auto_lsh_params,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

DIM = 64
EVERY = 10          # every 10th base vector gets a planted twin
ID_OFFSET = 100_000_000
THRESHOLD = 0.85    # the planted twins sit at cosine ~0.89-0.93


def synth_base(spark, n: int):
    """Seeded unit-ish vectors, fully JVM-side (same family as the
    other probes): element (i, j) = (xxhash64(i, j) % 2001 - 1000)/1000."""
    base = spark.range(n).withColumnRenamed("id", "vec_id")
    elem = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: ((F.xxhash64("vec_id", j) % 2001) - 1000).cast("double")
        / 1000.0,
    )
    return base.select("vec_id", elem.alias("embedding"))


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    n = args[0] if args else 1_000_000
    sweeps = args[1:] or [4, 16, 64, 256]
    spark = get_spark("semdedup-recall")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = augment_with_near_dups(
        synth_base(spark, n), "vec_id", "embedding",
        every=EVERY, eps=0.2, id_offset=ID_OFFSET,
    ).persist()
    n_total = corpus.count()
    n_planted = n // EVERY

    # sanity: planted pairs really sit above THRESHOLD (sample 100)
    a = corpus.filter(F.col("vec_id") >= ID_OFFSET).limit(100).select(
        (F.col("vec_id") - ID_OFFSET).alias("vec_id"),
        F.col("embedding").alias("tv"),
    )
    b = corpus.select("vec_id", F.col("embedding").alias("bv"))
    cos = _dot(F.col("tv"), F.col("bv")) / (
        F.sqrt(_dot(F.col("tv"), F.col("tv")))
        * F.sqrt(_dot(F.col("bv"), F.col("bv")))
    )
    min_cos = a.join(b, "vec_id").agg(F.min(cos)).collect()[0][0]
    assert min_cos >= THRESHOLD, f"planted twin below threshold: {min_cos}"

    brute_pairs = n_total * (n_total - 1) / 2.0
    for n_lists in sweeps:
        t0 = time.perf_counter()
        assigned, _ = build_ivf_assignments(
            corpus, "vec_id", "embedding", n_lists=n_lists, seed=42,
            max_iter=8, fit_fraction=min(1.0, 200_000 / n_total),
        )
        cells = assigned.select("vec_id", "__list")
        twin = cells.filter(F.col("vec_id") >= ID_OFFSET).select(
            (F.col("vec_id") - ID_OFFSET).alias("vec_id"),
            F.col("__list").alias("__twin_list"),
        )
        co = (
            cells.join(twin, "vec_id")
            .agg(
                F.count(F.lit(1)).alias("pairs"),
                F.sum(
                    (F.col("__list") == F.col("__twin_list")).cast("long")
                ).alias("colocated"),
            )
            .collect()[0]
        )
        sizes = [
            r[0]
            for r in assigned.groupBy("__list")
            .agg(F.count(F.lit(1)).alias("c"))
            .select("c")
            .collect()
        ]
        assigned.unpersist()
        work = sum(c * (c - 1) / 2.0 for c in sizes)
        max_work = max(c * (c - 1) / 2.0 for c in sizes)
        wall = round(time.perf_counter() - t0, 1)
        print(json.dumps({
            "probe": "semdedup_cells",
            "n_vectors": n_total,
            "n_lists": n_lists,
            "planted_pairs": n_planted,
            "colocated": int(co["colocated"]),
            "recall": round(co["colocated"] / co["pairs"], 4),
            "pair_work_frac_of_brute": round(work / brute_pairs, 6),
            "max_cell_share_of_work": round(max_work / work, 4),
            "fit_assign_sec": wall,
        }), flush=True)

    # the recall-oriented alternative at the same threshold: banded
    # sign-LSH with analytic recall >= 0.9 at THRESHOLD by construction
    planes, bands = auto_lsh_params(n_total, THRESHOLD, target_recall=0.9)
    p = 1.0 - math.acos(THRESHOLD) / math.pi
    analytic_recall = 1.0 - (1.0 - p**planes) ** bands
    print(json.dumps({
        "probe": "lsh_alternative",
        "n_vectors": n_total,
        "threshold": THRESHOLD,
        "n_planes": planes,
        "n_bands": bands,
        "analytic_recall_at_threshold": round(analytic_recall, 4),
        "random_candidate_frac_of_brute": round(bands / 2.0**planes, 8),
        "band_rows": n_total * bands,
    }), flush=True)
    corpus.unpersist()


if __name__ == "__main__":
    main()
