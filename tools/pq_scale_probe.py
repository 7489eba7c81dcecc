"""PQ/ADC scoring throughput vs brute-force dot products.

The IVF-PQ claim under test (extensions/pq.py): once vectors are
encoded, scoring a (query, candidate) pair costs m array lookups in
whole-stage codegen instead of a dim-length dot product through
interpreted higher-order functions (SCALE.md §4) — so the exhaustive
scoring stage, the part that scales with N·Q, should be several times
faster per pair, on top of the 32× memory win.

Build cost (train + encode) is reported separately: it is a one-off
pass whose output persists with the embeddings.

Usage: python tools/pq_scale_probe.py [n_vectors ...] (default 50k 100k)
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.pq import (  # noqa: E402
    _subspace_dists,
    pq_encode,
    train_pq,
)
from aws_imdb_data_pipeline_spark.extensions.similarity import _dot  # noqa: E402
from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

DIM, M, K = 64, 8, 16
N_QUERIES, TOPK = 256, 5


def synth_vectors(spark, n: int):
    """Deterministic pseudo-random unit-ish vectors: component j of
    vector i is sin(i·p_j) for fixed irrational-ish multipliers —
    pure codegen, no driver data, reproducible anywhere."""
    comps = [
        F.sin((F.col("id") + 1) * F.lit(0.7548776662 * (j + 1) % 1 + 0.1))
        for j in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 100_000]
    spark = get_spark("pq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        vecs = synth_vectors(spark, n).persist()
        vecs.count()
        q = vecs.limit(N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
        ).persist()
        q.count()

        # one-off build: codebooks + codes
        t0 = time.perf_counter()
        books = train_pq(vecs, "embedding", DIM, M, K, fit_fraction=min(1.0, 20000 / n))
        coded = pq_encode(vecs, "embedding", books).select(
            "vec_id", "__codes"
        ).persist()
        coded.count()
        build_s = round(time.perf_counter() - t0, 2)

        # exhaustive ADC scoring: Q×N pairs, m lookups each
        sub = DIM // M
        table = F.array(
            *[
                _subspace_dists(F.slice("__qv", j * sub + 1, sub), books[j])
                for j in range(M)
            ]
        )
        qt = q.select("query_id", table.alias("__T"))
        pairs = coded.crossJoin(F.broadcast(qt))
        approx = None
        for j in range(M):
            term = F.element_at(
                F.element_at("__T", j + 1), F.element_at("__codes", j + 1) + 1
            )
            approx = term if approx is None else approx + term
        t0 = time.perf_counter()
        top_n_per_group(
            pairs.select("query_id", "vec_id", approx.alias("__d")),
            partition_by=["query_id"],
            order_by=[F.col("__d"), F.col("vec_id")],
            n=TOPK,
        ).write.format("noop").mode("overwrite").save()
        adc_s = round(time.perf_counter() - t0, 2)

        # brute: Q×N full-dim dot products (the HOF path)
        bq = q
        bpairs = vecs.crossJoin(F.broadcast(bq))
        cos = _dot(F.col("__qv"), F.col("embedding"))
        t0 = time.perf_counter()
        top_n_per_group(
            bpairs.select("query_id", "vec_id", (-cos).alias("__d")),
            partition_by=["query_id"],
            order_by=[F.col("__d"), F.col("vec_id")],
            n=TOPK,
        ).write.format("noop").mode("overwrite").save()
        brute_s = round(time.perf_counter() - t0, 2)

        vecs.unpersist(); q.unpersist(); coded.unpersist()
        print(
            json.dumps(
                {
                    "n": n,
                    "pairs": n * N_QUERIES,
                    "build_sec": build_s,
                    "adc_score_sec": adc_s,
                    "brute_score_sec": brute_s,
                    "speedup": round(brute_s / adc_s, 2),
                    "bytes_per_vec_raw": DIM * 4,
                    "bytes_per_vec_pq": M,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
