"""Memory-pressure probe on the distributed substrate (r12 verdict #2).

SCALE §49 ran the surface under ``local-cluster[2,8,4096]`` (two real
executor JVMs, 4 GB heap each, Netty shuffle, remote broadcast) at
sf0.01-sf1; §53's sf10/sf100 decades ran only single-JVM local[32]
with a 64 GB heap that absorbs every spill buffer. The one
cluster-only defect class found so far (bm25 spill-merge OOM, §49) was
worth the whole run — this probe makes the sf10-under-4GB-executors
sweep repeatable: the headline suite plus the N heaviest detail
queries, per-query wall + error capture, one JSON line at the end.

Usage:
  SPARK_GRAFT_MASTER=local-cluster[2,8,4096] \\
  python tools/cluster_pressure_probe.py SF_DIR [out.json] \\
      [--runs N] [--no-warmup]

Run it WITHOUT the env var to get the same-host local[32] baseline for
the delta column. ``--runs 1 --no-warmup`` is the defect-hunt mode:
at sf10 under the constrained substrate the full best-of-2 +
warm-up protocol is ~3x the wall of a single pass, and the probe's
job is finding spill/OOM/fetch failures, not nanosecond precision —
use it when artifacts are already warm.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, run_noop  # noqa: E402
from aws_imdb_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

# The heaviest non-headline queries by committed BENCH_DETAIL time —
# multi-leg verification contracts over artifact-served posting/IVF
# frames, i.e. the widest aggregation/join states in the registry.
HEAVY = [
    "rrf_hybrid_ivf_check",
    "bm25_zipf_check",
    "rrf_hybrid_ivf_digest",
    "bm25_zipf_retrieval_digest",
    "bm25_zipf_retrieval",
    "rrf_hybrid_retrieval_ivf",
    "semantic_dedup_check",
    "dedup_minhash_check",
    "ann_ivf_incremental_check",
    "dedup_incremental_check",
    # r14: the remaining quadratic-truth family member, added when the
    # sampled-exact strata (plans/strata.py) made the family completable
    # under the pressure substrate.
    "embedding_lsh_neardup_check",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0]
    out_path = args[1] if len(args) > 1 else None
    runs = 1 if "--runs" not in sys.argv else int(
        sys.argv[sys.argv.index("--runs") + 1]
    )
    warmup = "--no-warmup" not in sys.argv
    spark = get_spark(
        "cluster-pressure",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.sparkContext.master

    names = list(HEADLINE) + HEAVY
    if warmup:
        for name in names:  # untimed: artifacts + JIT
            try:
                run_noop(REGISTRY[name].fn(spark, sf_dir))
            except Exception:
                pass

    calib = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2)").write.format(
            "noop"
        ).mode("overwrite").save()
        calib = min(calib, time.perf_counter() - t0)

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            try:
                run_noop(REGISTRY[name].fn(spark, sf_dir))
            except Exception as e:  # noqa: BLE001 — probe must finish
                errors[name] = f"{type(e).__name__}: {e}"[:300]
                break
            best = min(best, time.perf_counter() - t0)
        # A later repetition erroring must not discard an already-
        # measured success: keep the best finite time AND the error
        # (flaky-substrate runs report both).
        if best != float("inf"):
            times[name] = round(best, 3)
        print(
            f"{name}: {times.get(name, 'ERROR')}"
            + (f" (late-run error: {errors[name]})" if name in errors else ""),
            flush=True,
        )

    result = {
        "sf_dir": sf_dir,
        "master": master,
        "calib_sec": round(calib, 3),
        "headline_total": round(
            sum(times.get(n, 0.0) for n in HEADLINE), 3
        ),
        "heavy_total": round(sum(times.get(n, 0.0) for n in HEAVY), 3),
        "queries": times,
        "errors": errors,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
