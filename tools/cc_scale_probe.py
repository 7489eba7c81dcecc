"""Connected-components scale probe: iterations-to-convergence and
wall-per-iteration at millions of edges with RELIABLE checkpointing —
the configuration a real cluster must run (localCheckpoint blocks die
with a lost executor).

Graph shape mirrors a near-dup pair graph: overwhelmingly small
clusters (chains of 4 — dup groups are tiny) plus a sprinkling of long
chains (1 per 100k nodes, length 24) so convergence is governed by a
realistic worst-case diameter rather than the typical cluster. Edges
are a pure function of the node id (spark.range + arithmetic — no
driver-side data).

Usage: python tools/cc_scale_probe.py [n_edges ...]   (default 1M 2M 4M)
Prints one JSON line per size: {"edges", "nodes", "iterations",
"iter_secs": [...], "total_sec", "components"}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.clusters import (  # noqa: E402
    connected_components,
    connected_components_stars,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

SHORT = 4  # typical dup-cluster chain length
LONG = 24  # worst-case chain length (1 per LONG_EVERY nodes)
LONG_EVERY = 100_000


def synth_edges(spark, n_edges: int):
    """Chain edges (i, i+1): node i starts a short chain unless it
    falls in a long-chain stripe. A node emits an edge to its successor
    iff it is not the last node of its chain — all decided by modular
    arithmetic on the id, so the frame is deterministic for any
    partitioning and never touches the driver."""
    # chains of SHORT need SHORT/(SHORT-1) nodes per edge; oversize then limit
    n_nodes = int(n_edges * SHORT / (SHORT - 1)) + LONG
    nodes = spark.range(n_nodes).withColumnRenamed("id", "a")
    in_long = (F.col("a") % LONG_EVERY) < LONG  # stripe of LONG nodes
    last_of_long = (F.col("a") % LONG_EVERY) == (LONG - 1)
    last_of_short = (F.col("a") % SHORT) == (SHORT - 1)
    emits = F.when(in_long, ~last_of_long).otherwise(~last_of_short)
    return (
        nodes.filter(emits & (F.col("a") + 1 < n_nodes))
        .select(F.col("a").alias("id_a"), (F.col("a") + 1).alias("id_b"))
        .limit(n_edges)
    )


def main() -> None:
    args = list(sys.argv[1:])
    algo = "prop"
    if "--stars" in args:
        algo = "stars"
        args.remove("--stars")
    sizes = [int(a) for a in args] or [1_000_000, 2_000_000, 4_000_000]
    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = tempfile.mkdtemp(prefix="cc_probe_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt)
    for n_edges in sizes:
        edges = synth_edges(spark, n_edges).persist()
        n = edges.count()
        iter_walls: list[float] = []
        marks = {"t": time.perf_counter()}

        def tick(i: int, changed: int) -> None:
            now = time.perf_counter()
            iter_walls.append(round(now - marks["t"], 2))
            marks["t"] = now

        t0 = time.perf_counter()
        if algo == "stars":
            comp = connected_components_stars(
                edges,
                max_rounds=12,
                reliable_checkpoint=True,
                strict=True,
                on_round=tick,
            )
        else:
            comp = connected_components(
                edges,
                max_iterations=LONG + 2,
                reliable_checkpoint=True,
                strict=True,
                on_iteration=tick,
            )
        n_components = comp.select("component").distinct().count()
        total = round(time.perf_counter() - t0, 2)
        edges.unpersist()
        print(
            json.dumps(
                {
                    "algo": algo,
                    "edges": n,
                    "nodes": int(n * SHORT / (SHORT - 1)),
                    "iterations": len(iter_walls),
                    "iter_secs": iter_walls,
                    "total_sec": total,
                    "components": n_components,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
