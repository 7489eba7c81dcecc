"""Connected components over near-duplicate pair graphs.

Dedup pipelines emit PAIRS (a ~ b); consolidation needs GROUPS: the
transitive closure of ~, i.e. connected components, from which one
survivor per component is kept. Large-scale CC here is iterative
min-label propagation:

    label(v) := min(label(v), min over neighbors(label(u)))

repeated until fixpoint. Each iteration is one join + one aggregate
(all DataFrame ops); iteration count is the graph diameter, which for
near-dup graphs is tiny (dup clusters are cliques or near-cliques).
The loop is driver-side CONTROL only — the data never leaves
executors. Each generation is localCheckpoint()ed: persisting alone
does NOT truncate the logical plan, and the nested lineage of an
iterative algorithm grows until plan compilation itself OOMs (~30
iterations sufficed). Checkpointing resets the plan to the
materialized blocks — the same discipline GraphX applies.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    reliable_checkpoint: bool = False,
    strict: bool = False,
    on_iteration=None,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component is the
    minimum node id reachable from the node (a canonical label).

    ``reliable_checkpoint=True`` uses ``DataFrame.checkpoint()`` against
    the SparkContext's configured checkpoint dir instead of
    ``localCheckpoint()``. localCheckpoint blocks live in executor
    memory/disk and die with a lost executor — fine on local[*], fatal
    mid-iteration on a real cluster; reliable checkpoints survive
    executor loss. Callers must ``sc.setCheckpointDir(...)`` first.

    Min-label propagation needs diameter-many iterations. If the loop
    exits after ``max_iterations`` without converging the labels are
    WRONG (components silently split); ``strict=True`` raises, else a
    RuntimeWarning is emitted.

    ``on_iteration(i, changed)`` (optional) is invoked after each
    materialized generation — probes use it to time iterations; each
    iteration is fully materialized by its checkpoint, so wall between
    callbacks is the true per-iteration cost.
    """
    if reliable_checkpoint:
        sc = pairs.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "reliable_checkpoint=True requires "
                "spark.sparkContext.setCheckpointDir(...) to be set"
            )

    def _ckpt(df: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = _ckpt(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = _ckpt(
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    changed = 0
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = _ckpt(  # truncate lineage per generation
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if on_iteration is not None:
            on_iteration(it, changed)
        if changed == 0:
            break

    if changed != 0:
        # the final allowed iteration changing labels does not imply
        # non-convergence — it may have BEEN the step that reached the
        # fixpoint; one more propagation check settles it
        still = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
            .join(labels, F.col("a") == labels.node)
            .filter(F.col("nbr_label") < F.col("label"))
            .count()
        )
        changed = still
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); components "
            "may be split — raise max_iterations (graph diameter bound)"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    return labels.select(F.col("node"), F.col("label").alias("component"))
