"""IVF (inverted-file) approximate nearest neighbor search.

The classic two-stage ANN structure: partition the vector space with
k-means (the "coarse quantizer"), then at query time probe only the
``n_probe`` closest cells instead of the whole corpus. Complements the
hyperplane-LSH variant: IVF adapts to the data distribution (cells
follow density), LSH is oblivious but cheaper to build.

Spark mapping:
- build: pyspark.ml KMeans (seeded → deterministic) over the corpus;
  assignments become a ``__list`` column — at 100 TB this is a one-off
  job whose output is just one small int per vector, persisted with
  the embeddings and reusable across queries.
- query: rank centroids per query (tiny cross join, broadcast), keep
  ``n_probe``, join candidates on the cell id (shuffle on a low-
  cardinality int — cheap), exact cosine within the probed cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.extensions.similarity import _dot, _to_double
from aws_imdb_data_pipeline_spark.operators.localframe import local_literal_frame
from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group


def build_ivf_assignments(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    fit_fraction: float | None = None,
):
    """Fit the coarse quantizer and assign each vector to a cell.
    Returns (assigned_df with __list column, centroids as py list).

    ``fit_fraction`` fits the quantizer on a sample — the scale path:
    at 100 TB you never k-means the full corpus, you fit on ~1e5-1e6
    sampled vectors and only the (cheap, single-pass) assignment
    touches everything. ``max_iter`` is capped low on purpose: cell
    quality only affects recall (tested), and each Lloyd iteration is
    a full pass over the fit set.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = vectors.select(
        F.col(id_col), _to_double(vec_col).alias("__arr")
    ).withColumn("__vec", array_to_vector("__arr"))
    # Lloyd iterations re-read their input; cache the decoded vectors
    # for the duration of the fit instead of re-scanning parquet.
    base = base.persist()
    fit_set = (
        base.sample(withReplacement=False, fraction=fit_fraction, seed=seed)
        if fit_fraction is not None
        else base
    )
    model = KMeans(
        k=n_lists, seed=seed, featuresCol="__vec", maxIter=max_iter
    ).fit(fit_set)
    assigned = (
        model.transform(base)
        .withColumnRenamed("prediction", "__list")
        .select(id_col, "__arr", "__list")
        .persist()
    )
    # Materialize assignments (one small int per vector — this is the
    # artifact a real deployment writes next to the embeddings), then
    # release the fit cache.
    assigned.count()
    base.unpersist()
    centers = [c.tolist() for c in model.clusterCenters()]
    return assigned, centers


def build_ivf_index(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    fit_fraction: float | None = None,
) -> dict:
    """Fit the coarse quantizer ONCE and persist the assignment table as
    a lake artifact: ``{path}/vectors`` = parquet (id, vec, __list)
    PARTITIONED BY ``__list`` — probing n cells becomes parquet
    partition pruning, exactly like the PQ index. Returns the meta dict
    (centers + params) for the caller's marker; the 100 TB shape is one
    assignment pass per corpus version, after which every consumer
    (semantic dedup, balanced sampling, cluster profiling, IVF ANN)
    reads cells instead of refitting k-means in its own query path."""
    import os as _os

    assigned, centers = build_ivf_assignments(
        vectors, id_col, vec_col, n_lists, seed, max_iter, fit_fraction
    )
    # ~1 file per cell dir (lake.py write_partitioned pattern): fewer
    # scan tasks per probed cell on every serve call
    assigned.select(
        F.col(id_col).alias("id"), F.col("__arr").alias("vec"), "__list"
    ).repartition("__list").write.mode("overwrite").partitionBy(
        "__list"
    ).parquet(_os.path.join(path, "vectors"))
    assigned.unpersist()
    return {
        "centers": centers,
        "n_lists": n_lists,
        "seed": seed,
        "max_iter": max_iter,
        "fit_fraction": fit_fraction,
        "id_col": id_col,
    }


def _read_appends_marker(path: str) -> list[int]:
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(path, "_appends.json")) as f:
            return list(_json.load(f)["batches"])
    except (OSError, ValueError, KeyError):
        return []


def _write_appends_marker(path: str, batches: list[int]) -> None:
    import json as _json
    import os as _os

    tmp = _os.path.join(path, "_appends.json.tmp")
    with open(tmp, "w") as f:
        _json.dump({"batches": batches}, f)
    _os.replace(tmp, _os.path.join(path, "_appends.json"))


# Committed-batch count past which ivf_append warns to rebuild: each
# batch is one more parquet scan unioned into every reader's plan.
APPEND_COMPACT_THRESHOLD = 32


class IvfAppendLockHeld(RuntimeError):
    """Another ivf_append holds the artifact's append lock."""


class _appends_lock:
    """O_EXCL lock file serializing the read-modify-write of
    ``_appends.json`` (r12 ADVICE: two concurrent appenders could
    choose the same batch id — one overwrites the other's staged data
    — and the loser's marker rewrite silently drops the winner's
    committed batch). Appends are rare control-plane operations
    (nightly batches), so contention means a misconfigured pipeline:
    fail loudly rather than queue. A crash while holding the lock
    leaves ``_appends.lock`` behind; the error message names it —
    deleting it is safe because the protected marker update itself is
    atomic (os.replace) and a crashed append's staging dir is never
    referenced."""

    def __init__(self, path: str) -> None:
        import os as _os

        self._lock = _os.path.join(path, "_appends.lock")

    def __enter__(self):
        import os as _os

        try:
            fd = _os.open(self._lock, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            raise IvfAppendLockHeld(
                f"ivf_append: {self._lock} exists — another append is in "
                "flight (appends are single-writer), or a previous append "
                "crashed while holding the lock. If no appender is "
                "running, delete the lock file and retry; committed "
                "batches are never affected."
            ) from None
        _os.close(fd)
        return self

    def __exit__(self, *exc):
        import os as _os

        try:
            _os.remove(self._lock)
        except OSError:
            pass
        return False


def load_ivf_index(
    spark, path: str, id_col: str = "id"
) -> DataFrame:
    """The persisted assignment table as (``id_col``, __arr, __list) —
    the same shape :func:`build_ivf_assignments` returns, so every
    consumer accepts either interchangeably. Reads the base build plus
    every COMMITTED append batch (``_appends.json``); a crashed
    :func:`ivf_append` leaves an uncommitted staging dir that is
    simply not read — same leaves-no-marker discipline as the repo's
    other artifacts."""
    import os as _os

    dirs = [_os.path.join(path, "vectors")] + [
        _os.path.join(path, "appends", f"b={n}")
        for n in _read_appends_marker(path)
    ]
    # one scan per committed dir, unioned — each dir is its own
    # __list-partitioned root (a single multi-path read would trip
    # partition discovery across heterogeneous layouts), and a
    # __list filter still prunes partitions inside every branch
    out = None
    for d in dirs:
        part = spark.read.parquet(d).select(
            F.col("id").alias(id_col),
            F.col("vec").alias("__arr"),
            "__list",
        )
        out = part if out is None else out.unionByName(part)
    return out


def cosine_topk_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    round_to: int | None = 4,
    max_iter: int = 8,
    fit_fraction: float | None = None,
    assignments: DataFrame | None = None,
    centers: list[list[float]] | None = None,
    prune_lists: bool = False,
) -> DataFrame:
    """IVF-approximate cosine top-k: (query_id, neighbor_id, cosine).

    With ``assignments``/``centers`` provided (a persisted
    :func:`build_ivf_index` artifact), the quantizer is fit ZERO times:
    the query path only ranks centroids and scans the probed cells —
    training never belongs in a serve path at scale.

    CONTRACT: when ``assignments`` is supplied, ``candidates`` is NOT
    read — the candidate corpus IS the artifact (``assignments``
    already carries every candidate's vector and cell), and the
    ``candidates`` frame only supplies the SparkSession. Passing an
    artifact built from a DIFFERENT corpus than the one you meant to
    search returns answers from the artifact's corpus — undetectable
    here (two frames' provenance isn't comparable), so keep artifact ↔
    corpus pairing in the caller (the query wrappers key artifacts by
    the corpus path + params fingerprint for exactly this reason).

    ``prune_lists=True`` (sensible only with a ``__list``-partitioned
    index artifact) collects the ≤ n_lists distinct probed cell ids —
    a plan-time decision bounded by the index's list count, the same
    move the PQ serve path makes — and applies them as an ``isin``
    filter, so the candidate scan reads only the probed parquet
    partitions instead of every cell."""
    spark = candidates.sparkSession
    if (assignments is None) != (centers is None):
        # silently retraining on the full corpus when a caller passed
        # half an artifact would be exactly the cost the artifact
        # exists to avoid — refuse instead
        raise ValueError(
            "cosine_topk_ivf needs assignments AND centers together "
            "(both from the same build_ivf_index artifact), got only one"
        )
    if assignments is not None:
        assigned = assignments
    else:
        assigned, centers = build_ivf_assignments(
            candidates, id_col, vec_col, n_lists, seed, max_iter, fit_fraction
        )
    cand = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__arr").alias("__cv"),
        "__list",
    )

    # literal plan, not a Python-RDD scan (operators/localframe.py):
    # rebuilt under a broadcast per serve call; the createDataFrame
    # form pays one Python worker round-trip per RDD slice
    centroids = local_literal_frame(
        spark,
        [(i, c) for i, c in enumerate(centers)],
        "__list bigint, __centroid array<double>",
    )
    q = queries.select(F.col(id_col).alias("query_id"), _to_double(vec_col).alias("__qv"))
    # rank cells per query by euclidean distance to the centroid
    qc = q.crossJoin(F.broadcast(centroids))
    dist = F.aggregate(
        F.zip_with("__qv", "__centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probed = top_n_per_group(
        qc.select("query_id", "__qv", "__list", dist.alias("__d")),
        partition_by=["query_id"],
        order_by=[F.col("__d"), F.col("__list")],
        n=n_probe,
    ).select("query_id", "__qv", "__list")

    if prune_lists:
        lists = [r[0] for r in probed.select("__list").distinct().collect()]
        cand = cand.filter(F.col("__list").isin(lists))

    joined = cand.join(F.broadcast(probed), "__list").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    qn = F.sqrt(_dot(F.col("__qv"), F.col("__qv")))
    cn = F.sqrt(_dot(F.col("__cv"), F.col("__cv")))
    cos = _dot(F.col("__qv"), F.col("__cv")) / (qn * cn)
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    return top_n_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("cosine"), F.col("neighbor_id")],
        n=k,
    )


def assign_to_centroids(
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    centers: list[list[float]],
) -> DataFrame:
    """Assign NEW vectors to FROZEN centroids — the incremental
    maintenance path for a persisted IVF index: nightly embedding
    batches join the index by a single-pass argmin against the
    existing coarse quantizer, with NO re-train and NO touch of the
    indexed corpus (the same batch-vs-artifact shape as
    dedup.incremental_near_dup_pairs and tokenindex.merge_dfl).

    The centroids are inlined as plan literals, every per-centroid
    squared distance is one zip_with/aggregate fold, and the cell id
    is array_position(array_min) — first-minimum, so ties break to
    the lowest list id deterministically. Zero shuffles, zero Python,
    whole-stage codegen; at 100 TB this is an embarrassingly parallel
    projection over the batch only. Returns (id_col, __arr, __list),
    the shape build_ivf_assignments emits, so every consumer accepts
    the union of old index + appended batch unchanged."""
    def _d2(c: list[float]) -> F.Column:
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(F.col("__arr"), lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dists = F.array(*[_d2(c) for c in centers])
    return (
        batch.select(F.col(id_col), _to_double(vec_col).alias("__arr"))
        .withColumn(
            "__list",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )
    )


def ivf_append(
    batch: DataFrame,
    path: str,
    meta: dict,
    id_col: str,
    vec_col: str,
) -> None:
    """Append a new vector batch to a persisted :func:`build_ivf_index`
    artifact: assign against the artifact's frozen centroids, stage
    the batch as its own ``appends/b=<n>`` parquet dir (``__list``
    partition layout, so cell pruning still prunes), and COMMIT it by
    atomically replacing the ``_appends.json`` marker. A crash
    mid-write leaves an unreferenced staging dir that
    :func:`load_ivf_index` never reads — the append is all-or-nothing
    from a reader's view, unlike an in-place parquet append where a
    partially-landed batch is indistinguishable from a complete one.
    Deletion is the mirror image — an anti-join rewrite of the
    affected batch dirs (per-vector rows are independent, like the
    band index). Centroids drift as the corpus grows; the recall
    checks are the rebuild trigger, not a row count.

    CONCURRENCY: appends are single-writer, enforced by an O_EXCL
    lock file around the read-modify-write of the marker (concurrent
    appenders raise :class:`IvfAppendLockHeld` instead of silently
    dropping each other's batches). Readers need no lock — they see
    the marker before or after the atomic replace, both consistent.

    COMPACTION: load_ivf_index unions one scan per committed batch;
    past ``APPEND_COMPACT_THRESHOLD`` batches the union fan-out (plan
    size, per-branch scan setup) outweighs the append savings —
    rebuild the index (one corpus pass, the same cost a first build
    paid) and the marker resets to empty. ivf_append warns at the
    threshold rather than auto-rebuilding: the rebuild refits
    centroids, which the operator should schedule with the recall
    checks, not bury inside an append."""
    import os as _os
    import warnings as _warnings

    with _appends_lock(path):
        committed = _read_appends_marker(path)
        n = (max(committed) + 1) if committed else 0
        assigned = assign_to_centroids(batch, id_col, vec_col, meta["centers"])
        assigned.select(
            F.col(id_col).alias("id"), F.col("__arr").alias("vec"), "__list"
        ).write.mode("overwrite").partitionBy("__list").parquet(
            _os.path.join(path, "appends", f"b={n}")
        )
        _write_appends_marker(path, committed + [n])
        if len(committed) + 1 >= APPEND_COMPACT_THRESHOLD:
            _warnings.warn(
                f"ivf_append: {len(committed) + 1} committed batches at "
                f"{path} — load_ivf_index now unions that many scans; "
                "rebuild the index (build_ivf_index) to compact and "
                "refresh centroids.",
                stacklevel=2,
            )
