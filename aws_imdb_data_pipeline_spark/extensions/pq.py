"""Product-quantization (IVF-PQ) approximate nearest neighbor.

The missing tier between IVF (extensions/ivf.py) and brute force at
100 TB is MEMORY: raw float32 embeddings at 64 dims are 256 B/vector —
a trillion vectors don't fit anywhere warm. PQ (Jégou et al., "Product
Quantization for Nearest Neighbor Search", 2011) splits each vector
into ``m`` subspaces, k-means-quantizes each subspace independently,
and stores only the ``m`` one-byte codes: 8 B/vector here, a 32×
compression, with distances computed FROM THE CODES.

Spark mapping (all JVM-side expressions; Python appears only in the
tiny driver-side codebook):

- train: one seeded KMeans per subspace on a sample (codebooks are
  m×k×(dim/m) floats — a few KB — broadcast as literals).
- encode: argmin over k per subspace → ``__codes`` array<int>; a
  one-off pass, persisted next to the embeddings like the IVF list id.
- query (ADC — asymmetric distance computation): per query, ONE
  m×k table of exact subspace distances (m·k·dim/m = dim·k mults);
  after that every candidate costs m ARRAY LOOKUPS + adds instead of
  a dim-length dot product — element_at chains, whole-stage codegen,
  no higher-order functions in the per-pair hot path (SCALE.md §4).
- vectors are L2-normalized before quantization, so ascending
  approximate ||q−c||² ranks identically to descending cosine; the
  final top-k is optionally REFINED with the exact cosine on raw
  vectors (touches k vectors per query, not the corpus).

Caveat: the ENCODE argmin (k·dim literal-unrolled distance exprs) can
exceed the whole-stage-codegen method limit, and Spark falls back to
interpreted evaluation for that one projection (a logged janino
warning, not an error). Encode is a one-off build pass, so this is
acceptable; the per-pair ADC expression is small and stays codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.extensions.ivf import build_ivf_assignments
from aws_imdb_data_pipeline_spark.extensions.similarity import _dot, _to_double
from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group


def _unit(col: Column) -> Column:
    n = F.sqrt(_dot(col, col))
    return F.transform(col, lambda x: x / n)


def train_pq(
    vectors: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    fit_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Fit per-subspace codebooks on L2-normalized vectors. Returns
    ``codebooks[j][c]`` = centroid c of subspace j (driver-side, tiny:
    m·k·dim/m floats). Fit on a sample at scale (``fit_fraction``) —
    codebook quality only moves recall, never correctness."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    base = vectors.select(_unit(_to_double(vec_col)).alias("__u"))
    if fit_fraction is not None:
        base = base.sample(withReplacement=False, fraction=fit_fraction, seed=seed)
    base = base.persist()
    codebooks: list[list[list[float]]] = []
    try:
        for j in range(m):
            sl = base.select(
                array_to_vector(
                    F.slice("__u", j * sub + 1, sub)
                ).alias("features")
            )
            model = KMeans(
                k=k, seed=seed + j, maxIter=max_iter, initMode="k-means||"
            ).fit(sl)
            codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
    finally:
        base.unpersist()
    return codebooks


def _sq_dist_lit(vec: Column, center: list[float]) -> Column:
    # unrolled (x - c)^2 sum against a literal centroid — codegen, no HOF
    terms = [
        (F.element_at(vec, i + 1) - F.lit(c)) ** 2 for i, c in enumerate(center)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    out_col: str = "__codes",
) -> DataFrame:
    """Assign every vector its m sub-codes (argmin centroid per
    subspace, ties → lowest code). One narrow projection."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    u = _unit(_to_double(vec_col))
    codes = []
    for j in range(m):
        sv = F.slice(u, j * sub + 1, sub)
        dists = F.array(*[_sq_dist_lit(sv, c) for c in codebooks[j]])
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return df.withColumn(out_col, F.array(*codes))


def cosine_topk_ivf_pq(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    pq_k: int = 16,
    seed: int = 42,
    refine: bool = True,
    refine_factor: int = 4,
    round_to: int | None = 4,
    fit_fraction: float | None = None,
) -> DataFrame:
    """IVF-PQ top-k: IVF cells prune the corpus, PQ codes shortlist
    ``refine_factor``·k survivors per query, exact cosine re-ranks the
    shortlist down to k (the canonical re-ranking step — PQ's code
    distance is too coarse to order the final handful, but excellent
    at discarding the 99% that can't be close; raw vectors are read
    for only refine_factor·k candidates per query).

    (query_id, neighbor_id, cosine) — cosine is exact when ``refine``
    (the production setting), else the PQ-approximate 1 − d²/2 of the
    top-k by code distance alone."""
    spark = candidates.sparkSession
    codebooks = train_pq(
        candidates, vec_col, dim, m, pq_k, seed, fit_fraction=fit_fraction
    )
    assigned, centers = build_ivf_assignments(
        candidates, id_col, vec_col, n_lists, seed, fit_fraction=fit_fraction
    )
    cand = pq_encode(assigned, "__arr", codebooks).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__arr").alias("__cv"),
        "__list",
        "__codes",
    )

    centroids = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], ["__list", "__centroid"]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(vec_col).alias("__qv")
    ).withColumn("__qu", _unit(F.col("__qv")))

    # stage 1: probe the n_probe nearest cells per query
    qc = q.crossJoin(F.broadcast(centroids))
    cell_d = F.aggregate(
        F.zip_with("__qv", "__centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probed = top_n_per_group(
        qc.select("query_id", "__qv", "__qu", "__list", cell_d.alias("__d")),
        partition_by=["query_id"],
        order_by=[F.col("__d"), F.col("__list")],
        n=n_probe,
    )

    # stage 2: per-query ADC tables T[j][c] (computed ONCE per query)
    sub = dim // m
    table = F.array(
        *[
            F.array(
                *[
                    _sq_dist_lit(F.slice("__qu", j * sub + 1, sub), c)
                    for c in codebooks[j]
                ]
            )
            for j in range(m)
        ]
    )
    probed = probed.select(
        "query_id", "__qv", "__list", table.alias("__T")
    )

    # stage 3: candidates in probed cells, scored by m lookups each
    joined = cand.join(F.broadcast(probed), "__list").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    approx = None
    for j in range(m):
        term = F.element_at(
            F.element_at("__T", j + 1),
            F.element_at("__codes", j + 1) + 1,
        )
        approx = term if approx is None else approx + term
    scored = joined.select(
        "query_id", "__qv", "__cv", "neighbor_id", approx.alias("__ad")
    )
    shortlist = top_n_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.col("__ad"), F.col("neighbor_id")],
        n=(refine_factor * k) if refine else k,
    )

    if refine:
        qn = F.sqrt(_dot(F.col("__qv"), F.col("__qv")))
        cn = F.sqrt(_dot(F.col("__cv"), F.col("__cv")))
        cos = F.round(
            _dot(F.col("__qv"), F.col("__cv")) / (qn * cn), round_to
        ) if round_to is not None else (
            _dot(F.col("__qv"), F.col("__cv")) / (qn * cn)
        )
        rescored = shortlist.select(
            "query_id", "neighbor_id", cos.alias("cosine")
        )
        return top_n_per_group(
            rescored,
            partition_by=["query_id"],
            order_by=[F.desc("cosine"), F.col("neighbor_id")],
            n=k,
        )
    cos = 1.0 - F.col("__ad") / 2.0
    if round_to is not None:
        cos = F.round(cos, round_to)
    return shortlist.select("query_id", "neighbor_id", cos.alias("cosine"))
