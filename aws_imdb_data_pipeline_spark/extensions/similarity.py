"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, with the math
done entirely in built-in higher-order functions (zip_with/aggregate
— JVM-side, codegen'd; no Python worker in the loop):

    dot(a, b)  = aggregate(zip_with(a, b, *), 0.0, +)
    norm(a)    = sqrt(aggregate(a, 0.0, acc + x*x))

Scale story: the query side is broadcast (k queries x dim floats is
tiny); the candidate scan is embarrassingly parallel, and per-query
top-k is a window over the (queries x candidates) product — fine for
O(10^2) queries. For all-pairs / large query sets, use the LSH variant
(`random_hyperplane_buckets`): sign-of-projection bucketing against
fixed seeded hyperplanes restricts comparisons to matching buckets —
the same banding idea as MinHash-LSH but for cosine space.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group


def _to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    """Add the L2 norm of ``vec_col`` (computed in double precision)."""
    v = _to_double(vec_col)
    return df.withColumn(out_col, F.sqrt(_dot(v, v)))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    include_self: bool = False,
    round_to: int | None = 4,
) -> DataFrame:
    """Brute-force cosine top-k: for each query row, the k most similar
    candidate rows. Output: (query_id, neighbor_id, cosine).

    The query set is broadcast; candidates stream through one stage.
    ``round_to`` quantizes the score so results are stable across
    engines/summation orders (used by the oracle comparison).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(vec_col).alias("q_vec")
    )
    q = q.withColumn("q_norm", F.sqrt(_dot(F.col("q_vec"), F.col("q_vec"))))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _to_double(vec_col).alias("c_vec")
    )
    c = c.withColumn("c_norm", F.sqrt(_dot(F.col("c_vec"), F.col("c_vec"))))

    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    return top_n_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("cosine"), F.col("neighbor_id")],
        n=k,
    )


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    probe_radius: int = 1,
    seed: int = 42,
    round_to: int | None = 4,
) -> DataFrame:
    """Approximate cosine top-k: compare only candidates whose sign-LSH
    bucket is within ``probe_radius`` bit flips of the query's bucket
    (multi-probe). With b planes, a radius-1 probe scans ~(1+b)/2^b of
    the corpus instead of all of it — the scale path when the query
    set is too large to broadcast against every candidate.

    Trade-off: recall < 1 (a true neighbor can land outside the probed
    buckets); raise ``probe_radius``/lower ``n_planes`` for recall,
    reverse for speed. Tests measure recall against brute force.
    """
    qb = random_hyperplane_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv", dim, n_planes, seed,
    )
    cb = random_hyperplane_buckets(
        candidates.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        ),
        "__cv", dim, n_planes, seed,
    )
    # multi-probe: expand each query to its bucket + all buckets within
    # probe_radius bit flips (radius 1 → b+1 probes)
    probes = [F.col("lsh_bucket")]
    if probe_radius >= 1:
        probes += [
            F.col("lsh_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
        ]
    qb = qb.withColumn("__probe", F.explode(F.array(*probes))).drop("lsh_bucket")

    joined = cb.join(
        F.broadcast(qb), F.col("lsh_bucket") == F.col("__probe")
    ).filter(F.col("neighbor_id") != F.col("query_id"))

    qv, cv = _to_double("__qv"), _to_double("__cv")
    qn = F.sqrt(_dot(qv, qv))
    cn = F.sqrt(_dot(cv, cv))
    cos = _dot(qv, cv) / (qn * cn)
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine")).distinct()
    return top_n_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("cosine"), F.col("neighbor_id")],
        n=k,
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    round_to: int | None = 4,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — brute-force
    O(N^2) baseline for embedding-level dedup.

    Scale path: at N where N^2 is prohibitive, bucket by
    ``random_hyperplane_buckets`` first and run this within buckets
    (or within band-matching buckets), trading recall for the
    quadratic term — same contract, fewer comparisons.
    """
    base = df.select(F.col(id_col).alias("__id"), _to_double(vec_col).alias("__v"))
    base = base.withColumn("__n", F.sqrt(_dot(F.col("__v"), F.col("__v"))))
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("va"), F.col("__n").alias("na")
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("vb"), F.col("__n").alias("nb")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def _hyperplane_bucket_expr(
    vec: Column, dim: int, n_planes: int, seed: int
) -> Column:
    """Sign-LSH bucket id as a Column: bit i = (vec . plane_i) > 0,
    planes drawn from a seeded RNG and embedded as literals
    (deterministic everywhere — driver, executors, re-runs)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = []
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bits.append(
            F.when(_dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("long")


def random_hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:  # noqa: D401 — see module docstring
    """Sign-LSH bucket id: bit i = (v . plane_i) > 0, planes drawn from
    a seeded RNG and embedded as literals (deterministic everywhere).

    Vectors in the same bucket are likely cosine-similar; restrict
    expensive pairwise work to within-bucket groups. n_planes=16 →
    65536 buckets; tune to corpus size so buckets stay O(100) rows.
    """
    return df.withColumn(
        out_col, _hyperplane_bucket_expr(_to_double(vec_col), dim, n_planes, seed)
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_bands: int = 16,
    seed: int = 42,
    round_to: int | None = 4,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """LSH-bucketed embedding near-dup: the scale path for
    :func:`embedding_near_dup_pairs`. Same output contract
    (id_a < id_b, cosine >= threshold), sub-quadratic candidate
    generation, exact-cosine verification (precision = 1; recall < 1).

    OR-amplified sign-LSH: ``n_bands`` independent plane sets of
    ``n_planes`` hyperplanes each; a pair is a candidate iff it lands in
    the same bucket in >= 1 band. With p = 1 - arccos(cos)/pi the
    per-plane agreement probability, recall = 1 - (1 - p^n_planes)^n_bands
    — at cos 0.43 and (4, 16) that is ~0.95, while a random (cos~0)
    pair collides with probability 1 - (1 - 0.5^n_planes)^n_bands.
    Raise ``n_planes`` as the corpus grows or the threshold rises: the
    pair scan is quadratic *within buckets only*, so bucket count
    (2^n_planes per band) is the scale knob. Candidates are verified
    with the exact cosine, so reported pairs are never wrong — LSH can
    only miss, never invent (tests measure recall vs brute force).

    All stages are JVM-side: bucket ids are literal-plane dot products
    (codegen), candidates come from a (band, bucket) equi-join with a
    hot-bucket cap — the same shape as MinHash LSH banding
    (extensions/dedup.py lsh_candidate_pairs).
    """
    base = df.select(F.col(id_col).alias("__id"), _to_double(vec_col).alias("__v"))
    base = base.withColumn("__n", F.sqrt(_dot(F.col("__v"), F.col("__v"))))

    # one pass computes every band's bucket, exploded to (id, band, bucket)
    v = F.col("__v")
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _hyperplane_bucket_expr(v, dim, n_planes, seed + 7919 * b).alias(
                "bucket"
            ),
        )
        for b in range(n_bands)
    ]
    banded = base.select(
        "__id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # cap degenerate buckets before pairing (a b-row bucket yields
    # b^2/2 pairs); window count shares the (band, bucket) shuffle
    from pyspark.sql import Window as _W

    bn = F.count(F.lit(1)).over(_W.partitionBy("band", "bucket"))
    bounded = banded.withColumn("__bn", bn).filter(
        (F.col("__bn") >= 2) & (F.col("__bn") <= max_bucket_size)
    )
    a = bounded.select("band", "bucket", F.col("__id").alias("id_a"))
    b = bounded.select("band", "bucket", F.col("__id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    va = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("va"), F.col("__n").alias("na")
    )
    vb = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("vb"), F.col("__n").alias("nb")
    )
    scored = cand.join(va, "id_a").join(vb, "id_b")
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return scored.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
