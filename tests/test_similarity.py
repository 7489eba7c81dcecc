"""Similarity search: brute-force cosine top-k and sign-LSH buckets."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.extensions import cosine_topk, with_norm
from aws_imdb_data_pipeline_spark.extensions.similarity import (
    random_hyperplane_buckets,
)


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_with_norm(spark):
    out = {r.vec_id: r.norm for r in with_norm(_vecs(spark), "embedding").collect()}
    assert abs(out[0] - 1.0) < 1e-9
    assert abs(out[4] - math.sqrt(0.5)) < 1e-9


def test_cosine_topk_ordering(spark):
    vecs = _vecs(spark)
    out = cosine_topk(
        vecs.filter("vec_id = 0"), vecs, "vec_id", "embedding", k=4
    ).collect()
    order = [r.neighbor_id for r in out]
    assert order[0] == 1  # most similar
    assert order[-1] == 3  # opposite vector last
    scores = {r.neighbor_id: r.cosine for r in out}
    assert scores[3] == -1.0 and scores[2] == 0.0


def test_cosine_topk_excludes_self(spark):
    vecs = _vecs(spark)
    out = cosine_topk(vecs, vecs, "vec_id", "embedding", k=10).collect()
    assert all(r.neighbor_id != r.query_id for r in out)


def test_hyperplane_buckets_deterministic_and_similar_collide(spark):
    vecs = _vecs(spark)
    b1 = {
        r.vec_id: r.lsh_bucket
        for r in random_hyperplane_buckets(vecs, "embedding", dim=3, n_planes=8).collect()
    }
    b2 = {
        r.vec_id: r.lsh_bucket
        for r in random_hyperplane_buckets(vecs, "embedding", dim=3, n_planes=8).collect()
    }
    assert b1 == b2  # seeded planes → deterministic
    assert b1[0] == b1[1]  # near-identical vectors share a bucket
    assert b1[0] != b1[3]  # opposite vectors never share (all signs flip)


def test_embedding_near_dup_pairs(spark):
    from aws_imdb_data_pipeline_spark.extensions import embedding_near_dup_pairs

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.999, 0.01]),  # cosine ~1 with 0
            (2, [0.0, 1.0]),     # orthogonal
            (3, [0.7, 0.7]),     # cos 0.707 with both axes
        ],
        ["vec_id", "embedding"],
    )
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(vecs, "vec_id", "embedding", 0.7).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 3) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert (0, 2) not in pairs  # orthogonal below threshold


def test_cosine_topk_lsh_structural_and_recall(spark, sf_dir):
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.extensions import cosine_topk, cosine_topk_lsh
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 20")
    truth = cosine_topk(q, emb, "vec_id", "embedding", k=5)
    approx = cosine_topk_lsh(
        q, emb, "vec_id", "embedding", dim=64, k=5, n_planes=4, probe_radius=1
    )
    tpairs = {(r.query_id, r.neighbor_id): r.cosine for r in truth.collect()}
    apairs = {(r.query_id, r.neighbor_id): r.cosine for r in approx.collect()}
    # scores must agree exactly where both report a pair
    for pair, cos in apairs.items():
        if pair in tpairs:
            assert abs(cos - tpairs[pair]) < 1e-9
    # deterministic seeded planes + fixed corpus → recall is fixed (0.46)
    recall = len(set(apairs) & set(tpairs)) / len(tpairs)
    assert recall >= 0.4
    assert all(a != b for (a, b) in apairs)  # never self-matches


def test_embedding_near_dup_lsh_recall_and_precision(spark, sf_dir):
    """The LSH-bucketed near-dup must be a strict subset of the brute
    pairs (exact-cosine verify → no false positives) with high recall
    on the planted near-dup corpus."""
    from aws_imdb_data_pipeline_spark.extensions import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    truth = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs_lsh(
            emb, "vec_id", "embedding", dim=64, threshold=0.4,
            n_planes=4, n_bands=16,
        ).collect()
    }
    assert set(approx) <= set(truth)  # may miss, must never invent
    for pair, cos in approx.items():
        assert abs(cos - truth[pair]) < 1e-9  # same exact cosine
    # seeded planes + fixed corpus → recall is deterministic; the
    # analytic expectation at cos≈0.43 with (4 planes, 16 bands) is
    # ~0.95 — assert a conservative floor
    assert len(approx) / len(truth) >= 0.8


def test_cosine_topk_ivf_recall_and_scores(spark, sf_dir):
    from aws_imdb_data_pipeline_spark.extensions import cosine_topk, cosine_topk_ivf
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 20")
    truth = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(q, emb, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk_ivf(
            q, emb, "vec_id", "embedding", k=5, n_lists=16, n_probe=4
        ).collect()
    }
    # scores agree exactly where both report a pair
    for pair, cos in approx.items():
        if pair in truth:
            assert abs(cos - truth[pair]) < 1e-9
    # seeded kmeans is deterministic per parallelism level, but the
    # centroids (and thus recall) shift with partition count —
    # observed 0.64 @ local[8], 0.77 @ local[32]; assert the floor
    recall = len(set(approx) & set(truth)) / len(truth)
    assert recall >= 0.55
