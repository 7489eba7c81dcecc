from aws_imdb_data_pipeline_spark.extensions.dedup import (
    exact_dedup,
    shingle,
    shingle_docs,
    minhash_signatures,
    lsh_candidate_pairs,
    jaccard_on_shingles,
    minhash_dedup_pairs,
    simhash64,
    simhash_near_dup_pairs,
)
from aws_imdb_data_pipeline_spark.extensions.similarity import (
    with_norm,
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    random_hyperplane_buckets,
    auto_lsh_params,
    lsh_band_buckets,
    lsh_candidate_pairs_embedding,
)
from aws_imdb_data_pipeline_spark.extensions.pq import (
    cosine_topk_ivf_pq,
    pq_encode,
    train_pq,
)
from aws_imdb_data_pipeline_spark.extensions.ivf import (
    build_ivf_assignments,
    cosine_topk_ivf,
)
from aws_imdb_data_pipeline_spark.extensions.textstats import (
    token_stats,
    language_id,
    quality_score,
)

__all__ = [
    "exact_dedup",
    "shingle",
    "shingle_docs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_on_shingles",
    "minhash_dedup_pairs",
    "simhash64",
    "simhash_near_dup_pairs",
    "with_norm",
    "cosine_topk",
    "cosine_topk_lsh",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_lsh",
    "random_hyperplane_buckets",
    "auto_lsh_params",
    "lsh_band_buckets",
    "lsh_candidate_pairs_embedding",
    "build_ivf_assignments",
    "cosine_topk_ivf",
    "cosine_topk_ivf_pq",
    "pq_encode",
    "train_pq",
    "token_stats",
    "language_id",
    "quality_score",
]
