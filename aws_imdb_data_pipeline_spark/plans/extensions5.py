"""Fifth extensions batch (round 8): consumers of the per-corpus-
version token-stats artifact (extensions.tokenindex) beyond the
rewired round-7 queries — tokenizer-sizing vocabulary coverage, BM25
hard-negative mining, and reciprocal-rank-fusion hybrid retrieval
(lexical BM25 + dense cosine). All fully SQL-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.extensions4 import (
    _QUERY_MOD_SQL,
    _QUERY_PARAMS_CTE,
)
from aws_imdb_data_pipeline_spark.operators.localframe import local_literal_frame
from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.plans.strata import (
    TRUTH_DOC_CAP,
    quadratic_modulus,
)
from aws_imdb_data_pipeline_spark.sources.tables import load_table

_COVERAGE_SIZES = (5, 10, 20)


def _retrieval_query_mod(spark: SparkSession, sf_dir: str) -> int:
    """The retrieval family's shared query-batch modulus (20 * S,
    plans/strata.py law): 20 — the historical set — at sf <= 1, larger
    above so exact batch x corpus scoring stays per-host-bounded.
    n_docs is the token-stats artifact's exact marker integer (a
    plan-time constant, no job)."""
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import token_stats

    return 20 * quadratic_modulus(
        token_stats(spark, sf_dir).n_docs, TRUTH_DOC_CAP
    )


@register(
    "vocab_coverage",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '\s+'),
                   w -> w <> '')) AS t
        FROM documents
    ),
    cf AS (SELECT t, COUNT(*) AS cf FROM toks GROUP BY t),
    total AS (SELECT SUM(cf) AS n FROM cf),
    ranked AS (
        SELECT cf, row_number() OVER (ORDER BY cf DESC, t) AS rn FROM cf
    )
    SELECT v.vocab_size,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(r.cf) AS BIGINT) AS covered_tokens,
           CAST(SUM(r.cf) AS BIGINT) / (SELECT n FROM total) AS coverage
    FROM (VALUES (5), (10), (20)) v(vocab_size)
    JOIN ranked r ON r.rn <= v.vocab_size
    GROUP BY v.vocab_size
    """,
    operators=("EXT-text", "EXT-tokenstats", "A1", "O1", "W4"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing coverage curve: for each candidate vocabulary
    size V, the fraction of all corpus token OCCURRENCES covered by
    the V most frequent terms (rank key (cf DESC, term) — exact
    integers, engine-deterministic). The curve a tokenizer budget
    decision reads off; at a real corpus the sizes are 32k/64k/128k —
    here (5, 10, 20) against the synthetic 31-term pool.

    Served from the token-stats artifact's vocabulary frame (dfl:
    term → corpus frequency) + the exact marker token total — no
    corpus scan at all. The global order-by is bounded: TakeOrdered
    over the VOCABULARY (not the corpus), pre-trimmed to max(V) rows
    before the single-partition rank window, so the plan stays
    parallel at a 10M-type vocabulary."""
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import token_stats
    from aws_imdb_data_pipeline_spark.operators.topk import top_k_global

    ts = token_stats(spark, sf_dir)
    vmax = max(_COVERAGE_SIZES)
    top = top_k_global(
        ts.dfl().select("lword", "cf"),
        order_by=[F.desc("cf"), F.col("lword")],
        k=vmax,
    )
    ranked = top.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("cf"), F.col("lword"))),
    )
    sizes = local_literal_frame(
        spark, [(v,) for v in _COVERAGE_SIZES], "vocab_size int"
    )
    return (
        ranked.join(F.broadcast(sizes), F.col("rn") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("cf").alias("covered_tokens"),
        )
        .select(
            "vocab_size",
            "n_types",
            "covered_tokens",
            (F.col("covered_tokens") / F.lit(int(ts.sum_dl))).alias(
                "coverage"
            ),
        )
    )


@register(
    "bm25_hard_negatives",
    oracle=rf"""
    WITH {_QUERY_PARAMS_CTE},
    ws AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    toks AS (
        SELECT doc_id, u.w AS t, len(ws) AS dl
        FROM ws, LATERAL unnest(ws) AS u(w)
    ),
    tf AS (
        SELECT doc_id, t, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
        FROM toks GROUP BY doc_id, t
    ),
    dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    stats AS (SELECT COUNT(*) AS n, AVG(len(ws)) AS avgdl FROM ws),
    q AS (
        SELECT DISTINCT doc_id AS query_id, u.w AS t
        FROM (SELECT doc_id, ws[1:6] AS qs FROM ws
              WHERE doc_id % {_QUERY_MOD_SQL} = 0),
             LATERAL unnest(qs) AS u(w)
    ),
    sc AS (
        SELECT q.query_id, tf.doc_id,
               ROUND(SUM(
                   ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * (1.2 + 1))
                   / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * tf.dl / s.avgdl))
               ), 4) AS score
        FROM q
        JOIN tf  ON tf.t = q.t
        JOIN dfq d ON d.t = q.t
        CROSS JOIN stats s
        WHERE tf.doc_id <> q.query_id
        GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, rank, doc_id, score
    FROM (
        SELECT query_id, doc_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        FROM sc)
    WHERE rank <= 3
    """,
    operators=("EXT-retrieval", "EXT-tokenstats", "J-bcast", "W2", "O2"),
)
def bm25_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-3 BM25 hits EXCLUDING the gold (source) document — the
    lexically-confusable negatives a retriever/embedding trainer pairs
    against the positive. Same self-retrieval query set as
    bm25_self_retrieval; the exclusion filters the (query, doc)
    posting rows before the score aggregate, so a gold document's
    postings never reach the ranking.

    Rides the token-stats artifact (SCALE.md §25): a second retrieval
    query against the SAME persisted posting frames — zero additional
    build cost over bm25_self_retrieval."""
    from aws_imdb_data_pipeline_spark.plans.extensions4 import (
        bm25_from_artifact,
    )

    return bm25_from_artifact(spark, sf_dir, k=3, exclude_self=True)


@register(
    "rrf_hybrid_retrieval",
    oracle=rf"""
    WITH {_QUERY_PARAMS_CTE},
    ws AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    toks AS (
        SELECT doc_id, u.w AS t, len(ws) AS dl
        FROM ws, LATERAL unnest(ws) AS u(w)
    ),
    tf AS (
        SELECT doc_id, t, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
        FROM toks GROUP BY doc_id, t
    ),
    dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    stats AS (SELECT COUNT(*) AS n, AVG(len(ws)) AS avgdl FROM ws),
    q AS (
        SELECT DISTINCT doc_id AS query_id, u.w AS t
        FROM (SELECT doc_id, ws[1:6] AS qs FROM ws
              WHERE doc_id % {_QUERY_MOD_SQL} = 0),
             LATERAL unnest(qs) AS u(w)
    ),
    sc AS (
        SELECT q.query_id, tf.doc_id,
               ROUND(SUM(
                   ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * (1.2 + 1))
                   / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * tf.dl / s.avgdl))
               ), 4) AS score
        FROM q
        JOIN tf  ON tf.t = q.t
        JOIN dfq d ON d.t = q.t
        CROSS JOIN stats s
        WHERE tf.doc_id <> q.query_id
        GROUP BY q.query_id, tf.doc_id
    ),
    lex AS (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INTEGER) AS lex_rank
        FROM sc
        QUALIFY lex_rank <= 10
    ),
    e AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM e GROUP BY vec_id
    ),
    dots AS (
        SELECT qe.vec_id AS query_id, c.vec_id AS neighbor_id,
               SUM(qe.x * c.x) AS dot
        FROM (SELECT * FROM e WHERE vec_id % {_QUERY_MOD_SQL} = 0) qe
        JOIN e c ON qe.i = c.i AND qe.vec_id <> c.vec_id
        GROUP BY 1, 2
    ),
    den AS (
        SELECT query_id, neighbor_id AS doc_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(dot / (nq.nrm * nc.nrm), 4) DESC,
                            neighbor_id) AS INTEGER) AS dense_rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
        QUALIFY dense_rank <= 10
    ),
    fused AS (
        SELECT COALESCE(l.query_id, d.query_id) AS query_id,
               COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rank, d.dense_rank,
               ROUND(COALESCE(1.0 / (60 + l.lex_rank), 0)
                     + COALESCE(1.0 / (60 + d.dense_rank), 0), 6)
                   AS rrf_score
        FROM lex l FULL OUTER JOIN den d
          ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT query_id, rank, doc_id, rrf_score, lex_rank, dense_rank
    FROM (
        SELECT *,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rank
        FROM fused)
    WHERE rank <= 5
    """,
    operators=(
        "EXT-retrieval", "EXT-sim", "EXT-tokenstats", "J-full", "W2", "O2",
    ),
)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion (Cormack et al.):
    fuse the BM25 lexical top-10 and the dense-cosine top-10 per query
    with rrf = Σ 1/(60 + rank), keep the fused top-5. The standard
    first-stage retriever for RAG/hard-negative pipelines — lexical
    catches exact-term matches dense embeddings miss, dense catches
    paraphrases lexical misses, and RRF needs no score calibration
    because it consumes only RANKS (integers — engine-deterministic
    after each list's rounded-score + id tiebreak ordering).

    Query set: every (20*S)th document (self excluded from both
    lists; S is the strata law's batch modulus — 1, the historical
    set, at sf <= 1); its embedding row shares the id space
    (vec_id == doc_id). Both input rankings are already oracled
    operators (bm25 family / ann_cosine_topk); the fusion itself is a
    FULL OUTER join on (query, doc) of two k-row-per-query frames —
    tiny regardless of corpus size — so hybrid costs nothing beyond
    its two retrievals. The lexical side rides the token-stats
    artifact (SCALE.md §25)."""
    from aws_imdb_data_pipeline_spark.extensions.similarity import cosine_topk
    from aws_imdb_data_pipeline_spark.plans.extensions4 import (
        bm25_from_artifact,
    )

    qmod = _retrieval_query_mod(spark, sf_dir)
    lex = bm25_from_artifact(
        spark, sf_dir, k=10, exclude_self=True, query_mod=qmod
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    emb = load_table(spark, sf_dir, "embeddings")
    den = cosine_topk(
        queries=emb.filter(F.col("vec_id") % qmod == 0),
        candidates=emb,
        id_col="vec_id",
        vec_col="embedding",
        k=10,
    )
    return _rrf_fuse(lex, den)


def _rrf_fuse(lex: DataFrame, den: DataFrame) -> DataFrame:
    """RRF tail shared by the exact and IVF-served hybrid retrievers:
    rank the dense (query_id, neighbor_id, cosine) frame, FULL OUTER
    the two k-row-per-query lists on (query, doc), score
    Σ 1/(60 + rank), keep the fused top-5."""
    from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group

    den = den.withColumn(
        "dense_rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine"), F.col("neighbor_id")
            )
        ),
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "dense_rank")
    fused = lex.join(den, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "lex_rank",
        "dense_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("dense_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    top = top_n_per_group(
        fused,
        partition_by=["query_id"],
        order_by=[F.desc("rrf_score"), F.col("doc_id")],
        n=5,
        rank_col="rank",
        keep_rank=True,
    )
    return top.select(
        "query_id", "rank", "doc_id", "rrf_score", "lex_rank", "dense_rank"
    )


@register("rrf_hybrid_retrieval_ivf", oracle=None, operators=(
    "EXT-retrieval", "EXT-sim", "EXT-tokenstats", "J-full", "W2", "O2",
))
def rrf_hybrid_retrieval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the hybrid retriever (round-8 verdict #4):
    identical RRF fusion and lexical leg as rrf_hybrid_retrieval, but
    the dense leg is SERVED from the persisted IVF index
    (extensions/ivf.py — centroid ranking over a tiny broadcast +
    a scan of the n_probe probed cell partitions) instead of the
    O(N·Q) brute cosine scan. Approximate dense ranks → rows-only;
    rrf_hybrid_ivf_check pins the contract (fused-top-5 overlap floor
    vs the exact form + the lexical leg bit-identical). n_probe=6 of
    16 lists ≈ 3/8 of the corpus scanned per query batch — the recall/
    cost knob (SCALE.md §19)."""
    from aws_imdb_data_pipeline_spark.extensions.ivf import cosine_topk_ivf
    from aws_imdb_data_pipeline_spark.plans.extensions import (
        _ivf_assignments_df,
    )
    from aws_imdb_data_pipeline_spark.plans.extensions4 import (
        bm25_from_artifact,
    )

    qmod = _retrieval_query_mod(spark, sf_dir)
    lex = bm25_from_artifact(
        spark, sf_dir, k=10, exclude_self=True, query_mod=qmod
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centers = _ivf_assignments_df(spark, sf_dir)
    den = cosine_topk_ivf(
        emb.filter(F.col("vec_id") % qmod == 0), emb, "vec_id", "embedding",
        k=10, n_probe=6, assignments=assigned, centers=centers,
        prune_lists=True,
    )
    return _rrf_fuse(lex, den)


@register(
    "corpus_hash_split_check",
    oracle="""
    SELECT * FROM (VALUES
        ('test',  CAST(0.05 AS DOUBLE), true, true),
        ('train', CAST(0.90 AS DOUBLE), true, true),
        ('val',   CAST(0.05 AS DOUBLE), true, true))
        AS t(split, target_frac, frac_within_tol, partition_invariant)
    """,
    operators=("EXT-corpus", "A2", "J1"),
)
def corpus_hash_split_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable INVARIANT companion to the rows-only
    corpus_hash_split_counts (round-7 verdict #6): xxhash64 split
    assignments can't be reproduced in ANSI SQL, but their contract
    can be verified as a fixed output the oracle pins exactly —

    - ``frac_within_tol``: each split's observed fraction is within
      3.5σ + 1/N of its target (σ = sqrt(p(1−p)/N), computed
      SPARK-SIDE from the corpus's own N, so the bound scales with
      the data instead of hard-coding a small-SF tolerance);
    - ``partition_invariant``: re-assigning after a repartition(7)
      yields the identical split for every document (the rand(seed)
      failure mode — a partition-layout-dependent stream — makes this
      false), and the join covers all N docs.

    A broken hash (everything in one split), drifted cut points, or
    layout-dependent assignment all flip a boolean and hash-mismatch
    against the pinned oracle. Statistical fine print: 3.5σ is a
    ~1/2000 false-alarm bound per split under the null; xxhash64 on
    distinct ids behaves binomial, and assignment is deterministic,
    so the check is stable across runs at every SF."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        hash_split_assignment,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = hash_split_assignment(docs, "doc_id")
    b = hash_split_assignment(docs.repartition(7), "doc_id").select(
        "doc_id", F.col("split").alias("split2")
    )
    inv = (
        a.join(b, "doc_id")
        .agg(
            F.sum(
                F.when(F.col("split") != F.col("split2"), 1).otherwise(0)
            ).alias("__mm"),
            F.count(F.lit(1)).alias("__pairs"),
        )
    )
    per = a.groupBy("split").agg(F.count(F.lit(1)).alias("__cnt"))
    tot = a.agg(F.count(F.lit(1)).alias("__N"))
    targets = local_literal_frame(
        spark,
        [("test", 0.05), ("train", 0.90), ("val", 0.05)],
        "split string, target_frac double",
    )
    sigma = F.sqrt(
        F.col("target_frac") * (1 - F.col("target_frac")) / F.col("__N")
    )
    return (
        targets.join(per, "split", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(inv))
        .select(
            "split",
            "target_frac",
            (
                F.abs(
                    F.coalesce(F.col("__cnt"), F.lit(0)) / F.col("__N")
                    - F.col("target_frac")
                )
                <= F.lit(3.5) * sigma + 1 / F.col("__N")
            ).alias("frac_within_tol"),
            (
                (F.col("__mm") == 0) & (F.col("__pairs") == F.col("__N"))
            ).alias("partition_invariant"),
        )
    )


@register(
    "token_stats_incremental_merge",
    oracle=r"""
    WITH aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
               array_to_string(string_split(text, ' ')[1:20], ' ')
        FROM documents WHERE doc_id % 9 = 0
    ),
    toks AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '\s+'),
                   w -> w <> '')) AS lword
        FROM aug
    ),
    tf AS (
        SELECT lword, COUNT(*) AS cf FROM toks GROUP BY lword
    ),
    dfq AS (
        SELECT lword, COUNT(DISTINCT doc_id) AS df FROM (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '')) AS lword
            FROM aug) GROUP BY lword
    )
    SELECT lword, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf
    FROM tf JOIN dfq USING (lword)
    """,
    operators=("EXT-tokenstats", "A3", "J-full", "U1"),
)
def token_stats_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the token-stats artifact: a new
    ingest batch (every 9th document re-shipped under a shifted id,
    truncated to its first 20 words — the crawl-refresh shape) updates
    the corpus vocabulary by ADDITIVE merge — tokenize the BATCH only,
    then FULL OUTER sum per-term (df, cf) against the persisted base
    vocabulary (extensions.tokenindex.merge_dfl). df/cf are mergeable
    statistics, so merged-counts == full-rebuild-counts exactly; the
    oracle verifies that identity by recomputing the augmented
    corpus's vocabulary from scratch. The tf side is append-only
    (disjoint doc ids) and needs no merge at all.

    Scale: per-ingest cost is O(batch tokens + vocabulary), never a
    base-corpus re-tokenize — the maintenance path that keeps the
    §25 artifact fresh between full version bumps."""
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import (
        batch_token_stats,
        merge_dfl,
        token_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shift = docs.agg((F.max("doc_id") + 1).alias("__shift"))
    batch = (
        docs.filter(F.col("doc_id") % 9 == 0)
        .crossJoin(F.broadcast(shift))
        .select(
            (F.col("doc_id") + F.col("__shift")).alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 20), " "
            ).alias("text"),
        )
    )
    ts = token_stats(spark, sf_dir)
    _btfl, bdfl = batch_token_stats(batch)
    merged = merge_dfl(ts.dfl(), bdfl)
    return merged.select(
        "lword",
        F.col("df").cast("bigint").alias("df"),
        F.col("cf").cast("bigint").alias("cf"),
    )


@register(
    "token_stats_retraction",
    oracle=r"""
    WITH kept AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0
    ),
    toks AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '\s+'),
                   w -> w <> '')) AS lword
        FROM kept
    ),
    tf AS (
        SELECT lword, COUNT(*) AS cf FROM toks GROUP BY lword
    ),
    dfq AS (
        SELECT lword, COUNT(DISTINCT doc_id) AS df FROM (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '')) AS lword
            FROM kept) GROUP BY lword
    )
    SELECT lword, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf
    FROM tf JOIN dfq USING (lword)
    """,
    operators=("EXT-tokenstats", "A3", "J1", "P2"),
)
def token_stats_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion propagation through the token-stats artifact: a
    right-to-be-forgotten list (every 37th document) is retracted from
    the persisted vocabulary by SUBTRACTING the deleted docs' per-term
    (df, cf) — computed from the artifact's own tfl rows via one
    semi-join, never a corpus re-tokenize — and dropping terms whose
    df reaches zero (extensions.tokenindex.retract_dfl). df/cf are
    mergeable in both directions, so retracted-counts ==
    rebuild-from-remaining-counts exactly; the oracle verifies that
    identity by recomputing the surviving corpus's vocabulary from
    scratch. The tf side is a plain anti-join (row deletion).

    Scale: per-deletion cost is O(deleted docs' tf rows + vocabulary)
    — at 100 TB a GDPR batch touches KB-to-MB of artifact, not the
    corpus."""
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import (
        retract_dfl,
        token_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    deleted = docs.filter(F.col("doc_id") % 37 == 0).select("doc_id")
    ts = token_stats(spark, sf_dir)
    out = retract_dfl(ts.dfl(), ts.tfl(), deleted)
    return out.select(
        "lword",
        F.col("df").cast("bigint").alias("df"),
        F.col("cf").cast("bigint").alias("cf"),
    )
