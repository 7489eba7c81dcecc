"""Training-data extension queries: dedup, text analysis, similarity
search — registered with SQL oracles wherever the computation is
engine-independent (everything except hash-seeded LSH internals).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.extensions.dedup import (
    minhash_dedup_pairs,
)
from aws_imdb_data_pipeline_spark.extensions.similarity import (
    augment_with_near_dups,
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)
from aws_imdb_data_pipeline_spark.extensions.textstats import (
    STOPWORDS,
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from aws_imdb_data_pipeline_spark.plans.fingerprints import (
    FP_SF0_001,
    FP_SF0_01,
    FP_SF0_1,
    embeddings_fingerprint,
    pinned_case_oracle,
)
from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import (
    load_table,
    table_col_max,
)

# Shipped-lake fingerprint keys for the build digests below, in
# (sf0.001, sf0.01, sf0.1) order.
_EMB_FP_PINS = (FP_SF0_001, FP_SF0_01, FP_SF0_1)


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------
@register(
    "dedup_exact_documents",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
    operators=("U2", "EXT-dedup"),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on the text hash, deterministic survivor
    (min doc_id). At 100 TB, group on a 64-bit fingerprint of the text
    instead of the full text to keep shuffle rows narrow."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("doc_id", "n_copies")


# ---------------------------------------------------------------------------
# Token statistics
# ---------------------------------------------------------------------------
@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_measured,
           CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS INTEGER)
               AS n_distinct_tokens,
           length(regexp_replace(text, '\s+', '', 'g'))
                 / len(string_split_regex(text, '\s+')) AS avg_token_len
    FROM documents
    """,
    operators=("EXT-text", "F1", "F8"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-doc stats — narrow projection,
    zero shuffle, scales linearly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return token_stats(docs).drop("text")


# ---------------------------------------------------------------------------
# Language ID heuristic
# ---------------------------------------------------------------------------
def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(string_split_regex(text, '\\s+')), "
        f"[{words}]))"
    )


@register(
    "lang_id_documents",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_lang_score_sql('en')} AS s_en,
               {_lang_score_sql('es')} AS s_es,
               {_lang_score_sql('fr')} AS s_fr,
               {_lang_score_sql('de')} AS s_de,
               {_lang_score_sql('zh')} AS s_zh
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) = 0 THEN 'unknown'
                WHEN s_zh = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'zh'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'fr'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'es'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'en'
                ELSE 'de' END AS lang_pred
    FROM scored
    """,
    operators=("EXT-text",),
)
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (ties break to the later language
    in sort order — mirrored exactly in the oracle CASE chain)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return language_id(docs).drop("text")


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------
@register(
    "quality_scores",
    oracle=r"""
    WITH base AS (
        SELECT doc_id,
               len(string_split_regex(text, '\s+')) AS n,
               len(list_distinct(string_split_regex(text, '\s+'))) AS nd,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
               length(regexp_replace(text, '\s+', '', 'g')) AS nonspace_chars
        FROM documents
    )
    SELECT doc_id,
           1.0 - nd / n AS repetition_ratio,
           alpha_chars / nonspace_chars AS alpha_ratio,
           (CASE WHEN n < 5 THEN 0.2 WHEN n > 1000 THEN 0.5 ELSE 1.0 END)
                 * (1.0 - least(1.0 - nd / n, 1.0) * 0.5)
                 * (0.5 + (alpha_chars / nonspace_chars) * 0.5) AS quality
    FROM base
    """,
    operators=("EXT-text", "P9"),
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristics per document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_score(docs).drop("text")


# ---------------------------------------------------------------------------
# Document fingerprint (grouped form — oracle-able end to end)
# ---------------------------------------------------------------------------
@register(
    "fingerprint_documents",
    oracle=r"""
    WITH n AS (
        SELECT doc_id,
               lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY norm) AS canonical_id,
           COUNT(*) OVER (PARTITION BY norm) AS n_copies
    FROM n
    """,
    operators=("EXT-dedup", "F17", "W3"),
)
def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit xxhash64 fingerprint of normalized text, emitted as its
    dup-grouping: per doc, the canonical (min) doc_id and copy count
    among docs sharing its fingerprint.

    ORACLED as of round 10 (retiring a permanent rows-only row): raw
    fp64 values are hash-family-specific and can never hash-match a
    cross-engine oracle, but the fingerprint's CONTRACT — equality iff
    normalized-text equality — makes the grouped form exactly
    SQL-expressible: grouping by fp64 must equal grouping by
    lower(collapsed-whitespace text). Every driver sample therefore
    verifies the fingerprint path end to end (a hash change, a
    normalization drift, or a collision all flip the grouping);
    injectivity booleans stay pinned separately by fingerprint_check.
    At 100 TB this is one 8-byte-key window shuffle — the raw
    per-doc fingerprint projection (zero shuffles) remains available
    as extensions.textstats.fingerprint."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = fingerprint(docs).drop("text")
    w = Window.partitionBy("fp64")
    return fp.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs (hash-seeded → rows-only check)
# ---------------------------------------------------------------------------
@register(
    "minhash_dedup_documents",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS g
        FROM w a
        JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_both
        FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           n_both * 1.0 / (sa.n + sb.n - n_both) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_both * 1.0 / (sa.n + sb.n - n_both) >= 0.9
    """,
    operators=("EXT-dedup",),
)
def minhash_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs verified by exact Jaccard, reported
    at the >= 0.9 DUPLICATE band on 3-gram shingles.

    ORACLED as of round 10 (retiring the last headline `no_oracle`
    row): the oracle is the exact-Jaccard ground truth — every pair of
    docs sharing a 3-gram shingle at Jaccard >= the reporting
    threshold. Every LSH-reported pair is exact-verified (no false
    positives, structural), so engine output equals ground truth
    value-for-value whenever banding recall is 1 at the threshold.

    THRESHOLD SCOPING (round 12, closing r11 what's-wrong #2): the
    VALUE query reports at j >= 0.9, where 16x4 banding's per-pair
    miss probability is (1-0.9^4)^16 ~ 4e-8 — exact equality is then
    a sound cross-engine contract at EVERY scale tried or plausible
    (expected misses stay << 1 up to ~10M true pairs, i.e. past
    sf1000 for this corpus family), not just on the pinned driver
    corpus. The r11 form reported at the 0.6 CANDIDATE threshold,
    where generated corpora (30-type vocab -> coincidental borderline
    pairs at j in [0.6, 0.8)) hit the banding tail exactly as
    p(j)=1-(1-j^4)^16 predicts (sf1: 2464/2475, zero FPs, every miss
    borderline — SCALE §43): correct engineering that still read ✗ in
    every generated-scale sweep log. On the pinned driver lakes the
    two forms emit IDENTICAL rows (all true pairs there sit at
    j >= 0.9). The 0.6-0.9 borderline band keeps full coverage via
    dedup_minhash_check's engine-independent recall-floor +
    zero-false-positive contract, which is the right instrument for a
    probabilistically-incomplete region; if a param change ever drops
    the >= 0.9 recall below 1, THIS query's hash row fails loudly and
    the params get re-tuned — desired behavior, not a flaky gate.
    jaccard is emitted RAW (quotients of identical integer operands
    are bitwise identical across engines; rounding a quotient can
    differ at decimal ties — see plans.relational.stable_avg).

    (Unigram shingles over this corpus's tiny vocabulary degenerate —
    every doc matches every doc, a quadratic result; 3-grams are the
    discriminative choice a real corpus needs.)

    SERVED from the persisted band-index artifact (round 9): the
    corpus is shingled/signed/banded once per corpus version by
    ensure_band_index; this query self-joins the index for candidates
    and re-shingles only candidate docs for the exact verify —
    output-identical to the one-shot minhash_dedup_pairs (same
    params, same bucket kernel; equivalence pinned in
    tests/test_dedup.py), without the corpus recompute or the
    shingle-table persist pin the one-shot form needs."""
    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        minhash_pairs_from_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    return minhash_pairs_from_index(
        docs, ensure_band_index(spark, sf_dir), "doc_id", "text",
        threshold=0.9,
    ).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (JVM-side bit-vote fingerprints → banded hamming join)
# ---------------------------------------------------------------------------
def ensure_simhash_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing the corpus SimHash fingerprint table
    ((doc_id, simhash) parquet — lifecycle.artifacts convention, same
    staleness key and completion-marker contract as ensure_band_index):
    the corpus is tokenized/bit-voted ONCE per corpus version; every
    consumer (the near-dup query, all four simhash_check legs) serves
    from a 16-byte-per-doc parquet scan instead of re-fingerprinting."""
    from aws_imdb_data_pipeline_spark.extensions.dedup import simhash64
    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import (
        ensure_artifact,
    )

    params = dict(bits=64, tokenizer="ws")

    def build(path: str, fp: str) -> dict:
        docs = load_table(spark, sf_dir, "documents")
        simhash64(docs.select("doc_id", "text"), "text").select(
            "doc_id", "simhash"
        ).write.mode("overwrite").parquet(os.path.join(path, "fps"))
        return {"params": params}

    path, _, _ = ensure_artifact(
        "simhash_index", sf_dir,
        os.path.join(sf_dir, "documents.parquet"),
        params, build,
    )
    return path


@register("simhash_near_dup_documents", oracle=None, operators=("EXT-dedup",))
def simhash_near_dup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (64-bit, explode→xxhash64→bit-vote aggregates, all
    JVM-side) + banded hamming-distance join. Fingerprints are
    hash-family-specific → rows-only check; pytest verifies hamming
    properties on planted near-dups; the banding/brute contract is
    pinned by simhash_check.

    SERVED from the persisted fingerprint artifact (round 10): the
    corpus is fingerprinted once per version by ensure_simhash_index;
    the query is the banded hamming join over that parquet —
    output-identical to fingerprinting inline (simhash64 is
    deterministic; hamming_near_dup_pairs is the same kernel)."""
    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        hamming_near_dup_pairs,
    )

    fps = spark.read.parquet(
        os.path.join(ensure_simhash_index(spark, sf_dir), "fps")
    )
    return hamming_near_dup_pairs(
        fps, "doc_id", "simhash", max_hamming=3, bands=4
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (brute force, oracle-verified)
# ---------------------------------------------------------------------------
@register(
    "embedding_near_dup",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm, v FROM v)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.4
    """,
    operators=("EXT-sim", "EXT-dedup"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.4 (brute-force oracle
    baseline — O(N^2) by design so the LSH path below has exact truth
    to be measured against; `embedding_near_dup_lsh` is the scale
    entry point).

    Oracle form (round 12, r11 next-round #5): list_dot_product over
    DOUBLE[] instead of the unnest-to-64-rows self-join — DuckDB's
    vectorized list kernel accumulates in index order exactly like
    Spark's aggregate-over-zip_with fold, so the doubles are
    BIT-IDENTICAL to the old form (verified row-for-row at sf0.1),
    while the oracle stops materializing a pairs x dims row
    explosion: 8M pairs/s measured, which carries full-value ground
    truth past sf1 (200M pairs in ~25 s) where the unnest form blew
    the 300 s sweep timeout at generated sf0.3+."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb = emb.repartition(spark.sparkContext.defaultParallelism)
    return embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4)


@register("embedding_near_dup_lsh", oracle=None, operators=("EXT-sim", "EXT-dedup"))
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL-STRESS variant of the LSH near-dup path: threshold 0.4
    sits near the p(0) = 0.5 random-collision noise floor, the hardest
    regime for cosine banding — candidates only drop to ~0.28x brute
    here, so this query exists to measure recall under pressure, not to
    demonstrate asymptotics (that is `embedding_near_dup_scale`, the
    canonical scale query at the realistic 0.8 threshold). Approximate
    by design → rows-only check; recall + candidate bound asserted in
    tests/test_similarity.py. (No repartition before the bucketing pass
    — extra Python tasks cost more than they parallelize at this size;
    the groupBy shuffle re-spreads the work anyway.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", dim=64, threshold=0.4,
    )


@register(
    "embedding_near_dup_scale",
    oracle="""
    WITH v0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dup AS (
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(
                   generate_series(1, len(v)),
                   i -> v[i] + 0.2 * (CAST((vec_id * 73 + (i - 1) * 179)
                                           % 97 AS DOUBLE) / 97.0 - 0.5)
               ) AS v
        FROM v0 WHERE vec_id % 10 = 0
    ),
    e AS (SELECT * FROM v0 UNION ALL SELECT * FROM dup),
    n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm, v FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.8
    """,
    operators=("EXT-sim", "EXT-dedup"),
)
def embedding_near_dup_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANONICAL LSH scale query: near-dup pairs at the realistic 0.8
    threshold over the corpus augmented with deterministic planted
    near-duplicates (`augment_with_near_dups` — every 10th vector gets
    a copy at cosine ≈ 0.89–0.93, reproduced exactly by the oracle's
    integer-arithmetic noise). Here banding pays off asymptotically:
    auto_lsh_params lands at (9, 17) bands for N=550 / (11, 28) for
    N=2200 and candidates fall to 4.0% / 1.8% of brute — the ratio
    SHRINKS as N grows (sub-quadratic), vs the constant-factor 0.28x
    of the 0.4-threshold stress query. Verification is the exact
    cosine, and every planted pair collides in >= 1 band with the
    production seed while background pairs top out at cosine 0.60, so
    the approximate path reproduces the exact answer and a full SQL
    oracle (not rows-only) checks it — precision AND recall = 1 here,
    asserted independently in tests/test_similarity.py.

    SCOPE (round 11, SCALE §43): recall-1.0 is a measured property of
    the SHIPPED corpora+seed, not a guarantee — sign-LSH band
    collision is probabilistic (~0.5% miss per planted pair at the
    auto-chosen params), and the generated-sf0.3 sweep drew exactly
    one miss (1 of 600 planted twins, cosine 0.9088, zero false
    positives). On non-pinned corpora the contract is
    embedding_lsh_neardup_check's recall floor, which stayed green."""
    emb = load_table(spark, sf_dir, "embeddings")
    aug = augment_with_near_dups(emb, "vec_id", "embedding", every=10, eps=0.2)
    return embedding_near_dup_pairs_lsh(
        aug, "vec_id", "embedding", dim=64, threshold=0.8,
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (ANN baseline)
# ---------------------------------------------------------------------------
@register(
    "ann_cosine_topk",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.x * c.x) AS dot
        FROM (SELECT * FROM e WHERE vec_id < 5) q
        JOIN e c ON q.i = c.i AND q.vec_id <> c.vec_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               ROUND(dot / (nq.nrm * nc.nrm), 4) AS cosine
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
    operators=("EXT-sim", "W2"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 5, computed
    with built-in higher-order functions (zip_with/aggregate — JVM-side).
    Scale path: broadcast query side; LSH bucketing for all-pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        queries=emb.filter(F.col("vec_id") < 5),
        candidates=emb,
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    )


@register("ann_cosine_topk_lsh", oracle=None, operators=("EXT-sim",))
def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH approximate top-k (the scale path for
    ann_cosine_topk when the query set is too large to broadcast):
    candidates share a bucket with the query in >= 1 band, then exact
    cosine + per-query top-k. (planes, bands) auto-derived from corpus
    size. Approximate by design -> rows-only check; tests measure
    recall vs brute force (>= 0.85 on this corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(
        emb.filter(F.col("vec_id") < 5), emb, "vec_id", "embedding",
        dim=64, k=5,
    )


@register(
    "ngram_jaccard_pairs",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents WHERE doc_id < 30
    ),
    sh AS (
        SELECT DISTINCT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS g
        FROM w a
        JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_both
        FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           n_both * 1.0 / (sa.n + sb.n - n_both) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_both > 0
    """,
    operators=("EXT-dedup", "F1"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for every overlapping doc pair among
    doc_id < 30 — the verification kernel of the MinHash pipeline,
    exposed directly and SQL-verified. Raw int-quotient output
    (cross-engine bitwise-stable)."""
    from aws_imdb_data_pipeline_spark.extensions.dedup import shingle_docs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sh = shingle_docs(docs, "doc_id", "text", k=3)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("__shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("__shingles").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                * F.lit(1.0)
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") > 0)
    )


@register(
    "multimodal_doc_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS payload_bytes,
           512 AS feature_dim
    FROM documents
    """,
    operators=("EXT-multimodal",),
)
def multimodal_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal plumbing driven end-to-end with an oracle: text
    encoded to binary payloads, features extracted via Arrow-batched
    mapInPandas (the stub decode kernel), verifiable sizes out.
    Proves schema/batching/UDF signature against SQL semantics
    (payload hash is engine-specific and excluded here)."""
    from aws_imdb_data_pipeline_spark.extensions.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "payload_bytes",
        "feature_dim",
    )


@register(
    "multimodal_wav_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(44 + 2 * octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST((octet_length(encode(text)) * 1000) // 8000 AS BIGINT) AS duration_ms
    FROM documents
    """,
    operators=("EXT-multimodal",),
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip with a SQL oracle: each document's UTF-8
    bytes become PCM-16 samples, encoded to a WAV container (stdlib
    codec, 44-byte header) in one Arrow-batched UDF, then decoded back
    by the real `extract_features` WAV kernel. The decoded sample
    count, rate, duration and container size are all predictable from
    `octet_length(encode(text))` — so the full encode→binary-column→decode
    path is oracle-verified, not just row-counted."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from aws_imdb_data_pipeline_spark.extensions.codecs import encode_wav_pcm16
    from aws_imdb_data_pipeline_spark.extensions.multimodal import extract_features

    @pandas_udf("binary")
    def to_wav(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: encode_wav_pcm16(
                np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int16),
                8000,
            )
        )

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        to_wav("text").alias("payload"),
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return extract_features(media).select(
        F.col("media_id").alias("doc_id"),
        "payload_bytes",
        "n_samples",
        "sample_rate",
        "duration_ms",
    )


@register(
    "repetition_signals",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS l FROM documents
    ), g AS (
        SELECT doc_id,
               list_transform(range(1, len(l)),
                              i -> l[i] || ' ' || l[i+1]) AS g2,
               list_transform(range(1, len(l) - 1),
                              i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS g3
        FROM toks
    )
    SELECT doc_id,
           CASE WHEN len(g2) > 0
                THEN (len(g2) - len(list_distinct(g2))) / len(g2) END
               AS dup_bigram_frac,
           CASE WHEN len(g2) > 0
                THEN list_max(list_transform(list_distinct(g2),
                         d -> len(list_filter(g2, x -> x = d)))) / len(g2) END
               AS top_bigram_frac,
           CASE WHEN len(g3) > 0
                THEN (len(g3) - len(list_distinct(g3))) / len(g3) END
               AS dup_trigram_frac,
           CASE WHEN len(g3) > 0
                THEN list_max(list_transform(list_distinct(g3),
                         d -> len(list_filter(g3, x -> x = d)))) / len(g3) END
               AS top_trigram_frac
    FROM g
    """,
    operators=("EXT-text",),
)
def repetition_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (duplicate-n-gram fraction, top-
    n-gram mass for n=2,3) via explode + two-level hash aggregation;
    the oracle recomputes both via DuckDB list lambdas (its top-gram
    count is the O(distinct^2) formulation — same numbers, different
    plan). See textstats.repetition_signals for why the exploded plan
    beats per-row array lambdas ~40x here."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import (
        repetition_signals,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(docs).drop("text")


@register(
    "dedup_keep_list",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id,
               lower(regexp_replace(text, '\s+', ' ', 'g')) AS ntext
        FROM documents
    )
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY ntext) AS survivor_id,
           doc_id = MIN(doc_id) OVER (PARTITION BY ntext) AS is_kept
    FROM norm
    """,
    operators=("EXT-dedup", "W1"),
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational dedup artifact: one row PER DOCUMENT with its
    canonical survivor (min doc_id among normalized-text duplicates)
    and the keep/drop decision — the frame a corpus build joins
    against, rather than the per-group summary `dedup_exact_documents`
    emits. One shuffle on the normalized text; at 100 TB partition on
    xxhash64(ntext) instead so shuffle rows stay narrow (the window
    only needs the hash for grouping, collisions then re-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    ntext = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    w = Window.partitionBy(ntext)
    survivor = F.min("doc_id").over(w)
    return docs.select(
        "doc_id",
        survivor.alias("survivor_id"),
        (F.col("doc_id") == survivor).alias("is_kept"),
    )


@register(
    "corpus_top_ngrams",
    oracle=r"""
    WITH toks AS (
        SELECT string_split_regex(text, '\s+') AS l FROM documents
    ), grams AS (
        SELECT unnest(list_transform(range(1, len(l) - 1),
                   i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
        FROM toks
    )
    SELECT gram, COUNT(*) AS n_occurrences
    FROM grams
    GROUP BY gram
    ORDER BY n_occurrences DESC, gram
    LIMIT 20
    """,
    operators=("EXT-text", "A1", "O3"),
)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detector: the globally most frequent
    word trigrams (count desc, gram asc tiebreak). Grams come from the
    codegen-only exploded_ngrams builder (posexplode + lead window);
    the count is one shuffle with map-side partial aggregation; the
    final top-k is TakeOrderedAndProject (no global sort). Head-heavy
    gram skew is exactly what partial agg absorbs — each map task
    collapses its local copies of a hot gram before the exchange."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import exploded_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = exploded_ngrams(docs, 3).select("gram")
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(20)
    )


@register(
    "source_quality_profile",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           SUM(n_chars) / COUNT(*) AS avg_chars,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(*) / (SELECT COUNT(*) FROM documents) AS corpus_share
    FROM documents
    GROUP BY source
    """,
    operators=("EXT-corpus", "A2", "A5"),
)
def source_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition report (doc counts, char volume,
    language spread, corpus share) — the table a mixture designer reads
    before setting sampling weights. Single aggregate shuffle on the
    low-cardinality source key; the corpus total rides along as a
    scalar subquery -> broadcast, not a second scan in the engine (the
    count reuses the grouped frame via a window-free cross join)."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars") / F.count(F.lit(1))).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    # corpus total via a whole-frame window over the ALREADY-AGGREGATED
    # rows (one per source — tens, not billions), so the raw table is
    # scanned once; the single-partition window touches only that tiny
    # summary, never the corpus.
    total = F.sum("n_docs").over(Window.partitionBy())
    return per_source.select(
        "source",
        "n_docs",
        "total_chars",
        "avg_chars",
        "n_langs",
        (F.col("n_docs") / total).alias("corpus_share"),
    )


_C4_STOPWORDS = STOPWORDS["en"]


@register(
    "c4_style_filters",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS l, text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(l) AS INTEGER) AS n_words,
           len(list_filter(l, w -> list_contains(
               [{", ".join(f"'{w}'" for w in _C4_STOPWORDS)}], w))) / len(l)
               AS stopword_frac,
           length(regexp_replace(text, '\s+', '', 'g')) / len(l)
               AS mean_word_len,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
               / length(regexp_replace(text, '\s+', '', 'g')) AS symbol_frac,
           (len(l) >= 10 AND len(l) <= 100000
            AND length(regexp_replace(text, '\s+', '', 'g')) / len(l)
                BETWEEN 2 AND 12
            AND length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                / length(regexp_replace(text, '\s+', '', 'g')) <= 0.1)
               AS keep
    FROM t
    """,
    operators=("EXT-text", "P9"),
)
def c4_style_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style hard document filters: word-count bounds, mean word
    length band, symbol-character ratio cap, stopword fraction — and
    the resulting keep/drop decision. Pure per-row column math (one
    projection, no shuffle); the oracle recomputes every ratio and the
    boolean in SQL so the filter thresholds themselves are verified,
    not just the plumbing."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), r"\s+")
    n_words = F.size(words)
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    symbols = F.length(
        F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", "")
    )
    stop_arr = F.array(*[F.lit(w) for w in _C4_STOPWORDS])
    stopword_cnt = F.size(
        F.filter(words, lambda w: F.array_contains(stop_arr, w))
    )
    mean_word_len = nonspace / n_words
    symbol_frac = symbols / nonspace
    keep = (
        (n_words >= 10)
        & (n_words <= 100000)
        & mean_word_len.between(2, 12)
        & (symbol_frac <= 0.1)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        (stopword_cnt / n_words).alias("stopword_frac"),
        mean_word_len.alias("mean_word_len"),
        symbol_frac.alias("symbol_frac"),
        keep.alias("keep"),
    )


# One coarse-quantizer artifact for the WHOLE curation/ANN family:
# semantic dedup, balanced sampling, cluster profiling, and IVF ANN all
# consume the same persisted (id, vec, __list) assignment table +
# centroid sidecar. Fit once per corpus version, serve everywhere —
# the round-5 versions each refit k-means inside their own query path
# (the pattern the PQ index graduated from in round 5).
_IVF_PARAMS = dict(n_lists=16, seed=42, max_iter=8, fit_fraction=0.25)


def ensure_ivf_assignments(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list[list[float]], bool]:
    """Build-if-missing the persisted IVF assignment artifact for the
    embeddings table: ``vectors/`` parquet partitioned by ``__list`` +
    centroids in the meta marker. Returns (path, centers, rebuilt)."""
    from aws_imdb_data_pipeline_spark.extensions.ivf import build_ivf_index
    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import (
        ensure_artifact,
    )

    def build(path: str, fp: str) -> dict:
        emb = load_table(spark, sf_dir, "embeddings")
        return build_ivf_index(
            emb, "vec_id", "embedding", path, **_IVF_PARAMS
        )

    path, meta, rebuilt = ensure_artifact(
        "ivf_assignments", sf_dir,
        os.path.join(sf_dir, "embeddings.parquet"),
        _IVF_PARAMS, build,
    )
    return path, meta["centers"], rebuilt


def _ivf_assignments_df(spark: SparkSession, sf_dir: str):
    """(vec_id, __arr, __list) from the shared artifact — the drop-in
    replacement for an in-call build_ivf_assignments fit."""
    from aws_imdb_data_pipeline_spark.extensions.ivf import load_ivf_index

    path, centers, _ = ensure_ivf_assignments(spark, sf_dir)
    return load_ivf_index(spark, path, id_col="vec_id"), centers


# Pinned literals for the two index-BUILD digests (r12 verdict #6):
# the builds are deterministic functions of (corpus, seed, params) —
# verified r13 across a fresh-artifact rebuild at different
# parallelism — so their realized stats + an exact assignment/code
# digest pin per shipped lake, keyed by the embeddings content
# fingerprint (plans/fingerprints.py). assign_xor/code_xor fold every
# (id, list[, codes]) row, so a single re-assigned vector flips them.
_IVF_BUILD_PINS: dict[int, tuple[int, int, int, int]] = {
    # fp -> (n_vectors, n_lists_used, n_lists, assign_xor)
    _EMB_FP_PINS[0]: (500, 16, 16, -8473816266937181842),
    _EMB_FP_PINS[1]: (500, 16, 16, -834943942916358902),
    _EMB_FP_PINS[2]: (2000, 16, 16, -5872643547823127812),
}
_PQ_BUILD_PINS: dict[int, tuple[int, int, int, int, int]] = {
    # fp -> (n_vectors, n_lists, m, pq_k, code_xor)
    _EMB_FP_PINS[0]: (500, 16, 8, 16, 4308313998994162996),
    _EMB_FP_PINS[1]: (500, 16, 8, 16, -3090231979991949085),
    _EMB_FP_PINS[2]: (2000, 16, 8, 16, 5602590119058578578),
}


def _unpinned_null_row(spark: SparkSession, fp: int, cols: list[str]):
    """The engine-side twin of the oracle CASE's no-match row: NULL
    stats on an unpinned lake (the build side effect still ran)."""
    sel = [F.lit(fp).cast("bigint").alias("corpus_fp")]
    sel += [F.lit(None).cast("bigint").alias(c) for c in cols]
    return spark.range(1).select(*sel)


@register(
    "ann_ivf_index_build",
    oracle=pinned_case_oracle(
        _IVF_BUILD_PINS,
        [("n_vectors", "BIGINT"), ("n_lists_used", "BIGINT"),
         ("n_lists", "BIGINT"), ("assign_xor", "BIGINT")],
    ),
    operators=("EXT-sim",),
)
def ann_ivf_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer BUILD step as its own entry (seeded sampled
    k-means fit + one assignment pass, persisted as __list-partitioned
    parquet + centroid sidecar). Build-if-missing; registered before
    its four consumers (semantic dedup, balanced sample, cluster
    profile, IVF ANN) so they always serve warm with ZERO quantizer
    fits in their query paths. ORACLED r13 with pinned literals over
    the full assignment table (bit_xor of xxhash64(vec_id, __list)),
    keyed by the embeddings content fingerprint; NULL-keyed (both
    sides) on unpinned lakes, where the recall checks carry coverage."""
    fp = embeddings_fingerprint(spark, sf_dir)
    assigned, centers = _ivf_assignments_df(spark, sf_dir)
    if fp not in _IVF_BUILD_PINS:
        return _unpinned_null_row(
            spark, fp, ["n_vectors", "n_lists_used", "n_lists", "assign_xor"]
        )
    return assigned.agg(
        F.lit(fp).cast("bigint").alias("corpus_fp"),
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("__list").alias("n_lists_used"),
        F.lit(len(centers)).cast("bigint").alias("n_lists"),
        F.expr("bit_xor(xxhash64(vec_id, __list))").alias("assign_xor"),
    )


@register("embedding_cluster_sizes", oracle=None, operators=("EXT-sim",))
def embedding_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus topic-balance profile: k-means cell occupancy over the
    embedding space, READ FROM the shared assignment artifact (zero
    fits in the query path — a groupBy over one small int column that
    parquet partition values already materialize). Cell ids are
    engine/seed-specific -> rows-only; the pytest suite asserts the
    partition property (sizes sum to N, no rows lost)."""
    assigned, _ = _ivf_assignments_df(spark, sf_dir)
    return (
        assigned.groupBy(F.col("__list").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster_id")
    )


@register(
    "text_bpe_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS INTEGER) AS n_bpe_tokens,
           CAST(len(list_filter(
                    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                    t -> regexp_matches(t, '^[A-Za-z]+$')))
               AS INTEGER) AS n_alpha_tokens
    FROM documents
    """,
    operators=("EXT-text",),
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-pre-tokenizer-style token counts (alpha runs / digit runs /
    punctuation marks), oracle-verified regex semantics."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import bpe_ish_token_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_ish_token_count(docs).drop("text")


@register("ann_cosine_topk_ivf", oracle=None, operators=("EXT-sim",))
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means coarse quantizer) approximate top-k SERVED FROM the
    shared assignment artifact — the data-adaptive ANN path: recall
    0.77 at 25% corpus scan on this corpus (vs 0.46@31% for oblivious
    sign-LSH). Zero quantizer fits in the query path: the serve plan is
    centroid ranking (tiny broadcast) + a scan of the probed __list
    partitions. Approximate -> rows-only; tests measure recall vs
    brute force."""
    from aws_imdb_data_pipeline_spark.extensions.ivf import cosine_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centers = _ivf_assignments_df(spark, sf_dir)
    return cosine_topk_ivf(
        emb.filter(F.col("vec_id") < 5), emb, "vec_id", "embedding",
        k=5, n_probe=4, assignments=assigned, centers=centers,
        prune_lists=True,
    )


_PQ_INDEX_PARAMS = dict(
    dim=64, m=8, pq_k=16, n_lists=16, seed=42, fit_fraction=0.25
)


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> tuple[str, bool]:
    """Build-if-missing-or-stale the persisted IVF-PQ index for the
    embeddings table of ``sf_dir`` (lifecycle.artifacts convention:
    stat-based fingerprint, completion marker written by the builder
    after the data lands). Returns (index_path, rebuilt). The artifact
    is reused across every query/bench invocation in a round — nobody
    retrains an ANN index per query batch."""
    from aws_imdb_data_pipeline_spark.extensions.pq import (
        build_pq_index,
        read_pq_index_meta,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import (
        ensure_artifact,
    )

    p = _PQ_INDEX_PARAMS

    def build(path: str, fp: str) -> None:
        emb = load_table(spark, sf_dir, "embeddings")
        build_pq_index(
            emb, "vec_id", "embedding", p["dim"], path,
            m=p["m"], pq_k=p["pq_k"], n_lists=p["n_lists"], seed=p["seed"],
            fit_fraction=p["fit_fraction"], fingerprint=fp,
        )
        return None  # build_pq_index wrote its own meta.json marker

    path, _, rebuilt = ensure_artifact(
        "pq_index", sf_dir,
        os.path.join(sf_dir, "embeddings.parquet"),
        p, build, meta_reader=read_pq_index_meta,
    )
    return path, rebuilt


@register(
    "ann_pq_index_build",
    oracle=pinned_case_oracle(
        _PQ_BUILD_PINS,
        [("n_vectors", "BIGINT"), ("n_lists", "BIGINT"), ("m", "BIGINT"),
         ("pq_k", "BIGINT"), ("code_xor", "BIGINT")],
    ),
    operators=("EXT-sim",),
)
def ann_pq_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ index BUILD step as its own entry (train 8 subspace
    codebooks + IVF coarse quantizer, encode the corpus, persist
    (id, vec, __list, __codes) parquet partitioned by __list + a
    codebook sidecar). Build-if-missing: the one corpus-sized pass is
    paid once per dataset version; subsequent invocations verify the
    fingerprint and return the index stats without touching data.
    Registered BEFORE the serve query so serve always reads a warm
    artifact. ORACLED r13 with pinned literals over the full encoded
    index (bit_xor of xxhash64(id, __list, __codes) — any re-encoded
    vector flips it), fingerprint-keyed; the former ``rebuilt`` column
    (warm-vs-cold, inherently non-deterministic) is dropped from the
    registered output — callers needing it use ensure_pq_index."""
    fp = embeddings_fingerprint(spark, sf_dir)
    path, _ = ensure_pq_index(spark, sf_dir)
    from aws_imdb_data_pipeline_spark.extensions.pq import load_pq_index

    index_df, meta = load_pq_index(spark, path)
    if fp not in _PQ_BUILD_PINS:
        return _unpinned_null_row(
            spark, fp, ["n_vectors", "n_lists", "m", "pq_k", "code_xor"]
        )
    return index_df.agg(
        F.lit(fp).cast("bigint").alias("corpus_fp"),
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("__list").alias("n_lists"),
        F.lit(meta["m"]).cast("bigint").alias("m"),
        F.lit(meta["pq_k"]).cast("bigint").alias("pq_k"),
        F.expr("bit_xor(xxhash64(id, __list, __codes))").alias("code_xor"),
    )


@register("ann_cosine_topk_ivf_pq", oracle=None, operators=("EXT-sim",))
def ann_cosine_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k SERVED FROM THE PERSISTED INDEX — the
    MEMORY-scale ANN path: 8-byte codes instead of 256-byte raw
    vectors (32x), ADC lookup scoring (m element_at chains per pair,
    no per-pair dot product), exact cosine re-rank of an 8k-per-query
    shortlist. No training in the query path: codes + codebooks come
    from the ann_pq_index_build artifact, and probing the 4/16
    nearest cells prunes the __list-partitioned parquet to 25% of
    files. Approximate -> rows-only; recall + twin-retrieval pinned
    in tests/test_similarity.py."""
    from aws_imdb_data_pipeline_spark.extensions.pq import (
        cosine_topk_ivf_pq_from_index,
    )

    path, _ = ensure_pq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf_pq_from_index(
        emb.filter(F.col("vec_id") < 5), spark, path, "vec_id", "embedding",
        k=5, n_probe=4, refine_factor=8,
    )


@register(
    "fuzzy_part_name_pairs",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_distance
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 100 AND b.p_partkey < 100
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
    operators=("EXT-dedup", "F-fuzzy"),
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (F.levenshtein — identical DP
    semantics across engines). Bounded to a small key range: pairwise
    edit distance is the verify kernel; the EXACT scale path (lossless
    q-gram prefix blocking, no cross join) is
    operators/fuzzyjoin.py::qgram_edit_join, registered as
    fuzzy_name_pairs_blocked / fuzzy_name_groups (extensions6)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    a = part.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = part.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 3)
    )


@register(
    "dedup_components",
    oracle="""
    WITH RECURSIVE w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents WHERE doc_id < 30
    ),
    sh AS (
        SELECT DISTINCT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS g
        FROM w a
        JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT i.id_a, i.id_b
        FROM (
            SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_both
            FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
            GROUP BY 1, 2
        ) i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE i.n_both > 0
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
    FROM reach GROUP BY a
    """,
    operators=("EXT-dedup", "EXT-graph"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-3-gram pairs (any overlap, doc_id < 30)
    consolidated into connected components via iterative min-label
    propagation — verified against a recursive-CTE transitive closure.
    The component label (min reachable id) IS the canonical survivor."""
    from aws_imdb_data_pipeline_spark.extensions.clusters import (
        connected_components,
    )
    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        shingle_docs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sh = shingle_docs(docs, "doc_id", "text", k=3)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("__shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("__shingles").alias("sh_b"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") > 0)
    )
    return connected_components(pairs).withColumnRenamed("node", "doc_id")


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs corpus (exact + band-index near-dup)
# ---------------------------------------------------------------------------
# The "newly arrived" batch is a simulated RE-CRAWL: every 7th corpus
# doc comes back with a fresh id and identical text — the dominant
# real-world incremental-dedup case (the same page fetched again). The
# corpus is the full documents table. Both sides are deterministic
# projections of the table, so the oracle can state the expected
# matches in pure SQL. The id shift is DATA-DERIVED (max(doc_id) + 1,
# the same scalar subquery in the oracle) so the batch/corpus id
# namespaces stay disjoint at ANY scale factor — a fixed constant
# silently collided once doc_id outgrew it, and the incremental-dedup
# contract ("ids unique across batch + corpus") would have dropped
# genuine matches via its id != new_id filter. The scalar resolves
# DRIVER-SIDE (a bounded one-row aggregate, the same plan-time-decision
# shape as the PQ probed-cell collect) rather than as a lazy 1-row
# cross join: the batch lineage fans out 5× inside the near-dup plan,
# and a lazy shift would replicate a max-scan + nested-loop join into
# every branch.
_RECRAWL_PRED = "doc_id % 7 = 0"


def _recrawl_batch(docs: DataFrame, sf_dir: str) -> DataFrame:
    # exact MAX from row-group statistics when available (no Spark job
    # at construction); the scan aggregate is the fallback fact
    mx = table_col_max(sf_dir, "documents", "doc_id")
    shift = (
        mx if mx is not None else docs.agg(F.max("doc_id")).first()[0]
    ) + 1
    return docs.filter(F.expr(_RECRAWL_PRED)).select(
        (F.col("doc_id") + F.lit(shift)).alias("doc_id"), "text"
    )


@register(
    "dedup_incremental_exact",
    oracle="""
    WITH batch AS (
        SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
               text
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT b.doc_id AS new_doc_id,
           MIN(c.doc_id) AS corpus_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_corpus_copies
    FROM batch b JOIN documents c ON b.text = c.text
    GROUP BY b.doc_id
    """,
    operators=("EXT-dedup", "J1", "A1"),
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT dedup: which newly-arrived docs already exist
    in the corpus. The join key is the 64-bit text fingerprint
    (xxhash64) with an exact-text equality check behind it — at 100 TB
    the shuffle carries 8-byte hashes, never document bodies, and the
    full-text comparison runs only on hash-equal pairs (collision
    safety). In production the corpus hash column persists with the
    corpus and is never recomputed per batch; here both sides derive
    from the same table for oracle parity."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.xxhash64("text").alias("__fp"),
        F.col("text").alias("__ct"),
    )
    batch = _recrawl_batch(docs, sf_dir).select(
        F.col("doc_id").alias("new_doc_id"),
        F.xxhash64("text").alias("__fp"),
        F.col("text").alias("__bt"),
    )
    return (
        batch.join(corpus, "__fp")
        .filter(F.col("__bt") == F.col("__ct"))
        .groupBy("new_doc_id")
        .agg(
            F.min("corpus_doc_id").alias("corpus_doc_id"),
            F.count(F.lit(1)).alias("n_corpus_copies"),
        )
    )


def ensure_band_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing the corpus MinHash band index for the
    incremental near-dup query (lifecycle.artifacts convention — same
    staleness key and completion-marker contract as ensure_pq_index)."""
    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        build_minhash_band_index,
        read_band_index_meta,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import (
        ensure_artifact,
    )

    params = dict(k=3, num_hashes=64, bands=16)

    def build(path: str, fp: str) -> None:
        corpus = load_table(spark, sf_dir, "documents")
        build_minhash_band_index(
            corpus, "doc_id", "text", path, fingerprint=fp, **params
        )
        return None  # build_minhash_band_index wrote its own meta.json

    path, _, _ = ensure_artifact(
        "band_index", sf_dir,
        os.path.join(sf_dir, "documents.parquet"),
        params, build, meta_reader=read_band_index_meta,
    )
    return path


@register("dedup_incremental_near", oracle=None, operators=("EXT-dedup",))
def dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup: the new batch probes the PERSISTED corpus
    band index (built once per corpus version by ensure_band_index) —
    the batch's (band, bucket) rows are broadcast against the index,
    the corpus is never re-minhashed and never shuffled, and the
    exact-Jaccard verify re-shingles only corpus docs that appear in
    candidates. Every re-crawled doc MUST be found (Jaccard 1.0 with
    its source — identical shingle sets share every band, so LSH
    cannot miss them); that floor plus equivalence to the batch path
    is pinned in tests/test_dedup.py. Hash-family-specific banding ->
    rows-only."""
    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        incremental_near_dup_pairs,
    )

    path = ensure_band_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return incremental_near_dup_pairs(
        _recrawl_batch(docs, sf_dir), docs, path, "doc_id", "text", threshold=0.8
    ).select(
        "new_id", "corpus_id", F.round("jaccard", 4).alias("jaccard")
    )


@register("semantic_dedup_survivors", oracle=None, operators=("EXT-dedup", "EXT-sim"))
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table
    (extensions.similarity.semantic_dedup): k-means cells bound the
    pairwise cosine scan, >= 0.8 pairs form groups via connected
    components, min id per group survives. k-means cell assignment is
    engine-specific -> rows-only; group/survivor invariants are pinned
    in tests/test_similarity.py (planted twins collapse to one
    survivor, survivor determinism, component = min of its members).
    Served from the shared assignment artifact: zero k-means fits in
    the query path — the plan is a per-cell self-join + CC only."""
    from aws_imdb_data_pipeline_spark.extensions.similarity import (
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = _ivf_assignments_df(spark, sf_dir)
    return semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.8,
        assignments=assigned,
    ).orderBy("id")


@register("cluster_balanced_sample", oracle=None, operators=("EXT-corpus", "EXT-sim", "W1"))
def cluster_balanced_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced subsampling (extensions.similarity.
    cluster_balanced_sample): every k-means cell capped at 20 vectors,
    deterministic hash-ranked survivors. Returns per-cell before/after
    counts. k-means cells are engine-specific -> rows-only; cap and
    determinism invariants pinned in tests/test_similarity.py.

    Before/after counts come from ONE window pass over the shared
    assignment artifact (round 5 fit the quantizer twice per
    invocation — once in the sampler, once for the 'before' counts;
    now it fits zero times, scans once, and the cap accounting is a
    conditional count over the sampler's own within-cell ranks, so the
    groupBy reuses the window's hash partitioning with no extra
    exchange)."""
    from aws_imdb_data_pipeline_spark.extensions.similarity import (
        cell_hash_ranks,
    )

    assigned, _ = _ivf_assignments_df(spark, sf_dir)
    ranked = cell_hash_ranks(
        assigned.select(F.col("vec_id").alias("id"), "__list"), "id"
    )
    return (
        ranked.groupBy(F.col("__list").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(F.col("__rn") <= 20, 1)).alias("n_after"),
        )
        .orderBy("cell")
    )
