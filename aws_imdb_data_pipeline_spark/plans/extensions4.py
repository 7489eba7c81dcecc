"""Fourth extensions batch (round 7): lexical retrieval (BM25 top-k —
the sparse counterpart of the dense ANN family), canonical-source
exact dedup (keep-best policy instead of keep-first), and corpus
n-gram profiling. All fully SQL-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.plans.strata import (
    TRUTH_DOC_CAP,
    quadratic_modulus,
    quadratic_modulus_sql,
)
from aws_imdb_data_pipeline_spark.sources.tables import (
    load_table,
    table_col_max,
)

# Self-retrieval query batches are capped by the strata law (see
# plans/strata.py): on every shipped lake and the sf1 sweep the
# modulus is 1 (bit-identical to the historical % 20 form); above
# sf~1.4 the batch shrinks so batch x corpus work stays bounded.
_QUERY_PARAMS_CTE = (
    "params AS (SELECT "
    + quadratic_modulus_sql("documents", TRUTH_DOC_CAP)
    + " AS s)"
)
_QUERY_MOD_SQL = "(20 * (SELECT s FROM params))"


@register(
    "bm25_self_retrieval",
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
    operators=("EXT-retrieval", "A6", "J-bcast", "W2", "O2"),
)
def bm25_self_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-k (extensions.retrieval.bm25_topk) with a
    planted self-retrieval query set: every 20th document's first 6
    words form a query under its own id. (With this corpus's 31-word
    pool a 6-word prefix matches many documents and BM25's length
    normalization often ranks a shorter doc above the longer gold one
    — so gold-is-top-1 is NOT asserted; the oracle verifies every
    rank and score exactly instead.)

    The sparse counterpart of the ann_cosine_topk* family: corpus
    statistics (tf/df/dl/avgdl) are map-side-combinable aggregates,
    the query-term probe broadcasts into the posting join (the corpus
    never reshuffles per query batch), and ranking orders by the
    ROUNDED score with an id tiebreak — the float-policy move that
    keeps the order engine-portable (ln differs in the last ulp
    across libm implementations; at 4 decimals a rank flip needs the
    true score within ~1e-12 of a rounding boundary).

    Served from the per-corpus-version token-stats artifact
    (extensions.tokenindex, SCALE.md §25): the posting frames are
    persisted parquet, N/avgdl exact marker integers — a query batch
    pays only the broadcast probe + one (query, doc) aggregate, never
    a corpus re-tokenize."""
    return bm25_from_artifact(spark, sf_dir, k=3, exclude_self=False)


# (applicationId, token-stats artifact path, query_mod) -> exact
# candidate-row count (see bm25_from_artifact)
_CAND_ROWS_CACHE: dict[tuple, int] = {}


def bm25_from_artifact(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    exclude_self: bool,
    query_mod: int | None = None,
) -> DataFrame:
    """Shared serve path for the BM25 family (self-retrieval and
    hard-negative mining): self-retrieval queries (every (20*S)th
    doc's first 6 words) scored against the token-stats artifact's
    posting frames.

    ``query_mod`` defaults to ``20 * quadratic_modulus(n_docs)``
    (plans/strata.py): S == 1 — the historical query set — on every
    shipped lake and at sf1; above that the batch shrinks so exact
    scoring stays per-host-bounded (with this corpus's ~31-word pool
    every term matches ~77% of documents, so per-query cost is
    Θ(corpus)). n_docs comes from the artifact's exact marker integer
    — a plan-time constant, no job."""
    from aws_imdb_data_pipeline_spark.extensions.retrieval import (
        bm25_candidate_rows,
        bm25_qterms,
        bm25_topk,
    )
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import token_stats

    ts = token_stats(spark, sf_dir)
    if query_mod is None:
        query_mod = 20 * quadratic_modulus(ts.n_docs, TRUTH_DOC_CAP)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") % query_mod == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(
                F.filter(
                    F.split(F.lower("text"), r"\s+"), lambda w: w != ""
                ),
                1, 6,
            ),
            " ",
        ).alias("qtext"),
    )
    tf = ts.tfl().select(
        "doc_id", F.col("lword").alias("__t"),
        F.col("tf").alias("__tf"), F.col("dl").alias("__dl"),
    )
    dfreq = ts.dfl().select(
        F.col("lword").alias("__t"), F.col("df").alias("__df")
    )
    # The adaptive pre-shuffle's plan fact (candidate rows) is a pure
    # function of (corpus version, query_mod): compute it once per
    # application and reuse — every bm25/rrf consumer of this serve
    # path shares the memo instead of re-running the vocabulary-sized
    # estimate job per query construction (r12 ADVICE kept bm25_scores
    # lazy via cand_rows; this supplies it).
    ck = (spark.sparkContext.applicationId, ts.path, query_mod)
    cand_rows = _CAND_ROWS_CACHE.get(ck)
    if cand_rows is None:
        cand_rows = bm25_candidate_rows(
            bm25_qterms(queries, "query_id", "qtext"), dfreq
        )
        _CAND_ROWS_CACHE[ck] = cand_rows
    return bm25_topk(
        docs, queries, id_col="doc_id", text_col="text",
        qid_col="query_id", qtext_col="qtext", k=k,
        corpus=(tf, dfreq, (ts.n_docs, ts.avgdl)),
        exclude_self=exclude_self, cand_rows=cand_rows,
    )


@register(
    "dedup_exact_keep_canonical",
    oracle="""
    WITH aug AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
               text, 'mirror'
        FROM documents WHERE doc_id % 9 = 0
    ),
    sc AS (SELECT source, COUNT(*) AS n_src FROM aug GROUP BY source),
    ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (
                   PARTITION BY d.text
                   ORDER BY s.n_src DESC, d.source, d.doc_id) AS rn
        FROM aug d JOIN sc s USING (source)
    )
    SELECT doc_id, source FROM ranked WHERE rn = 1
    """,
    operators=("EXT-dedup", "W2", "J-bcast", "A1"),
)
def dedup_exact_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a KEEP-BEST policy: within each exact-duplicate
    text group, survive the copy from the most-represented source
    (the canonical mirror), ties by source name then doc_id — the
    curation rule real pipelines use instead of keep-first when
    duplicates span mirrors of different trustworthiness. The fixture
    plants the duplicates (every 9th doc re-shipped verbatim under a
    shifted id from a low-volume 'mirror' source), so the policy
    demonstrably CHOOSES between copies: big-source originals beat
    their mirror copies, while originals from sources smaller than
    the mirror lose to it.

    Plan: source counts are a tiny broadcast dimension; the dup-group
    window partitions on ``xxhash64(text)`` — 8-byte shuffle keys, no
    document bodies through the exchange (the key_on_hash form; a
    2^-64 collision merges two groups, the standard trade — the
    oracle groups on raw text and still matches). One corpus shuffle
    total."""
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    # bounded one-row scalar (disjoint id namespace); exact MAX from
    # row-group statistics when available (no Spark job)
    mx = table_col_max(sf_dir, "documents", "doc_id")
    shift = (
        mx if mx is not None else base.agg(F.max("doc_id")).first()[0]
    ) + 1
    docs = base.unionByName(
        base.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + F.lit(shift)).alias("doc_id"),
            "text",
            F.lit("mirror").alias("source"),
        )
    )
    src_counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("__n_src")
    )
    from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group

    ranked = top_n_per_group(
        docs.join(F.broadcast(src_counts), "source").withColumn(
            "__grp", F.xxhash64("text")
        ),
        partition_by=["__grp"],
        order_by=[F.desc("__n_src"), F.col("source"), F.col("doc_id")],
        n=1,
    )
    return ranked.select("doc_id", "source")


@register(
    "corpus_trigram_topk",
    oracle=r"""
    WITH ws AS (
        SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    tri AS (
        SELECT array_to_string(ws[i : i + 2], ' ') AS trigram
        FROM ws, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(i)
        WHERE len(ws) >= 3
    )
    SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri GROUP BY trigram
    ORDER BY n DESC, trigram LIMIT 50
    """,
    operators=("EXT-text", "A1", "O1"),
)
def corpus_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 word trigrams — the n-gram profile a
    training-mix report leads with (boilerplate and template phrases
    surface here before any model sees them). Trigrams explode from a
    per-doc sequence transform (no self-joins); the count is a
    map-side-combinable aggregate and the global top-50 plans as
    TakeOrderedAndProject (per-partition heaps + a 50-row driver
    merge, never a full sort). Ties break by trigram text, so the cut
    is deterministic. At 100 TB swap the trigram string for its
    xxhash64 in the shuffle (the key_on_hash form used by
    remove_boilerplate_lines) and join the top keys back for display."""
    from aws_imdb_data_pipeline_spark.operators.topk import top_k_global

    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    tri = (
        docs.select(words.alias("__ws"))
        .filter(F.size("__ws") >= 3)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__ws") - 2),
                    lambda i: F.array_join(F.slice("__ws", i, 3), " "),
                )
            ).alias("trigram")
        )
    )
    counts = tri.groupBy("trigram").agg(F.count(F.lit(1)).alias("n"))
    return top_k_global(counts, [F.desc("n"), F.col("trigram")], 50)
