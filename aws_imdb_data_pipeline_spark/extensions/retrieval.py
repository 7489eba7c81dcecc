"""Lexical (sparse) retrieval over the document corpus: BM25 top-k.

The dense counterpart lives in extensions/similarity.py (brute /
LSH / IVF / IVF-PQ cosine ANN); a complete training-data and serving
stack also needs the lexical side — hard-negative mining, dedup
candidate generation, and hybrid retrieval all start from a BM25
ranking. The reference repo has no retrieval surface at all (its text
handling stops at LIKE filters, e.g. the Glue job's genre filters);
this is engine-extension territory, built Spark-first: the inverted
index IS a DataFrame aggregate, the query probe IS a broadcast join.

Scale shape (the part that matters at 100 TB):
- corpus statistics (term frequencies, document frequencies, document
  lengths, avgdl) are classic map-side-combinable aggregates — two
  hash shuffles keyed on (doc, term) and (term), rows shrink at every
  step;
- the QUERY side is small by definition (a query batch), so the
  index probe is a broadcast hash join of query terms against the
  posting frame — the corpus never reshuffles per query batch;
- in steady state the posting/statistic frames are the per-corpus-
  version token-stats artifact (extensions.tokenindex — tf/df/dl
  persisted once, N/avgdl exact integers in the marker) and each
  query batch pays only the broadcast probe + one (query, doc)
  aggregate. Pass the artifact via ``corpus=`` to get that path;
  crossover measured in SCALE.md §25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> "F.Column":
    # lower + split on runs of whitespace + drop empties: the same
    # normalization the oracle reproduces with regexp_split_to_array
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )


def bm25_corpus(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One-pass BM25 corpus statistics from raw text: (tf, dfreq,
    stats) where tf = (id, __t, __tf, __dl), dfreq = (__t, __df),
    stats = 1-row (__n, __avgdl).

    N and avgdl derive from the tf frame plus a tokenize-free COUNT(*)
    over docs (column-pruned scan) — NOT a second tokenized corpus
    scan (the round-7 ADVICE finding). Zero-token documents have no tf
    rows but still count toward N and the avgdl denominator, matching
    AVG(token_count) over all documents."""
    words = _tokens(text_col)
    toks = docs.select(
        F.col(id_col), F.size(words).alias("__dl"),
        F.explode(words).alias("__t"),
    )
    tf = toks.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    stats = (
        tf.groupBy(id_col)
        .agg(F.first("__dl").alias("__dl"))
        .agg(F.coalesce(F.sum("__dl"), F.lit(0)).alias("__s"))
        .crossJoin(F.broadcast(n_docs))
        .select("__n", (F.col("__s") / F.col("__n")).alias("__avgdl"))
    )
    return tf, dfreq, stats


def bm25_qterms(
    queries: DataFrame, qid_col: str = "query_id", qtext_col: str = "qtext"
) -> DataFrame:
    """Distinct (query, term) pairs — the qtf=1 convention shared by
    bm25_scores and the candidate estimate."""
    return queries.select(
        F.col(qid_col), F.explode(_tokens(qtext_col)).alias("__t")
    ).distinct()


def bm25_candidate_rows(qterms: DataFrame, dfreq: DataFrame) -> int:
    """The exact candidate-row count of the BM25 posting join
    (Σ over distinct (query, term) of df(term)) — the plan-time fact
    bm25_scores' adaptive pre-aggregate shuffle keys on. Exposed so
    serve paths can compute it once per (corpus, query set) and pass
    ``cand_rows`` instead of re-running the vocabulary-sized job per
    construction. One sub-second aggregate."""
    return (
        qterms.join(dfreq.select("__t", "__df"), "__t")
        .agg(F.sum("__df"))
        .first()[0]
    ) or 0


def bm25_scores(
    tf: DataFrame,
    dfreq: DataFrame,
    stats,
    queries: DataFrame,
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
    pre_shuffle_threshold: int = 64_000_000,
    cand_rows: int | None = None,
) -> DataFrame:
    """BM25 (query, doc) scores from prepared corpus frames —
    (qid_col, id_col, score). ``stats`` is either a 1-row DataFrame
    (__n, __avgdl) or an (n_docs, avgdl) scalar tuple (the artifact
    path: exact marker integers, no scan). ``pre_shuffle_threshold``
    is the candidate-row count above which the adaptive pre-aggregate
    shuffle engages (see the inline comment below; tests lower it to
    pin plan + value equivalence of the two forms).

    ``cand_rows`` keeps plan construction LAZY on hot serving paths
    (r12 ADVICE: the plan-time estimate is an eager vocabulary-frame
    job per invocation): pass the candidate count (Σ_t df over the
    batch's query terms) if the caller already knows or bounds it —
    0 pins the classic partial-agg plan, any value above the
    threshold pins the pre-shuffle plan. None (default) estimates it
    with the one sub-second aggregate, the right call for ad-hoc use
    where an unbounded explosion is worse than an eager job."""
    qterms = bm25_qterms(queries, qid_col, qtext_col)
    posting = tf.join(dfreq, "__t")
    if isinstance(stats, DataFrame):
        posting = posting.crossJoin(F.broadcast(stats))
    else:
        n_docs, avgdl = stats
        posting = posting.withColumns(
            {"__n": F.lit(int(n_docs)), "__avgdl": F.lit(float(avgdl))}
        )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    tf_norm = (
        F.col("__tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    joined = posting.join(F.broadcast(qterms), "__t")
    # Adaptive pre-aggregate shuffle (round 12, SCALE §49): on a
    # high-background-similarity corpus (a 31-type vocabulary makes
    # every query term match ~every document) the posting join
    # explodes to Σ_t df(t) candidate rows — 675M at generated sf1 —
    # and the MAP-SIDE partial aggregate of the groupBy below then
    # thrashes: per-task hash maps over millions of (query, doc)
    # groups spill hundreds of small files whose merge needs
    # numSpills x >=1 MB reader buffers of pure heap (a 4 GB executor
    # OOMs; the conf floor forbids smaller buffers). The candidate
    # count is EXACTLY computable at plan time from one
    # vocabulary-sized aggregate (qterms ⋈ df); when it is large,
    # repartitioning the join output by the group key BEFORE the
    # aggregate turns the map stage into a streaming
    # scan→join→exchange (zero aggregation memory) and bounds every
    # post-exchange aggregation map to ~candidates/n_parts rows —
    # trading partial aggregation's ~5x shuffle reduction for a
    # memory ceiling, the right trade exactly when candidates
    # explode. Below the threshold the plan is byte-identical to the
    # classic broadcast-join + partial-agg form (the estimate costs
    # one sub-second vocabulary-frame job).
    if cand_rows is None:
        cand_rows = bm25_candidate_rows(qterms, dfreq)
    if cand_rows > pre_shuffle_threshold:
        n_parts = int(min(2000, max(32, cand_rows // 2_000_000)))
        joined = joined.repartition(
            n_parts, F.col(qid_col), F.col(id_col)
        )
    return (
        joined
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(idf * tf_norm), round_to).alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
    corpus: tuple[DataFrame, DataFrame, tuple[int, float]] | None = None,
    exclude_self: bool = False,
    cand_rows: int | None = None,
) -> DataFrame:
    """BM25 top-k documents per query —
    (qid_col, rank, id_col, score).

    Okapi BM25 (Robertson et al.), the standard smoothed form:

        idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(q,d)= Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
                                 (tf + k1·(1 − b + b·dl/avgdl))

    Query terms are DISTINCT (the qtf=1 convention — web queries
    rarely repeat terms; repeats would just scale a term's
    contribution). Ranking orders by (round(score, round_to) DESC,
    id_col): rounding the transcendental before ranking is the float
    policy move that makes the order engine-portable (ln differs in
    the last ulp across libm implementations; at 4 decimals a flip
    needs the true score within ~1e-12 of a rounding boundary), and
    the id tiebreak makes equal-score ranks deterministic.

    ``corpus`` short-circuits the statistics build with prepared
    (tf, dfreq, (n_docs, avgdl)) — the token-stats-artifact serve
    path (extensions.tokenindex): persisted posting frames + exact
    marker scalars, so a query batch never re-tokenizes the corpus.
    ``exclude_self`` drops the qid==doc_id posting rows before the
    aggregate — hard-negative mining (the gold document must not
    appear in its own negative list)."""
    if corpus is not None:
        tf, dfreq, stats = corpus
    else:
        tf, dfreq, stats = bm25_corpus(docs, id_col, text_col)
    scored = bm25_scores(
        tf, dfreq, stats, queries,
        id_col=id_col, qid_col=qid_col, qtext_col=qtext_col,
        k1=k1, b=b, round_to=round_to, cand_rows=cand_rows,
    )
    if exclude_self:
        scored = scored.filter(F.col(qid_col) != F.col(id_col))
    from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group

    top = top_n_per_group(
        scored,
        partition_by=[qid_col],
        order_by=[F.desc("score"), F.col(id_col)],
        n=k,
        rank_col="rank",
        keep_rank=True,
    )
    return top.select(qid_col, "rank", id_col, "score")
