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
- in steady state the posting/statistic frames are a per-corpus-
  version artifact (write tf/df/dl once via lifecycle.artifacts,
  exactly like the MinHash band index) and each query batch pays only
  the broadcast probe + one (query, doc) aggregate.
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
) -> DataFrame:
    """BM25 top-k documents per query —
    (qid_col, rank, id_col, score).

    Okapi BM25 (Robertson et al.), the standard smoothed form:

        idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(q,d)= Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
                                 (tf + k1·(1 − b + b·dl/avgdl))

    Query terms are DISTINCT (the qtf=1 convention — web queries
    rarely repeat terms; repeatals would just scale a term's
    contribution). Ranking orders by (round(score, round_to) DESC,
    id_col): rounding the transcendental before ranking is the float
    policy move that makes the order engine-portable (ln differs in
    the last ulp across libm implementations; at 4 decimals a flip
    needs the true score within ~1e-12 of a rounding boundary), and
    the id tiebreak makes equal-score ranks deterministic.

    Plan: tf/df/dl are map-side-combinable aggregates over the corpus
    (shuffles keyed on (doc, term) then (term)); N and avgdl attach as
    one-row broadcast scalars; query terms broadcast into the posting
    join, so the corpus-side frames never reshuffle per query batch;
    the final (query, doc) aggregate + per-query top-k window carry
    only matched postings."""
    words = _tokens(text_col)
    toks = docs.select(
        F.col(id_col), F.size(words).alias("__dl"),
        F.explode(words).alias("__t"),
    )
    tf = toks.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    stats = docs.select(F.size(_tokens(text_col)).alias("__len")).agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__len").alias("__avgdl")
    )
    qterms = queries.select(
        F.col(qid_col), F.explode(_tokens(qtext_col)).alias("__t")
    ).distinct()

    posting = tf.join(dfreq, "__t").crossJoin(F.broadcast(stats))
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
    scored = (
        posting.join(F.broadcast(qterms), "__t")
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(idf * tf_norm), round_to).alias("score"))
    )
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
