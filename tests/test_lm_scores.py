"""Unigram LM scoring (extensions.textstats.unigram_lm_scores):
hand-computed probabilities on a tiny corpus and the ranking property
the filter exists for (common-word docs score above rare-word docs)."""

from __future__ import annotations

import math

from aws_imdb_data_pipeline_spark.extensions.textstats import unigram_lm_scores


def test_lm_scores_hand_computed(spark):
    # corpus: "a a b" + "a c" → counts a=3, b=1, c=1, N=5
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in unigram_lm_scores(docs).collect()}
    n = 5
    want1 = round(2 * math.log(3 / n) + math.log(1 / n), 4)
    want2 = round(math.log(3 / n) + math.log(1 / n), 4)
    assert got[1].n_words == 3 and abs(got[1].sum_logprob - want1) < 1e-9
    assert got[2].n_words == 2 and abs(got[2].sum_logprob - want2) < 1e-9
    assert abs(got[1].avg_logprob - want1 / 3) < 1e-9


def test_lm_scores_rank_common_above_rare(spark):
    # doc 1 repeats the dominant token; doc 2 is all hapaxes → doc 1
    # must have the higher (less negative) mean log-prob
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "zq xv wk pj"), (3, "the the zq the")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.avg_logprob for r in unigram_lm_scores(docs).collect()}
    assert got[1] > got[3] > got[2]


def test_lm_scores_whitespace_and_empty_tokens(spark):
    # runs of whitespace produce no empty-string words
    docs = spark.createDataFrame(
        [(1, "  a   b  "), (2, "a b")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_words, r.sum_logprob)
           for r in unigram_lm_scores(docs).collect()}
    assert got[1] == got[2]
