"""Corpus-cleaning operators (extensions.corpus) unit tests."""

from __future__ import annotations


def test_remove_repeated_lines_boilerplate(spark):
    """Lines in >= min_docs distinct docs are dropped wherever they
    appear; order of survivors is preserved; a doc repeating a line
    INTERNALLY doesn't cross the distinct-doc threshold; an
    all-boilerplate doc survives with empty text."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        remove_repeated_lines,
    )

    header, footer = "COOKIE BANNER", "(c) footer"
    docs = spark.createDataFrame(
        [
            (1, f"{header}\nalpha one\nbeta two\n{footer}"),
            (2, f"{header}\ngamma three\n{footer}"),
            (3, f"{header}\nself\nself\ndelta four\n{footer}"),
            (4, f"{header}\n{footer}"),                 # all boilerplate
            (5, "unique only\nself"),                   # 'self' in 2 docs? no: doc 3 + doc 5 = 2 distinct
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.text
        for r in remove_repeated_lines(
            docs, "doc_id", "text", min_docs=3
        ).collect()
    }
    assert out[1] == "alpha one\nbeta two"
    assert out[2] == "gamma three"
    # internal repetition of 'self' is 1 distinct doc (+doc 5 = 2 < 3)
    assert out[3] == "self\nself\ndelta four"
    assert out[4] == ""
    assert out[5] == "unique only\nself"


def test_remove_repeated_lines_literal_separator(spark):
    """``sep`` is literal, not a regex: '|' must split on pipes only
    (unescaped it is the regex alternation that splits at every
    position, silently corrupting segmentation)."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        remove_repeated_lines,
    )

    docs = spark.createDataFrame(
        [(1, "ad|keep me|end"), (2, "ad|other text|end")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.text
        for r in remove_repeated_lines(
            docs, "doc_id", "text", min_docs=2, sep="|"
        ).collect()
    }
    assert out == {1: "keep me", 2: "other text"}


def test_dup_span_metric_and_trim_null_text_contract(spark):
    """NULL text never leaks negatives out of the public operators:
    the metric reports n_words=0 / 0.0 fraction, trim returns ''."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        dup_span_coverage_metric,
        trim_duplicated_spans,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d"), (3, "a b c d")],
        "doc_id int, text string",
    )
    m = {r.doc_id: r for r in dup_span_coverage_metric(
        docs, "doc_id", "text", k=2, min_docs=2
    ).collect()}
    assert (m[1].n_words, m[1].n_dup_shingles, m[1].covered_tokens) == (0, 0, 0)
    assert m[1].dup_token_frac == 0.0
    assert m[2].covered_tokens == 4 and m[2].dup_token_frac == 1.0
    t = {r.doc_id: r.text for r in trim_duplicated_spans(
        docs, "doc_id", "text", k=2, min_docs=2
    ).collect()}
    assert t == {1: "", 2: "", 3: ""}
