"""DSIR importance weights (vs an exact Python model) and the trained
quality classifier (planted separable task, scored on held-out docs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.extensions.qualityml import (
    score_quality,
    train_quality_classifier,
)
from aws_imdb_data_pipeline_spark.extensions.textstats import dsir_log_weights


def test_dsir_log_weights_match_python_model(spark):
    rows = [
        (0, "alpha alpha beta", True),    # target docs: alpha-heavy
        (1, "alpha gamma", True),
        (2, "delta delta beta", False),   # raw-only docs: delta-heavy
        (3, "delta gamma gamma", False),
        (4, "alpha delta", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tgt"])
    got = {
        r.doc_id: (r.n_words, r.log_weight)
        for r in dsir_log_weights(
            df.select("doc_id", "text"),
            F.col("doc_id") <= 1,
        ).collect()
    }

    # exact model: Laplace-smoothed unigram ratios over the union vocab
    toks = {i: t.split() for i, t, _ in rows}
    ct: dict[str, int] = {}
    cq: dict[str, int] = {}
    for i, ws in toks.items():
        for w in ws:
            cq[w] = cq.get(w, 0) + 1
            if i <= 1:
                ct[w] = ct.get(w, 0) + 1
    v = len(cq)
    nt, nq = sum(ct.values()), sum(cq.values())
    for i, ws in toks.items():
        want = sum(
            math.log((ct.get(w, 0) + 1.0) / (nt + v))
            - math.log((cq[w] + 1.0) / (nq + v))
            for w in ws
        )
        assert got[i][0] == len(ws)
        assert abs(got[i][1] - round(want, 4)) <= 1e-9

    # the reweighting direction: alpha-heavy docs move TOWARD the
    # target (higher weight) than delta-heavy docs
    assert got[0][1] > got[2][1]
    assert got[1][1] > got[3][1]


def test_quality_classifier_separates_planted_classes(spark):
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
    )
    corrupt = F.translate(F.col("text"), "aeiou", "01234")
    labeled = docs.select(
        "doc_id", "text", F.lit(1.0).alias("label")
    ).unionByName(
        docs.select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            corrupt.alias("text"),
            F.lit(0.0).alias("label"),
        )
    )
    hold = (F.col("doc_id") % 5 == 0) | ((F.col("doc_id") - 10_000) % 5 == 0)
    model = train_quality_classifier(labeled.filter(~hold))
    scored = score_quality(model, labeled.filter(hold))
    r = scored.agg(
        F.avg(
            F.when(F.col("quality_pred") == F.col("label"), 1.0).otherwise(0.0)
        ).alias("acc"),
        F.avg(F.when(F.col("label") == 1.0, F.col("quality_prob"))).alias("pc"),
        F.avg(F.when(F.col("label") == 0.0, F.col("quality_prob"))).alias("px"),
    ).collect()[0]
    assert r.acc >= 0.95
    assert r.pc - r["px"] >= 0.2
    # output keeps the input columns and adds exactly the two score cols
    assert set(scored.columns) == {
        "doc_id", "text", "label", "quality_prob", "quality_pred",
    }
