"""DSIR importance-weighting + quality-classifier asymptotics.

Generates a JVM-side synthetic corpus (no Python rows: words are
``w<rank>`` with log-uniform Zipfian ranks derived from xxhash64 —
codegen end to end) at increasing sizes and measures:

- ``dsir_log_weights`` end-to-end (tokenize → one-pass two-model fit →
  per-doc score), expecting ~linear scaling in corpus size: the
  algebra is two hash-aggregate shuffles plus a word-keyed join, no
  step is super-linear;
- ``train_quality_classifier`` + held-out scoring on the planted
  clean-vs-corrupted task at the same sizes (MLlib LBFGS over hashed
  features: per-iteration cost is one treeAggregate pass over the
  data — linear per iteration, iteration count fixed).

Usage: python tools/dsir_scale_probe.py [base_docs]   (default 100000)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.qualityml import (  # noqa: E402
    score_quality,
    train_quality_classifier,
)
from aws_imdb_data_pipeline_spark.extensions.textstats import (  # noqa: E402
    dsir_log_weights,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n_docs: int, vocab: int = 50_000, words: int = 60):
    """(doc_id, text, source): Zipfian words, all JVM expressions."""
    ln_v = float(__import__("math").log(vocab))
    word = lambda slot: F.concat(  # noqa: E731
        F.lit("w"),
        F.floor(
            F.exp(
                (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(slot)), F.lit(65536))
                    / F.lit(65536.0)
                )
                * F.lit(ln_v)
            )
        ).cast("long"),
    )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(words - 1)),
            lambda i: F.concat(
                F.lit("w"),
                F.floor(
                    F.exp(
                        (
                            F.pmod(
                                F.xxhash64(F.col("id"), i), F.lit(65536)
                            )
                            / F.lit(65536.0)
                        )
                        * F.lit(ln_v)
                    )
                ).cast("long"),
            ),
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20))).alias("source"),
    )


def timed(label, fn, trials=2, **extra):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"step": label, "sec": round(best, 2), **extra}), flush=True)
    return best


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(
        "dsir-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    for mult in (1, 4, 16):
        n = base * mult
        docs = synth_corpus(spark, n)
        noop(docs)  # warm codegen for this size
        timed(
            "dsir_log_weights",
            lambda: noop(
                dsir_log_weights(docs, F.col("source") == "src0")
            ),
            n_docs=n,
        )

    # classifier: train on 2 x base labeled rows, score a held-out 20%
    docs = synth_corpus(spark, base)
    corrupt = F.translate(F.col("text"), "w", "q")
    labeled = docs.select(
        "doc_id", "text", F.lit(1.0).alias("label")
    ).unionByName(
        docs.select(
            (F.col("doc_id") + base).alias("doc_id"),
            corrupt.alias("text"),
            F.lit(0.0).alias("label"),
        )
    )
    hold = (F.col("doc_id") % 5 == 0) | ((F.col("doc_id") - base) % 5 == 0)
    train, held = labeled.filter(~hold), labeled.filter(hold)
    model = None

    def fit():
        nonlocal model
        model = train_quality_classifier(train)

    timed("classifier_train", fit, trials=1, n_rows=2 * base)
    acc = (
        score_quality(model, held)
        .agg(
            F.avg(
                F.when(
                    F.col("quality_pred") == F.col("label"), 1.0
                ).otherwise(0.0)
            )
        )
        .collect()[0][0]
    )
    timed(
        "classifier_score",
        lambda: noop(score_quality(model, held)),
        n_rows=held.count(),
    )
    print(json.dumps({"step": "holdout_accuracy", "acc": round(acc, 4)}))


if __name__ == "__main__":
    main()
