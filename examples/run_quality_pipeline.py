"""Round-9 quality surface composed end to end: perceptual media
dedup → trained quality classifier → DSIR reweighting → importance
sample toward the target domain.

    1. PERCEPTUAL DEDUP: every document's image rendering is aHashed
       (extensions/multimodal.py) and exact-duplicate hash groups are
       collapsed to their min-id canonical BEFORE any text compute —
       the media twin of exact text dedup, and at 100 TB the cheapest
       cut (one binary-kernel pass + one hash aggregate).
    2. QUALITY CLASSIFIER: a hashed-BoW logistic model
       (extensions/qualityml.py) trained on weak labels (clean docs vs
       vowel-mangled corruptions) scores the survivors; documents
       under P(quality) 0.5 are dropped.
    3. DSIR REWEIGHTING: surviving docs get log importance weights
       toward a distributionally distinct target class
       (extensions/textstats.py) — both unigram models fit in ONE
       tokenize pass.
    4. IMPORTANCE SAMPLE: exactly K survivors drawn WITHOUT
       replacement with probability ∝ exp(log_weight) (Efraimidis–
       Spirakis, extensions/corpus.py) — the full DSIR recipe: the
       sample's target-domain share should exceed the corpus's.

Every stage is the operator a registered query exercises
(`multimodal_image_ahash`, `quality_classifier_check`,
`corpus_dsir_weights`, `corpus_weighted_sample_check`); this example
proves they compose.

Run: python examples/run_quality_pipeline.py
Reads /root/testdata/sf0.001 unless $SPARK_GRAFT_SF_DIR points elsewhere.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark import get_spark
from aws_imdb_data_pipeline_spark.extensions.corpus import (
    weighted_sample_without_replacement,
)
from aws_imdb_data_pipeline_spark.extensions.multimodal import ahash_images
from aws_imdb_data_pipeline_spark.extensions.qualityml import (
    score_quality,
    train_quality_classifier,
)
from aws_imdb_data_pipeline_spark.extensions.textstats import dsir_log_weights
from aws_imdb_data_pipeline_spark.sources.tables import load_table


def run_quality(spark, sf_dir: str, k: int = 40) -> dict:
    """The composed pipeline; returns the stage tallies (asserted by
    tests/test_example_pipeline.py)."""
    from aws_imdb_data_pipeline_spark.plans.extensions6 import (
        gradient_png_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1 — perceptual dedup: min-id canonical per identical aHash
    fps = ahash_images(gradient_png_media(spark, sf_dir)).select(
        F.col("media_id").alias("doc_id"), "hash_hi", "hash_lo"
    )
    canon = (
        fps.groupBy("hash_hi", "hash_lo")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(canon, "doc_id", "left_semi")
    n_canon = survivors.count()

    # 2 — classifier gate (weak labels: clean vs vowel-mangled)
    labeled = docs.select(
        "doc_id", "text", F.lit(1.0).alias("label")
    ).unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.translate(F.col("text"), "aeiou", "01234").alias("text"),
            F.lit(0.0).alias("label"),
        )
    )
    model = train_quality_classifier(labeled)
    scored = score_quality(model, survivors.select("doc_id", "text", "source"))
    kept = scored.filter(F.col("quality_prob") >= 0.5)
    n_kept = kept.count()

    # 3 — DSIR log-weights toward the target domain. The synthetic
    # corpus's sources all share one word distribution (reweighting
    # toward a source is a no-op by construction), so the example's
    # target is a DISTRIBUTIONALLY distinct class: documents
    # mentioning 'spark' — their unigram profile genuinely differs,
    # which is the regime DSIR exists for.
    is_target = F.col("text").contains("spark")
    weights = dsir_log_weights(
        kept.select("doc_id", "text"), is_target
    )
    pool = kept.select("doc_id", "source", is_target.alias("tgt")).join(
        weights, "doc_id"
    )

    # 4 — importance sample: p ∝ the per-token importance ratio
    # exp(log_weight / n_words) — the geometric-mean form, bounded
    # where the raw exp(log_weight) would overflow for long documents
    sample = weighted_sample_without_replacement(
        pool.select(
            "doc_id", "tgt",
            F.exp(F.col("log_weight") / F.col("n_words")).alias("w"),
        ),
        "w", k=min(k, n_kept), seed=9,
    )
    share = (
        sample.agg(F.avg(F.col("tgt").cast("double")).alias("s"))
        .collect()[0]["s"]
    )
    base_share = (
        pool.agg(F.avg(F.col("tgt").cast("double")).alias("s"))
        .collect()[0]["s"]
    )
    return {
        "n_docs": n_docs,
        "n_canonical": n_canon,
        "n_kept": n_kept,
        "n_sampled": sample.count(),
        "target_share_sample": share,
        "target_share_pool": base_share,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("quality-example")
    spark.sparkContext.setLogLevel("ERROR")
    out = run_quality(spark, sf_dir)
    print(
        f"perceptual dedup: {out['n_docs']} docs -> {out['n_canonical']} "
        f"canonical"
    )
    print(f"classifier gate: kept {out['n_kept']}")
    print(
        f"DSIR sample: {out['n_sampled']} docs; target-domain share "
        f"{out['target_share_sample']:.3f} vs pool "
        f"{out['target_share_pool']:.3f}"
    )
    spark.stop()
    print("quality pipeline OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
