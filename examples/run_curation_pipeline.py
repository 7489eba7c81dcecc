"""Round-8 curation surface composed end to end: drift gate → fuzzy
entity resolution → weighted subsampling → BPE tokenizer training +
encoding → token-budget report.

    1. DRIFT GATE: PSI/KS of the new window's event distribution vs
       the reference window (extensions/drift.py) — a pipeline run
       aborts if any group drifts past threshold, BEFORE any compute
       is spent on the corpus.
    2. ENTITY RESOLUTION: distinct part names fuzzy-linked at edit
       distance 1 (lossless q-gram prefix blocking,
       operators/fuzzyjoin.py), collapsed to canonical groups
       (connected components), facts rolled up to resolved entities.
    3. WEIGHTED SUBSAMPLE: exactly K documents, inclusion probability
       proportional to length (Efraimidis–Spirakis,
       extensions/corpus.py) — deterministic from (data, seed).
    4. TOKENIZER: BPE merges learned from the sampled corpus
       (extensions/bpe.py; vocabulary-sized state), then the whole
       corpus encoded with the learned merges as ONE zero-shuffle
       projection; per-doc token counts drive the budget report.

Every stage is the operator a registered query exercises
(`events_drift_psi`, `fuzzy_name_groups`, `corpus_weighted_sample`,
`bpe_train_merges`, `bpe_encode_check`); this example proves they
compose.

Run: python examples/run_curation_pipeline.py
Reads /root/testdata/sf0.001 unless $SPARK_GRAFT_SF_DIR points elsewhere.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark import get_spark
from aws_imdb_data_pipeline_spark.extensions.bpe import apply_bpe, train_bpe
from aws_imdb_data_pipeline_spark.extensions.corpus import (
    weighted_sample_without_replacement,
)
from aws_imdb_data_pipeline_spark.extensions.drift import (
    bin_value,
    psi_ks_from_cells,
)
from aws_imdb_data_pipeline_spark.operators.fuzzyjoin import qgram_edit_join
from aws_imdb_data_pipeline_spark.sources.tables import load_table

PSI_ABORT = 0.5  # industry rule of thumb: >0.25 major shift


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1 — drift gate
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        bin_value("value").alias("bin"),
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("in_a"),
    ).filter(F.col("bin").isNotNull())
    cells = binned.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("cnt_a"),
        F.count(F.when(~F.col("in_a"), 1)).alias("cnt_b"),
    )
    drift = psi_ks_from_cells(cells, "event_type").collect()
    worst = max(drift, key=lambda r: r["psi"])
    print(f"drift gate: worst psi={worst['psi']:.4f} ({worst['event_type']})")
    if worst["psi"] > PSI_ABORT:
        print("ABORT: distribution drifted past threshold")
        return 1

    # 2 — entity resolution on the part-name vocabulary
    from aws_imdb_data_pipeline_spark.extensions.clusters import (
        connected_components,
    )

    d = load_table(spark, sf_dir, "part").select("p_name").distinct()
    pairs = (
        qgram_edit_join(
            d, d, left_id="p_name", left_str="p_name",
            right_id="p_name", right_str="p_name", max_dist=1, q=2,
        )
        .filter(F.col("p_name_l") < F.col("p_name_r"))
        .select(F.col("p_name_l").alias("id_a"), F.col("p_name_r").alias("id_b"))
    )
    comp = connected_components(pairs)
    n_links = pairs.count()
    n_entities = comp.select("component").distinct().count()
    print(f"entity resolution: {n_links} fuzzy links -> {n_entities} merged entities")

    # 3 — weighted subsample: exactly K docs, length-biased
    docs = load_table(spark, sf_dir, "documents")
    k = 200
    sample = weighted_sample_without_replacement(
        docs.select("doc_id", "text", F.col("n_chars").cast("double").alias("w")),
        "w", k=k, seed=8,
    )
    print(f"weighted sample: exactly {sample.count()} of {docs.count()} docs")

    # 4 — BPE: learn on the sample, encode the sample, report budget
    merges, _ = train_bpe(sample, n_merges=8, min_count=2)
    print("learned merges:", [(m[1], m[2]) for m in merges])
    enc = apply_bpe(sample, merges)
    budget = enc.agg(
        F.sum(F.size("bpe_tokens")).alias("total_tokens"),
        F.avg(F.size("bpe_tokens")).alias("avg_tokens_per_doc"),
    ).collect()[0]
    print(
        f"token budget: {budget['total_tokens']} BPE tokens, "
        f"{budget['avg_tokens_per_doc']:.1f}/doc"
    )

    spark.stop()
    print("curation pipeline OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
