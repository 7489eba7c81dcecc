"""Streaming data-quality serving: score ARRIVING documents with the
pre-fit quality models — the curation-on-ingest plane of the round-9
quality operators, completing the artifact-serving stream family
(dedup-on-arrival, quota admission, ANN, BM25, IVM, drift):

- :func:`stream_quality_scores`: P(high quality) per incoming doc from
  a pre-trained hashed-BoW logistic model (extensions.qualityml). The
  model is fit ONCE outside the loop; per trigger the transform is a
  broadcast coefficient vector + per-row dot product — stateless, so
  foreachBatch changes delivery, never scores.
- :func:`stream_dsir_weights`: DSIR log importance weight per incoming
  doc under FROZEN unigram models (extensions.textstats.
  dsir_model_frames) — batch-side tokenize only, left join onto the
  model-count frame; new docs never join the model (a corpus-version
  bump refits), the correct serving semantics.

Per-batch outputs are IDENTICAL to the batch scorers on the same rows
(pinned in tests/test_streaming.py). Delivery is EXACTLY-ONCE at the
output: each micro-batch overwrites its own ``batch_id=<n>`` partition
directory, so an at-least-once redelivery (crash between the parquet
write and the checkpoint commit) rewrites the same directory instead
of appending duplicate rows — the same hole ivmserve/drift close with
their marker guard, solved here by idempotent writes because the sink
is stateless (no cross-batch state to protect, so overwrite-by-key is
sufficient and cheaper than a marker protocol). Readers load the root
path; ``batch_id`` surfaces as a partition column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stream_quality_scores(
    docs_stream: DataFrame,
    model,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    trigger_available_now: bool = False,
):
    """Write (input columns, quality_prob, quality_pred) rows to
    ``out_path/batch_id=<n>`` per micro-batch (idempotent overwrite —
    replays rewrite, never duplicate). Returns the StreamingQuery."""
    from aws_imdb_data_pipeline_spark.extensions.qualityml import (
        score_quality,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        score_quality(model, batch_df, text_col=text_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"batch_id={batch_id}"))

    writer = docs_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dsir_weights(
    docs_stream: DataFrame,
    stats: DataFrame,
    nt: int,
    nq: int,
    v: int,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = False,
):
    """Write (id, n_words, log_weight) rows to ``out_path/batch_id=<n>``
    per micro-batch (idempotent overwrite — replays rewrite, never
    duplicate), scored against the frozen (stats, nt, nq, v) model.
    Returns the StreamingQuery.

    Pass a MATERIALIZED ``stats`` frame (parquet-backed or persisted):
    foreachBatch re-executes the frame's lineage every trigger, and a
    raw dsir_model_frames output would re-tokenize the model corpus
    per batch — exactly the cost freezing exists to avoid."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import (
        dsir_score_batch,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dsir_score_batch(
            batch_df, stats, nt, nq, v, id_col=id_col, text_col=text_col
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    writer = docs_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
