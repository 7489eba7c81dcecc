"""Model-based quality filtering: a distributed bag-of-words logistic
classifier over hashed token features — the fasttext-classifier rung
of the data-quality ladder (heuristics → unigram-LM perplexity proxy →
trained classifier), the shape GPT-3/LLaMA-style pipelines use to
score web documents against a high-quality reference class.

Spark-first: features are HashingTF over the whitespace token array
(one narrow JVM projection, no vocabulary build, dimensionality fixed
at 2^15 so the model is executor-broadcastable at any corpus size) and
the trainer is MLlib LogisticRegression (distributed LBFGS — gradient
aggregation is a treeAggregate over partitions, the same
all-reduce shape the k-means quantizer build uses). Scoring is one
model.transform: a broadcast of an O(num_features) coefficient vector
+ a per-row dot product, embarrassingly parallel at 100 TB.

Training labels are the caller's business (reference-vs-crawl weak
labels in production; the registered contract check plants a
separable clean-vs-corrupted task). The classifier complements, not
replaces, the DSIR importance weights (extensions.textstats.
dsir_log_weights): the classifier RANKS documents by a learned
boundary; DSIR REWEIGHTS them toward a target distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_array(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace tokens as array<string> (same tokenization as
    extensions.textstats._words, empties dropped)."""
    return df.withColumn(
        "__words",
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""),
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 15,
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Fit the hashed-BoW logistic model on (text, 0/1-label) rows.
    Returns the fitted PipelineModel (apply with
    :func:`score_quality`). Deterministic for fixed input data up to
    float aggregation order (LBFGS from zero init); contract floors
    are therefore thresholds, never exact score pins."""
    import shutil
    import tempfile

    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(
        inputCol="__words", outputCol="__features", numFeatures=num_features
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    fitted = Pipeline(stages=[tf, lr]).fit(_token_array(labeled, text_col))
    # Strip the training summary via an ML-persistence round-trip: the
    # freshly-fitted LR model carries trainingSummary -> a DataFrame ->
    # the SparkSession, and transform()'s prediction UDF closure
    # serializes the MODEL — so scoring explodes with
    # "Task not serializable: ObservationManager" whenever anything
    # non-serializable is reachable from the session (any
    # quality/observe.py Observation in the same session triggers it).
    # A loaded model carries coefficients only; the round-trip is the
    # documented way to drop the summary.
    tmp = tempfile.mkdtemp(prefix="qualml_")
    try:
        fitted.write().overwrite().save(tmp)
        return PipelineModel.load(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "quality_prob",
    pred_col: str = "quality_pred",
) -> DataFrame:
    """P(high quality) + hard prediction per document. Keeps the input
    columns; the feature/vector intermediates never leave the plan."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_token_array(docs, text_col))
    return scored.select(
        *docs.columns,
        F.element_at(vector_to_array("probability"), 2).alias(out_col),
        F.col("prediction").alias(pred_col),
    )
