"""Distribution-drift algebra shared by the batch query
(plans/extensions6.py::events_drift_psi) and the streaming monitor
(streaming/drift.py): fixed-width binning, (group, bin) cell counts,
and the PSI/KS reduction over a cell frame.

The cell frame is the scale pivot: |groups| x |bins| rows regardless
of event volume, built by one map-side-combinable aggregate — so
drift over any number of events reduces to one partial-aggregate pass
and the PSI/KS math runs on a frame small enough to never matter.
Cells are also ADDITIVE (pure counts, no retractions), which is what
lets the streaming plane maintain them by delta merge per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PSI_BINS = 11  # fixed-width value bins: floor(value/width) capped


def bin_value(col: str | Column, width: float = 10.0, max_bin: int = 10) -> Column:
    """Fixed-width bin label, capped at ``max_bin`` (the overflow bin)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.floor(c / width), F.lit(max_bin)).cast("int")


def cell_counts(
    df: DataFrame, group_col: str, bin_col: Column, cnt_name: str
) -> DataFrame:
    """(group, bin, count) — the additive drift sufficient statistic.

    NULL measurements are dropped (a NULL carries no distribution
    mass, and a NULL bin would also sort differently between engines:
    Spark windows put NULLS FIRST ascending, DuckDB NULLS LAST — the
    KS CDFs would silently diverge on any data with NULLs)."""
    return (
        df.select(group_col, bin_col.alias("bin"))
        .filter(F.col("bin").isNotNull())
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias(cnt_name))
    )


def psi_ks_from_cells(
    cells: DataFrame, group_col: str, n_bins: int = PSI_BINS
) -> DataFrame:
    """PSI + discretized KS per group from a merged cell frame with
    columns (group, bin, cnt_a, cnt_b). cnt_a is the reference window,
    cnt_b the comparison window; rows cover the union of bins observed
    in EITHER window (absent-in-both bins are skipped on both engines
    identically — smoothing makes present-in-one bins finite).

    Laplace smoothing: p = (cnt+1)/(n+n_bins), identical on the SQL
    oracle side, so the outputs are bit-comparable after the rounded
    sums. KS uses unsmoothed CDFs over the bin order."""
    wt = Window.partitionBy(group_col)
    wc = Window.partitionBy(group_col).orderBy("bin")
    terms = (
        cells.withColumn("n_a", F.sum("cnt_a").over(wt))
        .withColumn("n_b", F.sum("cnt_b").over(wt))
        .withColumn("p", (F.col("cnt_a") + 1.0) / (F.col("n_a") + n_bins))
        .withColumn("q", (F.col("cnt_b") + 1.0) / (F.col("n_b") + n_bins))
        .withColumn("cdf_a", F.sum("cnt_a").over(wc) / F.col("n_a"))
        .withColumn("cdf_b", F.sum("cnt_b").over(wc) / F.col("n_b"))
    )
    return terms.groupBy(group_col).agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            6,
        ).alias("psi"),
        F.round(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 6).alias(
            "ks_stat"
        ),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
