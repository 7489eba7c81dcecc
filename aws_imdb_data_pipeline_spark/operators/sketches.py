"""Mergeable-sketch operators: incremental distinct counting with HLL
sketches (Apache DataSketches, built into Spark >= 3.5).

The 100 TB pattern this enables: a nightly job computes ONE small HLL
sketch per (partition, column) — a few KB each — and stores them next
to the data (here: a tiny parquet side table). Any later rollup
("distinct users last 90 days", "distinct keys across all runs")
merges the stored sketches in milliseconds instead of rescanning
terabytes. Sketches are commutative/associative, so late or replayed
partitions just re-merge; estimates carry the usual HLL error
(~1.6% at lgConfigK=12, tested).

The DQ profiler's `approx_count_distinct` answers "how many distinct
NOW"; these operators answer "how many distinct across ANY combination
of slices, later, without the raw data".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "hll_sketch"


def partition_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per ``key_cols`` group — the
    artifact to persist alongside each written partition. One shuffle
    (partial sketches merge map-side, exactly like a sum)."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(SKETCH_COL),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge stored sketches — all of them, or per ``group_cols`` —
    and estimate the distinct count of the union. Input is the tiny
    sketch table, so this runs in milliseconds regardless of how much
    raw data the sketches summarize."""
    merged = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    ).agg(
        F.hll_union_agg(SKETCH_COL).alias(SKETCH_COL),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(SKETCH_COL).cast("long")
    ).drop(SKETCH_COL)


# ---------------------------------------------------------------------------
# Count-Min sketch over integer keys — engine-portable hashing
# ---------------------------------------------------------------------------

# depth-many pairwise-independent hash rows. Each row d maps key x to a
# bucket via an affine-then-cube bijection mod a prime (the same
# construction extensions.corpus.seeded_shuffle uses, and for the same
# reason: every intermediate fits int64 and ANY SQL engine reproduces
# it bit-for-bit — unlike xxhash64, which pins the sketch to Spark).
_CMS_P = 1_000_000_007
_CMS_A = (48271, 69621, 16807, 40692, 10007, 33211, 50021, 69997)
_CMS_C = (12345, 54321, 7919, 104729, 1299709, 15485863, 32452843, 49979687)


def _cms_bucket(key, d: int, width: int):
    y = (F.lit(_CMS_A[d]) * key + F.lit(_CMS_C[d])) % F.lit(_CMS_P)
    k = (((y * y) % F.lit(_CMS_P)) * y) % F.lit(_CMS_P)
    return F.pmod(k, F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch of ``key_col`` occurrences as a (depth, bucket,
    count) table — depth*width rows TOTAL, regardless of input size.

    Shape: one explode to depth rows per input row (narrow, codegen),
    one aggregate shuffle onto at most depth*width groups (map-side
    partial aggregation collapses almost everything before the
    exchange). The sketch MERGES by summing counts per (depth, bucket)
    — build sketches per partition/day, add them later, exactly like
    the HLL pattern above but for FREQUENCIES: "how often did key x
    appear across any slice combination" with estimate >= truth and
    overestimate bounded by ~2N/width at 1-exp(-depth) confidence.
    """
    if depth > len(_CMS_A):
        raise ValueError(f"depth <= {len(_CMS_A)} supported")
    key = F.col(key_col)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cms_bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    )
    return (
        rows.select("db.depth", "db.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate ``key_col`` frequencies from a CMS table: for
    each key, min over depths of its bucket's count (0 if the bucket
    row is absent). The sketch is depth*width rows → broadcast side of
    the lookup join; estimating any number of keys costs one scan of
    ``keys``."""
    probes = keys.select(
        key_col,
        *[
            _cms_bucket(F.col(key_col), d, width).alias(f"__b{d}")
            for d in range(depth)
        ],
    )
    out = probes
    for d in range(depth):
        side = sketch.filter(F.col("depth") == d).select(
            F.col("bucket").alias(f"__b{d}"),
            F.col("count").alias(f"__c{d}"),
        )
        out = out.join(F.broadcast(side), f"__b{d}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"__c{d}"), F.lit(0)) for d in range(depth)]
    )
    return out.select(key_col, est.alias("estimate"))


# ---------------------------------------------------------------------------
# Bitmap partials — EXACT mergeable distinct over integer keys
# ---------------------------------------------------------------------------

BITMAP_COL = "bitmap"
BITMAP_BUCKET_COL = "bitmap_bucket"


def bitmap_partials(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """EXACT complement to :func:`partition_sketches`: one ≤4 KB bitmap
    per (key group, 32768-value bucket) of ``value_col`` — built with
    Spark's ``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg`` (Spark >= 3.5). Where the HLL sketch
    answers later distinct questions within ~1.6%, the bitmap partial
    answers them EXACTLY, at a cost proportional to the value domain
    (one 4 KB page per 32 768 possible values actually present) instead
    of a fixed few KB. The right artifact when the distinct column is a
    bounded integer surrogate key (user ids, part keys) and the rollup
    must reconcile to the penny.

    Like the HLL partials, bitmaps are commutative/associative: OR-ing
    the stored pages re-derives any slice union without rescanning the
    fact. One shuffle; partial bitmaps merge map-side.

    ``value_col`` must be integral; NULLs are ignored (matching
    COUNT(DISTINCT) semantics) and ``n_rows`` counts non-null values so
    the partial reconciles with COUNT(value_col)."""
    vals = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols,
        F.bitmap_bucket_number(value_col).alias(BITMAP_BUCKET_COL),
        F.bitmap_bit_position(value_col).alias("__pos"),
    )
    return vals.groupBy(*key_cols, BITMAP_BUCKET_COL).agg(
        F.bitmap_construct_agg("__pos").alias(BITMAP_COL),
        F.count(F.lit(1)).alias("n_rows"),
    )


def bitmap_distinct(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    count_col: str = "distinct_exact",
) -> DataFrame:
    """Merge stored bitmap partials — all of them, or per
    ``group_cols`` — and emit the EXACT distinct count of the union.
    Two tiny aggregations over the KB-sized partial table: OR per
    (group, bucket), then sum of per-bucket popcounts. Never touches
    the raw data.

    ``n_rows`` is carried through when present; partials that dropped
    it (the streaming state, where a replayed batch must not
    double-count — OR is idempotent, a sum is not) aggregate the
    bitmaps alone."""
    has_rows = "n_rows" in partials.columns
    merged = partials.groupBy(*(group_cols or []), BITMAP_BUCKET_COL).agg(
        F.bitmap_or_agg(BITMAP_COL).alias(BITMAP_COL),
        *([F.sum("n_rows").alias("n_rows")] if has_rows else []),
    )
    g = merged.groupBy(*group_cols) if group_cols else merged.groupBy()
    return g.agg(
        F.sum(F.bitmap_count(BITMAP_COL)).cast("long").alias(count_col),
        *([F.sum("n_rows").cast("long").alias("n_rows")] if has_rows else []),
    )
