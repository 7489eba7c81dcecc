"""Cross-engine content fingerprint of the embeddings table — the key
the serving-twin / index-build digest pins are measured against.

r12 ADVICE found the digest pins keyed on COUNT(*) never matched the
actual shipped lakes (labeled 20/200/2000 vs the real 500/500/2000),
so their driver rows verified NULL==NULL. Content keying fixes both
failure modes: the pins ENGAGE on the lakes they were measured on, and
a regenerated lake with the same row count but different vectors falls
back to the corpus-agnostic contract checks instead of false-failing.

The fingerprint is exact and identical in Spark and DuckDB: per row,
``vec_id*2654435761 + label*1000003 + Σ_i floor(embedding[i]*1e6)*i``
(1-based i), bit_xor across rows. floor() on bit-identical doubles
(float->double widening is exact, the *1e6 product is the same IEEE
operation in both engines) has no rounding-tie hazard, the int64
arithmetic cannot overflow at any shipped magnitude, and bit_xor is
order/partition-invariant. Verified equal across engines on all three
shipped lakes (tests/test_digest_pins.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.sources.tables import load_table

# The three shipped lakes' fingerprints (re-measured r13 against the
# actual /root/testdata dirs; 500 / 500 / 2000 vectors respectively).
FP_SF0_001 = 1793286813401
FP_SF0_01 = -1786656958120
FP_SF0_1 = 4476107158631

SPARK_EMB_FP = """bit_xor(
  vec_id * 2654435761L + label * 1000003L +
  aggregate(
    zip_with(embedding, sequence(1, size(embedding)),
             (e, i) -> cast(floor(cast(e as double) * 1000000d) as bigint)
                       * cast(i as bigint)),
    0L, (acc, x) -> acc + x))"""

DUCK_EMB_FP = """
    SELECT CAST(bit_xor(vec_id * 2654435761 + label * 1000003 + s)
                AS BIGINT) AS f
    FROM (
      SELECT vec_id, label,
             CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT) * i)
                  AS BIGINT) AS s
      FROM (SELECT vec_id, label, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i FROM embeddings) u
      GROUP BY vec_id, label
    ) eh
"""


# (applicationId, lake path, layout stat) -> fingerprint. The value is
# a pure function of the table's CONTENT, and the layout stat
# (mtime_ns, size) invalidates on any rewrite — so the memo never
# serves a stale fingerprint, it only stops every digest-pinned query
# construction from re-running the same full-table aggregate job
# (one eager job per construction, several digest queries per sweep).
_FP_CACHE: dict[tuple, int] = {}


def embeddings_fingerprint(spark: SparkSession, sf_dir: str) -> int:
    """The exact content fingerprint of the lake's embeddings table."""
    import os

    path = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(path)
        key = (
            spark.sparkContext.applicationId,
            path,
            st.st_mtime_ns,
            st.st_size,
        )
    except OSError:
        key = None
    if key is not None and key in _FP_CACHE:
        return _FP_CACHE[key]
    fp = (
        load_table(spark, sf_dir, "embeddings")
        .agg(F.expr(SPARK_EMB_FP).alias("f"))
        .first()
        .f
    )
    if key is not None:
        _FP_CACHE[key] = fp
    return fp


def pinned_case_oracle(
    pins: dict[int, tuple], columns: list[tuple[str, str]]
) -> str:
    """Oracle SQL that computes the embeddings fingerprint in DuckDB
    and CASEs each output column over the pinned literals — NULL (both
    sides) on any unpinned lake. ``columns`` is [(name, sql_type)]
    aligned with the pin tuples' positions."""

    def case(i: int, cast: str) -> str:
        whens = " ".join(
            f"WHEN {fp} THEN CAST({pins[fp][i]!r} AS {cast})"
            for fp in sorted(pins)
        )
        return f"CASE f {whens} END"

    cols = ",\n           ".join(
        f"{case(i, typ)} AS {name}" for i, (name, typ) in enumerate(columns)
    )
    return f"""
    WITH fp AS ({DUCK_EMB_FP})
    SELECT f AS corpus_fp,
           {cols}
    FROM fp
    """
