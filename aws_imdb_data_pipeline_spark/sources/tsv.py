r"""IMDb-shaped TSV reader.

Re-expresses the reference's raw-zone scan (S1):
``spark.read.options(delimiter='\t', header='true').csv(path)`` with
every column string-typed and the IMDb ``\N`` null sentinel
(reference: glue_jobs/etl_movies_episodes_analytics_advanced.py:53-60).

Improvement over the reference: the sentinel is handled at scan time
via ``nullValue`` so no per-column ``when(col != '\N')`` scrubbing is
needed downstream, and an optional typed schema avoids a second pass
of casts. Both behaviors are flag-controlled so quirk-faithful mode
is still available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_imdb_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    null_sentinel: str | None = r"\N",
    header: bool = True,
) -> DataFrame:
    """Read a (possibly gzipped) tab-separated file.

    Gzip decompression is automatic in Spark's text-based sources.
    With ``schema=None`` every column is string (the reference's
    behavior); pass a ``StructType`` for typed reads where malformed
    values become NULL (PERMISSIVE mode) — the tolerant-cast semantics
    the reference gets from Snowflake TRY_TO_NUMBER (batch.py:228-239).
    """
    reader = spark.read.options(sep="\t", header=str(header).lower())
    if null_sentinel is not None:
        reader = reader.options(nullValue=null_sentinel)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_imdb_tsv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_path: str,
    null_sentinel: str | None = r"\N",
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Typed TSV read that QUARANTINES malformed rows instead of
    silently nulling them: rows Spark cannot parse against ``schema``
    land (raw text + ingest timestamp) in ``quarantine_path`` for
    inspection/replay, and only clean rows flow on.

    At 100 TB "0.001% of rows went NULL" is millions of silently lost
    values; the quarantine makes the failure population a first-class
    dataset.

    Side-effect contract: the quarantine parquet is written EAGERLY
    (mode=append) inside this call — by the time it returns, the bad
    rows are on disk; the returned clean frame is lazy as usual.

    Mechanics: the file is scanned as TEXT lines and parsed with the
    ``from_csv`` EXPRESSION (PERMISSIVE + corrupt-record field), not
    the CSV datasource. Two reasons, both scale-grade correctness:

    - the CSV datasource evaluates malformedness only over the PARSED
      columns, and column pruning means a downstream ``count()``
      parses none — so the set of "clean" rows would depend on which
      columns a query touches. ``from_csv`` always parses the whole
      line; clean vs quarantined is a property of the DATA.
    - the datasource refuses uncached queries that reference only the
      corrupt-record column, forcing a ``persist`` of the full parse.
      The text scan has no such restriction: both sides are plain
      lazy lineages over the same scan, nothing stays pinned in
      executor memory, and each side re-parses on its own action. A
      caller reusing the clean rows should ``.persist()`` the
      RETURNED frame (clean rows only — narrower than the raw parse)
      and own its lifetime.

    Header contract (LOUD, because it differs from the csv
    datasource's positional skip): with ``header=True``, lines
    byte-equal to the canonical header (schema field names tab-joined
    — the layout this engine writes and IMDb ships) are dropped before
    parsing, which also handles multi-file globs where every file
    carries a header. Two consequences:

    - a DATA row byte-identical to the header line is dropped with it
      (impossible for typed schemas — field names don't parse as
      ints/dates — and harmless for the all-string IMDb layout where
      such a row is indistinguishable from a header anyway);
    - a file whose header DIFFERS from the schema (renamed, reordered,
      re-cased columns) is NOT silently skipped: that header lands in
      the quarantine tagged ``header_like = true`` (tab-split fields
      set-equal to the schema names, case-insensitive) — one flagged
      row per file is the signal that the file's layout drifted, which
      beats positionally skipping a first line whose order no longer
      matches the schema and mis-parsing every row after it.

    Quarantine schema note: the ``header_like`` column was added after
    early quarantine lakes were written; when reading a quarantine
    directory that may contain pre-``header_like`` files, pass
    ``spark.read.option("mergeSchema", "true")`` (old rows read NULL
    for the column) — the same additive-evolution contract as
    `sources.lake.read_lake`.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    aug = StructType(schema.fields[:]).add(corrupt_col, StringType())
    options = {"sep": "\t", "mode": "PERMISSIVE",
               "columnNameOfCorruptRecord": corrupt_col}
    if null_sentinel is not None:
        options["nullValue"] = null_sentinel

    lines = spark.read.text(path)
    if header:
        header_line = "\t".join(f.name for f in schema.fields)
        lines = lines.filter(F.col("value") != header_line)
    parsed = lines.select(
        "value", F.from_csv("value", aug.simpleString(), options).alias("__r")
    )
    canonical_names = F.array(
        *[F.lit(f.name.lower()) for f in sorted(schema.fields, key=lambda f: f.name.lower())]
    )
    header_like = (
        F.array_sort(F.transform(F.split(F.col("value"), "\t", -1), F.lower))
        == canonical_names
    )
    bad = parsed.filter(F.col(f"__r.{corrupt_col}").isNotNull()).select(
        F.col("value").alias("raw_line"),
        header_like.alias("header_like"),
        F.current_timestamp().alias("quarantined_at"),
    )
    bad.write.mode("append").parquet(quarantine_path)
    return (
        parsed.filter(F.col(f"__r.{corrupt_col}").isNull())
        .select("__r.*")
        .drop(corrupt_col)
    )
