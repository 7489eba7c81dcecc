"""End-to-end IMDb pipeline: the reference's whole DAG in one process.

    ingest (change-detected TSV) → ETL (movies/episodes/seasons/DQ)
    → partitioned lake (idempotent) → catalog → expectation gate
    → model layer → analyst queries

Run: python examples/run_imdb_pipeline.py [workdir]
Uses synthetic fixture data (tests/imdb_fixtures.py) as the "remote";
swap ``fetcher`` for an HTTP client to ingest the real IMDb dumps.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from aws_imdb_data_pipeline_spark import get_spark
from aws_imdb_data_pipeline_spark.lifecycle import register_lake_table
from aws_imdb_data_pipeline_spark.lifecycle.ingest import ingest_datasets, latest_slice
from aws_imdb_data_pipeline_spark.pipelines import ImdbRaw, run_etl
from aws_imdb_data_pipeline_spark.pipelines.models import (
    movie_facts_view,
    top_genres,
    top_movies_by_genre,
)
from aws_imdb_data_pipeline_spark.quality import (
    expect_min_rows,
    expect_not_null,
    expect_values_between,
    validate,
)
from aws_imdb_data_pipeline_spark.pipelines.imdb import RAW_TABLES


def main(workdir: str) -> None:
    spark = get_spark("imdb-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    run_date = "20240115"

    # --- 1. ingest: synthetic fixtures as the "remote" ---------------
    from imdb_fixtures import build_raw

    fixture = build_raw(spark)

    def fetcher(name):
        pdf = getattr(fixture, name).toPandas()
        tsv = pdf.to_csv(sep="\t", index=False, na_rep=r"\N").encode()
        data = gzip.compress(tsv)
        return {"etag": f"{name}-v1", "content_length": len(data)}, lambda: iter([data])

    raw_root = os.path.join(workdir, "raw")
    result = ingest_datasets(list(RAW_TABLES), fetcher, raw_root, run_date)
    print("ingest:", result.statuses)

    # --- 2. ETL over the ingested TSVs -------------------------------
    raw = ImdbRaw(
        **{
            name: __import__(
                "aws_imdb_data_pipeline_spark.sources.tsv", fromlist=["read_imdb_tsv"]
            ).read_imdb_tsv(spark, latest_slice(raw_root, name))
            for name in RAW_TABLES
        }
    )
    lake = os.path.join(workdir, "processed")
    outputs = run_etl(raw, run_date, out_root=lake)
    for name, df in outputs.items():
        print(f"  {name}: {df.count()} rows")

    # --- 3. catalog + quality gate -----------------------------------
    facts = register_lake_table(
        spark, "analytics_movie_facts", os.path.join(lake, "analytics_movie_facts")
    )
    validate(
        [
            expect_min_rows(facts, 1),
            expect_not_null(facts, "tconst"),
            expect_values_between(facts, "averageRating", 0, 10, mostly=0.995),
        ]
    )
    print("quality gate: PASSED")

    # --- 4. model layer + analyst queries ----------------------------
    view = movie_facts_view(facts)
    top_movies_by_genre(view, n=5).show(truncate=False)
    top_genres(facts).show(truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="imdb_lake_"))
