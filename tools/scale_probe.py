"""IMDb-shaped scale probe: run the full ETL (pipelines/imdb.py
run_etl — movies + episodes + season rollup + DQ snapshot + 4
partitioned parquet sinks) once at the REAL IMDb order of magnitude
(~10^7 title rows, ~3x10^7 principals) and report wall time + shuffle
volume, validating the pipeline's scale design with a measurement
instead of a claim. Results are recorded in SCALE.md.

Synthesis is Spark-side (spark.range + expressions) and written to
parquet FIRST so generation cost stays out of the measured window; the
measured run reads the same all-string raw shape the TSV loader
produces. Run: python tools/scale_probe.py [n_titles]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from aws_imdb_data_pipeline_spark.pipelines.imdb import ImdbRaw, run_etl
from aws_imdb_data_pipeline_spark.session import get_spark

RAW_ROOT = "/tmp/imdb_scale_raw"
OUT_ROOT = "/tmp/imdb_scale_out"
NULL = "\\N"


def _null_pct(col, pct: int, salt: int):
    """Replace ~pct% of values with the IMDb \\N sentinel, keyed on id."""
    return F.when(F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(100)) < pct, F.lit(NULL)).otherwise(col)


def synthesize(spark: SparkSession, n_titles: int) -> None:
    """Generate the 7 raw tables at IMDb-like proportions, all-string."""
    ids = spark.range(n_titles).withColumn("tconst", F.format_string("tt%09d", "id"))
    bucket = F.pmod("id", F.lit(100))
    # 55% movies, 35% episodes, 1% series, rest shorts/other — IMDb-ish
    title_type = (
        F.when(bucket < 55, "movie")
        .when(bucket < 90, "tvEpisode")
        .when(bucket == 99, "tvSeries")
        .when(bucket < 95, "short")
        .otherwise("video")
    )
    genres = F.element_at(
        F.array(
            F.lit("Drama"), F.lit("Comedy"), F.lit("Drama,Crime"), F.lit("Action"),
            F.lit("Comedy,Drama"), F.lit("Documentary"), F.lit("Action,Thriller"),
            F.lit("Drama,Romance"),
        ),
        (F.pmod("id", F.lit(8)) + 1).cast("int"),
    )
    basics = ids.select(
        "tconst",
        title_type.alias("titleType"),
        F.format_string("Title %d", "id").alias("primaryTitle"),
        F.format_string("Original %d", "id").alias("originalTitle"),
        _null_pct((1900 + F.pmod("id", F.lit(126))).cast("string"), 5, 1).alias("startYear"),
        _null_pct((1905 + F.pmod("id", F.lit(120))).cast("string"), 80, 2).alias("endYear"),
        _null_pct((40 + F.pmod("id", F.lit(140))).cast("string"), 10, 3).alias("runtimeMinutes"),
        _null_pct(genres, 5, 4).alias("genres"),
    )
    basics.write.mode("overwrite").parquet(f"{RAW_ROOT}/title_basics")

    # ~40% of titles rated (real ratio ~13%, biased up to stress joins)
    ratings = (
        ids.filter(F.pmod(F.xxhash64("id", F.lit(11)), F.lit(100)) < 40)
        .select(
            "tconst",
            F.format_string("%.1f", 1.0 + F.pmod("id", F.lit(90)) / 10.0).alias("averageRating"),
            (5 + F.pmod("id", F.lit(250000))).cast("string").alias("numVotes"),
        )
    )
    ratings.write.mode("overwrite").parquet(f"{RAW_ROOT}/title_ratings")

    n_names = max(n_titles // 5, 1000)
    crew = ids.select(
        "tconst",
        _null_pct(F.format_string("nm%08d", F.pmod(F.xxhash64("id", F.lit(21)), F.lit(n_names))), 15, 22).alias("directors"),
        _null_pct(F.format_string("nm%08d,nm%08d",
                                  F.pmod(F.xxhash64("id", F.lit(23)), F.lit(n_names)),
                                  F.pmod(F.xxhash64("id", F.lit(24)), F.lit(n_names))), 25, 25).alias("writers"),
    )
    crew.write.mode("overwrite").parquet(f"{RAW_ROOT}/title_crew")

    names = (
        spark.range(n_names)
        .select(
            F.format_string("nm%08d", "id").alias("nconst"),
            F.format_string("Name %d", "id").alias("primaryName"),
            _null_pct((1920 + F.pmod("id", F.lit(90))).cast("string"), 30, 31).alias("birthYear"),
            F.lit(NULL).alias("deathYear"),
            F.lit("actor").alias("primaryProfession"),
            F.lit(NULL).alias("knownForTitles"),
        )
    )
    names.write.mode("overwrite").parquet(f"{RAW_ROOT}/name_basics")

    # 3 principal rows per title (~3e7 at 1e7 titles): 2 cast + 1 crew
    ordinal = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("ord")
    principals = (
        ids.select("id", "tconst", ordinal)
        .select(
            "tconst",
            F.col("ord").cast("string").alias("ordering"),
            F.format_string("nm%08d", F.pmod(F.xxhash64("id", F.col("ord")), F.lit(n_names))).alias("nconst"),
            F.when(F.col("ord") == 3, "director")
            .when(F.pmod(F.xxhash64("id", F.lit(41)), F.lit(2)) == 0, "actor")
            .otherwise("actress")
            .alias("category"),
            F.lit(NULL).alias("job"),
            F.lit(NULL).alias("characters"),
        )
    )
    principals.write.mode("overwrite").parquet(f"{RAW_ROOT}/title_principals")

    # one aka row per title; ~0.05% mention an Oscar
    akas = ids.select(
        F.col("tconst").alias("titleId"),
        F.lit("1").alias("ordering"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit(51)), F.lit(2000)) == 0,
            F.format_string("Title %d (Oscar nominee)", "id"),
        ).otherwise(F.format_string("Titel %d", "id")).alias("title"),
        F.lit("DE").alias("region"),
        F.lit(NULL).alias("language"),
        F.lit(NULL).alias("types"),
        F.lit(NULL).alias("attributes"),
        F.lit("0").alias("isOriginalTitle"),
    )
    akas.write.mode("overwrite").parquet(f"{RAW_ROOT}/title_akas")

    # every tvEpisode links to a tvSeries (id % 100 == 99)
    n_series = n_titles // 100
    episodes = (
        ids.filter((bucket >= 55) & (bucket < 90))
        .select(
            "tconst",
            F.format_string(
                "tt%09d", F.pmod(F.xxhash64("id", F.lit(61)), F.lit(n_series)) * 100 + 99
            ).alias("parentTconst"),
            _null_pct((1 + F.pmod(F.xxhash64("id", F.lit(62)), F.lit(15))).cast("string"), 3, 63).alias("seasonNumber"),
            _null_pct((1 + F.pmod(F.xxhash64("id", F.lit(64)), F.lit(25))).cast("string"), 2, 65).alias("episodeNumber"),
        )
    )
    episodes.write.mode("overwrite").parquet(f"{RAW_ROOT}/title_episode")


def load_raw(spark: SparkSession) -> ImdbRaw:
    frames = {
        name: spark.read.parquet(f"{RAW_ROOT}/{name}")
        for name in (
            "title_basics", "title_ratings", "title_crew", "name_basics",
            "title_principals", "title_akas", "title_episode",
        )
    }
    return ImdbRaw(**frames)


def shuffle_totals(spark: SparkSession) -> dict[str, float]:
    """Sum shuffle read/write MB across all completed stages (UI REST)."""
    base = spark.sparkContext.uiWebUrl
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages", timeout=10)
        )
        return {
            "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1),
            "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1),
            "peak_stage_shuffle_write_mb": round(
                max((s.get("shuffleWriteBytes", 0) for s in stages), default=0) / 1e6, 1
            ),
        }
    except Exception as exc:  # metrics are best-effort; the timing is the probe
        return {"error": str(exc)}


def main() -> None:
    n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{RAW_ROOT}/title_episode"):
        t0 = time.perf_counter()
        synthesize(spark, n_titles)
        print(f"synthesis: {time.perf_counter() - t0:.1f}s (not measured)", flush=True)

    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    raw = load_raw(spark)
    # broadcast_dims=False: at 1e7 titles the rating/crew/cast joins are
    # fact-to-fact — broadcasting a 1e7-row "dim" is a driver OOM, and
    # sort-merge with AQE is the correct cluster plan at this scale.
    t0 = time.perf_counter()
    outs = run_etl(raw, "20260813", out_root=OUT_ROOT, broadcast_dims=False)
    wall = time.perf_counter() - t0
    counts = {k: spark.read.parquet(f"{OUT_ROOT}/{k}").count() for k in outs}
    print(json.dumps({
        "n_titles": n_titles,
        "etl_wall_sec": round(wall, 1),
        "output_rows": counts,
        **shuffle_totals(spark),
    }), flush=True)


if __name__ == "__main__":
    main()
