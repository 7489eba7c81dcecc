"""The docgen Python DataSource: partition-count-independent content,
doc_id range pushdown pruning partitions, and drop-in schema
compatibility with the documents-table operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.sources.docgen import DocGenDataSource


def _gen(spark, **opts):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocGenDataSource)
    r = spark.read.format("docgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_docgen_count_schema_and_determinism(spark):
    df = _gen(spark, n_docs=2000, n_partitions=7, seed=3)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 2000
    # content is a pure function of (seed, doc_id): repartitioning the
    # generator must not change a single row
    df3 = _gen(spark, n_docs=2000, n_partitions=3, seed=3)
    h = lambda d: d.agg(  # noqa: E731
        F.expr("bit_xor(xxhash64(doc_id, text, lang, source))").alias("h")
    ).first()["h"]
    assert h(df) == h(df3)
    # different seed -> different corpus
    assert h(df) != h(_gen(spark, n_docs=2000, n_partitions=3, seed=4))


def test_docgen_filter_pushdown_prunes_partitions(spark):
    df = _gen(spark, n_docs=10_000, n_partitions=10, seed=1)
    sliced = df.filter((F.col("doc_id") >= 1000) & (F.col("doc_id") < 1100))
    rows = sliced.collect()
    assert len(rows) == 100
    assert {r.doc_id for r in rows} == set(range(1000, 1100))
    # the pushed range keeps only 1 of 10 generator partitions
    reader = DocGenDataSource(
        {"n_docs": "10000", "n_partitions": "10"}
    ).reader(None)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    rest = list(
        reader.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 1000), LessThan(("doc_id",), 1100)]
        )
    )
    assert rest == []  # fully absorbed
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].start == 1000 and parts[0].end == 1100
    # an impossible range launches zero tasks
    reader2 = DocGenDataSource({"n_docs": "10000"}).reader(None)
    list(reader2.pushFilters([GreaterThanOrEqual(("doc_id",), 99999)]))
    assert reader2.partitions() == []


def test_docgen_feeds_corpus_operators(spark):
    """Generated docs run through a real corpus operator unchanged —
    the schema is the documents-table contract."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import exploded_ngrams

    df = _gen(spark, n_docs=200, n_partitions=4, seed=9)
    grams = exploded_ngrams(df, 3)
    assert grams.count() > 0
    n_words = df.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("n")
    ).first()["n"]
    # every doc with >= 3 words contributes len(words) - 2 trigrams
    expected = n_words - 2 * df.filter(F.size(F.split("text", r"\s+")) >= 3).count()
    assert grams.count() == expected


def test_docgen_stream_equals_batch(spark, tmp_path):
    """readStream over docgen drains the same corpus the batch reader
    produces: micro-batched by offset, replayable because content is a
    pure function of (seed, doc_id)."""
    spark.dataSource.register(DocGenDataSource)
    opts = {"n_docs": "450", "rows_per_batch": "100", "seed": 5}
    stream = spark.readStream.format("docgen").options(**opts).load()
    # availableNow snapshots only the first prefetched simple-reader
    # batch, so drain with the ASAP trigger and stop at the known end
    q = (
        stream.writeStream.format("memory")
        .queryName("docgen_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 120
    got = spark.table("docgen_stream")
    while got.count() < 450 and time.time() < deadline:
        time.sleep(1)
    q.stop()
    batch = _gen(spark, n_docs=450, n_partitions=4, seed=5)
    assert got.count() == 450
    h = lambda d: d.agg(  # noqa: E731
        F.expr("bit_xor(xxhash64(doc_id, text, lang, source))").alias("h")
    ).first()["h"]
    assert h(got) == h(batch)


def test_docgen_zipf_vocab_deterministic_and_heavy_tailed(spark):
    """The ``vocab_size`` option: (a) same (seed, doc_id) -> same text
    regardless of partition count; (b) the realized vocabulary is a
    heavy-tailed Zipfian — thousands of types, a stopword-dense head
    (max df near n_docs) and a rare median type — the selectivity
    regime the lexical bench needs (SCALE.md §29)."""
    from pyspark.sql import functions as F

    opts = dict(n_docs=2000, vocab_size=5000, seed=11, min_words=40,
                max_words=80)
    a = _gen(spark, **opts, n_partitions=4)
    b = _gen(spark, **opts, n_partitions=13)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    words = a.select(
        F.explode(F.split("text", r"\s+")).alias("w"), "doc_id"
    )
    df = words.distinct().groupBy("w").count()
    stats = df.agg(
        F.count(F.lit(1)).alias("types"),
        F.max("count").alias("maxdf"),
        F.expr("percentile_approx(count, 0.5)").alias("meddf"),
    ).collect()[0]
    assert stats.types >= 2500            # thousands of realized types
    assert stats.maxdf >= 1500            # head terms are stopword-like
    assert stats.meddf <= 2000 * 0.05     # median type is rare
