"""Property tests for the second extensions batch (SCD2, exact
stratified sampling, top terms, BPE merges). Value parity vs DuckDB is
covered by tests/test_parity.py's registry-wide sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans import REGISTRY


def test_scd2_intervals_partition_history(spark, sf_dir):
    hist = REGISTRY["scd2_user_event_type"].fn(spark, sf_dir).cache()
    # exactly one open (current) row per user
    per_user = hist.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("version").alias("max_v"),
    )
    bad = per_user.filter(
        (F.col("n_current") != 1) | (F.col("max_v") != F.col("n_rows"))
    )
    assert bad.count() == 0
    # intervals chain: each row's effective_to equals the next row's
    # effective_from (no gaps, no overlaps)
    nxt = hist.select(
        "user_id",
        F.col("version").alias("v"),
        F.col("effective_from").alias("nxt_from"),
    )
    chained = hist.join(
        nxt,
        (hist.user_id == nxt.user_id) & (hist.version + 1 == nxt.v),
        "inner",
    )
    assert chained.filter(F.col("effective_to") != F.col("nxt_from")).count() == 0
    # compression: consecutive versions never repeat the attribute
    same = hist.select(
        "user_id", F.col("version").alias("v"), F.col("event_type").alias("t2")
    )
    adj = hist.join(
        same, (hist.user_id == same.user_id) & (hist.version + 1 == same.v)
    )
    assert adj.filter(F.col("event_type") == F.col("t2")).count() == 0
    hist.unpersist()


def test_stratified_sample_exact_counts(spark, sf_dir):
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sampled = REGISTRY["corpus_stratified_sample"].fn(spark, sf_dir)
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    want = {r["lang"]: min(40, r["n"]) for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    # deterministic: a second draw returns the identical id set
    again = set(
        r["doc_id"]
        for r in REGISTRY["corpus_stratified_sample"].fn(spark, sf_dir)
        .select("doc_id").collect()
    )
    assert again == {r["doc_id"] for r in sampled.select("doc_id").collect()}


def test_top_terms_rank_contract(spark, sf_dir):
    terms = REGISTRY["doc_top_terms"].fn(spark, sf_dir).cache()
    # <= 3 rows per doc, and tf is non-increasing within a doc
    sizes = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert sizes.filter(F.col("n") > 3).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), "word")
    mono = terms.withColumn("prev_tf", F.lag("tf").over(w)).filter(
        F.col("prev_tf").isNotNull() & (F.col("tf") > F.col("prev_tf"))
    )
    assert mono.count() == 0
    terms.unpersist()


def test_bpe_pairs_are_bigrams(spark, sf_dir):
    pairs = REGISTRY["bpe_merge_pairs"].fn(spark, sf_dir).collect()
    assert len(pairs) == 20
    assert all(len(r["pair"]) == 2 and r["pair"].isalpha() for r in pairs)
    counts = [r["pair_count"] for r in pairs]
    assert counts == sorted(counts, reverse=True)


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunks tile the word sequence: stride-spaced starts, every chunk
    except the last is full-size, consecutive chunks share exactly
    `overlap` words, and concatenating chunk heads reconstructs the
    document."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import chunk_documents

    words = [f"w{i}" for i in range(75)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(words[:5])), (3, " ".join(words[:32]))],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_size=32, overlap=8)
    rows = {
        (r.doc_id, r.chunk_id): r.chunk_text.split(" ")
        for r in out.collect()
    }
    # doc 2 (5 words < chunk) and doc 3 (exactly chunk) -> one chunk each
    assert [k for k in rows if k[0] == 2] == [(2, 0)]
    assert rows[(2, 0)] == words[:5]
    assert [k for k in rows if k[0] == 3] == [(3, 0)]
    assert rows[(3, 0)] == words[:32]
    # doc 1: 75 words, stride 24 -> ceil((75-32)/24)+1 = 3 chunks
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2]
    for i in d1:
        chunk = rows[(1, i)]
        assert chunk == words[i * 24 : i * 24 + 32]
        if i > 0:
            assert rows[(1, i - 1)][-8:] == chunk[:8] or len(chunk) < 32
    # full coverage: union of chunk word positions == all positions
    covered = set()
    for i in d1:
        covered.update(range(i * 24, min(i * 24 + 32, 75)))
    assert covered == set(range(75))


def test_chunk_documents_whitespace_runs_match_token_stats(spark):
    """chunk_documents tokenizes with the shared \\s+ regex: runs of
    spaces/newlines don't mint empty-string 'words', so the summed
    chunk word count of a 1-chunk doc equals token_stats' n_tokens for
    the same text (the cross-operator consistency ADVICE flagged)."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import chunk_documents
    from aws_imdb_data_pipeline_spark.extensions.textstats import token_stats

    text = "alpha  beta\tgamma\n\ndelta epsilon   zeta"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    [chunk] = chunk_documents(docs, chunk_size=32, overlap=8).collect()
    [stats] = token_stats(docs).collect()
    assert chunk.n_chunk_words == stats.n_tokens == 6
    assert chunk.chunk_text == "alpha beta gamma delta epsilon zeta"
