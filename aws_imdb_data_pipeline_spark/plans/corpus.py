"""Corpus-preparation queries (extensions/corpus.py) with SQL oracles:
deterministic splits, prefix-sum sequence packing, contamination
check, PII redaction, mixture sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.extensions.corpus import (
    chunk_documents,
    contamination_overlap,
    hash_split_assignment,
    mixture_sample,
    pack_documents,
    prefix_sum,
    redact_pii,
    split_assignment,
)
from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import load_table


@register(
    "corpus_split_counts",
    oracle="""
    SELECT split, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
        SELECT source, n_chars,
               CASE WHEN doc_id % 100 < 5 THEN 'test'
                    WHEN doc_id % 100 < 10 THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
    )
    GROUP BY split, source
    """,
    operators=("EXT-corpus", "A2", "P9"),
)
def corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (key-mod buckets, zero
    shuffle, reproducible across engines) summarized per (split,
    source). The split itself is a projection; only the summary
    aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        split_assignment(docs, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@register(
    "corpus_pack_bins",
    oracle="""
    WITH toks AS (
        SELECT doc_id, n_chars,
               SUM(n_chars) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    )
    SELECT CAST(FLOOR((cum - n_chars) / 8192) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS bin_chars,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM toks
    GROUP BY 1
    """,
    operators=("EXT-corpus", "W4", "A1"),
)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing summarized per bin. The global
    running sum uses the two-phase distributed prefix sum
    (extensions/corpus.py:prefix_sum) — per-range-bucket windows in
    parallel plus a broadcast of ~256 bucket offsets — NOT the
    single-partition `Window.orderBy` the oracle can afford at
    DuckDB's scale. Bins are contiguous 8192-char budgets; a document
    belongs to the bin its starting offset falls in."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_documents(docs, "doc_id", "n_chars", budget=8192)
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("bin_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "corpus_contamination",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, a.word || ' ' || b.word || ' ' || c.word AS g
        FROM w a
        JOIN w b USING (doc_id)
        JOIN w c USING (doc_id)
        WHERE b.i = a.i + 1 AND c.i = a.i + 2
    ),
    bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, g FROM sh WHERE doc_id % 97 <> 0),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY 1),
    hits AS (
        SELECT doc_id, COUNT(*) AS n_contaminated
        FROM corpus JOIN bench USING (g) GROUP BY 1
    )
    SELECT doc_id, n_shingles,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           COALESCE(n_contaminated, 0) * 1.0 / n_shingles
               AS contamination_ratio
    FROM totals LEFT JOIN hits USING (doc_id)
    WHERE COALESCE(n_contaminated, 0) > 0
    """,
    operators=("EXT-corpus", "EXT-dedup", "J1", "A1"),
)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: every ~97th document plays the
    benchmark; report corpus documents sharing ≥1 distinct 3-gram with
    it. Benchmark shingle set broadcast; corpus side shuffles once on
    the shingle. Only contaminated docs are emitted (the interesting
    rows — at 100 TB the clean majority should never leave the
    executors)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.pmod("doc_id", F.lit(97)) == 0)
    corpus = docs.filter(F.pmod("doc_id", F.lit(97)) != 0)
    return contamination_overlap(corpus, bench).filter(
        F.col("n_contaminated") > 0
    )


@register(
    "corpus_redaction_stats",
    oracle=r"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '[0-9]{7,}'))) AS BIGINT)
               AS n_long_numbers,
           CAST(SUM(CASE WHEN regexp_matches(text, '[0-9]{7,}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
           CAST(SUM(length(text) - length(regexp_replace(
               text, '[0-9]{7,}', '<NUMBER>', 'g'))) AS BIGINT) AS chars_removed
    FROM documents
    GROUP BY source
    """,
    operators=("EXT-corpus", "F16", "A1"),
)
def corpus_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction (chained regexp_replace projection,
    extensions/corpus.py:redact_pii) audited per source: docs touched,
    matches replaced, net characters removed. The corpus is synthetic
    word-soup so the email/SSN patterns rarely fire; the long-digit
    rule is the observable one — the oracle pins its exact semantics.
    All whole-stage-codegen; one aggregate shuffle on `source`."""
    docs = load_table(spark, sf_dir, "documents")
    red = redact_pii(docs)
    return red.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit(r"[0-9]{7,}"), F.lit(0)))
        ).alias("n_long_numbers"),
        F.sum(
            F.when(F.col("text").rlike(r"[0-9]{7,}"), 1).otherwise(0)
        ).alias("n_docs_redacted"),
        F.sum(F.length("text") - F.length(
            F.regexp_replace("text", r"[0-9]{7,}", "<NUMBER>")
        )).alias("chars_removed"),
    )


@register(
    "corpus_mixture_sample",
    oracle="""
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE (source = 'src0' AND doc_id % 1000 < 300)
       OR (source = 'src1' AND doc_id % 1000 < 1000)
       OR (source = 'src2' AND doc_id % 1000 < 500)
    GROUP BY source
    """,
    operators=("EXT-corpus", "P2", "A2"),
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: keep 30% src0 / 100% src1 / 50% src2 by
    deterministic key-mod sampling (reproducible under task retries,
    unlike rand()); unlisted sources drop out. Pure filter that pushes
    into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = mixture_sample(docs, {"src0": 0.3, "src1": 1.0, "src2": 0.5})
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@register(
    "corpus_prefix_sum_check",
    oracle="""
    SELECT doc_id,
           CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cumsum
    FROM documents
    WHERE doc_id % 11 = 0
    """,
    operators=("EXT-corpus", "W4"),
)
def corpus_prefix_sum_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed two-phase prefix sum verified row-by-row against
    the oracle's single-partition window — on a mod-11 slice so the
    result set stays small while every range bucket is exercised."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.pmod("doc_id", F.lit(11)) == 0)
        .select("doc_id", "n_chars")
    )
    return prefix_sum(docs, "doc_id", "n_chars", out_col="cumsum").select(
        "doc_id", F.col("cumsum").cast("bigint").alias("cumsum")
    )


@register(
    "corpus_doc_chunks",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
        FROM documents
    ),
    c AS (
        SELECT doc_id, words,
               unnest(generate_series(
                   0,
                   GREATEST(1, CAST(CEIL((len(words) - 32) / 24.0) AS INT) + 1) - 1
               )) AS chunk_id
        FROM w
    )
    SELECT doc_id, chunk_id,
           len(words[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS n_chunk_words,
           md5(array_to_string(
               words[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')) AS chunk_md5
    FROM c
    """,
    operators=("EXT-corpus", "F1", "F2", "F4"),
)
def corpus_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (extensions/corpus.py:chunk_documents):
    32-word chunks with 8-word overlap (stride 24), one output row per
    (doc, chunk). Chunk text is reported as a portable md5 so the
    oracle compare stays narrow. Chunking is a zero-shuffle per-row
    flatMap in whole-stage codegen — sequence/transform/slice, no
    Python UDF; at 100 TB the explode multiplies rows ~2-4x but never
    exchanges them."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=32, overlap=8).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("n_chunk_words").cast("bigint").alias("n_chunk_words"),
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


@register("corpus_hash_split_counts", oracle=None, operators=("EXT-corpus", "A2"))
def corpus_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash-split variant of corpus_split_counts: buckets come from
    xxhash64(doc_id, seed) so clustered ids (crawl batches, shards)
    cannot correlate with the split. xxhash64 is engine-specific -> no
    SQL oracle for the assignment itself (rows-only); the CONTRACT is
    driver-verified by the oracled companion corpus_hash_split_check
    (fraction tolerance + partition invariance as a pinned boolean
    output) and property-tested in tests/test_properties.py."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split_assignment(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


@register(
    "corpus_shuffle_shards",
    oracle="""
    WITH affine AS (
        SELECT doc_id,
               (48271 * doc_id + 12345) % 1000000007 AS y
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, (((y * y) % 1000000007) * y) % 1000000007 AS k
        FROM affine
    ),
    sharded AS (
        SELECT doc_id, k, CAST(k % 8 AS INT) AS shard FROM keyed
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM sharded
    """,
    operators=("EXT-corpus", "W1", "P8"),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle (extensions.corpus.
    seeded_shuffle): affine permutation of the id space → shard +
    within-shard rank, reproducible under any physical plan — unlike
    rand(seed), whose stream is keyed to partition layout. No global
    sort: ranks are per-shard windows."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import seeded_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return seeded_shuffle(docs, "doc_id", seed=12345, n_shards=8).select(
        "doc_id", "shard", F.col("pos").cast("bigint").alias("pos")
    )


@register(
    "corpus_length_histogram",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_words
        FROM documents WHERE trim(text) <> ''
        UNION ALL
        SELECT doc_id, 0 AS n_words FROM documents WHERE trim(text) = ''
    )
    SELECT CAST(n_words // 50 AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           MIN(n_words) AS min_words,
           MAX(n_words) AS max_words,
           CAST(SUM(n_words) AS BIGINT) AS sum_words
    FROM toks
    GROUP BY 1
    """,
    operators=("EXT-corpus", "EXT-text", "A1", "P9"),
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram in exact 50-word bins — the
    batch-sizing profile a training pipeline reads before choosing
    context-length buckets. Integer division binning (never
    floor(log2): float log at bin edges diverges between engines).
    Uses the shared \\s+ tokenizer; empty docs land in bin 0."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import _words

    docs = load_table(spark, sf_dir, "documents")
    n_words = F.when(
        F.trim(F.col("text")) == "", F.lit(0)
    ).otherwise(F.size(_words(F.trim(F.col("text")))))
    binned = docs.select(n_words.alias("n_words")).select(
        (F.col("n_words") / 50).cast("bigint").alias("bin"), "n_words"
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_words").cast("bigint").alias("min_words"),
        F.max("n_words").cast("bigint").alias("max_words"),
        F.sum("n_words").alias("sum_words"),
    )


_LM_SCORED_SQL = r"""
    WITH words AS (
        SELECT doc_id, w AS word
        FROM documents,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t(w)
        WHERE w <> ''
    ),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM words GROUP BY doc_id, word
    ),
    vocab AS (SELECT word, SUM(tf) AS c FROM tf GROUP BY word),
    total AS (SELECT SUM(c) AS n FROM vocab),
    scored AS (
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_words,
               ROUND(SUM(tf * LN(c / n)), 4) AS sum_logprob
        FROM tf JOIN vocab USING (word) CROSS JOIN total
        GROUP BY doc_id
    )
"""


@register(
    "doc_lm_scores",
    oracle=_LM_SCORED_SQL
    + """
    SELECT doc_id, n_words, sum_logprob,
           sum_logprob / n_words AS avg_logprob
    FROM scored
    """,
    operators=("EXT-text", "EXT-corpus", "A1", "J1"),
)
def doc_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality filter: unigram-LM log-probability per
    document, model fit on the corpus itself (extensions.textstats).
    The standard cheap stand-in for CCNet's KenLM perplexity bucketing.

    Served from the token-stats artifact (extensions.tokenindex,
    SCALE.md §25): the per-(doc, term) tf frame and the vocabulary are
    persisted parquet, the corpus token total an exact marker integer.
    The score uses the tf-WEIGHTED sum Σ tf·ln(c/N) — algebraically
    the per-occurrence sum, one row per distinct (doc, term) — and the
    oracle computes the identical form, so the 4-decimal rounding
    policy still hash-matches."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import (
        unigram_lm_scores_from_tf,
    )
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import token_stats

    ts = token_stats(spark, sf_dir)
    return unigram_lm_scores_from_tf(ts.tf(), ts.vocab(), ts.sum_dl)


@register(
    "lm_quality_buckets",
    oracle=_LM_SCORED_SQL
    + """,
    lm AS (
        SELECT doc_id, sum_logprob / n_words AS avg_logprob FROM scored
    ),
    cuts AS (
        SELECT quantile_cont(avg_logprob, 1.0/3) AS c1,
               quantile_cont(avg_logprob, 2.0/3) AS c2
        FROM lm
    ),
    bucketed AS (
        SELECT d.source,
               CASE WHEN s.avg_logprob >= c.c2 THEN 'head'
                    WHEN s.avg_logprob >= c.c1 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM lm s JOIN documents d USING (doc_id) CROSS JOIN cuts c
    )
    SELECT source, bucket, COUNT(*) AS n_docs
    FROM bucketed GROUP BY source, bucket
    """,
    operators=("EXT-text", "EXT-corpus", "A-percentile", "A1"),
)
def lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing: exact global
    terciles of the unigram-LM score (1-row aggregate, broadcast back)
    band every document; report the per-source mix. The cutoffs are
    exact percentiles on identical doubles in both engines (same
    linear interpolation — see price_percentiles), and the banding
    compares those identical doubles, so the oracle hash-matches.
    At 100 TB swap the exact percentile for approx_percentile and keep
    everything else (the cutoff stays a broadcast scalar). LM scores
    ride the same token-stats artifact as doc_lm_scores (SCALE.md
    §25) — one family build serves both."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import (
        unigram_lm_scores_from_tf,
    )
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import token_stats

    docs = load_table(spark, sf_dir, "documents")
    ts = token_stats(spark, sf_dir)
    scored = unigram_lm_scores_from_tf(ts.tf(), ts.vocab(), ts.sum_dl).select(
        "doc_id", "avg_logprob"
    )
    cuts = scored.agg(
        F.percentile("avg_logprob", F.lit(1.0 / 3)).alias("c1"),
        F.percentile("avg_logprob", F.lit(2.0 / 3)).alias("c2"),
    )
    bucketed = (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .crossJoin(F.broadcast(cuts))
        .select(
            "source",
            F.when(F.col("avg_logprob") >= F.col("c2"), F.lit("head"))
            .when(F.col("avg_logprob") >= F.col("c1"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
    return bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "corpus_temperature_mixture",
    oracle="""
    WITH counts AS (
        SELECT source, COUNT(*) AS c FROM documents GROUP BY source
    ),
    cuts AS (
        SELECT source, c,
               FLOOR(1000 * SQRT((SELECT MIN(c) FROM counts) * 1.0 / c))
                   AS cut
        FROM counts
    )
    SELECT d.source,
           MAX(k.c) AS n_total,
           COUNT(*) AS n_kept
    FROM documents d
    JOIN cuts k ON k.source = d.source
    WHERE d.doc_id % 1000 < k.cut
    GROUP BY d.source
    """,
    operators=("EXT-corpus", "A2", "P2"),
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=2 temperature mixing (extensions.corpus.
    sqrt_temperature_mixture): rates √(min/count) derived from observed
    source counts, applied as a deterministic key-mod filter; report
    total vs kept per source. sqrt is IEEE-correctly-rounded → the
    oracle computes the identical cutoff."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        sqrt_temperature_mixture,
    )

    docs = load_table(spark, sf_dir, "documents")
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept = sqrt_temperature_mixture(docs).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    return kept.join(totals, "source").select("source", "n_total", "n_kept")


@register(
    "corpus_remove_boilerplate",
    # Multi-line form derived deterministically from documents: line 0
    # is a per-language header ("LANG: <lang>" — the planted boilerplate
    # repeating across every same-language doc), the rest are 10-word
    # chunks of the content (unique at min_docs=5). Removal must strip
    # exactly the headers and keep every content chunk in order.
    oracle="""
    WITH ml AS (
        SELECT doc_id,
               'LANG: ' || lang || chr(10) ||
               array_to_string(
                   list_transform(
                       generate_series(
                           0,
                           CAST(ceil(len(string_split(text, ' ')) / 10.0)
                                AS INT) - 1),
                       i -> array_to_string(
                           string_split(text, ' ')[i*10+1 : i*10+10], ' ')
                   ), chr(10)) AS text
        FROM documents
    ),
    lines AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10))) AS line,
               generate_subscripts(string_split(text, chr(10)), 1) AS pos
        FROM ml
    ),
    hot AS (
        SELECT line FROM lines GROUP BY line
        HAVING COUNT(DISTINCT doc_id) >= 5
    )
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY pos) AS cleaned_text
    FROM lines
    WHERE line NOT IN (SELECT line FROM hot)
    GROUP BY doc_id
    """,
    operators=("EXT-corpus", "EXT-dedup", "A6", "J-anti"),
)
def corpus_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document repeated-line removal (the C4/RefinedWeb
    boilerplate step, extensions.corpus.remove_repeated_lines): lines
    occurring in >= 5 distinct docs are dropped, survivor order
    preserved. The corpus is single-line text, so the query derives a
    deterministic multi-line form first — a per-language header line
    (guaranteed cross-document boilerplate) plus 10-word content
    chunks — and the oracle rebuilds the identical form in SQL."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        remove_repeated_lines,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    words = F.split("text", " ")
    n_chunks = F.ceil(F.size(words) / 10.0).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * 10 + 1, 10), " "),
    )
    ml = docs.select(
        "doc_id",
        F.array_join(
            F.concat(
                F.array(F.concat(F.lit("LANG: "), F.col("lang"))), chunks
            ),
            "\n",
        ).alias("text"),
    )
    cleaned = remove_repeated_lines(ml, "doc_id", "text", min_docs=5)
    return cleaned.select("doc_id", F.col("text").alias("cleaned_text"))
