"""Text analysis operators for training-data pipelines.

Language-ID (stopword-overlap heuristic), quality scoring, token
counting, and document fingerprinting — all built-in functions (split/
size/array_intersect/xxhash64), no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
# Real deployments would load fuller lists; the operator shape is the same.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "est"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "ist"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}


def _words(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, r"\s+")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, char count, distinct-token count, and
    mean token length per document — one narrow projection, no shuffle."""
    words = _words(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(words),
            "n_chars_measured": F.length(F.col(text_col)),
            "n_distinct_tokens": F.size(F.array_distinct(words)),
            # raw quotient: int operands are identical across engines,
            # and rounding a quotient is engine-dependent at decimal ties
            "avg_token_len": F.length(
                F.regexp_replace(F.col(text_col), r"\s+", "")
            ) / F.size(words),
        }
    )


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: the language whose stopword set overlaps
    the document's token set most (ties → lexicographic min language).
    Pure array ops; scales linearly, no shuffle."""
    words = F.array_distinct(_words(text_col))
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        words, F.array(*[F.lit(w) for w in sw])
                    )
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(STOPWORDS.items())
        ]
    )
    # max by (score, reversed-lang) == first of sort desc by score, asc lang
    best = F.sort_array(scores, asc=False)[0]
    return df.withColumn(
        out_col, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite document-quality heuristics: length band, repetition
    ratio (1 - distinct/total tokens), alpha ratio. Higher is better."""
    words = _words(text_col)
    n = F.size(words)
    rep = F.lit(1.0) - F.size(F.array_distinct(words)) / n
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z]", "")
    ) / F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    score = (
        F.when(n < 5, 0.2).when(n > 1000, 0.5).otherwise(1.0)
        * (F.lit(1.0) - F.least(rep, F.lit(1.0)) * 0.5)
        * (F.lit(0.5) + alpha_ratio * 0.5)
    )
    return df.withColumns(
        {
            "repetition_ratio": rep,
            "alpha_ratio": alpha_ratio,
            "quality": score,
        }
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp64") -> DataFrame:
    """64-bit content fingerprint: xxhash64 over the normalized text
    (collapse whitespace, lowercase). Exact-dup detection key."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(norm))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token counting: alphabetic runs, digit runs, and
    individual punctuation marks each count as one token (the
    whitespace-free approximation of a BPE pre-tokenizer). Pure
    regexp_extract_all — JVM-side, no UDF."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    return df.withColumns(
        {
            "n_bpe_tokens": F.size(toks),
            "n_alpha_tokens": F.size(
                F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
            ),
        }
    )


def top_terms_per_doc(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k terms per document by term frequency, annotated with
    smoothed TF-IDF: idf = ln((N+1)/(df+1)) + 1 (the scikit-learn
    smoothing — never negative, never divides by zero).

    The rank key is (tf DESC, word ASC) — pure integers, so the kept
    set is bit-for-bit deterministic across engines; the transcendental
    tfidf is annotation only (rounded, not ranked on).

    Plan shape: explode → (doc, word) count [shuffle 1] → word document
    frequency as a second aggregate over the (doc, word) frame
    [shuffle 2, carries one row per distinct (doc, word)] → broadcast
    back. The corpus-size scalar N joins as a 1-row broadcast.
    """
    from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group

    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    toks = df.select(F.col(id_col), F.explode(words).alias("word"))
    tf = toks.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + F.lit(1.0)) / (F.col("dfreq") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                4,
            ),
        )
        .drop("__n")
    )
    return top_n_per_group(
        scored.select(id_col, "word", "tf", "dfreq", "tfidf"),
        partition_by=[id_col],
        order_by=[F.desc("tf"), F.col("word")],
        n=k,
    )


def top_terms_from_stats(
    tfl: DataFrame,
    dfl: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """top_terms_per_doc served from the token-stats artifact
    (extensions.tokenindex): ``tfl`` = (id, lword, tf), ``dfl`` =
    (lword, df), ``n_docs`` the exact marker integer. Same output
    contract (id, word, tf, dfreq, tfidf) and the same integer rank
    key (tf DESC, word ASC); the corpus is never re-tokenized."""
    from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group

    scored = (
        tfl.select(
            F.col(id_col), F.col("lword").alias("word"), "tf"
        )
        .join(
            dfl.select(F.col("lword").alias("word"), F.col("df").alias("dfreq")),
            "word",
        )
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.lit(int(n_docs)) + F.lit(1.0))
                        / (F.col("dfreq") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                4,
            ),
        )
    )
    return top_n_per_group(
        scored.select(id_col, "word", "tf", "dfreq", "tfidf"),
        partition_by=[id_col],
        order_by=[F.desc("tf"), F.col("word")],
        n=k,
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """First-round BPE merge induction: the k most frequent adjacent
    character pairs across the corpus, weighted by word frequency —
    i.e. what a BPE trainer would merge first.

    Two-level aggregation keeps the explode bounded: words are counted
    FIRST (shuffle carries one row per distinct word), then each
    distinct word explodes into its character bigrams weighted by the
    word's count — corpus-size-independent after the first aggregate.
    Integer counts + (count DESC, pair ASC) ordering → deterministic.
    """
    from aws_imdb_data_pipeline_spark.operators.topk import top_k_global

    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("word")
    ).filter(F.length("word") >= 2)
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("wcount"))
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair"),
        "wcount",
    )
    counts = pairs.groupBy("pair").agg(F.sum("wcount").alias("pair_count"))
    return top_k_global(counts, [F.desc("pair_count"), F.col("pair")], k)


def _ngrams(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the doc
    has fewer than n tokens (sequence() would otherwise run backward).

    NOTE: transform() evaluates interpreted (no whole-stage codegen,
    no subexpression elimination) at ~40µs/gram; for anything that
    immediately explodes the grams, use ``exploded_ngrams`` instead —
    it benched ~10× faster end-to-end. This array form remains for
    consumers that genuinely need the per-doc array."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def exploded_ngrams(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "gram",
) -> DataFrame:
    """One row per (document, word n-gram), built entirely from
    whole-stage-codegen operators: posexplode the words once, then
    assemble each gram from ``lead()`` over the in-document position
    window. No higher-order functions anywhere — the array-transform
    formulation runs interpreted and measured ~10× slower end-to-end.

    Cost shape: one exchange on ``id_col`` for the window (partitions
    are single documents — bounded by document length), then grams
    stream straight into whatever aggregate follows. Docs with fewer
    than ``n`` words contribute no rows."""
    words = _words(text_col)
    tok = df.select(F.col(id_col), F.posexplode(words).alias("__pos", "__w"))
    win = Window.partitionBy(id_col).orderBy("__pos")
    parts = [F.col("__w")] + [F.lead("__w", j).over(win) for j in range(1, n)]
    last = F.lead("__w", n - 1).over(win)
    return tok.select(
        F.col(id_col),
        F.when(last.isNotNull(), F.concat_ws(" ", *parts)).alias(out_col),
    ).filter(F.col(out_col).isNotNull())


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document: the
    fraction of word bigrams/trigrams that are repeats, and the mass of
    the single most frequent bigram/trigram. Documents dominated by a
    few repeated phrases (boilerplate, spam, machine-generated filler)
    score high on both and get filtered out of training corpora.

    Formulation note — explode + hash-aggregate, NOT per-row array
    lambdas: higher-order functions evaluate interpreted (outside
    whole-stage codegen, no subexpression elimination), and Catalyst's
    project collapsing re-evaluates the gram-building transform once
    per derived column — the all-array formulation measured ~40× slower
    at sf0.1 than this plan. Exploding costs one (id, gram) shuffle
    with map-side partial aggregation — linear in corpus token count,
    the same exchange any n-gram counting job pays.

    Docs shorter than the gram size get NULL fractions (no gram rows →
    pivot/join nulls), matching the SQL ``CASE WHEN len > 0`` guard.

    Contract: ``id_col`` must uniquely identify rows. Both the position
    window and the stats join key on it, so duplicate ids would
    interleave word positions across rows and multiply the join — the
    same contract every per-document corpus operator here carries.

    Cost shape (measured at 10^6 docs): ONE posexplode + position
    window builds bigrams and trigrams together; ``stack`` turns the
    two gram columns into (id, kind, gram) long form so a single
    aggregation chain (count per gram → stats per kind → pivot on
    kind) serves both signals. Single lineage — no persist to leak, no
    re-tokenization — and the wide ``text`` column crosses no exchange
    at all (stats are narrow; the input joins back once at the end).
    """
    words = _words(text_col)
    tok = df.select(F.col(id_col), F.posexplode(words).alias("__pos", "__w"))
    win = Window.partitionBy(id_col).orderBy("__pos")
    l1, l2 = F.lead("__w", 1).over(win), F.lead("__w", 2).over(win)
    grams_long = tok.select(
        F.col(id_col),
        F.when(l1.isNotNull(), F.concat_ws(" ", "__w", l1)).alias("__g2"),
        F.when(l2.isNotNull(), F.concat_ws(" ", "__w", l1, l2)).alias("__g3"),
    ).select(
        F.col(id_col),
        F.expr("stack(2, 'bigram', __g2, 'trigram', __g3)").alias("__kind", "__g"),
    )
    per_kind = (
        grams_long.filter(F.col("__g").isNotNull())
        .groupBy(id_col, "__kind", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col, "__kind")
        .agg(
            F.sum("__c").alias("__total"),
            F.count(F.lit(1)).alias("__distinct"),
            F.max("__c").alias("__top"),
        )
        # raw quotients (identical int operands across engines)
        .select(
            F.col(id_col),
            F.col("__kind"),
            ((F.col("__total") - F.col("__distinct")) / F.col("__total")).alias(
                "__dup"
            ),
            (F.col("__top") / F.col("__total")).alias("__topf"),
        )
    )
    stats = (
        per_kind.groupBy(id_col)
        .pivot("__kind", ["bigram", "trigram"])
        .agg(F.first("__dup").alias("dup"), F.first("__topf").alias("topf"))
        .select(
            F.col(id_col),
            F.col("bigram_dup").alias("dup_bigram_frac"),
            F.col("bigram_topf").alias("top_bigram_frac"),
            F.col("trigram_dup").alias("dup_trigram_frac"),
            F.col("trigram_topf").alias("top_trigram_frac"),
        )
    )
    return df.join(stats, id_col, "left")


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style perplexity-proxy quality scoring: fit a unigram LM
    on the corpus itself (MLE word frequencies) and score each document
    by its total and mean log-probability under it. Low-probability
    documents are boilerplate/noise candidates; the score is the
    standard cheap stand-in for a KenLM perplexity filter.

    Plan shape (all JVM-side, two shuffles):
      1. explode words → groupBy word → count  (shuffle 1: vocab build;
         map-side partial aggregation absorbs Zipfian word skew)
      2. corpus total = 1-row aggregate, broadcast
      3. exploded words ⋈ vocab on word (shuffle 2 co-partitions both
         sides on the word) → per-doc SUM of ln(count/total)
    The vocab is corpus-vocabulary-sized (≪ corpus at 100 TB; broadcast
    it instead when it fits — Catalyst/AQE decides from stats).

    Float policy: the per-doc SUM of logs is rounded (engine libm logs
    can differ at the last ulp; see tools/parity float policy); the
    mean divides the ROUNDED sum by the exact integer count, so both
    engines divide identical operands.
    """
    words = df.select(
        F.col(id_col), F.explode(_words(text_col)).alias("__w")
    ).filter(F.col("__w") != "")
    tf = words.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__tf"))
    vocab = tf.groupBy("__w").agg(F.sum("__tf").alias("__c"))
    total = vocab.agg(F.sum("__c").alias("__n")).select("__n")
    return _lm_score_tf(
        tf.join(vocab, "__w").crossJoin(F.broadcast(total)), id_col
    )


def _dsir_word_stats(
    df: DataFrame, target_flag, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """One tokenize pass → (per-(doc, word) tf frame, per-word
    (__ct, __cq) model-count frame) — the shared front half of
    in-corpus weighting and frozen-model serving."""
    flagged = df.select(
        F.col(id_col), F.col(text_col), target_flag.alias("__tgt")
    )
    words = flagged.select(
        F.col(id_col), "__tgt", F.explode(_words(text_col)).alias("__w")
    ).filter(F.col("__w") != "")
    tf = words.groupBy(id_col, "__w").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__tgt").alias("__tgt")
    )
    stats = tf.groupBy("__w").agg(
        F.sum("__tf").alias("__cq"),
        F.sum(F.when(F.col("__tgt"), F.col("__tf")).otherwise(0)).alias(
            "__ct"
        ),
    )
    return tf, stats


def dsir_model_frames(
    df: DataFrame,
    target_flag,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, int, int, int]:
    """FREEZE the DSIR models for serving: the per-word (__ct, __cq)
    count frame plus exact integer scalars (n_target_tokens,
    n_raw_tokens, vocab_size) — one corpus pass, one 3-int collect
    (the bounded-scalar class of driver traffic). Score arriving
    documents against the frozen version with :func:`dsir_score_batch`
    — new docs never join the model, which is the correct serving
    semantics (a corpus-version bump refits)."""
    _, stats = _dsir_word_stats(df, target_flag, id_col, text_col)
    row = stats.agg(
        F.sum("__ct").alias("nt"),
        F.sum("__cq").alias("nq"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    return stats, int(row["nt"]), int(row["nq"]), int(row["v"])


def dsir_score_batch(
    batch: DataFrame,
    stats: DataFrame,
    nt: int,
    nq: int,
    v: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Log importance weight of NEW documents under a FROZEN model
    (from :func:`dsir_model_frames`): batch-side tokenize only, left
    join onto the model counts — an out-of-vocabulary token scores
    ln((0+1)/(nt+v)) − ln((0+1)/(nq+v)), the same Laplace smoothing,
    finite by construction. Per-trigger cost ∝ batch, never corpus."""
    words = batch.select(
        F.col(id_col), F.explode(_words(text_col)).alias("__w")
    ).filter(F.col("__w") != "")
    tf = words.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__tf"))
    joined = tf.join(stats.select("__w", "__ct", "__cq"), "__w", "left").fillna(
        {"__ct": 0, "__cq": 0}
    )
    term = F.col("__tf") * (
        F.log((F.col("__ct") + F.lit(1.0)) / F.lit(float(nt + v)))
        - F.log((F.col("__cq") + F.lit(1.0)) / F.lit(float(nq + v)))
    )
    return joined.groupBy(id_col).agg(
        F.sum("__tf").cast("bigint").alias("n_words"),
        F.round(F.sum(term), 4).alias("log_weight"),
    )


def dsir_log_weights(
    df: DataFrame,
    target_flag,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): per
    document, log w(x) = Σ_tokens [ln p_target(t) − ln p_raw(t)] for
    Laplace-smoothed unigram models — p(t) = (c(t)+1)/(N+V) with V the
    UNION vocabulary — fit on the rows matching ``target_flag``
    (target) and on the whole frame (raw). Feed the (exponentiated)
    weights to weighted_sample_without_replacement for the full DSIR
    select-toward-a-target-domain pipeline; the two compose into
    exactly the paper's recipe with both halves oracled.

    Plan shape (JVM-only, two shuffles — the unigram_lm_scores twin):
    one tokenize → (doc, word) tf carrying the doc's target flag →
    per-word (c_target, c_raw) aggregate → scoring join + per-doc sum.
    Both models come from ONE pass (the target counts are a
    conditional sum inside the raw aggregate), so adding the second
    distribution costs no extra scan. Laplace smoothing over the union
    vocabulary makes every log finite — a target-OOV token contributes
    a large negative term rather than -inf, the paper's behavior.

    Float policy: per-doc Σ tf·(ln a − ln b) ROUNDED at 4 (libm logs
    differ at the last ulp across engines; the smoothed ratios are
    exact-integer divisions, identical operands both sides)."""
    tf, stats = _dsir_word_stats(df, target_flag, id_col, text_col)
    tot = stats.agg(
        F.sum("__cq").alias("__nq"),
        F.sum("__ct").alias("__nt"),
        F.count(F.lit(1)).alias("__v"),
    )
    joined = tf.join(stats, "__w").crossJoin(F.broadcast(tot))
    term = F.col("__tf") * (
        F.log((F.col("__ct") + F.lit(1.0)) / (F.col("__nt") + F.col("__v")))
        - F.log((F.col("__cq") + F.lit(1.0)) / (F.col("__nq") + F.col("__v")))
    )
    return joined.groupBy(id_col).agg(
        F.sum("__tf").cast("bigint").alias("n_words"),
        F.round(F.sum(term), 4).alias("log_weight"),
    )


def _lm_score_tf(joined: DataFrame, id_col: str) -> DataFrame:
    """Per-doc LM aggregate over a (id, __tf, __c, __n) frame: the
    tf-WEIGHTED form Σ_t tf·ln(c_t/N) — algebraically the per-
    occurrence sum, but carrying one row per DISTINCT (doc, term), so
    the scoring join and aggregate shrink by each document's
    repetition factor (the artifact serve path depends on this: the
    persisted tf frame has no per-occurrence rows to sum over)."""
    scored = joined.groupBy(id_col).agg(
        F.sum("__tf").alias("n_words"),
        F.round(
            F.sum(F.col("__tf") * F.log(F.col("__c") / F.col("__n"))), 4
        ).alias("sum_logprob"),
    )
    return scored.select(
        id_col,
        "n_words",
        "sum_logprob",
        (F.col("sum_logprob") / F.col("n_words")).alias("avg_logprob"),
    )


def unigram_lm_scores_from_tf(
    tf: DataFrame,
    vocab: DataFrame,
    total_tokens: int,
    id_col: str = "doc_id",
    word_col: str = "word",
    tf_col: str = "tf",
    c_col: str = "c",
) -> DataFrame:
    """unigram_lm_scores served from prepared term-frequency frames
    (the token-stats artifact, extensions.tokenindex): ``tf`` =
    (id, word, tf), ``vocab`` = (word, c), ``total_tokens`` an exact
    integer scalar from the artifact marker — no corpus scan, no
    1-row total aggregate."""
    joined = (
        tf.select(
            F.col(id_col),
            F.col(word_col).alias("__w"),
            F.col(tf_col).alias("__tf"),
        )
        .join(
            vocab.select(
                F.col(word_col).alias("__w"), F.col(c_col).alias("__c")
            ),
            "__w",
        )
        .withColumn("__n", F.lit(int(total_tokens)))
    )
    return _lm_score_tf(joined, id_col)
