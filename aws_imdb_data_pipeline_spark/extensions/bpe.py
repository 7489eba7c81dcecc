"""Distributed BPE (byte-pair-encoding) tokenizer training.

Classic Sennrich-style BPE, Spark-first: the training state is the
DISTINCT WORD VOCABULARY with corpus counts — (word, count, symbols
array<string>) — which is how every real BPE trainer works too (pair
statistics are weighted by word frequency, never recomputed from raw
text). One corpus pass builds the vocabulary; each merge round then
touches only the vocabulary frame:

1. pair counts: ``arrays_zip(symbols[:-1], symbols[1:])`` exploded,
   SUM(word count) per (left, right) — a map-side-combinable aggregate
   over a vocabulary-sized frame;
2. winner: max by (count DESC, left ASC, right ASC) — one bounded
   1-row collect per round (same class as the CC convergence
   signature, clusters.py:248);
3. apply: greedy left-to-right non-overlapping replacement of the
   winning pair inside each symbols array, as a pure JVM
   ``F.aggregate`` fold — no Python in the loop. The fold's
   "last == left AND current == right → replace last with merged"
   step IS the greedy semantics: after a merge the new symbol can't
   re-merge with the next token under the same rule until a later
   round, exactly like the reference implementation (verified
   token-by-token against a Python model in tests/test_bpe.py).

Iterations localCheckpoint every few rounds (lineage otherwise grows
one fold per merge, same pattern as connected_components).

100 TB story: raw text is scanned ONCE (word counts); every round
after that is O(|vocabulary|) — at web scale the distinct-word
vocabulary is millions of rows while the corpus is billions, and the
per-round shuffle key is the 2-symbol pair. The 1-row argmax collect
is the only driver traffic. n_merges is the vocabulary budget knob
(32k/64k in practice; bounded here only by round count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_vocabulary(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt, symbols) — the BPE training state. Words are
    lowercased whitespace tokens; symbols start as single characters
    (no end-of-word marker — merges stay within words)."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("symbols", F.split(F.col("word"), ""))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """SUM(cnt)-weighted adjacent-pair counts over the symbol arrays
    (overlapping occurrences count, matching the reference trainer)."""
    z = F.arrays_zip(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select("cnt", F.explode(z).alias("p"))
        .select(
            F.col("p.0").alias("left"), F.col("p.1").alias("right"), "cnt"
        )
        .groupBy("left", "right")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of (left, right) -> left+right
    as a JVM fold; see module docstring for why the fold IS the greedy
    semantics."""
    l_lit, r_lit = F.lit(left), F.lit(right)
    merged = F.lit(left + right)

    def step(acc: Column, x: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l_lit)
            & (x == r_lit)
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        symbols, F.array().cast("array<string>"), step
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_count: int = 2,
    checkpoint_every: int = 4,
    vocab_partitions: int | None = None,
    local_threshold: int = 100_000,
    word_counts: DataFrame | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    ``word_counts`` (optional): a precomputed (word, cnt) frame —
    e.g. the token-stats artifact's vocabulary (extensions.tokenindex
    dfl: lword/cf, built once per corpus version and shared with the
    BM25/LM-score family, SCALE.md §25) — skips the corpus tokenize
    pass entirely; ``docs`` is then ignored.

    Returns (merges, final_vocab): merges is a list of
    (step, left, right, pair_count) in learned order — fully
    deterministic (count DESC, then lexicographic (left, right), no
    hashes) — and final_vocab is the (word, cnt, symbols) frame after
    all merges. Stops early when the best pair's weighted count falls
    below ``min_count`` (or no pairs remain).

    **Local fast path** (``local_threshold``): after the distributed
    word-count, the training STATE is vocabulary-sized — and the merge
    loop is inherently sequential with one tiny argmax per round. When
    the vocabulary fits the driver (≤ ``local_threshold`` types), the
    loop therefore runs locally on the collected (word, cnt) pairs —
    the same architecture every production trainer uses (HuggingFace
    tokenizers / SentencePiece: distributed counting, local merge
    learning); paying a Spark job per merge round on a 31-type
    vocabulary is scheduler latency, not computation. The distributed
    fold loop below remains the path for vocabularies that DON'T fit
    (set ``local_threshold=0``), and both paths are asserted
    merge-for-merge identical in tests/test_bpe.py.

    ``vocab_partitions`` sizes the vocabulary frame the distributed
    loop iterates on (None → inherit; a web-corpus vocabulary wants
    the default parallelism)."""
    if word_counts is not None:
        vocab = word_counts.select(
            F.col(word_counts.columns[0]).alias("word"),
            F.col(word_counts.columns[1]).cast("long").alias("cnt"),
        ).withColumn("symbols", F.split(F.col("word"), ""))
    else:
        vocab = word_vocabulary(docs, text_col)
    if vocab_partitions is not None:
        vocab = vocab.coalesce(vocab_partitions)
    vocab = vocab.localCheckpoint(eager=True)

    if local_threshold and vocab.count() <= local_threshold:
        return _train_local(
            vocab, n_merges=n_merges, min_count=min_count
        )
    merges: list[tuple[int, str, str, int]] = []
    for step_no in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("pair_count"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_count:
            break
        left, right, cnt = (
            top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        )
        merges.append((step_no, left, right, cnt))
        vocab = vocab.withColumn(
            "symbols", _apply_merge(F.col("symbols"), left, right)
        )
        if step_no % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def _train_local(
    vocab: DataFrame, n_merges: int, min_count: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The driver-side merge loop for vocabularies that fit locally —
    byte-for-byte the same semantics as the distributed fold path
    (overlapping pair counts weighted by word count; greedy
    left-to-right apply; (count DESC, left, right) tie-break)."""
    from collections import Counter

    rows = vocab.select("word", "cnt").collect()
    wc = {r["word"]: r["cnt"] for r in rows}
    state = {w: [*w] for w in wc}
    merges: list[tuple[int, str, str, int]] = []
    for step_no in range(1, n_merges + 1):
        stats: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wc[w]
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((step_no, left, right, int(cnt)))
        for w, syms in state.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            state[w] = out
    # vocabulary-sized driver list: keep createDataFrame (too many
    # cells for a literal plan) but hand it to Spark as TWO pickled
    # slices instead of defaultParallelism — each slice evaluation is
    # a Python worker round-trip, and 32 near-empty slices cost ~30
    # round-trips per downstream broadcast/join build for nothing
    spark = vocab.sparkSession
    final = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(w, wc[w], state[w]) for w in wc], 2
        ),
        "word string, cnt long, symbols array<string>",
    )
    return merges, final


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode text with a learned merge list: per word, apply every
    merge in training order. The whole encoder is ONE chained column
    expression — ``transform(words, w -> fold_1(fold_2(...chars(w))))``
    composes all merges into a single whole-stage-codegen projection,
    so encoding is a zero-shuffle map regardless of merge count.
    Output: ``out_col`` = array of BPE tokens over all words (word
    boundaries never merge, matching the trainer)."""
    rules = [
        (m[1], m[2]) if len(m) == 4 else (m[0], m[1]) for m in merges
    ]

    def encode_word(w: Column) -> Column:
        syms = F.split(w, "")
        for left, right in rules:
            syms = _apply_merge(syms, left, right)
        return syms

    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    return df.withColumn(
        out_col, F.flatten(F.transform(words, encode_word))
    )
