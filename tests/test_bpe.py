"""The distributed BPE trainer vs an exact Python reference model:
identical merge SEQUENCE (order, pairs, weighted counts) and identical
final symbol arrays, over corpora engineered to hit the fold's edge
cases (overlapping pairs 'aaa', merged-symbol re-merge in a later
round, single-char words, ties broken lexicographically)."""

from __future__ import annotations

import random
from collections import Counter

from aws_imdb_data_pipeline_spark.extensions.bpe import train_bpe


def _model(texts: list[str], n_merges: int, min_count: int = 2):
    wc = Counter(
        w for t in texts for w in t.lower().split() if w != ""
    )
    vocab = {w: [*w] for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        stats: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wc[w]  # overlapping occurrences count
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((step, left, right, cnt))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:  # the same greedy fold as _apply_merge
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def _run(spark, texts, n_merges, min_count=2, local_threshold=100_000):
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, vocab = train_bpe(
        docs, n_merges=n_merges, min_count=min_count, checkpoint_every=3,
        local_threshold=local_threshold,
    )
    got_vocab = {r.word: list(r.symbols) for r in vocab.collect()}
    return merges, got_vocab


def test_bpe_classic_example(spark):
    texts = ["low lower lowest low low newer new", "wider new newer low"]
    merges, vocab = _run(spark, texts, 6)
    want_merges, want_vocab = _model(texts, 6)
    assert merges == want_merges
    assert vocab == want_vocab
    assert vocab["low"] == ["low"]  # fully merged in 2 rounds


def test_bpe_overlap_and_self_pairs(spark):
    # 'aaaa'/'aaa' force overlapping (a,a) counting and the
    # merged-symbol no-remerge-within-round rule
    texts = ["aaaa aaa aa aaaa", "aa aaa b ab ab"]
    merges, vocab = _run(spark, texts, 5, min_count=1)
    want_merges, want_vocab = _model(texts, 5, min_count=1)
    assert merges == want_merges
    assert vocab == want_vocab


def test_bpe_random_corpora_match_model(spark):
    rng = random.Random(13)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(
                    rng.choice("abcd") for _ in range(rng.randint(1, 7))
                )
                for _ in range(rng.randint(3, 25))
            )
            for _ in range(12)
        ]
        # odd trials exercise the DISTRIBUTED fold path end to end
        lt = 0 if trial % 2 else 100_000
        merges, vocab = _run(spark, texts, 7, min_count=2, local_threshold=lt)
        want_merges, want_vocab = _model(texts, 7, min_count=2)
        assert merges == want_merges, f"trial {trial}"
        assert vocab == want_vocab, f"trial {trial}"


def test_bpe_min_count_stops_early(spark):
    texts = ["ab cd ef"]  # every pair has weighted count 1
    merges, vocab = _run(spark, texts, 5, min_count=2)
    assert merges == []
    assert vocab == {"ab": ["a", "b"], "cd": ["c", "d"], "ef": ["e", "f"]}


def test_bpe_local_and_distributed_paths_identical(spark):
    """The driver-local merge loop (vocab fits) and the distributed
    fold loop must be merge-for-merge and symbol-for-symbol equal."""
    texts = ["low lower lowest low low newer new", "aaaa aaa ab ab wider"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    ml, vl = train_bpe(docs, n_merges=6, min_count=1)
    md, vd = train_bpe(docs, n_merges=6, min_count=1, local_threshold=0)
    assert ml == md
    assert sorted((r.word, list(r.symbols)) for r in vl.collect()) == sorted(
        (r.word, list(r.symbols)) for r in vd.collect()
    )


def test_apply_bpe_matches_model_encoding(spark):
    """apply_bpe (all merges as one chained codegen projection) must
    reproduce the model's sequential per-word merge application."""
    from aws_imdb_data_pipeline_spark.extensions.bpe import apply_bpe

    texts = ["low lower lowest low low newer new", "aaaa aaa ab ab wider"]
    merges, _ = _model(texts, 6, min_count=1)

    def encode(w):
        syms = [*w]
        for _, left, right, _ in merges:
            out = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms = out
        return syms

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        list(r.bpe_tokens)
        for r in apply_bpe(docs, merges).orderBy("text").collect()
    ]
    want = [
        [t for w in txt.lower().split() for t in encode(w)]
        for txt in sorted(texts)
    ]
    assert got == want
