"""Property-based tests (hypothesis) for the scalar-function library
and dedup invariants — inputs the fixture files would never contain."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.functions.cleaning import (
    banding,
    null_sentinel_cast,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.just(r"\N"),
            st.text(alphabet=" \t", max_size=3),
            st.integers(-10**6, 10**6).map(str),
            st.text(max_size=8),
        ),
        min_size=1,
        max_size=20,
    )
)
@SLOW
def test_null_sentinel_cast_never_errors_and_is_null_or_int(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x: string")
    out = [r.v for r in df.select(null_sentinel_cast("x", "int").alias("v")).collect()]
    for inp, got in zip(values, out):
        if inp is None or inp == r"\N" or (inp is not None and inp.strip() == ""):
            assert got is None
        elif got is not None:
            assert got == int(inp.strip())  # only valid ints survive


@given(
    bounds=st.lists(
        st.integers(-100, 100), min_size=1, max_size=4, unique=True
    ).map(lambda xs: sorted(xs, reverse=True)),
    values=st.lists(st.integers(-150, 150), min_size=1, max_size=10),
)
@SLOW
def test_banding_is_total_and_ordered(spark, bounds, values):
    labels = [f"b{i}" for i in range(len(bounds) + 1)]
    df = spark.createDataFrame([(float(v),) for v in values], "x: double")
    out = [
        r.b
        for r in df.select(banding("x", [float(b) for b in bounds], labels).alias("b")).collect()
    ]
    for v, got in zip(values, out):
        expected = labels[-1]
        for i, b in enumerate(bounds):
            if v >= b:
                expected = labels[i]
                break
        assert got == expected


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab "), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=12,
    )
)
@SLOW
def test_fingerprint_partitions_by_normalized_content(spark, texts):
    from aws_imdb_data_pipeline_spark.extensions.textstats import fingerprint

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = fingerprint(df).collect()
    norm = lambda t: " ".join(t.split()).lower() if t.split() else ""
    by_fp: dict[int, set[str]] = {}
    for r in rows:
        by_fp.setdefault(r.fp64, set()).add(norm(texts[r.doc_id]))
    # one fingerprint never spans two distinct normalized contents
    assert all(len(contents) == 1 for contents in by_fp.values())


def test_hash_split_proportions_and_determinism(spark):
    """hash_split_assignment must (a) be deterministic across runs,
    (b) hit the configured 5/5/90 proportions within a few points even
    on ADVERSARIALLY clustered keys (consecutive ids), which is exactly
    where the plain mod split's guarantee comes from luck."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        hash_split_assignment,
    )

    n = 20_000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out1 = hash_split_assignment(df, "doc_id").groupBy("split").count()
    counts = {r.split: r["count"] for r in out1.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["test"] / n - 0.05) < 0.01
    assert abs(counts["val"] / n - 0.05) < 0.01
    assert abs(counts["train"] / n - 0.90) < 0.02
    counts2 = {
        r.split: r["count"]
        for r in hash_split_assignment(df, "doc_id")
        .groupBy("split")
        .count()
        .collect()
    }
    assert counts == counts2
    # a different seed reshuffles membership but keeps proportions
    other = hash_split_assignment(df, "doc_id", seed=7)
    moved = (
        hash_split_assignment(df, "doc_id")
        .select("doc_id", F.col("split").alias("s1"))
        .join(other.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter("s1 <> s2")
        .count()
    )
    assert moved > 0


# --- media codec properties (pure Python, no Spark session) ----------


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(h, w, c, seed):
    import numpy as np

    from aws_imdb_data_pipeline_spark.extensions.codecs import (
        decode_png,
        encode_png,
    )

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape and (out == img).all()


@given(
    n=st.integers(0, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(n, rate, seed):
    import numpy as np

    from aws_imdb_data_pipeline_spark.extensions.codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    s = np.random.default_rng(seed).integers(-32768, 32768, size=n).astype(np.int16)
    blob = encode_wav_pcm16(s, rate)
    assert len(blob) == 44 + 2 * n
    arr, got_rate = decode_wav_pcm16(blob)
    assert got_rate == rate and arr.shape == (n, 1)
    assert (arr[:, 0] == s).all()


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
)
@SLOW
def test_exploded_ngrams_equals_array_form(spark, docs, n):
    """The codegen-only exploded_ngrams (posexplode + lead window) must
    emit exactly the rows of exploding the HOF-built _ngrams array —
    the equivalence the 83x repetition_signals rewrite rests on."""
    from aws_imdb_data_pipeline_spark.extensions.textstats import (
        _ngrams,
        _words,
        exploded_ngrams,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = [
        (r.doc_id, r.gram)
        for r in exploded_ngrams(df, n).collect()
    ]
    slow = [
        (r.doc_id, r.gram)
        for r in df.select(
            "doc_id", F.explode(_ngrams(_words("text"), n)).alias("gram")
        ).collect()
    ]
    assert sorted(fast) == sorted(slow)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 6),            # key
            st.integers(0, 20),           # seq
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 99),           # payload
        ),
        min_size=1,
        max_size=30,
    ),
    cut=st.integers(0, 20),
    overlap=st.booleans(),
)
@SLOW
def test_cdc_seq_aware_fold_any_slicing(spark, rows, cut, overlap):
    """resolve_by_seq fold invariant under ARBITRARY slicing: collapse
    one part into a tombstone snapshot, apply the other part (possibly
    overlapping, possibly entirely older), and the final live state
    must equal the one-pass collapse of everything. Duplicate
    (key, seq) rows are dropped up front — a changelog's sequence is
    unique per key by construction, and without that contract even the
    one-pass collapse is ill-defined (row_number ties break on
    arbitrary payloads)."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        apply_changelog,
        latest_state,
    )

    dedup = {(k, s): (k, s, op, v) for (k, s, op, v) in rows}
    rows = sorted(dedup.values())
    log = spark.createDataFrame(rows, "k int, seq int, op string, v int")
    want = sorted(
        (r.k, r.seq, r.v)
        for r in latest_state(log, ["k"], ["seq"]).collect()
    )
    part_a = log.filter(F.col("seq") >= cut)
    part_b = log.filter(F.col("seq") < cut) if not overlap else log
    snap = latest_state(log if overlap else part_a, ["k"], ["seq"],
                        keep_tombstones=True)
    merged = apply_changelog(snap, part_b, ["k"], ["seq"],
                             resolve_by_seq=True) if part_b.count() else snap
    got = sorted(
        (r.k, r.seq, r.v)
        for r in merged.filter(F.col("op") != "D").drop("op").collect()
    )
    assert got == want


@given(
    good=st.integers(1, 15),
    bad_pattern=st.sampled_from(["NOTINT", "1 2 3", ""]),
    n_bad=st.integers(0, 5),
)
@SLOW
def test_quarantine_reader_conservation(spark, tmp_path_factory, good,
                                        bad_pattern, n_bad):
    """Conservation law of the quarantining reader: clean + quarantined
    == data lines, the quarantined raw lines are byte-identical to the
    planted malformed ones, and clean rows parse to their typed
    values — for any mix of malformed shapes (uncastable int, too many
    columns, blank line content)."""
    import os
    import uuid

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from aws_imdb_data_pipeline_spark.sources.tsv import (
        read_imdb_tsv_with_quarantine,
    )

    work = str(tmp_path_factory.mktemp("q") / uuid.uuid4().hex)
    os.makedirs(work)
    tsv = os.path.join(work, "in.tsv")
    planted_bad = []
    with open(tsv, "w") as f:
        f.write("a\tb\n")
        for i in range(good):
            f.write(f"{i}\tok{i}\n")
        for i in range(n_bad):
            if bad_pattern == "NOTINT":
                line = f"NOTINT{i}\tx"
            elif bad_pattern == "1 2 3":
                line = f"{i}\tx\textra\tmore"
            else:
                line = "\t".join(["", "", ""])
            planted_bad.append(line)
            f.write(line + "\n")
    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", StringType())]
    )
    qdir = os.path.join(work, "quar")
    clean = read_imdb_tsv_with_quarantine(spark, tsv, schema, qdir)
    got_clean = {(r.a, r.b) for r in clean.collect()}
    assert got_clean == {(i, f"ok{i}") for i in range(good)}
    if n_bad:
        got_bad = sorted(
            r.raw_line for r in spark.read.parquet(qdir).collect()
        )
        assert got_bad == sorted(planted_bad)
    else:
        assert not os.path.exists(qdir) or not [
            p for p in os.listdir(qdir) if p.endswith(".parquet")
        ] or spark.read.parquet(qdir).count() == 0


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["header", "footer", "a", "bb", "ccc", ""]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(2, 4),
)
@SLOW
def test_remove_repeated_lines_matches_python_reference(spark, docs, min_docs):
    """Random multi-line docs vs a direct Python model: lines in >=
    min_docs distinct docs are dropped everywhere, survivor order is
    preserved, fully-boilerplate docs come back empty."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        remove_repeated_lines,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    hot = {
        line
        for line in {ln for lines in docs for ln in lines}
        if sum(1 for lines in docs if line in lines) >= min_docs
    }
    want = {
        i: "\n".join(ln for ln in lines if ln not in hot)
        for i, lines in enumerate(docs)
    }
    got = {
        r.doc_id: r.text
        for r in remove_repeated_lines(
            df, "doc_id", "text", min_docs=min_docs
        ).collect()
    }
    assert got == want
    # the 8-byte-key scale path (count/anti-join shuffles carry
    # xxhash64(line), not line text) is semantics-identical away from
    # 2^-64 collisions — pinned on the same random corpora
    got_hashed = {
        r.doc_id: r.text
        for r in remove_repeated_lines(
            df, "doc_id", "text", min_docs=min_docs, key_on_hash=True
        ).collect()
    }
    assert got_hashed == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8
        ),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(2, 4),
)
@SLOW
def test_dup_span_coverage_matches_python_reference(spark, docs, k):
    """Random word-docs vs a direct Python model: a position is covered
    iff some k-shingle window containing it occurs in >= 2 distinct
    docs; counts, coverage union, and the int/int fraction all match;
    docs shorter than k report zero."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        dup_span_coverage_metric,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    def shingles(ws):
        return [tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)]

    owners = {}
    for i, ws in enumerate(docs):
        for sh in set(shingles(ws)):
            owners.setdefault(sh, set()).add(i)
    hot = {sh for sh, o in owners.items() if len(o) >= 2}
    want = {}
    for i, ws in enumerate(docs):
        positions = [
            p for p, sh in enumerate(shingles(ws)) if sh in hot
        ]
        covered = set()
        for p in positions:
            covered.update(range(p, p + k))
        want[i] = (len(ws), len(positions), len(covered))

    got = {
        r.doc_id: (r.n_words, r.n_dup_shingles, r.covered_tokens)
        for r in dup_span_coverage_metric(
            df, "doc_id", "text", k=k, min_docs=2
        ).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=8
        ),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(2, 4),
)
@SLOW
def test_trim_duplicated_spans_matches_python_reference(spark, docs, k):
    """The ACT twin of the coverage metric: every position inside a
    cross-document hot k-shingle window is deleted, survivor order
    preserved, short docs untouched, fully-duplicated docs empty."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        trim_duplicated_spans,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    def shingles(ws):
        return [tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)]

    owners = {}
    for i, ws in enumerate(docs):
        for sh in set(shingles(ws)):
            owners.setdefault(sh, set()).add(i)
    hot = {sh for sh, o in owners.items() if len(o) >= 2}
    want = {}
    for i, ws in enumerate(docs):
        covered = set()
        for p, sh in enumerate(shingles(ws)):
            if sh in hot:
                covered.update(range(p, p + k))
        want[i] = " ".join(
            w for p, w in enumerate(ws) if p not in covered
        )

    got = {
        r.doc_id: r.text
        for r in trim_duplicated_spans(
            df, "doc_id", "text", k=k, min_docs=2
        ).collect()
    }
    assert got == want


@given(
    base=st.lists(
        st.tuples(st.sampled_from("abcdef"), st.integers(1, 5)),
        max_size=12,
    ),
    batch=st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.integers(1, 5)),
        max_size=12,
    ),
)
@SLOW
def test_merge_dfl_is_additive_for_any_vocabularies(spark, base, batch):
    """merge_dfl(base, delta) == per-term sums, for ANY pair of
    vocabularies (including disjoint terms and empty sides) — df/cf
    are mergeable statistics; the full-outer merge must never drop or
    double a term."""
    from collections import defaultdict

    from aws_imdb_data_pipeline_spark.extensions.tokenindex import merge_dfl

    def frame(rows):
        return spark.createDataFrame(
            [(w, df, df * 2) for w, df in rows],
            "lword string, df long, cf long",
        ).groupBy("lword").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf")
        )

    got = {
        r.lword: (r.df, r.cf)
        for r in merge_dfl(frame(base), frame(batch)).collect()
    }
    want: dict = defaultdict(lambda: [0, 0])
    for w, df in base + batch:
        want[w][0] += df
        want[w][1] += df * 2
    assert got == {w: tuple(v) for w, v in want.items()}


@given(
    ops=st.lists(
        st.tuples(
            st.integers(1, 4),              # key
            st.sampled_from("IUD"),         # op
            st.sampled_from("xyz"),         # group attr
        ),
        min_size=1,
        max_size=14,
    ),
    cut=st.integers(0, 14),
)
@SLOW
def test_ivm_base_plus_delta_equals_recompute_any_log(spark, ops, cut):
    """For ANY changelog and ANY base/slice split point: maintaining
    the grouped COUNT/SUM view with state-transition deltas equals
    recomputing it from the merged state — including groups that
    empty out (absent, not zero-count) and keys that churn
    I→D→I across the split."""
    from aws_imdb_data_pipeline_spark.lifecycle.cdc import (
        apply_changelog,
        latest_state,
    )
    from aws_imdb_data_pipeline_spark.lifecycle.ivm import (
        grouped_state_agg,
        maintain_grouped_agg,
        state_transition_deltas,
    )

    cut = min(cut, len(ops))
    rows = [
        (k, seq + 1, op, v) for seq, (k, op, v) in enumerate(ops)
    ]
    mk = lambda rs: spark.createDataFrame(
        rs or [(0, 0, "D", "x")],  # empty side -> harmless tombstone
        "k long, seq long, op string, v string",
    )
    base_log, slice_log = mk(rows[:cut]), mk(rows[cut:])
    snapshot = latest_state(base_log, ["k"], ["seq"])
    base = grouped_state_agg(snapshot, ["v"], "seq", "n", "s")
    deltas = state_transition_deltas(snapshot, slice_log, ["k"], ["seq"])
    got = {
        r.v: (r.n, r.s)
        for r in maintain_grouped_agg(
            base, deltas, ["v"], "seq", "n", "s"
        ).collect()
    }
    full = apply_changelog(snapshot, slice_log, ["k"], ["seq"])
    want = {
        r.v: (r.n, r.s)
        for r in grouped_state_agg(full, ["v"], "seq", "n", "s").collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert abs(got[g][1] - want[g][1]) < 1e-9


@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(6, 24),
    data=st.data(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minhash_index_serving_equals_one_shot_on_random_corpora(
    spark, tmp_path_factory, seed, n_docs, data
):
    """The artifact-served near-dup path equals the one-shot pipeline
    on RANDOM corpora, not just the shipped fixture (round-10: the
    serving rewrite's equivalence claim is the load-bearing invariant
    behind minhash_dedup_documents' exact-truth oracle). A tiny
    vocabulary forces heavy shingle collisions — the regime where a
    broken bucket kernel, a wrong bucket-size cap, or a dropped
    candidate diverges loudest."""
    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        build_minhash_band_index,
        minhash_dedup_pairs,
        minhash_pairs_from_index,
    )

    vocab = ["ab", "cd", "ef", "gh", "ij"]
    docs_py = []
    for i in range(n_docs):
        words = data.draw(
            st.lists(st.sampled_from(vocab), min_size=3, max_size=12),
            label=f"doc{i}",
        )
        docs_py.append((i, " ".join(words)))
    docs = spark.createDataFrame(docs_py, "doc_id: long, text: string")
    path = str(
        tmp_path_factory.mktemp("bands") / f"idx_{seed}_{n_docs}"
    )
    build_minhash_band_index(
        docs, "doc_id", "text", path, k=3, num_hashes=32, bands=8
    )
    served = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in minhash_pairs_from_index(
            docs, path, "doc_id", "text", threshold=0.5
        ).collect()
    }
    one_shot = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", k=3, num_hashes=32, bands=8,
            threshold=0.5,
        ).collect()
    }
    assert served == one_shot
