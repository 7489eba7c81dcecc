"""Losslessness of the q-gram prefix-blocked edit-distance join
(operators/fuzzyjoin.py) vs an exact nested-loop Python model, plus
the drift-query invariants. The blocking theorems (length filter,
count filter, prefix filter) are only as good as their edge cases —
empty strings, strings shorter than q, duplicate q-grams, and the
short×short pool that bypasses the gram path entirely — so the model
check runs over string pools that hit all of them.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.fuzzyjoin import qgram_edit_join


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


def _pool(seed: int, n: int, alpha: str, max_len: int) -> list[str]:
    rng = random.Random(seed)
    return sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(0, max_len))) for _ in range(n)}
    )


@pytest.mark.parametrize(
    "seed,k,q,alpha,max_len",
    [
        (1, 1, 2, "ab", 6),      # tiny alphabet → heavy duplicate grams
        (2, 2, 2, "abc", 8),     # k=2 widens the short pool to len<=5
        (3, 1, 3, "abcd", 9),    # q=3: strings of len<3 have no grams
        (4, 3, 2, "ab", 5),      # k*q=6 > max_len-1: EVERYTHING short
    ],
)
def test_qgram_edit_join_equals_nested_loop(spark, seed, k, q, alpha, max_len):
    strs = _pool(seed, 90, alpha, max_len)
    rows = list(enumerate(strs))
    df = spark.createDataFrame(rows, "id int, s string")
    got = qgram_edit_join(
        df, df, left_id="id", left_str="s", right_id="id", right_str="s",
        max_dist=k, q=q,
    )
    got_pairs = {
        (r["id_l"], r["id_r"], r["dist"])
        for r in got.collect()
        if r["id_l"] < r["id_r"]
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= k
    }
    assert got_pairs == want


def test_qgram_edit_join_two_sided_and_string_cols(spark):
    left = spark.createDataFrame(
        [(1, "red widget"), (2, "blu gear"), (3, "")], "lid int, lname string"
    )
    right = spark.createDataFrame(
        [(10, "red widgets"), (11, "blue gear"), (12, "x")],
        "rid int, rname string",
    )
    got = qgram_edit_join(
        left, right, left_id="lid", left_str="lname",
        right_id="rid", right_str="rname", max_dist=1, q=2,
    )
    rows = {(r["lid"], r["rid"], r["dist"]) for r in got.collect()}
    # distinct id/str cols → strings present in the output schema
    assert set(got.columns) == {"lid", "rid", "lname", "rname", "dist"}
    assert rows == {(1, 10, 1), (2, 11, 1), (3, 12, 1)}


def test_qgram_edit_join_rarity_order_is_still_lossless(spark):
    strs = _pool(11, 70, "abc", 7)
    rows = list(enumerate(strs))
    df = spark.createDataFrame(rows, "id int, s string")
    # global gram-frequency frame: rare-first prefix ordering
    rarity = (
        df.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(s) - 1, 1)),"
                    " i -> substring(s, i, 2))"
                )
            ).alias("gram")
        )
        .where(F.length("gram") == 2)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gram_df"))
    )
    got = qgram_edit_join(
        df, df, left_id="id", left_str="s", right_id="id", right_str="s",
        max_dist=1, q=2, rarity=rarity,
    )
    got_pairs = {
        (r["id_l"], r["id_r"]) for r in got.collect() if r["id_l"] < r["id_r"]
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 1
    }
    assert got_pairs == want


def test_fuzzy_name_groups_matches_python_model(spark, sf_dir):
    """The full entity-resolution composite vs an independent Python
    model: ED<=1 pairs by nested loop, connected components by
    union-find, canonical = min name, rollup counts from the raw part
    rows. Catches blocking losses, CC label bugs, and dropped fact
    rows — not just the query's own invariants."""
    from collections import Counter

    from aws_imdb_data_pipeline_spark.plans.extensions6 import (
        fuzzy_name_groups,
    )
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    parts = [
        r["p_name"]
        for r in load_table(spark, sf_dir, "part").select("p_name").collect()
    ]
    names = sorted(set(parts))
    parent = {n: n for n in names}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if _lev(a, b) <= 1:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    canon = {n: min(m for m in names if find(m) == find(n)) for n in names}
    fact_counts = Counter(parts)
    want = {}
    for c in set(canon.values()):
        members = [n for n in names if canon[n] == c]
        if len(members) > 1:
            want[c] = (len(members), sum(fact_counts[m] for m in members))

    got = {
        r["canonical"]: (r["n_names"], r["n_parts"])
        for r in fuzzy_name_groups(spark, sf_dir).collect()
    }
    assert got == want


def test_events_drift_psi_bounds(spark, sf_dir):
    from aws_imdb_data_pipeline_spark.plans.extensions6 import (
        events_drift_psi,
    )

    rows = events_drift_psi(spark, sf_dir).collect()
    assert rows, "expected one row per event_type"
    for r in rows:
        assert r["psi"] >= 0.0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms
        assert 0.0 <= r["ks_stat"] <= 1.0
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_qgram_edit_join_output_names_never_collide(spark):
    """Mixed naming: left id==str ('p_name') against a right side with
    distinct id/str — and a right str that collides with the left id —
    must yield unique, predictable output columns."""
    left = spark.createDataFrame([("red widget",)], "p_name string")
    right = spark.createDataFrame(
        [(1, "red widgets")], "rid int, p_name string"
    )
    got = qgram_edit_join(
        left, right, left_id="p_name", left_str="p_name",
        right_id="rid", right_str="p_name", max_dist=1, q=2,
    )
    assert got.columns == ["p_name_l", "rid", "p_name_r", "dist"]
    assert len(got.columns) == len(set(got.columns))
    row = got.collect()[0]
    assert (row["p_name_l"], row["rid"], row["dist"]) == ("red widget", 1, 1)
