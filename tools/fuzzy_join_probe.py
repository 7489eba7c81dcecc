"""Fuzzy-join scale probe (SCALE.md §30).

qgram_edit_join's scale claim: the lossless q-gram prefix blocking
turns an O(N²) levenshtein sweep into an equi-join on (gram, occ)
whose candidate count is governed by prefix selectivity, not N². This
probe measures that on growing synthetic name vocabularies (realistic
shape: adjective-noun-variant product names, ~8-24 chars, with planted
1-edit twins so the answer is never empty):

- candidate pairs reaching the levenshtein verify, vs N²/2;
- wall time of the blocked join, vs the nested-loop cross join
  (cross join measured only at the smallest N — it's the quadratic
  baseline the operator exists to avoid);
- losslessness spot-check: blocked result == cross-join result at the
  smallest N.

Usage: python tools/fuzzy_join_probe.py [N ...]  (default 5k 20k 60k)
One JSON line per N.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.operators.fuzzyjoin import (  # noqa: E402
    _prefix_elements,
    qgram_edit_join,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

K = int(os.environ.get("FUZZY_PROBE_K", "1"))
Q = int(os.environ.get("FUZZY_PROBE_Q", "2"))

ADJ = ["red", "blue", "green", "cold", "warm", "old", "new", "big",
       "small", "fine", "flat", "long", "dark", "pale", "deep", "soft"]
NOUN = ["widget", "gizmo", "gear", "bolt", "plate", "ring", "rod",
        "valve", "clamp", "lever", "shaft", "spring", "washer", "pin"]


def _names(spark, n: int):
    """n product-ish names with realistic tail diversity: adjective +
    noun + 5-char base-36 SKU code (hash-derived). Every 10th id is a
    planted 1-edit twin of its successor's name (last code char →
    'z'), so true matches grow LINEARLY with N — the regime fuzzy
    matching exists for. (A version-counter vocabulary where every
    name has dozens of true 1-edit neighbors makes ANY join quadratic
    because the OUTPUT is quadratic — that regime is match-dense
    dedup, served by the exact/minhash family instead.)"""
    base = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, F.col("id") + 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    code = F.lpad(
        F.lower(
            F.conv(
                F.pmod(F.xxhash64(F.col("seed")), F.lit(60466176)).cast(
                    "string"
                ),
                10,
                36,
            )
        ),
        5,
        "0",
    )
    s0 = F.concat_ws(
        " ",
        F.element_at(
            F.array(*[F.lit(a) for a in ADJ]),
            (F.col("seed") % 16 + 1).cast("int"),
        ),
        F.element_at(
            F.array(*[F.lit(w) for w in NOUN]),
            (F.col("seed") % 14 + 1).cast("int"),
        ),
        code,
    )
    named = base.select(
        "id",
        F.when(
            F.col("id") % 10 == 0,
            F.concat(s0.substr(F.lit(1), F.length(s0) - 1), F.lit("z")),
        )
        .otherwise(s0)
        .alias("s"),
    )
    # dedupe to a distinct-name vocabulary like the registered query
    return named.select("s").distinct().withColumn("id", F.xxhash64("s"))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 20_000, 60_000]
    spark = get_spark("fuzzy-join-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for i, n in enumerate(sizes):
        d = _names(spark, n).cache()
        n_distinct = d.count()

        t0 = time.time()
        blocked = qgram_edit_join(
            d, d, left_id="id", left_str="s", right_id="id",
            right_str="s", max_dist=K, q=Q,
        ).filter(F.col("id_l") < F.col("id_r"))
        n_matches = blocked.count()
        t_blocked = time.time() - t0

        # candidate volume = distinct pairs surviving the prefix join
        # (before the levenshtein verify), under the SAME rare-first
        # element order the operator defaults to
        rarity = (
            d.select(
                F.explode(
                    F.expr(
                        f"transform(sequence(1, greatest(length(s) - {Q - 1}, 1)),"
                        f" i -> substring(s, i, {Q}))"
                    )
                ).alias("gram")
            )
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("gram_df"))
        )
        lp = _prefix_elements(
            d.selectExpr("id as __lid", "s as __ls"), "__lid", "__ls",
            k=K, q=Q, rarity=rarity,
        )
        rp = _prefix_elements(
            d.selectExpr("id as __rid", "s as __rs"), "__rid", "__rs",
            k=K, q=Q, rarity=rarity,
        )
        n_cand = (
            lp.join(rp, ["gram", "occ"])
            .filter(F.col("__lid") < F.col("__rid"))
            .select("__lid", "__rid")
            .distinct()
            .count()
        )

        out = {
            "n_names": n_distinct,
            "k": K,
            "q": Q,
            "matches": n_matches,
            "candidates": n_cand,
            "cand_frac_of_n2": n_cand / (n_distinct * (n_distinct - 1) / 2),
            "blocked_sec": round(t_blocked, 2),
        }
        if i <= 1:
            t0 = time.time()
            a = d.selectExpr("id as ida", "s as sa")
            b = d.selectExpr("id as idb", "s as sb")
            cross = (
                a.crossJoin(b)
                .filter(F.col("ida") < F.col("idb"))
                .filter(F.levenshtein("sa", "sb") <= K)
            )
            n_cross = cross.count()
            out["cross_sec"] = round(time.time() - t0, 2)
            out["lossless_vs_cross"] = n_cross == n_matches
        print(json.dumps(out), flush=True)
        d.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
