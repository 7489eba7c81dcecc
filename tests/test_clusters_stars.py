"""Alternating large-star/small-star connected components: agreement
with min-label propagation, logarithmic round counts on long chains,
and the strict/validate contracts."""

from __future__ import annotations

import random

import pytest

from aws_imdb_data_pipeline_spark.extensions.clusters import (
    connected_components,
    connected_components_stars,
)


def test_stars_known_graph(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], ["id_a", "id_b"]
    )
    out = {
        r.node: r.component
        for r in connected_components_stars(pairs, validate=True).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_stars_matches_label_propagation_random_graphs(spark):
    """On seeded random graphs both algorithms must emit identical
    (node, component) labelings — min-reachable-id is canonical."""
    rng = random.Random(7)
    for trial in range(3):
        n = 300
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(250 + 50 * trial)
        ]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        via_stars = {
            r.node: r.component
            for r in connected_components_stars(pairs, validate=True).collect()
        }
        via_prop = {
            r.node: r.component
            for r in connected_components(pairs, max_iterations=60).collect()
        }
        assert via_stars == via_prop


def test_stars_long_chain_in_logarithmic_rounds(spark):
    """A 64-node chain has diameter 63: label propagation needs 63
    iterations, star contraction must finish in <= 10 rounds."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["id_a", "id_b"]
    )
    rounds = []
    out = {
        r.node: r.component
        for r in connected_components_stars(
            pairs, max_rounds=10, strict=True, on_round=lambda r, n: rounds.append(r)
        ).collect()
    }
    assert out == {i: 0 for i in range(64)}
    assert len(rounds) <= 10


def test_stars_nonconvergence_signals(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_stars(pairs, max_rounds=1, strict=True).collect()
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components_stars(pairs, max_rounds=1).collect()
    # and validate catches the split labeling the early exit produced
    # (the non-strict path warns first, then validation raises — assert
    # the warning too so it never leaks into the suite summary)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        with pytest.raises(RuntimeError, match="validation failed"):
            connected_components_stars(
                pairs, max_rounds=1, validate=True
            ).collect()
