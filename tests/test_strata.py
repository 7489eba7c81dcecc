"""The sampled-exact stratum laws (plans/strata.py, r13 verdict #1).

Three things must hold for the strata to be sound:

1. S == 1 everywhere the full kernels are known green — every shipped
   lake, the driver's sf0.01 gate, and the generated sf1 sweep — so
   behavior there is bit-identical to the historical unsampled form
   (the parity suite itself enforces the value side of this).
2. Above the caps the stratum bounds the working set: linear law
   holds stratum SIZE ~cap (pairwise kernels cost (size)^2); the
   quadratic law holds batch x corpus work constant (exact retrieval
   cost per query grows with the corpus).
3. The DuckDB SQL mirrors the Python integer arithmetic bit-for-bit
   for any corpus size — otherwise the two engines would verify
   DIFFERENT strata and the driver hash would flip on big lakes.
"""

from __future__ import annotations

import duckdb
import pytest

from aws_imdb_data_pipeline_spark.plans.strata import (
    TRUTH_DOC_CAP,
    TRUTH_VEC_CAP,
    linear_modulus,
    linear_modulus_sql,
    quadratic_modulus,
    quadratic_modulus_sql,
)


def test_linear_law():
    # identity regime: everything at or under the cap
    assert linear_modulus(1, TRUTH_DOC_CAP) == 1
    assert linear_modulus(TRUTH_DOC_CAP, TRUTH_DOC_CAP) == 1
    # engagement: one row over the cap doubles nothing — it just
    # starts skipping; stratum size stays within [cap/2, cap]
    assert linear_modulus(TRUTH_DOC_CAP + 1, TRUTH_DOC_CAP) == 2
    for n in (75_000, 500_000, 5_000_000, 10**9):
        s = linear_modulus(n, TRUTH_DOC_CAP)
        assert (n + s - 1) // s <= TRUTH_DOC_CAP  # stratum size bounded
        assert n // s > TRUTH_DOC_CAP // 2  # and not over-thinned


def test_quadratic_law():
    assert quadratic_modulus(TRUTH_DOC_CAP, TRUTH_DOC_CAP) == 1
    assert quadratic_modulus(5_000, TRUTH_DOC_CAP) == 1  # sf0.1
    # sf10 lake: 500k docs -> S = 100 -> 250-query batch at mod 2000;
    # batch x corpus = 250 x 500k == 2500 x 50k (the sf1-green work)
    assert quadratic_modulus(500_000, TRUTH_DOC_CAP) == 100
    for n in (75_000, 500_000, 5_000_000):
        s = quadratic_modulus(n, TRUTH_DOC_CAP)
        batch = n // (20 * s)
        work = batch * n
        sf1_work = (TRUTH_DOC_CAP // 20) * TRUTH_DOC_CAP
        assert work <= sf1_work  # never more work than the green run
        assert 4 * work >= sf1_work  # and within 4x of the budget


@pytest.mark.parametrize(
    "n",
    [1, 7, 49_999, 50_000, 50_001, 70_710, 70_711, 123_457,
     500_000, 4_999_999, 5_000_000, 10**9, 10**9 + 1],
)
def test_sql_mirrors_python(n):
    """The oracle-side modulus must equal the Python one for ANY
    count — substitute a literal for the COUNT(*) subquery so the
    equivalence is checked far past materializable table sizes."""
    con = duckdb.connect()
    for cap, lin, quad in (
        (TRUTH_DOC_CAP, linear_modulus, quadratic_modulus),
        (TRUTH_VEC_CAP, linear_modulus, quadratic_modulus),
    ):
        lin_sql = linear_modulus_sql("t", cap).replace(
            "(SELECT COUNT(*) FROM t)", f"CAST({n} AS BIGINT)"
        )
        quad_sql = quadratic_modulus_sql("t", cap).replace(
            "(SELECT COUNT(*) FROM t)", f"CAST({n} AS BIGINT)"
        )
        assert con.execute(f"SELECT {lin_sql}").fetchone()[0] == lin(n, cap)
        assert con.execute(f"SELECT {quad_sql}").fetchone()[0] == quad(n, cap)


def test_sql_count_form_on_real_table():
    """Same equivalence through the actual COUNT(*) path on a
    materialized table, across the cap boundary."""
    con = duckdb.connect()
    for n in (100, TRUTH_VEC_CAP, TRUTH_VEC_CAP + 1, 3 * TRUTH_VEC_CAP):
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM range({n})")
        got = con.execute(
            f"SELECT {linear_modulus_sql('t', TRUTH_VEC_CAP)}"
        ).fetchone()[0]
        assert got == linear_modulus(n, TRUTH_VEC_CAP)
