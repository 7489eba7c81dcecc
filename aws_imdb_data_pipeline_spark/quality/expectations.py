"""Expectation assertions with ``mostly`` tolerances (Q3-Q7).

Spark-native port of the reference's Great Expectations gate
(tests/ge_validate_athena.py:36-47,62-76) and dbt schema tests
(imdb_analytics/models/schema.yml:3-17): each expectation is one
DataFrame action computing violation counts; ``validate`` raises if
any expectation fails — the pipeline-abort semantics of Q7.

Design note: each expectation counts violations with a single
conditional aggregate over one scan (no .collect() loops); a batch of
expectations on the same DataFrame can share a cached input.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ExpectationResult:
    name: str
    success: bool
    total: int
    violations: int
    mostly: float

    @property
    def observed_ratio(self) -> float:
        return 1.0 - (self.violations / self.total) if self.total else 1.0


def _check(df: DataFrame, name: str, violation_pred: Column, mostly: float) -> ExpectationResult:
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(violation_pred, 1).otherwise(0)).alias("bad"),
    ).first()
    total, bad = int(row["total"]), int(row["bad"] or 0)
    ok = (total == 0) or (1.0 - bad / total) >= mostly
    return ExpectationResult(name=name, success=ok, total=total, violations=bad, mostly=mostly)


def expect_not_null(df: DataFrame, col: str, mostly: float = 1.0) -> ExpectationResult:
    """Q4 / dbt not_null (ge_validate_athena.py:36,64)."""
    return _check(df, f"not_null[{col}]", F.col(col).isNull(), mostly)


def expect_values_between(
    df: DataFrame,
    col: str,
    lo: float | None = None,
    hi: float | None = None,
    mostly: float = 1.0,
) -> ExpectationResult:
    """Q3 range expectation with ``mostly`` tolerance
    (ge_validate_athena.py:36-45: rating in [0,10] mostly>=0.995)."""
    c = F.col(col)
    ok = F.lit(True)
    if lo is not None:
        ok = ok & (c >= lo)
    if hi is not None:
        ok = ok & (c <= hi)
    # NULLs don't violate a range expectation (GE semantics).
    violation = c.isNotNull() & ~ok
    return _check(df, f"between[{col},{lo},{hi}]", violation, mostly)


def expect_unique(df: DataFrame, cols: list[str], mostly: float = 1.0) -> ExpectationResult:
    """Unique-key test (README.md:124 claims it; schema.yml omits it —
    we implement it as the intended behavior). Violations counted as
    rows beyond the first per key, via one groupBy."""
    dup = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    row = dup.agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") - 1).alias("bad"),
    ).first()
    total, bad = int(row["total"] or 0), int(row["bad"] or 0)
    ok = (total == 0) or (1.0 - bad / total) >= mostly
    return ExpectationResult(
        name=f"unique[{','.join(cols)}]", success=ok, total=total, violations=bad, mostly=mostly
    )


def expect_min_rows(df: DataFrame, min_expected: int) -> ExpectationResult:
    """Q5 partition rowcount smoke check (batch.py:63-89) — with the
    reference's undefined-variable bug (batch.py:68) fixed by taking
    the threshold as a real parameter."""
    n = df.count()
    return ExpectationResult(
        name=f"min_rows[{min_expected}]",
        success=n >= min_expected,
        total=n,
        violations=0 if n >= min_expected else 1,
        mostly=1.0,
    )


def validate(results: list[ExpectationResult]) -> None:
    """Q7 gate: raise on any failed expectation
    (ge_validate_athena.py:73-76)."""
    failed = [r for r in results if not r.success]
    if failed:
        detail = "; ".join(
            f"{r.name}: {r.violations}/{r.total} violations (mostly={r.mostly})"
            for r in failed
        )
        raise AssertionError(f"expectation gate failed: {detail}")
