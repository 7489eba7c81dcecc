"""Deterministic sampled-exact strata for per-host-bounded kernels.

Round-13's pressure run (SCALE §57: sf10 under 4 GB executors) proved
the engine's serve paths survive the constrained substrate but the
deliberately-quadratic TRUTH legs of the verification contracts do
not — dedup_minhash_check's exact-Jaccard leg alone needed >75 GB of
spill on one host. The §50 stance ("quadratic oracles are verify
kernels bounded to the largest tractable sf per host") was prose;
this module makes it code: every quadratic kernel verifies a
DETERMINISTIC, engine-independent stratum of the corpus whose working
set is bounded by construction, and the stratum law is mirrored
exactly in the DuckDB oracles so driver parity holds on any lake.

Two laws, matching the two cost shapes:

- ``linear_modulus`` — pairwise kernels (shingle self-join, brute
  all-pairs cosine): cost ~ (stratum size)^2, so the stratum SIZE is
  held at the cap and the modulus grows linearly with the corpus.
  ``S = ceil(n / cap)``; stratum = rows with ``id % S == 0``.
- ``quadratic_modulus`` — batch-times-corpus kernels (exact BM25 /
  hybrid retrieval over a self-retrieval query set): per-query cost
  grows with the corpus (document frequencies scale with N), so
  holding the WORK product fixed requires the batch to shrink as the
  corpus grows. ``S = ceil(n^2 / cap^2)``; query batch = ids with
  ``id % (20 * S) == 0``, giving batch x corpus ≈ cap x (cap/20)
  regardless of N. This is also the honest 100 TB serving shape: a
  query batch proportional to the corpus is an eval artifact — real
  serve batches are bounded, per-query cost is what scales.

Caps are the sf1 sizes (50k documents / 20k vectors), the largest
scale the full kernels ran GREEN under the pressure substrate
(SCALE §49) — so on every shipped lake, the driver's sf0.01 gate, and
the generated sf1 sweep, S == 1 and behavior is bit-identical to the
unsampled form. Only above sf~1.4 does the stratum engage.

Both engines compute S with exact integer arithmetic (no float
division), so the stratum membership is identical cross-engine.

This mirrors the reference's own bounded-validation stance: its GE
suites validate Athena tables through ``LIMIT 5000`` slices with
partition filters (tests/ge_validate_athena.py:25,54) — verify the
CONTRACT on a bounded, deterministic subset; never let the
verification kernel's cost scale with the corpus. The difference
here is that the subset is hash-free modulus strata mirrored in both
engines, so the driver's full-value hash gate still applies to it.
"""

from __future__ import annotations

TRUTH_DOC_CAP = 50_000  # sf1 document count — pressure-run-green ceiling
TRUTH_VEC_CAP = 20_000  # sf1 embedding count — same ceiling


def linear_modulus(n: int, cap: int) -> int:
    """ceil(n / cap), >= 1: holds the stratum SIZE at ~cap rows."""
    return max(1, (n + cap - 1) // cap)


def quadratic_modulus(n: int, cap: int) -> int:
    """ceil(n^2 / cap^2), >= 1: holds batch x corpus work constant."""
    return max(1, (n * n + cap * cap - 1) // (cap * cap))


def linear_modulus_sql(table: str, cap: int) -> str:
    """DuckDB expression mirroring ``linear_modulus`` bit-for-bit."""
    return (
        f"GREATEST(1, ((SELECT COUNT(*) FROM {table}) + {cap - 1}) "
        f"// {cap})"
    )


def quadratic_modulus_sql(table: str, cap: int) -> str:
    """DuckDB expression mirroring ``quadratic_modulus`` bit-for-bit
    (the BIGINT cast keeps the n*n product out of INT32 territory no
    matter how the count expression is typed)."""
    c2 = cap * cap
    return (
        f"GREATEST(1, (CAST((SELECT COUNT(*) FROM {table}) AS BIGINT) * "
        f"CAST((SELECT COUNT(*) FROM {table}) AS BIGINT) + {c2 - 1}) "
        f"// {c2})"
    )
