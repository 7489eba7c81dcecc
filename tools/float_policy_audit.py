"""Automated quotient/transcendental ROUND audit (r13 verdict #4).

The money-grain audit (tools/money_grain_audit.py, §56) made the
"bounded double sums" claim a checked invariant. This tool does the
same for the OTHER divergence family the round history shows: ROUND
applied to a value whose binary double can sit ON a decimal rounding
boundary, where Spark (rounds the shortest decimal repr, HALF_UP) and
DuckDB (rounds the binary value) legitimately disagree.

Two classes, from the documented float policy (stable_avg's docstring,
plans/relational.py):

- ``quotient``: ROUND over a division or AVG. When the operands are
  low-decimal exact values the quotient lands on decimal ties with
  POSITIVE probability (the historical case: avg quantity 7/32 =
  0.21875 — Spark HALF_UP says 0.2188, DuckDB binary rounding says
  0.2187; fixed by the stable_avg rule "round the SUM, never the
  quotient"). Retroactive check: the pre-stable_avg oracle form
  ``ROUND(AVG(l_quantity), 4)`` / ``ROUND(SUM(x)/COUNT(x), 4)`` is
  exactly what this audit's quotient detector flags — it would have
  caught that divergence before the sweep did.
- ``transcendental``: ROUND over an expression containing ln/log/exp/
  sqrt/pow. libm results differ in the last ulp across engines, so
  equality of the ROUNDED value relies on the true value not sitting
  within ~1 ulp of a decimal boundary — a measure-zero event per
  site, but a policy decision that must be DOCUMENTED per site (the
  bm25 round-before-rank stance), not accidental.

Every detected site must appear in SANCTIONED with its justification;
a site missing from the table (or explicitly marked "forbidden")
fails the audit. tests/test_float_policy_audit.py pins it green at
HEAD, so a new oracle that rounds a quotient without a documented
stance turns the suite red instead of waiting for a decade sweep to
find the divergence empirically.

Usage: python tools/float_policy_audit.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TRANSCENDENTAL_RE = re.compile(r"\b(ln|log|log2|log10|exp|sqrt|pow|power)\s*\(", re.I)
_ROUND_RE = re.compile(r"\bROUND\s*\(", re.I)
_AVG_RE = re.compile(r"\bAVG\s*\(", re.I)


def _round_args(sql: str) -> list[str]:
    """The full first-argument text of every ROUND( call in ``sql``
    (balanced-paren scan; the precision argument is excluded)."""
    out = []
    for m in _ROUND_RE.finditer(sql):
        depth = 1
        start = m.end()
        arg_end = None
        for i in range(start, len(sql)):
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    arg_end = i
                    break
            elif c == "," and depth == 1 and arg_end is None:
                arg_end = i
                break
        out.append(sql[start:arg_end] if arg_end else sql[start:])
    return out


def _top_level_division(arg: str) -> bool:
    """True when the ROUND argument divides at paren depth 0 — i.e.
    the ROUNDED value itself is a quotient (a division nested inside
    SUM/dot-product args is the summand, not the rounded value)."""
    depth = 0
    for c in arg:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "/" and depth == 0:
            return True
    return False


def classify_sites() -> dict[str, set[str]]:
    """query -> set of detected classes in its oracle."""
    from aws_imdb_data_pipeline_spark.plans import REGISTRY

    found: dict[str, set[str]] = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        classes: set[str] = set()
        for arg in _round_args(spec.oracle):
            if _top_level_division(arg) or _AVG_RE.search(arg):
                classes.add("quotient")
            if _TRANSCENDENTAL_RE.search(arg):
                classes.add("transcendental")
        if classes:
            found[name] = classes
    return found


# Curated stances. Value = {class: justification} — or the string
# "forbidden" to hard-fail a site that must never ship.
#
# The two recurring justifications, with the tie-odds math that
# separates them from the forbidden stable_avg class:
_COSINE = (
    "rounded cosine dot/(na*nb): both engines fold the SAME float32-"
    "origin operands in index order, so the quotient double is bit-"
    "identical cross-engine; a 4dp decimal tie requires the generic "
    "double to sit within 1 ulp of x.xxxx5 — measure-zero, unlike "
    "low-decimal-operand quotients (7/32 class). Green r05-r14 at "
    "every sf; ordering always carries an id tiebreak."
)
_ROUND_SUM_LN = (
    "round-before-rank policy (bm25_self_retrieval docstring): ROUND "
    "is applied to the SUM of libm terms, never to a quotient of "
    "exact decimals; a flip needs the true score within ~1e-12 of a "
    "4dp boundary. Ordering uses the rounded value + id tiebreak so "
    "rank is engine-portable by construction."
)
_RRF = (
    "rrf = sum of 1/(60+rank) reciprocals, rank integer <= 10: each "
    "term is either exactly representable at 6dp (1/64) or has a "
    "non-terminating expansion; no pair sum lands on a 6dp half-"
    "boundary (enumerable domain, checked), and ordering carries the "
    "doc_id tiebreak."
)
SANCTIONED: dict[str, dict[str, str]] = {
    "ann_cosine_topk": {"quotient": _COSINE},
    "embedding_near_dup": {"quotient": _COSINE},
    "embedding_near_dup_scale": {"quotient": _COSINE},
    "embedding_lsh_neardup_check": {"quotient": _COSINE},
    "knn_label_consistency": {"quotient": _COSINE},
    "bm25_self_retrieval": {"transcendental": _ROUND_SUM_LN},
    "bm25_hard_negatives": {"transcendental": _ROUND_SUM_LN},
    "rrf_hybrid_retrieval": {
        "quotient": _COSINE + " / " + _RRF,
        "transcendental": _ROUND_SUM_LN,
    },
    "doc_lm_scores": {"transcendental": _ROUND_SUM_LN},
    "lm_quality_buckets": {"transcendental": _ROUND_SUM_LN},
    "doc_top_terms": {
        "transcendental": (
            "per-term tfidf = tf * (ln(ratio)+1) rounded at 4dp: a "
            "generic libm double, measure-zero tie odds; ranking uses "
            "the rounded value + word tiebreak (round-before-rank)."
        )
    },
    "events_drift_psi": {
        "transcendental": (
            "ROUND(SUM((p-q)*ln(p/q)), 6) — round-the-sum over ~10 "
            "decile cells of O(1) mass; same measure-zero stance, "
            "value green r08-r14 incl. the streaming twin parity."
        )
    },
    "corpus_dsir_weights": {"transcendental": _ROUND_SUM_LN},
    "corpus_dsir_weights_artifact": {"transcendental": _ROUND_SUM_LN},
}


def run_audit() -> dict:
    found = classify_sites()
    problems: list[str] = []
    for name in sorted(found):
        for cls in sorted(found[name]):
            stance = SANCTIONED.get(name, {})
            if stance == "forbidden" or stance.get(cls) == "forbidden":
                problems.append(f"{name}: {cls} ROUND site marked forbidden")
            elif cls not in stance:
                problems.append(
                    f"{name}: UNDOCUMENTED {cls} ROUND site — add a "
                    f"justified SANCTIONED entry or fix the oracle "
                    f"(stable_avg rule: round the SUM, never the quotient)"
                )
    stale = sorted(
        q for q in SANCTIONED
        if q not in found
        or not set(SANCTIONED[q]) <= found.get(q, set())
    )
    return {"sites": {k: sorted(v) for k, v in found.items()},
            "problems": problems, "stale": stale}


def main() -> None:
    report = run_audit()
    for q, classes in sorted(report["sites"].items()):
        mark = "ok " if not any(q in p.split(":")[0] for p in report["problems"]) else "FLAG"
        print(f"{mark} {q:36s} {','.join(classes)}")
    for p in report["problems"]:
        print("PROBLEM:", p)
    if report["stale"]:
        print("stale stances (site gone):", report["stale"])
    print(json.dumps({"flags": len(report["problems"]),
                      "stale": len(report["stale"])}))


if __name__ == "__main__":
    main()
