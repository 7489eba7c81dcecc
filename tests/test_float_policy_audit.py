"""Float-policy audit pinned green at HEAD (r13 verdict #4): every
ROUND-over-quotient / ROUND-over-transcendental oracle site carries a
curated, justified stance, and the detector provably catches the
historical divergence class (the stable_avg 7/32 quotient tie) plus
the live violation its first run found (fuzzy_name_groups' rounded
AVG of 2-decimal money, fixed to the stable_avg form this round)."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "float_policy_audit",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "float_policy_audit.py",
    ),
)
fpa = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fpa)


def test_audit_green_at_head():
    report = fpa.run_audit()
    assert report["problems"] == []
    assert report["stale"] == []
    # the audit is not vacuous: the sanctioned families are present
    assert "quotient" in report["sites"]["embedding_near_dup"]
    assert "transcendental" in report["sites"]["bm25_self_retrieval"]


def test_detector_catches_historical_quotient_class():
    """Retroactive claim: the pre-stable_avg oracle forms would have
    been flagged before any sweep found them empirically."""
    # the round-5 avg divergence (7/32 = 0.21875 decimal tie)
    old_avg = "SELECT ROUND(AVG(l_quantity), 4) AS avg_qty FROM lineitem"
    args = fpa._round_args(old_avg)
    assert any(fpa._AVG_RE.search(a) for a in args)
    # the explicit-quotient spelling of the same mistake
    old_quot = "SELECT ROUND(SUM(x) / COUNT(x), 4) FROM t"
    assert any(fpa._top_level_division(a) for a in fpa._round_args(old_quot))
    # the r14 live finding: fuzzy_name_groups' rounded money AVG
    old_fuzzy = "SELECT ROUND(AVG(p.p_retailprice), 2) FROM part p"
    assert any(fpa._AVG_RE.search(a) for a in fpa._round_args(old_fuzzy))


def test_detector_passes_policy_correct_forms():
    """The sanctioned spellings must NOT be flagged as quotients:
    round-the-sum-then-divide (stable_avg) and division inside an
    aggregate's argument."""
    ok = "SELECT ROUND(SUM(x), 4) / COUNT(x) FROM t"
    assert not any(fpa._top_level_division(a) for a in fpa._round_args(ok))
    inner = "SELECT ROUND(SUM(a / b), 4) FROM t"
    assert not any(
        fpa._top_level_division(a) for a in fpa._round_args(inner)
    )
