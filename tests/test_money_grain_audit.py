"""The money-grain magnitude audit as a checked invariant (r12 verdict
#3): every ``ROUND(SUM(`` over a raw double in any registered oracle
must carry a mass probe, and no probe's grain mass may cross the drift
threshold at the sf100 target.

Retroactive evidence the audit works: at r11 HEAD it would have
flagged ``nation_trade_volume`` (nation-pair grain, ~4.8e10 at sf100)
and ``banded_brand_revenue`` (grand total, ~1.6e11) — exactly the two
divergences the r12 sf100 sweep then found empirically. Run fresh at
r13 it flagged SEVEN more fixed-grain sites below the r12 swept set
(promo_revenue_share ~3e13 down to customers_per_region ~1.45e10), all
since moved to exact cents forms — which also removes them from the
audit's match set by construction (the site regex exempts
``SUM(CAST(ROUND(`` and decimal accumulators).
"""

from __future__ import annotations

import os

import pytest

from tools.money_grain_audit import (
    MASS_PROBES,
    audited_sites,
    run_audit,
)


def test_every_double_sum_site_has_a_probe():
    """A new ROUND(SUM(double)) oracle cannot land without declaring
    its grain kind and mass probe — red at commit time, not at the
    decade sweep that would otherwise find it years of rounds later."""
    sites = audited_sites()
    unaudited = sorted(set(sites) - set(MASS_PROBES))
    assert unaudited == [], (
        f"double ROUND(SUM( sites without a mass probe: {unaudited} — "
        "add them to MASS_PROBES in tools/money_grain_audit.py (or move "
        "the query to the exact cents/decimal form)"
    )


def test_no_stale_probes():
    sites = audited_sites()
    stale = sorted(set(MASS_PROBES) - set(sites))
    assert stale == [], f"probes for non-double-sum queries: {stale}"


def test_audit_green_at_head(sf_dir):
    """No audited site's extrapolated sf100 mass crosses its drift
    threshold (1e10 fractional / 9e15 integer-valued)."""
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} missing")
    report = run_audit(sf_dir)
    assert report["problems"] == []
    assert len(report["sites"]) == len(audited_sites())
