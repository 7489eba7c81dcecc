"""Automated money-grain magnitude audit (r12 verdict #3).

SCALE §47/§53's empirical law: every ``ROUND(SUM(double))`` at a group
grain whose per-group mass can reach ~1e10 WILL eventually diverge
cross-engine by one ulp (the rounded decimal stops being representable
and the summation-order wobble exceeds the rounding slack). Four
consecutive decade sweeps each caught one more such site
(§42 sf1, §47 sf10 x2 classes, §53 sf100 x2 queries) — this tool makes
the "remaining double-sum sites are bounded" claim a CHECKED invariant
instead of prose.

It walks every registered oracle for ``ROUND(SUM(`` over raw double
expressions (the cents/decimal forms match ``SUM(CAST(ROUND(...`` /
``SUM(CAST(... AS DECIMAL`` and are exempt by construction), requires
a curated mass probe for each site, executes the probes on a lake with
DuckDB, and reports the per-group mass extrapolated to the target sf:

- ``fixed`` grains (nation/region/segment/year/priority/global —
  group count independent of sf): mass scales LINEARLY with sf.
- ``scaling`` grains (custkey/orderkey/partkey/doc — group count
  proportional to sf): per-group mass is sf-invariant.
- ``frame`` grains (bounded window frames): mass bounded by
  frame_size x max(value), sf-invariant.

Summand exactness splits the threshold: FRACTIONAL summands (money,
4dp products) drift once the rounded decimal stops being
representable — threshold 1e10 (empirical, §47/§53). INTEGER-VALUED
doubles (l_quantity, counts) sum EXACTLY in ieee754 below 2^53
regardless of order — threshold 9e15; mark those ``integer=True``.

tests/test_money_grain_audit.py pins the audit green at HEAD: no
unaudited site, and no site whose sf100-extrapolated mass crosses the
1e10 drift threshold. Retroactive check (the test's docstring): at r11
HEAD this audit would have flagged nation_trade_volume (nation-pair
grain, ~4.8e10 at sf100) and banded_brand_revenue (grand total,
~1.6e11) — exactly the two divergences the r12 sf100 sweep then found
empirically.

Usage: python tools/money_grain_audit.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIFT_THRESHOLD = 1.0e10          # fractional summands
INT_EXACT_THRESHOLD = 9.0e15      # integer-valued doubles: 2^53
TARGET_SF = 100.0

# ROUND(SUM( over a raw double expression; the exact forms are
# SUM(CAST(ROUND(x*scale)) (cents) and SUM(CAST(x AS DECIMAL...))
# (decimal accumulator) — neither matches this pattern.
_SITE_RE = re.compile(r"ROUND\(\s*SUM\((?!\s*CAST\()", re.I)

# Per-query mass probes: ANSI SQL DuckDB runs on the lake views,
# returning ONE number — the maximum per-group Σ|summand| the query's
# ROUND(SUM()) site(s) can see (no-cancellation bound, same convention
# as money_sum_cents' sentinel). `kind` says how that mass scales.
# query -> (kind, probe_sql) or (kind, probe_sql, "integer")
MASS_PROBES: dict[str, tuple] = {
    # ---- money sums ----
    "orders_moving_avg": (
        "frame",  # 3-row moving frame
        "SELECT 3 * MAX(ABS(o_totalprice)) FROM orders",
    ),
    "series_best_season_measure": (
        "scaling",  # (custkey, year)
        "SELECT MAX(s) FROM (SELECT SUM(ABS(o_totalprice)) AS s "
        "FROM orders GROUP BY o_custkey, year(o_orderdate))",
    ),
    "series_finale_delta_measure": (
        "scaling",  # per custkey
        "SELECT MAX(s) FROM (SELECT SUM(ABS(o_totalprice)) AS s "
        "FROM orders GROUP BY o_custkey)",
    ),
    "sql_ordinal_groupby": (
        "fixed",  # (segment, nationkey) — ~125 groups
        "SELECT MAX(s) FROM (SELECT SUM(ABS(c_acctbal)) AS s "
        "FROM customer GROUP BY c_mktsegment, c_nationkey)",
    ),
    "shipping_priority": (
        "scaling",  # per orderkey
        "SELECT MAX(s) FROM (SELECT SUM(l_extendedprice) AS s "
        "FROM lineitem GROUP BY l_orderkey)",
    ),
    "top_return_customers": (
        "scaling",  # per custkey
        "SELECT MAX(s) FROM (SELECT SUM(l_extendedprice) AS s "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_returnflag = 'R' GROUP BY o_custkey)",
    ),
    "top_parts_by_brand_revenue": (
        "scaling",  # (brand, partkey, name) — partkey scales
        "SELECT MAX(s) FROM (SELECT SUM(l_extendedprice) AS s "
        "FROM lineitem GROUP BY l_partkey)",
    ),
    # ---- bounded (non-money) sums ----
    "pricing_summary": (
        # (returnflag, linestatus) ~4 groups. sum_qty is integer-valued
        # (exact); avg_disc's ROUND(SUM(l_discount)) is fractional but
        # its mass is discount<=0.1 per row — probe the LARGER exact
        # one with the integer exemption and the discount mass rides
        # the same probe /250 (documented sub-threshold by 4 orders).
        "fixed",
        "SELECT MAX(s) FROM (SELECT SUM(l_quantity) AS s "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus)",
        "integer",
    ),
    "small_quantity_revenue": (
        "fixed",  # global; l_quantity is integer-valued -> exact sum
        "SELECT SUM(l_quantity) FROM lineitem",
        "integer",
    ),
    "large_volume_customers": (
        "scaling",  # per orderkey
        "SELECT MAX(s) FROM (SELECT SUM(l_quantity) AS s "
        "FROM lineitem GROUP BY l_orderkey)",
        "integer",
    ),
    "profile_union": (
        "fixed",  # global; integer-valued quantities -> exact sum
        "SELECT SUM(l_quantity) FROM lineitem",
        "integer",
    ),
    "events_user_sessions": (
        "scaling",  # per (user, session)
        "SELECT MAX(s) FROM (SELECT SUM(ABS(value)) AS s "
        "FROM events GROUP BY user_id)",
    ),
    "events_hourly_counts": (
        "fixed",  # per hour — event VALUE is N(0,1)-ish, mass = n x O(1)
        "SELECT MAX(s) FROM (SELECT SUM(ABS(value)) AS s "
        "FROM events GROUP BY date_trunc('hour', ts))",
    ),
    "events_sliding_stats": (
        "fixed",  # sliding hour windows — 2x the hourly mass bound
        "SELECT 2 * MAX(s) FROM (SELECT SUM(ABS(value)) AS s "
        "FROM events GROUP BY date_trunc('hour', ts))",
    ),
    "events_clustered_range": (
        "fixed",  # per value-range bucket
        "SELECT SUM(ABS(value)) FROM events",
    ),
    "events_range_window": (
        "frame",  # bounded range frame per user
        "SELECT MAX(s) FROM (SELECT SUM(ABS(value)) AS s "
        "FROM events GROUP BY user_id)",
    ),
    "events_drift_psi": (
        "fixed",  # PSI cells: Σ (p-q)ln(p/q) over ~decile cells, O(1)
        "SELECT 10.0",
    ),
    "ivm_event_type_stats": (
        "fixed",  # per event_type value sum
        "SELECT MAX(s) FROM (SELECT SUM(ABS(value)) AS s "
        "FROM events GROUP BY event_type)",
    ),
    "important_stock": (
        "scaling",  # per partkey over synth partsupp
        "SELECT MAX(s) FROM (SELECT SUM(l_extendedprice) AS s "
        "FROM lineitem GROUP BY l_partkey)",
    ),
    "important_stock_bucketed": (
        "scaling",
        "SELECT MAX(s) FROM (SELECT SUM(l_extendedprice) AS s "
        "FROM lineitem GROUP BY l_partkey)",
    ),
    "doc_lm_scores": (
        "scaling",  # per doc: Σ tf·|ln p| bounded by doc length x ~15
        "SELECT 15.0 * MAX(LENGTH(text)) FROM documents",
    ),
    "lm_quality_buckets": (
        "scaling",
        "SELECT 15.0 * MAX(LENGTH(text)) FROM documents",
    ),
    "bm25_self_retrieval": (
        "scaling",  # per (query, doc) pair: Σ_t idf·tfnorm <= |q| x ~15
        "SELECT 15.0 * 64 FROM (SELECT 1)",
    ),
    "bm25_hard_negatives": (
        "scaling",
        "SELECT 15.0 * 64 FROM (SELECT 1)",
    ),
    "rrf_hybrid_retrieval": (
        "scaling",
        "SELECT 15.0 * 64 FROM (SELECT 1)",
    ),
    "corpus_dsir_weights": (
        "scaling",  # per doc: Σ tf·|log-ratio| <= doc length x O(10)
        "SELECT 15.0 * MAX(LENGTH(text)) FROM documents",
    ),
    "corpus_dsir_weights_artifact": (
        "scaling",
        "SELECT 15.0 * MAX(LENGTH(text)) FROM documents",
    ),
    "fuzzy_name_groups": (
        # canonical-entity grain: the part-name domain is 64 discrete
        # "adj noun" strings, so group count is FIXED while per-group
        # mass scales with sf. A canonical group merges names at edit
        # distance <= 1 — bounded by 8x the largest single-name mass
        # (the adjective/noun pools admit few 1-edit neighbors).
        # (Site added r14: fuzzy_name_groups moved to the stable_avg
        # form, whose ROUND(SUM(money)) numerator this audits.)
        "fixed",
        "SELECT 8 * MAX(s) FROM (SELECT SUM(ABS(p_retailprice)) AS s "
        "FROM part GROUP BY p_name)",
    ),
}


def audited_sites() -> dict[str, int]:
    """query -> number of raw double ROUND(SUM( sites in its oracle."""
    from aws_imdb_data_pipeline_spark.plans import REGISTRY

    out: dict[str, int] = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        n = len(_SITE_RE.findall(spec.oracle))
        if n:
            out[name] = n
    return out


def run_audit(sf_dir: str) -> dict:
    import duckdb

    from aws_imdb_data_pipeline_spark.sources.tables import TABLES

    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    if not m:
        raise SystemExit(
            f"cannot infer scale factor from lake dir {sf_dir!r}: the "
            "fixed-grain extrapolation needs sf; name the dir sf<N> "
            "(e.g. sf0.1, sf100) or symlink it under such a name"
        )
    sf_here = float(m.group(1))
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t + '.parquet')}'"
        )
    sites = audited_sites()
    rows = []
    problems = []
    for name in sorted(sites):
        if name not in MASS_PROBES:
            problems.append(f"UNAUDITED double ROUND(SUM( site: {name}")
            continue
        kind, probe, *rest = MASS_PROBES[name]
        integer = "integer" in rest
        mass = float(con.execute(probe).fetchone()[0] or 0.0)
        at_target = mass * (TARGET_SF / sf_here) if kind == "fixed" else mass
        limit = INT_EXACT_THRESHOLD if integer else DRIFT_THRESHOLD
        ok = at_target < limit
        if not ok:
            problems.append(
                f"{name}: {kind} grain mass {mass:.3g} at sf{sf_here:g} -> "
                f"{at_target:.3g} at sf{TARGET_SF:g} >= {limit:g}"
            )
        rows.append({
            "query": name, "kind": kind, "integer": integer, "mass": mass,
            "mass_at_target": at_target, "ok": ok,
        })
    stale = sorted(set(MASS_PROBES) - set(sites))
    return {
        "sf_dir": sf_dir, "target_sf": TARGET_SF,
        "threshold": DRIFT_THRESHOLD, "sites": rows,
        "stale_probes": stale, "problems": problems,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    report = run_audit(sf_dir)
    for r in report["sites"]:
        flag = "ok " if r["ok"] else "FLAG"
        print(f"{flag} {r['query']:34s} {r['kind']:8s} "
              f"mass={r['mass']:.3g} at_sf{TARGET_SF:g}="
              f"{r['mass_at_target']:.3g}")
    for p in report["problems"]:
        print("PROBLEM:", p)
    if report["stale_probes"]:
        print("stale probes (query gone or no longer double-sum):",
              report["stale_probes"])
    print(json.dumps({"flags": len(report["problems"])}))


if __name__ == "__main__":
    main()
