"""Local mirror of the driver's correctness gate: run every registered
query on Spark and its oracle on DuckDB, compare row count, schema
(column names), and values (column-name-sorted, row-sorted, exact for
non-floats / 1e-9-tolerant for floats so genuine drift fails loudly).

Usage: python tools/parity.py [sf_dir] [query ...]
           [--oracle-timeout SECONDS]

--oracle-timeout bounds each DUCKDB oracle (not the Spark side): a
few ground-truth oracles are deliberately quadratic verification
kernels (all-pairs cosine, shared-shingle self-joins) that are
tractable at the shipped sf0.001-0.1 but explode at generated sf1+
(tools/sfgen.py) — 22k vectors make the pairwise-cosine oracle a
~15-billion-row join in DuckDB while the ENGINE side stays banded
and fast. On timeout the oracle is interrupted (con.interrupt from a
watchdog thread), the query is reported as oracle-timeout with the
engine row count, and the sweep continues; those queries keep their
full-value verification at the largest sf where the oracle is
tractable (SCALE.md §43).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_imdb_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.tables import TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        # compare dtype *kind* (int/float/object/datetime/bool): width
        # differences (int32 vs int64) matter, so flag exact dtype too
        if str(s[c].dtype) != str(d[c].dtype):
            problems.append(f"dtype col {c}: spark={s[c].dtype} duck={d[c].dtype}")
    if problems:
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            a = sv.astype(float).to_numpy()
            b = dv.astype(float).to_numpy()
            ok = np.isclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                problems.append(f"float col {c}: row {i} spark={a[i]} duck={b[i]}")
        else:
            eq = (sv.astype(object).where(pd.notna(sv), None)
                  == dv.astype(object).where(pd.notna(dv), None)) | (
                pd.isna(sv) & pd.isna(dv)
            )
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: row {i} spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
                )
    return problems


def run_oracle_with_timeout(
    con: duckdb.DuckDBPyConnection, sql: str, timeout: float | None
) -> pd.DataFrame | None:
    """Run the oracle; None = interrupted at `timeout` seconds."""
    if not timeout:
        return con.execute(sql).df()
    import threading

    done = threading.Event()

    def watchdog() -> None:
        if not done.wait(timeout):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        return con.execute(sql).df()
    except duckdb.InterruptException:
        return None
    finally:
        done.set()


def main() -> int:
    argv = list(sys.argv[1:])
    timeout = None
    if "--oracle-timeout" in argv:
        i = argv.index("--oracle-timeout")
        timeout = float(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("parity")
    con = duck_connection(sf_dir)
    failures = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        sdf = spec.fn(spark, sf_dir)
        spark_pdf = sdf.toPandas()
        if spec.oracle is None:
            print(f"  ~ {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        duck_pdf = run_oracle_with_timeout(con, spec.oracle, timeout)
        if duck_pdf is None:
            print(
                f"  ⏱ {name}: oracle exceeded {timeout:g}s at this sf "
                f"(engine returned {len(spark_pdf)} rows; full-value "
                f"verification stands at the largest tractable sf)"
            )
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"  ✗ {name}: " + "; ".join(problems))
        else:
            print(f"  ✓ {name}: {len(spark_pdf)} rows match")
    print(f"done: {failures} failing")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
