"""Headline-suite scaling probe at an arbitrary sf_dir (SCALE §43/§45).

bench.py warms up and times the FULL registry — right for the
committed per-round artifact at sf0.1, too heavy as a scaling
instrument at generated sf1/sf10 lakes (the ~170 non-headline entries
include deliberately-wide contract checks). This probe runs ONLY the
21 headline queries: one untimed pre-pass (JIT tiering + artifact
build-if-missing, so band/IVF/token-stats artifacts are warm exactly
like the committed bench), then best-of-N wall per query, plus
bench.py's machine-speed calibration so cross-sf ratios can be read
against host drift.

Usage: python tools/headline_scaling_probe.py SF_DIR [runs] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, run_noop  # noqa: E402
from aws_imdb_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    spark = get_spark(
        "scaling-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in HEADLINE:  # untimed: JIT + artifact builds
        run_noop(REGISTRY[name].fn(spark, sf_dir))

    calib = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2)").write.format(
            "noop"
        ).mode("overwrite").save()
        calib = min(calib, time.perf_counter() - t0)

    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            run_noop(REGISTRY[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    result = {
        "sf_dir": sf_dir,
        "calib_sec": round(calib, 3),
        "headline_total_sec": round(sum(times.values()), 3),
        "queries": times,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
