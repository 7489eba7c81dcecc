"""Dump the formatted physical plan for registered queries.

Usage: python tools/explain.py [sf_dir] query [query ...]
       python tools/explain.py --all          # every registered query

The plan is what the scale review audits: PushedFilters / ReadSchema
on every scan, BroadcastHashJoin for dimension attachment,
WindowGroupLimit / TakeOrderedAndProject for top-k, exchange count per
fact stream.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_imdb_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = list(REGISTRY) if args == ["--all"] else args
    unknown = [n for n in names if n not in REGISTRY]
    if unknown or not names:
        sys.exit(f"unknown queries {unknown}; choose from {sorted(REGISTRY)}")
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        REGISTRY[name].fn(spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
