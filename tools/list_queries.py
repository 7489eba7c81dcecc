"""Print the query inventory: name, SURVEY §2 operator ids, oracle
status. Usage: python tools/list_queries.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_imdb_data_pipeline_spark.plans import REGISTRY


def main() -> None:
    oracled = sum(1 for s in REGISTRY.values() if s.oracle)
    print(f"{len(REGISTRY)} queries ({oracled} oracle-paired)\n")
    width = max(len(n) for n in REGISTRY)
    for name, spec in REGISTRY.items():
        mark = "oracle" if spec.oracle else "rows-only"
        ops = ",".join(spec.operators)
        print(f"  {name:<{width}}  [{mark:9}]  {ops}")


if __name__ == "__main__":
    main()
