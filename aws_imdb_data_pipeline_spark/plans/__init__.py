"""Query registry: every implemented operator from SURVEY.md §2 is bound
here to (a) a Spark DataFrame implementation and (b) an ANSI-SQL oracle
string DuckDB can run on the same parquet tables.

Importing this package populates the registry.
"""

from aws_imdb_data_pipeline_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    register,
    queries,
    oracles,
)

# Populate the registry.
from aws_imdb_data_pipeline_spark.plans import relational  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import relational2  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import relational3  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import relational4  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import relational5  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import quality  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import streaming_batch  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import measures  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import behavioral  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import corpus  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions2  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions3  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions4  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions5  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions6  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import checks  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import lexbench  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions7  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import partsupp  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import cdc  # noqa: E402,F401

# Registration order doubles as the external snapshot order: tools that
# sample a bounded prefix of ``queries()`` see the entries below first.
# The prefix is COMPUTED from the in-repo CORRECTNESS_r*.json history so
# it can never go stale (a hand-maintained list did, twice): oracled
# queries with no green verification row come first, then oracled
# queries oldest-verified-first (rotation: nothing goes unverified for
# rounds on end), then no-oracle queries — so any bounded prefix holds
# the oracled entries most in need of external verification.


def _green_history() -> dict[str, int]:
    """Map query name -> latest round with a green verification row.

    Reads CORRECTNESS_r*.json from the repo root (two levels above this
    package). Missing/unparseable files are skipped: with no history at
    all, every oracled query counts as never-verified, which degrades to
    plain oracled-first ordering.
    """
    import json
    import re
    from pathlib import Path

    last_green: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # hash-green: the strict bar for oracled queries — a
            # rows-only row (hash_match None) does not count, so a
            # query whose oracle was added AFTER old rows-only rounds
            # still front-loads for its first real value check
            if (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            ):
                last_green[name] = max(rnd, last_green.get(name, 0))
    return last_green


def _reorder() -> None:
    last_green = _green_history()
    reg_pos = {n: i for i, n in enumerate(REGISTRY)}
    # Sort key: non-oracled last; among oracled, never-green (round 0)
    # first, then ascending last-green round; registration order ties.
    def key(item):
        n, s = item
        if s.oracle is None:
            return (1, 0, reg_pos[n])
        return (0, last_green.get(n, 0), reg_pos[n])

    ordered = dict(sorted(REGISTRY.items(), key=key))
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "register", "queries", "oracles"]
