"""Derived-column functions (F10-F14).

- decade math ``(year/10)::int * 10`` (glue.py:132,241)
- decade label ``TO_CHAR(DECADE) || 's'`` (movie_facts_anl.sql:26)
- run-year span ``endYear - startYear`` (docs/top_10_longest_running_tv_show.sql:5)
- ``LPAD(season, 2, '0')`` labels (series_season_summary_anl.sql:13)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def decade(year_col: Column | str) -> Column:
    """Integer decade: 1994 → 1990 (glue.py:132)."""
    return (_c(year_col).cast("int") / 10).cast("int") * 10


def decade_label(decade_col: Column | str) -> Column:
    """1990 → '1990s' (movie_facts_anl.sql:26)."""
    return F.concat(_c(decade_col).cast("string"), F.lit("s"))


def year_span(start_col: Column | str, end_col: Column | str) -> Column:
    """endYear - startYear, int-cast both sides
    (docs/top_10_longest_running_tv_show.sql:5)."""
    return _c(end_col).cast("int") - _c(start_col).cast("int")


def zero_pad(col: Column | str, width: int = 2) -> Column:
    """LPAD zero-padding for sortable labels
    (series_season_summary_anl.sql:13)."""
    return F.lpad(_c(col).cast("string"), width, "0")
