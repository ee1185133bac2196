"""Messy historical-date parsing.

Replicates the reference's corpus-specific date repair chains exactly
(they are correctness-relevant parity surface, SURVEY §7 "What's hard"):

- EEBO free-text dates in four shapes — ``1697``, ``-1697``,
  ``1690-1697``, ``April 24, 1649`` (``assets/publication_date.py:30-40``,
  ``:160-166``; note the stand-alone month name needs the ``LLLL``
  pattern);
- ECCO integer dates ``17580101`` with sentinels ``0`` / ``10000101``
  and a ``> 18390000`` guard (``:50-56``, ``:176-183``);
- newspaper ISO dates with ``-00`` month/day placeholders
  (``assets/upstream_metadata.py:25-38``).

All pure Catalyst CASE/`to_date` chains. Sessions from
``session.get_spark`` set ``datetimeRebaseModeInWrite=CORRECTED`` so
pre-Gregorian results survive a parquet round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_eebo_date(col: Column | str) -> Column:
    """Four-shape EEBO date → DateType (earliest plausible date)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    year_only = c.rlike(r"^\d{4}$")
    neg_year = c.rlike(r"^-\d{4}$")
    year_range = c.rlike(r"^\d{4}-\d{4}$")
    return (
        F.when(year_only, F.to_date(c, "yyyy"))
        .when(neg_year, F.to_date(F.substring(c, 2, 4), "yyyy"))
        .when(year_range, F.to_date(F.substring(c, 1, 4), "yyyy"))
        .otherwise(F.to_date(c, "LLLL d, yyyy"))
    )


ECCO_DATE_MIN_SENTINEL = 10000101
ECCO_DATE_MAX = 18390000


def parse_ecco_date(col: Column | str) -> Column:
    """ECCO yyyymmdd integer (often float-typed upstream) → DateType.
    Sentinels 0 / 10000101 and anything past 18390000 → NULL; a 00 month
    or day falls back to January / the 1st."""
    c = F.col(col) if isinstance(col, str) else col
    i = c.cast("long")
    valid = (
        i.isNotNull()
        & (i != 0)
        & (i != ECCO_DATE_MIN_SENTINEL)
        & (i <= ECCO_DATE_MAX)
    )
    s = F.lpad(i.cast("string"), 8, "0")
    year = F.substring(s, 1, 4)
    month = F.when(F.substring(s, 5, 2) == "00", "01").otherwise(F.substring(s, 5, 2))
    day = F.when(F.substring(s, 7, 2) == "00", "01").otherwise(F.substring(s, 7, 2))
    return F.when(
        valid, F.to_date(F.concat_ws("-", year, month, day), "yyyy-MM-dd")
    )


def parse_iso_date_with_placeholders(col: Column | str) -> Column:
    """``1732-00-00`` → 1732-01-01; full ISO dates parse as-is
    (newspaper metadata repair, upstream_metadata.py:25-38)."""
    c = F.col(col) if isinstance(col, str) else col
    year = F.substring(c, 1, 4)
    month = F.when(F.substring(c, 6, 2) == "00", "01").otherwise(F.substring(c, 6, 2))
    day = F.when(F.substring(c, 9, 2) == "00", "01").otherwise(F.substring(c, 9, 2))
    return F.when(
        c.rlike(r"^\d{4}-\d{2}-\d{2}$"),
        F.to_date(F.concat_ws("-", year, month, day), "yyyy-MM-dd"),
    )
