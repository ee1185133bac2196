"""Messy historical-date parsing.

Replicates the reference's corpus-specific date repair chains exactly
(they are correctness-relevant parity surface, SURVEY §7 "What's hard"):

- EEBO free-text dates dispatched on LENGTH — ``1697`` (4), ``-1697``
  (5, last four chars), ``1690-1697`` (9, first four chars),
  ``April 24, 1649`` (>9, ``LLLL d, yyyy``); anything else NULL
  (``assets/publication_date.py:160-166``);
- ECCO integer dates: valid when ``!= 0``, ``!= 10000101`` and
  ``<= 18390000``; the date is ``SUBSTRING(CAST(x AS INT),1,4)`` of the
  *unpadded* integer string plus ``-01-01`` — i.e. every ECCO date is
  truncated to January 1 of its year, and a short int like ``1758``
  still yields year 1758 (``assets/publication_date.py:176-183``);
- newspaper ISO dates with ``-00`` month/day placeholders
  (``assets/upstream_metadata.py:25-38``).

All pure Catalyst CASE chains.  The reference ran on Spark 3 with ANSI
off, where ``to_date`` returns NULL on malformed input; Spark 4 defaults
to ANSI where ``to_date`` *throws*, so every parse here goes through
``try_to_date`` — these parsers exist precisely to tolerate messy
historical strings, and one bad row must not kill the pipeline.
Sessions from ``session.get_spark`` set
``datetimeRebaseModeInWrite=CORRECTED`` so pre-Gregorian results survive
a parquet round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_eebo_date(col: Column | str) -> Column:
    """EEBO free-text date → DateType, dispatched on string length like
    the reference (publication_date.py:160-166); unknown shapes → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    ln = F.length(c)
    return (
        F.when(ln == 4, F.try_to_date(c, "yyyy"))
        .when(ln == 5, F.try_to_date(F.substring(c, -4, 4), "yyyy"))
        .when(ln == 9, F.try_to_date(F.substring(c, 1, 4), "yyyy"))
        .when(ln > 9, F.try_to_date(c, "LLLL d, yyyy"))
    )


ECCO_DATE_MIN_SENTINEL = 10000101
ECCO_DATE_MAX = 18390000


def ecco_date_valid(col: Column | str) -> Column:
    """The reference's ECCO validity predicate: non-null, not the 0 /
    10000101 sentinels, and not past 18390000."""
    c = F.col(col) if isinstance(col, str) else col
    i = c.cast("long")
    return (
        i.isNotNull()
        & (i != 0)
        & (i != ECCO_DATE_MIN_SENTINEL)
        & (i <= ECCO_DATE_MAX)
    )


def parse_ecco_date(col: Column | str) -> Column:
    """ECCO yyyymmdd integer (often float-typed upstream) → DateType,
    truncated to January 1 of the year taken from the first four
    characters of the *unpadded* integer string, exactly like the
    reference (``SUBSTRING(CAST(x AS INT),1,4) || '-01-01'``): 17580101
    and 1758 both yield 1758-01-01.  Sentinels / out-of-range → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    i = c.cast("long")
    year = F.substring(i.cast("string"), 1, 4)
    return F.when(
        ecco_date_valid(c),
        F.try_to_date(F.concat(year, F.lit("-01-01")), "yyyy-MM-dd"),
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
        F.try_to_date(F.concat_ws("-", year, month, day), "yyyy-MM-dd"),
    )
