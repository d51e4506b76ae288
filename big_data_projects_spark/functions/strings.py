"""String functions (SURVEY.md §2.8 F3)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def full_name(first: Column | str, last: Column | str, sep: str = " ") -> Column:
    """``first || ' ' || last`` (transform-data.py:162) as concat_ws."""
    return F.concat_ws(sep, first, last)
