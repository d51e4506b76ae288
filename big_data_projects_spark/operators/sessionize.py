"""Gap-based sessionization.

Assigns a per-user session ordinal: a new session starts when the gap
to the previous event exceeds ``gap_seconds``. Classic lag + running-sum
window composition — one shuffle on the user key, per-user partitions,
no global ordering (scales to any number of users; a single pathological
user's history must fit one partition, as with any sessionizer).

The streaming twin (event-time session windows with watermarks) lives in
big_data_projects_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Append ``session_col``: 1-based per-user session ordinal."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # Microsecond arithmetic (Spark timestamp native precision) so gap
    # comparisons match interval semantics exactly at the boundary.
    prev_us = F.unix_micros(F.lag(ts_col).over(w))
    gap_us = F.unix_micros(F.col(ts_col)) - prev_us
    new_session = F.when(
        prev_us.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, F.sum(new_session).over(running).cast("long"))
