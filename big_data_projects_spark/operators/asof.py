"""As-of join: for each left row, the most recent right row at-or-before
the left row's time, per key.

Spark has no native ASOF JOIN (DuckDB does; the oracle uses it). The
scalable composition here is the classic union-of-tagged-streams trick:

    union(left tagged 1, right tagged 0)
      → window PARTITION BY key ORDER BY (time, tag)
      → last_value(right_cols, ignore nulls) over unbounded-preceding
      → keep left rows

One shuffle on the key, no per-group pandas, no broadcast requirement —
survives arbitrarily large sides as long as single keys fit a partition
(salt keys upstream if one key dominates). Right rows sort before left
rows at equal timestamps, giving at-or-before (>=) semantics.

Tie caveat: if the right side has several rows at the same (key, time),
which row's *other* columns win is arbitrary; the right_time column
itself is deterministic (it's the max time <= left time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join; ``how`` is 'inner' (drop unmatched left rows) or 'left'."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    right_cols = right_cols or []
    payload = [c for c in right_cols if c != right_time]

    l_tagged = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(left.schema[left_time].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        F.struct(*left.columns).alias("__lrow"),
    )
    r_tagged = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.lit(None)
        .cast(l_tagged.schema["__lrow"].dataType)
        .alias("__lrow"),
    )

    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_tagged.unionByName(l_tagged).select(
        "*",
        F.last("__rt", ignorenulls=True).over(w).alias(f"asof_{right_time}"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    out = carried.filter(F.col("__tag") == 1).select(
        F.col("__lrow.*"),
        f"asof_{right_time}",
        *[f"asof_{c}" for c in payload],
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{right_time}").isNotNull())
    return out
