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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join; ``how`` is 'inner' (drop unmatched left rows) or
    'left'. ``direction`` is 'backward' (most recent right at-or-before
    the left time — the default), 'forward' (earliest right
    at-or-after — the same window trick traversed in reverse time
    order), or 'nearest' (whichever of the two candidates is closer in
    time; exact ties take the backward match, pandas merge_asof
    semantics). ``tolerance_seconds`` bounds the match distance, pandas
    merge_asof-style: matches farther than the tolerance are nulled
    (and dropped under how='inner'). All options keep the one-shuffle
    union-of-tagged-streams plan — 'nearest' adds a second sort of the
    same shuffled partitioning (exchange reused), not a second
    shuffle."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
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

    # Backward walks time ascending (right rows first at equal times →
    # at-or-before); forward walks descending (→ at-or-after).
    def _carry(order, prefix):
        w = (
            Window.partitionBy("__key")
            .orderBy(order, F.col("__tag"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return [
            F.last("__rt", ignorenulls=True).over(w).alias(f"{prefix}{right_time}")
        ] + [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload
        ]

    unioned = r_tagged.unionByName(l_tagged)
    if direction != "nearest":
        t_order = (
            F.col("__t") if direction == "backward" else F.col("__t").desc()
        )
        carried = unioned.select("*", *_carry(t_order, "asof_"))
    else:
        # Both candidates over the SAME key-partitioned shuffle (two
        # sorts, one exchange), then pick the closer; ties → backward.
        carried = unioned.select(
            "*",
            *_carry(F.col("__t"), "__b_asof_"),
            *_carry(F.col("__t").desc(), "__f_asof_"),
        )
        brt, frt = F.col(f"__b_asof_{right_time}"), F.col(f"__f_asof_{right_time}")
        choose_b = brt.isNotNull() & (
            frt.isNull()
            | (
                F.unix_micros(F.col("__t")) - F.unix_micros(brt)
                <= F.unix_micros(frt) - F.unix_micros(F.col("__t"))
            )
        )
        carried = carried.select(
            "*",
            *[
                F.when(choose_b, F.col(f"__b_asof_{c}"))
                .otherwise(F.col(f"__f_asof_{c}"))
                .alias(f"asof_{c}")
                for c in [right_time, *payload]
            ],
        )
    out = carried.filter(F.col("__tag") == 1).select(
        F.col("__lrow.*"),
        f"asof_{right_time}",
        *[f"asof_{c}" for c in payload],
    )
    if tolerance_seconds is not None:
        ok = (
            F.abs(
                F.unix_micros(F.col(left_time))
                - F.unix_micros(F.col(f"asof_{right_time}"))
            )
            <= int(tolerance_seconds * 1_000_000)
        )
        out = out.select(
            *[c for c in out.columns if not c.startswith("asof_")],
            *[
                F.when(ok, F.col(c)).alias(c)
                for c in out.columns
                if c.startswith("asof_")
            ],
        )
    if how == "inner":
        out = out.filter(F.col(f"asof_{right_time}").isNotNull())
    return out
