"""Interval overlap join — an operator Spark has no native form of.

Joins two relations of time intervals on the predicate
``l_start <= r_end AND r_start <= l_end`` (closed-interval overlap).
Planned naively that predicate is a BroadcastNestedLoopJoin (fine only
when one side is small) or, worse, a cartesian product.

Scale shape (the 100 TB path): **bucket blocking**. Each interval is
exploded to the fixed-width time blocks it covers, the join becomes an
equi-join on the block id (hash-partitioned, AQE-sized, no nested
loop), and the overlap predicate runs only within a block. Two
intervals can share many blocks, so each pair would surface once per
shared block — instead of a dedup shuffle, a pair is kept only in the
FIRST block both intervals occupy (``block == max(l_start_block,
r_start_block)``), which emits every overlapping pair exactly once by
construction. Block width trades explode factor against block
population: pick it near the typical interval length so most intervals
explode to 1-2 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block_of(ts: Column, width_seconds: int) -> Column:
    # Positive epochs are far below 2^53, so the double floor is exact.
    return F.floor(F.unix_timestamp(ts) / F.lit(width_seconds)).cast("long")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    block_seconds: int,
) -> DataFrame:
    """All (left row, right row) pairs whose closed intervals overlap.

    Columns from both inputs are preserved; callers select/alias before
    the join if names collide. Emits each overlapping pair exactly once
    (first-shared-block rule — no distinct pass).

    Rows with malformed intervals (end < start, or a null endpoint)
    match nothing: they are filtered before the explode. Without the
    guard a descending F.sequence would silently hash the row into
    WRONG blocks rather than failing.
    """
    left = left.filter(F.col(l_start) <= F.col(l_end))
    right = right.filter(F.col(r_start) <= F.col(r_end))
    lb = left.withColumn(
        "__blk",
        F.explode(
            F.sequence(
                _block_of(F.col(l_start), block_seconds),
                _block_of(F.col(l_end), block_seconds),
            )
        ),
    )
    rb = right.withColumn(
        "__blk",
        F.explode(
            F.sequence(
                _block_of(F.col(r_start), block_seconds),
                _block_of(F.col(r_end), block_seconds),
            )
        ),
    )
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    first_shared = F.col("__blk") == F.greatest(
        _block_of(F.col(l_start), block_seconds),
        _block_of(F.col(r_start), block_seconds),
    )
    return (
        lb.join(rb.withColumnRenamed("__blk", "__blk_r"),
                F.col("__blk") == F.col("__blk_r"))
        .filter(overlap & first_shared)
        .drop("__blk", "__blk_r")
    )
