"""Physical file-layout operators: Z-order (Morton) clustering.

A parquet scan prunes row groups by min/max stats, but a layout sorted
on ONE column leaves every OTHER filter column's per-file range as wide
as the table — a filter on the second dimension reads everything.
Interleaving the bits of the cluster columns (Morton code) and sorting
by that key bounds EVERY clustered column's spread per file, so scans
filtered on any subset of the cluster columns skip most files. This is
what Delta's OPTIMIZE ZORDER BY and Iceberg's sort orders do; here it
is expressed with nothing but built-in bit arithmetic, so the sort key
stays inside whole-stage codegen.

The write path is repartitionByRange(z) + sortWithinPartitions(z):
range partitioning gives globally disjoint z-ranges per file (the
pruning property), and the local sort costs no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of ``bits`` low bits of each column.

    Columns must be non-negative integers ALREADY SCALED to use the
    full ``bits`` budget — interleaving raw columns whose ranges differ
    (say 11 bits vs 7) puts only the wide column in the high z bits and
    the layout degenerates to a single-column sort (zordered() below
    does the scaling). At ``bits=16`` two columns fill 32 bits of the
    long — up to 4 columns fit 64. Bit i of column j lands at position
    ``i*len(cols)+j``. Pure shift/and/or expressions — codegen-
    friendly, no UDF.
    """
    ncols = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            cc = (F.col(c) if isinstance(c, str) else c).cast("long")
            bit = F.shiftright(cc, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def zordered(
    df: DataFrame,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """``df`` rewritten in Z-order on ``cols``: each column is min/max
    scaled onto [0, 2^bits) so every dimension owns an equal share of
    the interleaved key's high bits, then range-partitioned and locally
    sorted by the Morton code.

    The per-column stats come from a single 1-row aggregate joined back
    by broadcast — no driver collect, and the stats scan is a cheap
    column-pruned pass (at 100 TB: read two columns' row-group stats,
    not the table). Ready to ``.write.parquet(...)`` — files carry
    disjoint z-ranges, so min/max pruning works on every cluster
    column.
    """
    span = (1 << bits) - 1
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__mx_{c}") for c in cols],
    )
    scaled_cols = [
        (
            (F.col(c).cast("long") - F.col(f"__mn_{c}"))
            * span
            / F.greatest(F.col(f"__mx_{c}") - F.col(f"__mn_{c}"), F.lit(1))
        ).cast("long")
        for c in cols
    ]
    return (
        df.join(F.broadcast(stats))
        .withColumn("__z", zorder_key(scaled_cols, bits))
        .drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
