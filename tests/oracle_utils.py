"""Local stand-in for the driver's DuckDB differential oracle.

Runs a registered Spark query and its oracle SQL on the same parquet,
normalizes both results (columns sorted by name, rows sorted), and
compares row-count + column names + exact values. Stricter than a
value-hash: if this passes, the driver's hash comparison passes.
"""

from __future__ import annotations

import math

import duckdb

from big_data_projects_spark.data import TABLES
from big_data_projects_spark.queries import REGISTRY


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(float(v)))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    return ("s", str(v))


def _canon(df_pandas, cols):
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df_pandas.iterrows()
    ]
    rows.sort()
    return rows


def compare_query(spark, name: str, sf_dir: str = "/root/testdata/sf0.01"):
    """Raise AssertionError with a diff summary on mismatch."""
    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} has no oracle (rows-only)"
    sdf = q.spark(spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    odf = con.sql(q.oracle).df()
    con.close()

    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    assert scols == ocols, f"{name}: column mismatch spark={scols} oracle={ocols}"
    assert len(sdf) == len(odf), f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}"

    srows, orows = _canon(sdf, scols), _canon(odf, scols)
    if srows != orows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
    return len(sdf)
