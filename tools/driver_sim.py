#!/usr/bin/env python
"""Vanilla-session driver simulation: replicate the verification
driver's CORRECTNESS sweep (first-N registry entries, DuckDB oracle,
sorted-column value compare) on a NON-get_spark session pinned to a
non-UTC timezone — the probe the verify skill prescribes.

Usage: python tools/driver_sim.py [N | name,name,...] [--tz ZONE]
  N          sweep the first N registry entries (default 50 — the
             driver's window size)
  name,...   sweep exactly these queries instead
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tz = "America/New_York"
    for a in sys.argv[1:]:
        if a.startswith("--tz="):
            tz = a.split("=", 1)[1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", tz)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    df = e.entry(spark)
    print("ENTRY rows:", df.count(), flush=True)

    qs, os_ = e.queries(), e.oracle_sql()
    if args and not args[0].isdigit():
        names = args[0].split(",")
    else:
        n = int(args[0]) if args else 50
        names = list(qs)[:n]

    import duckdb

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    def norm(v):
        return repr(float(v)) if isinstance(v, float) else str(v)

    n_match = n_rows_only = n_fail = 0
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, sf).toPandas()
            if name not in os_:
                print(f"{name} {len(sdf)} rows (rows-only, no oracle)",
                      flush=True)
                n_rows_only += 1
                continue
            odf = con.sql(os_[name]).df()
            cols = sorted(sdf.columns)
            s = sorted(
                tuple(norm(r[c]) for c in cols) for _, r in sdf.iterrows()
            )
            o = sorted(
                tuple(norm(r[c]) for c in cols) for _, r in odf.iterrows()
            )
            ok = s == o
            print(
                f"{name} {len(s)} {len(o)} "
                f"{'MATCH' if ok else 'MISMATCH'}",
                flush=True,
            )
            if ok:
                n_match += 1
            else:
                n_fail += 1
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"{name} ERROR {str(exc)[:200]}", flush=True)
            n_fail += 1
    print(
        f"SUMMARY {n_match} match / {n_rows_only} rows-only / "
        f"{n_fail} fail of {len(names)} in {time.time() - t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
