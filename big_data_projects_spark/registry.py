"""Query registry plumbing.

Every implemented operator gets a named entry: a Spark builder
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. The driver runs both at
sf0.01 and compares row-count + schema + order-insensitive value hash —
so builders alias every computed column identically on both sides, and
aggregates over doubles use order-independent decimal accumulation
(see operators.relational.dsum).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → driver records a rows-only check


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Query(fn, oracle)
        return fn

    return deco
