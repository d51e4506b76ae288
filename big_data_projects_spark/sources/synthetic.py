"""Custom connector via the Spark 4 Python DataSource API.

The reference reads only mounted files (transform-data.py:52-56); real
deployments also pull from systems with no built-in Spark connector.
This module shows the engine's connector surface: a pure-Python
``DataSource`` that Spark schedules like any other scan — the driver
asks for ``partitions()``, each executor runs ``read(partition)`` for
its split, and everything downstream (pruning, AQE, joins) composes
normally.

The payload is a deterministic synthetic event stream: every field of
row ``i`` derives from ``md5(str(i))``, so the connector's output is
REPRODUCIBLE IN SQL — the DuckDB oracle regenerates the identical
relation from ``generate_series`` + ``md5`` and the driver's
value-hash comparison verifies the connector end-to-end (a stronger
check than the rows-only smoke a connector normally gets).

Scale design: ``n_partitions`` splits the id range into equal slices —
generation is embarrassingly parallel, no partition depends on another,
and a 1000-executor cluster gets 1000 independent splits. The Python
generator is the slow path by construction (this is a connector demo,
not a compute path); a production connector for a real system would
fetch from that system here instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("click", "view", "purchase", "refund")

SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, "
    "ts_micros bigint, amount double"
)


def synth_row(i: int) -> tuple:
    """Row ``i`` of the synthetic stream — pure function of ``i`` via
    md5 hex digits (the engine-portable hash; DuckDB twin:
    ``md5(CAST(i AS VARCHAR))`` + the same substring/int slices)."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    user_id = int(h[:7], 16) % 1000
    event_type = EVENT_TYPES[int(h[13:15], 16) % 4]
    ts_micros = 1_700_000_000_000_000 + i * 1_000_000
    amount = (int(h[7:13], 16) % 100_000) / 100.0
    return (i, user_id, event_type, ts_micros, amount)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_partitions))  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        # Arrow-batched transfer: yielding pyarrow.RecordBatch moves
        # the partition in one vectorized exchange instead of
        # row-at-a-time pickling — the same rule as UDFs (Arrow batch
        # granularity or don't cross the Python boundary). Generation
        # itself is identical to synth_row.
        import pyarrow as pa

        rows = [synth_row(i) for i in range(partition.start, partition.end)]
        if not rows:
            return
        cols = list(zip(*rows))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], type=pa.int64()),
                pa.array(cols[1], type=pa.int64()),
                pa.array(cols[2], type=pa.string()),
                pa.array(cols[3], type=pa.int64()),
                pa.array(cols[4], type=pa.float64()),
            ],
            names=["event_id", "user_id", "event_type", "ts_micros", "amount"],
        )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch face of the same relation: offsets are plain row
    indices, each batch emits up to ``batch_rows`` rows, and the stream
    goes quiet once ``n_rows`` have been served — a bounded backfill,
    the same contract the parquet-backed streaming queries use. Offsets
    are exactly-once restartable: batch [start, end) is a pure function
    of the offset pair, so checkpoint replay regenerates identical
    rows."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.batch_rows = int(options.get("batch_rows", 2_000))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        lo = int(start["row"])
        hi = min(lo + self.batch_rows, self.n_rows)
        return iter([synth_row(i) for i in range(lo, hi)]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(int(start["row"]), int(end["row"]))])


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("bdp_synth").option("n_rows", N).load()``
    (batch) or ``spark.readStream.format("bdp_synth")...`` (micro-batch
    stream over the same deterministic relation)."""

    @classmethod
    def name(cls) -> str:
        return "bdp_synth"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the connector on a session (the driver
    hands us sessions we didn't build)."""
    spark.dataSource.register(SyntheticEventsDataSource)


def oracle_sql(n_rows: int) -> str:
    """DuckDB twin of the generated relation itself."""
    return f"""
    SELECT i AS event_id,
           CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 7)) AS BIGINT)
             % 1000 AS user_id,
           ['click', 'view', 'purchase', 'refund']
             [(CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 14, 2)) AS BIGINT)
               % 4) + 1] AS event_type,
           1700000000000000 + i * 1000000 AS ts_micros,
           (CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 8, 6)) AS BIGINT)
             % 100000) / 100.0 AS amount
    FROM (SELECT unnest(generate_series(0, {n_rows - 1})) AS i)
    """
