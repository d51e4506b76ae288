"""Custom sink via the Spark 4 Python DataSource writer API.

Completes the connector surface (synthetic.py is the read/stream side):
a JSON-lines directory sink with the two-phase commit protocol every
production sink needs — each task writes its split to a hidden
temporary file and reports it in a commit message; only the driver-side
``commit()`` publishes the files (atomic rename), and ``abort()``
removes the temporaries, so a failed/speculated task can never leave a
half-written part visible. That is the same contract as Spark's own
FileCommitProtocol, expressed through the Python API.

Scale notes: one part file per task (partition) — the writer
parallelizes with the upstream partitioning; rename-as-publish assumes
a filesystem with atomic rename (local/HDFS; object stores want a
manifest commit instead, same protocol shape, different publish step).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


class _PartFile(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.final_path = final_path
        self.n_rows = n_rows


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.columns = schema.fieldNames()
        self.overwrite = overwrite

    def write(self, rows: Iterator[Row]) -> _PartFile:
        os.makedirs(self.path, exist_ok=True)
        part = uuid.uuid4().hex
        tmp = os.path.join(self.path, f".tmp-{part}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in rows:
                d = row.asDict(recursive=True)
                f.write(json.dumps({c: d[c] for c in self.columns}) + "\n")
                n += 1
        return _PartFile(tmp, os.path.join(self.path, f"part-{part}.jsonl"), n)

    def commit(self, messages) -> None:
        # Publish step: atomic renames, only after EVERY task succeeded.
        for m in messages:
            os.replace(m.tmp_path, m.final_path)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonlDirDataSource(DataSource):
    """``df.write.format("bdp_jsonl").option("path", dir).save()``"""

    @classmethod
    def name(cls) -> str:
        return "bdp_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
