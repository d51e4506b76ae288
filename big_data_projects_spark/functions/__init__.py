"""Scalar-function layer (SURVEY.md §2.8).

The reference's only scalar custom logic was a row-at-a-time Python UDF
converting ms-epoch strings to timestamps (transform-data.py:126-129) —
an optimizer barrier with local-timezone semantics. Everything here is
built-in pyspark.sql.functions (JVM-side, codegen'd, UTC-pinned).
"""

from big_data_projects_spark.functions.timestamps import (  # noqa: F401
    ts_from_epoch_ms,
    epoch_ms,
    with_calendar_cols,
    CALENDAR_COLS,
)
from big_data_projects_spark.functions.strings import full_name  # noqa: F401
