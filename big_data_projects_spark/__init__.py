"""big_data_projects_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of the reference repo Jenil245/Big-Data-Projects
(a Sparkify-style song-analytics ETL; see /root/reference and SURVEY.md),
extended with the operators a large-scale LLM training-data pipeline
needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, text analysis, multimodal column
plumbing, sessionization, as-of joins, and Structured Streaming windows.

Design rules (SURVEY.md §4, §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join planning.
- No Python row UDFs in hot paths; Arrow-batched pandas UDFs only when
  built-ins can't express the semantics.
- No driver-side collect() in data paths; no global single-partition
  windows at scale.
- Broadcast small dims explicitly; AQE + skew-join on.
"""

__version__ = "0.1.0"

from big_data_projects_spark.session import get_spark  # noqa: F401
from big_data_projects_spark.data import load_table, TABLES  # noqa: F401
