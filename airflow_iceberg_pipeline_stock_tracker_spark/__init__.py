"""PySpark-native analytics engine with the query and data-processing
capabilities of jbuto454/airflow-iceberg-pipeline-stock-tracker.

The reference (``/root/reference/dags/dag.py``) is an Airflow DAG that pushes
SQL text to a Databricks warehouse over Iceberg tables. This package
re-expresses every one of those query semantics natively in PySpark
(DataFrame/SQL on Catalyst), with no Airflow and no remote warehouse, and
extends the surface with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) and a
Structured Streaming re-expression of the daily batch.

Layout:
  session     SparkSession factory tuned for local[N] and cluster parity
  schemas     static StructType contracts (reference DDL equivalents)
  sources/    table loaders (driver parquet) + the stock-API-shaped source
  operators/  pure DataFrame -> DataFrame operators (dq, cumulate, dedup, ...)
  functions/  portable scalar helpers (hashing, n-grams, text stats)
  plans/      table lifecycle (DDL/overwrite) + the daily pipeline driver
  streaming/  Structured Streaming re-expression + event-time windows
"""

__version__ = "0.1.0"

# Convenience surface for a user switching from the reference: one import
# gives the session factory and the daily-pipeline entry points. Heavier
# registries (plans.queries / plans.llm_queries / plans.streaming_queries)
# stay behind explicit imports so `import airflow_iceberg_pipeline_stock_tracker_spark` never builds a plan.
from .session import get_spark  # noqa: E402
from .pipeline import backfill, run_for_date  # noqa: E402

__all__ = ["get_spark", "run_for_date", "backfill", "__version__"]
