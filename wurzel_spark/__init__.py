"""wurzel_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of telekom/wurzel (RAG/ETL pipelines), re-built
Spark-first for 100 TB scale.

Design (see SURVEY.md §7):
  - One abstraction: a *stage* is a function ``DataFrame -> DataFrame``
    (sources: ``SparkSession -> DataFrame``). The DAG is the Catalyst plan.
  - Contracts are ``StructType`` schemas + constraint specs validated at
    stage boundaries (wurzel's TypedStep contract system, re-expressed).
  - Determinism everywhere: stable orderings, content hashes, decimal
    aggregation where cross-engine bit-exactness matters.
"""

from wurzel_spark.session import get_spark
from wurzel_spark.tables import load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "__version__"]
