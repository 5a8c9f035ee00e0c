"""solarflare_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference ETL pipeline
(``SiddhuShkya/SolarFlare-ETL-Pipeline``, surveyed in ``SURVEY.md``),
widened to a full relational / streaming / LLM-data-pipeline operator
surface per the build mandate.

Design rules (SURVEY.md §4.3):
  * DataFrame/SQL API only — declare logical plans, let Catalyst pick
    physical strategies (no RDDs, no hand-scheduling).
  * Broadcast small dimensions; shuffle-partition counts sized by config.
  * Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
    Pandas UDFs only where built-ins cannot express the semantics.
  * Never ``collect()`` inside an operator.
"""

from solarflare_etl_pipeline_spark.session import get_spark
from solarflare_etl_pipeline_spark.registry import REGISTRY, QuerySpec, register

__all__ = ["get_spark", "REGISTRY", "QuerySpec", "register"]

__version__ = "0.1.0"
