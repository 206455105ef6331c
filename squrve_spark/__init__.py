"""squrve_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Satissss/Squrve reference framework.

Architecture (SURVEY.md §7): everything that touches table data is a Spark
DataFrame / Spark SQL operation planned by Catalyst; driver-side Python holds
only config, orchestration and (mockable) LLM actor logic. The reference is a
Text-to-SQL framework whose four capability layers map to:

  * SQL execution surface  -> ``spark.sql`` over registered parquet tables
                              (``squrve_spark.execution``)
  * schema/data management -> Spark catalog + sidecar PK/FK metadata
                              (``squrve_spark.catalog``, ``squrve_spark.schema_io``)
  * actor dataflow         -> driver-side task/actor kernel with threads +
                              FAIR scheduler pools (``squrve_spark.tasks``,
                              ``squrve_spark.actors``)
  * evaluation             -> result-set equivalence comparator + metrics
                              (``squrve_spark.compare``, ``squrve_spark.evaluate``)

Beyond reference parity, ``squrve_spark.operators`` adds large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and ``squrve_spark.streaming`` adds Structured Streaming
over event logs.
"""

__version__ = "0.1.0"

from squrve_spark.session import get_spark  # noqa: F401
from squrve_spark.catalog import register_tables, load_table  # noqa: F401
