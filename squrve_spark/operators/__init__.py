"""Large-scale training-data pipeline operators.

Beyond reference parity (the reference is a Text-to-SQL framework; SURVEY
§7.8 lists these as the scale extensions): deduplication, similarity search,
text analysis, multimodal column plumbing. All hot paths are built-in column
expressions or Arrow-batched pandas UDFs — no row-at-a-time Python.
"""

from squrve_spark.operators import dedup, multimodal, similarity, text  # noqa: F401
