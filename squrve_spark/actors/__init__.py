"""Actor kernel + families (SURVEY §2.B.4/§2.B.5)."""

from squrve_spark.actors.base import Actor, ActorPool, MergeStrategy, merge_value  # noqa: F401
from squrve_spark.actors.nest import ActorGroup, PipelineActor, TreeActor  # noqa: F401
from squrve_spark.actors import families  # noqa: F401  (registers the families)
from squrve_spark.actors import named  # noqa: F401  (registers the named methods)
from squrve_spark.actors import linkalign  # noqa: F401  (LinkAlign method suite)
from squrve_spark.actors import opensearch  # noqa: F401  (OpenSearch-SQL method suite)
from squrve_spark.actors import stages  # noqa: F401  (per-method stage actors)
