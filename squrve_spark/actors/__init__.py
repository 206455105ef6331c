"""Actor kernel + families (SURVEY §2.B.4/§2.B.5)."""

from squrve_spark.actors.base import Actor, ActorPool, MergeStrategy, merge_value  # noqa: F401
from squrve_spark.actors.nest import ActorGroup, PipelineActor, TreeActor  # noqa: F401
from squrve_spark.actors import families  # noqa: F401  (registers the families)
from squrve_spark.actors import named  # noqa: F401  (registers the named methods)
