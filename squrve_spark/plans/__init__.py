"""Query plans: the engine's executable query inventory.

Importing this package populates ``squrve_spark.plans.registry.REGISTRY`` with
every named query (relational surface, analytics, data-pipeline operators).
"""

from squrve_spark.plans.registry import REGISTRY, QuerySpec, register  # noqa: F401

# Import side effects populate the registry.
from squrve_spark.plans import relational  # noqa: F401,E402
from squrve_spark.plans import tpch_classics  # noqa: F401,E402
from squrve_spark.plans import analytics  # noqa: F401,E402
from squrve_spark.plans import pipeline  # noqa: F401,E402
from squrve_spark.plans import streaming_plans  # noqa: F401,E402
