"""Task orchestration kernel (SURVEY §2.B.3)."""

from squrve_spark.tasks.core import (  # noqa: F401
    BaseTask,
    MetaTask,
    ParallelTask,
    SequenceTask,
)
from squrve_spark.tasks.engine import Engine, parse_exec_process  # noqa: F401
