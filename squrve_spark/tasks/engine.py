"""Engine: config -> datasets -> task tree -> execute -> evaluate.

Reference analog: /root/reference/core/engine.py — ``init_tasks`` validates
``task_meta`` and builds a Dataset per task; ``parse_exec_process`` turns a
nested list/dict plan with ``~p``/``~s`` markers into a Parallel/Sequence
task tree; ``execute`` runs the root; ``evaluate`` aggregates per-task
metrics. The FAIR scheduler pool file is configured in
``squrve_spark.session`` so ParallelTask children actually share the
cluster.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from squrve_spark.actors.base import Actor, ActorPool
from squrve_spark.config import Router
from squrve_spark.data import Dataset
from squrve_spark.evaluate import Evaluator
from squrve_spark.llm import LLMClient
from squrve_spark.tasks.core import BaseTask, MetaTask, ParallelTask, SequenceTask

FAMILY_OF_TASK_TYPE = {
    "reduce": "reducer",
    "parse": "parser",
    "generate": "generator",
    "decompose": "decomposer",
    "scale": "scaler",
    "optimize": "optimizer",
    "select": "selector",
    "agent": "agent",
}


def parse_exec_process(spec, tasks: dict[str, BaseTask], _counter=[0]) -> BaseTask:
    """Nested plan -> task tree. Lists run serially unless the first element
    is the ``~p``/``*p`` marker (then in parallel); ``~s`` forces serial;
    string leaves resolve task ids (reference engine.py:601-718 shapes)."""
    if isinstance(spec, str):
        return tasks[spec]
    if isinstance(spec, dict):
        children = [parse_exec_process(v, tasks) for v in spec.values()]
        _counter[0] += 1
        return SequenceTask(f"seq_{_counter[0]}", children)
    if isinstance(spec, list):
        mode = "s"
        items = list(spec)
        if items and items[0] in ("~p", "*p", "~s"):
            mode = "p" if items[0] in ("~p", "*p") else "s"
            items = items[1:]
        children = [parse_exec_process(s, tasks) for s in items]
        _counter[0] += 1
        if mode == "p":
            return ParallelTask(f"par_{_counter[0]}", children)
        return SequenceTask(f"seq_{_counter[0]}", children)
    raise TypeError(f"bad exec_process node: {spec!r}")


class Engine:
    """Drive task construction and execution over one shared SparkSession."""

    def __init__(
        self,
        router: Optional[Router] = None,
        spark: Optional[SparkSession] = None,
        llm: Optional[LLMClient] = None,
        dataset: Optional[Dataset] = None,
    ):
        self.router = router or Router()
        self.spark = spark
        self.llm = llm
        if dataset is None and self.router.get("data_source"):
            # reference-style configs name a benchmark identifier instead of
            # shipping rows ("data_source": "tpch:dev:", engine.py:112-180);
            # resolve it against the sys_config registry defaults
            from squrve_spark.data import DataLoader

            dataset = DataLoader(sample=self.router.get("sample")).resolve(
                self.router.get("data_source")
            )
        self.dataset = dataset or Dataset()
        self.tasks: dict[str, BaseTask] = {}
        self.root: Optional[BaseTask] = None

    # -- task construction --------------------------------------------------

    def add_task(
        self,
        task_id: str,
        task_type: str,
        actor_name: str | None = None,
        dataset: Optional[Dataset] = None,
        **actor_kwargs,
    ) -> MetaTask:
        """Validated MetaTask factory: task_type picks the actor family
        (engine.py:260-425 registry shape)."""
        if task_type not in FAMILY_OF_TASK_TYPE:
            raise ValueError(f"unknown task type {task_type!r}")
        family = FAMILY_OF_TASK_TYPE[task_type]
        ds = dataset or self.dataset
        actor = ActorPool.create(
            family,
            actor_name or task_type,
            dataset=ds,
            spark=self.spark,
            llm=self.llm,
            **actor_kwargs,
        )
        task = MetaTask(
            task_id,
            actor,
            dataset=ds,
            spark=self.spark,
            open_parallel=bool(self.router.get("open_parallel")),
            max_workers=int(self.router.get("max_workers", 5)),
        )
        self.tasks[task_id] = task
        return task

    def add_complex_task(self, task_id: str, actors: list[Actor], dataset: Optional[Dataset] = None) -> MetaTask:
        """Pipeline of pre-built actors as one MetaTask (ComplexTask shape)."""
        from squrve_spark.actors.nest import PipelineActor

        ds = dataset or self.dataset
        task = MetaTask(task_id, PipelineActor(actors, dataset=ds), dataset=ds, spark=self.spark)
        self.tasks[task_id] = task
        return task

    def plan(self, exec_process) -> BaseTask:
        self.root = parse_exec_process(exec_process, self.tasks)
        return self.root

    # -- config-driven construction (reference startup_run/run.py flow) ----

    _TASK_TYPE_ALIASES = {
        "GenerateTask": "generate",
        "ReduceTask": "reduce",
        "ParseTask": "parse",
        "DecomposeTask": "decompose",
        "ScaleTask": "scale",
        "OptimizeTask": "optimize",
        "SelectTask": "select",
        "AgentTask": "agent",
    }

    def build_from_router(self) -> "Engine":
        """Construct tasks from the router's ``task.task_meta`` section —
        the reference's config-driven entry point (startup_run/
        startup_config.json: task_meta rows with task_type
        'GenerateTask' etc. and meta.task.<family>_type actor names;
        core/engine.py builds the task list from it). ``task.exec_process``
        (when present) becomes the plan; otherwise tasks run in declared
        order."""
        section = self.router.section("task") or {}
        for m in section.get("task_meta") or []:
            raw_type = m.get("task_type", "")
            ttype = self._TASK_TYPE_ALIASES.get(raw_type) or raw_type.lower().removesuffix(
                "task"
            )
            meta_cfg = m.get("meta") or {}
            if isinstance(meta_cfg, dict):
                meta_cfg = meta_cfg.get("task", meta_cfg)
            actor = (
                meta_cfg.get(f"{ttype}_type")
                or m.get(f"{ttype}_type")
                or ttype
            )
            kwargs = {
                k: v
                for k, v in meta_cfg.items()
                if not k.endswith("_type") and k not in ("task_id", "task_type")
            }
            self.add_task(m["task_id"], ttype, actor, **kwargs)
        if section.get("exec_process"):
            self.plan(section["exec_process"])
        return self

    # -- run & score --------------------------------------------------------

    def execute(self, exec_process=None) -> BaseTask:
        if exec_process is not None:
            self.plan(exec_process)
        if self.root is None:
            self.plan(list(self.tasks))
        self.root.run()
        return self.root

    def evaluate(self, eval_type=None, dataset: Optional[Dataset] = None) -> dict:
        ev = Evaluator(
            self.spark,
            dataset or self.dataset,
            eval_type or self.router.get("eval_type"),
            item_timeout_s=float(self.router.get("item_timeout_s", 60.0)),
            row_cap=int(self.router.get("row_cap", 10_000)),
        )
        return ev.eval_all()


def run_pass_n(
    make_engine,
    n: int = 3,
    eval_type: str = "execute_accuracy",
) -> dict:
    """pass@n harness (reference reproduce/eval_utils.py:42-97): build and
    run the pipeline n times via ``make_engine(run_idx) -> Engine`` (fresh
    engine per run so stochastic generators re-roll), score each run, and
    report per-run averages + pass@n (a row passes if ANY run scored
    nonzero)."""
    from squrve_spark.evaluate import pass_at_n

    per_run_scores: list[list[float]] = []
    run_avgs = []
    for i in range(n):
        eng = make_engine(i)
        eng.execute()
        res = eng.evaluate([eval_type])[eval_type]
        by_idx = dict(res["results"])
        scores = [float(by_idx.get(j, 0.0)) for j in range(res["total_items"])]
        per_run_scores.append(scores)
        run_avgs.append(res["avg"])
    return {
        "n": n,
        "run_avgs": run_avgs,
        "pass_at_n": pass_at_n(per_run_scores),
    }
