"""Tasks: per-row actor mapping + serial/parallel composition.

Reference analog: /root/reference/core/task/* — ``MetaTask.run`` maps
``actor.act(i)`` over dataset rows with a thread pool; ``SequenceTask`` runs
children serially; ``ParallelTask`` forks processes. Intended idiomatic
deviation (SURVEY §7.5): a forked process cannot share a SparkSession, so
cross-task parallelism is threads + the FAIR scheduler — each task tags its
Spark jobs with its own scheduler pool (``spark.scheduler.pool``) so
concurrent tasks share the cluster fairly, and per-item cancellation uses
job groups instead of ``func_timeout``.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

from pyspark.sql import SparkSession

from squrve_spark.actors.base import Actor


class BaseTask:
    def __init__(self, task_id: str, dataset=None, spark: Optional[SparkSession] = None):
        self.task_id = task_id
        self.dataset = dataset
        self.spark = spark
        self.ended = False
        self.seconds: float = 0.0
        self.errors: list[dict] = []

    def run(self) -> "BaseTask":
        raise NotImplementedError

    def _timed(self, fn) -> None:
        t0 = time.perf_counter()
        try:
            fn()
        finally:
            self.seconds = time.perf_counter() - t0
            self.ended = True


class MetaTask(BaseTask):
    """Map one actor over every dataset row; errors are recorded per row,
    never abort the task (reference MetaTask.py:29-80 semantics)."""

    def __init__(
        self,
        task_id: str,
        actor: Actor,
        dataset=None,
        spark: Optional[SparkSession] = None,
        open_parallel: bool = False,
        max_workers: int = 3,
    ):
        super().__init__(task_id, dataset, spark)
        self.actor = actor
        if actor.dataset is None:
            actor.dataset = dataset
        self.open_parallel = open_parallel
        self.max_workers = max_workers

    def _run_item(self, i: int) -> None:
        if self.spark is not None:
            # tag this task's Spark jobs into its FAIR pool
            self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", self.task_id)
        try:
            self.actor.run_on(i)
        except Exception as exc:  # noqa: BLE001 — per-row containment
            self.errors.append({"index": i, "error": str(exc)})
            if self.dataset is not None:
                self.dataset[i]["error_info"] = str(exc)

    def run(self) -> "MetaTask":
        def body():
            n = len(self.dataset) if self.dataset is not None else 0
            if self.open_parallel and n > 1:
                with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
                    list(ex.map(self._run_item, range(n)))
            else:
                for i in range(n):
                    self._run_item(i)

        self._timed(body)
        return self


class SequenceTask(BaseTask):
    def __init__(self, task_id: str, children: list[BaseTask]):
        super().__init__(task_id)
        self.children = children

    def run(self) -> "SequenceTask":
        def body():
            for child in self.children:
                if not child.ended:
                    child.run()

        self._timed(body)
        return self


class ParallelTask(BaseTask):
    """Run child tasks concurrently with threads (NOT processes — the
    SparkSession is shared; FAIR pools give per-task fairness)."""

    def __init__(self, task_id: str, children: list[BaseTask], max_workers: int | None = None):
        super().__init__(task_id)
        self.children = children
        self.max_workers = max_workers or max(1, len(children))

    def run(self) -> "ParallelTask":
        def body():
            with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
                futures = [ex.submit(c.run) for c in self.children if not c.ended]
                for f in futures:
                    f.result()

        self._timed(body)
        return self


def save_task_artifacts(task: BaseTask, out_dir: str) -> dict:
    """Persist a task's run record + dataset (reference BaseTask.save /
    Logger shape: per-task JSON log, dataset JSON next to it)."""
    import json
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    record = {
        "task_id": task.task_id,
        "ended": task.ended,
        "seconds": round(task.seconds, 3),
        "errors": task.errors,
        "children": [c.task_id for c in getattr(task, "children", [])],
    }
    (out / f"{task.task_id}.log.json").write_text(json.dumps(record, indent=2))
    if task.dataset is not None and hasattr(task.dataset, "save"):
        task.dataset.save(str(out / f"{task.task_id}.dataset.json"))
    for child in getattr(task, "children", []):
        record.setdefault("child_records", []).append(save_task_artifacts(child, out_dir))
    return record
