"""Actor composition: Pipeline (sequential), Tree (fan-out), ActorGroup
(same-family fan-out with family-specific merging).

Reference analog: /root/reference/core/actor/nest/{pipeline,tree}.py.
Fan-out uses threads (the children are LLM/IO-bound); all Spark work stays
on the shared session, isolated per-branch by FAIR scheduler pools set in
the task layer.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from squrve_spark.actors.base import Actor, MergeStrategy, merge_value


class PipelineActor(Actor):
    """Sequential composition: each stage's result dict is merged into the
    kwargs of the next, and into the row under each stage's own strategy."""

    NAME = "pipeline"

    def __init__(self, actors: list[Actor], dataset=None, **kwargs):
        super().__init__(dataset=dataset, **kwargs)
        self.actors = actors
        for a in self.actors:
            if a.dataset is None:
                a.dataset = dataset

    def act(self, item: int, **kwargs) -> dict:
        carried = dict(kwargs)
        out: dict = {}
        for actor in self.actors:
            result = actor.run_on(item, **carried)
            carried.update(result)
            out.update(result)
        return out

    def run_on(self, item: int, **kwargs) -> dict:  # stages already merged
        return self.act(item, **kwargs)


class TreeActor(Actor):
    """Fan-out: run N actors on the same item concurrently, merge their
    result dicts key-wise under each child's strategy."""

    NAME = "tree"

    def __init__(self, actors: list[Actor], dataset=None, max_workers: int = 5, **kwargs):
        super().__init__(dataset=dataset, **kwargs)
        self.actors = actors
        self.max_workers = max_workers
        for a in self.actors:
            if a.dataset is None:
                a.dataset = dataset

    def act(self, item: int, **kwargs) -> dict:
        results: list[tuple[Actor, dict]] = []
        with ThreadPoolExecutor(max_workers=min(self.max_workers, len(self.actors))) as ex:
            futures = [(a, ex.submit(a.act, item, **kwargs)) for a in self.actors]
            for actor, fut in futures:
                res = fut.result()
                if isinstance(res, dict):
                    results.append((actor, res))
        merged: dict = {}
        for actor, res in results:
            for key, value in res.items():
                merged[key] = merge_value(merged.get(key), value, actor.STRATEGY)
        return merged

    def run_on(self, item: int, **kwargs) -> dict:
        merged = self.act(item, **kwargs)
        if self.dataset is not None:
            row = self.dataset[item]
            for key, value in merged.items():
                row[key] = merge_value(row.get(key), value, MergeStrategy.OVERWRITE)
        return merged


class ActorGroup(TreeActor):
    """Same-family fan-out with deduped EXTEND merging of the family output
    (e.g. a scaler group unions candidate SQL lists, dropping duplicates)."""

    NAME = "group"

    def __init__(self, actors: list[Actor], output_name: str, dataset=None, **kwargs):
        super().__init__(actors, dataset=dataset, **kwargs)
        self.output_name = output_name

    def act(self, item: int, **kwargs) -> dict:
        merged: list = []
        with ThreadPoolExecutor(max_workers=min(self.max_workers, len(self.actors))) as ex:
            futures = [ex.submit(a.act, item, **kwargs) for a in self.actors]
            for fut in futures:
                res = fut.result()
                if not isinstance(res, dict):
                    continue
                value = res.get(self.output_name)
                values = value if isinstance(value, list) else [value]
                for v in values:
                    if v is not None and v not in merged:
                        merged.append(v)
        return {self.output_name: merged}
