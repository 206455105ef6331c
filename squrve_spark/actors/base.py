"""Actor kernel: the per-row transform contract + registry + merge rules.

Reference analog: /root/reference/core/actor/base.py — ``Actor.act(item)``
transforms one task row; class attrs NAME / OUTPUT_NAME / STRATEGY / SKILL;
``MergeStrategy`` governs how an actor's result dict lands in the row;
``ActorPool`` registers families and resolves names by suffix convention
(``*Reducer``, ``*Parser``, ``*Generator``, ...). This registry IS the
engine's extension surface (SURVEY §2.E).
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Optional


class MergeStrategy(Enum):
    OVERWRITE = "overwrite"  # result value replaces row value
    APPEND = "append"  # row value becomes/extends a list, result appended
    EXTEND = "extend"  # result list extends row list (candidate fan-in)


def merge_value(old: Any, new: Any, strategy: MergeStrategy) -> Any:
    if strategy is MergeStrategy.OVERWRITE or old is None:
        if strategy is MergeStrategy.APPEND and old is None:
            return [new]
        if strategy is MergeStrategy.EXTEND and old is None:
            return list(new) if isinstance(new, list) else [new]
        return new
    if strategy is MergeStrategy.APPEND:
        base = old if isinstance(old, list) else [old]
        return base + [new]
    if strategy is MergeStrategy.EXTEND:
        base = old if isinstance(old, list) else [old]
        add = new if isinstance(new, list) else [new]
        return base + add
    return new


class Actor:
    """Per-row transform. Subclasses set NAME (registry key), OUTPUT_NAME
    (row field written), STRATEGY, and a human/LLM-readable SKILL string
    (used by planning agents to choose workflows)."""

    NAME: str = "base"
    OUTPUT_NAME: Optional[str] = None
    STRATEGY: MergeStrategy = MergeStrategy.OVERWRITE
    SKILL: str = ""

    def __init__(self, dataset=None, **kwargs):
        self.dataset = dataset
        self.params = kwargs

    def act(self, item: int, **kwargs) -> dict:
        """Compute this actor's output for row ``item``; returns the result
        dict (also merged into the row by ``run_on``)."""
        raise NotImplementedError

    def run_on(self, item: int, **kwargs) -> dict:
        result = self.act(item, **kwargs)
        if self.dataset is not None and isinstance(result, dict):
            row = self.dataset[item]
            for key, value in result.items():
                row[key] = merge_value(row.get(key), value, self.STRATEGY)
        return result if isinstance(result, dict) else {}


class ActorPool:
    """Name -> class registry with suffix-convention resolution: a request
    for name ``X`` resolves to the registered class whose NAME matches, or —
    mirroring the reference's syntax_check — whose NAME is a suffix-
    compatible variant (``linkalign`` resolves ``LinkAlignGenerator`` within
    the generator family)."""

    _families: dict[str, dict[str, type]] = {}

    @classmethod
    def register(cls, family: str):
        def deco(klass: type):
            cls._families.setdefault(family, {})[klass.NAME] = klass
            return klass

        return deco

    @classmethod
    def resolve(cls, family: str, name: str) -> type:
        pool = cls._families.get(family, {})
        if name in pool:
            return pool[name]
        # punctuation-insensitive prefix match: reference configs spell
        # variants like "DIN_SQLGenerator" / "DINSQLGenerator" / "dinsql"
        import re as _re

        canon = _re.sub(r"[^a-z0-9]", "", name.lower())
        if not canon:
            # a name like "_" canonicalizes to "", which startswith() treats
            # as a universal prefix — it must not resolve to an arbitrary
            # first pool entry
            raise KeyError(f"no actor named {name!r} in family {family!r}")
        for key, klass in pool.items():
            k = _re.sub(r"[^a-z0-9]", "", key.lower())
            if canon.startswith(k) or k.startswith(canon):
                return klass
        raise KeyError(f"no actor named {name!r} in family {family!r}")

    @classmethod
    def create(cls, family: str, name: str, dataset=None, **kwargs) -> Actor:
        return cls.resolve(family, name)(dataset=dataset, **kwargs)

    @classmethod
    def skills(cls, family: Optional[str] = None) -> dict[str, str]:
        """NAME -> SKILL markdown, the planning surface for ForkGather-style
        agents."""
        fams = [family] if family else list(cls._families)
        out = {}
        for f in fams:
            for name, klass in cls._families.get(f, {}).items():
                out[f"{f}:{name}"] = klass.SKILL or (klass.__doc__ or "")
        return out
