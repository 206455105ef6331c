"""Router: config-compatible parameter manager.

Reference analog: /root/reference/core/base.py:7-751 — a flat bag of
parameters loaded from JSON sections ``api_key / llm / text_embed / router /
dataloader / dataset / database / reducer / parser / generator / optimize /
task / engine / credential`` layered over a system config. The shape (section
names, defaults that bound runtime behavior) is kept so reference configs
load unchanged; unknown keys pass through untouched.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

SECTIONS = [
    "api_key",
    "llm",
    "text_embed",
    "router",
    "dataloader",
    "dataset",
    "database",
    "reducer",
    "parser",
    "generator",
    "optimize",
    "task",
    "engine",
    "credential",
]

# operational defaults mirrored from the reference (BASELINE.md)
DEFAULTS: dict[str, Any] = {
    "temperature": 0.75,
    "top_p": 0.9,
    "max_token": 8000,
    "context_window": 120_000,
    "time_out": 300.0,
    "open_parallel": False,
    "max_workers": 5,
    "few_shot_num": 3,
    "debug_turn_n": 2,
    "db_type": "spark",
    "eval_type": ["execute_accuracy"],
    "row_cap": 10_000,
    "sql_timeout_s": 120.0,
    "item_timeout_s": 60.0,
}


class Router:
    """Flat parameter bag over layered JSON configs.

    ``Router(config_path)`` loads the user config; ``Router(**overrides)``
    sets parameters directly. Section dicts flatten into attributes; the
    raw section tree stays accessible via ``.section(name)``.
    """

    def __init__(self, config_path: Optional[str] = None, **overrides):
        self._tree: dict[str, dict] = {s: {} for s in SECTIONS}
        self._params: dict[str, Any] = dict(DEFAULTS)
        if config_path:
            self.load(config_path)
        self._params.update(overrides)

    def load(self, config_path: str) -> "Router":
        raw = json.loads(Path(config_path).read_text())
        for section, payload in raw.items():
            if isinstance(payload, dict):
                self._tree.setdefault(section, {}).update(payload)
                self._params.update(payload)
            else:
                self._params[section] = payload
        return self

    def section(self, name: str) -> dict:
        return self._tree.get(name, {})

    def get(self, key: str, default: Any = None) -> Any:
        return self._params.get(key, default)

    def set(self, key: str, value: Any) -> None:
        self._params[key] = value

    def __getattr__(self, key: str) -> Any:
        params = object.__getattribute__(self, "_params")
        if key in params:
            return params[key]
        raise AttributeError(key)

    def to_dict(self) -> dict:
        return dict(self._params)
