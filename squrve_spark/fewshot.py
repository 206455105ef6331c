"""Few-shot example retrieval + question masking.

Reference analog: ``add_few_shot`` (data_manage.py:1209-1298 — top-k CoT
examples by question similarity per db_type, default k=3) and DAIL-SQL's
masked-question similarity selection (DAILSQLGenerate.py:203-241 — schema
terms masked out before comparing questions, so similarity reflects question
SHAPE, not shared entity names).

Deterministic implementation: token sets with optional schema-term masking,
Jaccard similarity, stable tie-break. At corpus scale the same shape runs as
a Spark join over a tokenized example table; driver-side is right while
example stores are thousands of rows.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Optional

_TOKEN = re.compile(r"[a-z0-9]+")
_MASK = "<m>"


def tokenize(text: str) -> list[str]:
    return _TOKEN.findall((text or "").lower())


def mask_question(question: str, schema_terms: set[str]) -> list[str]:
    """Replace schema-derived tokens (table/column name parts) with a mask
    token so similarity measures question structure, not entity overlap."""
    parts = set()
    for t in schema_terms:
        parts.update(tokenize(t.replace(".", " ").replace("_", " ")))
    return [_MASK if t in parts else t for t in tokenize(question)]


def jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


class FewShotStore:
    """Per-db_type example store with top-k retrieval by (masked) question
    similarity."""

    def __init__(self, examples: Optional[dict[str, list[dict]]] = None):
        # db_type -> [{question, sql, reasoning?}, ...]
        self.examples = examples or {}

    @classmethod
    def load(cls, path: str) -> "FewShotStore":
        return cls(json.loads(Path(path).read_text()))

    def save(self, path: str) -> None:
        Path(path).write_text(json.dumps(self.examples, indent=2))

    def add(self, db_type: str, question: str, sql: str, reasoning: str = "") -> None:
        self.examples.setdefault(db_type, []).append(
            {"question": question, "sql": sql, "reasoning": reasoning}
        )

    def top_k(
        self,
        question: str,
        db_type: str = "spark",
        k: int = 3,
        schema_terms: Optional[set[str]] = None,
    ) -> list[dict]:
        pool = self.examples.get(db_type, [])
        terms = schema_terms or set()
        q = mask_question(question, terms) if terms else tokenize(question)

        def score(ex: dict) -> float:
            e = (
                mask_question(ex["question"], terms)
                if terms
                else tokenize(ex["question"])
            )
            return jaccard(q, e)

        ranked = sorted(
            enumerate(pool), key=lambda ie: (-score(ie[1]), ie[0])
        )  # stable: similarity desc, insertion order
        return [ex for _i, ex in ranked[:k]]

    def render(self, examples: list[dict]) -> str:
        """Prompt block in the reference's Q/SQL pair shape."""
        blocks = []
        for ex in examples:
            b = f"Q: {ex['question']}\nSQL: {ex['sql']}"
            if ex.get("reasoning"):
                b = f"{b}\n-- {ex['reasoning']}"
            blocks.append(b)
        return "\n\n".join(blocks)
