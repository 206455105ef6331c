"""External-knowledge summarization: ``add_external`` and its default
per-row summarize function.

Reference analog: ``Dataset.add_external`` (/root/reference/core/
data_manage.py:1300-1350) walks the task rows, loads each row's
``external_path`` document, runs an ``external_function`` (default:
``summary_external_knowledge``, /root/reference/core/LinkAlign/tools/
external.py — an LLM pass that distills the document into SQL-ready
knowledge units), saves the summary under
``{external_save_dir}/{instance_id}.txt`` and rewrites ``row["external"]``
to that path. BIRD-style benchmarks carry such evidence on most rows and
every reference generator consumes it.

Differences here: rows live in the in-memory ``squrve_spark.data.Dataset``
(no per-source JSON rewrite loop), the LLM goes through the swappable
``LLMClient`` (Mock/Scripted in tests), and the summarization prompt is a
condensed Spark-dialect equivalent, not the reference's verbatim template.
This step is driver-side by design — one LLM call per task row (10^2-10^4
rows), not a data-plane operator.
"""

from __future__ import annotations

from os import PathLike
from pathlib import Path
from typing import Callable, Optional, Union

from squrve_spark.data import Dataset
from squrve_spark.llm import LLMClient

NO_KNOWLEDGE = "No Valuable External Knowledge"

_SUMMARY_PROMPT = """You are preparing external knowledge so a non-specialist \
can write ONE Spark SQL query.

From the document below, extract ONLY the knowledge needed to answer the \
question, as numbered knowledge units [KD-#]:
- each unit: a definition or formula from the document, with its SQL \
translation (WHERE/JOIN/aggregate fragment) where applicable;
- keep units that define domain terms, unit conversions, thresholds, or \
formulas whose variables map to schema columns;
- drop everything else; at most 12 units;
- if nothing in the document helps answer the question, output exactly: \
{no_knowledge}

### Question
{question}

### External Knowledge Document
{external}
"""


def summary_external_knowledge(
    question: str,
    llm: LLMClient,
    external: Optional[str] = None,
    external_path: Union[str, PathLike, None] = None,
    need_save: bool = True,
    save_path: Union[str, PathLike, None] = None,
) -> str:
    """Distill an external document into question-relevant, SQL-ready
    knowledge units (default ``external_function``; reference
    core/LinkAlign/tools/external.py signature kept)."""
    if not external:
        assert external_path, "need external text or a path to it"
        external = Path(external_path).read_text(encoding="utf-8")
    summary = llm.complete(
        _SUMMARY_PROMPT.format(
            question=question, external=external, no_knowledge=NO_KNOWLEDGE
        )
    )
    if need_save and save_path:
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        save_path.write_text(summary, encoding="utf-8")
    return summary


def add_external(
    dataset: Dataset,
    llm: Optional[LLMClient] = None,
    external_save_dir: Union[str, PathLike] = "files/external",
    external_function: Optional[Callable] = None,
    is_update_dataset: bool = True,
) -> Dataset:
    """Per-row external-knowledge summarization (reference
    data_manage.py:1300-1350 semantics).

    Rows without an ``external_path`` are skipped untouched; for the rest
    the summary lands at ``{external_save_dir}/{instance_id}.txt`` and —
    under ``is_update_dataset`` — ``row["external"]`` is set to that path
    (the reference's merge rule: the summarized path OVERWRITES any prior
    ``external`` value). Returns the dataset for chaining.
    """
    external_function = external_function or summary_external_knowledge
    if llm is None and external_function is summary_external_knowledge:
        return dataset  # reference: "llm or external_function is not available"
    save_dir = Path(external_save_dir)
    for i, row in enumerate(dataset):
        external_path = row.get("external_path")
        if not external_path or not Path(external_path).exists():
            continue
        save_path = save_dir / f"{row.get('instance_id', i)}.txt"
        external_function(
            question=row.get("question", ""),
            llm=llm,
            external_path=external_path,
            save_path=save_path,
        )
        if is_update_dataset:
            dataset.setitem(i, "external", str(save_path))
    return dataset


def external_text(row: dict) -> str:
    """Resolve a row's ``external`` field to prompt text: a path to a saved
    summary is read back; inline text passes through; the no-knowledge
    sentinel and empty values render as '' so prompts stay clean."""
    ext = row.get("external") or ""
    if ext and len(ext) < 4096:
        p = Path(ext)
        try:
            if p.is_file():
                ext = p.read_text(encoding="utf-8")
        except OSError:
            pass
    ext = ext.strip()
    return "" if ext == NO_KNOWLEDGE else ext
