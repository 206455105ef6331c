"""Meta-SQL decomposition: split a SQL statement into independently
executable atomic statements to isolate the failing clause.

Reference analog: AdaptiveOptimize.py:100-230 — an LLM splits the SQL by
rules (WHERE fission, GROUP BY fission, join fission, subquery extraction),
executes each meta-SQL, and uses the per-clause outcome to decide between
syntax repair and logic repair. Here the decomposition itself is
deterministic (rule-based string surgery on benchmark-grade SQL), which
makes the diagnosis reproducible; only the repair step needs an LLM.

This is driver-side SQL text manipulation — execution of each meta-SQL goes
through the engine's capped ``execution.execute``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import SparkSession

from squrve_spark import execution as X

_CLAUSE = re.compile(
    r"\b(WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT)\b", re.IGNORECASE
)


def _clause_spans(sql: str) -> list[tuple[str, int, int]]:
    """(clause_name, start, end) for each top-level clause (paren depth 0)."""
    spans = []
    depth = 0
    marks: list[tuple[str, int]] = []
    for m in re.finditer(r"[()]|\bWHERE\b|\bGROUP\s+BY\b|\bHAVING\b|\bORDER\s+BY\b|\bLIMIT\b", sql, re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            marks.append((re.sub(r"\s+", " ", tok.upper()), m.start()))
    for i, (name, start) in enumerate(marks):
        end = marks[i + 1][1] if i + 1 < len(marks) else len(sql)
        spans.append((name, start, end))
    return spans


def strip_clause(sql: str, clause: str) -> Optional[str]:
    """Remove one top-level clause (and, for GROUP BY, any HAVING)."""
    spans = _clause_spans(sql)
    drop = [s for s in spans if s[0] == clause]
    if clause == "GROUP BY":
        drop += [s for s in spans if s[0] == "HAVING"]
    if not drop:
        return None
    out = sql
    for _name, start, end in sorted(drop, key=lambda s: -s[1]):
        out = out[:start] + out[end:]
    return re.sub(r"\s+", " ", out).strip()


def extract_subqueries(sql: str) -> list[str]:
    """Top-level parenthesized SELECTs (IN/EXISTS/scalar subqueries)."""
    subs = []
    depth = 0
    start = None
    for i, ch in enumerate(sql):
        if ch == "(":
            if depth == 0:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0 and start is not None:
                body = sql[start + 1 : i].strip()
                if re.match(r"(?is)^\s*SELECT\b", body):
                    subs.append(body)
                start = None
    return subs


@dataclass
class MetaSQLReport:
    sql: str
    parses: bool
    runs: bool
    error: Optional[str]
    failing_clause: Optional[str] = None
    meta_results: dict = field(default_factory=dict)  # meta-sql -> error|None

    @property
    def diagnosis(self) -> str:
        if self.runs:
            return "ok"
        if not self.parses:
            return "syntax"
        return f"logic:{self.failing_clause or 'unknown'}"


def decompose(sql: str) -> dict[str, str]:
    """Named meta-SQLs: the query with each clause removed + bare subqueries.
    Executing these isolates WHICH clause breaks a failing statement."""
    metas: dict[str, str] = {}
    for clause in ("WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT"):
        stripped = strip_clause(sql, clause)
        if stripped and stripped != sql:
            metas[f"without_{clause.replace(' ', '_').lower()}"] = stripped
    for i, sub in enumerate(extract_subqueries(sql)):
        metas[f"subquery_{i}"] = sub
    return metas


def diagnose(spark: SparkSession, sql: str, row_cap: int = 10) -> MetaSQLReport:
    """Execute the SQL and, on failure, its meta-SQLs; pinpoint the clause
    whose removal makes the statement run."""
    res = X.execute(spark, sql, row_cap=row_cap)
    if res.error is None:
        return MetaSQLReport(sql, parses=True, runs=True, error=None)
    parses = "PARSE_SYNTAX_ERROR" not in (res.error or "")
    report = MetaSQLReport(sql, parses=parses, runs=False, error=res.error)
    if not parses:
        return report
    for name, meta in decompose(sql).items():
        meta_res = X.execute(spark, meta, row_cap=row_cap)
        report.meta_results[name] = meta_res.error
        if meta_res.error is None and name.startswith("without_") and report.failing_clause is None:
            report.failing_clause = name.removeprefix("without_").replace("_", " ").upper()
    return report
