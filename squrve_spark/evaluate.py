"""Evaluation: Execution Accuracy + schema-linking metrics over a Dataset.

Reference analog: /root/reference/core/evaluate.py — metric registry
(reduce_recall/reduce_rate/reduce_precision, parse_recall/parse_precision/
parse_exact_matching, execute_accuracy), a per-row eval loop with a 60 s
per-item budget, averages + valid counts. Differences by design:

  * pred/gold SQL executes via ``spark.sql`` (one shared session, FAIR
    pools) instead of sqlite/warehouse connections;
  * the 60 s per-item timeout is enforced with Spark job-group cancellation
    inside the execution wrapper, not ``func_timeout`` (SURVEY §7.5);
  * when either result overflows the driver row cap, EX falls back to the
    distributed signature comparator (squrve_spark.compare) instead of
    collecting — the 100 TB-safe path.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Iterable, Optional, Union

import pandas as pd
from pyspark.sql import SparkSession

from squrve_spark import compare as C
from squrve_spark import execution as X

EVAL_TYPES = [
    "reduce_recall",
    "reduce_rate",
    "reduce_precision",
    "parse_recall",
    "parse_precision",
    "parse_exact_matching",
    "execute_accuracy",
]


def parse_schema_links(text: str) -> list[str]:
    """Extract ``table.column`` tokens from free-form LLM output (the
    reference parses bracketed lists; we accept brackets, commas, lines)."""
    body = text
    m = re.search(r"\[([^\]]*)\]", text, re.DOTALL)
    if m:
        body = m.group(1)
    toks = re.split(r"[,\n]+", body)
    out = []
    for t in toks:
        t = t.strip().strip("'\"` ")
        if t and re.fullmatch(r"[\w$]+(\.[\w$]+)?", t):
            out.append(t)
    return out


def normalize_schemas(pred) -> Optional[set[str]]:
    """Normalize DataFrame / str / list formats to a set of 'table.column'."""
    if pred is None:
        return None
    if isinstance(pred, pd.DataFrame):
        return {f"{r['table_name']}.{r['column_name']}" for _, r in pred.iterrows()}
    if isinstance(pred, str):
        pred = parse_schema_links(pred)
    if isinstance(pred, (list, set, tuple)):
        items = list(pred)
        if all(isinstance(x, str) for x in items):
            return set(items)
        if all(isinstance(x, dict) for x in items):
            return {f"{x['table_name']}.{x['column_name']}" for x in items}
        if all(isinstance(x, (list, tuple)) and len(x) == 2 for x in items):
            return {f"{t}.{c}" for t, c in items}
    return None


def schema_recall(gold: list[str], pred) -> Optional[float]:
    """Fraction of gold links hit by some pred link (substring containment,
    so a pred 'col' hits gold 'table.col' — reference semantics)."""
    if not gold:
        return None
    p = normalize_schemas(pred)
    if p is None:
        return None
    return sum(any(x in g for x in p) for g in gold) / len(gold)


def schema_precision(gold: list[str], pred) -> Optional[float]:
    if not gold:
        return None
    p = normalize_schemas(pred)
    if p is None:
        return None
    if not p:
        return 0.0
    return sum(any(x in g for g in gold) for x in p) / len(p)


def schema_exact_matching(gold: list[str], pred) -> Optional[bool]:
    r, pr = schema_recall(gold, pred), schema_precision(gold, pred)
    if r is None or pr is None:
        return None
    return r == pr


class Evaluator:
    """Per-dataset metric computation with the reference's reporting shape:
    ``{metric: {avg, results: [[idx, score], ...], valid_num, total_items}}``.

    ``dataset`` is any sequence of row dicts (squrve_spark.data.Dataset or a
    plain list); row fields follow the reference IR: ``query`` (gold SQL),
    ``pred_sql``, ``schema_links``, ``gold_schemas``, ``instance_schemas``,
    ``db_type``.
    """

    def __init__(
        self,
        spark: SparkSession,
        dataset,
        eval_type: Union[str, list, None] = None,
        item_timeout_s: float = 60.0,
        row_cap: int = X.DEFAULT_ROW_CAP,
    ):
        self.spark = spark
        self.dataset = dataset
        self.eval_type = [eval_type] if isinstance(eval_type, str) else (eval_type or [])
        self.item_timeout_s = item_timeout_s
        self.row_cap = row_cap
        self.eval_results: dict = {}

    # -- resolution helpers -------------------------------------------------

    @staticmethod
    def _resolve_sql(row: dict, key: str) -> Optional[str]:
        raw = row.get(key)
        if not isinstance(raw, str) or not raw.strip():
            return None
        try:
            if len(raw) < 4096 and Path(raw).is_file():
                raw = Path(raw).read_text()
        except OSError:
            pass
        return raw if raw.strip() else None

    # -- metric implementations ---------------------------------------------

    def eval_execute_accuracy(self, row: dict) -> Optional[int]:
        gold_sql = self._resolve_sql(row, "query")
        if gold_sql is None:
            return None
        pred_sql = self._resolve_sql(row, "pred_sql")
        if pred_sql is None:
            return 0
        dialect = row.get("db_type", "spark")
        budget = self.item_timeout_s / 2
        pred = X.execute(self.spark, pred_sql, self.row_cap, budget, dialect)
        gold = X.execute(self.spark, gold_sql, self.row_cap, budget, dialect)
        if gold.error is not None or gold.df is None:
            return None  # gold failure -> item not scoreable (reference rule)
        if pred.error is not None or pred.df is None:
            return 0
        if pred.capped or gold.capped:
            # too big to collect -> distributed signature comparison, under
            # the same job-group timeout budget as the collect path (one
            # pathological query must not stall the whole eval loop)
            import uuid as _uuid

            def _sig_compare():
                p = self.spark.sql(X.transpile(pred_sql, dialect))
                g = self.spark.sql(X.transpile(gold_sql, dialect))
                return C.compare_spark_frames(p, g)

            value, error = X._run_with_timeout(
                self.spark, _sig_compare, budget, f"squrve-eval-{_uuid.uuid4().hex[:12]}"
            )
            if error is not None:
                return 0
            return value
        ignore_order = "order by" not in gold_sql.lower()
        return C.compare_dataframes(pred.df, gold.df, ignore_order=ignore_order)

    def eval_reduce_recall(self, row: dict) -> Optional[float]:
        return schema_recall(row.get("gold_schemas"), row.get("instance_schemas"))

    def eval_reduce_precision(self, row: dict) -> Optional[float]:
        return schema_precision(row.get("gold_schemas"), row.get("instance_schemas"))

    def eval_reduce_rate(self, row: dict) -> Optional[float]:
        """Fraction of the full schema pruned away by the reducer."""
        full, kept = row.get("schema_size"), row.get("reduced_size")
        if not full:
            return None
        return 1.0 - (kept or 0) / full

    def eval_parse_recall(self, row: dict) -> Optional[float]:
        return schema_recall(row.get("gold_schemas"), row.get("schema_links"))

    def eval_parse_precision(self, row: dict) -> Optional[float]:
        return schema_precision(row.get("gold_schemas"), row.get("schema_links"))

    def eval_parse_exact_matching(self, row: dict) -> Optional[bool]:
        return schema_exact_matching(row.get("gold_schemas"), row.get("schema_links"))

    # -- driver loop --------------------------------------------------------

    def eval(self, index: int, eval_type: str):
        row = self.dataset[index]
        if not isinstance(row, dict):
            return None
        fn = getattr(self, f"eval_{eval_type}", None)
        if fn is None:
            return None
        return fn(row)

    def eval_all(self, verbose: bool = False) -> dict:
        results: dict = {}
        total = len(self.dataset)
        for metric in self.eval_type:
            if metric not in EVAL_TYPES:
                continue
            res_lis, acc, valid = [], 0.0, 0
            for i in range(total):
                try:
                    score = self.eval(i, metric)
                except Exception:  # noqa: BLE001 — containment, not abort
                    continue
                if score is None:
                    continue
                res_lis.append([i, score])
                acc += float(score)
                valid += 1
            entry = {
                "avg": (acc / valid) if valid else 0.0,
                "results": res_lis,
                "valid_num": valid,
                "total_items": total,
            }
            if not valid:
                entry["warning"] = f"No valid evaluation results for {metric}."
            results[metric] = entry
            if verbose:
                print(f"{metric}: avg={entry['avg']:.4f} ({valid}/{total} valid)")
        self.eval_results.update(results)
        return results


# ---------------------------------------------------------------------------
# LLM-judge evaluation (reference: app/evaluation_helper.py:283-351)
#
# The reference's Flask app offers an optional LLM semantic judgment of a
# predicted actor sequence against a baseline, driven by a six-principle
# rubric and a strict-JSON answer contract, with an asymmetric confidence
# rule (low-confidence NOT_BETTER defaults to BETTER) and the score mapping
# BETTER -> 3 + 0.5*conf / NOT_BETTER -> -0.5*conf. The rubric text below is
# engine-domain wording of the same six principles (same names, same
# evaluation intent — prose is ours, per the repo's anti-copy stance).

JUDGE_CRITERION = """1. The Principle of Search Space Decoupling
Schema identification (Parse) must run before logic synthesis (Generate):
a generator fed the full raw schema hallucinates columns; one fed a
high-confidence pruned subset does not. Check: does every Generate/Scale
actor run after at least one Parse actor?

2. The Principle of Methodological Consensus (Diversity)
Complex or ambiguous tasks should fan out to a committee of parallel
actors with distinct internal methodologies — parallel diversity maximizes
recall of the correct candidate. Check: do complex tasks use three or more
diverse Generate/Scale actors in a parallel block?

3. The Principle of Sequential Refinement (The Optimizer Chain)
Optimization is cumulative: chain optimizers that target different error
classes (syntax first, then logical grounding). Check: do multiple Optimize
actors run in sequence after generation?

4. The Principle of Empirical Selection (Precision Shift)
After recall-maximizing parallel generation, an execution-based Select
actor must pick the provably-best candidate. Check: does the pipeline
terminate with a Select actor?

5. The Principle of Structural Elasticity
Pipeline depth and width must scale with task complexity — simple queries
fail from over-engineering, complex ones from shallow chains. Check: is the
pipeline's size proportional to the stated complexity?

6. The Principle of Architectural Integrity (Type Compatibility)
Every actor's output type must satisfy the next actor's input requirement
(schema -> schema_links -> pred_sql); a broken informational flow cannot
succeed. Check: can you trace a continuous typed dataflow end to end?"""

LLM_JUDGE_TEMPLATE = """# Role: Expert SQL Pipeline Auditor
You are an expert system architect specializing in Text-to-SQL actor
pipelines. Evaluate the Predicted Actor Sequence against the Baseline
Actor Sequence for the task below.

# Evaluation Criteria (Success Principles):
CRITERION

# Input Prompt:
INPUT_PROMPT

# Baseline Actor Sequence:
BASELINE_ACTOR_SEQUENCE

# Predicted Actor Sequence:
PREDICTED_ACTOR_SEQUENCE

# Decision Logic
- BETTER: the predicted sequence adheres to the principles more
  effectively, or the sequences tie, or you are not significantly certain
  it is worse.
- NOT_BETTER: clear inferiority (type breaks, missing parse for large
  schemas, missing selector for parallel branches) or efficiency violation
  (actors that do not contribute to success probability).

# Confidence Score Logic
- Score 0.0 to 1.0. A NOT_BETTER judgment requires confidence >= 0.3;
  below that, default the judgment to BETTER.

# Output Format
Reply with a valid JSON object only:
{"reasoning": "...", "judgment": "BETTER" or "NOT_BETTER",
 "confidence_score": float}"""


def _json_object(text: str) -> Optional[dict]:
    """First balanced ``{...}`` in ``text`` parsed as JSON (judge replies
    often wrap the object in prose or a code fence). Brace counting is
    JSON-string-aware: a '{' or '}' inside a quoted "reasoning" value must
    not unbalance the scan."""
    start = text.find("{")
    while start != -1:
        depth = 0
        in_string = False
        escaped = False
        for i in range(start, len(text)):
            ch = text[i]
            if in_string:
                if escaped:
                    escaped = False
                elif ch == "\\":
                    escaped = True
                elif ch == '"':
                    in_string = False
                continue
            if ch == '"':
                in_string = True
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    try:
                        return json.loads(text[start : i + 1])
                    except ValueError:
                        break
        start = text.find("{", start + 1)
    return None


def evaluate_by_llm(
    llm,
    input_prompt: str,
    baseline_seq,
    pred_seq,
) -> tuple[bool, float]:
    """Six-principle LLM judgment of ``pred_seq`` vs ``baseline_seq``.

    Returns ``(ok, score)`` with the reference's exact score mapping
    (app/evaluation_helper.py:337-352): BETTER -> 3 + 0.5*confidence,
    NOT_BETTER -> -0.5*confidence; a malformed reply AND any transport
    error both return ``(False, -0.5)`` (the reference's single except
    path). The rubric's uncertainty rule — a sub-0.3-confidence
    NOT_BETTER must be flipped to BETTER — is enforced where the
    reference enforces it: in the judge PROMPT (prompt line "you must
    default the judgment to BETTER"), not server-side, so a
    non-compliant reply is scored exactly as sent on both systems.
    """
    prompt = (
        LLM_JUDGE_TEMPLATE.replace("CRITERION", JUDGE_CRITERION)
        .replace("INPUT_PROMPT", str(input_prompt))
        .replace("BASELINE_ACTOR_SEQUENCE", str(baseline_seq))
        .replace("PREDICTED_ACTOR_SEQUENCE", str(pred_seq))
    )
    try:
        reply = llm.complete(prompt)
        parsed = _json_object(str(reply).strip())
        if not parsed:
            return False, -0.5
        judgment = parsed.get("judgment")
        raw_score = parsed.get("confidence_score")
        # validate the whole contract before converting anything: a missing
        # or non-numeric confidence is a MALFORMED reply (-0.5), not a
        # transport error (0.0)
        if judgment not in ("BETTER", "NOT_BETTER") or not isinstance(
            raw_score, (int, float)
        ) or isinstance(raw_score, bool):
            return False, -0.5
        score = float(raw_score)
        if judgment == "BETTER":
            return True, 3 + 0.5 * score
        return True, -0.5 * score
    except Exception:  # noqa: BLE001 — eval containment; the reference
        # scores ANY failure -0.5 (evaluation_helper.py:350-352)
        return False, -0.5


def pass_at_n(per_run_scores: Iterable[Iterable[float]]) -> float:
    """pass@n over n cloned runs: a row passes if ANY run scored nonzero
    (reference: reproduce/eval_utils.py:59-97)."""
    by_row = list(zip(*per_run_scores))
    if not by_row:
        return 0.0
    return sum(any(s for s in row) for row in by_row) / len(by_row)
