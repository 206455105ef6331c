"""Per-method stage actors: the named parsers, decomposers, and scalers of
the reference's method suites, plus the CHESS selector. The end-to-end
generators live in ``named.py`` / ``linkalign.py`` / ``opensearch.py``; these
are the standalone stages a WorkflowAgent composes.

Reference analogs (algorithm shape, not code):
  * DINSQLCoTParser     — /root/reference/core/actor/parser/DINSQLCoTParse.py:22-146
  * MACSQLCoTParser     — /root/reference/core/actor/parser/MACSQLCoTParse.py:18-171
  * CHESSSelectorParser — /root/reference/core/actor/parser/CHESSSelectorParse.py:21-314
                          (3-stage coarse-to-fine: column filter -> table select
                          -> column select)
  * RSLSQLBiDirParser   — /root/reference/core/actor/parser/RSLSQLBiDirParse.py:14-500
  * DINSQLDecomposer    — /root/reference/core/actor/decomposer/DINSQLDecompose.py:14-303
  * MACSQLDecomposer    — /root/reference/core/actor/decomposer/MACSQLDecompose.py:28-263
                          (BIRD-template (sub-question, sql) pairs)
  * RecursiveDecomposer — /root/reference/core/actor/decomposer/RecursiveDecompose.py:28-717
                          (stagewise DAG: per-table stage 0, merge stages after)
  * DINSQLScaler / MACSQLScaler / RSLSQLScaler / ChessScaler
                        — /root/reference/core/actor/scaler/*.py (merge EXTEND,
                          ChessScale.py:25-375: 4 diversified templates)
  * CHESSSelector       — /root/reference/core/actor/selector/CHESSSelect.py:28-449
                          (execution voting 79-107 + 20 LLM unit tests 109-177)
"""

from __future__ import annotations

import re

from squrve_spark import execution as X
from squrve_spark import profile as P
from squrve_spark.actors.base import ActorPool, MergeStrategy
from squrve_spark.actors.families import SparkActor
from squrve_spark.actors.named import group_by_equivalence, identifiers_in_sql
from squrve_spark.evaluate import parse_schema_links
from squrve_spark.llm import extract_sql

# ---------------------------------------------------------------------------
# Parsers


@ActorPool.register("parser")
class DINSQLCoTParser(SparkActor):
    """DIN-SQL schema-linking CoT: reason about question phrases, then emit
    the linked columns (plus any literal values) as a bracketed list."""

    NAME = "dinsqlcot"
    OUTPUT_NAME = "schema_links"
    SKILL = "DIN-SQL CoT schema linking: phrase-by-phrase reasoning, bracketed link list."

    PROMPT = (
        "Schema:\n{schema}\nQuestion: {question}\n"
        "For each phrase of the question, name the schema column it refers "
        "to, reasoning step by step. Finish with the full list as "
        "[table.column, ...] on the last line."
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        out = self.llm.complete(
            self.PROMPT.format(schema=schema, question=row.get("question", ""))
        )
        return {"schema_links": parse_schema_links(out)}


@ActorPool.register("parser")
class MACSQLCoTParser(SparkActor):
    """MAC-SQL Selector-style linking: rank each table's columns by lexical
    question overlap (deterministic), then one LLM pass confirms/extends the
    candidate links over the pruned rendering."""

    NAME = "macsqlcot"
    OUTPUT_NAME = "schema_links"
    SKILL = "MAC-SQL selector linking: lexical pruning then LLM confirmation."

    COLS_PER_TABLE = 6

    PROMPT = (
        "Pruned schema:\n{schema}\nQuestion: {question}\n"
        "Answer with the needed columns as [table.column, ...]."
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        q_toks = set(re.findall(r"[a-z0-9]+", (row.get("question") or "").lower()))
        lines, known = [], set()
        for table in self.tables_for(row):
            cols = P.table_columns(self.spark, table)

            def score(c):
                parts = [p for p in re.split(r"[_\W]+", c["name"].lower()) if p]
                return sum(p in q_toks for p in parts)

            ranked = sorted(cols, key=score, reverse=True)[: self.COLS_PER_TABLE]
            lines.append(
                f"### Table = {table}, columns = [{', '.join(c['name'] for c in ranked)}]"
            )
            known.update(f"{table}.{c['name']}" for c in cols)
        out = self.llm.complete(
            self.PROMPT.format(schema="\n".join(lines), question=row.get("question", ""))
        )
        return {"schema_links": [tc for tc in parse_schema_links(out) if tc in known]}


@ActorPool.register("parser")
class CHESSSelectorParser(SparkActor):
    """CHESS 3-stage coarse-to-fine linking: (1) per-table column filter —
    one LLM call per table keeps plausibly-relevant columns; (2) table
    select over the filtered survivors; (3) final column select restricted
    to the chosen tables."""

    NAME = "chessparse"
    OUTPUT_NAME = "schema_links"
    SKILL = "CHESS coarse-to-fine: per-table column filter, table select, column select."

    # Stage prompts carry the reference's documented frames
    # (CHESSPrompt.py:105 template_filter_column, :1324 template_select_tables,
    # :1360 template_select_columns): analyst/scientist role headers, the
    # Database Schema Overview / Question / Task sections, and the JSON
    # chain_of_thought_reasoning answer contracts. The filter stage batches
    # the reference's per-column relevance loop per TABLE (same decision,
    # one call per table instead of per column — documented adaptation).
    FILTER_PROMPT = (
        "You are a detail-oriented data scientist tasked with evaluating "
        "the relevance of database column information for answering "
        "specific SQL query question.\n\n"
        "Your goal is to assess whether each given column is pertinent to "
        "constructing an SQL query to address the question. A column is "
        '"relevant" if it aids in query formulation, or "irrelevant" if it '
        "does not.\n\n"
        "Procedure:\n"
        "1. Carefully examine the provided column details.\n"
        "2. Understand the question about the database.\n"
        "3. Decide if the column details are necessary for the SQL query "
        "based on your analysis.\n\n"
        "Column information:\n"
        "Table name: `{table}`\n"
        "Columns of THIS table: {cols}\n\n"
        "Question:\n{question}\n\n"
        "Please respond with a JSON object structured as follows:\n\n"
        "```json\n"
        "{{\n"
        '  "chain_of_thought_reasoning": "Your reasoning, concise and '
        'clear.",\n'
        '  "relevant_columns": ["column1", "column2", ...]\n'
        "}}\n"
        "```\n\n"
        "Only output a json as your response (or NONE when no column of "
        "this table is relevant)."
    )
    TABLE_PROMPT = (
        "You are an expert and very smart data analyst.\n"
        "Your task is to analyze the provided database schema, comprehend "
        "the posed question, and identify which tables are needed to "
        "generate a SQL query for answering the question.\n\n"
        "Database Schema Overview:\n{cands}\n\n"
        "This schema provides a detailed definition of the database's "
        "structure, including tables and their columns.\n\n"
        "Question:\n{question}\n\n"
        "Task:\n"
        "Based on the database schema and question provided, your task is "
        "to determine the tables that should be used in the SQL query "
        "formulation — the tables actually needed, all and only them. For "
        "each of the selected tables, explain why exactly it is necessary "
        "for answering the question.\n\n"
        "Please respond with a JSON object structured as follows:\n\n"
        "```json\n"
        "{{\n"
        '  "chain_of_thought_reasoning": "Explanation of the logical '
        'analysis that led to the selection of the tables.",\n'
        '  "table_names": ["Table1", "Table2", "Table3"]\n'
        "}}\n"
        "```\n\n"
        "Only output a json as your response."
    )
    COLUMN_PROMPT = (
        "You are an expert and very smart data analyst.\n"
        "Your task is to examine the provided database schema, understand "
        "the posed question, and pinpoint the specific columns within "
        "tables that are essential for crafting a SQL query to answer the "
        "question.\n\n"
        "Database Schema Overview:\n{cands}\n\n"
        "Question:\n{question}\n\n"
        "Task:\n"
        "Based on the database schema and question provided, your task is "
        "to identify all and only the final columns that are essential for "
        "crafting a SQL query to answer the question.\n\n"
        "Please respond with a JSON object structured as follows:\n\n"
        "```json\n"
        "{{\n"
        '  "chain_of_thought_reasoning": "Your reasoning for selecting the '
        'columns, be concise and clear.",\n'
        '  "table_name1": ["column1", "column2"],\n'
        '  "table_name2": ["column1"]\n'
        "}}\n"
        "```\n\n"
        "Make sure your response includes the table names as keys, each "
        "associated with a list of column names that are necessary for "
        "writing a SQL query to answer the question (equivalently, final "
        "columns as [table.column, ...] are accepted).\n"
        "Only output a json as your response."
    )

    @staticmethod
    def _json_list(text: str, key: str) -> list[str] | None:
        """Parse a '"key": [...]' JSON string list out of a (possibly
        fenced, possibly chatty) reply; None when absent/unparseable."""
        import json as _json

        m = re.search(rf'"{key}"\s*:\s*(\[[^\]]*\])', text, re.S)
        if not m:
            return None
        try:
            vals = _json.loads(m.group(1))
        except ValueError:
            return None
        return [str(v) for v in vals if isinstance(v, str)]

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        question = row.get("question", "")
        filtered: dict[str, list[str]] = {}
        for table in self.tables_for(row):
            cols = [c["name"] for c in P.table_columns(self.spark, table)]
            out = self.llm.complete(self.FILTER_PROMPT.format(
                table=table, cols=", ".join(cols), question=question
            ))
            # JSON contract first; plain-text column mentions as fallback
            listed = self._json_list(out, "relevant_columns")
            if listed is not None:
                keep = [c for c in cols if c in set(listed)]
            else:
                keep = [c for c in cols if re.search(rf"\b{re.escape(c)}\b", out)]
            if keep:
                filtered[table] = keep
        cands = "\n".join(f"{t}: {', '.join(cs)}" for t, cs in sorted(filtered.items()))
        t_out = self.llm.complete(self.TABLE_PROMPT.format(cands=cands, question=question))
        t_listed = self._json_list(t_out, "table_names")
        if t_listed is not None:
            chosen = [t for t in filtered if t in set(t_listed)] or list(filtered)
        else:
            chosen = [
                t for t in filtered if re.search(rf"\b{re.escape(t)}\b", t_out)
            ] or list(filtered)
        final_cands = "\n".join(f"{t}: {', '.join(filtered[t])}" for t in chosen)
        c_out = self.llm.complete(self.COLUMN_PROMPT.format(cands=final_cands, question=question))
        known = {f"{t}.{c}" for t in chosen for c in filtered[t]}
        # JSON per-table dict contract first, [table.column] extraction second
        links: list[str] = []
        for t in chosen:
            per_table = self._json_list(c_out, re.escape(t))
            if per_table:
                links.extend(f"{t}.{c}" for c in per_table if f"{t}.{c}" in known)
        if not links:
            links = [tc for tc in parse_schema_links(c_out) if tc in known]
        return {"schema_links": links or sorted(known)}


@ActorPool.register("parser")
class RSLSQLBiDirParser(SparkActor):
    """RSL-SQL bidirectional linking as a standalone parser: forward LLM
    column selection (top-15) merged with reverse extraction from a
    preliminary full-schema SQL, filtered against the catalog."""

    NAME = "rslsqlbidir"
    OUTPUT_NAME = "schema_links"
    SKILL = "RSL-SQL bidirectional linking: forward LLM select + reverse parse of a draft SQL."

    FORWARD_PROMPT = (
        "Schema:\n{schema}\nQuestion: {question}\n"
        "List the needed columns as [table.column, ...] (at most 15)."
    )
    DRAFT_PROMPT = "Schema:\n{schema}\nQuestion: {question}\nWrite ONE Spark SQL query. Return only SQL."

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        known = {
            f"{t}.{c['name']}"
            for t in self.tables_for(row)
            for c in P.table_columns(self.spark, t)
        }
        forward = [
            tc for tc in parse_schema_links(
                self.llm.complete(self.FORWARD_PROMPT.format(schema=schema, question=question))
            )
            if tc in known
        ][:15]
        draft = extract_sql(
            self.llm.complete(self.DRAFT_PROMPT.format(schema=schema, question=question))
        )
        reverse = identifiers_in_sql(draft, known)
        return {"schema_links": sorted(set(forward) | set(reverse)), "draft_sql": draft}


# ---------------------------------------------------------------------------
# Decomposers


@ActorPool.register("decomposer")
class DINSQLDecomposer(SparkActor):
    """DIN-SQL decomposition: sub-questions phrased for its NESTED prompt
    tier (numbered list, one clause-level step each)."""

    NAME = "dinsqldecomp"
    OUTPUT_NAME = "sub_questions"
    SKILL = "DIN-SQL: decompose into numbered clause-level sub-questions."

    PROMPT = (
        "Question: {question}\n"
        "Decompose into the numbered sub-questions a nested SQL would answer "
        "one per subquery."
    )

    def act(self, item: int, **kwargs) -> dict:
        out = self.llm.complete(self.PROMPT.format(question=self.row(item).get("question", "")))
        subs = [
            re.sub(r"^\s*\d+[.)]\s*", "", ln).strip()
            for ln in out.splitlines()
            if re.match(r"^\s*\d+[.)]", ln)
        ]
        return {"sub_questions": subs or [out.strip()]}


@ActorPool.register("decomposer")
class MACSQLDecomposer(SparkActor):
    """MAC-SQL decomposition: BIRD-template (sub-question, sql) pairs — the
    LLM answers each sub-question with its SQL; pairs are parsed from
    alternating 'Sub-question:'/'SQL:' blocks."""

    NAME = "macsqldecomp"
    OUTPUT_NAME = "sub_questions"
    SKILL = "MAC-SQL: (sub-question, SQL) pair decomposition."

    PROMPT = (
        "Schema:\n{schema}\nQuestion: {question}\n"
        "Decompose and solve stepwise. For each step output exactly:\n"
        "Sub-question: <text>\nSQL: <one-line SQL>"
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        out = self.llm.complete(self.PROMPT.format(schema=schema, question=row.get("question", "")))
        pairs = []
        current_q = None
        for ln in out.splitlines():
            m_q = re.match(r"\s*Sub-question:\s*(.+)", ln, re.IGNORECASE)
            m_s = re.match(r"\s*SQL:\s*(.+)", ln, re.IGNORECASE)
            if m_q:
                current_q = m_q.group(1).strip()
            elif m_s and current_q is not None:
                pairs.append({"question": current_q, "sql": extract_sql(m_s.group(1))})
                current_q = None
        result = {"sub_questions": pairs}
        if pairs:
            result["pred_sql"] = pairs[-1]["sql"]  # last pair is the full query
        return result


@ActorPool.register("decomposer")
class RecursiveDecomposer(SparkActor):
    """Recursive DAG decomposition: stage 0 holds one sub-question per
    relevant table, later stages pairwise-merge until one remains — the
    stage list mirrors RecursiveGenerate's merge tree."""

    NAME = "recursivedecomp"
    OUTPUT_NAME = "sub_questions"
    SKILL = "Recursive: per-table stage-0 sub-questions plus pairwise merge stages."

    TABLES_PROMPT = "Schema:\n{schema}\nQuestion: {question}\nList the tables needed, comma-separated."
    PER_TABLE_PROMPT = (
        "Question: {question}\nWhat does it need from table {table}? "
        "Answer with one short sub-question."
    )
    MERGE_PROMPT = (
        "Sub-question A: {a}\nSub-question B: {b}\n"
        "Phrase the single question their JOIN answers."
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        t_out = self.llm.complete(self.TABLES_PROMPT.format(schema=schema, question=question))
        known = set(self.tables_for(row))
        tables = [t.strip() for t in t_out.split(",") if t.strip() in known] or sorted(known)[:1]
        stage0 = [
            self.llm.complete(self.PER_TABLE_PROMPT.format(question=question, table=t)).strip()
            for t in tables
        ]
        stages = [list(stage0)]
        frontier = list(stage0)
        while len(frontier) > 1:
            merged = self.llm.complete(
                self.MERGE_PROMPT.format(a=frontier[0], b=frontier[1])
            ).strip()
            frontier = [merged] + frontier[2:]
            stages.append(list(frontier))
        return {"sub_questions": [q for stage in stages for q in stage], "stages": stages}


# ---------------------------------------------------------------------------
# Scalers (merge strategy EXTEND — candidates accumulate on pred_sql)


class _TemplateScaler(SparkActor):
    """Shared scaler core: one candidate per prompt template (diversified
    generation, the reference's per-method template sets)."""

    OUTPUT_NAME = "pred_sql"
    STRATEGY = MergeStrategy.EXTEND
    TEMPLATES: list[str] = []

    def __init__(self, *args, generate_num: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.generate_num = generate_num or len(self.TEMPLATES)

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        cands = []
        for i in range(self.generate_num):
            template = self.TEMPLATES[i % len(self.TEMPLATES)]
            sql = extract_sql(self.llm.complete(
                template.format(schema=schema, question=question)
            ))
            if sql and sql not in cands:
                cands.append(sql)
        return {"pred_sql": cands}


@ActorPool.register("scaler")
class DINSQLScaler(_TemplateScaler):
    """DIN-SQL scaling: one candidate per difficulty tier's prompt shape."""

    NAME = "dinsqlscale"
    SKILL = "DIN-SQL: one candidate per difficulty-tier prompt."

    TEMPLATES = [
        "Schema:\n{schema}\nQuestion: {question}\nWrite ONE simple Spark SQL query. Return only SQL.",
        "Schema:\n{schema}\nQuestion: {question}\nThink about the joins needed, then write ONE Spark SQL query. Return only SQL.",
        "Schema:\n{schema}\nQuestion: {question}\nSolve with a subquery if helpful; write ONE Spark SQL query. Return only SQL.",
    ]


@ActorPool.register("scaler")
class MACSQLScaler(_TemplateScaler):
    """MAC-SQL scaling: decompose-first vs direct generation variants."""

    NAME = "macsqlscale"
    SKILL = "MAC-SQL: decompose-first and direct candidates."

    TEMPLATES = [
        "Schema:\n{schema}\nQuestion: {question}\nDecompose into steps, then write the final Spark SQL. Return only SQL.",
        "Schema:\n{schema}\nQuestion: {question}\nWrite ONE Spark SQL query directly. Return only SQL.",
    ]


@ActorPool.register("scaler")
class RSLSQLScaler(_TemplateScaler):
    """RSL-SQL scaling: full-schema vs linked-slim-schema candidates (the
    slim rendering comes from the row's ``schema_links`` when a parser ran
    first, else the full DDL)."""

    NAME = "rslsqlscale"
    SKILL = "RSL-SQL: full-schema and slim-linked-schema candidates."

    TEMPLATES = [
        "Schema:\n{schema}\nQuestion: {question}\nWrite ONE Spark SQL query. Return only SQL.",
    ]

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        out = super().act(item, **kwargs)
        links = row.get("schema_links") or []
        if links:
            by_table: dict[str, list[str]] = {}
            for tc in links:
                if "." in tc:
                    t, c = tc.split(".", 1)
                    by_table.setdefault(t, []).append(c)
            slim = "\n".join(
                f"### Table = {t}, columns = [{', '.join(cs)}]"
                for t, cs in sorted(by_table.items())
            )
            sql = extract_sql(self.llm.complete(self.TEMPLATES[0].format(
                schema=slim, question=row.get("question", "")
            )))
            if sql and sql not in out["pred_sql"]:
                out["pred_sql"].append(sql)
        return out


@ActorPool.register("scaler")
class ChessScaler(_TemplateScaler):
    """CHESS scaling: the 4 diversified templates, ``generate_num`` split
    round-robin across them (ChessScale.py:25-375 shape)."""

    NAME = "chessscale"
    SKILL = "CHESS: 4 diversified prompt templates, round-robin split."

    TEMPLATES = [
        "Schema:\n{schema}\nQuestion: {question}\nWrite ONE Spark SQL query. Return only SQL.",
        "Schema:\n{schema}\nQuestion: {question}\nFirst restate the question precisely, then write ONE Spark SQL query. Return only SQL.",
        "Schema:\n{schema}\nQuestion: {question}\nPrefer CTEs; write ONE Spark SQL query. Return only SQL.",
        "Schema:\n{schema}\nQuestion: {question}\nDouble-check filters and joins; write ONE Spark SQL query. Return only SQL.",
    ]


# ---------------------------------------------------------------------------
# Optimizers — the named method variants are execution-feedback repair with
# method-specific prompts and round budgets (reference core/actor/optimizer/*:
# LinkAlign 395 LoC, DIN 254, MAC 227, CHESS 470, RSL 550, OpenSearch 223 —
# all the same execute->diagnose->LLM-rewrite control flow; AdaptiveOptimize
# additionally does meta-SQL decomposition, which squrve_spark.metasql keeps).

from squrve_spark.actors.families import ExecFeedbackOptimizer, MetaSQLOptimizer


@ActorPool.register("optimizer")
class LinkAlignOptimizer(ExecFeedbackOptimizer):
    NAME = "linkalignopt"
    SKILL = "LinkAlign repair: re-link the schema, then fix the SQL from execution feedback."
    PROMPT = (
        "SQL:\n{sql}\nProblem: {problem}\nRe-check the schema links first.\n"
        "Schema:\n{schema}\nQuestion: {question}\nReturn the corrected SQL only."
    )

    def __init__(self, *args, max_round: int = 2, **kwargs):  # debug_turn_n=2
        super().__init__(*args, max_round=max_round, **kwargs)


@ActorPool.register("optimizer")
class DINSQLOptimizer(ExecFeedbackOptimizer):
    NAME = "dinsqlopt"
    SKILL = "DIN-SQL self-correction: LLM-only bug check plus execution-feedback repair."
    PROMPT = (
        "SQL:\n{sql}\nProblem: {problem}\nCheck clause by clause for bugs.\n"
        "Schema:\n{schema}\nQuestion: {question}\nReturn the corrected SQL only."
    )


@ActorPool.register("optimizer")
class MACSQLOptimizer(ExecFeedbackOptimizer):
    NAME = "macsqlopt"
    SKILL = "MAC-SQL Refiner: execute-and-fix up to MAX_ROUND times."

    def __init__(self, *args, max_round: int = 3, **kwargs):  # MAX_ROUND=3
        super().__init__(*args, max_round=max_round, **kwargs)


@ActorPool.register("optimizer")
class CHESSOptimizer(ExecFeedbackOptimizer):
    NAME = "chessopt"
    SKILL = "CHESS revise: repair SQL that fails execution or its unit-test evidence."
    PROMPT = (
        "SQL:\n{sql}\nProblem: {problem}\nRevise so the result answers the "
        "question.\nSchema:\n{schema}\nQuestion: {question}\nReturn the revised SQL only."
    )


@ActorPool.register("optimizer")
class RSLSQLOptimizer(ExecFeedbackOptimizer):
    NAME = "rslsqlopt"
    SKILL = "RSL-SQL correction: repair errors and suspicious empty results."
    PROMPT = (
        "SQL:\n{sql}\nProblem: {problem}\nIf the filters look wrong, fix them.\n"
        "Schema:\n{schema}\nQuestion: {question}\nReturn the corrected SQL only."
    )


@ActorPool.register("optimizer")
class OpenSearchSQLOptimizer(ExecFeedbackOptimizer):
    NAME = "opensearchopt"
    SKILL = "OpenSearch-SQL repair: fix SQL from execution feedback; keep CAST-DOUBLE division."
    PROMPT = (
        "SQL:\n{sql}\nProblem: {problem}\nKeep integer divisions CAST AS DOUBLE.\n"
        "Schema:\n{schema}\nQuestion: {question}\nReturn the corrected SQL only."
    )


@ActorPool.register("optimizer")
class AdaptiveOptimizer(MetaSQLOptimizer):
    """Name alias: AdaptiveOptimize's meta-SQL decomposition repair IS the
    MetaSQLOptimizer (AdaptiveOptimize.py:100-230)."""

    NAME = "adaptive"


# ---------------------------------------------------------------------------
# CHESS selector


@ActorPool.register("selector")
class CHESSSelector(SparkActor):
    """CHESS selection: execution self-consistency votes PLUS LLM unit
    tests — ``n_tests`` NL tests are generated once, each candidate is
    judged against each test with its execution preview as evidence; score =
    consensus-group size + tests passed; highest score (earliest on ties)
    wins. Reference default is 20 tests/candidate (CHESSSelect.py:25)."""

    NAME = "chessselect"
    OUTPUT_NAME = "pred_sql"
    SKILL = "CHESS: execution voting + LLM unit-test scoring over candidates."

    TESTS_PROMPT = (
        "Question: {question}\nWrite {n} short unit tests (one per line) that "
        "a correct SQL answer must satisfy."
    )
    JUDGE_PROMPT = (
        "Unit test: {test}\nSQL: {sql}\nExecution preview:\n{preview}\n"
        "Does the SQL satisfy the test? Answer PASS or FAIL."
    )

    def __init__(self, *args, n_tests: int = 20, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_tests = n_tests

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        cands = row.get("pred_sql") or kwargs.get("pred_sql") or []
        if isinstance(cands, str):
            cands = [cands]
        if not cands:
            return {"pred_sql": ""}
        if len(cands) == 1:
            return {"pred_sql": cands[0]}
        question = row.get("question", "")
        results = [X.execute(self.spark, sql, row_cap=1000) for sql in cands]
        groups = group_by_equivalence([r.df for r in results])
        votes = {i: len(g) for g in groups if results[g[0]].df is not None for i in g}
        tests = [
            ln.strip("-• \t")
            for ln in self.llm.complete(
                self.TESTS_PROMPT.format(question=question, n=self.n_tests)
            ).splitlines()
            if ln.strip()
        ][: self.n_tests]
        scores = []
        for i, sql in enumerate(cands):
            preview = X.execute_sql(self.spark, sql, max_rows=5, max_chars=500)
            passed = sum(
                "PASS" in self.llm.complete(
                    self.JUDGE_PROMPT.format(test=t, sql=sql, preview=preview)
                ).upper()
                for t in tests
            )
            scores.append(votes.get(i, 0) + passed)
        best = max(range(len(cands)), key=lambda i: (scores[i], -i))
        return {"pred_sql": cands[best], "score": scores[best]}
