"""OpenSearch-SQL method actors: profiling-enriched CoT parsing, embedding
value retrieval, CAST-aware candidate generation with align-and-vote, and
self-consistency selection.

Reference analogs (algorithm shape, not code):
  * OpenSearchCoTParser    — /root/reference/core/actor/parser/OpenSearchCoTParse.py:18-505
                             (PRAGMA table_info 152-154, null/dup profiling 155-162,
                             LIMIT-1 + 3 sample values 182-199, table list 240-244)
  * OpenSearchSQLGenerator — /root/reference/core/actor/generator/OpenSearchSQLGenerate.py:1249-1664
                             (question-style parse, CAST-REAL rules in prompts
                             1251-1350, align & vote 1225-1247)
  * OpenSearchSQLScaler    — /root/reference/core/actor/scaler/OpenSearchSQLScale.py:341-440,625-735
                             (value retrieval `get_key_col_des`: topk=10, threshold 0.65)
  * OpenSearchSQLSelector  — /root/reference/core/actor/selector/OpenSearchSQLSelect.py:12-128
                             (execution self-consistency vote)

Profiling comes from the Spark catalog + one-pass aggregates
(squrve_spark.profile — never a full collect); value retrieval uses the
feature-hashed cosine of squrve_spark.index over catalog-sampled values.
"""

from __future__ import annotations

import re

import numpy as np

from squrve_spark import compare as C
from squrve_spark import execution as X
from squrve_spark import profile as P
from squrve_spark.actors.base import ActorPool, MergeStrategy
from squrve_spark.actors.families import SparkActor
from squrve_spark.actors.named import group_by_equivalence
from squrve_spark.evaluate import parse_schema_links
from squrve_spark.index import _features_stable
from squrve_spark.llm import extract_sql

VALUE_TOPK = 10  # OpenSearchSQLScale.py:630
VALUE_THRESHOLD = 0.65


def retrieve_values(
    spark,
    tables: list[str],
    query_text: str,
    topk: int = VALUE_TOPK,
    threshold: float = VALUE_THRESHOLD,
    sample_k: int = 5,
    dim: int = 256,
) -> list[dict]:
    """``get_key_col_des`` analog: embed sampled string values per column
    (feature-hashed unit vectors), rank by cosine vs the question, keep hits
    with score >= threshold, top-k overall. Sampling is a per-column
    ``distinct().limit(k)`` — bounded work, no full scans."""
    docs: list[tuple[str, str, str]] = []  # (table, column, value)
    for table in tables:
        df = spark.table(table)
        for col in P.table_columns(spark, table):
            if not col["type"].startswith(("string", "varchar", "char")):
                continue
            try:
                vals = P.sample_values(df, col["name"], sample_k)
            except Exception:
                continue
            docs.extend((table, col["name"], str(v)) for v in vals if v is not None)
    if not docs:
        return []
    mat = np.stack([_features_stable(f"{t} {c} {v}", dim) for t, c, v in docs])
    q = _features_stable(query_text, dim)
    sims = mat @ q
    order = np.argsort(-sims, kind="stable")[:topk]
    return [
        {"table": docs[i][0], "column": docs[i][1], "value": docs[i][2],
         "score": round(float(sims[i]), 6)}
        for i in order
        if sims[i] >= threshold
    ]


def render_value_hits(hits: list[dict]) -> str:
    return "\n".join(f"{h['table']}.{h['column']} = {h['value']!r}" for h in hits)


@ActorPool.register("parser")
class OpenSearchCoTParser(SparkActor):
    """CoT schema linking enriched with DB profiling: per-table column
    metadata (catalog), one-pass null/distinct profile, and 3 sample values
    per column feed the linking prompt; the LLM answers with reasoning then
    a bracketed link list."""

    NAME = "opensearchcot"
    OUTPUT_NAME = "schema_links"
    SKILL = "CoT schema linking with catalog metadata, null/distinct profile, and sampled values."

    PROFILE_ROW_CAP = 200_000  # profile aggregates are cheap; cap anyway at scale

    PROMPT = (
        "Database profile:\n{profile}\nQuestion: {question}\n"
        "Reason step by step about which columns the question needs, then "
        "answer with [table.column, ...] on the last line."
    )

    def __init__(self, *args, profile_nulls: bool = True, sample_k: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.profile_nulls = profile_nulls
        self.sample_k = sample_k

    def rendered_profile(self, row: dict) -> str:
        lines = []
        for table in self.tables_for(row):
            df = self.spark.table(table)
            cols = P.table_columns(self.spark, table)
            stats: dict[str, tuple[int, int]] = {}
            if self.profile_nulls:
                prof = P.profile_table(df.limit(self.PROFILE_ROW_CAP), exact_distinct=True)
                stats = {
                    r["column"]: (int(r["n_null"]), int(r["n_distinct"]))
                    for r in prof.collect()
                }
            lines.append(f"# table {table}")
            for c in cols:
                try:
                    samples = P.sample_values(df, c["name"], self.sample_k)
                except Exception:
                    samples = []
                extra = ""
                if c["name"] in stats:
                    n_null, n_dist = stats[c["name"]]
                    extra = f", nulls={n_null}, distinct={n_dist}"
                lines.append(
                    f"  {c['name']} {c['type']}{extra}, samples={samples!r}"
                )
        return "\n".join(lines)

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        profile = self.rendered_profile(row)
        out = self.llm.complete(
            self.PROMPT.format(profile=profile, question=row.get("question", ""))
        )
        known = {
            f"{t}.{c['name']}"
            for t in self.tables_for(row)
            for c in P.table_columns(self.spark, t)
        }
        links = [tc for tc in parse_schema_links(out) if tc in known]
        return {"schema_links": links}


@ActorPool.register("scaler")
class OpenSearchSQLScaler(SparkActor):
    """Candidate fan-out with value evidence: retrieve question-relevant
    column values (top-10, threshold 0.65), then generate ``generate_num``
    candidates whose prompts carry the value hits (merge strategy EXTEND)."""

    NAME = "opensearchscale"
    OUTPUT_NAME = "pred_sql"
    STRATEGY = MergeStrategy.EXTEND
    SKILL = "Generate candidates with embedding-retrieved column-value evidence in the prompt."

    PROMPT = (
        "Schema:\n{schema}\nRelevant column values:\n{values}\n"
        "Question: {question}\nWrite ONE Spark SQL query (variant {i}). "
        "When dividing integers, CAST the numerator AS DOUBLE. Return only SQL."
    )

    def __init__(self, *args, generate_num: int = 3, topk: int = VALUE_TOPK,
                 threshold: float = VALUE_THRESHOLD, **kwargs):
        super().__init__(*args, **kwargs)
        self.generate_num = generate_num
        self.topk = topk
        self.threshold = threshold

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        hits = retrieve_values(
            self.spark, self.tables_for(row), question,
            topk=self.topk, threshold=self.threshold,
        )
        row["value_hits"] = hits
        values = render_value_hits(hits) or "(none)"
        cands = []
        for i in range(self.generate_num):
            sql = extract_sql(self.llm.complete(self.PROMPT.format(
                schema=schema, values=values, question=question, i=i + 1
            )))
            if sql and sql not in cands:
                cands.append(sql)
        return {"pred_sql": cands}


@ActorPool.register("generator")
class OpenSearchSQLGenerator(SparkActor):
    """Full OpenSearch-SQL generation: question-style parse (the reference's
    query-type classification) -> value retrieval -> N candidates with the
    CAST-REAL division rule -> align (normalize trivial formatting) ->
    execution self-consistency vote."""

    NAME = "opensearchsql"
    OUTPUT_NAME = "pred_sql"
    SKILL = "OpenSearch-SQL: style parse, value retrieval, CAST-aware candidates, align & vote."

    N_CANDIDATES = 3

    STYLE_PROMPT = (
        "Question: {question}\n"
        "Classify its answer style as one of COUNT, LIST, COMPARE, AGGREGATE, "
        "OTHER. Answer with the label only."
    )
    # carries the reference TMP_PROMPT frame (OpenSearchSQLGenerate.py:
    # 110-141): expert header, schema + #values evidence blocks, the two
    # numbered attention rules (integer division cast — REAL there,
    # DOUBLE here — and ignore-unneeded-#values), the SQL-like rewrite
    # instruction, and the structured #reason/#columns/#values/#SELECT/
    # #SQL-like/#SQL answer format (extract_sql reads the #SQL line).
    GEN_PROMPT = (
        "You are an SQL expert, and now I would like you to write SQL "
        "based on the question.\n"
        "/* Database schema */\n{schema}\n"
        "#values in db:\n{values}\n"
        "/* Based on the database schema and the question, pay attention "
        "to the following */\n"
        "1. For parts involving division that contain integer types, CAST "
        "them to DOUBLE.\n"
        "2. #values in db display part values from the database. Please "
        "ignore the unnecessary values.\n"
        'Please rewrite the question to SQL-like query in the format: '
        '"Show #SELECT (table.column), WHERE condition are xxx (refer to '
        '#values), Group by/Order By (refer to columns).\n'
        "/* Answer the following: {question} ({style} style, attempt {i}) */\n"
        "Please answer the question in the following format without any "
        "other content:\n"
        "```\n"
        "#reason: Analyze how to generate SQL based on the question.\n"
        "#columns: All columns ultimately used in SQL\n"
        "#values: the filter in SQL\n"
        "#SELECT: SELECT content\n"
        "#SQL-like: SQL-like statements ignoring Join conditions\n"
        "#SQL: SQL\n"
        "```\n"
    )

    @staticmethod
    def align(sql: str) -> str:
        """Alignment pass (delegates to the shared normalizer) so
        textually-equivalent candidates vote together."""
        from squrve_spark.llm import normalize_sql

        return normalize_sql(sql)

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        style = self.llm.complete(self.STYLE_PROMPT.format(question=question)).strip().upper()
        style = style if style in {"COUNT", "LIST", "COMPARE", "AGGREGATE"} else "OTHER"
        hits = retrieve_values(self.spark, self.tables_for(row), question)
        values = render_value_hits(hits) or "(none)"
        cands, dfs = [], []
        for i in range(self.N_CANDIDATES):
            sql = self.align(extract_sql(self.llm.complete(self.GEN_PROMPT.format(
                schema=schema, values=values, style=style, question=question, i=i + 1
            ))))
            cands.append(sql)
            dfs.append(X.execute(self.spark, sql, row_cap=1000).df)
        groups = group_by_equivalence(dfs)
        viable = [g for g in groups if dfs[g[0]] is not None] or groups
        best = max(viable, key=len)
        return {"pred_sql": cands[best[0]], "votes": len(best), "style": style}


@ActorPool.register("selector")
class OpenSearchSQLSelector(SparkActor):
    """Self-consistency vote over existing candidates: execute all, group by
    result equivalence, return the first member of the largest viable group
    (vs FastExec's fastest-member rule — OpenSearch keeps arrival order)."""

    NAME = "opensearchselect"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Pick the first candidate of the largest execution-consensus group."

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        cands = row.get("pred_sql") or kwargs.get("pred_sql") or []
        if isinstance(cands, str):
            cands = [cands]
        if not cands:
            return {"pred_sql": ""}
        if len(cands) == 1:
            return {"pred_sql": cands[0]}
        dfs = [X.execute(self.spark, sql, row_cap=1000).df for sql in cands]
        groups = group_by_equivalence(dfs)
        viable = [g for g in groups if dfs[g[0]] is not None] or groups
        best = max(viable, key=lambda g: (len(g), -g[0]))  # ties: earliest candidate
        return {"pred_sql": cands[best[0]], "votes": len(best)}
