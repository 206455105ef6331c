"""LinkAlign method actors: iterative-retrieval schema reduction, sliced
schema-linking parse, and the reduce->link->classify->generate->debug
generation pipeline.

Reference analogs (algorithm shape, not code):
  * LinkAlignReducer   — /root/reference/core/actor/reducer/LinkAlignReduce.py:22-367
                         (params 28-91, auto-scaling tables 94-120: top-k 40-80 and
                         2-10 retrieval turns by db_size, reserve_size 80)
  * LinkAlignParser    — /root/reference/core/actor/parser/LinkAlignParse.py:24-149
                         (pipeline vs multi-agent debate modes) and the slicing
                         decorator core/actor/parser/BaseParse.py:160-217
                         (500 columns/slice, 5 worker threads)
  * LinkAlignGenerator — /root/reference/core/actor/generator/LinkAlignGenerate.py:25-389
                         with the feedback debug loop of
                         core/actor/generator/sql_debug.py:67-117 (debug_turn_n=2)

Retrieval runs on the feature-hashed column index (squrve_spark.index); all
SQL execution goes through squrve_spark.execution (row caps, job-group
timeouts). LLM calls go through the mockable ``LLMClient``.
"""

from __future__ import annotations

import math
import os
import re
from concurrent.futures import ThreadPoolExecutor

from squrve_spark import execution as X
from squrve_spark.actors.base import ActorPool, MergeStrategy
from squrve_spark.actors.families import SparkActor
from squrve_spark.data import central_schema_from_catalog, central_to_parallel, render_schema_ddl
from squrve_spark.evaluate import parse_schema_links
from squrve_spark.index import ColumnIndex
from squrve_spark.llm import extract_sql


@ActorPool.register("reducer")
class LinkAlignReducer(SparkActor):
    """Iterative vector retrieval with LLM filter rounds: each turn retrieves
    the next ``turn_k`` unseen columns by cosine, an optional LLM round keeps
    a fraction that decays exponentially per turn, and accumulation stops at
    ``reserve_size``. Turn count and per-turn k auto-scale with schema size
    (the reference's db_size tables). A deterministic post-retrieval pass
    force-keeps columns literally named in the question."""

    NAME = "linkalign"
    OUTPUT_NAME = "instance_schemas"
    STRATEGY = MergeStrategy.OVERWRITE
    SKILL = (
        "Reduce a large schema by iterative vector retrieval + LLM filtering "
        "with exponential retention decay."
    )

    FILTER_PROMPT = (
        "Question: {question}\nCandidate schema columns:\n{cands}\n"
        "List ONLY the columns plausibly needed, as [table.column, ...]."
    )

    def __init__(self, *args, reserve_size: int = 80, decay: float = 0.7,
                 llm_filter: bool = True, encode_fn=None,
                 encoder_name: str | None = None, encoder_dim: int = 256,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.reserve_size = reserve_size
        self.decay = decay
        self.llm_filter = llm_filter
        # pluggable embedding model (reference: Config.embed_model_name ->
        # bge-large; here any list[str] -> (n, dim) callable, e.g.
        # index.ngram_projection_encoder). Flows through build_or_load so
        # persisted stores are keyed per encoder and never cross-served.
        self.encode_fn = encode_fn
        self.encoder_name = encoder_name
        self.encoder_dim = encoder_dim
        self._index_cache: dict = {}

    @staticmethod
    def auto_scale(n_cols: int) -> tuple[int, int]:
        """(turns, per-turn k) from schema size — the reference's piecewise
        db_size table, rendered as clamped log scaling: 2-10 turns, k 40-80."""
        turns = max(2, min(10, int(math.log2(max(n_cols, 2)))))
        per_turn = max(40, min(80, n_cols // turns or 40))
        return turns, per_turn

    def _index(self, row: dict) -> ColumnIndex:
        tables = tuple(self.tables_for(row))
        key = (row.get("db_id", "default"), tables)
        if key not in self._index_cache:
            store = os.environ.get("SQURVE_INDEX_STORE")
            if store:
                # persisted warm path (reference keeps per-db stores on disk)
                self._index_cache[key] = ColumnIndex.build_or_load(
                    self.spark, list(tables), store, db_id=key[0],
                    dim=self.encoder_dim, encode_fn=self.encode_fn,
                    encoder_name=self.encoder_name,
                )
            else:
                self._index_cache[key] = ColumnIndex.build(
                    self.spark, list(tables), key[0],
                    dim=self.encoder_dim, encode_fn=self.encode_fn,
                    encoder_name=self.encoder_name,
                )
        return self._index_cache[key]

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        question = row.get("question", "")
        index = self._index(row)
        n = len(index.entries)
        row["schema_size"] = n
        turns, per_turn = self.auto_scale(n)

        kept: list[dict] = []
        kept_keys: set[str] = set()
        seen = 0
        for turn in range(turns):
            if len(kept) >= self.reserve_size or seen >= n:
                break
            batch = index.retrieve(question, k=seen + per_turn)[seen:]
            seen += len(batch)
            if not batch:
                break
            if self.llm_filter and self.llm is not None:
                cands = "\n".join(f"{c['table_name']}.{c['column_name']}" for c in batch)
                out = self.llm.complete(self.FILTER_PROMPT.format(question=question, cands=cands))
                wanted = set(parse_schema_links(out))
                retained = [
                    c for c in batch if f"{c['table_name']}.{c['column_name']}" in wanted
                ]
                # exponential retention decay: later turns may keep at most
                # ceil(|batch| * decay^turn) columns even if the LLM is greedy
                cap = max(1, math.ceil(len(batch) * (self.decay ** turn)))
                retained = retained[:cap]
            else:
                retained = batch[: max(1, math.ceil(len(batch) * (self.decay ** turn)))]
            for c in retained:
                key = f"{c['table_name']}.{c['column_name']}"
                if key not in kept_keys:
                    kept_keys.add(key)
                    kept.append(c)
        # post-retrieval: columns named verbatim in the question always survive
        q_toks = set(re.findall(r"[a-z0-9_]+", question.lower()))
        for c in index.entries:
            key = f"{c['table_name']}.{c['column_name']}"
            if key not in kept_keys and c["column_name"].lower() in q_toks:
                kept_keys.add(key)
                kept.append(c)
        kept = kept[: self.reserve_size]
        row["reduced_size"] = len(kept)
        links = [f"{c['table_name']}.{c['column_name']}" for c in kept]
        return {"instance_schemas": links, "schema_ddl": render_schema_ddl(kept)}


@ActorPool.register("parser")
class LinkAlignParser(SparkActor):
    """Schema linking in the reference's two modes — ``pipeline`` (single
    LLM pass) and ``debate`` (proposer pass + critic pass that may add or
    drop links) — with ``parallel_slice_parse``: schemas wider than
    ``slice_size`` columns are split into slices parsed concurrently on
    ``slice_workers`` threads and merged (BaseParse.py:160-217 semantics)."""

    NAME = "linkalign"
    OUTPUT_NAME = "schema_links"
    SKILL = "Link schema elements (pipeline or debate mode); slices >500-col schemas across threads."

    SLICE_SIZE = 500
    SLICE_WORKERS = 5

    PARSE_PROMPT = (
        "Schema:\n{schema}\nQuestion: {question}\n"
        "List the schema elements needed as [table.column, ...]."
    )
    DEBATE_PROMPT = (
        "Schema:\n{schema}\nQuestion: {question}\n"
        "A first pass proposed these links: {links}\n"
        "Criticize: return the corrected full list as [table.column, ...]."
    )

    def __init__(self, *args, mode: str = "pipeline", slice_size: int = SLICE_SIZE,
                 slice_workers: int = SLICE_WORKERS, **kwargs):
        super().__init__(*args, **kwargs)
        self.mode = mode
        self.slice_size = slice_size
        self.slice_workers = slice_workers

    def _columns(self, row: dict) -> list[dict]:
        central = central_schema_from_catalog(
            self.spark, row.get("db_id", "default"), self.tables_for(row)
        )
        return central_to_parallel(central)

    def _parse_slice(self, cols: list[dict], question: str, known: set[str]) -> list[str]:
        out = self.llm.complete(
            self.PARSE_PROMPT.format(schema=render_schema_ddl(cols), question=question)
        )
        return [tc for tc in parse_schema_links(out) if tc in known]

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        question = row.get("question", "")
        cols = self._columns(row)
        known = {f"{c['table_name']}.{c['column_name']}" for c in cols}
        if len(cols) > self.slice_size:
            slices = [
                cols[i : i + self.slice_size] for i in range(0, len(cols), self.slice_size)
            ]
            with ThreadPoolExecutor(max_workers=self.slice_workers) as pool:
                parts = list(
                    pool.map(lambda s: self._parse_slice(s, question, known), slices)
                )
            links = sorted({tc for part in parts for tc in part})
        else:
            links = self._parse_slice(cols, question, known)
        if self.mode == "debate":
            out = self.llm.complete(self.DEBATE_PROMPT.format(
                schema=render_schema_ddl(cols), question=question, links=links
            ))
            revised = [tc for tc in parse_schema_links(out) if tc in known]
            links = revised or links
        return {"schema_links": links}


@ActorPool.register("generator")
class LinkAlignGenerator(SparkActor):
    """Full LinkAlign generation pipeline: reduce (iterative retrieval) ->
    link (parse over the reduced DDL) -> classify (simple vs nested) ->
    tier prompt -> execution-feedback debug loop (``debug_turn_n`` rounds on
    Spark error text)."""

    NAME = "linkalign"
    OUTPUT_NAME = "pred_sql"
    SKILL = "LinkAlign: retrieve-reduce schema, link, classify, generate, debug on execution errors."

    # classification + nested-tier frames carry the reference's documented
    # sections (LinkAlignGenerate.py:145-162 classification_prompt_maker,
    # 205-231 the [Instructions] block with its 7 numbered requirements);
    # the classifier additionally answers SIMPLE-or-NESTED (this engine
    # keeps a simple tier where the reference treats every question as
    # NESTED) and its `questions = [...]` breakdown feeds the nested tier
    # as the reference's sub_questions step line.
    CLASSIFY_PROMPT = (
        "# [Instruction]\n"
        "For the given question, classify it as NESTED. \n"
        "Break down the problem into sub-problems and list them in the "
        "`List` format: questions = [q1,q2,q3..], e.g. questions = "
        "['Which courses have prerequisite?']\n"
        "If no subquery or set operation is needed, answer SIMPLE instead.\n"
        "Question: {question}\n"
        "schema_links: {links}\n"
        "A: Let's think step by step."
    )
    SIMPLE_PROMPT = (
        "Schema:\n{schema}\nSchema links: {links}\nQuestion: {question}\n"
        "Write ONE Spark SQL query. Return only SQL."
    )
    NESTED_PROMPT = (
        "[Instructions]\n"
        "Use the intermediate representation, schema links, and the "
        "provided prior knowledge (including field and table information) "
        "to generate the correct SQL queries for each question. The SQL "
        "queries must be syntactically correct and logically aligned with "
        "the requirements of the question. \n"
        "You need to follow below requirements:\n"
        "1. Understand the question: Carefully analyze the question to "
        "identify the relevant data and the required result.\n"
        "2. Consult the schema: Use the schema links provided to identify "
        "the tables, fields, and relationships (including foreign keys "
        "and primary keys) necessary to answer the question.\n"
        "3. Leverage prior knowledge: Utilize any domain-specific "
        "knowledge, field names, table relationships, and query logic to "
        "craft an accurate SQL query.\n"
        "4. Use intermediate representations: Where applicable, break "
        "down the query into logical components such as CTEs (Common "
        "Table Expressions), subqueries, and joins.\n"
        "5. Adhere to DBMS syntax: Ensure that the SQL queries comply "
        "with the syntax specifications of Spark SQL.\n"
        "6. Correct complex queries: For complex queries, use appropriate "
        "techniques (e.g., CTEs, subqueries) to avoid errors and improve "
        "readability.\n"
        "7. Return only the SQL query: Provide the final, corrected SQL "
        "query without any explanations.\n\n"
        "### [Question]: {question}\n"
        "### [Provided Database Schema]:\n{schema}\n"
        "Schema links: {links}\n"
        "Let's think step by step. Question can be solved by knowing the "
        'answer to the following sub-question "{sub_questions}".'
    )
    DEBUG_PROMPT = (
        "The SQL:\n{sql}\nfailed with error:\n{error}\n"
        "Schema:\n{schema}\nQuestion: {question}\nReturn the fixed SQL only."
    )

    def __init__(self, *args, debug_turn_n: int = 2, reducer: LinkAlignReducer | None = None,
                 parser: LinkAlignParser | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.debug_turn_n = debug_turn_n
        self.reducer = reducer
        self.parser = parser

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        question = row.get("question", "")
        reducer = self.reducer or LinkAlignReducer(
            dataset=self.dataset, spark=self.spark, llm=self.llm
        )
        reduced = reducer.act(item)
        schema = reduced["schema_ddl"]
        parser = self.parser or LinkAlignParser(
            dataset=self.dataset, spark=self.spark, llm=self.llm
        )
        links = parser.act(item).get("schema_links") or reduced["instance_schemas"]
        reply = self.llm.complete(
            self.CLASSIFY_PROMPT.format(question=question, links=links)
        )
        # CoT replies mention both labels while reasoning ("it is not
        # NESTED ... answer SIMPLE") — prefer an explicit Label: line,
        # else the LAST label word; default NESTED (the reference treats
        # every question as nested)
        lm = re.search(r'Label:\s*"?([A-Z-]+)"?', reply, re.IGNORECASE)
        if lm:
            nested = "NESTED" in lm.group(1).upper()
        else:
            words = re.findall(r"\b(SIMPLE|NESTED)\b", reply.upper())
            nested = words[-1] == "NESTED" if words else True
        m = re.search(r"questions\s*=\s*\[(.*?)\]", reply, re.DOTALL)
        sub_questions = (m.group(1).strip() if m else "") or question
        if nested:
            body = self.NESTED_PROMPT.format(
                schema=schema, links=links, question=question,
                sub_questions=sub_questions,
            )
        else:
            body = self.SIMPLE_PROMPT.format(
                schema=schema, links=links, question=question
            )
        # external evidence (add_external) precedes the schema, as in the
        # reference's evidence-bearing generation prompts
        sql = extract_sql(self.llm.complete(self.external_note(row) + body))
        debug_rounds = 0
        for _ in range(self.debug_turn_n):
            res = X.execute(self.spark, sql, row_cap=10)
            if res.error is None:
                break
            debug_rounds += 1
            sql = extract_sql(self.llm.complete(self.DEBUG_PROMPT.format(
                sql=sql, error=res.error, schema=schema, question=question
            )))
        return {
            "pred_sql": sql,
            "schema_links": links,
            "difficulty": "NESTED" if nested else "SIMPLE",
            "debug_rounds": debug_rounds,
        }
