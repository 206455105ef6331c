"""The seven actor families (reduce / parse / generate / decompose / scale /
optimize / select) + workflow agents, Spark-backed and LLM-mockable.

Reference analog: the 38 concrete actors under /root/reference/core/actor/*.
Each family here ships (a) a deterministic variant exercising the Spark
surface (catalog, execution, comparator) with no LLM, and (b) an LLM variant
implementing the family's canonical algorithm — schema-linking prompts,
execution-feedback repair (sql_debug.py:67-117 semantics), consensus
selection (FastExecSelect.py:48-192 semantics) — against the swappable
``squrve_spark.llm.LLMClient``.

Everything data-touching is a Spark op: schema comes from the catalog,
execution goes through ``squrve_spark.execution`` (row-capped, job-group
timeouts), result grouping uses the EX comparator.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import SparkSession

from squrve_spark import compare as C
from squrve_spark import execution as X
from squrve_spark import profile as P
from squrve_spark.actors.base import Actor, ActorPool, MergeStrategy
from squrve_spark.data import central_schema_from_catalog, central_to_parallel, render_schema_ddl
from squrve_spark.llm import LLMClient, extract_sql


class SparkActor(Actor):
    """Shared plumbing: a SparkSession + optional LLM client."""

    def __init__(self, dataset=None, spark: Optional[SparkSession] = None,
                 llm: Optional[LLMClient] = None, **kwargs):
        super().__init__(dataset=dataset, **kwargs)
        self.spark = spark
        self.llm = llm

    def row(self, item: int) -> dict:
        return self.dataset[item]

    def tables_for(self, row: dict) -> list[str]:
        tables = row.get("tables")
        if tables:
            return tables
        return P.list_tables(self.spark)

    def schema_ddl(self, row: dict) -> str:
        central = central_schema_from_catalog(
            self.spark, row.get("db_id", "default"), self.tables_for(row)
        )
        return render_schema_ddl(central_to_parallel(central))

    def external_note(self, row: dict) -> str:
        """Prompt block for the row's external knowledge (summarized by
        ``squrve_spark.external.add_external``), '' when absent — every
        reference generator consumes this evidence when a benchmark ships
        it (SURVEY §2 B.1 ``add_external``)."""
        from squrve_spark.external import external_text

        ext = external_text(row)
        return f"\nExternal knowledge:\n{ext}\n" if ext else ""


# ---------------------------------------------------------------------------
# Reducers — prune schema to fit LLM context


@ActorPool.register("reducer")
class ZeroReducer(SparkActor):
    """Identity reduction: emit the full catalog schema (reference
    ZeroReduce.py:10-51 — the baseline every reducer is measured against)."""

    NAME = "zero"
    OUTPUT_NAME = "instance_schemas"
    SKILL = "Emit the full database schema unchanged (no pruning)."

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        central = central_schema_from_catalog(
            self.spark, row.get("db_id", "default"), self.tables_for(row)
        )
        cols = central_to_parallel(central)
        links = [f"{c['table_name']}.{c['column_name']}" for c in cols]
        row["schema_size"] = len(links)
        row["reduced_size"] = len(links)
        return {"instance_schemas": links, "schema_ddl": render_schema_ddl(cols)}


@ActorPool.register("reducer")
class RetrievalReducer(SparkActor):
    """Question-driven schema pruning: score each column by lexical overlap
    between the question and table/column tokens, keep top-k (the
    deterministic core of LinkAlignReduce's retrieve-then-filter loop; the
    LLM filter rounds are optional refinement on top)."""

    NAME = "retrieval"
    OUTPUT_NAME = "instance_schemas"
    STRATEGY = MergeStrategy.OVERWRITE
    SKILL = "Prune schema to top-k columns by question-term overlap scoring."

    def __init__(self, *args, top_k: int = 40, **kwargs):
        super().__init__(*args, **kwargs)
        self.top_k = top_k

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        q_tokens = set(re.findall(r"[a-z0-9]+", (row.get("question") or "").lower()))
        central = central_schema_from_catalog(
            self.spark, row.get("db_id", "default"), self.tables_for(row)
        )
        cols = central_to_parallel(central)
        row["schema_size"] = len(cols)

        def score(c: dict) -> int:
            toks = set(re.findall(r"[a-z0-9]+", f"{c['table_name']} {c['column_name']}".lower()))
            return len(toks & q_tokens)

        ranked = sorted(cols, key=lambda c: (-score(c), c["table_name"], c["column_name"]))
        kept = ranked[: self.top_k]
        row["reduced_size"] = len(kept)
        links = [f"{c['table_name']}.{c['column_name']}" for c in kept]
        return {"instance_schemas": links, "schema_ddl": render_schema_ddl(kept)}


# ---------------------------------------------------------------------------
# Parsers — schema linking (question -> relevant table.column list)


@ActorPool.register("parser")
class HeuristicParser(SparkActor):
    """Deterministic linking: a column links if its name tokens appear in
    the question (the no-LLM baseline for parse_recall/precision)."""

    NAME = "heuristic"
    OUTPUT_NAME = "schema_links"
    SKILL = "Link schema elements whose name tokens occur in the question."

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        q = (row.get("question") or "").lower()
        links = []
        for table in self.tables_for(row):
            for col in P.table_columns(self.spark, table):
                parts = [p for p in re.split(r"[_\W]+", col["name"].lower()) if len(p) > 2]
                if parts and all(p in q for p in parts):
                    links.append(f"{table}.{col['name']}")
        return {"schema_links": links}


@ActorPool.register("parser")
class LLMParser(SparkActor):
    """Single-pass LLM schema linking over the rendered DDL (the pipeline
    mode of LinkAlignParse; multi-agent debate is a composition of these)."""

    NAME = "llm"
    OUTPUT_NAME = "schema_links"
    SKILL = "LLM selects the schema elements a question needs, as [table.column, ...]."

    PROMPT = (
        "Given the database schema:\n{schema}\n\nQuestion: {question}\n"
        "List the schema elements needed to answer it as [table.column, ...]."
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        out = self.llm.complete(
            self.PROMPT.format(schema=schema, question=row.get("question", ""))
        )
        from squrve_spark.evaluate import parse_schema_links

        return {"schema_links": parse_schema_links(out)}


# ---------------------------------------------------------------------------
# Generators — question -> pred_sql


@ActorPool.register("generator")
class GoldGenerator(SparkActor):
    """Gold-SQL passthrough: the deterministic generator that closes the
    end-to-end loop with EX=1.0 (SURVEY §7.2's minimum slice)."""

    NAME = "gold"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Emit the gold SQL (testing passthrough)."

    def act(self, item: int, **kwargs) -> dict:
        return {"pred_sql": self.row(item).get("query", "")}


@ActorPool.register("generator")
class LLMGenerator(SparkActor):
    """Schema-aware LLM generation with an execution-feedback debug loop:
    generate -> execute on Spark -> on error, re-prompt with the engine
    message, up to ``debug_turn_n`` rounds (sql_debug.py:67-117 semantics;
    Spark's AnalysisException text is the feedback signal)."""

    NAME = "llmgen"
    OUTPUT_NAME = "pred_sql"
    SKILL = "LLM writes Spark SQL for the question; self-repairs on execution errors."

    PROMPT = (
        "Database schema:\n{schema}\n{examples}{external}\nWrite ONE Spark SQL query answering:\n"
        "{question}\nReturn only SQL."
    )
    DEBUG_PROMPT = (
        "The SQL:\n{sql}\nfailed with error:\n{error}\n"
        "Fix it. Schema:\n{schema}\nQuestion: {question}\nReturn only SQL."
    )

    def __init__(self, *args, debug_turn_n: int = 2, fewshot=None, few_shot_num: int = 3,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.debug_turn_n = debug_turn_n
        self.fewshot = fewshot  # optional squrve_spark.fewshot.FewShotStore
        self.few_shot_num = few_shot_num

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        examples = ""
        if self.fewshot is not None:
            shots = self.fewshot.top_k(
                question, row.get("db_type", "spark"), self.few_shot_num,
                schema_terms=set(row.get("instance_schemas") or []),
            )
            if shots:
                examples = f"\nExamples:\n{self.fewshot.render(shots)}\n"
        sql = extract_sql(self.llm.complete(
            self.PROMPT.format(schema=schema, question=question, examples=examples,
                               external=self.external_note(row))
        ))
        for _ in range(self.debug_turn_n):
            res = X.execute(self.spark, sql, row_cap=10)
            if res.error is None:
                break
            sql = extract_sql(
                self.llm.complete(
                    self.DEBUG_PROMPT.format(sql=sql, error=res.error, schema=schema, question=question)
                )
            )
        return {"pred_sql": sql}


# ---------------------------------------------------------------------------
# Decomposers — question -> sub_questions


@ActorPool.register("decomposer")
class LLMDecomposer(SparkActor):
    """Split a question into ordered sub-questions (DIN/MAC-SQL style)."""

    NAME = "llmdecomp"
    OUTPUT_NAME = "sub_questions"
    SKILL = "Decompose a complex question into ordered sub-questions."

    PROMPT = "Decompose into numbered sub-questions:\n{question}"

    def act(self, item: int, **kwargs) -> dict:
        out = self.llm.complete(self.PROMPT.format(question=self.row(item).get("question", "")))
        subs = [
            re.sub(r"^\s*\d+[.)]\s*", "", line).strip()
            for line in out.splitlines()
            if re.match(r"^\s*\d+[.)]", line)
        ]
        return {"sub_questions": subs or [out.strip()]}


# ---------------------------------------------------------------------------
# Scalers — produce multiple candidate SQLs (merge strategy EXTEND)


@ActorPool.register("scaler")
class SamplingScaler(SparkActor):
    """N diversified generations appended to the candidate list (reference
    scalers diversify via prompt templates; here via enumerated restyles)."""

    NAME = "sampling"
    OUTPUT_NAME = "pred_sql"
    STRATEGY = MergeStrategy.EXTEND
    SKILL = "Generate N candidate SQLs with diversified prompts."

    STYLES = [
        "Prefer explicit JOIN ... ON syntax.",
        "Prefer CTEs (WITH clauses) over nested subqueries.",
        "Prefer window functions where applicable.",
        "Prefer the simplest correct query.",
    ]

    def __init__(self, *args, generate_num: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.generate_num = generate_num

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        cands = []
        for i in range(self.generate_num):
            style = self.STYLES[i % len(self.STYLES)]
            sql = extract_sql(
                self.llm.complete(
                    f"Database schema:\n{schema}\n{style}\n"
                    f"Write ONE Spark SQL query answering:\n{question}\nReturn only SQL."
                )
            )
            if sql and sql not in cands:
                cands.append(sql)
        return {"pred_sql": cands}


# ---------------------------------------------------------------------------
# Optimizers — execution-feedback SQL repair


@ActorPool.register("optimizer")
class ExecFeedbackOptimizer(SparkActor):
    """Execute pred_sql; on error OR empty result, LLM-revise with the
    observed feedback, up to ``max_round`` rounds (MAC-SQL Refiner and CHESS
    revise semantics: error text / emptiness is the signal)."""

    NAME = "execfeedback"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Repair SQL using Spark execution errors / empty-result feedback."

    PROMPT = (
        "SQL:\n{sql}\nProblem: {problem}\nSchema:\n{schema}\n"
        "Question: {question}\nReturn the corrected SQL only."
    )

    def __init__(self, *args, max_round: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_round = max_round

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        sql = row.get("pred_sql") or kwargs.get("pred_sql") or ""
        if isinstance(sql, list):
            sql = sql[-1] if sql else ""
        schema = row.get("schema_ddl") or ""
        for _ in range(self.max_round):
            res = X.execute(self.spark, sql, row_cap=10)
            if res.error is not None:
                problem = f"execution error: {res.error}"
            elif res.df is not None and res.df.empty:
                problem = "query returned an empty result"
            else:
                break
            sql = extract_sql(
                self.llm.complete(
                    self.PROMPT.format(sql=sql, problem=problem, schema=schema,
                                       question=row.get("question", ""))
                )
            )
        return {"pred_sql": sql}


# ---------------------------------------------------------------------------
# Selectors — candidates -> one pred_sql


@ActorPool.register("selector")
class FastExecSelector(SparkActor):
    """Consensus selection (FastExecSelect.py:48-192 semantics): execute all
    candidates on Spark, group by result-set equivalence (the EX
    comparator), pick the fastest member of the largest consensus group.
    Failed executions carry the 1e5 s cost sentinel."""

    NAME = "fastexec"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Execute all candidate SQLs; pick the fastest of the largest result-consensus group."

    FAIL_COST = 1e5

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        cands = row.get("pred_sql") or kwargs.get("pred_sql") or []
        if isinstance(cands, str):
            cands = [cands]
        if not cands:
            return {"pred_sql": ""}
        executed = []  # (sql, df|None, seconds)
        for sql in cands:
            res = X.execute(self.spark, sql, row_cap=1000)
            cost = self.FAIL_COST if res.error is not None else res.seconds
            executed.append((sql, res.df, cost))

        groups: list[list[int]] = []  # indexes into executed
        for i, (_, df_i, _) in enumerate(executed):
            placed = False
            for g in groups:
                df_j = executed[g[0]][1]
                if df_i is None or df_j is None:
                    equal = df_i is None and df_j is None
                else:
                    equal = bool(
                        C.compare_dataframes(df_i, df_j, ignore_order=True, strict_columns=True)
                    )
                if equal:
                    g.append(i)
                    placed = True
                    break
            if not placed:
                groups.append([i])
        # largest group wins; ties by cheapest member; never pick all-failed
        viable = [g for g in groups if executed[g[0]][1] is not None] or groups
        best_group = max(viable, key=lambda g: (len(g), -min(executed[i][2] for i in g)))
        winner = min(best_group, key=lambda i: executed[i][2])
        return {"pred_sql": executed[winner][0]}


@ActorPool.register("selector")
class LLMJudgeSelector(SparkActor):
    """Pairwise LLM comparison with execution results as evidence (Chase
    semantics, reduced to a single round-robin scoring pass)."""

    NAME = "llmjudge"
    OUTPUT_NAME = "pred_sql"
    SKILL = "LLM judges candidate SQLs using their execution results as evidence."

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        cands = row.get("pred_sql") or []
        if isinstance(cands, str):
            cands = [cands]
        if not cands:
            return {"pred_sql": ""}
        if len(cands) == 1:
            return {"pred_sql": cands[0]}
        evidence = [
            X.execute_sql(self.spark, sql, max_rows=5, max_chars=500) for sql in cands
        ]
        listing = "\n\n".join(
            f"[{i}] SQL: {sql}\nResult:\n{ev}" for i, (sql, ev) in enumerate(zip(cands, evidence))
        )
        out = self.llm.complete(
            f"Question: {row.get('question','')}\nCandidates:\n{listing}\n"
            f"Answer with the index of the best candidate."
        )
        m = re.search(r"\d+", out)
        idx = int(m.group(0)) if m else 0
        return {"pred_sql": cands[idx % len(cands)]}


# ---------------------------------------------------------------------------
# Agents — declarative workflow composition


@ActorPool.register("agent")
class WorkflowAgent(SparkActor):
    """Build a Pipeline/Tree from a declarative ``actor_lis`` like
    ``["reducer:zero", ["parser:llm", "parser:heuristic"], "generator:llmgen"]``
    (WorkflowAgent.py:25-305 semantics: nested lists fan out)."""

    NAME = "workflow"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Compose registered actors into a pipeline with fan-out stages."

    def __init__(self, *args, actor_lis: Optional[list] = None,
                 actor_args: Optional[dict] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.actor_lis = actor_lis or []
        # per-actor constructor kwargs keyed by the spec string
        # (WorkflowAgent.py:80-84: merged with dataset/llm, which this
        # agent always supplies itself)
        self.actor_args = actor_args or {}

    def _build(self, spec) -> Actor:
        from squrve_spark.actors.nest import PipelineActor, TreeActor

        if isinstance(spec, list):
            return TreeActor([self._build(s) for s in spec], dataset=self.dataset)
        if not isinstance(spec, str):
            raise TypeError(
                f"actor_lis item must be str or list, got {type(spec).__name__}: {spec!r}"
            )
        extra = self.actor_args.get(spec, {})
        if not isinstance(extra, dict):
            raise ValueError(
                f"actor_args for {spec!r} must be a dict, got {type(extra).__name__}"
            )
        family, _, name = spec.partition(":")
        return ActorPool.create(
            family, name or family, dataset=self.dataset, spark=self.spark,
            llm=self.llm, **extra,
        )

    def act(self, item: int, **kwargs) -> dict:
        from squrve_spark.actors.nest import PipelineActor

        if not isinstance(self.actor_lis, list) or not self.actor_lis:
            raise ValueError("The actor list must be a non-empty list of actors")
        pipeline = PipelineActor([self._build(s) for s in self.actor_lis], dataset=self.dataset)
        return pipeline.act(item, **kwargs)


@ActorPool.register("agent")
class MultiWorkflowAgent(SparkActor):
    """Pipeline whose steps reference NAMED workflows and NAMED actors
    (WorkflowAgent.py:159-305 semantics): ``workflows`` maps a key to a
    sub-workflow config ``{"actor_lis": [...], "actor_args": {...}}``
    (rolled out as a nested WorkflowAgent), ``actors`` maps a key to
    ``{"actor_name": "family:name", "actor_args": {...}}`` (an atomic
    registered actor), and ``actor_lis`` gives the execution order over
    those keys — a str key is a serial step, a list of keys fans out via
    TreeActor and merges. Deviation from the reference (intended): errors
    raise instead of being swallowed to ``""`` — the engine's task layer
    owns failure accounting."""

    NAME = "multiworkflow"
    OUTPUT_NAME = "pred_sql"
    SKILL = ("Compose pre-named sub-workflows and pre-named actors into one "
             "pipeline with fan-out stages.")

    def __init__(self, *args, workflows: Optional[dict] = None,
                 actors: Optional[dict] = None,
                 actor_lis: Optional[list] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.workflows = workflows or {}
        self.actors = actors or {}
        self.actor_lis = actor_lis or []

    def _resolve(self, key) -> Actor:
        from squrve_spark.actors.nest import TreeActor

        if isinstance(key, list):
            return TreeActor([self._resolve(k) for k in key], dataset=self.dataset)
        if not isinstance(key, str):
            raise TypeError(
                f"actor_lis item must be str or list, got {type(key).__name__}: {key!r}"
            )
        if key in self.workflows:
            wf = self.workflows[key]
            if not isinstance(wf, dict):
                raise ValueError(
                    f"Workflow {key!r} must be a dict, got {type(wf).__name__}"
                )
            if "actor_lis" not in wf:
                raise ValueError(
                    f"Workflow {key!r} must contain 'actor_lis', got keys: {list(wf)}"
                )
            return WorkflowAgent(
                dataset=self.dataset, spark=self.spark, llm=self.llm,
                actor_lis=wf["actor_lis"], actor_args=wf.get("actor_args", {}),
            )
        if key in self.actors:
            spec = self.actors[key]
            if not isinstance(spec, dict):
                raise ValueError(
                    f"Actor {key!r} must be a dict, got {type(spec).__name__}"
                )
            if "actor_name" not in spec:
                raise ValueError(
                    f"Actor {key!r} must contain 'actor_name', got keys: {list(spec)}"
                )
            family, _, name = spec["actor_name"].partition(":")
            return ActorPool.create(
                family, name or family, dataset=self.dataset, spark=self.spark,
                llm=self.llm, **spec.get("actor_args", {}),
            )
        raise ValueError(
            f"Key {key!r} not found in workflows or actors: "
            f"workflows={list(self.workflows)}, actors={list(self.actors)}"
        )

    def act(self, item: int, **kwargs) -> dict:
        from squrve_spark.actors.nest import PipelineActor

        if not isinstance(self.actor_lis, list) or not self.actor_lis:
            raise ValueError("The actor list must be a non-empty list")
        pipeline = PipelineActor(
            [self._resolve(k) for k in self.actor_lis], dataset=self.dataset
        )
        return pipeline.act(item, **kwargs)


@ActorPool.register("agent")
class ForkGatherAgent(SparkActor):
    """Plan-fork-gather (ForkGatherAgent.py:16-326 semantics): the LLM reads
    the registered actors' SKILL descriptions, proposes up to ``max_n``
    candidate workflows (one JSON list of actor specs per line), each rolls
    out independently on a cloned row, and a selector gathers the winner
    from the candidates' outputs."""

    NAME = "forkgather"
    OUTPUT_NAME = "pred_sql"
    SKILL = "LLM plans candidate actor workflows from the skill registry, runs all, selects by execution consensus."

    PROMPT = (
        "Available actors (family:name — skill):\n{skills}\n\n"
        "Question: {question}\n"
        "Propose up to {max_n} workflows, one per line, each a JSON list of "
        'actor specs like ["reducer:zero", "generator:llmgen"].'
    )

    def __init__(self, *args, max_n: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_n = max_n

    def _parse_workflows(self, text: str) -> list[list]:
        import json as _json

        out = []
        for line in text.splitlines():
            line = line.strip().lstrip("-*0123456789. ")
            if not line.startswith("["):
                continue
            try:
                spec = _json.loads(line)
            except _json.JSONDecodeError:
                continue
            if isinstance(spec, list) and spec:
                out.append(spec)
        return out[: self.max_n]

    def act(self, item: int, **kwargs) -> dict:
        skills = "\n".join(
            f"{name} — {skill.strip().splitlines()[0] if skill.strip() else ''}"
            for name, skill in sorted(ActorPool.skills().items())
        )
        row = self.row(item)
        plan_text = self.llm.complete(
            self.PROMPT.format(skills=skills, question=row.get("question", ""),
                               max_n=self.max_n)
        )
        workflows = self._parse_workflows(plan_text) or [["generator:gold"]]
        candidates: list[str] = []
        for spec in workflows:
            agent = WorkflowAgent(
                dataset=self.dataset, spark=self.spark, llm=self.llm, actor_lis=spec
            )
            result = agent.act(item, **kwargs)
            sql = result.get("pred_sql")
            sqls = sql if isinstance(sql, list) else [sql]
            for s in sqls:
                if s and s not in candidates:
                    candidates.append(s)
        row["pred_sql"] = candidates
        selector = FastExecSelector(dataset=self.dataset, spark=self.spark, llm=self.llm)
        return selector.act(item, pred_sql=candidates)


@ActorPool.register("reducer")
class VectorReducer(SparkActor):
    """Vector-retrieval schema pruning: feature-hashed column index +
    cosine top-k over the question (the retrieval core of LinkAlignReduce's
    iterative loop; LLM filter rounds compose on top via PipelineActor)."""

    NAME = "vector"
    OUTPUT_NAME = "instance_schemas"
    SKILL = "Prune schema to top-k columns by hashed-embedding cosine retrieval."

    def __init__(self, *args, top_k: int = 40, **kwargs):
        super().__init__(*args, **kwargs)
        self.top_k = top_k
        self._index_cache: dict = {}

    def act(self, item: int, **kwargs) -> dict:
        from squrve_spark.index import ColumnIndex

        row = self.row(item)
        tables = tuple(self.tables_for(row))
        key = (row.get("db_id", "default"), tables)
        if key not in self._index_cache:
            import os as _os

            store = _os.environ.get("SQURVE_INDEX_STORE")
            if store:
                # persisted warm path (reference keeps per-db stores on disk)
                self._index_cache[key] = ColumnIndex.build_or_load(
                    self.spark, list(tables), store, db_id=key[0]
                )
            else:
                self._index_cache[key] = ColumnIndex.build(
                    self.spark, list(tables), key[0]
                )
        index = self._index_cache[key]
        row["schema_size"] = len(index.entries)
        hits = index.retrieve(row.get("question", ""), k=self.top_k)
        row["reduced_size"] = len(hits)
        links = [f"{h['table_name']}.{h['column_name']}" for h in hits]
        return {"instance_schemas": links, "schema_ddl": render_schema_ddl(hits)}


@ActorPool.register("selector")
class AgentDebateSelector(SparkActor):
    """Two-agent debate (AgentDebateSelect.py:68-521 semantics): a Proposer
    argues for a candidate using execution evidence, an Expert either agrees
    (debate ends) or counters with a different index; bounded rounds, last
    agreed/proposed index wins."""

    NAME = "debate"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Proposer/Expert debate over candidate SQLs with execution evidence."

    def __init__(self, *args, max_rounds: int = 2, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_rounds = max_rounds

    @staticmethod
    def _pick(text: str, n: int) -> Optional[int]:
        nums = re.findall(r"\d+", text)
        return int(nums[-1]) % n if nums else None  # prompt: "end with its index"

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        cands = row.get("pred_sql") or kwargs.get("pred_sql") or []
        if isinstance(cands, str):
            cands = [cands]
        if not cands:
            return {"pred_sql": ""}
        if len(cands) == 1:
            return {"pred_sql": cands[0]}
        evidence = "\n\n".join(
            f"[{i}] SQL: {sql}\nResult:\n"
            f"{X.execute_sql(self.spark, sql, max_rows=5, max_chars=400)}"
            for i, sql in enumerate(cands)
        )
        question = row.get("question", "")
        choice = 0
        for _ in range(self.max_rounds):
            proposal = self.llm.complete(
                f"You are the Proposer. Question: {question}\nCandidates:\n"
                f"{evidence}\nArgue for the best candidate; end with its index."
            )
            p = self._pick(proposal, len(cands))
            choice = choice if p is None else p
            verdict = self.llm.complete(
                f"You are the Expert. Question: {question}\nCandidates:\n{evidence}\n"
                f"The Proposer chose [{choice}] arguing: {proposal}\n"
                f"Reply AGREE, or the index of a better candidate."
            )
            if "AGREE" in verdict.upper():
                break
            v = self._pick(verdict, len(cands))
            if v is not None:
                choice = v
        return {"pred_sql": cands[choice]}


@ActorPool.register("optimizer")
class MetaSQLOptimizer(SparkActor):
    """Meta-SQL decomposition repair (AdaptiveOptimize.py:100-230 semantics):
    decompose the failing SQL into atomic meta-SQLs, execute each to isolate
    the failing clause, then repair with a diagnosis-specific prompt —
    syntax errors get the parser message, logic errors get the clause that
    broke. The decomposition/diagnosis is deterministic engine code
    (squrve_spark.metasql); only the rewrite consults the LLM."""

    NAME = "metasql"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Isolate the failing clause via meta-SQL decomposition, then targeted LLM repair."

    def __init__(self, *args, max_round: int = 2, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_round = max_round

    def act(self, item: int, **kwargs) -> dict:
        from squrve_spark.metasql import diagnose

        row = self.row(item)
        sql = row.get("pred_sql") or kwargs.get("pred_sql") or ""
        if isinstance(sql, list):
            sql = sql[-1] if sql else ""
        schema = row.get("schema_ddl") or ""
        for _ in range(self.max_round):
            report = diagnose(self.spark, sql)
            if report.runs:
                break
            if report.diagnosis == "syntax":
                problem = f"syntax error: {report.error}"
            else:
                problem = (
                    f"logic error isolated to the {report.failing_clause or 'unknown'} "
                    f"clause (statement runs without it); engine said: {report.error}"
                )
            sql = extract_sql(
                self.llm.complete(
                    f"SQL:\n{sql}\nDiagnosis: {problem}\nSchema:\n{schema}\n"
                    f"Question: {row.get('question', '')}\nReturn the corrected SQL only."
                )
            )
        return {"pred_sql": sql}
