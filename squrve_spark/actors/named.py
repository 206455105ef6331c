"""Named text-to-SQL method actors: faithful control-flow re-implementations
of the reference's canonical algorithms, each runnable against the mockable
``LLMClient`` and executing all data-touching steps on Spark.

Reference analogs (algorithm shape, not code):
  * DIN-SQL   — /root/reference/core/actor/generator/DINSQLGenerate.py:27-713
                (difficulty classes 163-212, tiered prompts 489-566)
  * DAIL-SQL  — /root/reference/core/actor/generator/DAILSQLGenerate.py:1834-2418
                (question masking 203-241, skeleton similarity selectors 344-354)
  * MAC-SQL   — /root/reference/core/actor/generator/MACSQLGenerate.py:839-1072
                (Selector 464+, Decomposer 564+, Refiner 649-830, MAX_ROUND 18)
  * CHESS     — /root/reference/core/actor/generator/CHESSGenerate.py:57-648 and
                selector unit tests /root/reference/core/actor/selector/CHESSSelect.py:109-177
  * ReFoRCE   — /root/reference/core/actor/generator/ReFoRCEGenerate.py:20-650
                (probe exploration, num_votes=3 / max_iter=5 at 37-38)
  * RSL-SQL   — /root/reference/core/actor/generator/RSLSQLGenerate.py:250-1019
                (bidirectional linking, binary selection, empty-result correction)
  * Chase     — /root/reference/core/actor/selector/ChaseSelect.py:20-400
                (consensus groups + pairwise LLM scoring)
  * Recursive — /root/reference/core/actor/generator/RecursiveGenerate.py:21-247
                (stage-0 per-table SQL, recursive JOIN merge)

Every execution goes through ``squrve_spark.execution`` (row caps, job-group
timeouts); result equivalence uses the EX comparator. LLM prompts are
Spark-dialect (the reference's ``db_type``-specific prompt mechanism,
sql_debug.py:120-248, collapsed to the single ``spark`` backend).
"""

from __future__ import annotations

import json
import re
from typing import Optional

from squrve_spark import compare as C
from squrve_spark import execution as X
from squrve_spark import profile as P
from squrve_spark.actors import example_banks
from squrve_spark.actors.base import ActorPool
from squrve_spark.actors.families import SparkActor
from squrve_spark.fewshot import jaccard, mask_question, tokenize
from squrve_spark.llm import extract_sql, normalize_sql

_SQL_KEYWORDS = frozenset(
    """select from where group by having order limit join left right full outer
    inner on as and or not in exists between like distinct union all intersect
    except case when then else end asc desc with cast null is count sum avg min
    max""".split()
)


def sql_skeleton(sql: str) -> list[str]:
    """DAIL-SQL query skeleton: keep SQL keywords, mask literals to ``<v>``
    and identifiers to ``<c>`` (DAILSQLGenerate.py:203-241 semantics)."""
    s = re.sub(r"'[^']*'|\"[^\"]*\"", " <v> ", sql)
    s = re.sub(r"\b\d+(\.\d+)?\b", " <v> ", s)
    out = []
    for tok in re.findall(r"[A-Za-z_][A-Za-z_0-9.]*|<v>|[(),<>=!*]+", s):
        low = tok.lower()
        if low in _SQL_KEYWORDS or tok == "<v>" or not tok[0].isalpha() and tok[0] != "_":
            out.append(low)
        else:
            out.append("<c>")
    return out


def identifiers_in_sql(sql: str, known: set[str]) -> list[str]:
    """Schema elements referenced by ``sql``: every known ``table.column``
    whose column (or qualified form) appears as an identifier token.
    RSL-SQL's reverse linking direction (RSLSQLBiDirParse.py:14-500)."""
    toks = {t.lower() for t in re.findall(r"[A-Za-z_][A-Za-z_0-9.]*", sql)}
    hits = []
    for tc in sorted(known):
        table, col = tc.lower().split(".", 1)
        if tc.lower() in toks or col in toks:
            hits.append(tc)
    return hits


def group_by_equivalence(executed: list) -> list[list[int]]:
    """Group candidate indexes by result-set equivalence (None == failed;
    failures group together). Shared by consensus selection/voting."""
    groups: list[list[int]] = []
    for i, df_i in enumerate(executed):
        for g in groups:
            df_j = executed[g[0]]
            if df_i is None or df_j is None:
                equal = df_i is None and df_j is None
            else:
                equal = bool(C.compare_dataframes(df_i, df_j, ignore_order=True, strict_columns=True))
            if equal:
                g.append(i)
                break
        else:
            groups.append([i])
    return groups


# ---------------------------------------------------------------------------
# DIN-SQL


@ActorPool.register("generator")
class DINSQLGenerator(SparkActor):
    """DIN-SQL, the paper's four documented stages with the reference's
    prompt section frames (DINSQLGenerate.py:49-530): (1) schema linking
    ("Let's think step by step" CoT ending in ``Schema_links: [...]``),
    (2) difficulty classification (EASY / NON-NESTED / NESTED with the
    nested tier's sub-questions parsed from the classification CoT's
    ``questions = [...]`` list), (3) a tier-specific prompt — easy
    Q/Schema_links/SQL triples, medium with an
    ``Intermediate_representation`` step, hard with sub-question stepping —
    and (4) an LLM-only self-correction pass with the reference's numbered
    fixing rules (the debug step never executes SQL). Few-shot bodies are
    compact TPC-H-schema analogs of the reference's Spider-schema examples;
    the stage instructions and output markers match the reference verbatim
    so downstream parsers (``Schema_links:``, ``Label:``) are
    format-compatible."""

    NAME = "dinsql"
    OUTPUT_NAME = "pred_sql"
    SKILL = "DIN-SQL tiered generation: link schema, classify difficulty, prompt per tier, LLM self-debug."

    # Linking + classification stages carry full-size example banks in the
    # reference's line shapes (SCHEMA_LINKING_PROMPT / CLASSIFICATION_PROMPT,
    # DINSQLGenerate.py:49-229) with this engine's own TPC-H-domain bodies
    # (actors/example_banks.py).
    LINK_PROMPT = (
        "# Find the schema_links for generating SQL queries for each question "
        "based on the database schema and Foreign keys.\n"
        + example_banks.DIN_LINK_BANK
        + "{schema}\n"
        'Q: "{question}"\n'
        "A: Let's think step by step."
    )
    CLASSIFY_PROMPT = (
        "# For the given question, classify it as EASY, NON-NESTED, or NESTED "
        "based on nested queries and JOIN.\n"
        "\nif need nested queries: predict NESTED\n"
        "elif need JOIN and don't need nested queries: predict NON-NESTED\n"
        "elif don't need JOIN and don't need nested queries: predict EASY\n\n"
        "{schema}\n"
        + example_banks.DIN_CLASSIFY_BANK
        + '\nQ: "{question}"\n'
        "schema_links: {links}\n"
        "A: Let's think step by step."
    )
    # Tier prompts = instruction line + {schema} + the full-size example
    # bank (reference scale and line shapes; bodies are this engine's own
    # TPC-H-domain examples — actors/example_banks.py) + the target lines
    # exactly as the reference's prompt makers glue them
    # (DINSQLGenerate.py:501-515).
    EASY_PROMPT = (
        "# Use the schema links to generate the SQL queries for each of the "
        "questions.\n{schema}\n" + example_banks.DIN_EASY_BANK
        + 'Q: "{question}"\nSchema_links: {links}\nSQL:'
    )
    MEDIUM_PROMPT = (
        "# Use the schema links and Intermediate_representation to generate "
        "the SQL queries for each of the questions.\n{schema}\n"
        + example_banks.DIN_MEDIUM_BANK
        + 'Q: "{question}"\nSchema_links: {links}\n'
        "A: Let's think step by step."
    )
    HARD_PROMPT = (
        "# Use the intermediate representation and the schema links to "
        "generate the SQL queries for each of the questions.\n{schema}\n"
        + example_banks.DIN_HARD_BANK
        + 'Q: "{question}"\nschema_links: {links}\n'
        "A: Let's think step by step. \"{question}\" can be solved by knowing "
        'the answer to the following sub-question "{subs}".\n'
        'The SQL query for the sub-question"'
    )
    DEBUG_PROMPT = (
        "#### For the given question, use the provided tables, columns, "
        "foreign keys, and primary keys to fix the given Spark SQL QUERY for "
        "any issues. If there are any problems, fix them. If there are no "
        "issues, return the Spark SQL QUERY as is.\n"
        "#### Use the following instructions for fixing the SQL QUERY:\n"
        "1) Use the database values that are explicitly mentioned in the "
        "question.\n"
        "2) Pay attention to the columns that are used for the JOIN by using "
        "the Foreign_keys.\n"
        "3) Use DESC and DISTINCT when needed.\n"
        "4) Pay attention to the columns that are used for the GROUP BY "
        "statement.\n"
        "5) Pay attention to the columns that are used for the SELECT "
        "statement.\n"
        "6) Only change the GROUP BY clause when necessary (Avoid redundant "
        "columns in GROUP BY).\n"
        "7) Use GROUP BY on one column only.\n\n"
        "{schema}\n#### Question: {question}\n"
        "#### Original Spark SQL QUERY\n{sql}\n"
        "#### Output only the fixed SQL query, without any explanation or "
        "extra text:"
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        links = kwargs.get("schema_links") or row.get("schema_links") or []
        if not links:
            link_out = self.llm.complete(
                self.LINK_PROMPT.format(schema=schema, question=question)
            )
            m = re.search(r"Schema_links:\s*\[([^\]]*)\]", link_out)
            links = (
                [s.strip() for s in m.group(1).split(",") if s.strip()] if m else []
            )
        cls_out = self.llm.complete(
            self.CLASSIFY_PROMPT.format(schema=schema, question=question, links=links)
        )
        m = re.search(r'Label:\s*"?([A-Z-]+)"?', cls_out)
        # no Label: line -> default to EASY. Substring-matching the whole
        # CoT is actively wrong: the few-shot phrasing "doesn't require
        # nested queries" contains 'NESTED' and would misroute EASY
        # questions to the hard tier (review finding, late r4).
        label = m.group(1).strip().upper() if m else "EASY"
        if "NESTED" in label and "NON" not in label:
            label = "NESTED"
            # the reference reads sub-questions out of the classification
            # CoT's `questions = ["..."]` list (DINSQLGenerate.py:654-662)
            qm = re.search(r"questions\s*=\s*\[(.*?)\]", cls_out, re.S)
            subs = re.findall(r'"([^"]+)"', qm.group(1)) if qm else []
            prompt = self.HARD_PROMPT.format(
                schema=schema, question=question, links=links,
                subs="; ".join(subs) or question,
            )
        elif "NON" in label:
            label = "NON-NESTED"
            prompt = self.MEDIUM_PROMPT.format(
                schema=schema, links=links, question=question
            )
        else:
            label = "EASY"
            prompt = self.EASY_PROMPT.format(
                schema=schema, links=links, question=question
            )
        sql = extract_sql(self.llm.complete(prompt))
        sql = extract_sql(
            self.llm.complete(self.DEBUG_PROMPT.format(question=question, schema=schema, sql=sql))
        )
        return {"pred_sql": sql, "difficulty": label}


# ---------------------------------------------------------------------------
# DAIL-SQL


@ActorPool.register("generator")
class DAILSQLGenerator(SparkActor):
    """DAIL-SQL: select few-shot examples by BOTH masked-question similarity
    and preliminary-SQL skeleton similarity, then generate with the chosen
    examples (the EUCDISQUESTIONMASK-family hybrid selector, reduced to its
    two similarity signals)."""

    NAME = "dailsql"
    OUTPUT_NAME = "pred_sql"
    SKILL = "DAIL-SQL: few-shot selection by masked-question + SQL-skeleton similarity."

    PRELIM_PROMPT = "Schema:\n{schema}\nQuestion: {question}\nWrite ONE Spark SQL query. Return only SQL."
    FINAL_PROMPT = (
        "Examples:\n{examples}\nSchema:\n{schema}\n{external}Question: {question}\n"
        "Write ONE Spark SQL query. Return only SQL."
    )

    def __init__(self, *args, fewshot=None, few_shot_num: int = 3, candidate_pool: int = 10,
                 selector_type: Optional[str] = None, repr_type: Optional[str] = None,
                 example_format: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.fewshot = fewshot
        self.few_shot_num = few_shot_num
        self.candidate_pool = candidate_pool
        # None keeps the hybrid Jaccard ranking below; a SELECTOR_TYPE name
        # routes through the full selector registry (dail_selectors.py)
        self.selector_type = selector_type
        # a REPR_TYPE name renders the final prompt through the prompt-
        # representation registry (dail_prompts.py) instead of FINAL_PROMPT
        self.repr_type = repr_type
        self.example_format = example_format

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        prelim = extract_sql(
            self.llm.complete(self.PRELIM_PROMPT.format(schema=schema, question=question))
        )
        examples = ""
        scored: list[dict] = []
        if self.fewshot is not None and self.selector_type:
            from squrve_spark.actors.dail_selectors import get_example_selector

            terms = set(row.get("instance_schemas") or [])
            pool = self.fewshot.examples.get(row.get("db_type", "spark"), [])
            selector = get_example_selector(self.selector_type)(pool, schema_terms=terms)
            target = {
                "question": question,
                "db_id": row.get("db_id"),
                "query": row.get("query", ""),
                "pre_sql": prelim,
            }
            scored = selector.get_examples(target, self.few_shot_num)
            if scored:
                examples = self.fewshot.render(scored)
        elif self.fewshot is not None:
            terms = set(row.get("instance_schemas") or [])
            pool = self.fewshot.top_k(
                question, row.get("db_type", "spark"), self.candidate_pool, schema_terms=terms
            )
            q_masked = mask_question(question, terms)
            p_skel = sql_skeleton(prelim)
            scored = sorted(
                pool,
                key=lambda ex: (
                    jaccard(q_masked, mask_question(ex["question"], terms))
                    + jaccard(p_skel, sql_skeleton(ex["sql"]))
                ),
                reverse=True,
            )[: self.few_shot_num]
            if scored:
                examples = self.fewshot.render(scored)
        if self.repr_type:
            from squrve_spark.actors.dail_prompts import EXAMPLE_TYPE, prompt_factory

            icl = prompt_factory(
                self.repr_type,
                k_shot=self.few_shot_num,
                example_format=self.example_format or EXAMPLE_TYPE.QA,
            )
            tables_spec = [
                (t, self.spark.table(t).columns) for t in self.tables_for(row)
            ]
            target = {"question": question, "tables": tables_spec,
                      "foreign_keys": row.get("foreign_keys") or []}
            final_prompt = icl.format(target, scored)
            ext = self.external_note(row)
            if ext:
                final_prompt = f"{ext}\n{final_prompt}"
            return {"pred_sql": extract_sql(self.llm.complete(final_prompt))}
        sql = extract_sql(
            self.llm.complete(
                self.FINAL_PROMPT.format(examples=examples, schema=schema, question=question,
                                         external=self.external_note(row))
            )
        )
        return {"pred_sql": sql}


# ---------------------------------------------------------------------------
# MAC-SQL


@ActorPool.register("generator")
class MACSQLGenerator(SparkActor):
    """MAC-SQL three-agent loop: Selector prunes the schema to the most
    question-relevant columns per table (top ``cols_per_table``, PKs always
    kept — deterministic, from the catalog); Decomposer does CoT
    decomposition + stepwise SQL; Refiner executes on Spark and repairs on
    error up to ``MAX_ROUND`` times."""

    NAME = "macsql"
    OUTPUT_NAME = "pred_sql"
    SKILL = "MAC-SQL: schema-pruning Selector, CoT Decomposer, execute-and-fix Refiner."

    MAX_ROUND = 3
    COLS_PER_TABLE = 6

    # The reference's five SQL-writing constraints, carried verbatim in both
    # the decomposer and refiner prompts (MACSQLGenerate.py:204-210, 438-443)
    CONSTRAINTS = (
        "【Constraints】\n"
        "- In `SELECT <column>`, just select needed columns in the "
        "【Question】 without any unnecessary column or value\n"
        "- In `FROM <table>` or `JOIN <table>`, do not include unnecessary "
        "table\n"
        "- If use max or min func, `JOIN <table>` FIRST, THEN use "
        "`SELECT MAX(<column>)` or `SELECT MIN(<column>)`\n"
        "- If [Value examples] of <column> has 'None' or None, use "
        "`JOIN <table>` or `WHERE <column> is NOT NULL` is better\n"
        "- If use `ORDER BY <column> ASC|DESC`, add `GROUP BY <column>` "
        "before to select distinct values"
    )

    # Decomposer frame (reference MACSQLGenerate.py:204-346): bracketed
    # 【Database schema】/【Question】 sections, the constraint block, the
    # step-by-step sub-question cue, and the worked example's stepping
    # shape (Sub question N -> ```sql block, ending "Question Solved.").
    DECOMPOSE_PROMPT = (
        "Given a 【Database schema】 description and the 【Question】, you "
        "need to use valid Spark SQL and understand the database, then "
        "decompose the question into subquestions for text-to-SQL "
        "generation.\nWhen generating SQL, we should always consider "
        "constraints:\n{constraints}\n\n==========\n\n"
        "【Database schema】\n{schema}\n【Question】\n{question}\n\n"
        "Decompose the question into sub questions, considering "
        "【Constraints】, and generate the SQL after thinking step by "
        "step:\nSub question 1: ...\nSQL\n```sql\n...\n```\n...\n"
        "End with the final SQL and the line: Question Solved."
    )

    # Refiner frame (reference MACSQLGenerate.py:434-461): 【Instruction】,
    # the same constraint block, 【old SQL】 fenced block, the engine error
    # section, and the 【correct SQL】 output cue.
    REFINE_PROMPT = (
        "【Instruction】\nWhen executing SQL below, some errors occurred, "
        "please fix up SQL based on query and database info.\nSolve the "
        "task step by step if you need to. Using SQL format in the code "
        "block, and indicate script type in the code block.\nWhen you find "
        "an answer, verify the answer carefully.\n{constraints}\n"
        "【Query】\n-- {question}\n【Database info】\n{schema}\n"
        "【old SQL】\n```sql\n{sql}\n```\n【Spark SQL error】\n{error}\n\n"
        "Now please fixup old SQL and generate new SQL again.\n【correct SQL】"
    )

    def pruned_schema(self, row: dict) -> str:
        """Deterministic Selector (catalog-driven analog of the reference's
        LLM Selector, MACSQLGenerate.py:112-137): its documented rules are
        applied literally — tables with <= 10 columns are kept whole
        ('keep_all', Requirement 1), otherwise columns rank by
        question-relevance and the top 6 survive (Instruction 2); PKs are
        always retained so joins stay expressible."""
        q_toks = set(tokenize(row.get("question", "")))
        lines = []
        for table in self.tables_for(row):
            cols = P.table_columns(self.spark, table)
            if len(cols) <= 10:  # reference 'keep_all' rule
                keep = {c["name"] for c in cols}
            else:
                def score(c):
                    parts = [p for p in re.split(r"[_\W]+", c["name"].lower()) if p]
                    return sum(p in q_toks for p in parts)
                ranked = sorted(cols, key=score, reverse=True)[: self.COLS_PER_TABLE]
                keep = {c["name"] for c in ranked} | {
                    c["name"] for c in cols if c.get("pk")
                }
            cols_txt = ", ".join(f"{c['name']} {c['type']}" for c in cols if c["name"] in keep)
            lines.append(f"### Table = {table}, columns = [{cols_txt}]")
        return "\n".join(lines)

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        question = row.get("question", "")
        schema = self.pruned_schema(row)
        out = self.llm.complete(
            self.DECOMPOSE_PROMPT.format(
                schema=schema, question=question, constraints=self.CONSTRAINTS
            )
        )
        sql = extract_sql(out)
        rounds = 0
        for _ in range(self.MAX_ROUND):
            res = X.execute(self.spark, sql, row_cap=10)
            if res.error is None:
                break
            rounds += 1
            sql = extract_sql(
                self.llm.complete(
                    self.REFINE_PROMPT.format(
                        sql=sql,
                        error=res.error,
                        schema=schema,
                        question=question,
                        constraints=self.CONSTRAINTS,
                    )
                )
            )
        return {"pred_sql": sql, "refine_rounds": rounds}


# ---------------------------------------------------------------------------
# CHESS


@ActorPool.register("generator")
class CHESSGenerator(SparkActor):
    """CHESS: keyword extraction -> column-value retrieval (sampled values
    from the linked tables, matched against keywords) -> ``n_candidates``
    generations -> LLM-generated natural-language unit tests evaluate ALL
    candidates together per test (with Spark execution previews as
    evidence) -> best scorer wins; a final revise pass runs if the winner
    fails any test.

    The unit-test generation and evaluation prompts reproduce the
    reference's documented templates (CHESSPrompt.py:22-60
    ``template_evaluate`` and :1669-1710 ``template_generate_unit_tests``):
    ``** Instructions / Database Schema / Question / Candidate SQL Queries /
    Unit Test / Output Format **`` sections, ``<Thinking>``/``<Answer>``
    tags, 'The answer SQL query should ...' test phrasing, and per-line
    ``Candidate Response #N: [Passed]/[Failed]`` verdicts."""

    NAME = "chessgen"
    OUTPUT_NAME = "pred_sql"
    SKILL = "CHESS: retrieve value context, generate candidates, score with LLM unit tests."

    N_CANDIDATES = 3
    N_TESTS = 3
    SAMPLE_K = 3

    # template_extract_keywords shape (CHESSPrompt.py:63-104): Objective /
    # Instructions / worked examples / Task sections, Python-list answer.
    KEYWORD_PROMPT = (
        "Objective: Analyze the given question to identify and extract "
        "keywords, keyphrases, and named entities. These elements are "
        "crucial for understanding the core components of the inquiry.\n\n"
        "Instructions:\n\n"
        "Read the Question Carefully: Understand the primary focus and "
        "specific details of the question. Look for any named entities, "
        "technical terms, and other phrases that encapsulate important "
        "aspects of the inquiry.\n\n"
        "List Keyphrases and Entities: Combine your findings into a single "
        "Python list containing:\n\n"
        "Keywords: Single words that capture essential aspects of the "
        "question.\n"
        "Keyphrases: Short phrases or named entities that represent "
        "specific concepts or significant details.\n"
        "Ensure to maintain the original phrasing or terminology used in "
        "the question.\n\n"
        "Example 1:\n"
        'Question: "Find the names of customers in the BUILDING segment '
        'with balance above 1000."\n\n'
        '["names of customers", "BUILDING", "segment", "balance", "1000"]\n\n'
        "Example 2:\n"
        'Question: "How many orders with the priority 1-URGENT were placed '
        'in 1995?"\n\n'
        '["orders", "1-URGENT", "priority", "1995"]\n\n'
        "Task:\n"
        "Given the following question, identify and list all relevant "
        "keywords, keyphrases, and named entities.\n\n"
        "Question: {question}\n\n"
        "Please provide your findings as a Python list. Only output the "
        "Python list, no explanations needed."
    )
    # The reference generates each candidate with a DISTINCT strategy
    # template (CHESSPrompt.py:534 recursive divide-and-conquer, :1169
    # query-plan-guided, :1234 step-by-step expert) — strategy diversity is
    # what makes the candidate clusters informative. Compact analogs carry
    # each strategy's header, method description, admin-instruction list
    # and answer contract; candidate i uses GEN_PROMPTS[i % 3].
    GEN_PROMPTS = (
        # strategy 1: recursive divide-and-conquer, <FINAL_ANSWER> contract
        (
            "You are an experienced database expert.\n"
            "Now you need to generate a SQL query given the database "
            "information, a question and some additional information.\n\n"
            'You will be using a way called "recursive divide-and-conquer '
            'approach to SQL query generation from natural language".\n\n'
            "Here is a high level description of the steps.\n"
            "1. **Divide (Decompose Sub-question with Pseudo SQL):** The "
            "complex natural language question is recursively broken down "
            "into simpler sub-questions.\n"
            "2. **Conquer (Real SQL for sub-questions):** For each "
            "sub-question (and the main question initially), a "
            '"pseudo-SQL" fragment is formulated.\n'
            "3. **Combine (Reassemble):** The SQL fragments are recursively "
            "combined by replacing the placeholders with the actual "
            "generated SQL from the lower levels.\n"
            "4. **Final Output:** This bottom-up assembly culminates in the "
            "complete and correct SQL query.\n\n"
            "Database admin instructions:\n"
            "1. **SELECT Clause:** Only select columns mentioned in the "
            "user's question. Avoid unnecessary columns or values.\n"
            "2. **Aggregation (MAX/MIN):** Always perform JOINs before "
            "using MAX() or MIN().\n"
            "3. **FROM/JOIN Clauses:** Only include tables essential to "
            "answer the question.\n\n"
            "**************************\n"
            "【Table creation statements】\n{schema}\n\n"
            "**************************\n"
            "【Question】\nQuestion:\n{question}\n\n"
            "Relevant values:\n{values}\n\n"
            "**************************\n"
            "【Answer】\n"
            "Generate the SQL with Recursive Divide-and-Conquer. Make sure "
            "you only output one single query, inside the xml delimiter "
            "<FINAL_ANSWER></FINAL_ANSWER>."
        ),
        # strategy 2: query-plan-guided
        (
            "You are an experienced database expert.\n"
            "Now you need to generate a SQL query given the database "
            "information, a question and some additional information.\n\n"
            'You will be using a way called "Query Plan Guided SQL '
            'Generation" to generate the SQL query. This method involves '
            "breaking down the question into smaller sub-questions and "
            "then assembling them to form the final SQL query.\n\n"
            "Database admin instructions:\n"
            "1. **SELECT Clause:** Only select columns mentioned in the "
            "user's question.\n"
            "2. **Strictly Follow Hints:** Adhere to all provided hints.\n"
            "3. **Thorough Question Analysis:** Address all conditions "
            "mentioned in the question.\n"
            "4. **DISTINCT Keyword:** Use `SELECT DISTINCT` when the "
            "question requires unique values.\n"
            "5. **Column Selection:** Carefully analyze column "
            "descriptions to choose the correct column when similar "
            "columns exist across tables.\n\n"
            "Schema:\n{schema}\n\n"
            "Relevant values:\n{values}\n\n"
            "Question: {question}\n\n"
            "Output only the final SQL query."
        ),
        # strategy 3: step-by-step data-science expert
        (
            "You are a data science expert.\n"
            "Below, you are presented with a database schema and a "
            "question.\n"
            "Your task is to read the schema, understand the question, and "
            "generate a valid Spark SQL query to answer the question.\n"
            "Before generating the final SQL query think step by step on "
            "how to write the query.\n\n"
            "Database Schema\n###\n{schema}\n\n"
            "Database admin instructions:\n"
            "1. When you need to find the highest or lowest values based "
            "on a certain condition, using ORDER BY + LIMIT 1 is preferred "
            "over using MAX/MIN within sub queries.\n"
            "2. Make sure you only output the information that is asked in "
            "the question.\n"
            "3. If you are joining multiple tables, make sure to use alias "
            "names for the tables (T1, T2, T3, ...).\n"
            "4. Don't use * in the SELECT clause, unless it is explicitly "
            "asked in the question.\n\n"
            "Relevant values:\n{values}\n\n"
            "Question: {question}\n\n"
            "Output only the final SQL query."
        ),
    )
    TESTS_PROMPT = (
        "** Instructions: **\n"
        "Given the following question, database schema, and candidate "
        "responses, generate a set of {n} unit tests that would evaluate the "
        "correctness of SQL queries that would answer the question.\n"
        "Unit tests should be designed in a way that distinguish the "
        "candidate responses from each other.\n"
        "- The unit tests should cover various aspects of the question and "
        "ensure comprehensive evaluation.\n"
        "- Each unit test should be clearly stated and should include the "
        "expected outcome.\n"
        "- The unit test should be formatted like 'The answer SQL query "
        "should mention...', 'The answer SQL query should state...', 'The "
        "answer SQL query should use...', etc. followed by the expected "
        "outcome.\n"
        "- First think step by step how you can design the unit tests to "
        "distinguish the candidate responses using the <Thinking> tags.\n"
        "- After the thinking process, provide the list of unit tests in the "
        "<Answer> tags.\n\n"
        "VERY IMPORTANT:\n"
        "All of the unit tests should consider the logic of the SQL query do "
        "not consider the formatting of the output or output values.\n\n"
        "You are provided with different clusters of the candidate "
        "responses. Each cluster contains similar responses based on their "
        "results.\n"
        "You MUST generate test cases that can distinguish between the "
        "candidate responses in each cluster and the test case should "
        "promote the candidate responses that you think are correct.\n\n"
        "** Database Schema: **\n{schema}\n\n"
        "** Question: **\nQuestion: {question}\n\n"
        "** Candidate Clusters: **\n{candidates}\n\n"
        "** Output Format: **\n"
        "<Thinking> Your step by step reasoning here. </Thinking>\n"
        "<Answer>\n"
        "output should be only a list of strings (e.g. ['unit test #1', "
        "'unit test #2', 'unit test #3']).\n"
        "</Answer>"
    )
    EVALUATE_PROMPT = (
        "** Instructions: **\n"
        "Given the following question, database schema, a candidate SQL "
        "query response, and unit tests, evaluate whether or not the "
        "response passes each unit test.\n"
        "- In your evaluation, you should consider how the responses align "
        "with the given unit test.\n"
        "- Provide reasoning before you return your evaluation inside the "
        "<Thinking> tags.\n"
        "- At the end of your evaluation, you must finish with a list of "
        "verdicts corresponding to each candidate responses in <Answer> and "
        "</Answer> tags.\n"
        "- You must include a verdict with one of these formatted options: "
        "'[Passed]' or '[Failed]'\n"
        "- Each verdict should be on a new line and correspond to the "
        "candidate response in the same order as they are provided.\n\n"
        "** Database Schema: **\n{schema}\n\n"
        "** Question: **\nQuestion: {question}\n\n"
        "** Candidate SQL Queries: **\n{candidates}\n\n"
        "** Unit Test: **\n{test}\n\n"
        "** Output Format: **\n"
        "<Thinking> Your step by step reasoning here. </Thinking>\n"
        "<Answer>\n"
        "Candidate Response #1: [Passed]\n"
        "Candidate Response #2: [Failed]\n"
        "...\n"
        "</Answer>"
    )
    # template_revise_one shape (CHESSPrompt.py:1403-1668): Task
    # Description / Procedure / Output Format prose, the 【...】-bracketed
    # task sections, and the <FINAL_ANSWER> xml delimiter contract.
    REVISE_PROMPT = (
        "**Task Description:**\n"
        "You are an SQL database expert tasked with correcting a SQL query. "
        "A previous attempt to run a query did not yield the correct "
        "results, either due to errors in execution or because the result "
        "returned was empty or unexpected. Your role is to analyze the "
        "error based on the provided database schema and the details of the "
        "failed execution, and then provide a corrected version of the SQL "
        "query.\n\n"
        "**Procedure:**\n"
        "1. Review Database Schema:\n"
        "\t- Examine the table creation statements to understand the "
        "database structure.\n"
        "2. Analyze Query Requirements:\n"
        "\t- Original Question: Consider what information the query is "
        "supposed to retrieve.\n"
        "\t- Executed SQL Query: Review the SQL query that was previously "
        "executed and led to an error or incorrect result.\n"
        "\t- Execution Result: Analyze the outcome of the executed query to "
        "identify why it failed (e.g., syntax errors, incorrect column "
        "references, logical mistakes).\n"
        "\t- Failed Unit Tests: the failed unit tests below describe logical "
        "properties the correct query must satisfy.\n"
        "3. Correct the Query:\n"
        "\t- Modify the SQL query to address the identified issues, ensuring "
        "it correctly fetches the requested data according to the database "
        "schema and query requirements.\n\n"
        "**Output Format:**\n\n"
        "Present your corrected query as a single line of SQL code, "
        "enclosed within XML delimiter tags <FINAL_ANSWER> and "
        "</FINAL_ANSWER>. Ensure there are no line breaks within the "
        "query.\n\n"
        "======= Your task =======\n"
        "**************************\n"
        "【Table creation statements】\n{schema}\n\n"
        "**************************\n"
        "The original question is:\n"
        "Question:\n{question}\n\n"
        "The SQL query executed was:\n{sql}\n\n"
        "The failed unit tests:\n{failed}\n\n"
        "**************************\n"
        "Based on the question, table schemas and the previous query, "
        "analyze the result try to fix the query.\n\n"
        "Give very detailed analysis first. When you are OK with the fixed "
        "query, output the query string ONLY inside the xml delimiter "
        "<FINAL_ANSWER></FINAL_ANSWER>.\n"
        "Inside the xml delimiter it should be the query in plain text. You "
        "cannot modify the database schema or the question, just output the "
        "corrected query.\n"
        "Make sure you only output one single query. The query should be a "
        "one liner without any line breaks.\n\n"
        "Example of correct format:\n"
        "<FINAL_ANSWER>\n"
        "SELECT column FROM table WHERE condition\n"
        "</FINAL_ANSWER>"
    )
    # template_revise_two shape (CHESSPrompt.py:1280-1322): numbered
    # database-admin instructions + JSON chain_of_thought/revised_SQL
    # answer contract, rules re-grounded in Spark SQL semantics.
    REVISE_ADMIN_PROMPT = (
        "Objective: Your objective is to make sure a query follows the "
        "database admin instructions and use the correct conditions.\n\n"
        "Database Schema:\n{schema}\n\n"
        "Database admin instructions:\n"
        "1. When you need to find the highest or lowest values based on a "
        "certain condition, using ORDER BY + LIMIT 1 is preferred over "
        "using MAX/MIN within sub queries.\n"
        "2. If the predicted query includes an ORDER BY clause to sort the "
        "results, you should only include the column(s) used for sorting "
        "in the SELECT clause if the question specifically asks for them. "
        "Otherwise, omit these columns from the SELECT.\n"
        "3. If the question doesn't specify exactly which columns to "
        "select, between name column and key column, prefer to select the "
        "key column.\n"
        "4. Make sure you only output the information that is asked in the "
        "question. If the question asks for a specific column, make sure "
        "to only include that column in the SELECT clause, nothing more.\n"
        "5. The predicted query should return all of the information asked "
        "in the question without any missing or extra information.\n"
        "6. No matter how many things the question asks, you should only "
        "return one Spark SQL query as the answer having all the "
        "information asked in the question.\n"
        "7. Never concatenate columns in the SELECT clause.\n"
        "8. If you are joining multiple tables, make sure to use alias "
        "names for the tables and use the alias names to reference the "
        "columns in the query. Use T1, T2, T3, ... as alias names.\n"
        "9. If you are doing a logical operation on a column, such as "
        "mathematical operations and sorting, make sure to filter null "
        "values within those columns.\n\n"
        "Question:\n{question}\n\n"
        "Predicted query:\n{sql}\n\n"
        "Query result:\n{result}\n\n"
        "Please respond with a JSON object structured as follows (if the "
        "sql query is correct, return the query as it is):\n\n"
        "{{\n"
        '    "chain_of_thought_reasoning": "Your thought process on how '
        "you arrived at the solution. You don't need to explain the "
        'instructions that are satisfied.",\n'
        '    "revised_SQL": "Your revised SQL query."\n'
        "}}\n\n"
        "Take a deep breath and think step by step to find the correct "
        "Spark SQL query."
    )

    def value_context(self, row: dict, keywords: list[str]) -> str:
        hits = []
        for table in self.tables_for(row):
            for col in P.table_columns(self.spark, table):
                if not col["type"].startswith(("string", "varchar", "char")):
                    continue
                try:
                    vals = P.sample_values(self.spark.table(table), col["name"], self.SAMPLE_K)
                except Exception:
                    continue
                for v in vals:
                    sv = str(v)
                    if any(k and k.lower() in sv.lower() for k in keywords):
                        hits.append(f"{table}.{col['name']} = {sv!r}")
        return "\n".join(sorted(set(hits))[:20])

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        kw_out = self.llm.complete(self.KEYWORD_PROMPT.format(question=question))
        # Python-list replies (the template contract) and plain comma-
        # separated replies both parse: strip list/quote tokens per item
        keywords = [
            k.strip().strip("[]'\"")
            for k in kw_out.split(",")
            if k.strip().strip("[]'\"")
        ]
        values = self.value_context(row, keywords)
        cands = []
        for i in range(self.N_CANDIDATES):
            out = self.llm.complete(
                self.GEN_PROMPTS[i % len(self.GEN_PROMPTS)].format(
                    schema=schema, values=values, question=question
                )
            )
            cands.append(self._final_answer(out) or extract_sql(out))
        # candidates (with execution previews as grounding evidence) are
        # presented TOGETHER: tests are generated to distinguish them, and
        # each test evaluates all candidates in one call (reference flow)
        previews = [
            X.execute_sql(self.spark, sql, max_rows=5, max_chars=500)
            for sql in cands
        ]
        cands_block = "\n".join(
            f"Candidate Response #{i + 1}: {sql}\nExecution preview:\n{pv}"
            for i, (sql, pv) in enumerate(zip(cands, previews))
        )
        # test GENERATION sees result-equivalence CLUSTERS (the reference's
        # 'Candidate Clusters' section): candidates sharing an execution
        # result group together, and tests must split the clusters apart
        by_result: dict[str, list[int]] = {}
        for i, pv in enumerate(previews):
            by_result.setdefault(pv, []).append(i)
        cluster_block = "\n\n".join(
            f"Cluster #{ci + 1}:\n"
            + "\n".join(f"Candidate Response #{i + 1}: {cands[i]}" for i in idxs)
            + f"\nShared execution result:\n{pv}"
            for ci, (pv, idxs) in enumerate(by_result.items())
        )
        tests = self._parse_tests(
            self.llm.complete(self.TESTS_PROMPT.format(
                question=question, n=self.N_TESTS, schema=schema,
                candidates=cluster_block,
            ))
        )[: self.N_TESTS]
        passes_per = [0] * len(cands)
        failed_per: list[list[str]] = [[] for _ in cands]
        for t in tests:
            out = self.llm.complete(self.EVALUATE_PROMPT.format(
                schema=schema, question=question, candidates=cands_block, test=t
            ))
            verdicts = dict(re.findall(
                r"Candidate Response #(\d+):\s*\[(Passed|Failed)\]", out
            ))
            for i in range(len(cands)):
                if verdicts.get(str(i + 1), "Failed") == "Passed":
                    passes_per[i] += 1
                else:
                    failed_per[i].append(t)
        best = max(range(len(cands)), key=lambda i: passes_per[i])
        passes, failed, sql = passes_per[best], failed_per[best], cands[best]
        if failed:
            out = self.llm.complete(self.REVISE_PROMPT.format(
                sql=sql, failed="\n".join(failed), schema=schema, question=question
            ))
            sql = self._final_answer(out) or extract_sql(out)
        return {"pred_sql": sql, "unit_test_passes": passes}

    @staticmethod
    def _final_answer(text: str) -> str | None:
        """SQL from the <FINAL_ANSWER> xml delimiter (revise contract);
        None when absent so callers fall back to extract_sql."""
        m = re.search(r"<FINAL_ANSWER>(.*?)</FINAL_ANSWER>", text, re.S)
        if not m:
            return None
        sql = " ".join(m.group(1).split()).rstrip(";")
        return sql or None

    def revise_with_instructions(self, sql: str, row: dict) -> str:
        """The reference's SECOND revise mode (template_revise_two): check
        the query against the numbered database-admin instructions and
        return the JSON-answered revised_SQL (unchanged when the reply is
        unparseable — a broken revise must never destroy a working query).
        """
        schema = row.get("schema_ddl") or self.schema_ddl(row)
        result = X.execute_sql(self.spark, sql, max_rows=5, max_chars=500)
        out = self.llm.complete(self.REVISE_ADMIN_PROMPT.format(
            schema=schema, question=row.get("question", ""), sql=sql,
            result=result,
        ))
        m = re.search(r'"revised_SQL"\s*:\s*"((?:[^"\\]|\\.)*)"', out, re.S)
        if not m:
            return sql
        try:
            revised = json.loads('"' + m.group(1) + '"').strip()
        except ValueError:
            return sql
        return revised if re.match(r"(?is)\s*(SELECT|WITH)\b", revised) else sql

    @staticmethod
    def _parse_tests(out: str) -> list[str]:
        """Unit tests from the <Answer> list-of-strings block; plain lines
        as the fallback when the LLM skips the tags."""
        m = re.search(r"<Answer>(.*?)</Answer>", out, re.S)
        body = m.group(1) if m else out
        quoted = re.findall(r"'((?:[^'\\]|\\.)+)'|\"((?:[^\"\\]|\\.)+)\"", body)
        tests = [a or b for a, b in quoted]
        if tests:
            return tests
        return [ln.strip("-• \t") for ln in body.splitlines() if ln.strip()]


# ---------------------------------------------------------------------------
# ReFoRCE


@ActorPool.register("generator")
class ReFoRCEGenerator(SparkActor):
    """ReFoRCE: LLM proposes exploration probe SQLs that are executed on
    Spark (row-capped) to reveal column contents; then ``NUM_VOTES``
    independent candidates are generated with the probe evidence, each
    self-refined on execution error (≤ ``MAX_ITER`` total refinements), and
    the winner is the majority result-equivalence group's first member."""

    NAME = "reforce"
    OUTPUT_NAME = "pred_sql"
    SKILL = "ReFoRCE: probe columns with exploratory SQL, vote over self-refined candidates."

    NUM_VOTES = 3
    MAX_ITER = 5
    MAX_PROBES = 3

    # Prompt frames carry the reference's documented sections
    # (ReFoRCEGenerate.py:100-116 exploration, 118-137 self-refine,
    # 252-258 self-correct), with db_type fixed to Spark SQL and the
    # probe budget parameterized ({n} vs the reference's literal 10).
    PROBE_PROMPT = (
        "Schema:\n{schema}\nQuestion: {question}\n"
        "Write at most {n} Spark SQL queries from simple to complex to "
        "understand values in related columns.\n"
        "Each query should be different. Don't query about any SCHEMA or "
        "checking data types. You can write SELECT query only.\n"
        "Try to use DISTINCT. For each SQL LIMIT 20 rows.\n"
        "Write annotations to describe each SQL in format ```sql\n"
        "--Description: \n```.\n"
        "You can only use tables in the provided schema.\n"
    )
    GEN_PROMPT = (
        "Database schema:\n{schema}\n"
        "Some few-shot examples after column exploration may be helpful:\n"
        "{probes}\n"
        "Task: {question}\n"
        "Please think step by step and answer only one complete SQL in "
        "Spark SQL dialect in ```sql``` format (attempt {i}).\n"
        "Here are some useful tips for answering:\n"
        "When asked something without stating name or id, return both of them.\n"
        "When asked percentage decrease, you should return a positive value.\n"
    )
    REFINE_PROMPT = (
        "Input sql:\n{sql}\nThe error information is:\n{error}\n"
        "Database schema:\n{schema}\nTask: {question}\n"
        "Please correct it based on previous context and output the "
        "thinking process with only one sql query in ```sql``` format. "
        "Don't just analyze without SQL or output several SQLs.\n"
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        probe_out = self.llm.complete(
            self.PROBE_PROMPT.format(schema=schema, question=question, n=self.MAX_PROBES)
        )
        # the prompt asks for annotated ```sql blocks (possibly multi-line);
        # fall back to bare SELECT/WITH lines for terse repliers
        blocks = [
            b.strip()
            for b in re.findall(r"```(?:sql)?\s*(.*?)```", probe_out,
                                re.DOTALL | re.IGNORECASE)
            if re.search(r"(?is)\b(SELECT|WITH)\b", b)
        ]
        probe_sqls = (blocks or [
            ln.strip() for ln in probe_out.splitlines()
            if re.match(r"^\s*(SELECT|WITH)\b", ln.strip(), re.IGNORECASE)
        ])[: self.MAX_PROBES]
        probes = "\n".join(
            f"> {p}\n{X.execute_sql(self.spark, p, max_rows=5, max_chars=300)}"
            for p in probe_sqls
        )
        budget = self.MAX_ITER
        cands, dfs = [], []
        for i in range(self.NUM_VOTES):
            sql = extract_sql(self.llm.complete(self.GEN_PROMPT.format(
                schema=schema, probes=probes, question=question, i=i + 1
            )))
            res = X.execute(self.spark, sql, row_cap=1000)
            while res.error is not None and budget > 0:
                budget -= 1
                sql = extract_sql(self.llm.complete(self.REFINE_PROMPT.format(
                    sql=sql, error=res.error, schema=schema, question=question
                )))
                res = X.execute(self.spark, sql, row_cap=1000)
            cands.append(sql)
            dfs.append(res.df)
        groups = group_by_equivalence(dfs)
        viable = [g for g in groups if dfs[g[0]] is not None] or groups
        best = max(viable, key=len)
        return {"pred_sql": cands[best[0]], "votes": len(best)}


# ---------------------------------------------------------------------------
# RSL-SQL


@ActorPool.register("generator")
class RSLSQLGenerator(SparkActor):
    """RSL-SQL: bidirectional schema linking (forward LLM column selection +
    reverse extraction from a preliminary full-schema SQL), then TWO
    candidates — one from the full schema, one from the slim linked schema —
    chosen between by execution (binary selection); an empty-result
    self-correction pass runs on the winner."""

    NAME = "rslsql"
    OUTPUT_NAME = "pred_sql"
    SKILL = "RSL-SQL: bidirectional linking, dual-candidate execution selection, empty-result repair."

    FORWARD_PROMPT = (
        "Schema:\n{schema}\nQuestion: {question}\n"
        "List the needed columns as [table.column, ...] (at most 15)."
    )
    GEN_PROMPT = "Schema:\n{schema}\nQuestion: {question}\nWrite ONE Spark SQL query. Return only SQL."
    # binary selection + self-correction carry the reference's documented
    # frames (RSLSQLGenerate.py:234-243 BINARY_PROMPT — incl. its literal
    # "the  question" spacing — and 181-232 SELF_CORRECTION_PROMPT's
    # header/Input/Output/Note sections); answers come back as the
    # reference's {{"sql": ...}} json, parsed with an extract_sql fallback
    # so plain-SQL replies keep working.
    CHOOSE_PROMPT = (
        "{table_info}\n\n"
        "### Select the best SQL query to answer the  question:\n\n"
        "{candidate_sql}\n\n"
        "Your answer should be returned by json format.\n"
        "{{\n"
        '    "sql": "...",# your SQL query\n'
        "}}\n"
    )
    CORRECT_PROMPT = (
        "You are an AI agent responsible for generating the correct SQL "
        "statements based on the following information:\n"
        "- Database structure information: including table names, fields, "
        "relationships between tables (such as foreign keys, etc.).\n"
        "- The first three rows of values in the table: sample data for "
        "understanding the content and data distribution of the table.\n"
        "- User questions: queries or questions in natural language form.\n"
        "- Hint: Information for prompting, this message is very important.\n"
        "\n### Input:\n"
        "- Database structure information:\n{schema}\n"
        "- The first three rows of values in the table:\n{samples}\n"
        "- User questions: {question}\n"
        "- Hint: the previous SQL returned no rows; if the filters look "
        "wrong, correct them, else keep the same SQL:\n{sql}\n"
        "\n### Output:\n"
        '- Return the result in json format, the format is '
        '{{"sql": "SQL statement that meets the user question requirements"}}\n'
        "\n### Note:\n"
        "- Ensure that the SQL statement accurately reflects the query "
        "requirements and conditions in the user question.\n"
        "- In the generated SQL statement, table names and field names "
        "need to be enclosed in backquotes, such as `table_name`, "
        "`column_name`.\n"
    )

    @staticmethod
    def _json_sql(text: str) -> str | None:
        """Parse the reference's {"sql": "..."} answer shape; None when
        the reply is not in that format (callers fall back to extract_sql)."""
        import json as _json

        # Scan ALL '"sql":' matches, preferring the last statement-rooted one:
        # prompts echo the output-format template ('{"sql": "SQL statement that
        # meets..."}') before the actual answer, so the first match may be the
        # English placeholder rather than the SQL.
        best = None
        for m in re.finditer(r'"sql"\s*:\s*"((?:[^"\\]|\\.)*)"', text, re.DOTALL):
            try:
                # json unescape (NOT unicode_escape, which mojibakes non-ASCII)
                sql = _json.loads('"' + m.group(1) + '"').strip()
            except ValueError:
                continue
            if not sql or sql == "...":
                continue
            if re.match(r"(?is)\s*(SELECT|WITH)\b", sql):
                best = sql  # keep the LAST statement-rooted candidate
        return best

    def known_columns(self, row: dict) -> set[str]:
        out = set()
        for table in self.tables_for(row):
            for col in P.table_columns(self.spark, table):
                out.add(f"{table}.{col['name']}")
        return out

    def slim_schema(self, row: dict, links: list[str]) -> str:
        by_table: dict[str, list[str]] = {}
        for tc in links:
            t, c = tc.split(".", 1)
            by_table.setdefault(t, []).append(c)
        return "\n".join(
            f"### Table = {t}, columns = [{', '.join(cs)}]" for t, cs in sorted(by_table.items())
        )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        known = self.known_columns(row)
        from squrve_spark.evaluate import parse_schema_links

        forward = [
            tc for tc in parse_schema_links(
                self.llm.complete(self.FORWARD_PROMPT.format(schema=schema, question=question))
            )
            if tc in known
        ][:15]
        full_sql = extract_sql(
            self.llm.complete(self.GEN_PROMPT.format(schema=schema, question=question))
        )
        reverse = identifiers_in_sql(full_sql, known)
        links = sorted(set(forward) | set(reverse))
        slim_sql = extract_sql(self.llm.complete(
            self.GEN_PROMPT.format(schema=self.slim_schema(row, links) or schema, question=question)
        ))
        res_full = X.execute(self.spark, full_sql, row_cap=1000)
        res_slim = X.execute(self.spark, slim_sql, row_cap=1000)
        ok_full, ok_slim = res_full.error is None, res_slim.error is None
        if ok_full != ok_slim:
            sql, res = (full_sql, res_full) if ok_full else (slim_sql, res_slim)
        elif not ok_full:
            sql, res = full_sql, res_full
        elif C.compare_dataframes(res_full.df, res_slim.df, ignore_order=True, strict_columns=True):
            sql, res = slim_sql, res_slim  # agreement: prefer the slim-schema read
        else:
            cand_block = "\n\n".join(
                f"Candidate {i}:\n{s}\nExecution result:\n"
                + X.execute_sql(self.spark, s, max_rows=5, max_chars=300)
                for i, s in enumerate((full_sql, slim_sql))
            )
            pick = self.llm.complete(self.CHOOSE_PROMPT.format(
                table_info=f"{schema}\nQuestion: {question}",
                candidate_sql=cand_block,
            ))
            chosen = self._json_sql(pick)
            if chosen is not None and normalize_sql(chosen) == normalize_sql(slim_sql):
                sql, res = slim_sql, res_slim
            elif chosen is not None and normalize_sql(chosen) == normalize_sql(full_sql):
                sql, res = full_sql, res_full
            elif chosen is not None:
                # the reference uses the returned SQL directly — a
                # reformatted variant of a candidate is still the answer
                sql, res = chosen, X.execute(self.spark, chosen, row_cap=1000)
            else:
                # no json answer at all: a bare digit reply picks by index
                # (scanning arbitrary text for [01] would hit literals
                # like LIMIT 10)
                m = re.fullmatch(r"\s*([01])\s*", pick)
                sql, res = ((full_sql, res_full), (slim_sql, res_slim))[
                    int(m.group(1)) if m else 0
                ]
        if res.error is None and res.df is not None and res.df.empty:
            samples = "\n".join(
                f"-- {t}\n"
                + X.execute_sql(
                    self.spark, f"SELECT * FROM {t} LIMIT 3", max_rows=3, max_chars=300
                )
                for t in self.tables_for(row)
            )
            reply = self.llm.complete(self.CORRECT_PROMPT.format(
                sql=sql, question=question, schema=schema, samples=samples
            ))
            sql = self._json_sql(reply) or extract_sql(reply)
        return {"pred_sql": sql, "schema_links": links}


# ---------------------------------------------------------------------------
# Recursive generator


@ActorPool.register("generator")
class RecursiveGenerator(SparkActor):
    """Recursive generation: stage 0 writes one per-table SQL for each
    relevant table; later stages LLM-merge pairs via JOIN until one SQL
    remains (RecursiveGenerate.py:21-247 shape)."""

    NAME = "recursive"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Recursive: per-table SQLs first, then JOIN-merge stages to one query."

    TABLES_PROMPT = "Schema:\n{schema}\nQuestion: {question}\nList the tables needed, comma-separated."
    # stage-0 and merge frames carry the reference's documented prompts
    # (RecursivePrompt.py:106-158 STAGE0_SINGLE_TABLE_SQL_PROMPT,
    # 160-242 RECURSIVE_MERGE_SQL_PROMPT): one JSON-array call covers all
    # tables, then per-stage merge planning with active-query ids,
    # execution evidence, and the is_final / merge_operations answer
    # shapes. Unparseable replies fall back to extract_sql pairwise
    # merging so plain-SQL LLMs still work.
    STAGE0_PROMPT = (
        "You are an expert SQL query generator specializing in "
        "decomposing complex queries into single-table operations.\n\n"
        "Your task is to generate independent SQL queries for EACH table "
        "in the provided schema.\n\n"
        "### Important Rules:\n"
        "1. **One SQL per table**: Generate exactly ONE SQL statement for "
        "each table in the schema.\n"
        "2. **Single table only**: Each SQL must query ONLY ONE table - "
        "no JOINs, no subqueries referencing other tables.\n"
        "3. **Maximum coverage**: Select all columns that might be "
        "relevant to answering the question from that table.\n"
        "4. **Appropriate filtering**: Apply WHERE clauses only when you "
        "can determine specific filter conditions from the question that "
        "apply to this table alone.\n"
        "5. **No cross-table logic**: Do not try to implement any logic "
        "that requires data from multiple tables.\n\n"
        "### Database Schema:\n{schema}\n\n"
        "### Question to Answer:\n{question}\n\n"
        "### Output Format:\n"
        "Respond with a JSON array containing one object for each table. "
        "Each object must have the following structure:\n"
        "```json\n"
        "[\n"
        "  {{\n"
        '    "table": "table_name",\n'
        '    "sub_question": "...",\n'
        '    "chain_of_thought": "...",\n'
        '    "sql": "SELECT column1, column2, ... FROM table_name WHERE ..."\n'
        "  }}\n"
        "]\n"
        "```\n"
        "Only output the JSON array as your response."
    )
    MERGE_PROMPT = (
        "You are an expert SQL query planner specializing in "
        "progressively merging single-table queries into a complete SQL "
        "solution through a step-by-step recursive process.\n\n"
        "### Background:\n"
        "You are in **Stage {stage}** of a recursive SQL construction "
        "process.\n"
        "- Currently there are **{active_count} active queries** "
        "available for merging (listed below).\n\n"
        "### Original Question:\n{question}\n\n"
        "### Database Schema:\n{schema}\n\n"
        "### Active Queries Available for Merging:\n{previous_sqls}\n\n"
        "### Task: Plan the Next Merge Step\n"
        "**CRITICAL RULES:**\n"
        "1. **Pairwise Only**: Each merge combines EXACTLY TWO of the "
        "active queries listed above. Reference them by their query IDs.\n"
        "2. **Write executable SQL**: The merged SQL must be a valid, "
        "self-contained SQL statement — directly reference the base "
        "tables (not the query IDs).\n"
        "3. **Progressive narrowing**: Each merge should tighten the data "
        "scope toward the final answer.\n\n"
        "### Output Format:\n"
        "**If this merge produces the FINAL answer:**\n"
        "```json\n"
        '{{\n  "is_final": true,\n  "final_sql": "..."\n}}\n'
        "```\n"
        "**If more merging stages are needed:**\n"
        "```json\n"
        "{{\n"
        '  "is_final": false,\n'
        '  "merge_operations": [\n'
        "    {{\n"
        '      "source_query_ids": ["query_X", "query_Y"],\n'
        '      "sql": "..."\n'
        "    }}\n"
        "  ]\n"
        "}}\n"
        "```\n"
        "Only output the JSON as your response."
    )

    MAX_STAGES = 6

    @staticmethod
    def _json_block(text: str):
        import json as _json

        fence = re.search(r"```(?:json)?\s*(.*?)```", text, re.DOTALL)
        payload = fence.group(1) if fence else text
        try:
            return _json.loads(payload.strip())
        except (ValueError, TypeError):
            return None

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        schema = kwargs.get("schema_ddl") or row.get("schema_ddl") or self.schema_ddl(row)
        question = row.get("question", "")
        t_out = self.llm.complete(self.TABLES_PROMPT.format(schema=schema, question=question))
        known = set(self.tables_for(row))
        tables = [t.strip() for t in t_out.split(",") if t.strip() in known] or sorted(known)[:1]
        table_ddl = "\n".join(P.describe_for_prompt(self.spark, t) for t in tables)
        reply = self.llm.complete(
            self.STAGE0_PROMPT.format(schema=table_ddl, question=question)
        )
        parsed = self._json_block(reply)
        if isinstance(parsed, list) and all(
            isinstance(o, dict) and o.get("sql") for o in parsed
        ):
            stage = [o["sql"] for o in parsed]
        else:  # plain-SQL reply: treat it as one query per line fallback
            stage = [extract_sql(reply)]
        n_stage = 0
        preview_cache: dict[str, str] = {}

        def preview(sql: str) -> str:
            # carried-over queries survive several stages — execute once
            if sql not in preview_cache:
                preview_cache[sql] = X.execute_sql(
                    self.spark, sql, max_rows=3, max_chars=200
                )
            return preview_cache[sql]

        while len(stage) > 1 and n_stage < self.MAX_STAGES:
            n_stage += 1
            previews = "\n".join(
                f"query_{i}:\n{sql}\nExecution result:\n" + preview(sql)
                for i, sql in enumerate(stage)
            )
            reply = self.llm.complete(self.MERGE_PROMPT.format(
                stage=n_stage, active_count=len(stage), question=question,
                schema=schema, previous_sqls=previews,
            ))
            plan = self._json_block(reply)
            if isinstance(plan, dict) and plan.get("is_final") and plan.get("final_sql"):
                return {"pred_sql": plan["final_sql"]}
            if isinstance(plan, dict) and plan.get("merge_operations"):
                consumed: set[int] = set()
                next_stage: list[str] = []
                for op in plan["merge_operations"]:
                    ids = [
                        int(m.group(1))
                        for qid in op.get("source_query_ids", [])
                        if (m := re.search(r"(\d+)", str(qid)))
                    ]
                    ids = [i for i in ids if 0 <= i < len(stage) and i not in consumed]
                    # exactly two DISTINCT sources (["query_0","query_0"]
                    # must not count as a pair)
                    if len(set(ids)) == 2 and op.get("sql"):
                        consumed.update(ids)
                        next_stage.append(op["sql"])
                next_stage += [s for i, s in enumerate(stage) if i not in consumed]
                if len(next_stage) < len(stage):
                    stage = next_stage
                    continue
            # unparseable or non-reducing plan: pairwise fallback, but ONLY
            # when the reply actually contains SQL — a malformed JSON plan
            # must never be executed as a query
            fallback = extract_sql(reply)
            if re.match(r"(?is)\s*(SELECT|WITH)\b", fallback):
                stage = [fallback] + stage[2:]
            else:
                break  # keep the best current candidate instead of garbage
        return {"pred_sql": stage[0]}


# ---------------------------------------------------------------------------
# Chase selector


@ActorPool.register("selector")
class ChaseSelector(SparkActor):
    """Chase selection: execute all candidates, group by result equivalence,
    then run pairwise LLM comparisons between group representatives with
    execution results as evidence; each pairwise win scores +1 for every
    member of the winner's group; highest total score wins (ChaseSelect.py
    consensus + pairwise accumulation)."""

    NAME = "chase"
    OUTPUT_NAME = "pred_sql"
    SKILL = "Chase: consensus groups + pairwise LLM comparison with execution evidence."

    PAIR_PROMPT = (
        "Question: {question}\nSQL A: {a}\nResult A:\n{ra}\n"
        "SQL B: {b}\nResult B:\n{rb}\nWhich answers the question correctly? Answer A or B."
    )

    def act(self, item: int, **kwargs) -> dict:
        row = self.row(item)
        cands = row.get("pred_sql") or kwargs.get("pred_sql") or []
        if isinstance(cands, str):
            cands = [cands]
        if not cands:
            return {"pred_sql": ""}
        if len(cands) == 1:
            return {"pred_sql": cands[0]}
        results = [X.execute(self.spark, sql, row_cap=1000) for sql in cands]
        groups = group_by_equivalence([r.df for r in results])
        groups = [g for g in groups if results[g[0]].df is not None] or groups
        scores = {i: len(g) for g in groups for i in g}  # consensus prior
        reps = [g[0] for g in groups]
        previews = {
            i: X.execute_sql(self.spark, cands[i], max_rows=5, max_chars=300) for i in reps
        }
        for ai in range(len(reps)):
            for bi in range(ai + 1, len(reps)):
                a, b = reps[ai], reps[bi]
                out = self.llm.complete(self.PAIR_PROMPT.format(
                    question=row.get("question", ""),
                    a=cands[a], ra=previews[a], b=cands[b], rb=previews[b],
                ))
                winner = a if "A" in out.upper().replace("B", "", 0) and "B" not in out.upper()[:3] else b
                win_group = next(g for g in groups if winner in g)
                for i in win_group:
                    scores[i] = scores.get(i, 0) + 1
        best = max(scores, key=lambda i: (scores[i], -i))
        return {"pred_sql": cands[best]}
