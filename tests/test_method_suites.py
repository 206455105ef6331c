"""LinkAlign / OpenSearch-SQL method suites and per-method stage actors
(linkalign.py, opensearch.py, stages.py), each driven with a MockLLM and
real Spark catalog/execution."""

from __future__ import annotations

import pytest

from squrve_spark.actors.base import ActorPool
from squrve_spark.actors.linkalign import (
    LinkAlignGenerator,
    LinkAlignParser,
    LinkAlignReducer,
)
from squrve_spark.actors.opensearch import (
    OpenSearchCoTParser,
    OpenSearchSQLGenerator,
    OpenSearchSQLScaler,
    OpenSearchSQLSelector,
    retrieve_values,
)
from squrve_spark.actors.stages import (
    CHESSSelector,
    CHESSSelectorParser,
    ChessScaler,
    DINSQLCoTParser,
    DINSQLDecomposer,
    DINSQLScaler,
    MACSQLCoTParser,
    MACSQLDecomposer,
    MACSQLScaler,
    RecursiveDecomposer,
    RSLSQLBiDirParser,
    RSLSQLScaler,
)
from squrve_spark.catalog import register_tables
from squrve_spark.llm import MockLLM
from tests.conftest import SF_SMALL

GOOD_COUNT = "SELECT count(*) AS n FROM nation"


def _row(question: str, tables: list[str]) -> dict:
    return {
        "instance_id": 0,
        "db_id": "tpch",
        "db_type": "spark",
        "question": question,
        "query": "",
        "tables": tables,
    }


# ---------------------------------------------------------------------------
# LinkAlign


def test_linkalign_autoscale_bounds():
    assert LinkAlignReducer.auto_scale(4) == (2, 40)
    turns, k = LinkAlignReducer.auto_scale(100_000)
    assert turns == 10 and 40 <= k <= 80


def test_linkalign_reducer_filter_and_post_retrieval(spark):
    register_tables(spark, SF_SMALL, ["nation", "region"])
    llm = MockLLM(rules=[(r"plausibly needed", "[nation.n_name]")])
    red = LinkAlignReducer(
        dataset=[_row("list each n_name with its r_name", ["nation", "region"])],
        spark=spark, llm=llm,
    )
    out = red.act(0)
    # LLM kept n_name; post-retrieval force-keeps r_name (named in question)
    assert out["instance_schemas"] == ["nation.n_name", "region.r_name"]
    assert red.dataset[0]["schema_size"] == 5
    assert red.dataset[0]["reduced_size"] == 2


def test_linkalign_reducer_no_llm_keeps_by_decay(spark):
    register_tables(spark, SF_SMALL, ["nation", "region"])
    red = LinkAlignReducer(
        dataset=[_row("anything", ["nation", "region"])],
        spark=spark, llm=None, llm_filter=False,
    )
    out = red.act(0)
    assert len(out["instance_schemas"]) == 5  # turn 0: decay^0 keeps the full batch


def test_linkalign_parser_slices_wide_schemas(spark):
    register_tables(spark, SF_SMALL, ["nation", "region"])

    def per_slice(match, prompt):
        # answer with a column that is actually in this slice's DDL
        for tc in ["nation.n_name", "region.r_name"]:
            t, c = tc.split(".")
            if c in prompt:
                return f"[{tc}]"
        return "[]"

    llm = MockLLM(rules=[(r"schema elements needed", per_slice)])
    parser = LinkAlignParser(
        dataset=[_row("q", ["nation", "region"])], spark=spark, llm=llm, slice_size=3
    )
    out = parser.act(0)
    assert len([p for p in llm.calls if "schema elements needed" in p]) == 2  # 5 cols / 3
    assert out["schema_links"] == sorted(set(out["schema_links"]))
    assert "nation.n_name" in out["schema_links"]


def test_linkalign_parser_debate_mode_revises(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"Criticize", "[nation.n_name, nation.n_regionkey]"),
            (r"schema elements needed", "[nation.n_name]"),
        ]
    )
    out = LinkAlignParser(
        dataset=[_row("q", ["nation"])], spark=spark, llm=llm, mode="debate"
    ).act(0)
    assert out["schema_links"] == ["nation.n_name", "nation.n_regionkey"]


def test_linkalign_generator_debug_loop(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"failed with error", GOOD_COUNT),
            (r"classify it as NESTED", "SIMPLE"),
            (r"plausibly needed", "[nation.n_name]"),
            (r"schema elements needed", "[nation.n_name]"),
            (r"Write ONE Spark SQL", "SELECT cnt(*) FROM nation"),
        ]
    )
    out = LinkAlignGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == GOOD_COUNT
    assert out["difficulty"] == "SIMPLE"
    assert out["debug_rounds"] == 1
    assert out["schema_links"] == ["nation.n_name"]


# ---------------------------------------------------------------------------
# OpenSearch-SQL


def test_retrieve_values_ranks_matching_value_first(spark):
    register_tables(spark, SF_SMALL, ["region"])
    hits = retrieve_values(spark, ["region"], "ASIA", threshold=0.3, sample_k=5)
    assert hits and hits[0]["value"] == "ASIA" and hits[0]["column"] == "r_name"
    # an impossible threshold filters everything
    assert retrieve_values(spark, ["region"], "ASIA", threshold=0.99) == []


def test_opensearch_cot_parser_profiles_feed_prompt(spark):
    register_tables(spark, SF_SMALL, ["region"])
    llm = MockLLM(rules=[(r"Reason step by step", "[region.r_name]")])
    out = OpenSearchCoTParser(
        dataset=[_row("region names", ["region"])], spark=spark, llm=llm
    ).act(0)
    assert out["schema_links"] == ["region.r_name"]
    prompt = llm.calls[0]
    assert "# table region" in prompt and "nulls=0" in prompt and "samples=" in prompt


def test_opensearch_scaler_attaches_value_hits(spark):
    register_tables(spark, SF_SMALL, ["region"])
    llm = MockLLM(
        rules=[(r"variant (\d+)", lambda m, p: f"SELECT {m.group(1)} AS v")]
    )
    row = _row("Which region is ASIA?", ["region"])
    scaler = OpenSearchSQLScaler(
        dataset=[row], spark=spark, llm=llm, generate_num=2, threshold=0.2
    )
    out = scaler.act(0)
    assert out["pred_sql"] == ["SELECT 1 AS v", "SELECT 2 AS v"]
    assert any(h["value"] == "ASIA" for h in row["value_hits"])
    assert "region.r_name = 'ASIA'" in llm.calls[-1]


def test_opensearch_generator_aligns_and_votes(spark):
    register_tables(spark, SF_SMALL, ["nation"])

    def gen(match, prompt):
        if "attempt 1" in prompt:
            return GOOD_COUNT + " ;"  # align strips the semicolon
        if "attempt 2" in prompt:
            return "SELECT   count(*) AS n\nFROM nation"  # same after align
        return "SELECT 999 AS n"

    llm = MockLLM(rules=[(r"Classify its answer style", "COUNT"), (r"attempt", gen)])
    out = OpenSearchSQLGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == GOOD_COUNT
    assert out["votes"] == 2
    assert out["style"] == "COUNT"


def test_opensearch_selector_prefers_largest_group_earliest(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    row = _row("How many nations?", ["nation"])
    row["pred_sql"] = [
        "SELECT 999 AS n",
        GOOD_COUNT,
        "SELECT count(*) AS n FROM nation WHERE 1=1",
    ]
    out = OpenSearchSQLSelector(dataset=[row], spark=spark, llm=MockLLM()).act(0)
    assert out["pred_sql"] == GOOD_COUNT  # first member of the 2-vote group
    assert out["votes"] == 2


# ---------------------------------------------------------------------------
# stage parsers


def test_dinsql_cot_parser(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[(r"phrase of the question", "reasoning...\n[nation.n_name, nation.n_regionkey]")]
    )
    out = DINSQLCoTParser(dataset=[_row("q", ["nation"])], spark=spark, llm=llm).act(0)
    assert out["schema_links"] == ["nation.n_name", "nation.n_regionkey"]


def test_macsql_cot_parser_filters_unknown(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(rules=[(r"Pruned schema", "[nation.n_name, nation.bogus_col]")])
    out = MACSQLCoTParser(dataset=[_row("nation name", ["nation"])], spark=spark, llm=llm).act(0)
    assert out["schema_links"] == ["nation.n_name"]


def test_chess_selector_parser_three_stages(spark):
    register_tables(spark, SF_SMALL, ["nation", "region"])

    def col_filter(match, prompt):
        return "n_name, n_regionkey" if "`nation`" in prompt else "NONE"

    llm = MockLLM(
        rules=[
            (r"of THIS table", col_filter),
            (r"tables actually needed", "nation"),
            (r"final columns", "[nation.n_name]"),
        ]
    )
    out = CHESSSelectorParser(
        dataset=[_row("nation names", ["nation", "region"])], spark=spark, llm=llm
    ).act(0)
    assert out["schema_links"] == ["nation.n_name"]
    # the region table was dropped in stage 1, so stages 2-3 never list it
    assert "region:" not in next(p for p in llm.calls if "final columns" in p)


def test_rslsql_bidir_parser_merges_directions(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"List the needed columns", "[nation.n_name]"),
            (r"Write ONE Spark SQL", "SELECT n_regionkey FROM nation"),
        ]
    )
    out = RSLSQLBiDirParser(dataset=[_row("q", ["nation"])], spark=spark, llm=llm).act(0)
    assert out["schema_links"] == ["nation.n_name", "nation.n_regionkey"]
    assert out["draft_sql"] == "SELECT n_regionkey FROM nation"


# ---------------------------------------------------------------------------
# stage decomposers


def test_dinsql_decomposer_numbered():
    llm = MockLLM(rules=[(r"Decompose", "1. first\n2) second\nnoise")])
    out = DINSQLDecomposer(dataset=[_row("q", [])], spark=None, llm=llm).act(0)
    assert out["sub_questions"] == ["first", "second"]


def test_macsql_decomposer_pairs(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (
                r"Decompose and solve stepwise",
                "Sub-question: how many rows?\nSQL: SELECT count(*) FROM nation\n"
                f"Sub-question: final\nSQL: {GOOD_COUNT}",
            )
        ]
    )
    out = MACSQLDecomposer(dataset=[_row("q", ["nation"])], spark=spark, llm=llm).act(0)
    assert [p["question"] for p in out["sub_questions"]] == ["how many rows?", "final"]
    assert out["pred_sql"] == GOOD_COUNT


def test_recursive_decomposer_stages(spark):
    register_tables(spark, SF_SMALL, ["nation", "region"])
    llm = MockLLM(
        rules=[
            (r"List the tables needed", "nation, region"),
            (r"one short sub-question", "per-table question"),
            (r"their JOIN answers", "merged question"),
        ]
    )
    out = RecursiveDecomposer(
        dataset=[_row("q", ["nation", "region"])], spark=spark, llm=llm
    ).act(0)
    assert out["stages"] == [["per-table question", "per-table question"], ["merged question"]]
    assert len(out["sub_questions"]) == 3


# ---------------------------------------------------------------------------
# stage scalers


def test_dinsql_scaler_one_per_tier(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"simple Spark SQL", "SELECT 1 AS a"),
            (r"joins needed", "SELECT 2 AS a"),
            (r"subquery if helpful", "SELECT 3 AS a"),
        ]
    )
    out = DINSQLScaler(dataset=[_row("q", ["nation"])], spark=spark, llm=llm).act(0)
    assert out["pred_sql"] == ["SELECT 1 AS a", "SELECT 2 AS a", "SELECT 3 AS a"]


def test_macsql_scaler_dedups(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(default=GOOD_COUNT)  # both templates produce the same SQL
    out = MACSQLScaler(dataset=[_row("q", ["nation"])], spark=spark, llm=llm).act(0)
    assert out["pred_sql"] == [GOOD_COUNT]


def test_rslsql_scaler_adds_slim_candidate(spark):
    register_tables(spark, SF_SMALL, ["nation"])

    def gen(match, prompt):
        return "SELECT 2 AS a" if "### Table = nation, columns = [n_name]" in prompt else "SELECT 1 AS a"

    llm = MockLLM(rules=[(r"Write ONE Spark SQL", gen)])
    row = _row("q", ["nation"])
    row["schema_links"] = ["nation.n_name"]
    out = RSLSQLScaler(dataset=[row], spark=spark, llm=llm).act(0)
    assert out["pred_sql"] == ["SELECT 1 AS a", "SELECT 2 AS a"]


def test_chess_scaler_round_robin(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"restate the question", "SELECT 2 AS a"),
            (r"Prefer CTEs", "SELECT 3 AS a"),
            (r"Double-check", "SELECT 4 AS a"),
            (r"Write ONE Spark SQL", "SELECT 1 AS a"),
        ]
    )
    out = ChessScaler(dataset=[_row("q", ["nation"])], spark=spark, llm=llm).act(0)
    assert len(out["pred_sql"]) == 4


# ---------------------------------------------------------------------------
# CHESS selector


def test_chess_selector_votes_plus_unit_tests(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    row = _row("How many nations?", ["nation"])
    row["pred_sql"] = [
        GOOD_COUNT,
        "SELECT count(*) AS n FROM nation WHERE 1=1",
        "SELECT 999 AS n",
    ]

    def judge(match, prompt):
        return "PASS" if "count(*)" in prompt else "FAIL"

    llm = MockLLM(
        rules=[
            (r"short unit tests", "1. single number\n2. counts rows"),
            (r"Answer PASS or FAIL", judge),
        ]
    )
    out = CHESSSelector(dataset=[row], spark=spark, llm=llm, n_tests=2).act(0)
    assert out["pred_sql"] == GOOD_COUNT
    assert out["score"] == 4  # 2 consensus votes + 2 unit tests


def test_macsql_optimizer_rounds_and_registration(spark):
    from squrve_spark.actors.stages import MACSQLOptimizer

    register_tables(spark, SF_SMALL, ["nation"])
    row = _row("How many nations?", ["nation"])
    row["pred_sql"] = "SELECT count(*) FROM missing_tbl"
    llm = MockLLM(rules=[(r"Problem: execution error", GOOD_COUNT)])
    out = MACSQLOptimizer(dataset=[row], spark=spark, llm=llm).act(0)
    assert out["pred_sql"] == GOOD_COUNT


def test_suite_actors_registered():
    for family, name in [
        ("optimizer", "linkalignopt"),
        ("optimizer", "dinsqlopt"),
        ("optimizer", "macsqlopt"),
        ("optimizer", "chessopt"),
        ("optimizer", "rslsqlopt"),
        ("optimizer", "opensearchopt"),
        ("optimizer", "adaptive"),
        ("reducer", "linkalign"),
        ("parser", "linkalign"),
        ("parser", "opensearchcot"),
        ("parser", "dinsqlcot"),
        ("parser", "macsqlcot"),
        ("parser", "chessparse"),
        ("parser", "rslsqlbidir"),
        ("generator", "linkalign"),
        ("generator", "opensearchsql"),
        ("decomposer", "dinsqldecomp"),
        ("decomposer", "macsqldecomp"),
        ("decomposer", "recursivedecomp"),
        ("scaler", "dinsqlscale"),
        ("scaler", "macsqlscale"),
        ("scaler", "rslsqlscale"),
        ("scaler", "chessscale"),
        ("scaler", "opensearchscale"),
        ("selector", "chessselect"),
        ("selector", "opensearchselect"),
    ]:
        assert ActorPool.resolve(family, name), f"{family}:{name}"


def test_opensearch_prompt_tmp_frame_fidelity(spark):
    """The generation prompt carries the reference TMP_PROMPT frame
    (OpenSearchSQLGenerate.py:110-141): expert header, schema/#values
    blocks, the numbered attention rules, the SQL-like rewrite
    instruction, and the structured answer format; and extract_sql reads
    a structured '#SQL:' answer correctly (earlier #reason/#SQL-like
    lines containing the word SELECT must not win)."""
    from squrve_spark.llm import extract_sql

    register_tables(spark, SF_SMALL, ["nation"])
    structured = (
        "#reason: the question want to count, so the SQL SELECT count(*)\n"
        "#columns: nation.n_nationkey\n#values: (none)\n#SELECT: count\n"
        "#SQL-like: Show count(nation.n_nationkey)\n"
        f"#SQL: {GOOD_COUNT}"
    )
    llm = MockLLM(rules=[
        (r"Classify its answer style", "COUNT"),
        (r"attempt", structured),
    ])
    out = OpenSearchSQLGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == GOOD_COUNT  # structured answer parsed to the #SQL line
    gen = next(p for p in llm.calls if "attempt 1" in p)
    assert gen.startswith(
        "You are an SQL expert, and now I would like you to write SQL"
    )
    assert "/* Database schema */" in gen
    assert "#values in db" in gen
    assert "1. For parts involving division that contain integer types, CAST" in gen
    assert "2. #values in db display part values from the database." in gen
    assert "Please rewrite the question to SQL-like query in the format:" in gen
    assert "#SQL-like: SQL-like statements ignoring Join conditions" in gen
    assert extract_sql(structured) == GOOD_COUNT


def test_linkalign_prompt_frame_fidelity(spark):
    """Classification and nested-tier prompts carry the reference's
    documented frames (LinkAlignGenerate.py:145-162, 205-231): the
    [Instruction] breakdown block with `questions = [...]` output and the
    step-by-step close, and the [Instructions] 7-requirement block with
    [Question]/[Provided Database Schema] sections and the sub-question
    step line fed from the classifier's breakdown."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"classify it as NESTED",
             'questions = ["which nations exist"]\nLabel: "NESTED"'),
            (r".", GOOD_COUNT),
        ]
    )
    LinkAlignGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    cls = next(p for p in llm.calls if "classify it as NESTED" in p)
    assert cls.startswith("# [Instruction]")
    assert "list them in the `List` format: questions = [q1,q2,q3..]" in cls
    assert cls.rstrip().endswith("A: Let's think step by step.")
    gen = next(p for p in llm.calls if "[Instructions]" in p)
    assert "Use the intermediate representation, schema links, and the" in gen
    assert "5. Adhere to DBMS syntax: Ensure that the SQL queries comply" in gen
    assert "7. Return only the SQL query:" in gen
    assert "### [Question]: How many nations?" in gen
    assert "### [Provided Database Schema]:" in gen
    assert '"which nations exist"' in gen  # classifier breakdown fed through


def test_linkalign_cot_classification_reads_label_not_substring(spark):
    """Regression (review late-r4): a CoT reply that MENTIONS 'NESTED'
    while concluding SIMPLE must classify as SIMPLE — the label comes from
    the Label: line (or the last label word), never a bare substring test."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"classify it as NESTED",
             "Let's think step by step. No subquery is needed, so it is "
             'not NESTED.\nLabel: "SIMPLE"'),
            (r".", GOOD_COUNT),
        ]
    )
    out = LinkAlignGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["difficulty"] == "SIMPLE"
    assert not any("[Instructions]" in p for p in llm.calls)  # simple tier used


def test_chess_selector_parser_json_contracts(spark):
    """r5: the three CHESS selection stages carry the reference's
    documented frames (template_filter_column / template_select_tables /
    template_select_columns: role headers, Database Schema Overview /
    Question / Task sections, JSON chain_of_thought contracts) and parse
    the JSON answer shapes, with plain-text fallbacks intact."""
    register_tables(spark, SF_SMALL, ["nation", "region"])

    def col_filter(match, prompt):
        cols = "\"n_name\", \"n_regionkey\"" if "`nation`" in prompt else "\"r_name\""
        return ('{"chain_of_thought_reasoning": "needed for the answer", '
                f'"relevant_columns": [{cols}]}}')

    llm = MockLLM(
        rules=[
            (r"of THIS table", col_filter),
            (
                r"tables actually needed",
                '{"chain_of_thought_reasoning": "region is dropped", '
                '"table_names": ["nation"]}',
            ),
            (
                r"final columns",
                '{"chain_of_thought_reasoning": "only the name", '
                '"nation": ["n_name"]}',
            ),
        ]
    )
    out = CHESSSelectorParser(
        dataset=[_row("nation names", ["nation", "region"])], spark=spark, llm=llm
    ).act(0)
    assert out["schema_links"] == ["nation.n_name"]
    # frame fidelity: each stage carries its documented sections
    f = next(p for p in llm.calls if "of THIS table" in p)
    assert "detail-oriented data scientist" in f and '"relevant_columns"' in f
    t = next(p for p in llm.calls if "tables actually needed" in p)
    for frag in ("expert and very smart data analyst",
                 "Database Schema Overview:", '"table_names"',
                 '"chain_of_thought_reasoning"'):
        assert frag in t, frag
    c = next(p for p in llm.calls if "final columns" in p)
    assert "pinpoint the specific columns" in c and '"table_name1"' in c
