"""Named text-to-SQL method actors (squrve_spark/actors/named.py): each
canonical algorithm driven end-to-end with a MockLLM, all execution on Spark.

Mirrors the reference's per-method generator tests (SURVEY §5) — the LLM is
scripted, the data-touching steps (schema from catalog, execution, EX
comparison) are real.
"""

from __future__ import annotations

import pandas as pd
import pytest

from squrve_spark.actors.base import ActorPool
from squrve_spark.actors.named import (
    CHESSGenerator,
    ChaseSelector,
    DAILSQLGenerator,
    DINSQLGenerator,
    MACSQLGenerator,
    RSLSQLGenerator,
    ReFoRCEGenerator,
    RecursiveGenerator,
    group_by_equivalence,
    identifiers_in_sql,
    sql_skeleton,
)
from squrve_spark.catalog import register_tables
from squrve_spark.fewshot import FewShotStore
from squrve_spark.llm import MockLLM
from tests.conftest import SF_SMALL

GOOD_COUNT = "SELECT count(*) AS n FROM nation"


def _row(question: str, tables: list[str], query: str = "") -> dict:
    return {
        "instance_id": 0,
        "db_id": "tpch",
        "db_type": "spark",
        "question": question,
        "query": query,
        "tables": tables,
    }


# ---------------------------------------------------------------------------
# pure helpers


def test_sql_skeleton_masks_identifiers_and_literals():
    skel = sql_skeleton("SELECT n_name FROM nation WHERE n_regionkey = 3 AND n_name = 'KENYA'")
    assert skel.count("<c>") == 4  # n_name, nation, n_regionkey, n_name
    assert skel.count("<v>") == 2  # 3, 'KENYA'
    assert "select" in skel and "where" in skel and "and" in skel
    # same shape, different identifiers -> identical skeletons
    assert skel == sql_skeleton("SELECT r_name FROM region WHERE r_regionkey = 9 AND r_name = 'x'")


def test_identifiers_in_sql_reverse_linking():
    known = {"nation.n_name", "nation.n_regionkey", "region.r_name"}
    hits = identifiers_in_sql("SELECT n_name FROM nation WHERE nation.n_regionkey > 0", known)
    assert hits == ["nation.n_name", "nation.n_regionkey"]


def test_group_by_equivalence_groups_failures_and_matches():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [2, 1]})  # same set, ignore_order
    c = pd.DataFrame({"x": [9]})
    groups = group_by_equivalence([a, b, c, None, None])
    assert groups == [[0, 1], [2], [3, 4]]


# ---------------------------------------------------------------------------
# generators


def test_dinsql_nested_tier(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"Find the schema_links", "Schema_links: [nation.n_nationkey]"),
            (
                r"classify it as EASY, NON-NESTED, or NESTED",
                'it requires nested queries, and we need the answer to the '
                'questions = ["count the nations"].\nLabel: "NESTED"',
            ),
            (r"intermediate representation and the schema links",
             "SELECT count(*) FROM nation"),
            (r"fixing the SQL QUERY", GOOD_COUNT),
        ]
    )
    actor = DINSQLGenerator(dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm)
    out = actor.act(0)
    assert out == {"pred_sql": GOOD_COUNT, "difficulty": "NESTED"}
    hard_prompt = next(p for p in llm.calls if "[Analysis]" in p)
    # the classification CoT's sub-question reached the hard-tier stepping
    assert 'sub-question "count the nations"' in hard_prompt
    # linking stage output reached classification
    cls_prompt = next(p for p in llm.calls if "classify it as EASY" in p)
    assert "nation.n_nationkey" in cls_prompt


def test_dinsql_easy_tier_skips_decomposition(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"Find the schema_links", "Schema_links: [nation.*]"),
            (r"classify it as EASY, NON-NESTED, or NESTED", 'Label: "EASY"'),
            (r"fixing the SQL QUERY", GOOD_COUNT),
            (r"Use the schema links to generate", GOOD_COUNT),
        ]
    )
    out = DINSQLGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["difficulty"] == "EASY"
    assert not any("[Analysis]" in p for p in llm.calls)


def test_dinsql_prompt_section_fidelity(spark):
    """The four stages carry the reference's documented section frames
    (DINSQLGenerate.py:49-530): schema-linking instruction + Schema_links
    output, the three-way classification rule block + Label output, the
    per-tier markers (reference-examples header, Intermediate_representation,
    sub-question stepping), and the numbered self-correction rules."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"Find the schema_links", "Schema_links: [nation.n_nationkey]"),
            (
                r"classify it as EASY",
                'questions = ["which nations exist"].\nLabel: "NESTED"',
            ),
            (r".", GOOD_COUNT),
        ]
    )
    DINSQLGenerator(dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm).act(0)
    link, cls, hard, debug = llm.calls
    assert link.startswith(
        "# Find the schema_links for generating SQL queries for each question"
    )
    assert "Foreign_keys = [" in link and "Let's think step by step" in link
    assert "# For the given question, classify it as EASY, NON-NESTED, or NESTED" in cls
    assert "if need nested queries: predict NESTED" in cls
    assert 'Label: "EASY"' in cls and 'Label: "NESTED"' in cls  # few-shot labels
    assert "# Use the intermediate representation and the schema links" in hard
    assert "### Here are some reference examples:" in hard
    assert "[Question]:" in hard and "[Analysis]:" in hard
    assert "Intermediate_representation:" in hard
    assert 'The SQL query for the sub-question"' in hard
    assert "#### Use the following instructions for fixing the SQL QUERY:" in debug
    assert "7) Use GROUP BY on one column only." in debug
    assert "#### Original Spark SQL QUERY" in debug


def test_dinsql_medium_tier_intermediate_representation(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"Find the schema_links", "Schema_links: [nation.n_name]"),
            (r"classify it as EASY", 'Label: "NON-NESTED"'),
            (r".", GOOD_COUNT),
        ]
    )
    out = DINSQLGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["difficulty"] == "NON-NESTED"
    medium = next(p for p in llm.calls if "Intermediate_representation" in p)
    assert "# Use the schema links and Intermediate_representation" in medium


def test_dailsql_selects_by_question_and_skeleton_similarity(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    store = FewShotStore()
    store.add("spark", "How many nations are there?", "SELECT count(*) FROM nation")
    store.add("spark", "List every part name sorted by retail price",
              "SELECT p_name FROM part ORDER BY p_retailprice")
    llm = MockLLM(
        rules=[
            (r"Examples:", GOOD_COUNT),  # FINAL_PROMPT
            (r"Write ONE Spark SQL", "SELECT count(*) FROM nation"),  # PRELIM_PROMPT
        ]
    )
    actor = DAILSQLGenerator(
        dataset=[_row("How many nations exist?", ["nation"])],
        spark=spark, llm=llm, fewshot=store, few_shot_num=1,
    )
    out = actor.act(0)
    assert out["pred_sql"] == GOOD_COUNT
    final_prompt = llm.calls[-1]
    assert "How many nations are there?" in final_prompt  # the similar example won
    assert "retail price" not in final_prompt


def test_macsql_refiner_repairs_on_execution_error(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"please fixup old SQL", GOOD_COUNT),
            (r"Decompose the question into sub questions",
             "SELECT count(*) FROM missing_tbl"),
        ]
    )
    out = MACSQLGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out == {"pred_sql": GOOD_COUNT, "refine_rounds": 1}
    assert "### Table = nation" in llm.calls[0]  # Selector's pruned schema reached the prompt


def test_macsql_prompt_section_fidelity(spark):
    """Decomposer + Refiner carry the reference's documented frames
    (MACSQLGenerate.py:204-210 constraints; :434-461 refiner sections):
    bracketed 【...】 sections, the five constraint bullets, the
    step-by-step cue / 'Question Solved.' terminator, and the
    【old SQL】/【correct SQL】 refiner structure."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"please fixup old SQL", GOOD_COUNT),
            (r"Decompose the question into sub questions",
             "SELECT count(*) FROM missing_tbl"),
        ]
    )
    MACSQLGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    dec = llm.calls[0]
    for frag in (
        "【Database schema】", "【Question】", "【Constraints】",
        "just select needed columns",
        "do not include unnecessary table",
        "`JOIN <table>` FIRST, THEN use `SELECT MAX(<column>)`",
        "is NOT NULL",
        "add `GROUP BY <column>` before to select distinct values",
        "thinking step by step",
        "Question Solved.",
    ):
        assert frag in dec, frag
    ref = llm.calls[-1]
    for frag in (
        "【Instruction】", "【Constraints】", "【Query】", "【Database info】",
        "【old SQL】", "【Spark SQL error】", "【correct SQL】",
    ):
        assert frag in ref, frag


def test_chess_unit_tests_score_candidates(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"keywords, keyphrases, and named entities", "KENYA"),
            (
                r"generate a set of \d+ unit tests",
                "<Thinking>distinguish on shape</Thinking>\n<Answer>\n"
                "['The answer SQL query should return a single number', "
                "'The answer SQL query should use count on nation rows']\n"
                "</Answer>",
            ),
            (
                r"evaluate whether or not the response passes",
                "<Thinking>all count</Thinking>\n<Answer>\n"
                "Candidate Response #1: [Passed]\n"
                "Candidate Response #2: [Passed]\n"
                "Candidate Response #3: [Passed]\n</Answer>",
            ),
            (r"Relevant values:", GOOD_COUNT),
        ]
    )
    out = CHESSGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out == {"pred_sql": GOOD_COUNT, "unit_test_passes": 2}


def test_chess_revises_when_winner_fails_a_test(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"keywords, keyphrases, and named entities", ""),
            (
                r"generate a set of \d+ unit tests",
                "<Answer>\n['The answer SQL query should return a single number']\n</Answer>",
            ),
            (
                r"evaluate whether or not the response passes",
                "<Answer>\nCandidate Response #1: [Failed]\n"
                "Candidate Response #2: [Failed]\n"
                "Candidate Response #3: [Failed]\n</Answer>",
            ),
            (r"failed unit tests", GOOD_COUNT),
            (r"Relevant values:", "SELECT n_name FROM nation"),
        ]
    )
    out = CHESSGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == GOOD_COUNT  # revise pass replaced the failing winner
    assert out["unit_test_passes"] == 0


def test_chess_evaluates_candidates_jointly_per_test(spark):
    """One evaluate call per unit test covers ALL candidates (the reference
    flow), and per-candidate verdicts pick the best scorer."""
    register_tables(spark, SF_SMALL, ["nation"])
    variant_sqls = iter([
        "SELECT n_name FROM nation",
        GOOD_COUNT,
        "SELECT 1",
    ])
    llm = MockLLM(
        rules=[
            (r"keywords, keyphrases, and named entities", ""),
            (
                r"generate a set of \d+ unit tests",
                "<Answer>\n['The answer SQL query should use count', "
                "'The answer SQL query should target nation']\n</Answer>",
            ),
            (
                r"evaluate whether or not the response passes",
                "<Answer>\nCandidate Response #1: [Failed]\n"
                "Candidate Response #2: [Passed]\n"
                "Candidate Response #3: [Failed]\n</Answer>",
            ),
            (r"Relevant values:", lambda m, p: next(variant_sqls)),
        ]
    )
    out = CHESSGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out == {"pred_sql": GOOD_COUNT, "unit_test_passes": 2}
    evals = [p for p in llm.calls if "evaluate whether or not" in p]
    assert len(evals) == 2  # one call per unit test, not per candidate
    assert all("Candidate Response #3" in p for p in evals)


def test_chess_prompt_template_fidelity(spark):
    """Templates carry the reference's documented sections
    (CHESSPrompt.py:22-60, 1669-1710): starred section headers,
    <Thinking>/<Answer> tags, the 'should mention/state/use' phrasing
    rule, and [Passed]/[Failed] verdict format."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"keywords, keyphrases, and named entities", ""),
            (
                r"generate a set of \d+ unit tests",
                "<Answer>\n['The answer SQL query should use count']\n</Answer>",
            ),
            (
                r"evaluate whether",
                "<Answer>\nCandidate Response #1: [Passed]\n"
                "Candidate Response #2: [Passed]\n"
                "Candidate Response #3: [Passed]\n</Answer>",
            ),
            (r"Relevant values:", GOOD_COUNT),
        ]
    )
    CHESSGenerator(dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm).act(0)
    gen = next(p for p in llm.calls if "generate a set of" in p)
    for section in ("** Instructions: **", "** Database Schema: **",
                    "** Question: **", "** Candidate Clusters: **",
                    "** Output Format: **"):
        assert section in gen, section
    assert "distinguish the candidate responses from each other" in gen
    assert "'The answer SQL query should mention...'" in gen
    assert "<Thinking>" in gen and "<Answer>" in gen
    # r5: the cluster framing (CHESSPrompt.py:1685-1687) — candidates
    # grouped by shared execution result, VERY IMPORTANT logic-only rule
    assert "VERY IMPORTANT:" in gen
    assert "clusters of the candidate responses" in gen
    assert "Cluster #1:" in gen and "Shared execution result:" in gen
    ev = next(p for p in llm.calls if "evaluate whether" in p)
    assert "** Unit Test: **" in ev
    assert "'[Passed]' or '[Failed]'" in ev
    assert "Candidate Response #1: [Passed]" in ev  # output-format example
    assert "Execution preview:" in ev  # Spark grounding kept alongside


def test_reforce_probes_refines_and_votes(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"understand values in related columns", "SELECT n_name FROM nation LIMIT 2"),
            (r"attempt 1\b", "SELECT * FROM missing_tbl"),
            (r"attempt", GOOD_COUNT),
            (r"The error information is", GOOD_COUNT),
        ]
    )
    out = ReFoRCEGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out == {"pred_sql": GOOD_COUNT, "votes": 3}  # refined attempt 1 joins the majority
    gen_prompt = next(p for p in llm.calls if "column exploration" in p)
    assert "SELECT n_name FROM nation LIMIT 2" in gen_prompt  # probe evidence fed back


def test_reforce_prompt_section_fidelity(spark):
    """The three ReFoRCE stages carry the reference's documented frames
    (ReFoRCEGenerate.py:100-116 exploration, 118-137 self-refine, 252-258
    self-correct)."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"understand values in related columns", "SELECT n_name FROM nation LIMIT 2"),
            (r"attempt 1\b", "SELECT * FROM missing_tbl"),
            (r"attempt", GOOD_COUNT),
            (r"The error information is", GOOD_COUNT),
        ]
    )
    ReFoRCEGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    probe = llm.calls[0]
    assert "Spark SQL queries from simple to complex to understand values" in probe
    assert "Don't query about any SCHEMA or checking data types" in probe
    assert "Try to use DISTINCT. For each SQL LIMIT 20 rows." in probe
    assert "--Description:" in probe
    assert "You can only use tables in the provided schema." in probe
    gen = next(p for p in llm.calls if "attempt 1" in p)
    assert gen.startswith("Database schema:")
    assert "Some few-shot examples after column exploration may be helpful:" in gen
    assert "Please think step by step and answer only one complete SQL" in gen
    assert "When asked something without stating name or id, return both of them." in gen
    assert "When asked percentage decrease, you should return a positive value." in gen
    refine = next(p for p in llm.calls if "The error information is" in p)
    assert refine.startswith("Input sql:")
    assert "Please correct it based on previous context" in refine
    assert "Don't just analyze without SQL or output several SQLs." in refine


def test_rslsql_bidirectional_links_prefer_slim_on_agreement(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"List the needed columns", "[nation.n_name]"),
            (r"Write ONE Spark SQL", "SELECT n_name FROM nation"),
        ]
    )
    out = RSLSQLGenerator(
        dataset=[_row("Name the nations", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == "SELECT n_name FROM nation"
    assert "nation.n_name" in out["schema_links"]
    slim_prompts = [p for p in llm.calls if "### Table = nation, columns = [n_name]" in p]
    assert slim_prompts  # the slim linked schema was actually used


def test_rslsql_empty_result_correction(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    empty_sql = "SELECT n_name FROM nation WHERE n_name = 'NO_SUCH'"
    llm = MockLLM(
        rules=[
            (r"List the needed columns", "[nation.n_name]"),
            (r"returned no rows", "SELECT n_name FROM nation"),
            (r"Write ONE Spark SQL", empty_sql),
        ]
    )
    out = RSLSQLGenerator(
        dataset=[_row("Name the nations", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == "SELECT n_name FROM nation"


def test_recursive_per_table_then_join_merge(spark):
    """Stage 0 answers the reference's JSON-array format (one object per
    table); the merge stage plans via the is_final JSON shape; prompts
    carry the documented frames (RecursivePrompt.py:106-158, 160-242)."""
    register_tables(spark, SF_SMALL, ["nation", "region"])
    merged = (
        "SELECT n.n_name, r.r_name FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey"
    )
    stage0_json = (
        '```json\n[\n'
        ' {"table": "nation", "sub_question": "names", '
        '"chain_of_thought": "...", "sql": "SELECT n_name, n_regionkey FROM nation"},\n'
        ' {"table": "region", "sub_question": "regions", '
        '"chain_of_thought": "...", "sql": "SELECT r_name, r_regionkey FROM region"}\n'
        ']\n```'
    )
    final_json = '{"is_final": true, "final_sql": "%s"}' % merged
    llm = MockLLM(
        rules=[
            (r"List the tables needed", "nation, region"),
            (r"decomposing complex queries into single-table operations", stage0_json),
            (r"Plan the Next Merge Step", final_json),
        ]
    )
    out = RecursiveGenerator(
        dataset=[_row("Nation names with their region names", ["nation", "region"])],
        spark=spark, llm=llm,
    ).act(0)
    assert out["pred_sql"] == merged
    stage0 = next(p for p in llm.calls if "single-table operations" in p)
    assert "### Important Rules:" in stage0
    assert "2. **Single table only**" in stage0
    assert "Only output the JSON array as your response." in stage0
    merge = next(p for p in llm.calls if "Plan the Next Merge Step" in p)
    assert "**Stage 1** of a recursive SQL construction process" in merge
    assert "**2 active queries**" in merge
    assert "query_0:" in merge and "query_1:" in merge
    assert "Execution result:" in merge  # execution evidence fed to the planner
    assert '"is_final": true' in merge and '"merge_operations"' in merge


def test_recursive_merge_operations_stage_then_final(spark):
    """A non-final plan consumes two queries via merge_operations and the
    next stage finishes; plain-SQL replies fall back to pairwise merge."""
    register_tables(spark, SF_SMALL, ["nation", "region", "customer"])
    stage0_json = (
        '[{"table": "nation", "sql": "SELECT n_name, n_regionkey FROM nation"},'
        ' {"table": "region", "sql": "SELECT r_name, r_regionkey FROM region"},'
        ' {"table": "customer", "sql": "SELECT c_custkey, c_nationkey FROM customer"}]'
    )
    mid = ("SELECT n.n_name, r.r_name, n.n_nationkey FROM nation n "
           "JOIN region r ON n.n_regionkey = r.r_regionkey")
    final = (mid.replace("SELECT", "SELECT c.c_custkey,", 1)
             + " JOIN customer c ON c.c_nationkey = n.n_nationkey")

    def planner(match, prompt):
        if "**3 active queries**" in prompt:
            return ('{"is_final": false, "merge_operations": '
                    '[{"source_query_ids": ["query_0", "query_1"], "sql": "%s"}]}' % mid)
        return '{"is_final": true, "final_sql": "%s"}' % final

    llm = MockLLM(
        rules=[
            (r"List the tables needed", "nation, region, customer"),
            (r"decomposing complex queries into single-table operations", stage0_json),
            (r"Plan the Next Merge Step", planner),
        ]
    )
    out = RecursiveGenerator(
        dataset=[_row("Customers with nation and region names",
                      ["nation", "region", "customer"])],
        spark=spark, llm=llm,
    ).act(0)
    assert out["pred_sql"] == final
    stage2 = [p for p in llm.calls if "**2 active queries**" in p]
    assert stage2 and mid in stage2[0]  # the merged query carried into stage 2


# ---------------------------------------------------------------------------
# Chase selector


def test_chase_consensus_plus_pairwise(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    cands = [
        GOOD_COUNT,
        "SELECT count(*) AS n FROM nation WHERE 1=1",  # equivalent result
        "SELECT 999 AS n",  # minority
    ]
    row = _row("How many nations?", ["nation"])
    row["pred_sql"] = cands
    llm = MockLLM(rules=[(r"Answer A or B", "A")])
    out = ChaseSelector(dataset=[row], spark=spark, llm=llm).act(0)
    assert out["pred_sql"] == GOOD_COUNT  # consensus group of 2 + pairwise win


def test_chase_single_candidate_short_circuits(spark):
    row = _row("q", ["nation"])
    row["pred_sql"] = ["SELECT 1 AS one"]
    llm = MockLLM()
    out = ChaseSelector(dataset=[row], spark=spark, llm=llm).act(0)
    assert out["pred_sql"] == "SELECT 1 AS one"
    assert llm.calls == []


# ---------------------------------------------------------------------------
# registry


def test_named_actors_registered_in_pool():
    for name, klass in [
        ("dinsql", DINSQLGenerator),
        ("dailsql", DAILSQLGenerator),
        ("macsql", MACSQLGenerator),
        ("chessgen", CHESSGenerator),
        ("reforce", ReFoRCEGenerator),
        ("rslsql", RSLSQLGenerator),
        ("recursive", RecursiveGenerator),
    ]:
        assert ActorPool.resolve("generator", name) is klass
    assert ActorPool.resolve("selector", "chase") is ChaseSelector


def test_pool_rejects_punctuation_only_names():
    """A name canonicalizing to '' ('_', '-') must raise, not prefix-match
    every pool key and silently resolve to an arbitrary first entry."""
    import pytest

    for bogus in ("_", "-", "__", "!!"):
        with pytest.raises(KeyError):
            ActorPool.resolve("generator", bogus)


def test_dinsql_missing_label_defaults_to_easy(spark):
    """Review regression (late r4): a classification CoT with NO 'Label:'
    line must default to EASY — the old fallback substring-matched 'NESTED'
    in the CoT phrasing ("doesn't require nested queries") and misrouted
    EASY questions to the hard tier."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"Find the schema_links", "Schema_links: [nation.n_nationkey]"),
            (
                r"classify it as EASY, NON-NESTED, or NESTED",
                "This question doesn't require nested queries with "
                "(INTERSECT, UNION, EXCEPT) so it is simple.",  # no Label:
            ),
            (r".", GOOD_COUNT),
        ]
    )
    out = DINSQLGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["difficulty"] == "EASY"


def test_rslsql_binary_selection_json_frame_fidelity(spark):
    """When the two candidates disagree, the binary selection carries the
    reference BINARY_PROMPT frame (RSLSQLGenerate.py:234-243) and the
    {"sql": ...} json answer selects the matching candidate; the
    self-correction frame carries the reference header/Input/Output/Note
    sections (181-232)."""
    register_tables(spark, SF_SMALL, ["nation"])
    full_sql = "SELECT count(*) AS n FROM nation"
    slim_sql = "SELECT n_name FROM nation WHERE n_name = 'NO_SUCH'"

    def gen(match, prompt):
        # the slim linked schema exposes ONLY n_name; the full schema DDL
        # also lists n_regionkey
        return full_sql if "n_regionkey" in prompt else slim_sql

    llm = MockLLM(
        rules=[
            (r"List the needed columns", "[nation.n_name]"),
            (r"Select the best SQL query", '{"sql": "%s"}' % slim_sql),
            (r"returned no rows", '{"sql": "SELECT n_name FROM nation"}'),
            (r"Write ONE Spark SQL", gen),
        ]
    )
    out = RSLSQLGenerator(
        dataset=[_row("Name the nations", ["nation"])], spark=spark, llm=llm
    ).act(0)
    # json-picked slim candidate was empty -> self-corrected via json reply
    assert out["pred_sql"] == "SELECT n_name FROM nation"
    choose = next(p for p in llm.calls if "Select the best SQL query" in p)
    assert "### Select the best SQL query to answer the  question:" in choose
    assert "Your answer should be returned by json format." in choose
    assert "Candidate 0:" in choose and "Candidate 1:" in choose
    correct = next(p for p in llm.calls if "returned no rows" in p)
    assert correct.startswith(
        "You are an AI agent responsible for generating the correct SQL"
    )
    assert "### Input:" in correct and "### Output:" in correct and "### Note:" in correct
    assert "The first three rows of values in the table:" in correct
    assert "need to be enclosed in backquotes" in correct


def test_extract_sql_and_json_sql_edge_cases():
    """Regression (review late-r4): json fences never leak their tag into
    the 'SQL'; lowercase #sql: markers parse; _json_sql unescapes via JSON
    semantics (non-ASCII survives, no unicode_escape mojibake)."""
    from squrve_spark.llm import extract_sql

    assert extract_sql('```json\n{"is_final": true}\n```') == '{"is_final": true}'
    assert (
        extract_sql("```\n#reason: uses SELECT\n#sql: SELECT 1 AS x\n```")
        == "SELECT 1 AS x"
    )
    got = RSLSQLGenerator._json_sql('{"sql": "SELECT \'caf\\u00e9\' AS c"}')
    assert got == "SELECT 'café' AS c"
    assert RSLSQLGenerator._json_sql("no json here") is None


def test_extract_sql_tagless_fence_keeps_select():
    """Regression (ADVICE r5): a fence whose payload starts immediately with
    SELECT/WITH (no language tag, no newline) must not have the keyword
    swallowed as a tag."""
    from squrve_spark.llm import extract_sql

    assert extract_sql("```SELECT a FROM t```") == "SELECT a FROM t"
    assert (
        extract_sql("```WITH x AS (SELECT 1) SELECT * FROM x```")
        == "WITH x AS (SELECT 1) SELECT * FROM x"
    )
    # a real tag on its own line still strips
    assert extract_sql("```sql\nSELECT a FROM t\n```") == "SELECT a FROM t"
    assert extract_sql("```sql SELECT a FROM t```") == "SELECT a FROM t"


def test_json_sql_skips_echoed_template_placeholder():
    """Regression (ADVICE r5): a reply that echoes the output-format line
    ('{"sql": "SQL statement that meets the user question requirements"}')
    before the real answer must adopt the LAST statement-rooted value, and
    a reply containing ONLY the placeholder parses as None."""
    placeholder = '{"sql": "SQL statement that meets the user question requirements"}'
    reply = (
        "The output format is " + placeholder + "\n"
        'Answer: {"sql": "SELECT `a` FROM `t` WHERE `b` = 1"}'
    )
    assert RSLSQLGenerator._json_sql(reply) == "SELECT `a` FROM `t` WHERE `b` = 1"
    assert RSLSQLGenerator._json_sql(placeholder) is None


def test_chess_revise_frame_and_final_answer_parse(spark):
    """r5 (verdict #4): the revise pass carries template_revise_one's
    documented prose (Task Description / Procedure / Output Format, the
    【Table creation statements】 task section, one-liner rule) and adopts
    the SQL inside <FINAL_ANSWER> tags."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"keywords, keyphrases, and named entities", ""),
            (
                r"generate a set of \d+ unit tests",
                "<Answer>\n['The answer SQL query should return a single number']\n</Answer>",
            ),
            (
                r"evaluate whether",
                "<Answer>\nCandidate Response #1: [Failed]\n"
                "Candidate Response #2: [Failed]\n"
                "Candidate Response #3: [Failed]\n</Answer>",
            ),
            (
                r"You are an SQL database expert tasked with correcting",
                "Step 1: the filter is wrong.\n<FINAL_ANSWER>\n"
                + GOOD_COUNT + "\n</FINAL_ANSWER>",
            ),
            (r"Relevant values:", "SELECT n_name FROM nation"),
        ]
    )
    out = CHESSGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == GOOD_COUNT
    rev = next(p for p in llm.calls if "tasked with correcting" in p)
    for frag in (
        "**Task Description:**", "**Procedure:**", "1. Review Database Schema:",
        "2. Analyze Query Requirements:", "3. Correct the Query:",
        "**Output Format:**", "======= Your task =======",
        "【Table creation statements】", "The SQL query executed was:",
        "The failed unit tests:", "<FINAL_ANSWER></FINAL_ANSWER>",
        "one liner without any line breaks",
    ):
        assert frag in rev, frag


def test_chess_admin_revise_json_contract(spark):
    """r5 (verdict #4): the second revise mode (template_revise_two shape)
    carries the numbered admin instructions and the JSON
    chain_of_thought_reasoning/revised_SQL answer contract; unparseable or
    non-statement replies leave the query unchanged."""
    register_tables(spark, SF_SMALL, ["nation"])
    fixed = "SELECT count(*) AS n FROM nation WHERE n_nationkey IS NOT NULL"
    llm = MockLLM(
        rules=[
            (
                r"database admin instructions",
                '{"chain_of_thought_reasoning": "rule 9: filter nulls", '
                '"revised_SQL": "' + fixed + '"}',
            ),
        ]
    )
    gen = CHESSGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    )
    row = gen.row(0)
    assert gen.revise_with_instructions(GOOD_COUNT, row) == fixed
    prompt = llm.calls[0]
    for frag in (
        "Objective: Your objective is to make sure a query follows the",
        "Database admin instructions:",
        "ORDER BY + LIMIT 1 is preferred",
        "alias names for the tables",
        "filter null values",
        '"chain_of_thought_reasoning"',
        '"revised_SQL"',
        "Predicted query:",
        "Query result:",
    ):
        assert frag in prompt, frag
    # broken JSON -> unchanged
    gen2 = CHESSGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark,
        llm=MockLLM(rules=[(r"admin instructions", "not json at all")]),
    )
    assert gen2.revise_with_instructions(GOOD_COUNT, gen2.row(0)) == GOOD_COUNT


def test_dinsql_example_banks_reference_scale_and_shape(spark):
    """r5 (verdict #4): the tier prompts embed FULL-SIZE example banks in
    the reference's per-tier line shapes (DINSQLGenerate.py:230-436) —
    16 EASY Q/schema_links/SQL triples, 9 MEDIUM IR chains (last two in
    the classification-analysis variant), 8 HARD sub-question
    decompositions — and every example's SQL actually parses."""
    from squrve_spark.actors import example_banks as B

    assert len(B.DIN_EASY_EXAMPLES) >= 15
    assert len(B.DIN_MEDIUM_EXAMPLES) >= 8
    assert len(B.DIN_HARD_EXAMPLES) >= 7

    easy = B.DIN_EASY_BANK
    assert easy.startswith("### Here are some reference examples:")
    assert easy.count('Q: "') == len(B.DIN_EASY_EXAMPLES)
    assert easy.count("schema_links:") == len(B.DIN_EASY_EXAMPLES)
    assert easy.count("SQL: SELECT") == len(B.DIN_EASY_EXAMPLES)

    med = B.DIN_MEDIUM_BANK
    assert med.count("Intermediate_representation:") == len(B.DIN_MEDIUM_EXAMPLES)
    assert med.count("A: Let's think step by step.") == len(B.DIN_MEDIUM_EXAMPLES)
    # the classification-analysis variant appears (reference bank mixes it in)
    assert 'can be classified as "NON-NESTED"' in med
    assert "we need to join these tables = [" in med

    hard = B.DIN_HARD_BANK
    for marker in ("# [Question]:", "# [Schema links]:", "# [Analysis]:", "# [Sql]:"):
        assert hard.count(marker) == len(B.DIN_HARD_EXAMPLES), marker
    assert hard.count("can be solved by knowing the answer to the following sub-question") == len(
        B.DIN_HARD_EXAMPLES
    )
    # shape families carried over: EXCEPT, NOT IN, < max, IN chain, @.@ IR
    assert "EXCEPT SELECT" in hard and "NOT IN (SELECT" in hard
    assert "@.@ <" in hard and "@.@ not in" in hard

    # every example SQL parses AND analyzes against the real star schema
    register_tables(spark, SF_SMALL)
    for _, _, sql in B.DIN_EASY_EXAMPLES:
        spark.sql("EXPLAIN " + sql)
    for ex in B.DIN_MEDIUM_EXAMPLES + B.DIN_HARD_EXAMPLES:
        spark.sql("EXPLAIN " + ex["sql"])
        if "sub_sql" in ex:
            spark.sql("EXPLAIN " + ex["sub_sql"])

    # and the generator actually ships the banks in its prompts
    llm = MockLLM(
        rules=[
            (r"Find the schema_links", "Schema_links: [nation.*]"),
            (r"classify it as EASY", 'Label: "EASY"'),
            (r".", GOOD_COUNT),
        ]
    )
    DINSQLGenerator(dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm).act(0)
    easy_call = next(p for p in llm.calls if "Use the schema links to generate" in p)
    assert easy_call.count('Q: "') == len(B.DIN_EASY_EXAMPLES) + 1  # bank + target


def test_dinsql_link_and_classify_banks_shape(spark):
    """r5: the linking and classification stages carry full-size banks in
    the reference's line shapes — per-example mini schema blocks with
    Foreign_keys lines and the stepwise phrase->column analysis ending in
    Schema_links; classification examples with the tables/JOIN/nesting CoT
    and Label lines across all three labels."""
    from squrve_spark.actors import example_banks as B

    assert len(B.DIN_LINK_EXAMPLES) >= 6
    link = B.DIN_LINK_BANK
    assert link.count("Schema_links: [") == len(B.DIN_LINK_EXAMPLES)
    assert link.count("Foreign_keys = [") >= len(B.DIN_LINK_EXAMPLES)
    assert link.count("we are asked:") == len(B.DIN_LINK_EXAMPLES)
    assert link.count("The set of possible cell values are =") == len(B.DIN_LINK_EXAMPLES)
    assert 'so we need column = [' in link

    assert len(B.DIN_CLASSIFY_EXAMPLES) >= 7
    cls = B.DIN_CLASSIFY_BANK
    assert cls.count("Label: ") == len(B.DIN_CLASSIFY_EXAMPLES)
    for lbl in ('Label: "EASY"', 'Label: "NON-NESTED"', 'Label: "NESTED"'):
        assert lbl in cls, lbl
    assert "needs these tables = [" in cls
    assert 'we need the answer to the questions = ["' in cls  # NESTED subs

    # the generator ships both banks in its stage prompts
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (r"Find the schema_links", "Schema_links: [nation.*]"),
            (r"classify it as EASY", 'Label: "EASY"'),
            (r".", GOOD_COUNT),
        ]
    )
    DINSQLGenerator(dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm).act(0)
    link_call, cls_call = llm.calls[0], llm.calls[1]
    assert link_call.count("Schema_links: [") == len(B.DIN_LINK_EXAMPLES)
    assert cls_call.count("Label: ") == len(B.DIN_CLASSIFY_EXAMPLES)


def test_chess_three_candidate_strategies(spark):
    """r5: each CHESS candidate is generated with a DISTINCT strategy
    template (reference templates generate_candidate one/two/three):
    recursive divide-and-conquer with the 【】 sections and <FINAL_ANSWER>
    contract, query-plan-guided with the admin instructions, and the
    step-by-step data-science-expert frame — and the FINAL_ANSWER reply of
    strategy 1 is adopted."""
    register_tables(spark, SF_SMALL, ["nation"])

    def gen(match, prompt):
        if "FINAL_ANSWER" in prompt:
            return "analysis...\n<FINAL_ANSWER>\n" + GOOD_COUNT + "\n</FINAL_ANSWER>"
        return GOOD_COUNT

    llm = MockLLM(
        rules=[
            (r"keywords, keyphrases, and named entities", ""),
            (
                r"generate a set of \d+ unit tests",
                "<Answer>\n['The answer SQL query should use count']\n</Answer>",
            ),
            (
                r"evaluate whether",
                "<Answer>\nCandidate Response #1: [Passed]\n"
                "Candidate Response #2: [Passed]\n"
                "Candidate Response #3: [Passed]\n</Answer>",
            ),
            (r"Relevant values:", gen),
        ]
    )
    out = CHESSGenerator(
        dataset=[_row("How many nations?", ["nation"])], spark=spark, llm=llm
    ).act(0)
    assert out["pred_sql"] == GOOD_COUNT
    gens = [p for p in llm.calls if "Relevant values:" in p]
    assert len(gens) == 3
    assert "recursive divide-and-conquer" in gens[0]
    assert "【Table creation statements】" in gens[0] and "<FINAL_ANSWER>" in gens[0]
    assert "Query Plan Guided SQL Generation" in gens[1]
    assert "Strictly Follow Hints" in gens[1]
    assert "You are a data science expert." in gens[2]
    assert "think step by step" in gens[2]


def test_chess_keyword_template_and_python_list_parse(spark):
    """r5: keyword extraction carries the template_extract_keywords shape
    (Objective / Instructions / worked examples / Task, Python-list answer)
    and a Python-list reply parses into clean keywords that drive value
    retrieval."""
    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[
            (
                r"keywords, keyphrases, and named entities",
                '["KENYA", "nation names"]',
            ),
            (
                r"generate a set of \d+ unit tests",
                "<Answer>\n['The answer SQL query should use count']\n</Answer>",
            ),
            (
                r"evaluate whether",
                "<Answer>\nCandidate Response #1: [Passed]\n"
                "Candidate Response #2: [Passed]\n"
                "Candidate Response #3: [Passed]\n</Answer>",
            ),
            (r"Relevant values:", GOOD_COUNT),
        ]
    )
    gen = CHESSGenerator(
        dataset=[_row("names of nations like KENYA", ["nation"])], spark=spark, llm=llm
    )
    out = gen.act(0)
    assert out["pred_sql"] == GOOD_COUNT
    kw_call = llm.calls[0]
    for frag in ("Objective: Analyze the given question",
                 "List Keyphrases and Entities:", "Example 1:",
                 "Only output the Python list"):
        assert frag in kw_call, frag
    # the parsed 'KENYA' keyword surfaced a real value-context hit
    gen_call = next(p for p in llm.calls if "Relevant values:" in p)
    assert "KENYA" in gen_call
