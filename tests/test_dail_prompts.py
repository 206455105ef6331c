"""DAIL-SQL prompt representations (squrve_spark/actors/dail_prompts.py).

Mirrors the reference registry (DAILSQLGenerate.py:314-341 enums, 910-1305
prompt/example classes, 1741+ factory): every REPR_TYPE and EXAMPLE_TYPE
name must resolve and render its documented shape; the generator must
accept (repr_type, example_format, selector_type) together.
"""

from __future__ import annotations

import pytest

from squrve_spark.actors.dail_prompts import (
    ALL_EXAMPLE_TYPES,
    ALL_REPR_TYPES,
    EXAMPLE_TYPE,
    REPR_TYPE,
    DAILPrompt,
    format_example,
    prompt_factory,
)
from squrve_spark.actors.dail_selectors import SELECTOR_TYPE
from squrve_spark.actors.named import DAILSQLGenerator
from squrve_spark.catalog import register_tables
from squrve_spark.fewshot import FewShotStore
from squrve_spark.llm import MockLLM
from tests.conftest import SF_SMALL

TARGET = {
    "question": "How many nations are there?",
    "tables": [("nation", ["n_nationkey", "n_name", "n_regionkey", "n_comment"])],
    "foreign_keys": [("nation", "n_regionkey", "region", "r_regionkey")],
}
EX = {"question": "How many regions?", "sql": "SELECT count(*) FROM region"}


def test_all_repr_types_resolve_and_render():
    assert len(ALL_REPR_TYPES) == 18
    outs = {}
    for name in ALL_REPR_TYPES:
        out = DAILPrompt(name).format_question(TARGET)
        assert TARGET["question"] in out and "nation" in out, name
        outs[name] = out
    # the five base shapes are visibly distinct
    assert "CREATE TABLE nation" in outs[REPR_TYPE.CODE_REPRESENTATION]
    assert "nation: n_nationkey" in outs[REPR_TYPE.TEXT_REPRESENTATION]
    assert "# nation(n_nationkey" in outs[REPR_TYPE.OPENAI_DEMOSTRATION]
    assert outs[REPR_TYPE.ALPACA_SFT].startswith("Below is an instruction")
    with pytest.raises(ValueError):
        DAILPrompt("NOPE")


def test_modifier_axes():
    base = DAILPrompt(REPR_TYPE.TEXT_REPRESENTATION).format_question(TARGET)
    wfk = DAILPrompt(REPR_TYPE.TEXT_REPRESENTATION_WFK).format_question(TARGET)
    cot = DAILPrompt(REPR_TYPE.TEXT_REPRESENTATION_COT).format_question(TARGET)
    assert "Foreign keys" not in base and "nation.n_regionkey = region.r_regionkey" in wfk
    assert cot.endswith("Let's think step by step.")
    # NUMBERSIGN carries the rule line; its WORULE twin drops it
    assert "only and with no explanation" in DAILPrompt(
        REPR_TYPE.OPENAI_DEMOSTRATION
    ).format_question(TARGET)
    assert "only and with no explanation" not in DAILPrompt(
        REPR_TYPE.OPENAI_DEMOSTRATION_WORULE
    ).format_question(TARGET)


def test_format_target_suffixes():
    assert DAILPrompt(REPR_TYPE.CODE_REPRESENTATION).format_target(TARGET).endswith(
        "\nSELECT "
    )
    assert DAILPrompt(REPR_TYPE.BASIC).format_target(TARGET).endswith("\nA: SELECT ")


def test_all_example_formats_render():
    assert len(ALL_EXAMPLE_TYPES) == 6
    outs = {f: format_example(EX, f) for f in ALL_EXAMPLE_TYPES}
    assert outs[EXAMPLE_TYPE.ONLY_SQL] == EX["sql"]
    assert outs[EXAMPLE_TYPE.QA].startswith("Q: How many regions?")
    assert outs[EXAMPLE_TYPE.OPENAI_DEMOSTRATION_QA].startswith("### How many regions?")
    assert "Answer the following" in outs[EXAMPLE_TYPE.BASIC_QA]
    assert len(set(outs.values())) == 6  # all distinct
    with pytest.raises(ValueError):
        format_example(EX, "NOPE")


def test_icl_prompt_k_shot_composition():
    icl = prompt_factory(REPR_TYPE.OPENAI_DEMOSTRATION, 2, EXAMPLE_TYPE.QA)
    out = icl.format(TARGET, [EX, EX, EX])  # k=2 caps at two examples
    assert out.count("Q: How many regions?") == 2
    assert out.endswith("\nSELECT ")


def test_dailsql_generator_with_repr_and_selector(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    store = FewShotStore()
    store.add("spark", "How many regions are there?", "SELECT count(*) FROM region")
    good = "SELECT count(*) AS n FROM nation"
    llm = MockLLM(rules=[
        (r"### Spark SQL tables", good),      # the NUMBERSIGN final prompt
        (r"Write ONE Spark SQL", good),       # PRELIM_PROMPT
    ])
    out = DAILSQLGenerator(
        dataset=[{
            "instance_id": 0, "db_id": "tpch", "db_type": "spark",
            "question": "How many nations exist?", "query": "", "tables": ["nation"],
        }],
        spark=spark, llm=llm, fewshot=store, few_shot_num=1,
        selector_type=SELECTOR_TYPE.EUC_DISTANCE_QUESTION_MASK,
        repr_type=REPR_TYPE.OPENAI_DEMOSTRATION,
        example_format=EXAMPLE_TYPE.OPENAI_DEMOSTRATION_QA,
    ).act(0)
    assert out["pred_sql"] == good
    final = llm.calls[-1]
    assert "### How many regions are there?" in final  # selected example, NS style
    assert "# nation(n_nationkey" in final             # catalog-derived schema

def test_cot_folds_into_question_line_for_sql_base():
    """r5 (verdict #4): SQLCOT matches the reference's template_question
    ('/* Let's think step by step. Answer the following: ... */',
    DAILSQLGenerate.py:1144) and its format_target carries NO 'SELECT '
    completion stub."""
    p = DAILPrompt(REPR_TYPE.CODE_REPRESENTATION_COT)
    ex = {"question": "How many nations?", "tables": [("nation", ["n_nationkey"])]}
    q = p.format_question(ex)
    assert "/* Let's think step by step. Answer the following: How many nations? */" in q
    assert not q.rstrip().endswith("Let's think step by step.")  # folded, not appended
    assert p.format_target(ex) == q  # no SELECT stub for the CoT variant
    # non-sql COT bases keep the trailing cue (reference classes are
    # degenerate copies there; the trailing form preserves the CoT signal)
    t = DAILPrompt(REPR_TYPE.TEXT_REPRESENTATION_COT).format_question(ex)
    assert t.rstrip().endswith("Let's think step by step.")


def test_icl_prompt_carries_shared_example_prefix():
    """Every reference example style opens with the same prefix line
    (get_example_prefix, DAILSQLGenerate.py:1256-1303)."""
    icl = prompt_factory(REPR_TYPE.CODE_REPRESENTATION, k_shot=2, example_format=EXAMPLE_TYPE.QA)
    target = {"question": "How many nations?", "tables": [("nation", ["n_nationkey"])]}
    exs = [
        {"question": "How many regions?", "sql": "SELECT count(*) FROM region"},
        {"question": "How many parts?", "sql": "SELECT count(*) FROM part"},
    ]
    out = icl.format(target, exs)
    assert out.startswith("/* Some SQL examples are provided based on similar problems: */\n")
    assert out.count("Q: How many") == 2
    # zero-shot: no prefix line
    zero = prompt_factory(REPR_TYPE.CODE_REPRESENTATION, k_shot=0, example_format=EXAMPLE_TYPE.QA)
    assert "similar problems" not in zero.format(target, exs)
