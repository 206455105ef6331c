"""DAIL-SQL example-selector family (squrve_spark/actors/dail_selectors.py).

Mirrors the reference's selector registry (DAILSQLGenerate.py:344-354,
1437-1740): every named type must resolve, select deterministically, honor
the same-question / cross-domain exclusions, and the skeleton-threshold
variants must gate-with-backfill (or shift) rather than come up short.
"""

from __future__ import annotations

import pytest

from squrve_spark.actors.dail_selectors import (
    ALL_SELECTOR_TYPES,
    SELECTOR_TYPE,
    EuclideanDistanceMaskPreSkeletonSimilarityThresholdShiftSelector,
    EuclideanDistancePreSkeletonSimilarityThresholdSelector,
    get_example_selector,
)
from squrve_spark.actors.named import DAILSQLGenerator
from squrve_spark.catalog import register_tables
from squrve_spark.fewshot import FewShotStore
from squrve_spark.llm import MockLLM
from tests.conftest import SF_SMALL

# adversarial on purpose: the textually-nearest example has the WRONG
# skeleton (ORDER BY list vs count), and a textually-far one has the right
# skeleton — so distance-only and skeleton-aware types must disagree
POOL = [
    {"db_id": "tpch", "question": "How many suppliers are there, sorted by supplier name?",
     "sql": "SELECT s_name FROM supplier ORDER BY s_name"},
    {"db_id": "tpch", "question": "How many nations are there?",
     "sql": "SELECT count(*) FROM nation"},
    {"db_id": "tpch", "question": "Total tally of stored region records please",
     "sql": "SELECT count(*) FROM region"},
    {"db_id": "shop", "question": "How many customers are there?",
     "sql": "SELECT count(*) FROM customer"},
    {"db_id": "shop", "question": "Show suppliers with balance over 100",
     "sql": "SELECT s_name FROM supplier WHERE s_acctbal > 100"},
]

TARGET = {
    "db_id": "tpch",
    "question": "How many suppliers are there?",
    "query": "SELECT count(*) FROM supplier",
    "pre_sql": "SELECT count(*) FROM supplier",
}


def test_registry_is_complete_and_raises_on_unknown():
    assert len(ALL_SELECTOR_TYPES) == 10
    for name in ALL_SELECTOR_TYPES:
        assert get_example_selector(name) is not None
    with pytest.raises(ValueError):
        get_example_selector("NOPE")


@pytest.mark.parametrize("name", ALL_SELECTOR_TYPES)
def test_every_type_selects_deterministically(name):
    cls = get_example_selector(name)
    a = cls(POOL).get_examples(TARGET, 3)
    b = cls(POOL).get_examples(TARGET, 3)
    assert a == b, f"{name} not deterministic"
    assert len(a) == 3
    assert all(ex["question"] != TARGET["question"] for ex in a)


@pytest.mark.parametrize("name", ALL_SELECTOR_TYPES)
def test_cross_domain_excludes_same_db(name):
    got = get_example_selector(name)(POOL).get_examples(TARGET, 2, cross_domain=True)
    assert got and all(ex["db_id"] != "tpch" for ex in got)


def test_types_produce_distinct_orderings():
    orderings = {
        name: tuple(
            ex["question"]
            for ex in get_example_selector(name)(POOL).get_examples(TARGET, 5)
        )
        for name in ALL_SELECTOR_TYPES
    }
    # the distance family shares a metric, but the registry as a whole must
    # not collapse to one ordering (random / skeleton signals differ)
    assert len(set(orderings.values())) >= 3
    # distance-only ranks the ORDER BY-skeleton question first (textually
    # nearest); every pre-skeleton-aware type must demote it
    near_wrong = POOL[0]["question"]
    assert orderings[SELECTOR_TYPE.EUC_DISTANCE][0] == near_wrong
    for name in (
        SELECTOR_TYPE.EUC_DISTANCE_PRE_SKELETON_SIMILARITY_THRESHOLD,
        SELECTOR_TYPE.EUC_DISTANCE_PRE_SKELETON_SIMILARITY_PLUS,
        SELECTOR_TYPE.EUC_DISTANCE_MASK_PRE_SKELETON_SIMILARITY_THRESHOLD,
        SELECTOR_TYPE.EUC_DISTANCE_MASK_PRE_SKELETON_SIMILARITY_THRESHOLD_SHIFT,
    ):
        assert orderings[name][0] != near_wrong, name


def test_skeleton_gate_backfills_to_requested_count():
    # only the two count-shaped same-skeleton examples pass the 0.85 gate;
    # asking for 4 must backfill with gated-out rows, in distance order
    sel = EuclideanDistancePreSkeletonSimilarityThresholdSelector(POOL)
    got = sel.get_examples(TARGET, 4)
    assert len(got) == 4
    skels = [ex["sql"].split()[-1] for ex in got]
    assert any("ORDER" in ex["sql"] or "WHERE" in ex["sql"] for ex in got), skels


def test_shift_variant_reorders_instead_of_dropping():
    sel = EuclideanDistanceMaskPreSkeletonSimilarityThresholdShiftSelector(POOL)
    got = sel.get_examples(TARGET, len(POOL))
    # nothing dropped: every admissible pool row appears exactly once
    assert sorted(ex["question"] for ex in got) == sorted(ex["question"] for ex in POOL)
    # count-skeleton rows (passing the gate) come before the shifted block
    first_two = {got[0]["sql"], got[1]["sql"]}
    assert all("count(*)" in s for s in first_two)


def test_dailsql_generator_accepts_selector_type(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    store = FewShotStore()
    for ex in POOL:
        store.add("spark", ex["question"], ex["sql"])
    good = "SELECT count(*) AS n FROM nation"
    llm = MockLLM(rules=[(r"Examples:", good), (r"Write ONE Spark SQL", good)])
    actor = DAILSQLGenerator(
        dataset=[{
            "instance_id": 0, "db_id": "tpch", "db_type": "spark",
            "question": "How many nations exist?", "query": "", "tables": ["nation"],
        }],
        spark=spark, llm=llm, fewshot=store, few_shot_num=2,
        selector_type=SELECTOR_TYPE.EUC_DISTANCE_QUESTION_MASK,
    )
    out = actor.act(0)
    assert out["pred_sql"] == good
    final_prompt = llm.calls[-1]
    assert "How many nations are there?" in final_prompt  # nearest neighbour won
