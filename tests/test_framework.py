"""Framework-layer tests: transpiler, comparator, execution wrapper,
evaluator, actors/tasks/engine — the SURVEY §2.B surface.

The capstone is SURVEY §7.2's minimum end-to-end slice: catalog -> mock-LLM
generator -> spark.sql execution -> EX comparator -> 1.0, with zero network.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from squrve_spark import compare as C
from squrve_spark import execution as X
from squrve_spark.catalog import register_tables
from squrve_spark.config import Router
from squrve_spark.data import (
    Dataset,
    TPCH_FOREIGN_KEYS,
    TPCH_PRIMARY_KEYS,
    central_schema_from_catalog,
    central_to_parallel,
    filter_dataset,
    parallel_to_central,
    render_schema_ddl,
)
from squrve_spark.evaluate import Evaluator, pass_at_n, schema_precision, schema_recall
from squrve_spark.llm import MockLLM, extract_sql
from squrve_spark.transpile import transpile
from tests.conftest import SF_SMALL

# ---------------------------------------------------------------------------
# transpiler


@pytest.mark.parametrize(
    "src,expect",
    [
        ("SELECT strftime('%Y', o_orderdate) FROM orders", "CAST(year(o_orderdate) AS STRING)"),
        ("SELECT strftime('%Y-%m', d) FROM t", "date_format(d, 'yyyy-MM')"),
        ("SELECT CAST(a AS REAL) / b FROM t", "CAST(a AS DOUBLE)"),
        ("SELECT IIF(a > 1, 'x', 'y') FROM t", "IF(a > 1, 'x', 'y')"),
        ('SELECT "col name" FROM t', "SELECT `col name` FROM t"),
        ("SELECT date(d, '-2 years') FROM t", "add_months(d, -24)"),
        ("SELECT date(d, '+3 months') FROM t", "add_months(d, 3)"),
        ("SELECT date(d, '-7 days') FROM t", "date_add(d, -7)"),
        ("SELECT julianday(a) - julianday(b) FROM t", "datediff(a, b)"),
        # sqlite %w is '0'=Sunday..'6'=Saturday; Spark dayofweek is 1=Sunday
        ("SELECT strftime('%w', d) FROM t", "CAST(dayofweek(d) - 1 AS STRING)"),
    ],
)
def test_transpile_rules(src, expect):
    assert expect in transpile(src, "sqlite")


def test_transpile_preserves_string_literals():
    sql = "SELECT * FROM t WHERE note = 'strftime(''%Y'', x) AS REAL'"
    assert transpile(sql, "sqlite") == sql


def test_transpile_qualify(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    out = transpile(
        "SELECT n_name, n_regionkey FROM nation "
        "QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1",
        "snowflake",
    )
    assert "QUALIFY" not in out.upper() or "__qualify" in out
    rows = spark.sql(out).collect()
    assert len(rows) == 5  # one nation per region


def test_transpile_spark_passthrough():
    q = "SELECT 1 AS x"
    assert transpile(q, "spark") == q


@pytest.mark.parametrize(
    "src,expect",
    [
        # computed-modifier date arithmetic (r7): engine-portable make_date
        (
            "SELECT date(d, '-' || (n - 1) || ' years') FROM t",
            "make_date(year(CAST(d AS DATE)) + CAST('-' || (n - 1) AS INT), "
            "month(CAST(d AS DATE)), day(CAST(d AS DATE)))",
        ),
        ("SELECT date(d, x || ' days') FROM t", "(CAST(d AS DATE) + CAST(x AS INT))"),
        # months route through total-month floor arithmetic
        ("SELECT date(d, m || ' months') FROM t", "make_date(CAST(floor("),
        # static modifiers keep the typed single-function form
        ("SELECT date(d, '-2 years') FROM t", "add_months(d, -24)"),
    ],
)
def test_transpile_computed_date_modifier(src, expect):
    assert expect in transpile(src, "sqlite")


def test_transpile_computed_date_values(spark):
    out = transpile(
        "SELECT date('2020' || '-01-01', '-' || (3 - 1) || ' years') AS d", "sqlite"
    )
    assert spark.sql(out).collect()[0]["d"].isoformat() == "2018-01-01"
    out = transpile("SELECT date(DATE'2020-03-15', (0 - 14) || ' months') AS d", "sqlite")
    assert spark.sql(out).collect()[0]["d"].isoformat() == "2019-01-15"
    out = transpile("SELECT date(DATE'2020-03-15', '+' || 20 || ' days') AS d", "sqlite")
    assert spark.sql(out).collect()[0]["d"].isoformat() == "2020-04-04"


@pytest.mark.parametrize(
    "src,expect",
    [
        # bare column under GROUP BY -> any_value (sqlite tolerance)
        (
            "SELECT T1.title FROM course T1 JOIN p ON x GROUP BY T1.course_id",
            "any_value(T1.title) AS title",
        ),
        # multiple bare columns, aggregates untouched
        (
            "SELECT a.x, count(*), a.y AS z FROM t a GROUP BY a.k",
            "any_value(a.x) AS x, count(*), any_value(a.y) AS z",
        ),
        # grouped columns (any qualifier) stay bare
        (
            "SELECT T1.name FROM t T1 GROUP BY name",
            "SELECT T1.name FROM t T1 GROUP BY name",
        ),
        # GROUP BY ordinal resolves to the select item
        ("SELECT x, count(*) FROM t GROUP BY 1", "SELECT x, count(*) FROM t GROUP BY 1"),
        # no GROUP BY -> untouched
        ("SELECT a.x FROM t a", "SELECT a.x FROM t a"),
        # subquery block rewritten independently of the outer block
        (
            "SELECT * FROM (SELECT b.v FROM u b GROUP BY b.g) s",
            "SELECT * FROM (SELECT any_value(b.v) AS v FROM u b GROUP BY b.g) s",
        ),
        # grouped subquery INSIDE an outer grouped select list: the inner
        # edit shifts the outer block's offsets — trailing bare columns must
        # still be wrapped whole, never split mid-identifier
        (
            "SELECT bare, (SELECT ib FROM u GROUP BY uk) AS s,"
            " longtrailingcolumn FROM t GROUP BY gk",
            "any_value(longtrailingcolumn) AS longtrailingcolumn",
        ),
        (
            "SELECT bare, (SELECT ib FROM u GROUP BY uk) AS s,"
            " longtrailingcolumn FROM t GROUP BY gk",
            "(SELECT any_value(ib) AS ib FROM u GROUP BY uk) AS s",
        ),
        # qualifier mismatch on both sides is NOT grouped -> wrapped
        (
            "SELECT t2.a FROM t1 JOIN t2 ON t1.k = t2.k GROUP BY t1.a",
            "any_value(t2.a) AS a",
        ),
        # matching qualified forms stay bare
        (
            "SELECT t1.a FROM t1 GROUP BY t1.a",
            "SELECT t1.a FROM t1 GROUP BY t1.a",
        ),
        # select unqualified / key qualified: base-name fallback keeps it bare
        (
            "SELECT name FROM t T1 GROUP BY T1.name",
            "SELECT name FROM t T1 GROUP BY T1.name",
        ),
    ],
)
def test_transpile_bare_group_columns(src, expect):
    assert expect in transpile(src, "sqlite").replace("  ", " ").replace(" ,", ",")


def test_repair_unresolved_stale_qualifier():
    from squrve_spark.transpile import repair_unresolved

    err = (
        "[UNRESOLVED_COLUMN.WITH_SUGGESTION] A column, variable, or function "
        "parameter with name `T1`.`name` cannot be resolved. Did you mean one "
        "of the following? [`T4`.`name`, `T4`.`years`, `T4`.`rowNumber`]."
    )
    assert (
        repair_unresolved("SELECT DISTINCT T1.name FROM (SELECT 1) T4", err)
        == "SELECT DISTINCT T4.name FROM (SELECT 1) T4"
    )
    # ambiguous (two same-base candidates) and no-candidate cases refuse
    err2 = err.replace("`T4`.`years`", "`T5`.`name`")
    assert repair_unresolved("SELECT T1.name FROM x", err2) is None
    err3 = (
        "[UNRESOLVED_COLUMN.WITH_SUGGESTION] A column, variable, or function "
        "parameter with name `spent` cannot be resolved. Did you mean one of "
        "the following? [`Name`]."
    )
    assert repair_unresolved("SELECT Name FROM t ORDER BY spent", err3) is None
    # string literals are never rewritten
    err4 = err
    out = repair_unresolved("SELECT T1.name, 'T1.name' FROM (SELECT 1) T4", err4)
    assert out == "SELECT T4.name, 'T1.name' FROM (SELECT 1) T4"


# ---------------------------------------------------------------------------
# comparator


def test_compare_basic_equival():
    gold = [(1, "a"), (2, "b")]
    assert C.compare_result_sets([(1, "a"), (2, "b")], gold) == 1
    assert C.compare_result_sets([(2, "b"), (1, "a")], gold) == 0  # order-sensitive
    assert C.compare_result_sets([(2, "b"), (1, "a")], gold, ignore_order=True) == 1


def test_compare_numeric_tolerance_and_na():
    gold = [(1.0, None), (2.0, 5)]
    pred = [(1.005, float("nan")), (2.009, 5)]
    assert C.compare_result_sets(pred, gold) == 1
    assert C.compare_result_sets([(1.02, None), (2.0, 5)], gold) == 0


def test_compare_column_permutation_and_extras():
    gold = [(1, "x"), (2, "y")]
    pred = [("x", 99, 1), ("y", 98, 2)]  # permuted + extra column
    assert C.compare_result_sets(pred, gold) == 1
    assert C.compare_result_sets(pred, gold, strict_columns=True) == 0


def test_compare_distinct_pred_columns():
    # both gold columns equal -> pred must supply TWO matching columns
    gold = [(1, 1), (2, 2)]
    assert C.compare_result_sets([(1, 1), (2, 2)], gold) == 1
    assert C.compare_result_sets([(1,), (2,)], gold) == 0


def test_quick_reject():
    assert C.quick_reject([(1,)], [(1,), (2,)], ignore_order=False)
    assert not C.quick_reject([(1.001,)], [(1.0,)], ignore_order=False)


def test_compare_spark_frames(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id int, s string")
    assert C.compare_spark_frames(a, b) == 1
    c = spark.createDataFrame([(1, "x"), (3, "y")], "id int, s string")
    assert C.compare_spark_frames(a, c) == 0


# ---------------------------------------------------------------------------
# execution wrapper


def test_execute_protocol(spark):
    register_tables(spark, SF_SMALL, ["region"])
    df, err = X.get_sql_exec_result(sql_query="SELECT count(*) AS n FROM region", spark=spark)
    assert err is None and df["n"][0] == 5
    df, err = X.get_sql_exec_result(sql_query="SELECT * FROM no_such_table", spark=spark)
    assert df is None and "no_such_table" in err


def test_execute_row_cap(spark):
    register_tables(spark, SF_SMALL, ["lineitem"])
    res = X.execute(spark, "SELECT * FROM lineitem", row_cap=100)
    assert res.capped and len(res.df) == 100


def test_execute_sql_stringified(spark):
    register_tables(spark, SF_SMALL, ["region"])
    s = X.execute_sql(spark, "SELECT r_name FROM region ORDER BY r_name LIMIT 2")
    assert "AFRICA" in s
    assert "No data found" in X.execute_sql(spark, "SELECT 1 WHERE 1=0")


def test_execute_timing(spark):
    elapsed, (df, err) = X.get_sql_exec_result_with_time(
        sql_query="SELECT 1 AS one", spark=spark
    )
    assert err is None and elapsed > 0


# ---------------------------------------------------------------------------
# dataset + schema formats


def test_dataset_roundtrip(tmp_path):
    ds = Dataset([{"instance_id": i, "db_size": i * 10} for i in range(10)])
    ds.setitem(0, "pred_sql", "SELECT 1")
    assert ds[0]["pred_sql"] == "SELECT 1"
    p = tmp_path / "ds.json"
    ds.save(str(p))
    assert len(Dataset.load(str(p))) == 10
    assert len(filter_dataset(ds, "db_size-l-50")) == 5
    assert len(filter_dataset(ds, ["db_size-me-50", "db_size-le-70"])) == 3
    assert len(Dataset(list(ds), sample=0.3)) == 3


def test_schema_formats(spark):
    register_tables(spark, SF_SMALL)
    central = central_schema_from_catalog(
        spark, "tpch", ["region", "nation"], TPCH_PRIMARY_KEYS,
        TPCH_FOREIGN_KEYS, {"region.r_name": "region name"},
    )
    assert central["column_names_original"][0] == [-1, "*"]
    assert len(central["foreign_keys"]) == 1  # nation.n_regionkey -> region.r_regionkey
    cols = central_to_parallel(central)
    nrk = next(c for c in cols if c["column_name"] == "n_regionkey")
    assert nrk["foreign_key"] == "[region(r_regionkey)]"
    rrk = next(c for c in cols if c["column_name"] == "r_regionkey")
    assert rrk["primary_key"]
    ddl = render_schema_ddl(cols)
    assert "### Table = region" in ddl and "### Foreign Keys:" in ddl
    back = parallel_to_central(cols)
    assert back["table_names_original"] == ["region", "nation"]


def test_composite_pk(spark):
    register_tables(spark, SF_SMALL, ["lineitem"])
    central = central_schema_from_catalog(spark, "t", ["lineitem"], TPCH_PRIMARY_KEYS)
    assert isinstance(central["primary_keys"][0], list)  # composite kept as list


# ---------------------------------------------------------------------------
# schema metrics + router


def test_schema_metrics():
    gold = ["orders.o_custkey", "customer.c_custkey"]
    assert schema_recall(gold, ["orders.o_custkey"]) == 0.5
    assert schema_precision(gold, ["orders.o_custkey", "nation.n_name"]) == 0.5
    assert schema_recall(gold, "[orders.o_custkey, customer.c_custkey]") == 1.0
    assert schema_recall(gold, [["orders", "o_custkey"]]) == 0.5
    df = pd.DataFrame([{"table_name": "orders", "column_name": "o_custkey"}])
    assert schema_recall(gold, df) == 0.5


def test_router(tmp_path):
    cfg = tmp_path / "c.json"
    cfg.write_text('{"llm": {"temperature": 0.1}, "task": {"open_parallel": true}}')
    r = Router(str(cfg), max_workers=7)
    assert r.temperature == 0.1 and r.open_parallel is True and r.max_workers == 7
    assert r.debug_turn_n == 2  # reference default preserved
    assert r.section("llm") == {"temperature": 0.1}


def test_pass_at_n():
    assert pass_at_n([[0, 1, 0], [1, 0, 0]]) == pytest.approx(2 / 3)


def test_extract_sql():
    assert extract_sql("```sql\nSELECT 1;\n```") == "SELECT 1"
    assert extract_sql("Sure: SELECT a FROM t;") == "SELECT a FROM t"


# ---------------------------------------------------------------------------
# end-to-end: SURVEY §7.2 minimum slice + actor machinery


def _mk_engine(spark, rows, llm=None):
    from squrve_spark.tasks import Engine

    register_tables(spark, SF_SMALL)
    return Engine(Router(), spark=spark, llm=llm, dataset=Dataset(rows))


def test_end_to_end_gold_passthrough(spark):
    """catalog -> ZeroReducer -> gold generator -> spark.sql -> EX = 1.0"""
    rows = [
        {
            "instance_id": 0,
            "db_id": "tpch",
            "db_type": "spark",
            "question": "How many orders are there?",
            "query": "SELECT count(*) AS n FROM orders",
            "tables": ["orders"],
        }
    ]
    eng = _mk_engine(spark, rows)
    eng.add_task("reduce1", "reduce", "zero")
    eng.add_task("gen1", "generate", "gold")
    eng.execute(["reduce1", "gen1"])
    assert eng.dataset[0]["pred_sql"] == rows[0]["query"]
    res = eng.evaluate(["execute_accuracy"])
    assert res["execute_accuracy"]["avg"] == 1.0


def test_end_to_end_mock_llm_pipeline(spark):
    """Mock-LLM generator with execution-feedback debug: first answer is
    broken SQL, the engine's error message drives the repair round."""
    llm = MockLLM(
        rules=[
            (r"failed with error", "SELECT count(*) AS n FROM orders"),
            (r"Write ONE Spark SQL", "SELECT count(*) FROM no_table"),
        ]
    )
    rows = [
        {
            "instance_id": 0,
            "db_id": "tpch",
            "db_type": "spark",
            "question": "How many orders?",
            "query": "SELECT count(*) AS n FROM orders",
            "tables": ["orders"],
        }
    ]
    eng = _mk_engine(spark, rows, llm)
    eng.add_task("gen", "generate", "llmgen")
    eng.execute(["gen"])
    assert eng.dataset[0]["pred_sql"] == "SELECT count(*) AS n FROM orders"
    assert eng.evaluate(["execute_accuracy"])["execute_accuracy"]["avg"] == 1.0


def test_fastexec_selector_consensus(spark):
    """3 candidates: two agree (one slower), one wrong -> consensus winner."""
    register_tables(spark, SF_SMALL)
    rows = [
        {
            "instance_id": 0,
            "db_type": "spark",
            "question": "count orders",
            "query": "SELECT count(*) AS n FROM orders",
            "pred_sql": [
                "SELECT count(*) AS n FROM orders",
                "SELECT count(o_orderkey) AS cnt FROM orders",  # same result set
                "SELECT count(*) AS n FROM orders WHERE o_orderkey < 0",  # wrong
            ],
        }
    ]
    eng = _mk_engine(spark, rows)
    eng.add_task("sel", "select", "fastexec")
    eng.execute(["sel"])
    chosen = eng.dataset[0]["pred_sql"]
    assert "WHERE" not in chosen
    assert eng.evaluate(["execute_accuracy"])["execute_accuracy"]["avg"] == 1.0


def test_parser_and_metrics(spark):
    rows = [
        {
            "instance_id": 0,
            "question": "total revenue by n_name nation name",
            "tables": ["nation"],
            "gold_schemas": ["nation.n_name"],
        }
    ]
    eng = _mk_engine(spark, rows)
    eng.add_task("parse", "parse", "heuristic")
    eng.execute(["parse"])
    assert "nation.n_name" in eng.dataset[0]["schema_links"]
    res = eng.evaluate(["parse_recall", "parse_precision"])
    assert res["parse_recall"]["avg"] == 1.0


def test_retrieval_reducer_and_reduce_metrics(spark):
    rows = [
        {
            "instance_id": 0,
            "question": "customer name and account balance",
            "tables": ["customer", "region"],
            "gold_schemas": ["customer.c_name", "customer.c_acctbal"],
        }
    ]
    eng = _mk_engine(spark, rows)
    eng.add_task("red", "reduce", "retrieval", top_k=5)
    eng.execute(["red"])
    row = eng.dataset[0]
    assert row["reduced_size"] == 5 and row["schema_size"] > 5
    res = eng.evaluate(["reduce_recall", "reduce_rate"])
    assert res["reduce_recall"]["avg"] == 1.0
    assert res["reduce_rate"]["avg"] > 0


def test_parallel_tasks_and_tree(spark):
    """Two parse tasks under ~p + workflow agent fan-out compose correctly."""
    rows = [
        {"instance_id": 0, "question": "n_name", "tables": ["nation"],
         "query": "SELECT n_name FROM nation", "db_type": "spark"},
        {"instance_id": 1, "question": "r_name", "tables": ["region"],
         "query": "SELECT r_name FROM region", "db_type": "spark"},
    ]
    eng = _mk_engine(spark, rows)
    eng.add_task("p1", "parse", "heuristic")
    eng.add_task("g1", "generate", "gold")
    root = eng.execute(["~p", "p1", "g1"])
    assert root.ended and not root.errors
    assert eng.evaluate(["execute_accuracy"])["execute_accuracy"]["avg"] == 1.0


def test_workflow_agent(spark):
    llm = MockLLM(default="[nation.n_name]")
    rows = [
        {"instance_id": 0, "db_id": "tpch", "db_type": "spark",
         "question": "nation names", "query": "SELECT n_name FROM nation",
         "tables": ["nation"]}
    ]
    eng = _mk_engine(spark, rows, llm)
    eng.add_task("agent", "agent", "workflow",
                 actor_lis=["reducer:zero", ["parser:heuristic"], "generator:gold"])
    eng.execute(["agent"])
    assert eng.dataset[0]["pred_sql"] == "SELECT n_name FROM nation"


def test_multi_workflow_agent_end_to_end(spark):
    """MultiWorkflowAgent (WorkflowAgent.py:159-305): named sub-workflows
    and named actors composed by key, mock-LLM EX = 1.0."""
    llm = MockLLM(default="[nation.n_name]")
    rows = [
        {"instance_id": 0, "db_id": "tpch", "db_type": "spark",
         "question": "nation names", "query": "SELECT n_name FROM nation",
         "tables": ["nation"]}
    ]
    eng = _mk_engine(spark, rows, llm)
    eng.add_task(
        "agent", "agent", "multiworkflow",
        workflows={"W_parse_gen": {
            "actor_lis": ["reducer:zero", ["parser:heuristic"], "generator:gold"],
        }},
        actors={"A_opt": {"actor_name": "optimizer:execfeedback"}},
        actor_lis=["W_parse_gen", "A_opt"],
    )
    eng.execute(["agent"])
    assert eng.dataset[0]["pred_sql"] == "SELECT n_name FROM nation"
    res = eng.evaluate(["execute_accuracy"])
    assert res["execute_accuracy"]["avg"] == 1.0


def test_multi_workflow_agent_fanout_and_actor_args(spark):
    """A list step fans keys out via TreeActor; actor_args reach the
    resolved actor's constructor (here a nested workflow agent built
    entirely from actor_args)."""
    from squrve_spark.actors.families import MultiWorkflowAgent

    rows = [
        {"instance_id": 0, "db_id": "tpch", "db_type": "spark",
         "question": "n", "query": "SELECT n_name FROM nation",
         "tables": ["nation"]}
    ]
    register_tables(spark, SF_SMALL)
    ds = Dataset(rows)
    agent = MultiWorkflowAgent(
        dataset=ds, spark=spark, llm=MockLLM(default="[nation.n_name]"),
        workflows={"W1": {"actor_lis": ["generator:gold"]}},
        actors={"A_nested": {"actor_name": "agent:workflow",
                             "actor_args": {"actor_lis": ["generator:gold"]}}},
        actor_lis=[["W1", "A_nested"], "A_nested"],
    )
    out = agent.act(0)
    assert out["pred_sql"] == "SELECT n_name FROM nation"


def test_multi_workflow_agent_config_errors(spark):
    """Reference error contract: unknown key / malformed workflow / actor
    configs raise with the reference's messages; bad item types TypeError."""
    import pytest
    from squrve_spark.actors.families import MultiWorkflowAgent

    ds = Dataset([{"instance_id": 0}])
    mk = lambda **kw: MultiWorkflowAgent(dataset=ds, spark=spark, llm=MockLLM(), **kw)
    with pytest.raises(ValueError, match="non-empty list"):
        mk(actor_lis=[]).act(0)
    with pytest.raises(ValueError, match="not found in workflows or actors"):
        mk(actor_lis=["nope"]).act(0)
    with pytest.raises(ValueError, match="must contain 'actor_lis'"):
        mk(workflows={"W": {"actor_args": {}}}, actor_lis=["W"]).act(0)
    with pytest.raises(ValueError, match="must contain 'actor_name'"):
        mk(actors={"A": {"actor_args": {}}}, actor_lis=["A"]).act(0)
    with pytest.raises(TypeError, match="must be str or list"):
        mk(actor_lis=[42]).act(0)


def test_workflow_agent_actor_args_reach_constructors(spark):
    """WorkflowAgent.actor_args (WorkflowAgent.py:80-84): per-spec kwargs
    merged into the resolved actor's constructor."""
    from squrve_spark.actors.families import WorkflowAgent

    rows = [{"instance_id": 0, "db_id": "tpch", "db_type": "spark",
             "question": "n", "query": "SELECT n_name FROM nation",
             "tables": ["nation"]}]
    register_tables(spark, SF_SMALL)
    agent = WorkflowAgent(
        dataset=Dataset(rows), spark=spark, llm=MockLLM(),
        actor_lis=["agent:workflow"],
        actor_args={"agent:workflow": {"actor_lis": ["generator:gold"]}},
    )
    assert agent.act(0)["pred_sql"] == "SELECT n_name FROM nation"


def test_exec_feedback_optimizer(spark):
    llm = MockLLM(rules=[(r"Problem: execution error", "SELECT n_name FROM nation")])
    rows = [
        {"instance_id": 0, "db_type": "spark", "question": "names",
         "query": "SELECT n_name FROM nation", "pred_sql": "SELECT nme FROM nation",
         "tables": ["nation"], "schema_ddl": ""}
    ]
    eng = _mk_engine(spark, rows, llm)
    eng.add_task("opt", "optimize", "execfeedback")
    eng.execute(["opt"])
    assert eng.dataset[0]["pred_sql"] == "SELECT n_name FROM nation"


def test_profile_ops(spark):
    from squrve_spark import profile as P

    register_tables(spark, SF_SMALL)
    cols = P.table_columns(spark, "region")
    assert [c["name"] for c in cols] == ["r_regionkey", "r_name"]
    prof = {r["column"]: r for r in P.profile_table(spark.table("region"), exact_distinct=True).collect()}
    assert prof["r_regionkey"]["n_distinct"] == 5 and prof["r_regionkey"]["n_null"] == 0
    assert len(P.sample_values(spark.table("region"), "r_name", 3)) == 3
    assert "### Table = region" in P.describe_for_prompt(spark, "region")


def test_fork_gather_agent(spark):
    """LLM proposes two workflows (one broken generator, one gold); the
    execution-consensus gather picks the working SQL."""
    llm = MockLLM(
        rules=[
            (
                r"Propose up to",
                '["generator:gold"]\n["generator:llmgen"]',
            ),
            (r"Write ONE Spark SQL", "SELECT broken FROM nowhere"),
            (r"failed with error", "SELECT broken FROM nowhere"),
        ]
    )
    rows = [
        {
            "instance_id": 0,
            "db_id": "tpch",
            "db_type": "spark",
            "question": "How many nations?",
            "query": "SELECT count(*) AS n FROM nation",
            "tables": ["nation"],
        }
    ]
    eng = _mk_engine(spark, rows, llm)
    eng.add_task("fg", "agent", "forkgather")
    eng.execute(["fg"])
    assert eng.dataset[0]["pred_sql"] == "SELECT count(*) AS n FROM nation"
    assert eng.evaluate(["execute_accuracy"])["execute_accuracy"]["avg"] == 1.0


def test_dataloader_registry(tmp_path):
    import json as _json

    from squrve_spark.data import DataLoader

    data = [
        {"instance_id": i, "question": f"q{i}", "db_size": i * 10} for i in range(6)
    ]
    p = tmp_path / "dev.json"
    p.write_text(_json.dumps(data))
    loader = DataLoader({"mybench": {"splits": {"dev": str(p)}, "db_type": "spark"}})
    ds = loader.resolve("mybench:dev:")
    assert len(ds) == 6 and ds[0]["db_type"] == "spark" and ds[0]["benchmark"] == "mybench"
    filtered = loader.resolve("mybench:dev:db_size-me-30")
    assert len(filtered) == 3
    with pytest.raises(KeyError):
        loader.resolve("nope:dev:")


def test_task_artifacts_and_pass_n(spark, tmp_path):
    from squrve_spark.llm import ScriptedLLM
    from squrve_spark.tasks import Engine
    from squrve_spark.tasks.core import save_task_artifacts
    from squrve_spark.tasks.engine import run_pass_n

    register_tables(spark, SF_SMALL)
    rows = [
        {"instance_id": 0, "db_type": "spark", "question": "count nations",
         "query": "SELECT count(*) AS n FROM nation", "tables": ["nation"]}
    ]

    # artifacts
    eng = _mk_engine(spark, [dict(r) for r in rows])
    t = eng.add_task("gen", "generate", "gold")
    eng.execute(["gen"])
    rec = save_task_artifacts(t, str(tmp_path))
    assert (tmp_path / "gen.log.json").exists()
    assert (tmp_path / "gen.dataset.json").exists()
    assert rec["ended"] and rec["seconds"] >= 0

    # pass@n: run 1 emits broken SQL, runs 2-3 emit gold -> pass@3 == 1.0
    responses = [
        "SELECT broken FROM nowhere",
        "SELECT count(*) AS n FROM nation",
        "SELECT count(*) AS n FROM nation",
    ]

    def make_engine(i):
        llm = ScriptedLLM([responses[i]] * 3)
        e = _mk_engine(spark, [dict(r) for r in rows], llm)
        gen = e.add_task(f"gen{i}", "generate", "llmgen", debug_turn_n=0)
        e.plan([f"gen{i}"])
        return e

    out = run_pass_n(make_engine, n=3)
    assert out["pass_at_n"] == 1.0
    assert out["run_avgs"][0] == 0.0 and out["run_avgs"][1] == 1.0


def test_schema_diff_reports_drift(spark):
    """Continuous-ingestion schema guard: added/removed tables and columns
    plus type changes between two central-format snapshots."""
    import copy

    from squrve_spark.catalog import register_tables
    from squrve_spark.data import central_schema_from_catalog, schema_diff
    from tests.conftest import SF_SMALL

    register_tables(spark, SF_SMALL, ["nation", "region"])
    old = central_schema_from_catalog(spark, "d", ["nation", "region"])
    new = copy.deepcopy(old)
    # drop region table, change one type, add a column to nation
    new["table_names_original"] = ["nation"]
    keep, types = [], []
    for (t_idx, col), ty in zip(old["column_names_original"], old["column_types"]):
        t_name = old["table_names_original"][t_idx] if t_idx >= 0 else None
        if t_name == "region":
            continue
        keep.append([0 if t_name == "nation" else t_idx, col])
        # UNCONDITIONAL type mutation so type_changes is actually asserted
        types.append("drifted_type" if col == "n_nationkey" else ty)
    keep.append([0, "ingest_ts"]); types.append("timestamp")
    new["column_names_original"], new["column_types"] = keep, types
    d = schema_diff(old, new)
    assert d["removed_tables"] == ["region"]
    assert d["added_columns"] == ["nation.ingest_ts"]
    assert all(c.startswith("region.") for c in d["removed_columns"])
    assert d["added_tables"] == []
    old_ty = dict(
        zip([c for _, c in old["column_names_original"]], old["column_types"])
    )["n_nationkey"]
    assert d["type_changes"] == [("nation.n_nationkey", old_ty, "drifted_type")]
    # identical snapshots -> empty diff everywhere
    d0 = schema_diff(old, old)
    assert all(not v for v in d0.values())
