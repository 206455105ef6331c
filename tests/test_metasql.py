"""Meta-SQL decomposition: clause surgery, diagnosis, repair loop."""

from __future__ import annotations

from squrve_spark.catalog import register_tables
from squrve_spark.data import Dataset
from squrve_spark.llm import MockLLM
from squrve_spark.metasql import decompose, diagnose, extract_subqueries, strip_clause
from tests.conftest import SF_SMALL


def test_strip_clause():
    sql = "SELECT a FROM t WHERE x > 1 GROUP BY a HAVING count(*) > 2 ORDER BY a LIMIT 5"
    assert strip_clause(sql, "WHERE") == (
        "SELECT a FROM t GROUP BY a HAVING count(*) > 2 ORDER BY a LIMIT 5"
    )
    # GROUP BY strip takes HAVING with it
    assert strip_clause(sql, "GROUP BY") == "SELECT a FROM t WHERE x > 1 ORDER BY a LIMIT 5"
    assert strip_clause("SELECT a FROM t", "WHERE") is None


def test_strip_ignores_nested_clauses():
    sql = "SELECT a FROM (SELECT a FROM t WHERE b > 1) s WHERE a < 5"
    out = strip_clause(sql, "WHERE")
    assert out == "SELECT a FROM (SELECT a FROM t WHERE b > 1) s"


def test_extract_subqueries():
    sql = "SELECT a FROM t WHERE a IN (SELECT b FROM u) AND c = (SELECT max(d) FROM v)"
    subs = extract_subqueries(sql)
    assert subs == ["SELECT b FROM u", "SELECT max(d) FROM v"]


def test_decompose_names():
    metas = decompose("SELECT a FROM t WHERE x > 1 ORDER BY a")
    assert set(metas) == {"without_where", "without_order_by"}


def test_diagnose_isolates_failing_clause(spark):
    register_tables(spark, SF_SMALL, ["nation"])
    ok = diagnose(spark, "SELECT n_name FROM nation")
    assert ok.diagnosis == "ok"
    # bad column only in WHERE: removal makes it run -> logic:WHERE
    rep = diagnose(spark, "SELECT n_name FROM nation WHERE no_such > 1")
    assert rep.diagnosis == "logic:WHERE"
    syn = diagnose(spark, "SELEC n_name FROM nation")
    assert syn.diagnosis == "syntax"


def test_metasql_optimizer_repairs(spark):
    from squrve_spark.tasks import Engine

    register_tables(spark, SF_SMALL, ["nation"])
    llm = MockLLM(
        rules=[(r"logic error isolated to the WHERE", "SELECT n_name FROM nation WHERE n_regionkey = 0")]
    )
    rows = [
        {
            "instance_id": 0,
            "db_type": "spark",
            "question": "African nations",
            "query": "SELECT n_name FROM nation WHERE n_regionkey = 0",
            "pred_sql": "SELECT n_name FROM nation WHERE wrong_col = 0",
        }
    ]
    eng = Engine(spark=spark, llm=llm, dataset=Dataset(rows))
    eng.add_task("opt", "optimize", "metasql")
    eng.execute(["opt"])
    assert eng.dataset[0]["pred_sql"] == "SELECT n_name FROM nation WHERE n_regionkey = 0"
    assert eng.evaluate(["execute_accuracy"])["execute_accuracy"]["avg"] == 1.0
