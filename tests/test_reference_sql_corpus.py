"""Conformance corpus: the reference's OWN embedded SQL through our dialect layer.

``tests/fixtures/reference_sql_corpus.json`` holds every gold/few-shot SQL
statement harvested from the reference's prompt files (DINSQLGenerate.py
few-shot banks, CHESSPrompt.py walkthroughs, AdaptiveOptimize.py examples,
MACSQLDecompose.py, ... — regenerate with ``tools/harvest_reference_sql.py``).
These strings are the actual SQL text the reference's generators emit and
parse, which makes them the strongest available conformance corpus for
``squrve_spark.transpile``:

1. **Parse gate** — 100% of the corpus must transpile and parse under
   Spark's SQL parser (parse only, no catalog resolution).
2. **Execution parity** — the statements whose tables map onto small
   synthesized fixtures (the Spider university schema, BIRD-style financial/
   restaurant/olympics schemas, generic users/orders examples) are executed
   on BOTH Spark and DuckDB over identical data; every statement that runs
   on both engines must produce identical results. Discovery is by trial
   execution, not inference: a statement that only one engine can run (e.g.
   sqlite's two-arg ``date(x, expr)`` with a computed modifier) lands in
   the not-executable bucket, and the test asserts a floor on how many DID
   execute so the subset can never silently shrink to zero.

Reference parity: the corpus text originates at
/root/reference/core/actor/generator/DINSQLGenerate.py:200-400,
core/actor/prompts/CHESSPrompt.py, core/actor/optimizer/AdaptiveOptimize.py,
core/actor/decomposer/MACSQLDecompose.py (provenance per-entry in the
fixture's ``source`` field).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import re

import pandas as pd
import pytest

from squrve_spark.transpile import repair_unresolved, transpile

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_sql_corpus.json")

with open(FIXTURE) as fh:
    CORPUS = json.load(fh)

IDS = [f"{i:02d}-{e['source'].rsplit('/', 1)[-1].split('.')[0]}" for i, e in enumerate(CORPUS)]


# ---------------------------------------------------------------------------
# synthesized fixture tables
#
# Small deterministic tables covering the schemas the corpus references: the
# public Spider "college_2" university schema, BIRD financial (district/
# client), restaurant (generalinfo/location), olympics (games/city), CDE
# (frpm/satscores), airline, food-inspection, plus the reference's own
# generic examples (users/orders/logs/products/sales/employees/A/B/table).
# Values are chosen so the corpus' literal predicates match rows, and every
# ORDER BY ... LIMIT column is unique per table so top-k is deterministic
# across engines.

def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


TABLES: dict[str, pd.DataFrame] = {
    "classroom": pd.DataFrame({
        "building": ["Taylor", "Packard", "Painter", "Watson", "Garfield"],
        "room_number": ["3128", "101", "514", "120", "119"],
        "capacity": [70, 500, 10, 50, 75],
    }),
    "department": pd.DataFrame({
        "dept_name": ["History", "Finance", "Marketing", "Physics", "Math"],
        "building": ["Painter", "Candlestick", "Tower", "Watson", "Taylor"],
        "budget": [50000.0, 120000.0, 80000.0, 70000.0, 40000.0],
    }),
    "student": pd.DataFrame({
        "ID": ["s1", "s2", "s3", "s4", "s5"],
        "name": ["Zhang", "Shankar", "Brown", "Chavez", "Peltier"],
        "dept_name": ["History", "Finance", "History", "Physics", "math"],
        "tot_cred": [102, 32, 80, 110, 56],
    }),
    "instructor": pd.DataFrame({
        "ID": ["i1", "i2", "i3", "i4", "i5"],
        "name": ["Srinivasan", "Wu", "Soisalon-Soininen", "Katz", "Kim"],
        "dept_name": ["Finance", "Finance", "History", "Physics", "Math"],
        "salary": [65000.0, 90000.0, 60000.0, 75000.0, 40000.0],
    }),
    "course": pd.DataFrame({
        "course_id": ["BIO-101", "CS-101", "CS-190", "CS-315", "PHY-101"],
        "title": ["Intro. to Biology", "Intro. to CS", "Game Design",
                  "Robotics", "Intro. to CS"],
        "dept_name": ["History", "Finance", "Finance", "Finance", "Physics"],
        "credits": [4, 4, 3, 3, 3],
    }),
    "teaches": pd.DataFrame({
        "ID": ["i1", "i2", "i3", "i4", "i1"],
        "course_id": ["BIO-101", "CS-101", "CS-190", "PHY-101", "CS-315"],
        "sec_id": ["1", "1", "2", "1", "1"],
        "semester": ["Spring", "Spring", "Fall", "Spring", "Fall"],
        "YEAR": [2010, 2010, 2009, 2010, 2009],
    }),
    "takes": pd.DataFrame({
        "ID": ["s1", "s2", "s3", "s4", "s5"],
        "course_id": ["BIO-101", "CS-101", "CS-190", "PHY-101", "CS-315"],
        "sec_id": ["1", "1", "2", "1", "1"],
        "semester": ["Fall", "Spring", "Fall", "Fall", "Spring"],
        "YEAR": [2009, 2010, 2003, 2010, 2009],
        "grade": ["A", "B", "A", "C", "B"],
    }),
    "prereq": pd.DataFrame({
        "course_id": ["CS-190", "CS-190", "CS-315", "BIO-101"],
        "prereq_id": ["CS-101", "BIO-101", "CS-101", "PHY-101"],
    }),
    "advisor": pd.DataFrame({
        "s_ID": ["s1", "s2", "s3", "s5"],
        "i_ID": ["i1", "i2", "i3", "i3"],
    }),
    "SECTION": pd.DataFrame({
        "course_id": ["BIO-101", "CS-101", "CS-190", "PHY-101", "CS-315"],
        "sec_id": ["1", "1", "2", "1", "1"],
        "semester": ["Spring", "Spring", "Fall", "Spring", "Fall"],
        # 2009 strictly most frequent: GROUP BY YEAR ORDER BY count(*)
        # DESC LIMIT 1 must be tie-free for cross-engine determinism
        "YEAR": [2009, 2010, 2009, 2010, 2009],
        "building": ["Painter", "Packard", "Taylor", "Watson", "Packard"],
        "room_number": ["514", "101", "3128", "120", "101"],
    }),
    # DIN-SQL's world-cities example + BIRD olympics city share one table
    "city": pd.DataFrame({
        "id": [1, 2, 3, 4],
        "city_name": ["london", "paris", "tokyo", "london"],
        "Status": ["capital", "town", "capital", "village"],
        "Population": [2000, 1200, 400, 1800],
    }),
    "games": pd.DataFrame({
        "id": [10, 11, 12, 13],
        "games_year": [1896, 1948, 1992, 2012],
    }),
    "games_city": pd.DataFrame({
        "games_id": [10, 11, 12, 13],
        "city_id": [2, 1, 1, 1],
    }),
    # BIRD financial
    "district": pd.DataFrame({
        "district_id": [1, 2, 3],
        "A11": [12541, 8507, 9893],
    }),
    "client": pd.DataFrame({
        "client_id": [101, 102, 103, 104],
        "gender": ["F", "M", "F", "M"],
        "birth_date": [_d("1970-12-13"), _d("1995-05-20"),
                       _d("1988-03-02"), _d("2001-07-07")],
        "district_id": [2, 2, 1, 3],
    }),
    # BIRD restaurant
    "generalinfo": pd.DataFrame({
        "id_restaurant": [1, 2, 3, 4],
        "food_type": ["thai", "thai", "pizza", "thai"],
        "city": ["albany", "albany", "albany", "oakland"],
    }),
    "location": pd.DataFrame({
        "id_restaurant": [1, 2, 3, 4],
        "street": ["san pablo ave", "broadway", "san pablo ave", "main st"],
        "street_name": ["san pablo ave", "broadway", "shattuck ave", "main st"],
        "city": ["albany", "albany", "berkeley", "oakland"],
    }),
    # BIRD CDE (column names with spaces/punctuation exercise quoting)
    "frpm": pd.DataFrame({
        "CDSCode": ["c1", "c2", "c3"],
        "Charter School (Y/N)": [1, 0, 1],
    }),
    "satscores": pd.DataFrame({
        "cds": ["c1", "c2", "c3"],
        "sname": ["Alpha High", None, "Gamma High"],
        "NumGE1500": [30, 20, 60],
        "NumTstTakr": [100, 80, 90],
    }),
    "student_programs": pd.DataFrame({
        "program_id": [1, 2, 3],
        "School Category": ["Online Charter", "Classroom", "online"],
        "Program Type": ["Online", "Classroom", "Hybrid"],
        "Participants (Ages 10-15)": [20.0, 15.0, 30.0],
        "Total Enrollment (Ages 10-15)": [40.0, 60.0, 50.0],
    }),
    # BIRD airline
    # exactly ONE row with ORIGIN='SAN' and one with DEST='LAX': the BIRD
    # example's equality-against-subquery only runs when those scalar
    # subqueries are single-row (sqlite silently takes the first row;
    # Spark and DuckDB both raise — data must make the semantics agree)
    "Airlines": pd.DataFrame({
        "FL_DATE": ["2018/8/1", "2018/8/2", "2018/9/1"],
        "ORIGIN": ["SAN", "LAX", "JFK"],
        "DEST": ["LAX", "JFK", "SAN"],
    }),
    "Airports": pd.DataFrame({
        "Code": ["SAN", "LAX", "JFK"],
        "Description": ["San Diego, CA: San Diego International",
                        "Los Angeles, CA: Los Angeles International",
                        "New York, NY: John F. Kennedy International"],
    }),
    # BIRD food inspection
    "businesses": pd.DataFrame({
        "business_id": [1, 2, 3],
        "name": ["Acme Diner", "Bistro Uno", "Cafe Dos"],
    }),
    "inspections": pd.DataFrame({
        "business_id": [1, 1, 1, 1, 2, 2, 3],
        "score": [100, 100, 100, 100, 100, 90, 100],
        "date": [_d("2013-04-01"), _d("2014-05-01"), _d("2015-06-01"),
                 _d("2016-07-01"), _d("2013-04-01"), _d("2015-01-01"),
                 _d("2016-02-01")],
    }),
    # Spider concert_singer
    "stadium": pd.DataFrame({
        "Stadium_ID": [1, 2],
        "Name": ["Stark's Park", "Hampden Park"],
    }),
    "concert": pd.DataFrame({
        "concert_ID": [1, 2, 3],
        "Stadium_ID": [1, 1, 2],
    }),
    "singer": pd.DataFrame({
        "Song_Name": ["Sun", "Gentleman", "You"],
        "Song_release_year": ["1992", "2001", "2013"],
        "Age": [42, 25, 29],
    }),
    # reference's generic walkthrough examples
    "users": pd.DataFrame({
        "id": [1, 2, 3, 4],
        "name": ["an", "bo", "cy", "di"],
        "age": [25, 17, 30, 19],
        "city": ["Beijing", "Beijing", "Shanghai", "Beijing"],
        "status": [1, 1, 0, 1],
    }),
    "orders": pd.DataFrame({
        "user_id": [1, 3, 4, 1],
        "amount": [150.0, 90.0, 300.0, 40.0],
        "status": ["paid", "paid", "pending", "paid"],
    }),
    "logs": pd.DataFrame({
        "date": ["2023-01-01", "2023-01-01", "2023-01-02"],
        "level": ["INFO", "ERROR", "INFO"],
        "server_id": [1, 2, 1],
    }),
    "products": pd.DataFrame({
        "id": [1, 2, 3],
        "name": ["p1", "p2", "p3"],
    }),
    "sales": pd.DataFrame({
        "product_id": [1, 3, 2],
        "year": [2023, 2023, 2022],
    }),
    "employees": pd.DataFrame({
        "employee_id": [1, 2, 3, 4],
        "salary": [120000.0, 90000.0, 150000.0, 60000.0],
    }),
    "cards": pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],
        "spend": [150.0, 220.0, 90.0, 310.0, 180.0, 260.0],
    }),
    "Paper": pd.DataFrame({
        "Id": [1, 2, 3],
        "Year": [0, 0, 2001],
    }),
    "PaperAuthor": pd.DataFrame({
        "PaperId": [1, 1, 2, 3],
        "Name": ["A. One", "B. Two", "C. Three", "D. Four"],
    }),
    "Author": pd.DataFrame({
        "Name": ["A. One", "B. Two"],
        "Affiliation": ["University of Oxford", "MIT"],
    }),
    "Accounts": pd.DataFrame({
        "account_id": [1, 2],
        "date_account_opened": [_d("2010-01-01"), _d("2012-02-02")],
        "account_name": ["alpha", "beta"],
        "other_account_details": ["gold", "silver"],
    }),
    # placeholder tables the reference's meta-examples use verbatim
    "A": pd.DataFrame({"id": [1, 2, 3]}),
    "B": pd.DataFrame({"id": [2, 3, 4], "condition": [True, False, True]}),
    "table": pd.DataFrame({"column": ["x", "y"], "condition": [True, False]}),
}


def _duckdb_text(sql: str) -> str:
    """Spark-transpiled SQL -> DuckDB: backtick quoting -> double quotes."""
    return re.sub(
        r"`([^`]*)`",
        lambda m: '"' + m.group(1) + '"',
        sql,
    )


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, (dt.date, dt.datetime)):
        return str(v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return v


@pytest.fixture(scope="module")
def engines(spark, duck):
    """Both engines loaded with the identical synthesized fixture tables."""
    for name, df in TABLES.items():
        spark.createDataFrame(df).createOrReplaceTempView(name)
        duck.register(name, df)
    yield spark, duck
    for name in TABLES:
        spark.catalog.dropTempView(name)
        duck.unregister(name)


# ---------------------------------------------------------------------------
# 1. parse gate: 100% of the corpus

@pytest.mark.parametrize("entry", CORPUS, ids=IDS)
def test_transpile_and_parse(spark, entry):
    out = transpile(entry["sql"])
    # parse only — catalog resolution is exercised by the execution subset
    spark._jsparkSession.sessionState().sqlParser().parsePlan(out)


# ---------------------------------------------------------------------------
# 2. execution parity on the mappable subset

def _run_spark(spark, sql: str):
    df = spark.sql(sql)
    cols = [c.lower() for c in df.columns]
    rows = [tuple(_norm(v) for v in r) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def _run_duck(duck, sql: str):
    res = duck.execute(sql)
    cols = [d[0].lower() for d in res.description]
    rows = [tuple(_norm(v) for v in r) for r in res.fetchall()]
    return cols, sorted(rows, key=repr)


def test_execution_parity(engines):
    spark, duck = engines
    executed, mismatched, unexecutable = [], [], []
    for entry in CORPUS:
        sql = transpile(entry["sql"])
        try:
            scols, srows = _run_spark(spark, sql)
        except Exception as ex:
            # one deterministic repair round — the execute->error->fix loop
            # the reference's sql_debug feedback actor runs (LLM-driven
            # there, rule-driven for the stale-qualifier class here)
            repaired = repair_unresolved(sql, str(ex))
            try:
                if repaired is None:
                    raise ex
                sql = repaired
                scols, srows = _run_spark(spark, sql)
            except Exception:
                unexecutable.append((entry["source"], "spark"))
                continue
        try:
            dcols, drows = _run_duck(duck, _duckdb_text(sql))
        except Exception:
            unexecutable.append((entry["source"], "duckdb"))
            continue
        # column NAMES may differ (each engine generates its own name for an
        # unaliased aggregate); shape + values are the contract here
        if len(scols) == len(dcols) and srows == drows:
            executed.append(entry["source"])
        else:
            mismatched.append((entry["source"], entry["sql"][:90], srows[:3], drows[:3]))
    assert not mismatched, f"cross-engine mismatches: {mismatched}"
    # the subset must never silently shrink: at r7 sign-off 72/75 executed
    # on both engines (r6: 65 — the bare-column-under-GROUP-BY any_value()
    # rewrite, the computed two-arg date() modifier rewrite, and the
    # stale-qualifier repair round closed 7). The 3 remaining skips are
    # each individually adjudicated reference prompt bugs: 1x ORDER BY a
    # nonexistent column (no same-name binding exists to repair to), 2x
    # pseudo-SQL over reserved words (SELECT column FROM table) DuckDB
    # can't parse
    assert len(executed) >= 72, (
        f"only {len(executed)} corpus statements executed on both engines; "
        f"unexecutable={unexecutable}"
    )


def test_corpus_is_fresh_if_reference_present():
    """When /root/reference is available, re-harvesting must reproduce the
    committed fixture (guards against silent drift of the harvester)."""
    if not os.path.isdir("/root/reference/core"):
        pytest.skip("reference tree not present")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "harvest_reference_sql",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "harvest_reference_sql.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.harvest() == CORPUS
