"""HTTP service entry point: run actor workflows over registered data.

Reference analog: the Flask app (/root/reference/app/run.py) — a global
Router+Engine at startup, ``POST /api/run`` and ``POST /api/run_batch``
accepting ``{instance_id, task_lis}`` per request, per-request timeouts
(task 1200 s / SQL 150 s), ``GET /healthz``. ``POST /api/upload`` is the
interactive-demo entry point (demo/gradio_demo.py:484-505 +
demo/file_to_db.py): upload CSV/JSON/parquet files -> engine tables +
extracted central schema, after which ``/api/run`` generates and executes
against them. Implemented on the stdlib (``http.server``) — no
web-framework dependency; the service is IO-thin, all real work happens in
the engine's task/actor kernel on the shared SparkSession.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from concurrent.futures import ThreadPoolExecutor, TimeoutError as FutTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from squrve_spark.actors.families import WorkflowAgent
from squrve_spark.data import Dataset
from squrve_spark.evaluate import Evaluator
from squrve_spark.execution import execute as spark_execute

TASK_MAX_WAIT_TIME = 1200.0  # parity: app/run.py:46
SQL_MAX_WAIT_TIME = 150.0  # parity: app/run.py:47


class ServiceState:
    """Shared engine state: session, LLM client, registered dataset rows."""

    def __init__(self, spark, llm=None, dataset: Optional[Dataset] = None):
        self.spark = spark
        self.llm = llm
        self.dataset = dataset or Dataset()
        self.pool = ThreadPoolExecutor(max_workers=8)
        # Serializes dataset reads/mutations across ThreadingHTTPServer
        # request threads; timed-out futures are tracked so their (still
        # running) worker threads can't interleave stale row updates into a
        # later request's response.
        self.lock = threading.RLock()
        self._abandoned: set = set()
        # tables registered through /api/upload, in upload order; ad-hoc
        # /api/run rows without an explicit table list fall back to these
        # (the demo flow: upload, then ask questions over what you uploaded)
        self.uploaded_tables: list[str] = []

    def find_row(self, instance_id) -> Optional[int]:
        for i, row in enumerate(self.dataset):
            if row.get("instance_id") == instance_id:
                return i
        return None

    def run_instance(self, payload: dict) -> dict:
        """Run a declarative actor workflow for one instance; returns the
        updated row fields + optional execution/eval results."""
        instance_id = payload.get("instance_id")
        with self.lock:
            idx = self.find_row(instance_id)
            if idx is None:
                # ad-hoc instance provided inline
                row = {k: v for k, v in payload.items() if k != "task_lis"}
                if not row.get("tables") and self.uploaded_tables:
                    row["tables"] = list(self.uploaded_tables)
                self.dataset.append(row)
                idx = len(self.dataset) - 1
            # run on a snapshot: a timed-out (abandoned) worker keeps
            # mutating only its own copy, never the shared row
            snapshot = Dataset([dict(self.dataset[idx])])
        task_lis = payload.get("task_lis") or ["generator:gold"]
        agent = WorkflowAgent(
            dataset=snapshot, spark=self.spark, llm=self.llm, actor_lis=task_lis
        )
        fut = self.pool.submit(agent.run_on, 0)
        try:
            fut.result(timeout=TASK_MAX_WAIT_TIME)
        except FutTimeout:
            fut.cancel()
            self._abandoned.add(fut)
            fut.add_done_callback(self._abandoned.discard)
            return {"instance_id": instance_id, "error": "task timeout"}
        with self.lock:
            self.dataset[idx] = dict(snapshot[0])
            row = dict(self.dataset[idx])
        out = {"instance_id": instance_id, "pred_sql": row.get("pred_sql")}
        if payload.get("execute") and row.get("pred_sql"):
            res = spark_execute(
                self.spark, row["pred_sql"], row_cap=100, timeout_seconds=SQL_MAX_WAIT_TIME
            )
            out["result"] = None if res.df is None else res.df.to_dict("records")
            out["exec_error"] = res.error
        # evaluate: "llm" selects ONLY the judge below — execute_accuracy
        # runs two timed SQL executions and must not ride along on it
        if (
            payload.get("evaluate")
            and payload.get("evaluate") != "llm"
            and row.get("query")
        ):
            ev = Evaluator(self.spark, Dataset([row]), ["execute_accuracy"])
            out["execute_accuracy"] = ev.eval(0, "execute_accuracy")
        # optional LLM semantic judgment of the actor sequence vs a baseline
        # (reference: app/evaluation_helper.py:283-351, 6-principle rubric);
        # behind the mockable LLM client, so tests drive it with ScriptedLLM
        if payload.get("eval") == "llm" or payload.get("evaluate") == "llm":
            from squrve_spark.evaluate import evaluate_by_llm

            if self.llm is None:
                out["llm_judge"] = {"ok": False, "score": 0.0,
                                    "error": "no LLM client configured"}
            else:
                ok, score = evaluate_by_llm(
                    self.llm,
                    input_prompt=row.get("question") or row.get("query") or "",
                    baseline_seq=payload.get("baseline_task_lis")
                    or ["generator:gold"],
                    pred_seq=task_lis,
                )
                out["llm_judge"] = {"ok": ok, "score": score}
        return out

    def _reject_commands(self, sql: str) -> None:
        """Raise ValueError if the parsed (unresolved) plan contains any
        command/DML node. Verified against PySpark 4.1: plain queries parse
        to Project/UnresolvedWith/GlobalLimit/... with no Command or
        ParsedStatement node, while INSERT (incl. the ``WITH ... INSERT``
        first-token bypass), MERGE/UPDATE/DELETE, DDL, CACHE and SET all
        carry one."""
        jvm = self.spark._jvm
        plan = self.spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
        bad = [
            jvm.java.lang.Class.forName(n)
            for n in (
                "org.apache.spark.sql.catalyst.plans.logical.Command",
                "org.apache.spark.sql.catalyst.plans.logical.ParsedStatement",
            )
        ]
        stack = [plan]
        while stack:
            node = stack.pop()
            for cls in bad:
                if cls.isInstance(node):
                    raise ValueError(
                        "explain accepts query statements only (got "
                        f"{node.getClass().getSimpleName()})"
                    )
            children = node.children()
            stack.extend(children.apply(i) for i in range(children.size()))

    def explain(self, payload: dict) -> dict:
        """Physical-plan introspection for a SQL string: the same
        `.explain("formatted")` surface the engine's plan audits use,
        exposed over HTTP so a user can check pushdown/broadcast shape
        before running on the big cluster."""
        sql = payload.get("sql")
        if not sql:
            raise ValueError("missing 'sql'")
        # spark.sql() EXECUTES commands (DDL/DML) eagerly — only queries are
        # lazy. An explain endpoint must never run side effects, so admit
        # only query statements. Token-sniffing the first keyword is NOT
        # enough: Spark's grammar allows ``WITH cte AS (...) INSERT INTO``,
        # which starts with WITH yet executes DML. Parse first and walk the
        # unresolved logical plan, rejecting any Command (DDL/CACHE/SET/...)
        # or ParsedStatement (InsertIntoStatement etc.) node anywhere in the
        # tree — DML cannot hide inside a subquery expression, so walking
        # ``children`` is exhaustive.
        self._reject_commands(sql)
        df = self.spark.sql(sql)
        qe = df._jdf.queryExecution()
        return {
            "formatted": qe.explainString(
                self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    payload.get("mode", "formatted")
                )
            ),
        }

    def registry_list(self) -> dict:
        """The query-registry inventory (name, verification tier, tags,
        one-line doc) — the CLI's `--query list` surface over HTTP."""
        from squrve_spark.plans import REGISTRY

        out = []
        for name, spec in REGISTRY.items():
            tier = (
                "driver"
                if (spec.oracle and not spec.defer_oracle)
                else ("deferred" if spec.oracle else "rows-only")
            )
            doc = " ".join((spec.doc or "").split())
            out.append(
                {
                    "name": name,
                    "tier": tier,
                    "tags": list(spec.tags),
                    "doc": doc[:200],
                }
            )
        return {"queries": out}

    def registry_run(self, payload: dict) -> dict:
        """Run one registry operator over a parquet directory — the CLI's
        `--query NAME --sf-dir DIR` surface over HTTP. Row-capped like
        /api/run; unknown names are client errors."""
        from squrve_spark.plans import REGISTRY

        name = payload.get("name")
        if name not in REGISTRY:
            raise ValueError(f"unknown registry query: {name!r}")
        sf_dir = payload.get("sf_dir") or "/root/testdata/sf0.001"
        if not os.path.isdir(sf_dir):
            raise ValueError(f"sf_dir is not a directory: {sf_dir!r}")
        max_rows = min(int(payload.get("max_rows", 100)), 10_000)
        df = REGISTRY[name].fn(self.spark, sf_dir)
        rows = df.limit(max_rows).collect()
        return {
            "name": name,
            "columns": df.columns,
            "n_rows_returned": len(rows),
            "rows": [[r[c] for c in df.columns] for r in rows],
        }

    def upload(self, payload: dict) -> dict:
        """Upload files -> engine tables + extracted central schema
        (demo/file_to_db.py's pandas-to-sqlite flow, Spark-side).

        ``files`` entries are either server-local paths or inline
        ``{"name", "content"}`` documents (written to a temp dir first —
        the stdlib server has no multipart parsing, and inline content is
        how the demo ships small CSVs). Table names derive from file
        stems; the extracted schema is what generation prompts render.
        """
        from squrve_spark.sources.ingest import ingest_files

        specs = payload.get("files") or []
        if not specs:
            raise ValueError("no files to upload")
        paths = []
        for spec in specs:
            if isinstance(spec, str):
                paths.append(spec)
            else:
                d = tempfile.mkdtemp(prefix="squrve_upload_")
                p = os.path.join(d, os.path.basename(spec["name"]))
                with open(p, "w", encoding="utf-8") as f:
                    f.write(spec["content"])
                paths.append(p)
        with self.lock:
            schema = ingest_files(self.spark, paths, db_id=payload.get("db_id", "uploaded"))
            tables = schema["table_names_original"]
            for t in tables:
                if t not in self.uploaded_tables:
                    self.uploaded_tables.append(t)
        return {"tables": tables, "schema": schema}


def _make_handler(state: ServiceState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # silence request logging
            pass

        def _send(self, code: int, body: dict):
            data = json.dumps(body, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            elif self.path == "/api/registry":
                self._send(200, state.registry_list())
            elif self.path in ("/", "/index.html"):
                # interactive demo page (reference: demo/gradio_demo.py)
                from squrve_spark.demo_ui import DEMO_HTML

                data = DEMO_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._send(400, {"error": "bad json"})
            try:
                if self.path == "/api/run":
                    self._send(200, state.run_instance(payload))
                elif self.path == "/api/run_batch":
                    items = payload.get("instances", [])
                    self._send(200, {"results": [state.run_instance(p) for p in items]})
                elif self.path == "/api/upload":
                    self._send(200, state.upload(payload))
                elif self.path == "/api/explain":
                    self._send(200, state.explain(payload))
                elif self.path == "/api/registry_run":
                    self._send(200, state.registry_run(payload))
                else:
                    self._send(404, {"error": "not found"})
            except ValueError as exc:  # client error: bad/forbidden request
                self._send(400, {"error": str(exc)})
            except Exception as exc:  # noqa: BLE001 — service containment
                self._send(500, {"error": str(exc)})

    return Handler


def create_server(state: ServiceState, port: int = 0) -> ThreadingHTTPServer:
    """Bind the service; port 0 picks a free port (``server.server_address``)."""
    return ThreadingHTTPServer(("127.0.0.1", port), _make_handler(state))


def serve_background(state: ServiceState, port: int = 0) -> ThreadingHTTPServer:
    server = create_server(state, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
