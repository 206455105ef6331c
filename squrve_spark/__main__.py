"""Config-driven batch runner: ``python -m squrve_spark config.json``,
plus a direct query runner: ``python -m squrve_spark --query NAME
[--sf-dir DIR] [--out PATH] [--limit N]`` — runs any registry entry
(every SURVEY §2 operator and data-pipeline query) from the command
line, printing a JSON summary and optionally writing the result as
parquet. ``--query list`` prints the registry inventory.

Reference analog: ``startup_run/run.py`` — Router(config_path) -> Engine ->
execute() -> evaluate(), with the whole pipeline (data source, tasks, eval
metrics) declared in JSON. Prints one JSON object: per-metric results plus
the predicted SQL per instance.

The LLM backend resolves from the config's ``llm`` section: ``use:
"http"`` builds the generic OpenAI-compatible adapter (base_url/model from
the section, key from the standard env var); anything else (or nothing)
uses MockLLM so gold-passthrough / deterministic pipelines run with no
network.
"""

from __future__ import annotations

import json
import sys


def _build_llm(router):
    # accepts every provider spelling the reference's dispatcher knows
    # (qwen/deepseek/zhipu/openai/claude/gemini/xiaojing) plus the generic
    # "http"; unknown/absent -> deterministic MockLLM
    from squrve_spark.llm import MockLLM, client_for_section

    sec = dict(router.section("llm") or {})
    sec.setdefault("api_key", router.get("api_key"))
    return client_for_section(sec) or MockLLM()


def _run_query(argv: list[str]) -> int:
    """--query NAME [--sf-dir DIR] [--out PATH] [--limit N]"""
    import argparse

    ap = argparse.ArgumentParser(prog="python -m squrve_spark")
    ap.add_argument("--query", required=True)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--out", default=None, help="write result parquet here")
    ap.add_argument("--limit", type=int, default=10, help="rows in the JSON sample")
    args = ap.parse_args(argv)

    from squrve_spark.catalog import DEFAULT_SF_DIR
    from squrve_spark.plans import REGISTRY

    if args.query == "list":
        for name, spec in REGISTRY.items():
            tier = ("driver" if spec.oracle and not spec.defer_oracle
                    else "deferred" if spec.oracle else "rows-only")
            print(json.dumps({"query": name, "tier": tier, "tags": list(spec.tags)}))
        return 0
    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; try --query list", file=sys.stderr)
        return 2

    from squrve_spark.session import get_spark

    spark = get_spark("squrve-query")
    df = REGISTRY[args.query].fn(spark, args.sf_dir or DEFAULT_SF_DIR)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        # sample from the written parquet — re-collecting from `df` would
        # re-execute the whole plan a second time
        written = spark.read.parquet(args.out)
        n = written.count()
        sample = [row.asDict() for row in written.limit(args.limit).collect()]
    else:
        rows = df.limit(max(args.limit, 0)).collect() if args.limit else []
        n = df.count()
        sample = [row.asDict() for row in rows]
    print(json.dumps(
        {"query": args.query, "rows": n, "out": args.out, "sample": sample},
        default=str,
    ))
    return 0


def _serve(argv: list[str]) -> int:
    """--serve [--port N] [--sf-dir DIR]: start the HTTP service (the
    /api/run, /api/registry*, /api/upload, /api/explain surface + demo UI)
    over the registered fixture tables; blocks until interrupted."""
    import argparse

    ap = argparse.ArgumentParser(prog="python -m squrve_spark --serve")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--sf-dir", default=None)
    args = ap.parse_args(argv)

    from squrve_spark.catalog import DEFAULT_SF_DIR, register_tables
    from squrve_spark.service import ServiceState, create_server
    from squrve_spark.session import get_spark

    spark = get_spark("squrve-serve")
    register_tables(spark, args.sf_dir or DEFAULT_SF_DIR)
    server = create_server(ServiceState(spark), port=args.port)
    # flush: under a subprocess pipe stdout is block-buffered and a parent
    # waiting for this line to learn the bound port would hang
    print(
        json.dumps({"serving": f"http://127.0.0.1:{server.server_address[1]}"}),
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--query":
        return _run_query(argv)
    if argv and argv[0] == "--serve":
        return _serve(argv[1:])
    if len(argv) != 1:
        print(
            "usage: python -m squrve_spark <config.json> | --query NAME [...] "
            "| --serve [--port N]",
            file=sys.stderr,
        )
        return 2
    from squrve_spark.config import Router
    from squrve_spark.session import get_spark
    from squrve_spark.tasks import Engine

    from squrve_spark.catalog import DEFAULT_SF_DIR, register_tables

    router = Router(config_path=argv[0])
    spark = get_spark("squrve-run")
    # register the benchmark's backing tables as views (the reference's
    # skip_schema_init=False default: the runner owns schema setup);
    # dataset.data_source_dir overrides the parquet directory
    sf_dir = (router.section("dataset") or {}).get("data_source_dir") or DEFAULT_SF_DIR
    register_tables(spark, sf_dir)
    engine = Engine(router=router, spark=spark, llm=_build_llm(router))
    engine.build_from_router()
    engine.execute()
    out = {"metrics": engine.evaluate()}
    out["predictions"] = [
        {"instance_id": row.get("instance_id"), "pred_sql": row.get("pred_sql")}
        for row in engine.dataset
    ]
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
