"""Config-driven batch runner: ``python -m squrve_spark config.json``.

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
    sec = router.section("llm") or {}
    if sec.get("use") == "http":
        from squrve_spark.llm import HTTPLLMClient

        return HTTPLLMClient(
            base_url=sec["base_url"],
            model=sec.get("model_name", "gpt-4o-mini"),
            temperature=float(sec.get("temperature", 0.75)),
            top_p=float(sec.get("top_p", 0.9)),
            max_tokens=int(sec.get("max_token", 8000)),
            timeout_s=float(sec.get("time_out", 300.0)),
        )
    from squrve_spark.llm import MockLLM

    return MockLLM()


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: python -m squrve_spark <config.json>", file=sys.stderr)
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
