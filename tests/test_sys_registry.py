"""sys_config benchmark-registry defaults (squrve_spark/sys_config.json +
data.registry_from_sys_config).

Mirrors the reference registry flow (config/sys_config.json:30-199 read by
init_benchmark_dataset, data_manage.py:841-916): a reference-style config
naming ``"data_source": "tpch:dev:"`` must resolve, filter, attach external
document paths, and round-trip through Router -> Engine -> EX evaluation
without a caller-built registry.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from squrve_spark.catalog import register_tables
from squrve_spark.config import Router
from squrve_spark.data import DataLoader, registry_from_sys_config
from squrve_spark.external import add_external
from squrve_spark.llm import MockLLM
from squrve_spark.tasks import Engine
from tests.conftest import SF_SMALL


def test_default_registry_shape():
    reg = registry_from_sys_config()
    assert set(reg) == {"tpch", "docs"}
    dev = reg["tpch"]["splits"]["dev"]
    assert Path(dev["path"]).is_file()
    assert dev["external_dir"] and Path(dev["external_dir"]).is_dir()
    # no-sub benchmark lands under the default split name
    assert Path(reg["docs"]["splits"]["dev"]["path"]).is_file()


def test_resolve_defaults_and_filter_dsl():
    loader = DataLoader()  # no registry argument: sys_config defaults
    ds = loader.resolve("tpch:dev:")
    assert len(ds) == 5
    assert all(r["benchmark"] == "tpch" and r["db_type"] == "spark" for r in ds)
    easy = loader.resolve("tpch:dev:difficulty-e-easy")
    assert {r["instance_id"] for r in easy} == {"tpch_dev_0", "tpch_dev_1"}
    assert len(loader.resolve("docs::")) == 2
    with pytest.raises(KeyError):
        loader.resolve("nope:dev:")


def test_resolve_attaches_absolute_external_paths(tmp_path):
    row = next(r for r in DataLoader().resolve("tpch:dev:") if r.get("external_path"))
    p = Path(row["external_path"])
    assert p.is_absolute() and p.is_file()
    assert "active region" in p.read_text()
    # and the attached document flows through add_external
    ds = DataLoader().resolve("tpch:dev:")
    add_external(ds, MockLLM(default="[KD-1] r_regionkey < 3"), tmp_path)
    ext_rows = [r for r in ds if "external" in r]
    assert len(ext_rows) == 1
    assert Path(ext_rows[0]["external"]).read_text() == "[KD-1] r_regionkey < 3"


def test_reference_style_config_round_trips_to_ex_eval(spark, tmp_path):
    """Config -> Router -> Engine (data_source resolution) -> gold generate
    -> EX evaluation, the verdict's done-criterion."""
    register_tables(spark, SF_SMALL)
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({
        "dataset": {"data_source": "tpch:dev:"},
        "engine": {"eval_type": ["execute_accuracy"]},
    }))
    eng = Engine(Router(str(cfg)), spark=spark, llm=MockLLM())
    assert len(eng.dataset) == 5  # resolved from the packaged registry
    eng.add_task("gen", "generate", "gold")
    eng.execute()
    res = eng.evaluate()["execute_accuracy"]
    assert res["avg"] == 1.0 and res["total_items"] == 5


def test_sample_parameter_flows_from_config(spark, tmp_path):
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"dataset": {"data_source": "tpch:dev:", "sample": 2}}))
    eng = Engine(Router(str(cfg)), spark=spark, llm=MockLLM())
    assert len(eng.dataset) == 2


def test_config_driven_build_and_cli_flow(spark, tmp_path):
    """Reference startup_run flow: a JSON config declaring task_meta builds
    the engine, executes, and evaluates without programmatic add_task."""
    register_tables(spark, SF_SMALL)
    cfg = {
        "dataset": {"data_source": "tpch:dev:"},
        "task": {
            "task_meta": [
                {
                    "task_id": "gen",
                    "task_type": "GenerateTask",
                    "meta": {"task": {"generate_type": "gold"}},
                }
            ]
        },
        "experiment": {"eval_type": ["execute_accuracy"]},
    }
    p = tmp_path / "startup_config.json"
    p.write_text(json.dumps(cfg))
    eng = Engine(router=Router(config_path=str(p)), spark=spark, llm=MockLLM())
    eng.build_from_router()
    eng.execute()
    res = eng.evaluate()["execute_accuracy"]
    assert res["avg"] == 1.0
    assert all(r.get("pred_sql") for r in eng.dataset)


def test_actor_resolution_handles_reference_spellings():
    from squrve_spark.actors.base import ActorPool

    for name in ("DINSQLGenerator", "DIN_SQLGenerator", "dinsql", "DIN_SQL"):
        assert ActorPool.resolve("generator", name).NAME == "dinsql"


def test_reproduce_configs_build_and_execute(spark):
    """Every config in reproduce/ (the reference reproduce/ layout analog)
    must Router->Engine->execute()->evaluate() without error; the gold
    config must reach EX 1.0; named-method configs run their full actor
    pipelines against the MockLLM (predictions present, possibly empty
    SQL strings — the pipeline contract, not the model's quality)."""
    import glob
    import os

    register_tables(spark, SF_SMALL)
    configs = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reproduce", "*.json")))
    assert len(configs) >= 5
    for cfg in configs:
        eng = Engine(router=Router(config_path=cfg), spark=spark, llm=MockLLM())
        eng.build_from_router()
        eng.execute()
        res = eng.evaluate()["execute_accuracy"]
        assert res["total_items"] == 5, cfg
        assert all("pred_sql" in r for r in eng.dataset), cfg
        if cfg.endswith("tpch-gold.json"):
            assert res["avg"] == 1.0
