"""add_external (squrve_spark/external.py): per-row external-knowledge
summarization and its consumption on the generator prompt path.

Mirrors the reference flow (core/data_manage.py:1300-1350 +
core/LinkAlign/tools/external.py): rows carrying an ``external_path`` get an
LLM-summarized knowledge file and ``row["external"]`` rewritten to its path;
generators fold that evidence into their prompts, changing the emitted SQL.
"""

from __future__ import annotations

from pathlib import Path

from squrve_spark.actors.families import LLMGenerator
from squrve_spark.catalog import register_tables
from squrve_spark.data import Dataset
from squrve_spark.external import (
    NO_KNOWLEDGE,
    add_external,
    external_text,
    summary_external_knowledge,
)
from squrve_spark.llm import MockLLM
from tests.conftest import SF_SMALL

DOC = (
    "Glossary. An 'active region' is any region whose r_regionkey is below 3. "
    "Conversion: balances are stored in cents."
)
SUMMARY = "[KD-1] active region -> WHERE r_regionkey < 3"


def _dataset(tmp_path: Path, with_external: bool = True) -> Dataset:
    rows = [
        {"instance_id": "a", "question": "How many active regions are there?"},
        {"instance_id": "b", "question": "How many nations are there?"},
    ]
    if with_external:
        doc = tmp_path / "doc_a.txt"
        doc.write_text(DOC)
        rows[0]["external_path"] = str(doc)
    return Dataset(rows)


def test_add_external_summarizes_and_rewrites_rows(tmp_path):
    ds = _dataset(tmp_path)
    llm = MockLLM(rules=[(r"active region", SUMMARY)], default=NO_KNOWLEDGE)
    add_external(ds, llm, external_save_dir=tmp_path / "ext")
    # row a: summary saved at {dir}/{instance_id}.txt, external points at it
    saved = tmp_path / "ext" / "a.txt"
    assert ds[0]["external"] == str(saved)
    assert saved.read_text() == SUMMARY
    # the document itself reached the summarization prompt
    assert DOC in llm.calls[0] and ds[0]["question"] in llm.calls[0]
    # row b has no external_path: untouched, no stray file
    assert "external" not in ds[1]
    assert not (tmp_path / "ext" / "b.txt").exists()


def test_add_external_without_llm_is_noop(tmp_path):
    ds = _dataset(tmp_path)
    add_external(ds, llm=None, external_save_dir=tmp_path / "ext")
    assert "external" not in ds[0]


def test_add_external_custom_function_and_merge_overwrite(tmp_path):
    ds = _dataset(tmp_path)
    ds.setitem(0, "external", "stale inline note")
    calls = []

    def fn(question, llm, external_path, save_path):
        calls.append(question)
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        Path(save_path).write_text("custom")

    add_external(ds, llm=None, external_function=fn, external_save_dir=tmp_path / "e")
    assert calls == [ds[0]["question"]]
    assert ds[0]["external"] == str(tmp_path / "e" / "a.txt")  # overwrote stale


def test_summary_function_reads_path_and_saves(tmp_path):
    doc = tmp_path / "d.txt"
    doc.write_text(DOC)
    out = tmp_path / "s.txt"
    llm = MockLLM(default=SUMMARY)
    got = summary_external_knowledge(
        "How many active regions?", llm, external_path=doc, save_path=out
    )
    assert got == SUMMARY and out.read_text() == SUMMARY


def test_external_text_resolution(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text(SUMMARY)
    assert external_text({"external": str(p)}) == SUMMARY
    assert external_text({"external": "inline note"}) == "inline note"
    assert external_text({"external": NO_KNOWLEDGE}) == ""
    assert external_text({}) == ""


def test_external_evidence_changes_generated_sql(spark, tmp_path):
    """End-to-end: the same question generates different SQL once its row
    carries summarized external knowledge (the verdict's done-criterion)."""
    register_tables(spark, SF_SMALL, ["region"])
    plain_sql = "SELECT count(*) AS n FROM region"
    informed_sql = "SELECT count(*) AS n FROM region WHERE r_regionkey < 3"
    gen_llm = MockLLM(
        rules=[
            # the knowledge unit appearing in the prompt flips the answer
            (r"External knowledge:.*KD-1", informed_sql),
            (r"Write ONE Spark SQL", plain_sql),
        ]
    )

    def run(ds):
        return LLMGenerator(dataset=ds, spark=spark, llm=gen_llm,
                            debug_turn_n=0).act(0)["pred_sql"]

    without = run(_dataset(tmp_path, with_external=False))
    ds = _dataset(tmp_path)
    add_external(ds, MockLLM(rules=[(r"active region", SUMMARY)]), tmp_path / "ext")
    with_ext = run(ds)
    assert without == plain_sql
    assert with_ext == informed_sql
