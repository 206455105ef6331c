"""Published-recipe corpus filters (r10): C4 line rules, Gopher quality
gates, RefinedWeb cross-doc line dedup — bite assertions (every claimed
gate actually splits or provably saturates the fixture) plus structural
properties. Exactness vs DuckDB is covered by the deferred oracles in
tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import text
from tests.conftest import SF_MED


def _docs(spark):
    return load_table(spark, SF_MED, "documents")


# ---------------------------------------------------------------------------
# attach_line_payload


def test_line_payload_structure(spark):
    rows = (
        text.attach_line_payload(_docs(spark))
        .select("doc_id", "source", "page")
        .orderBy("doc_id")
        .limit(80)
        .collect()
    )
    assert rows, "payload produced no rows"
    for r in rows:
        lines = r["page"].split("\n")
        # per-source rights footer is ALWAYS the last line
        assert lines[-1] == f"all rights reserved by {r['source']}."
        if r["doc_id"] % 7 == 0:
            assert "lorem ipsum dolor sit amet." in lines
        if r["doc_id"] % 11 == 0:
            assert "function() { return 1; }" in lines
        if r["doc_id"] % 5 == 0:
            assert "please enable javascript to continue." in lines
        # decoration classes all occur across a document's lines eventually;
        # spot-check the modulus rule on the first content line
        first = lines[0]
        m = r["doc_id"] % 12
        if m == 0:
            assert not first.endswith((".", "?", "..."))
        elif m == 1:
            assert first.startswith("- ") and first.endswith(".")
        elif m == 2:
            assert first.endswith("...")
        elif m == 3:
            assert first.endswith("?")
        else:
            assert first.endswith(".")


# ---------------------------------------------------------------------------
# C4


def test_c4_rules_bite(spark):
    out = text.c4_line_filter(text.attach_line_payload(_docs(spark)))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 500
    # page gates fire exactly on their planted strata
    for did, r in rows.items():
        assert r["has_lorem"] == (did % 7 == 0)
        assert r["has_brace"] == (did % 11 == 0)
        if r["has_lorem"] or r["has_brace"]:
            assert not r["kept"]
        # any doc with >= 12 content lines must hit the bare (m==0)
        # decoration stratum -> the terminal-punctuation rule drops a line
        # (short docs CAN keep every line; that's correct behavior)
        if r["n_lines"] >= 13:
            assert r["n_kept"] < r["n_lines"]
    assert sum(r["n_kept"] for r in rows.values()) < sum(
        r["n_lines"] for r in rows.values()
    ), "line rules never dropped anything corpus-wide"
    kept = sum(1 for r in rows.values() if r["kept"])
    assert 0 < kept < len(rows), f"C4 page verdict never splits ({kept})"


def test_c4_javascript_line_dropped(spark):
    out = text.c4_line_filter(text.attach_line_payload(_docs(spark)))
    # the javascript notice ends in '.', has >=3 words — ONLY the
    # javascript rule can drop it; compare against a filter without it
    with_js = {
        r["doc_id"]: r["n_kept"]
        for r in out.collect()
        if r["doc_id"] % 5 == 0
    }
    assert with_js, "no doc_id%5 stratum in fixture"
    pages = text.attach_line_payload(_docs(spark)).filter(
        F.col("doc_id") % 5 == 0
    )
    naive = pages.select(
        "doc_id",
        F.size(
            F.filter(
                F.split("page", "\n"),
                lambda line: line.rlike('[.!?"]$')
                & (F.size(F.split(F.trim(line), r"\s+")) >= 3),
            )
        ).alias("n"),
    )
    for r in naive.collect():
        assert with_js[r["doc_id"]] == r["n"] - 1  # exactly the js line


# ---------------------------------------------------------------------------
# Gopher


def test_gopher_gates_bite_profile(spark):
    out = text.gopher_rules(_docs(spark))
    rows = out.collect()
    assert len(rows) == 500
    wc = {r["r_wordcount"] for r in rows}
    st = {r["r_stopwords"] for r in rows}
    assert wc == {True, False}, "word-count gate must split the fixture"
    assert st == {True, False}, "stopword gate must split the fixture"
    # documented saturation: vocabulary soup passes these trivially —
    # asserted so a fixture change that starts exercising them is noticed
    assert all(r["r_meanlen"] for r in rows)
    assert all(r["r_alpha"] for r in rows)
    assert all(r["r_symbols"] for r in rows)
    kept = sum(1 for r in rows if r["kept"])
    assert 0 < kept < len(rows)
    # keep is exactly the AND of the gates
    for r in rows:
        assert r["kept"] == (
            r["r_wordcount"]
            and r["r_meanlen"]
            and r["r_alpha"]
            and r["r_stopwords"]
            and r["r_symbols"]
        )


def test_gopher_custom_thresholds(spark):
    # tighten until nothing survives; loosen until everything does
    none = text.gopher_rules(_docs(spark), min_words=10**6)
    assert none.filter(F.col("kept")).count() == 0
    everything = text.gopher_rules(
        _docs(spark), min_words=0, min_stop_hits=0, min_alpha_frac=0.0
    )
    assert everything.filter(~F.col("kept")).count() == 0


# ---------------------------------------------------------------------------
# line dedup


def test_line_dedup_flags_planted_boilerplate(spark):
    pages = text.attach_line_payload(_docs(spark))
    out = {r["doc_id"]: r for r in text.line_dedup(pages).collect()}
    assert len(out) == 500
    # every document carries the per-source footer -> at least one
    # boilerplate line everywhere
    assert all(r["n_boiler"] >= 1 for r in out.values())
    # trap lines recur across strata -> docs in those strata lose them too
    for did, r in out.items():
        expected_min = 1 + (did % 7 == 0) + (did % 11 == 0) + (did % 5 == 0)
        assert r["n_boiler"] >= expected_min, (did, r)
    # content lines survive somewhere: not every line is boilerplate
    assert any(r["n_boiler"] < r["n_lines"] for r in out.values())


def test_line_dedup_min_docs_disables(spark):
    # a threshold above the corpus size marks nothing as boilerplate and
    # the fingerprint equals the full-page fingerprint
    pages = text.attach_line_payload(_docs(spark)).limit(50)
    out = text.line_dedup(pages, min_docs=10**6)
    rows = out.collect()
    assert all(r["n_boiler"] == 0 for r in rows)
    full = pages.select(
        "doc_id", F.md5(F.col("page")).alias("full_md5")
    ).collect()
    full_map = {r["doc_id"]: r["full_md5"] for r in full}
    for r in rows:
        assert r["clean_md5"] == full_map[r["doc_id"]]


def test_curate_v7_stage_bites_and_manifest_shape(spark):
    """pipeline_curate_v7: the selection (60) is a strict subset of the
    SemDeDup keepers, which are a strict subset of the corpus; chunk
    spans tile the exclusive cumsum contiguously."""
    from squrve_spark.plans import REGISTRY

    rows = REGISTRY["pipeline_curate_v7"].fn(spark, SF_MED).collect()
    assert len(rows) == 60
    # offsets are the exclusive cumsum in doc_id order
    rows = sorted(rows, key=lambda r: r["doc_id"])
    run = 0
    for r in rows:
        assert r["tok_offset"] == run
        assert r["first_chunk"] == run // 512
        assert r["last_chunk"] == (run + r["n_tokens"] - 1) // 512
        run += r["n_tokens"]
    # more than one k-means cell is represented in the final sample
    assert len({r["cell"] for r in rows}) > 1
