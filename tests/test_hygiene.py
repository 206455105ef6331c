"""Corpus-hygiene operators: decontamination parity against a pure-Python
n-gram oracle, and PII masking round-trips on planted spans."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import decontam
from squrve_spark.operators.text import mask_pii, pii_counts
from tests.conftest import SF_SMALL


def _py_shingles(text: str, n: int) -> set:
    toks = text.strip().split()
    if len(toks) < n:
        return set()
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_scores_match_python_oracle(spark):
    """Spark hashed-shingle overlap counts equal the exact token-tuple
    overlap computed driver-side (xxhash64 collisions are negligible at
    fixture scale)."""
    docs = load_table(spark, SF_SMALL, "documents")
    ev = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"])
        for r in decontam.contamination_scores(train, ev, n=4).collect()
    }

    rows = docs.select("doc_id", "source", "text").collect()
    ev_sh = set()
    for r in rows:
        if r["source"] == "src0":
            ev_sh |= _py_shingles(r["text"], 4)
    want = {}
    for r in rows:
        if r["source"] == "src0":
            continue
        sh = _py_shingles(r["text"], 4)
        if sh:
            want[r["doc_id"]] = (len(sh), len(sh & ev_sh))
    assert got == want
    assert any(h for _, h in want.values())  # fixture plants overlap — not vacuous


def test_decontaminate_removes_exactly_contaminated(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    ev = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    scores = decontam.contamination_scores(train, ev, n=4)
    bad = {r["doc_id"] for r in scores.filter(F.col("n_hits") >= 8).collect()}
    kept = {
        r["doc_id"]
        for r in decontam.decontaminate(train, ev, n=4, min_hits=8).select("doc_id").collect()
    }
    all_train = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert kept == all_train - bad
    assert bad  # planted duplicated passages must be caught


def test_short_docs_kept_by_decontaminate(spark):
    """Docs with fewer than n tokens cannot shingle; decontaminate must
    keep them (no evidence), and contamination_scores must drop them."""
    train = spark.createDataFrame(
        [Row(doc_id=1, text="too short"), Row(doc_id=2, text="a b c d e f")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([Row(doc_id=9, text="a b c d e f")], "doc_id long, text string")
    scored = {r["doc_id"] for r in decontam.contamination_scores(train, ev, n=4).collect()}
    assert scored == {2}
    kept = {r["doc_id"] for r in decontam.decontaminate(train, ev, n=4).select("doc_id").collect()}
    assert kept == {1}


PII_DOC = (
    "contact john.doe+x@example.co.uk or call (415) 555-2671; "
    "ssn 123-45-6789, card 4111 1111 1111 1111, host 10.0.0.254 ok"
)


def test_mask_pii_scrubs_all_planted_spans(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=PII_DOC), Row(doc_id=2, text="clean prose only")],
        "doc_id long, text string",
    )
    masked = mask_pii(df)
    txt = {r["doc_id"]: r["text"] for r in masked.collect()}
    assert "<EMAIL>" in txt[1] and "<SSN>" in txt[1] and "<CARD>" in txt[1]
    assert "<PHONE>" in txt[1] and "<IP>" in txt[1]
    assert "example.co.uk" not in txt[1] and "6789" not in txt[1]
    assert txt[2] == "clean prose only"
    # audit after scrub: zero residual PII of any class
    post = pii_counts(masked).collect()
    assert all(r[c] == 0 for r in post for c in r.asDict() if c != "doc_id")


def test_pii_counts_per_class(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=PII_DOC)], "doc_id long, text string")
    r = pii_counts(df).collect()[0]
    assert r["n_email"] == 1 and r["n_ssn"] == 1 and r["n_credit_card"] == 1
    assert r["n_ipv4"] == 1 and r["n_phone"] >= 1


def test_pii_audit_registry_entry(spark):
    from squrve_spark.plans.pipeline import doc_pii_audit

    out = doc_pii_audit(spark, SF_SMALL)
    rows = out.collect()
    assert rows and out.columns[0] == "source"
    # fixture prose is synthetic vocabulary soup: after masking, residual
    # counts must be zero for every class (before-counts may be zero too)
    for r in rows:
        for c in out.columns:
            if c.startswith("post_"):
                assert r[c] == 0


def test_repetition_stats_handcrafted(spark):
    """Known boilerplate shapes -> exact expected fractions."""
    from squrve_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 non-blank lines, 'nav bar' twice -> dup_line_frac 1/4
            (1, "nav bar\nreal sentence one.\nnav bar\nanother line here!"),
            # 2 identical paragraphs -> dup_para_frac 1/2; no terminal punct
            (2, "same para\n\nsame para"),
            # symbols: 2 '#' + 1 '...' over 7 whitespace tokens (the
            # symbols themselves tokenize as words)
            (3, "# header # and some text ..."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["dup_line_frac"] == 0.25
    assert got[1]["terminal_line_frac"] == 0.5  # '.' and '!' lines of 4
    assert got[2]["dup_para_frac"] == 0.5
    assert got[2]["terminal_line_frac"] == 0.0
    assert got[3]["symbol_word_ratio"] == round(3 / 7, 4)


def test_top_ngram_frac_python_oracle(spark):
    """Arrow kernel vs a direct per-row Counter recomputation at sf0.001."""
    from collections import Counter

    from squrve_spark.operators.text import top_ngram_frac

    docs = load_table(spark, SF_SMALL, "documents")
    got = {r["doc_id"]: r["top_ngram_frac"] for r in top_ngram_frac(docs, n=2).collect()}
    for row in docs.select("doc_id", "text").collect():
        toks = (row["text"] or "").strip().split()
        grams = [tuple(toks[i : i + 2]) for i in range(len(toks) - 1)]
        want = (
            min(1.0, round(Counter(grams).most_common(1)[0][1] * 2 / len(toks), 4))
            if grams
            else 0.0
        )
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_top_ngram_frac_clamped_to_one(spark):
    """Overlapping occurrences ('a a a' with n=2: 2 occurrences * 2 tokens
    / 3 tokens = 1.33 raw) must clamp to 1.0 — it is a fraction."""
    from squrve_spark.operators.text import top_ngram_frac

    df = spark.createDataFrame([(1, "a a a"), (2, "b c d")], "doc_id long, text string")
    got = {r["doc_id"]: r["top_ngram_frac"] for r in top_ngram_frac(df, n=2).collect()}
    assert got[1] == 1.0
    assert got[2] == round(2 / 3, 4)


def test_chunk_documents_coverage_and_overlap(spark):
    from squrve_spark.operators.text import chunk_documents

    txt = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_tokens=8, overlap=4).collect()
    )
    # n=10, chunk=8, step=4, bound n-overlap-1=5 -> starts 0, 4 only (a
    # start at 8 would be pure overlap)
    assert [r[0] for r in rows] == [0, 1]
    assert rows[0][1].split() == [f"w{i}" for i in range(8)]
    assert rows[1][1].split() == [f"w{i}" for i in range(4, 10)]
    assert rows[1][2] == 6  # short tail
    # every token covered
    covered = set(w for _, t, _ in rows for w in t.split())
    assert covered == set(txt.split())


def test_chunk_documents_no_overlap_and_empty_doc(spark):
    from squrve_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): r["chunk_text"] for r in out}
    assert got[(1, 0)] == "a b" and got[(1, 1)] == "c d" and got[(1, 2)] == "e"
    assert got[(2, 0)] == ""  # row-preserving: empty doc -> one empty chunk


def test_chunk_documents_validation_and_map_only(spark):
    import pytest

    from squrve_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    plan = chunk_documents(df, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle


def test_bloom_contamination_superset_of_exact(spark):
    """Bloom path: no false negatives (per-doc hits >= exact hits) and a
    tiny false-positive excess at the default sizing; map-only plan (no
    Exchange, no join)."""
    from squrve_spark.operators.decontam import (
        contamination_scores,
        contamination_scores_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_set = docs.filter("doc_id < 20").select("doc_id", "text")
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_scores(docs, eval_set).collect()
    }
    bloom_df = contamination_scores_bloom(docs, eval_set)
    bloom = {r["doc_id"]: r["n_hits"] for r in bloom_df.collect()}
    assert set(bloom) == set(exact)
    assert all(bloom[d] >= exact[d] for d in exact)
    excess = sum(bloom[d] - exact[d] for d in exact)
    total = sum(r["n_shingles"] for r in bloom_df.collect())
    assert excess <= max(5, 0.01 * total), (excess, total)
    plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_semantic_contamination_flags_planted_leak(spark):
    """A corpus vector IDENTICAL to an eval vector must score max_sim 1.0
    and be flagged; orthogonal vectors must score 0 and pass."""
    from squrve_spark.operators.decontam import semantic_contamination

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corp = spark.createDataFrame(
        [(0, [2.0, 0.0, 0.0]),   # same direction as eval 100 -> leak
         (1, [0.0, 0.0, 5.0])],  # orthogonal to both -> clean
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semantic_contamination(corp, ev, 0.9).collect()}
    assert out[0]["max_sim"] == 1.0 and out[0]["contaminated"]
    assert out[1]["max_sim"] == 0.0 and not out[1]["contaminated"]


def test_semantic_contamination_degenerate_inputs(spark):
    """Regression (review r4): empty eval set fails loudly; a zero-norm
    corpus vector is defined as matching nothing (not NaN, which Spark's
    NaN-is-largest ordering would silently flag contaminated)."""
    import pytest

    from squrve_spark.operators.decontam import semantic_contamination

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corp = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [3.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semantic_contamination(corp, ev, 0.9).collect()}
    assert out[0]["max_sim"] == 0.0 and not out[0]["contaminated"]
    assert out[1]["max_sim"] == 1.0 and out[1]["contaminated"]
    with pytest.raises(ValueError, match="empty"):
        semantic_contamination(corp, ev.filter("vec_id < 0"), 0.9)


def test_pii_redact_oracle_parity_on_planted_pii(spark):
    """The doc_pii_redact registry oracle must agree with the Spark plan
    on text that actually CONTAINS PII (the shipped fixture has none, so
    the registry parity run exercises only the no-match path) — same
    counts, same masked md5, for every pattern class."""
    from squrve_spark.plans import REGISTRY

    rows = [
        (0, "mail me at jo.doe+x@examp.le or call (555) 123-4567 now"),
        (1, "card 4111 1111 1111 1111 exp soon; ssn 123-45-6789"),
        (2, "server at 10.0.254.3 and backup at 192.168.1.1"),
        (3, "no pii in this one at all"),
        (4, ""),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    import duckdb
    import pandas as pd

    con = duckdb.connect()  # private connection: never shadow the shared
    # parity fixture's `documents` view
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    try:
        oracle = REGISTRY["doc_pii_redact"].oracle
        res = con.execute(oracle)
        cols = [d[0] for d in res.description]
        want = [dict(zip(cols, r)) for r in res.fetchall()]
        # rebuild the Spark plan on the synthetic frame via the same
        # projection the registry entry uses
        from squrve_spark.operators import text as T

        masked = F.col("text")
        for _, pattern, repl in T.PII_PATTERNS:
            masked = F.regexp_replace(masked, pattern, repl)
        got = (
            sdf.select(
                "doc_id",
                *[
                    F.regexp_count(F.col("text"), F.lit(p))
                    .cast("bigint")
                    .alias(f"n_{name}")
                    for name, p, _ in T.PII_PATTERNS
                ],
                F.md5(masked).alias("masked_md5"),
            )
            .orderBy("doc_id")
            .collect()
        )
        assert [dict(r.asDict()) for r in got] == want
        # and the planted spans really got masked
        by_id = {w["doc_id"]: w for w in want}
        assert by_id[0]["n_email"] == 1 and by_id[0]["n_phone"] == 1
        assert by_id[1]["n_credit_card"] == 1 and by_id[1]["n_ssn"] == 1
        assert by_id[2]["n_ipv4"] == 2
        assert by_id[3]["n_email"] == 0
    finally:
        con.close()


def test_ngram_repetition_signals(spark):
    """r9: the Gopher n-gram repetition pair — dup-5-gram char fraction
    fires on a within-doc chorus, top-3 coverage saturates on a stutter
    loop, and short docs get exact zeros (not NULLs)."""
    from squrve_spark.operators.text import ngram_repetition

    rows = [
        # 'a b c d e' x4: every 5-gram is a cyclic rotation occurring
        # >= 2 times, so the dup fraction saturates at 1.0
        (1, "a b c d e a b c d e a b c d e a b c d e"),
        # pure stutter: top-3-gram coverage clamps to 1.0
        (2, "x x x x x x"),
        # no repeated 5-gram
        (3, "one two three four five six seven"),
        # too short for any 3-gram
        (4, "hi there"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_repetition(df).collect()}
    assert out[1]["dup5_char_frac"] == 1.0
    assert out[2]["top3_frac"] == 1.0 and out[2]["dup5_char_frac"] == 1.0
    assert out[3]["dup5_char_frac"] == 0.0 and 0 < out[3]["top3_frac"] < 1
    assert out[4]["top3_frac"] == 0.0 and out[4]["dup5_char_frac"] == 0.0
    assert out[5]["top3_frac"] == 0.0 and out[5]["dup5_char_frac"] == 0.0
    # within-doc chorus planted by the registry entry demonstrably bites
    from squrve_spark.plans import REGISTRY
    reg = REGISTRY["doc_ngram_repetition"].fn(spark, SF_SMALL).collect()
    hot = [r for r in reg if r["doc_id"] % 7 == 0]
    assert hot and all(r["dup5_char_frac"] > 0 for r in hot)
    cold = [r for r in reg if r["doc_id"] % 7 != 0]
    assert cold and all(r["dup5_char_frac"] == 0.0 for r in cold)


def test_winnowing_guarantee_and_edges(spark):
    """r9: THE winnowing property (Schleimer et al. 2003) — two documents
    sharing a token run of length >= k+w-1 (= 8 at k=5, w=4) must share
    at least one fingerprint; plus the short-doc edge contract."""
    from squrve_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"{shared} nine ten eleven twelve"),
        (3, "completely different words with no overlap at all here"),
        (4, "tiny doc"),       # < k tokens: empty fingerprint set
        (5, "five token doc here now"),  # exactly k: one gram, one window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in winnow_fingerprints(df).collect()}
    f1, f2, f3 = (set(out[i]["fps"]) for i in (1, 2, 3))
    assert f1 & f2, "shared 8-token run must yield a shared fingerprint"
    assert not (f1 & f3) and not (f2 & f3)
    assert out[4]["n_fps"] == 0 and out[4]["n_grams"] == 0
    assert out[5]["n_grams"] == 1 and out[5]["n_fps"] == 1
    # digest = md5 of the sorted fingerprint list (deterministic)
    import hashlib
    want = hashlib.md5(",".join(sorted(f1)).encode()).hexdigest()
    assert out[1]["fp_md5"] == want


def test_cdc_chunk_boundary_invariance(spark):
    """r9: THE content-defined-chunking property — prepending tokens to a
    document re-chunks only the edit's neighborhood; chunks past the
    first content-defined boundary are IDENTICAL (fixed-stride tiling
    would shift every window). Also the short-doc single-chunk edge."""
    from squrve_spark.operators.text import cdc_chunks

    base = " ".join(f"tok{i}" for i in range(200))
    rows = [
        (1, base),
        (2, "PREPENDED extra words " + base),  # edit at the front
        (3, "ab cd"),  # < k tokens: one chunk, the whole doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cdc_chunks(df).collect()}
    c1, c2 = out[1]["chunk_md5s"], out[2]["chunk_md5s"]
    # all chunks after the first boundary survive the prefix edit: the
    # SUFFIX chunk lists coincide except for the leading chunk(s)
    shared = 0
    while shared < min(len(c1), len(c2)) and c1[-1 - shared] == c2[-1 - shared]:
        shared += 1
    assert shared >= len(c1) - 2, (len(c1), len(c2), shared)
    assert c1[0] != c2[0]  # the edited neighborhood did change
    assert out[3]["n_chunks"] == 1
    # chunk lengths hover near the expected mod=16 tokens
    assert 4 <= out[1]["n_tokens"] / out[1]["n_chunks"] <= 64
