"""DSIR importance resampling (operators/dsir.py) — pure-Python reference
parity, enrichment on vocabulary-separated corpora, determinism, and the
resample contract. Cross-engine (DuckDB) parity for the registry entry is
covered by tests/test_oracle_parity.py::doc_dsir_select."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from squrve_spark.operators import dsir


def _py_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _py_weights(raw_texts, target_texts, n_buckets):
    ct = [0] * n_buckets
    cr = [0] * n_buckets
    for t in target_texts:
        for tok in t.strip().split():
            ct[_py_bucket(tok, n_buckets)] += 1
    for t in raw_texts:
        for tok in t.strip().split():
            cr[_py_bucket(tok, n_buckets)] += 1
    tt, tr = sum(ct), sum(cr)
    return [
        math.log((ct[b] + 1.0) / (tt + n_buckets))
        - math.log((cr[b] + 1.0) / (tr + n_buckets))
        for b in range(n_buckets)
    ]


RAW = [
    (0, "alpha beta gamma"),
    (1, "alpha alpha delta"),
    (2, "epsilon zeta beta"),
    (3, "gamma gamma gamma alpha"),
    (4, "zeta"),
]
TARGET_IDS = {0, 3}  # gamma/alpha-heavy slice


def test_scores_match_pure_python_reference(spark):
    B = 64
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = raw.filter(F.col("doc_id").isin(*TARGET_IDS))
    w = _py_weights(
        [t for _, t in RAW], [t for i, t in RAW if i in TARGET_IDS], B
    )
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir.dsir_scores(raw, target, n_buckets=B).collect()
    }
    for i, t in RAW:
        expect = sum(w[_py_bucket(tok, B)] for tok in t.strip().split())
        assert got[i] == pytest.approx(expect, abs=1e-9), (i, t)


def test_resample_contract_and_determinism(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = raw.filter(F.col("doc_id").isin(*TARGET_IDS))
    sel = dsir.dsir_resample(raw, target, n=3, n_buckets=64)
    a = [tuple(r) for r in sel.collect()]
    b = [tuple(r) for r in dsir.dsir_resample(raw, target, 3, n_buckets=64).collect()]
    assert a == b  # no RNG anywhere — replays exactly
    assert len(a) == 3
    ids = {i for i, _ in a}
    assert ids <= {i for i, _ in RAW}
    scores = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir.dsir_scores(raw, target, n_buckets=64).collect()
    }
    assert all(s == pytest.approx(scores[i]) for i, s in a)


def test_enrichment_on_separated_vocabularies(spark):
    """With disjoint vocabularies (the regime DSIR is for), resampling must
    overwhelmingly select raw docs that speak the target's vocabulary."""
    tgt_vocab = [f"t{i}" for i in range(30)]
    other_vocab = [f"o{i}" for i in range(30)]

    def doc(vocab, seed, n=20):
        # deterministic token picks via md5 — no RNG in tests either
        return " ".join(
            vocab[int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:4], 16) % len(vocab)]
            for j in range(n)
        )

    rows = [(i, doc(tgt_vocab, i), "tgtlike") for i in range(50)] + [
        (i + 50, doc(other_vocab, i + 50), "other") for i in range(50)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    target = spark.createDataFrame(
        [(1000 + i, doc(tgt_vocab, 1000 + i)) for i in range(30)],
        "doc_id long, text string",
    )
    sel = dsir.dsir_resample(raw, target, n=30, n_buckets=256)
    kinds = (
        sel.join(raw.select("doc_id", "kind"), "doc_id")
        .groupBy("kind")
        .count()
        .collect()
    )
    by_kind = {r["kind"]: r["count"] for r in kinds}
    assert by_kind.get("tgtlike", 0) >= 28, by_kind


def test_source_divergence_matches_numpy_and_orders_drift(spark):
    """r5: pairwise JS divergence over hashed-unigram distributions — the
    distributed result equals a numpy reference computed from the same
    bucket counts (incl. buckets present in only one source), divergence
    is symmetric-bounded [0, ln2], and a deliberately drifted source
    diverges more than any same-distribution pair."""
    import math

    import numpy as np

    from pyspark.sql import Row

    from squrve_spark.operators.dsir import source_divergence

    rows = []
    # two same-ish sources + one heavily drifted vocabulary
    for i in range(40):
        rows.append(Row(doc_id=i, source="a", text="alpha beta gamma delta common words"))
    for i in range(40, 80):
        rows.append(Row(doc_id=i, source="b", text="alpha beta gamma delta common terms"))
    for i in range(80, 120):
        rows.append(Row(doc_id=i, source="c", text="zzz qqq xxx totally different tokens"))
    df = spark.createDataFrame(rows)
    out = {
        (r["source_a"], r["source_b"]): r["js_div"]
        for r in source_divergence(df, n_buckets=256).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    for v in out.values():
        assert 0.0 <= v <= math.log(2) + 1e-9
    assert out[("a", "c")] > out[("a", "b")]
    assert out[("b", "c")] > out[("a", "b")]

    # numpy reference from the same md5-bucket counts
    import hashlib

    def bucket(tok, B=256):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    def distvec(texts, B=256):
        v = np.zeros(B)
        for t in texts:
            for tok in t.split():
                v[bucket(tok)] += 1
        return v / v.sum()

    texts = {"a": [], "b": [], "c": []}
    for r in rows:
        texts[r.source].append(r.text)
    for (x, y), got in out.items():
        p, q = distvec(texts[x]), distvec(texts[y])
        m = (p + q) / 2
        js = 0.5 * np.sum(np.where(p > 0, p * np.log(p / m), 0)) + \
             0.5 * np.sum(np.where(q > 0, q * np.log(q / m), 0))
        assert abs(got - round(float(js), 6)) < 2e-6, (x, y, got, js)
