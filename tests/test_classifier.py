"""Trained quality classifier (operators/classifier.py): hash-consistent
train/score halves, learnability on separable data, JVM-only scoring plan."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from squrve_spark.operators import classifier


def _labeled(spark):
    good = [
        "spark catalyst plans joins aggregates windows distributed engine",
        "catalyst optimizer pushes filters and prunes columns distributed",
        "joins and aggregates shuffle on keys spark engine distributed",
        "windows and aggregates in the spark catalyst engine",
    ]
    bad = [
        "buy cheap pills now click here winner prize",
        "click the winner link now cheap prize pills",
        "prize winner click now buy cheap link pills",
        "cheap pills prize click winner now buy here",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_learns_separable_vocab(spark):
    df = _labeled(spark)
    model = classifier.train_quality_model(df, dim=64)
    scored = {
        r["doc_id"]: r
        for r in classifier.score_documents(df, model, threshold=0.5).collect()
    }
    for r in df.collect():
        assert scored[r["doc_id"]]["quality_pred"] == (r["label"] == 1), r
    # probabilities ordered: every good doc above every bad doc
    goods = [v["quality_prob"] for k, v in scored.items() if k < 100]
    bads = [v["quality_prob"] for k, v in scored.items() if k >= 100]
    assert min(goods) > max(bads)


def test_spark_score_matches_numpy_reconstruction(spark):
    """JVM aggregate-expression scoring == driver-side numpy scoring over
    the SAME Spark-derived bucket counts (hash consistency end to end)."""
    df = _labeled(spark)
    model = classifier.train_quality_model(df, dim=64)
    counts = classifier.bucket_counts(df, dim=64).collect()
    by_doc: dict[int, np.ndarray] = {}
    for r in counts:
        by_doc.setdefault(r["doc_id"], np.zeros(64))[r["bucket"]] += r["n"]
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in classifier.score_documents(df, model).collect()
    }
    # score_expr embeds weights rounded to 9dp — mirror that here
    w9 = np.array([round(float(x), 9) for x in model.weights])
    b9 = round(float(model.bias), 9)
    for doc_id, x in by_doc.items():
        mean = float(x @ w9 / x.sum())
        expect = round(1.0 / (1.0 + np.exp(-(mean + b9))), 6)
        assert abs(got[doc_id] - expect) < 1e-6, doc_id


def test_scoring_plan_is_jvm_only(spark):
    """The corpus-scoring plan must contain no Python evaluation nodes and
    no exchange — map-only whole-stage codegen."""
    df = _labeled(spark)
    model = classifier.train_quality_model(df, dim=64)
    plan = (
        classifier.score_documents(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_empty_text_consistent_with_empty_token_bucket(spark):
    """tokens_expr('') is [''] engine-wide, so an empty doc scores
    sigmoid(bias + w[bucket('')]) — consistent between train and score
    halves (the same '' token feeds bucket_counts)."""
    df = _labeled(spark)
    model = classifier.train_quality_model(df, dim=64)
    empty = spark.createDataFrame([(7, "")], "doc_id long, text string")
    r = classifier.score_documents(empty, model).collect()[0]
    bucket = spark.sql(
        "SELECT CAST(pmod(xxhash64(lower('')), 64) AS INT) AS b"
    ).collect()[0]["b"]
    z = round(float(model.weights[bucket]), 9) + round(float(model.bias), 9)
    expect = round(1.0 / (1.0 + np.exp(-z)), 6)
    assert abs(r["quality_prob"] - expect) < 1e-6


def test_vote_model_pure_python_replay_and_separation(spark):
    """r10: the integer voting classifier — (a) weights replay EXACTLY
    from a pure-Python md5 reimplementation (the DuckDB oracle's
    semantics: w[b] = sign(pos_n*neg_total - neg_n*pos_total)), (b) votes
    are exact int64 token folds, (c) the model separates the planted
    good/bad training texts (usable gate, not just oracle-friendly)."""
    import hashlib

    df = _labeled(spark)
    model = classifier.train_vote_model(df, dim=64)
    assert set(model.weights) <= {-1, 0, 1} and len(model.weights) == 64

    # pure-Python retrain
    rows = df.collect()
    pn, nn = [0] * 64, [0] * 64
    for r in rows:
        for t in r["text"].strip().split():
            b = int(hashlib.md5(t.lower().encode()).hexdigest()[:8], 16) % 64
            if r["label"] == 1:
                pn[b] += 1
            else:
                nn[b] += 1
    pt, nt = sum(pn), sum(nn)
    want = [
        1 if pn[b] * nt > nn[b] * pt else (-1 if pn[b] * nt < nn[b] * pt else 0)
        for b in range(64)
    ]
    assert model.weights == want

    scored = {
        r["doc_id"]: (r["vote"], r["quality_pred"])
        for r in classifier.score_documents_vote(df, model).collect()
    }
    for r in rows:
        v = sum(
            want[int(hashlib.md5(t.lower().encode()).hexdigest()[:8], 16) % 64]
            for t in r["text"].strip().split()
        )
        assert scored[r["doc_id"]] == (v, v > 0), r["doc_id"]
        # perfect separation on the training texts
        assert (v > 0) == (r["label"] == 1), r["doc_id"]


def test_vote_scoring_plan_is_jvm_only(spark):
    """The vote-scoring plan must contain no Python evaluation nodes and
    no exchange — map-only whole-stage integer fold."""
    df = _labeled(spark)
    model = classifier.train_vote_model(df, dim=64)
    plan = (
        classifier.score_documents_vote(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
