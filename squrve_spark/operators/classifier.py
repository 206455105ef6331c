"""Fasttext-style linear quality classifier: hashed bag-of-words features,
driver-trained logistic head, JVM-side scoring.

The standard LLM-corpus quality filter (the GPT-3/LLaMA recipe: score every
document against a small trained classifier, keep high scorers) needs two
halves with very different scale profiles:

- **Training** is small-data (a labeled sample, thousands of rows) — it runs
  driver-side with numpy full-batch gradient descent. Features for the
  sample are computed BY SPARK (`bucket_counts`) so the training-time hash
  function is bit-identical to the scoring-time hash (both are Spark's
  ``xxhash64``) — no Python reimplementation to drift.
- **Scoring** is corpus-scale — it must be map-only and JVM-side. The model
  is a ``dim``-bucket weight vector folded into the plan as an array
  literal; the score is one ``aggregate`` over the token array
  (``w[xxhash64(token) mod dim]`` mean + bias => sigmoid), whole-stage
  codegen, zero Python, zero shuffle.

Model form: fasttext with a 1-dim output collapses to exactly this — the
mean of per-token scalar weights through a sigmoid.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from squrve_spark.catalog import MEMO_CAP, double_array_expr, int_array_expr, spread
from squrve_spark.operators.text import tokens_expr

DEFAULT_DIM = 256


def _bucket_expr(token: Column, dim: int) -> Column:
    return F.pmod(F.xxhash64(F.lower(token)), F.lit(dim))


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """(id, bucket, n) hashed-token counts — the training-feature extractor.
    Explode + groupBy with map-side partial agg; output is bounded by
    rows x distinct-buckets-per-doc, collected only for the labeled SAMPLE."""
    toks = spread(df.select(id_col, text_col)).select(
        id_col, F.explode(tokens_expr(text_col)).alias("_t")
    )
    return (
        toks.select(id_col, _bucket_expr(F.col("_t"), dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


@dataclass
class LinearTextModel:
    weights: np.ndarray  # (dim,)
    bias: float
    dim: int


def train_quality_model(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    epochs: int = 2000,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> LinearTextModel:
    """Driver-side logistic regression on Spark-hashed mean features.

    ``labeled`` must be a SAMPLE-sized frame (rows bounded by driver
    memory); features come from `bucket_counts` so train and score share
    the exact hash. Deterministic: full-batch GD from zero init.

    Memoized per (labeled snapshot, params) on the session — the
    trained-parameter contract (`int8_scales`, `_int_pq_codebooks`,
    `dsir_bucket_weights`): the feature collect + 2000-epoch GD re-ran
    identically on every call (r12, guide §1.2; ~1 s/call at sf0.1). A
    production filter trains once per labeled set and scores many
    corpora. Read-only snapshot inputs only (memo_checkpoint's caveat)."""
    from squrve_spark.catalog import plan_key

    spark = labeled.sparkSession
    cache = spark.__dict__.setdefault("_squrve_clf_cache", {})
    key = ("gd", *plan_key(labeled), label_col, text_col, id_col, dim,
           epochs, lr, l2)
    hit = cache.get(key)
    if hit is not None:
        return hit
    feats = bucket_counts(labeled, text_col, id_col, dim).collect()
    labels = {
        r[id_col]: float(r[label_col])
        for r in labeled.select(id_col, label_col).collect()
    }
    ids = sorted(labels)
    row_of = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), dim))
    for r in feats:
        X[row_of[r[id_col]], r["bucket"]] += r["n"]
    totals = X.sum(axis=1, keepdims=True)
    totals[totals == 0] = 1.0
    X /= totals  # mean-of-token-weights form (fasttext average pooling)
    y = np.array([labels[d] for d in ids])
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(y) + l2 * w)
        b -= lr * float(np.mean(g))
    model = LinearTextModel(weights=w, bias=b, dim=dim)
    while len(cache) >= MEMO_CAP:
        cache.pop(next(iter(cache)))
    cache[key] = model
    return model


def score_expr(model: LinearTextModel, text_col: str = "text") -> Column:
    """Catalyst-only scoring expression: sigmoid(bias + mean_t w[h(t)]).
    The weight table rides the plan as a ``dim``-element array literal —
    evaluated in whole-stage codegen, no Python boundary, no shuffle."""
    # ONE parsed expression, not dim py4j F.lit calls (plan-build time)
    w = double_array_expr([round(float(x), 9) for x in model.weights])
    toks = tokens_expr(text_col)
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(w, _bucket_expr(t, model.dim).cast("int") + 1),
    )
    mean = F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))
    z = mean + F.lit(round(float(model.bias), 9))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_documents(
    df: DataFrame,
    model: LinearTextModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Map-only corpus scoring: (id, quality_prob, quality_pred)."""
    prob = F.round(score_expr(model, text_col), 6)
    return spread(df).select(
        id_col,
        prob.alias("quality_prob"),
        (prob >= threshold).alias("quality_pred"),
    )


# ---------------------------------------------------------------------------
# r10 (r9 verdict #3): closed-form INTEGER voting classifier — the
# engine-replayable sibling of the GD-trained logistic above. Training is
# counting (one Spark aggregation, no gradient fit), weights live in
# {-1, 0, +1}, and scoring is an exact integer token vote — so the whole
# train+score path replays bit-identically in any SQL engine, which is what
# lets pipeline_curate_v2 carry an end-to-end DuckDB oracle. The GD model
# keeps its place (doc_quality_model) for when calibrated probabilities
# matter; the vote model is the oracle-able quality GATE.


def md5_bucket_expr(token: Column, dim: int) -> Column:
    """Engine-portable token bucket: first-8-hex of md5(lower(token)) mod
    dim — Spark `conv(substring(md5(...), 1, 8), 16, 10)` == DuckDB
    `CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT)` (the established
    md5 idiom; value < 2^32 so the mod is sign-free)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.lower(token)), 1, 8), 16, 10).cast("long"),
        F.lit(dim),
    )


@dataclass
class VoteTextModel:
    weights: list[int]  # (dim,) in {-1, 0, +1}
    dim: int


def train_vote_model(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
) -> VoteTextModel:
    """Per-bucket class-share vote weights, closed form: w[b] =
    sign(pos_n[b] * neg_total - neg_n[b] * pos_total) — the exact-integer
    cross-multiplied comparison of "is this bucket over-represented in
    positive documents". Buckets unseen in the sample stay 0 (abstain).
    Training cost: ONE explode+groupBy over the labeled SAMPLE (driver
    collects <= dim rows), independent of corpus size. Memoized per
    (labeled snapshot, params) — same contract as `train_quality_model`."""
    from squrve_spark.catalog import plan_key

    spark = labeled.sparkSession
    cache = spark.__dict__.setdefault("_squrve_clf_cache", {})
    key = ("vote", *plan_key(labeled), label_col, text_col, id_col, dim)
    hit = cache.get(key)
    if hit is not None:
        return hit
    toks = spread(labeled.select(label_col, text_col)).select(
        F.col(label_col).cast("int").alias("_y"),
        F.explode(tokens_expr(text_col)).alias("_t"),
    )
    per = (
        toks.select("_y", md5_bucket_expr(F.col("_t"), dim).alias("b"))
        .groupBy("b")
        .agg(
            F.sum("_y").cast("long").alias("pn"),
            F.sum(1 - F.col("_y")).cast("long").alias("nn"),
        )
        .collect()
    )
    pt = sum(r["pn"] for r in per)
    nt = sum(r["nn"] for r in per)
    w = [0] * dim
    for r in per:
        d = r["pn"] * nt - r["nn"] * pt
        w[int(r["b"])] = 1 if d > 0 else (-1 if d < 0 else 0)
    model = VoteTextModel(weights=w, dim=dim)
    while len(cache) >= MEMO_CAP:
        cache.pop(next(iter(cache)))
    cache[key] = model
    return model


def vote_expr(model: VoteTextModel, text_col: str = "text") -> Column:
    """Catalyst-only integer vote: sum_t w[h(t)] over the token array —
    whole-stage codegen, no Python, no shuffle, and EXACT (int64 sums of
    ±1), so any engine summing the same weights in any order agrees."""
    warr = int_array_expr(model.weights)
    toks = tokens_expr(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(warr, md5_bucket_expr(t, model.dim).cast("int") + 1),
    )


def score_documents_vote(
    df: DataFrame,
    model: VoteTextModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map-only corpus scoring: (id, vote, quality_pred = vote > 0).
    The fold is evaluated once (pred derives from the vote COLUMN —
    repeating the expression would re-run the token fold per output)."""
    v = vote_expr(model, text_col)
    return (
        spread(df)
        .select(id_col, v.alias("vote"))
        .withColumn("quality_pred", F.col("vote") > 0)
    )
