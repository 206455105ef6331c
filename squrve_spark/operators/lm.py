"""N-gram language-model perplexity scoring — the CCNet/Gopher quality
filter (Wenzek et al. 2020, arXiv:1911.00359): train a small LM on a
trusted reference slice, keep raw-corpus documents whose per-token
perplexity under that model is low. The classic complement to
classifier-based quality scoring (`operators/classifier.py`) and DSIR
(`operators/dsir.py`): where DSIR matches hashed n-gram *distributions*,
perplexity scores each document's *sequence likelihood*.

Relation to `text.lm_cross_entropy` (doc_lm_cross_entropy): that operator
trains on the SAME corpus it scores — a self-repetition/typicality signal.
This one implements the actual CCNet filter geometry: the model is fit on
a held-out REFERENCE slice and applied to everything else, so low
perplexity means "looks like the trusted domain", not "looks like the
corpus average" — different training set, different smoothing
denominator, different determinism strategy (exact decimal summation vs
rounded doubles).

Spark-first shape (no reference analog — the reference is text-to-SQL;
this belongs to the training-data-pipeline extension surface):

1. **Tokenize** with an engine-portable rule: ``lower`` then split on
   ``[^a-z]+`` — identical in Spark (`F.split`) and DuckDB
   (`regexp_split_to_array`), so the whole operator has an exact
   cross-engine oracle.
2. **Train** an add-one-smoothed bigram model on the reference slice:
   bigram counts ``c(w1,w2)``, context counts ``c(w1) = Σ_w2 c(w1,w2)``,
   vocabulary size ``V``. Both aggregations partial-combine map-side, so
   each shuffle is bounded by the distinct-bigram count (≲ token count of
   the reference slice, NOT the raw corpus).
3. **Score**: p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V); unseen contexts
   degrade to 1/V. Documents pre-aggregate their bigram multiset to
   (doc_id, w1, w2, n) before the model join, so the join input is the
   per-doc *distinct* bigram set; the model side is a plain equi-join on
   (w1, w2) — broadcastable when the reference slice is small, hash join
   otherwise, never a cross product.
4. **Determinism**: each bigram's log-prob is computed on identical
   IEEE-double inputs in both engines, rounded to a DECIMAL(20,6) grid,
   and weighted by its exact integer multiplicity — decimal addition is
   exact and order-independent, so Spark's partition-order-dependent
   summation can never drift from the oracle. Doubles only reappear for
   the final avg/exp on identical inputs.

At 100 TB: two scans (reference slice, full corpus), three bounded
shuffles (model build, doc-bigram distinct, per-doc sum); scoring state
is the model table — never corpus-sized, no Python anywhere in the plan.
"""

from __future__ import annotations

from squrve_spark.catalog import MEMO_CAP

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_expr(text_col: str = "text"):
    """Engine-portable tokenizer: lowercase, split on non-[a-z] runs,
    drop empties. DuckDB twin:
    ``list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')``.
    """
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda t: t != ""
    )


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2, n) — each document's bigram multiset, pre-aggregated so
    downstream joins see distinct bigrams only. Docs with <2 tokens are
    filtered BEFORE the sequence() expansion (Spark's sequence(0, -1)
    would count DOWN, fabricating bogus pairs)."""
    # spread FIRST (r12, guide §2.5 input skew): the single-file parquet
    # fixture arrives as ONE partition, so the tokenize+explode+partial-agg
    # stage would run single-threaded (measured 0.9 s/pass at sf0.1)
    from squrve_spark.catalog import spread

    toks = spread(df).select(
        F.col(id_col), tokens_expr(text_col).alias("toks")
    ).where(F.size("toks") >= 2)
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2), "
                "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
            )
        ).alias("bg"),
    )
    return (
        pairs.select(id_col, "bg.w1", "bg.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_bg: Optional[DataFrame] = None,
    vocab_size: Optional[int] = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Reference slice -> (bigram_counts, context_counts, vocab_size).

    bigram_counts: (w1, w2, c2); context_counts: (w1, c1) with
    c1 = Σ_w2 c2 — the conditional-MLE denominator; vocab_size counts
    distinct tokens (unigrams) in the slice.

    ``doc_bg`` (r9 scan audit): a precomputed per-doc bigram frame for
    the reference slice (`doc_bigrams(corpus).where(<slice>)`) — callers
    that also score the corpus should build the corpus frame ONCE,
    memo_checkpoint it, and filter it here instead of paying a second
    tokenize+explode pass over the reference. ``vocab_size`` skips the
    vocabulary scan when the caller already knows it (e.g. from
    `train_unigrams(..., return_vocab=True)`)."""
    src = doc_bg if doc_bg is not None else _doc_bigrams(reference, text_col, id_col)
    bigrams = src.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
    contexts = bigrams.groupBy("w1").agg(F.sum("c2").alias("c1"))
    if vocab_size is None:
        # vocab scan memoized per reference snapshot (r12): a trained
        # scalar of the model, same session-memo contract as
        # dsir_bucket_weights / int8_scales — repeat trainings of the
        # identical slice skip the countDistinct job
        from squrve_spark.catalog import plan_key

        spark = reference.sparkSession
        cache = spark.__dict__.setdefault("_squrve_lm_vocab_cache", {})
        key = (*plan_key(reference), text_col)
        vocab_size = cache.get(key)
        if vocab_size is None:
            vocab_size = (
                reference.select(F.explode(tokens_expr(text_col)).alias("tok"))
                .agg(F.countDistinct("tok"))
                .collect()[0][0]
            )
            while len(cache) >= MEMO_CAP:
                cache.pop(next(iter(cache)))
            cache[key] = vocab_size
    return bigrams, contexts, int(vocab_size or 0)


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Public form of the per-doc bigram multiset: build once per query,
    memo_checkpoint, feed the train side via a doc-filter and the score
    side via ``doc_bg=`` — one tokenize+explode pass instead of one per
    stage (r9 scan audit: doc_lm_backoff paid it 3x)."""
    return _doc_bigrams(df, text_col, id_col)


def score_perplexity(
    corpus: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_bg: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document add-one bigram perplexity. ``doc_bg``: a precomputed
    (memo-checkpointed) per-doc bigram frame — pass the one the caller
    already built for training so the corpus tokenize+explode runs once.

    Output: (id, n_bigrams BIGINT, avg_logp DOUBLE, ppl DOUBLE 4dp) with
    ppl = exp(-avg_logp). Documents with fewer than two tokens are
    excluded (nothing to score). avg_logp ships UNROUNDED on purpose:
    it is exact-decimal-sum -> double cast -> IEEE division, bit-identical
    on both engines — whereas rounding it to the sum's own 6dp grid puts
    even denominators exactly on .5 boundaries, where Spark (HALF_UP on
    the shortest decimal repr) and C libraries (nearest on the binary
    value) legitimately disagree."""
    if doc_bg is None:
        doc_bg = _doc_bigrams(corpus, text_col, id_col)
    joined = (
        doc_bg.join(bigrams, ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .select(
            F.col(id_col),
            F.col("n"),
            # long + long -> double division: identical IEEE inputs and
            # result on both engines
            (
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab_size))
            ).alias("p"),
        )
    )
    per_doc = (
        joined.select(
            F.col(id_col),
            F.col("n"),
            # snap ln(p) to an exact decimal grid, weight by the exact
            # integer multiplicity -> order-independent exact summation
            (F.log("p").cast("decimal(20,6)") * F.col("n")).alias("logp"),
        )
        .groupBy(id_col)
        .agg(F.sum("n").alias("nb"), F.sum("logp").alias("sum_logp"))
    )
    avg = F.col("sum_logp").cast("double") / F.col("nb")
    return per_doc.select(
        F.col(id_col),
        F.col("nb").cast("long").alias("n_bigrams"),
        avg.alias("avg_logp"),
        F.round(F.exp(-avg), 4).alias("ppl"),
    )


def train_unigrams(
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    return_vocab: bool = False,
):
    """Reference slice -> (unigram_counts (w, cu), total token count N[,
    vocab_size]) — the backoff distribution for `score_backoff`. One
    explode + groupBy; N (and, with ``return_vocab``, the distinct-token
    count — saving `train_bigram_lm`'s separate vocabulary scan)
    collapse from the same aggregate, no second scan."""
    from squrve_spark.catalog import spread

    uni = (
        spread(reference)
        .select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    # (N, V) are trained scalars of the model — session-memoized per
    # reference snapshot (r12, same contract as train_bigram_lm's vocab
    # memo / dsir_bucket_weights): repeat trainings of the identical slice
    # skip the full tokenize+aggregate job the per-call .first() paid.
    from squrve_spark.catalog import plan_key

    spark = reference.sparkSession
    cache = spark.__dict__.setdefault("_squrve_lm_unigram_cache", {})
    key = (*plan_key(reference), text_col)
    row = cache.get(key)
    if row is None:
        r = uni.agg(F.sum("cu").alias("t"), F.count(F.lit(1)).alias("v")).first()
        row = (int(r["t"] or 0), int(r["v"] or 0))
        while len(cache) >= MEMO_CAP:
            cache.pop(next(iter(cache)))
        cache[key] = row
    if return_vocab:
        return uni, row[0], row[1]
    return uni, row[0]


def score_backoff(
    corpus: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    n_total: int,
    vocab_size: int,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    contexts: Optional[DataFrame] = None,
    doc_bg: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document Stupid Backoff score (Brants et al. 2007, the
    web-scale LM scoring recipe: no normalized smoothing, just back off
    to the unigram distribution with a fixed penalty):

        S(w2|w1) = c(w1,w2) / c(w1)                 when the bigram was seen
                 = alpha * (c(w2)+1) / (N+V)        otherwise
                   (add-one on the unigram backoff so OOV tokens score
                   finitely instead of log(0))

    Output: (id, n_bigrams, n_backoffs, avg_logs DOUBLE, sb_ppl 4dp) with
    sb_ppl = exp(-avg_logs) — comparable to `score_perplexity`'s ppl but
    cheaper-tailed: seen bigrams keep their raw MLE mass. n_backoffs (how
    often the doc fell off the bigram table) is itself a novelty signal.

    Same determinism contract as `score_perplexity`: long-arithmetic IEEE
    divisions, ln snapped to a DECIMAL(20,6) grid, exact integer-weighted
    decimal summation (order-independent), double cast only at the end.
    Scale shape identical too: shuffles bounded by distinct-bigram /
    distinct-unigram counts, never corpus x corpus.
    """
    if doc_bg is None:
        doc_bg = _doc_bigrams(corpus, text_col, id_col)
    # `train_bigram_lm` already aggregated context counts — pass them in
    # to skip the redundant groupBy (r8 ADVICE); recompute only when the
    # caller trained bigrams some other way.
    ctx = (
        contexts
        if contexts is not None
        else bigrams.groupBy("w1").agg(F.sum("c2").alias("c1"))
    )
    seen = F.col("c2").isNotNull()
    p = F.when(
        seen, F.col("c2") / F.col("c1")
    ).otherwise(
        F.lit(alpha)
        * (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(1))
        / F.lit(float(n_total + vocab_size))
    )
    joined = (
        doc_bg.join(bigrams, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(unigrams.withColumnRenamed("w", "w2"), ["w2"], "left")
        .select(
            F.col(id_col),
            F.col("n"),
            seen.alias("hit"),
            (F.log(p).cast("decimal(20,6)") * F.col("n")).alias("logs"),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.sum("n").alias("nb"),
        F.sum(F.when(F.col("hit"), F.lit(0)).otherwise(F.col("n")))
        .alias("n_backoffs"),
        F.sum("logs").alias("sum_logs"),
    )
    avg = F.col("sum_logs").cast("double") / F.col("nb")
    return per_doc.select(
        F.col(id_col),
        F.col("nb").cast("long").alias("n_bigrams"),
        F.col("n_backoffs").cast("long").alias("n_backoffs"),
        avg.alias("avg_logs"),
        F.round(F.exp(-avg), 4).alias("sb_ppl"),
    )
