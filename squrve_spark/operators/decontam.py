"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation set.

The standard pre-training hygiene step (the reference's data-prep stage has
no analog — this is part of the engine's LLM-pipeline extension surface,
like the dedup family it shares machinery with): a training document is
contaminated when it shares verbatim n-grams with a benchmark/eval document.
Expressed Spark-first:

* both sides reuse ``with_hashed_shingles`` — shingles are xxhash64 longs,
  never strings, so the overlap join is a long equi-join;
* the eval side is DISTINCT shingles only — benchmark suites are tiny
  relative to a 100 TB corpus, so it broadcasts (flag to disable when an
  eval set is genuinely huge);
* the overlap is a broadcast LEFT SEMI join (map-side, zero shuffle of the
  corpus) followed by one groupBy on doc id — the only shuffle, keyed the
  same as every other per-doc aggregate in the pipeline.

Fixture calibration: TESTDATA documents are vocabulary-soup, so n=3 grams
collide incidentally (~85% of docs share one); n=4 separates planted
duplicated passages (33-77 shared grams) from noise (0-2) — the registry
query uses n=4 with a min_hits threshold between those bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from squrve_spark.catalog import MEMO_CAP, int_array_expr, plan_key
from squrve_spark.operators.dedup import _u64_str, with_hashed_shingles


def contamination_scores(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document overlap with the eval set: (id, n_shingles, n_hits).

    Documents shorter than n tokens carry no shingles and are dropped (they
    cannot be contaminated under this definition).
    """
    train = with_hashed_shingles(docs, text_col=text_col, n=n).select(
        F.col(id_col), F.size("sh").alias("n_shingles"), F.explode("sh").alias("sh")
    )
    ev = (
        with_hashed_shingles(eval_docs, text_col=text_col, n=n)
        .select(F.explode("sh").alias("sh"))
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = train.join(ev, on="sh", how="left_semi")
    per_doc = hits.groupBy(id_col, "n_shingles").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    all_docs = train.select(id_col, "n_shingles").distinct()
    return (
        all_docs.join(per_doc.select(id_col, "n_hits"), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training corpus minus documents with >= min_hits shared n-grams.

    Anti-join against the contaminated id set (pair-scale, not
    corpus-scale); documents too short to shingle are KEPT (no evidence of
    contamination)."""
    scores = contamination_scores(
        docs, eval_docs, n=n, text_col=text_col, id_col=id_col,
        broadcast_eval=broadcast_eval,
    )
    bad = scores.filter(F.col("n_hits") >= min_hits).select(id_col)
    return docs.join(bad, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# Bloom-filter variant (r4): constant-size broadcast for huge eval sets


def _probe_expr(col, i: int, m_bits: int, portable: bool):
    """Bloom probe position i for a shingle-hash column.

    ``portable`` swaps xxhash64 for a 60-bit md5 prefix of the shingle's
    unsigned-decimal rendering plus the probe index — nonnegative on both
    engines, so plain ``%`` replays as DuckDB
    ``CAST(('0x'||substr(md5(CAST(s AS VARCHAR)||':'||i),1,15)) AS UBIGINT)
    % m_bits`` (same idiom as the minhash/simhash md5 conversions)."""
    if portable:
        h = F.conv(
            F.substring(F.md5(F.concat(_u64_str(col), F.lit(f":{i}"))), 1, 15),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(m_bits))
    return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))


def build_shingle_bloom(
    eval_docs: DataFrame,
    n: int = 4,
    m_bits: int = 1 << 16,
    k: int = 4,
    text_col: str = "text",
    portable: bool = False,
):
    """Build a Bloom filter over the eval set's DISTINCT shingle hashes ->
    (numpy int64 words, m_bits, k).

    The probe positions are computed BY SPARK (``pmod(xxhash64(sh, i),
    m_bits)``) and collected — the scoring side evaluates the identical
    expressions, so there is no Python reimplementation of xxhash64 to
    drift (same trick as the trained classifier's feature hashing). The
    collect is bounded by the DISTINCT eval shingle count; the artifact that
    ships to every executor afterwards is m_bits/8 bytes REGARDLESS of eval
    size — that's the point vs the exact semi-join set, which broadcasts
    8 bytes per shingle. Standard Bloom tradeoff: no false negatives,
    FPR ~ (1 - e^(-k*n/m))^k.
    """
    import numpy as np

    from squrve_spark.catalog import plan_key

    # the bit array is the operator's TRAINED artifact (the dsir-weights /
    # PQ-codebook session-memo contract, r12): repeat builds over the same
    # eval snapshot skip the shingle-explode + probe collect job that was
    # re-running per call (~0.9 s/pass at sf0.1). The corpus-side scoring
    # still executes in full per action.
    spark = eval_docs.sparkSession
    cache = spark.__dict__.setdefault("_squrve_bloom_cache", {})
    ckey = (*plan_key(eval_docs), n, m_bits, k, text_col, portable)
    hit = cache.get(ckey)
    if hit is not None:
        return hit
    ev = (
        with_hashed_shingles(eval_docs, text_col=text_col, n=n, portable=portable)
        .select(F.explode("sh").alias("sh"))
        .distinct()
    )
    probes = ev.select(
        *[
            _probe_expr(F.col("sh"), i, m_bits, portable).alias(f"p{i}")
            for i in range(k)
        ]
    ).collect()
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    for r in probes:
        for i in range(k):
            idx = r[f"p{i}"]
            words[idx >> 6] |= np.uint64(1) << np.uint64(idx & 63)
    out = (words.view(np.int64), m_bits, k)
    while len(cache) >= MEMO_CAP:
        cache.pop(next(iter(cache)))
    cache[ckey] = out
    return out


def _might_contain_expr(col, words_col, m_bits: int, k: int, portable: bool = False):
    """ALL k probe bits set — pure Catalyst (probe hash + shift + mask)."""
    test = F.lit(True)
    for i in range(k):
        idx = _probe_expr(col, i, m_bits, portable)
        word = F.element_at(words_col, (idx / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftrightunsigned", word, (idx % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        test = test & (bit == 1)
    return test


def contamination_scores_bloom(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    m_bits: int = 1 << 16,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Bloom-filtered contamination counts: (id, n_shingles, n_hits).

    Corpus side is MAP-ONLY — no join at all: each document counts its
    shingles that hit the filter with one ``filter``+``size`` over the
    shingle array, entirely in whole-stage codegen. Compared to the exact
    path (broadcast LEFT SEMI + groupBy shuffle), this trades a documented
    false-positive rate for zero shuffle and a constant-size broadcast;
    superset property (bloom_hits >= exact hits, no false negatives) is
    asserted in tests/test_hygiene.py.
    """
    from squrve_spark.catalog import memo_plan, plan_key

    words, m_bits, k = build_shingle_bloom(eval_docs, n, m_bits, k, text_col, portable)

    def build():
        # ONE parsed expression, not 1024 py4j F.lit calls (plan-build time)
        words_arr = int_array_expr(words)
        shingled = with_hashed_shingles(docs, text_col=text_col, n=n,
                                        portable=portable)
        return shingled.select(
            F.col(id_col),
            F.size("sh").alias("n_shingles"),
            F.size(
                F.filter(
                    "sh",
                    lambda s: _might_contain_expr(s, words_arr, m_bits, k, portable),
                )
            ).cast("bigint").alias("n_hits"),
        )

    # plan-object memo (r12, the ANN memo_plan contract): the 1024-word
    # literal + 4-probe md5 filter tree costs ~0.5 s of parse+analysis per
    # build; identical (corpus, eval, params) returns the SAME lazy frame —
    # every action still scans and scores the corpus in full.
    return memo_plan(
        docs.sparkSession,
        ("bloom_scores", *plan_key(docs), *plan_key(eval_docs),
         n, m_bits, k, text_col, id_col, portable),
        build,
    )


def semantic_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EMBEDDING-SPACE decontamination: flag corpus vectors whose max
    cosine to ANY eval vector reaches ``threshold`` — catches paraphrased
    benchmark leakage that verbatim n-gram overlap misses (the reason
    modern decontam runs both a lexical and a semantic pass).

    Scale shape: eval sets are tiny by definition, so the UNIT eval matrix
    broadcasts (|eval| x dim doubles) and the corpus pass is MAP-ONLY — one
    Arrow-batched BLAS matmul per batch, no join, no shuffle, no
    corpus-sized state; the same broadcast-matrix pattern as
    `similarity.semantic_dedup`'s cell assignment. Returns one row per
    corpus vector: (id, max_sim rounded to 6, contaminated flag on the
    rounded value so the decision is engine-stable).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    from squrve_spark.catalog import spread

    spark = corpus.sparkSession
    # the unit eval matrix is the operator's trained artifact — session-
    # memoized per eval snapshot (r12, the bloom/codebook contract): the
    # collect job re-ran on every rebuild; corpus scoring is untouched
    _ec = spark.__dict__.setdefault("_squrve_semcontam_eval_cache", {})
    _ek = (*plan_key(eval_df), vec_col)
    Eu = _ec.get(_ek)
    if Eu is None:
        rows = eval_df.select(vec_col).collect()
        if not rows:
            raise ValueError(
                "semantic_contamination: eval_df is empty — an empty eval set "
                "would silently mark the whole corpus clean"
            )
        E = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
        en = np.linalg.norm(E, axis=1, keepdims=True)
        if not (en > 0).any():
            raise ValueError(
                "semantic_contamination: every eval vector is zero-norm — "
                "cosine is undefined against the whole eval set"
            )
        # zero-norm EVAL rows match nothing (a 0/0 NaN row would propagate
        # through the max and flag the ENTIRE corpus under NaN-is-largest)
        en[en == 0] = np.inf
        Eu = E / en
        while len(_ec) >= MEMO_CAP:
            _ec.pop(next(iter(_ec)))
        _ec[_ek] = Eu
    from squrve_spark.catalog import memo_broadcast

    bc = memo_broadcast(spark, Eu, "semcontam-eval")

    @pandas_udf("double")
    def max_sim(vecs):  # pd.Series -> pd.Series (hints omitted: pd is
        # function-local here, so string annotations would not resolve)
        eu = bc.value
        if len(vecs) == 0:  # empty Arrow batch (AQE/empty-partition paths)
            return pd.Series(dtype="float64")
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        n = np.linalg.norm(V, axis=1, keepdims=True)
        # zero-norm (degenerate) corpus vectors: cosine is undefined —
        # defined here as 0.0 (matches nothing) rather than NaN, which
        # Spark's NaN-is-largest ordering would flag as contaminated
        n[n == 0] = np.inf
        Vu = V / n
        return pd.Series((Vu @ eu.T).max(axis=1))

    staged = spread(corpus.select(id_col, vec_col)).withColumn(
        "_m", max_sim(F.col(vec_col))
    )
    sim6 = F.round(F.col("_m"), 6)
    return staged.select(
        id_col,
        sim6.alias("max_sim"),
        (sim6 >= F.lit(threshold)).alias("contaminated"),
    )
