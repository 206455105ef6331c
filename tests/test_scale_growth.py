"""Empirical scale-growth smoke (r4 verdict #6): run the heaviest
operators at sf0.001 / sf0.01 / sf0.1 and assert runtime grows
SUB-QUADRATICALLY in data size.

The plan-shape tests (test_plan_shapes.py) prove static properties —
pushdown, broadcast, no cartesian — but can't catch an accidental
all-pairs kernel INSIDE a pandas UDF or a driver-side loop whose cost is
data-dependent. Measuring wall time across two decades of data size can:
a quadratic operator grows ~100x per decade, 10000x across the range;
an (n log n)-or-better operator stays near ~10x per decade plus fixed
overhead.

Methodology: per operator, one untimed warm-up at sf0.001 (pays codegen /
Python-worker spin-up once), then one timed run per SF, ascending. The
assertion uses the fitted growth EXPONENT over the full 100x span —
log(t_big/t_small)/log(100) — with a generous bound (1.5: quadratic is
2.0, linear is 1.0) plus an absolute floor (1.5s at sf0.1) so trivially
fast operators never flake on scheduler jitter: a sub-second query that
doubles from noise is not a scale risk.
"""

from __future__ import annotations

import math
import time

import pytest

from squrve_spark.plans import REGISTRY

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
SPAN = 100.0  # data-size ratio between the endpoints

# The heaviest registry entries by r4/r5 BENCH_DETAIL steady time, i.e. the
# ones where a hidden quadratic kernel would actually hurt at 100 TB.
HEAVIES = [
    "doc_dsir_select",
    "doc_decontaminate",
    "multimodal_jpeg_stats",
    "pipeline_curate_v2",
    "doc_lm_cross_entropy",
    "doc_quality_model",
    "doc_bpe_tokens",
    "doc_decontam_bloom",
    "dedup_components",
    "doc_bm25",
    # r5 additions (r5 verdict #6): the round's new composite heavies
    "pipeline_curate_v3",
    "graph_pagerank",
    "graph_components_emb",
    "doc_embed_search",
    "doc_source_divergence",
    # r7: held-out-reference bigram perplexity (model + scoring shuffles
    # must both stay bigram-bounded)
    "doc_lm_perplexity",
    # r7: boilerplate-segment removal — the hot-set aggregate must stay
    # distinct-segment-bounded and the memoized explode must not hide a
    # per-branch rescan blowup
    "doc_segment_dedup",
    # r10: tf-idf keywords — the df join and per-doc window must stay
    # (doc, type)-bounded, never token-volume x corpus
    "doc_keywords",
    # r10: the shingle-fp self-join — per-key fanout is #sources²-bounded
    # by construction; a hot shared shingle must not turn it quadratic
    "dedup_source_overlap",
    # r10: LSH pairs -> iterative min-label closure — per-iteration cost
    # must stay |edges|-bounded as clusters grow
    "dedup_minhash_collapse",
    # r10: cross-doc line dedup — the line-df groupBy must stay
    # distinct-line-bounded and the verdict join must not fan out on the
    # planted per-source boilerplate (the hottest line key)
    "doc_line_dedup",
    # r10: integer fixed-point PageRank — per-iteration cost must stay
    # |edges|-bounded exactly like the float loop it mirrors
    "graph_pagerank_exact",
    # r10: the recipe-family composite — page synthesis must not re-run
    # per consumer and the per-shard FFD scan is shard-size-linear
    "pipeline_curate_v6",
    # r10: the semantic capstone composite — embed once (memoized), cells
    # via bounded-collect integer kmeans, in-cell pairwise only
    "pipeline_curate_v7",
    # late r10: gram-diagonal islands — work must stay bounded by
    # candidate pairs x shared grams, never corpus x corpus
    "dedup_shared_spans",
    # late r10: bipartite block-grid margin mining — per-cell BLAS work is
    # quadratic-by-construction INSIDE bounded cells; total must grow like
    # the grid (linear per side at fixed n_blocks), and everything after
    # the kernel is nodes x k
    "emb_margin_mine",
    # late r10: PPJoin — the prefix inverted index must keep postings
    # rare-token-short; a hot prefix token turning the candidate join
    # quadratic is exactly what this decade would catch
    "dedup_ppjoin_pairs",
    # late r10 (review): corpus-wide containment shares the full inverted
    # index — a stop-shingle degeneration would show here first (the
    # registered entry runs uncapped for exactness)
    "dedup_containment",
    # r11 (r10 verdict task 7): integer-exact k-means — per-iteration cost
    # is one assignment join + one cell groupBy, both corpus-linear at
    # fixed (k, n_iter); a hidden per-cell quadratic would show here
    "emb_kmeans_exact",
    # r11: the exact-dedup -> containment-prune -> UniMax composite — the
    # shared intersection core is now single-materialized (memo), so total
    # growth must track the inverted index, not 2x it
    "pipeline_curate_v8",
    # r11: stream_neardup's BATCH oracle — pigeonhole-banded SimHash; a
    # hot 16-bit band turning bucket pairing quadratic shows here first
    "dedup_simhash",
    # r11: the cost-routed similarity front door — the route DECISION adds
    # one histogram aggregate (corpus-linear); whichever regime it picks
    # must keep the join shared-shingle-bounded
    "dedup_similarity_join",
    # r11: integer PQ — codebook training is one stacked shuffle per round
    # (corpus-linear), encode is map-only, and the ADC scan is corpus x
    # m lookups; the local-topk prefilter must keep the candidate window
    # query-bounded as the corpus grows
    "sim_ipq_topk",
    # r11: BPE merge replay — Spark-side work is one vocabulary-bounded
    # word-count shuffle; the driver merge loop is vocab-bounded, never
    # corpus-bounded (the growth decade would expose a corpus-scale leak)
    "doc_bpe_merge_table",
    # r12: integer IVFPQ — coarse training + PQ training are bounded
    # collects over corpus-linear shuffles, encode/assignment are
    # map-only, and the probe equi-join scores only probed cells' rows;
    # a skewed coarse cell swallowing the corpus would show here first
    "sim_iivfpq_topk",
]

MAX_EXPONENT = 1.5  # sub-quadratic with margin (linear == 1.0)
ABS_FLOOR_S = 1.5  # below this at the LARGEST SF, growth is noise


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


@pytest.mark.parametrize("name", HEAVIES)
def test_subquadratic_growth(spark, name):
    spec = REGISTRY[name]
    _force(spec.fn(spark, SF_DIRS[0]))  # warm-up: codegen + worker pool
    times = []
    for sf_dir in SF_DIRS:
        t0 = time.monotonic()
        _force(spec.fn(spark, sf_dir))
        times.append(time.monotonic() - t0)
    t_small, t_big = times[0], times[-1]
    if t_big < ABS_FLOOR_S:
        return  # too fast for growth to be meaningful (or a scale risk)
    exponent = math.log(t_big / t_small) / math.log(SPAN)
    assert exponent < MAX_EXPONENT, (
        f"{name}: runtime grew {t_big / t_small:.1f}x over a {SPAN:.0f}x data "
        f"increase (exponent {exponent:.2f} >= {MAX_EXPONENT}) — "
        f"times per SF: {[round(t, 2) for t in times]}; suspect an all-pairs "
        "kernel or driver-side data-dependent loop"
    )


# ---------------------------------------------------------------------------
# r7 (r6 verdict #8): one more decade for the top composites. The driver
# fixtures stop at sf0.1 — exactly where skew and state-size effects begin —
# so a 10x-larger documents/embeddings/events trio is SYNTHESIZED (once,
# cached in /tmp) with the same schema and distributional shape as the
# driver's sf0.1 tables (vocab, doc-length range, lang/source mix, exact-dup
# rate, unit-norm 64-dim embeddings, 30-day event window), derived
# empirically from sf0.1 rather than hardcoded. Never written under
# /root/testdata (read-only).

SF1_DIR = "/tmp/squrve_scale_sf1"
_SF1_SCALE = 10  # rows vs sf0.1


def _synthesize_sf1() -> str:
    import os

    import numpy as np
    import pandas as pd

    marker = os.path.join(SF1_DIR, "_complete")
    if os.path.exists(marker):
        return SF1_DIR
    os.makedirs(SF1_DIR, exist_ok=True)
    rng = np.random.default_rng(42)

    src = pd.read_parquet("/root/testdata/sf0.1/documents.parquet")
    vocab = sorted({w for t in src["text"] for w in t.split(" ")})
    nw = src["text"].str.split(" ").str.len()
    langs, lang_p = np.unique(src["lang"], return_counts=True)
    sources, source_p = np.unique(src["source"], return_counts=True)
    dup_rate = 1.0 - src["text"].nunique() / len(src)

    n_docs = len(src) * _SF1_SCALE
    lens = rng.integers(nw.min(), nw.max() + 1, n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        if texts and rng.random() < dup_rate:
            texts.append(texts[int(rng.integers(0, len(texts)))])
        else:
            texts.append(" ".join(
                vocab[j] for j in rng.integers(0, len(vocab), lens[i])))
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, n_docs, p=lang_p / lang_p.sum()),
        "source": rng.choice(sources, n_docs, p=source_p / source_p.sum()),
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(os.path.join(SF1_DIR, "documents.parquet"), index=False)

    emb_src = pd.read_parquet("/root/testdata/sf0.1/embeddings.parquet")
    dim = len(emb_src["embedding"].iloc[0])
    n_lab = int(emb_src["label"].max()) + 1
    n_vec = len(emb_src) * _SF1_SCALE
    labels = rng.integers(0, n_lab, n_vec).astype(np.int32)
    # label-clustered unit vectors (center + noise), like the fixture's
    # labeled clusters, so LSH/semantic dedup sees realistic structure
    centers = rng.normal(size=(n_lab, dim))
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_vec, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": list(vecs),
        "label": labels,
    }).to_parquet(os.path.join(SF1_DIR, "embeddings.parquet"), index=False)

    ev_src = pd.read_parquet("/root/testdata/sf0.1/events.parquet")
    n_ev = len(ev_src) * _SF1_SCALE
    types, type_p = np.unique(ev_src["event_type"], return_counts=True)
    t0 = ev_src["ts"].min().value
    t1 = ev_src["ts"].max().value
    ts = np.sort(rng.integers(t0, t1, n_ev))
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pd.to_datetime(ts).astype("datetime64[us]"),
        "user_id": rng.integers(0, ev_src["user_id"].max() * _SF1_SCALE, n_ev),
        "event_type": rng.choice(types, n_ev, p=type_p / type_p.sum()),
        "value": np.round(rng.uniform(0, float(ev_src["value"].max()), n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }).to_parquet(os.path.join(SF1_DIR, "events.parquet"), index=False)
    open(marker, "w").write("ok")
    return SF1_DIR


def _capped_fuzzy_pairs(spark, sf_dir):
    """The operator's documented 100 TB shape: cluster-collapsed variant
    join + max_cluster cap (the uncapped registry entry's OUTPUT is
    semantically quadratic on identical-key clusters — the cap is exactly
    the knob a degenerate corpus requires, audited separately)."""
    from pyspark.sql import functions as F

    from squrve_spark.catalog import load_table
    from squrve_spark.operators.dedup import fuzzy_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.substring(F.trim(F.col("text")), 1, 12)).alias("k")
    )
    return fuzzy_pairs(docs, "doc_id", "k", max_cluster=32)


EXTENDED_HEAVIES = [
    ("pipeline_curate_v3", None),
    ("graph_components_emb", None),
    ("dedup_minhash_lsh", None),
    ("doc_fuzzy_pairs_capped", _capped_fuzzy_pairs),
    # r7: word-granularity segment dedup — at sf1 most vocabulary words
    # cross the min_df threshold, so the hot set saturates at vocab size
    # and the anti-join must stay distinct-segment-bounded
    ("doc_segment_dedup", None),
    # late r7: the fully-oracled C4 composite built on it (gate + cap +
    # mask are map-only/keyed stages over the same memoized frame)
    ("pipeline_curate_v4", None),
    # r8 (r7 verdict #7): the retrieval/LM heavies whose term-frequency
    # skew grows with corpus size. doc_hybrid_search additionally guards
    # the round's local_topk fix — before it, the per-query global window
    # sorted corpus-sized frames in |queries| tasks, exactly the shape an
    # extra decade exposes.
    ("doc_hybrid_search", None),
    ("doc_lm_perplexity", None),
    ("doc_bm25", None),
    # r8 additions: the mixture draw's few-strata rank window must stay
    # local_topk-bounded, and the decile cumsum's critical path is one
    # range partition's sort — both shapes only show strain past sf0.1
    ("doc_mixture_sample", None),
    ("doc_quality_deciles", None),
    # late r8: the backoff scorer shares perplexity's distinct-bigram
    # shuffle bound plus a distinct-unigram join — same skew exposure
    ("doc_lm_backoff", None),
    # r9 (r8 verdict #2): the composite chaining all four r8 stages —
    # its LM chain is trained on the blocklist survivors, so the
    # distinct-bigram bound must hold on the gated (not raw) corpus
    ("pipeline_curate_v5", None),
    # r9 (r8 verdict #5): the two operators with a DRIVER-SIDE training
    # component. Their training inputs are corpus-size-independent by
    # construction — bpe.corpus_word_freqs collects at most 50_000
    # hash-capped (word, count) rows and train_bpe_merges is
    # O(n_merges x distinct_words) on that cap; doc_quality_model trains
    # on a hash-ordered LIMIT 200 sample — so across the decade only the
    # distributed halves (word-count shuffle bounded by vocabulary;
    # map-only Catalyst scoring) may grow.
    ("doc_bpe_tokens", None),
    ("doc_quality_model", None),
    # late r9: winnowing pairs — the fingerprint arrays MUST stay
    # materialized ahead of the explode (the 100x HOF-re-eval hazard this
    # entry regressed into before the fix) and the inverted-index join
    # must stay shared-fingerprint-bounded
    ("dedup_winnow_pairs", None),
    # r10: cross-source shingle overlap — the synthesized sf1 corpus
    # REUSES duplicate texts across sources, so shared-shingle mass grows
    # with the decade; the fp join's fanout must stay #sources²-bounded
    ("dedup_source_overlap", None),
    # r10: minhash closure — dup rate is constant so cluster count grows
    # ~linearly; the iteration count is log(max cluster diameter) and the
    # per-iteration shuffle must stay |edges|-bounded
    ("dedup_minhash_collapse", None),
    # r10: the recipe-family composite — the sf1 corpus's duplicated
    # texts multiply shared lines, so the boilerplate df-groupBy and the
    # anti-join must stay distinct-line-bounded while the per-shard FFD
    # scan grows shard-size-linearly
    ("pipeline_curate_v6", None),
]


@pytest.mark.parametrize("name,fn", EXTENDED_HEAVIES, ids=[n for n, _ in EXTENDED_HEAVIES])
def test_subquadratic_growth_extended_decade(spark, name, fn):
    """sf0.01 -> sf0.1 -> sf1: the extra decade where cluster sizes, LSH
    band occupancy, and state volumes are 10x the driver fixtures'."""
    sf1 = _synthesize_sf1()
    run = fn or REGISTRY[name].fn
    dirs = [SF_DIRS[1], SF_DIRS[2], sf1]
    run(spark, dirs[0]).write.mode("overwrite").format("noop").save()  # warm-up
    times = []
    for sf_dir in dirs:
        # build once untimed (r12): the registry plan memo makes the small
        # scale's timed pass plan-build-free, while the big decade's first
        # build is cold — warming construction at EVERY scale keeps the
        # exponent a measure of distributed computation growth, which is
        # what this test bounds (driver plan-build does not grow with sf)
        run(spark, sf_dir)
        t0 = time.monotonic()
        _force(run(spark, sf_dir))
        times.append(time.monotonic() - t0)
    t_small, t_big = times[0], times[-1]
    if t_big < ABS_FLOOR_S:
        return
    exponent = math.log(t_big / t_small) / math.log(100.0)
    assert exponent < MAX_EXPONENT, (
        f"{name}: grew {t_big / t_small:.1f}x over 100x data incl. the "
        f"synthesized sf1 decade (exponent {exponent:.2f} >= {MAX_EXPONENT}) "
        f"— times: {[round(t, 2) for t in times]}"
    )


def test_skew_lever_bounds_straggler_load_across_decade(spark):
    """r9 (r8 verdict #3): the salted path's straggler metric beats the
    plain join's on the skewed fixture, and keeps beating it as the data
    grows sf0.1 -> sf1. The metric is DETERMINISTIC — the largest
    join-key GROUP the exchange must co-locate: per (key) plain vs per
    (key, salt) salted. (Partition-level max loads add hash-packing
    noise — 8 salt buckets into 32 partitions collide ~60% of the time
    — but the per-group count is what bounds a reducer's MANDATORY
    co-located work.) Both loads
    grow ~linearly in corpus size (exponent ~1 — the hot key IS half the
    corpus); what the lever buys is the n_salts-fold constant bound on
    the straggler, so we assert (a) the salted exponent never exceeds
    the plain one, and (b) the 4x-at-least load separation holds at BOTH
    ends of the decade, not just where it was tuned."""
    import math

    from pyspark.sql import functions as F

    from squrve_spark.catalog import load_table
    from squrve_spark.operators.scale import _salt_col

    sf1 = _synthesize_sf1()

    def loads(sf_dir: str) -> tuple[int, int]:
        ev = load_table(spark, sf_dir, "events").select(
            F.when(F.col("user_id") % 4 < 2, F.lit(0))
            .otherwise(F.col("user_id") % 100)
            .alias("k")
        )
        def max_load(df, cols):
            return (
                df.groupBy(*[F.col(c) for c in cols])
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.max("n")).collect()[0][0]
            )
        plain = max_load(ev, ["k"])
        salted = max_load(ev.withColumn("__salt", _salt_col(8)),
                          ["k", "__salt"])
        return plain, salted

    p_small, s_small = loads(SF_DIRS[2])   # sf0.1
    p_big, s_big = loads(sf1)              # sf1
    # the hot key holds ~half the corpus: the plain reducer is a straggler
    assert p_small >= 4 * s_small, (p_small, s_small)
    assert p_big >= 4 * s_big, (p_big, s_big)
    exp_plain = math.log(p_big / p_small) / math.log(10.0)
    exp_salted = math.log(s_big / s_small) / math.log(10.0)
    assert exp_salted <= exp_plain + 0.05, (exp_salted, exp_plain)
