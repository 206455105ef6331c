"""operators/lm.py — bigram-LM perplexity (CCNet-style quality filter)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from squrve_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_counts_and_vocab(spark):
    ref = _docs(spark, [(1, "the cat sat"), (2, "the cat ran"), (3, "x")])
    bigrams, contexts, vocab = lm.train_bigram_lm(ref)
    bg = {(r.w1, r.w2): r.c2 for r in bigrams.collect()}
    # doc 3 has one token -> contributes no bigrams but no crash either
    assert bg == {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}
    ctx = {r.w1: r.c1 for r in contexts.collect()}
    assert ctx == {"the": 2, "cat": 2}
    assert vocab == 5  # the cat sat ran x


def test_perplexity_matches_hand_computation(spark):
    ref = _docs(spark, [(1, "a b a b a c")])
    bigrams, contexts, vocab = lm.train_bigram_lm(ref)
    assert vocab == 3
    # model: c2 = {ab:2, ba:2, ac:1}; c1 = {a:3, b:2}
    out = lm.score_perplexity(
        _docs(spark, [(10, "a b c")]), bigrams, contexts, vocab
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_bigrams == 2
    # p(b|a) = (2+1)/(3+3) = 0.5 ; p(c|b) = (0+1)/(2+3) = 0.2
    # logs snapped to the 6dp decimal grid before averaging; HALF_UP snap
    # matches Spark's double->decimal cast
    from decimal import ROUND_HALF_UP, Decimal

    def snap6(v):
        return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    # the engines sum EXACT decimals, cast the sum to double, then divide
    lp = float(snap6(math.log(0.5)) + snap6(math.log(0.2))) / 2
    assert row.avg_logp == lp
    assert row.ppl == round(math.exp(-lp), 4)


def test_unseen_context_degrades_to_uniform(spark):
    ref = _docs(spark, [(1, "a b c d")])
    bigrams, contexts, vocab = lm.train_bigram_lm(ref)
    # every scored bigram has an unseen context -> p = 1/V, ppl = V
    out = lm.score_perplexity(
        _docs(spark, [(10, "zz qq zz")]), bigrams, contexts, vocab
    ).collect()[0]
    assert out.ppl == round(math.exp(-round(math.log(1 / 4), 6)), 4) == 4.0


def test_short_and_null_docs_excluded(spark):
    ref = _docs(spark, [(1, "a b")])
    bigrams, contexts, vocab = lm.train_bigram_lm(ref)
    corpus = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, None), (4, "a b")], ["doc_id", "text"]
    )
    out = lm.score_perplexity(corpus, bigrams, contexts, vocab)
    assert [r.doc_id for r in out.collect()] == [4]


def test_tokenizer_is_portable_shape(spark):
    df = spark.createDataFrame(
        [(1, "Hello, WORLD!! 123 foo_bar")], ["doc_id", "text"]
    )
    toks = df.select(lm.tokens_expr().alias("t")).collect()[0].t
    assert toks == ["hello", "world", "foo", "bar"]


def test_reference_docs_score_lower_ppl(spark):
    """In-domain text must be less surprising than out-of-domain noise."""
    ref = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
    )
    bigrams, contexts, vocab = lm.train_bigram_lm(ref)
    scored = lm.score_perplexity(
        _docs(
            spark,
            [(100, "the quick brown fox"), (101, "zeta xylo qwerty vortex")],
        ),
        bigrams,
        contexts,
        vocab,
    )
    ppl = {r.doc_id: r.ppl for r in scored.collect()}
    assert ppl[100] < ppl[101]


def test_score_backoff_branch_arithmetic(spark):
    """Stupid Backoff (r8) on a hand-built corpus: seen bigrams score
    c2/c1, unseen ones 0.4*(cu+1)/(N+V) — verified against a pure-Python
    replay, and n_backoffs counts exactly the unseen bigram occurrences."""
    import math

    from pyspark.sql import functions as F

    from squrve_spark.operators import lm

    ref = spark.createDataFrame(
        [(0, "a b a b c"), (5, "b c")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "a b z q")],  # 'c z','z q' unseen; z,q OOV
        "doc_id long, text string",
    )
    bigrams, contexts, vocab = lm.train_bigram_lm(ref)
    uni, nt = lm.train_unigrams(ref)
    got = {r["doc_id"]: r for r in
           lm.score_backoff(corpus, bigrams, uni, nt, vocab).collect()}

    bg = {(r["w1"], r["w2"]): r["c2"] for r in bigrams.collect()}
    c1 = {}
    for (w1, _), c in bg.items():
        c1[w1] = c1.get(w1, 0) + c
    cu = {r["w"]: r["cu"] for r in uni.collect()}

    def score(w1, w2):
        if (w1, w2) in bg:
            return bg[(w1, w2)] / c1[w1]
        return 0.4 * (cu.get(w2, 0) + 1) / float(nt + vocab)

    def replay(tokens):
        pairs = list(zip(tokens, tokens[1:]))
        from collections import Counter
        logs = sum(
            round(math.log(score(a, b)) * 10**6) / 10**6 * n  # 6dp grid
            for (a, b), n in Counter(pairs).items()
        )
        return len(pairs), logs / len(pairs)

    for doc_id, toks in ((1, ["a", "b", "c"]), (2, ["a", "b", "z", "q"])):
        nb, avg = replay(toks)
        assert got[doc_id]["n_bigrams"] == nb
        assert abs(got[doc_id]["avg_logs"] - avg) < 1e-9
    assert got[1]["n_backoffs"] == 0  # 'a b','b c' both in the reference
    assert got[2]["n_backoffs"] == 2  # 'b z','z q' backed off


def test_ccnet_bins_semantics(spark):
    """r9: per-language tercile sanity — every language shows all three
    bins with head quality strictly better (lower max ppl) than tail's
    minimum is NOT required (sample thresholds are approximate), but
    per-lang mean ppl must be monotone head < middle < tail and the bin
    populations roughly balanced."""
    from squrve_spark.plans import REGISTRY
    from tests.conftest import SF_MED

    rows = REGISTRY["doc_ccnet_bins"].fn(spark, SF_MED).collect()
    by = {}
    for r in rows:
        by.setdefault((r["lang"], r["bin"]), []).append(r["ppl"])
    langs = {k[0] for k in by}
    assert len(langs) > 1
    for lang in langs:
        h = by.get((lang, "head"), [])
        m = by.get((lang, "middle"), [])
        t = by.get((lang, "tail"), [])
        assert h and m and t, (lang, len(h), len(m), len(t))
        mean = lambda xs: sum(xs) / len(xs)
        assert mean(h) < mean(m) < mean(t), lang
        n = len(h) + len(m) + len(t)
        for part in (h, m, t):
            assert n / 6 <= len(part) <= n / 1.8, (lang, len(part), n)
