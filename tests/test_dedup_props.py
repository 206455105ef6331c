"""Dedup operator properties that the DuckDB oracle can't express:
LSH candidate subsets, signature bounds, survivor invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import dedup
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_df_cap_identical_pairs_at_fixture_scale(spark, docs):
    """A generous document-frequency cap must not change results on the
    fixture (no shingle is near-universal there) — the guard only bites on
    true stop-shingles."""
    base = dedup.ngram_jaccard_pairs(docs, ["lang", "source"], threshold=0.5)
    capped = dedup.ngram_jaccard_pairs(
        docs, ["lang", "source"], threshold=0.5, max_shingle_df=100
    )
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, base.collect()))


def test_df_cap_drops_universal_shingle(spark):
    """A shingle present in every doc must be excluded from the join under
    the cap: without it the two unrelated docs pair up (the stop-shingle is
    their whole intersection); with it they don't."""
    from pyspark.sql import Row

    stop = "the quick fox"  # one shared 3-gram across all docs
    rows = [
        Row(doc_id=1, text=f"{stop} alpha beta gamma delta"),
        Row(doc_id=2, text=f"{stop} epsilon zeta eta theta"),
        Row(doc_id=3, text=f"{stop} iota kappa lambda mu"),
    ]
    df = spark.createDataFrame(rows).withColumn("_b", F.lit(1))
    loose = dedup.ngram_jaccard_pairs(df, ["_b"], threshold=0.05)
    assert len(_pairs(loose)) == 3  # every pair shares the stop-shingle
    capped = dedup.ngram_jaccard_pairs(df, ["_b"], threshold=0.05, max_shingle_df=2)
    assert _pairs(capped) == set()  # guard removed the universal key


def test_minhash_pairs_subset_of_exact(spark, docs):
    """Every LSH-surfaced pair passes exact Jaccard verification, so the
    minhash output must be a subset of the unblocked exact pairs at the
    same threshold (precision = 1 by construction)."""
    exact = dedup.ngram_jaccard_pairs(
        docs.withColumn("_b", F.lit(1)), ["_b"], threshold=0.5
    )
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    exact_pairs, lsh_pairs = _pairs(exact), _pairs(lsh)
    assert lsh_pairs <= exact_pairs
    if exact_pairs:
        assert len(lsh_pairs) / len(exact_pairs) >= 0.8  # S-curve recall at 0.5


def test_minhash_jaccard_values_match_exact(spark, docs):
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    exact = dedup.ngram_jaccard_pairs(
        docs.withColumn("_b", F.lit(1)), ["_b"], threshold=0.5
    )
    ex = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
    for r in lsh.collect():
        assert ex[(r["id_a"], r["id_b"])] == pytest.approx(r["jaccard"], abs=1e-6)


def test_simhash_hamming_bound(spark, docs):
    out = dedup.simhash_pairs(docs, max_hamming=3)
    rows = out.collect()
    assert rows, "corpus contains near-duplicates"
    assert all(0 <= r["hamming"] <= 3 for r in rows)


def test_simhash_identical_docs_zero_distance(spark, docs):
    """Exact duplicates (same text) must collide at hamming 0."""
    dupes = (
        dedup.exact_dedup_groups(docs).filter(F.col("n_copies") > 1).limit(1).collect()
    )
    if not dupes:
        pytest.skip("no exact duplicates at this sf")
    sig = dedup.simhash_signatures(docs)
    fp = docs.select("doc_id", F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))).alias("fp"))
    joined = fp.filter(F.col("fp") == dupes[0]["fp_md5"]).join(sig, "doc_id")
    sigs = [r["sig"] for r in joined.collect()]
    assert len(set(sigs)) == 1


def test_exact_dedup_survivor_is_min_id(spark, docs):
    groups = dedup.exact_dedup_groups(docs)
    total = docs.count()
    assert groups.agg(F.sum("n_copies")).collect()[0][0] == total
    assert groups.count() <= total  # grouping never invents rows


def test_span_dup_stats_and_filter(spark):
    """Hand-built corpus: doc 1 and 2 share one 4-token span; doc 3 is
    unique. Stats and the max_frac filter must reflect exactly that."""
    from squrve_spark.operators.dedup import (
        corpus_span_dup_stats,
        filter_span_dup_docs,
    )

    rows = [
        (1, "a b c d x y z w"),       # spans: "a b c d", "x y z w"
        (2, "a b c d q r s t"),       # shares "a b c d"
        (3, "unique words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in corpus_span_dup_stats(df, span=4).collect()
    }
    assert (got[1]["n_spans"], got[1]["dup_spans"]) == (2, 1)
    assert (got[2]["n_spans"], got[2]["dup_spans"]) == (2, 1)
    assert (got[3]["n_spans"], got[3]["dup_spans"]) == (1, 0)
    assert got[1]["dup_frac"] == 0.5
    # max_frac 0.4 drops docs 1 and 2, keeps 3
    kept = {r["doc_id"] for r in filter_span_dup_docs(df, span=4, max_frac=0.4).collect()}
    assert kept == {3}
    # short doc (< span tokens) forms exactly one whole-text span
    short = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    r = corpus_span_dup_stats(short, span=4).collect()[0]
    assert (r["n_spans"], r["dup_spans"]) == (1, 0)


def test_sliding_span_windows(spark):
    """stride < span: overlapping windows catch passages that fixed tiling
    splits across block boundaries."""
    from squrve_spark.operators.dedup import corpus_span_dup_stats
    import pytest

    # shared 4-token passage "p q r s" offset differently in the two docs —
    # fixed 4-token tiling never aligns it, stride-1 sliding does
    rows = [
        (1, "a b p q r s x y"),
        (2, "c p q r s z w v"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fixed = {r["doc_id"]: r["dup_spans"] for r in corpus_span_dup_stats(df, span=4).collect()}
    assert fixed == {1: 0, 2: 0}
    sliding = {r["doc_id"]: r["dup_spans"] for r in
               corpus_span_dup_stats(df, span=4, stride=1).collect()}
    assert sliding[1] >= 1 and sliding[2] >= 1
    with pytest.raises(ValueError):
        corpus_span_dup_stats(df, span=4, stride=5)


def test_fuzzy_pairs_blocking_is_exact(spark):
    """The deletion-neighborhood candidate set + levenshtein filter equals
    the brute-force edit-distance<=1 pair set (FastSS completeness on real
    fixture keys, incl. a transposition false-positive being filtered)."""
    from pyspark.sql import functions as F

    from squrve_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in REGISTRY["doc_fuzzy_pairs"].fn(spark, sf).collect()
    }
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", F.lower(F.substring(F.trim("text"), 1, 12)).alias("k"))
    )
    a, b = [r for r in docs.collect()], None
    brute = set()
    import itertools

    def lev(s, t):
        if abs(len(s) - len(t)) > 1:
            return 2
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    for x, y in itertools.combinations(sorted(a, key=lambda r: r["doc_id"]), 2):
        d = lev(x["k"], y["k"])
        if d <= 1:
            brute.add((x["doc_id"], y["doc_id"], d))
    assert got == brute
    assert brute, "fixture should produce at least one fuzzy pair"


def test_fuzzy_pairs_skew_cluster_bounded(spark):
    """r7 skew fix (r6 verdict "What's wrong" #1): ~1k documents sharing one
    boilerplate 12-char prefix must NOT degenerate the deletion-variant
    join. The distinct-key collapse means the variant join sees ONE row for
    the hot cluster (shuffle cluster-bounded); `max_cluster` caps the pair
    expansion so the OUTPUT is cap-bounded too, and the audit frame reports
    exactly what the cap suppressed."""
    from squrve_spark.operators.dedup import (
        fuzzy_cluster_audit,
        fuzzy_key_pairs,
        fuzzy_pairs,
    )
    from pyspark.sql import functions as F

    n_hot = 1000
    hot = [(i, "chapter 1: in") for i in range(n_hot)]
    # two near keys (edit distance 1 from the hot key) and one far key
    other = [(5000, "chapter 2: in"), (5001, "chapter 1: i"), (5002, "zzz")]
    docs = spark.createDataFrame(hot + other, "doc_id long, k string")

    # 1. shuffle bound: the key-pair join input is DISTINCT keys only —
    #    4 keys -> 4 rows regardless of the 1000-doc hot cluster
    keys = docs.groupBy("k").agg(F.count("*").alias("n_docs"))
    assert keys.count() == 4
    kp = {(r["k1"], r["k2"], r["dist"]) for r in fuzzy_key_pairs(keys).collect()}
    assert kp == {
        ("chapter 1: in", "chapter 2: in", 1),
        ("chapter 1: i", "chapter 1: in", 1),
        ("chapter 1: in", "chapter 1: in", 0),
    }

    # 2. capped expansion: only the `cap` lowest-id members pair up
    cap = 10
    capped = fuzzy_pairs(docs, "doc_id", "k", max_cluster=cap)
    rows = capped.collect()
    intra = [r for r in rows if r["dist"] == 0]
    assert len(intra) == cap * (cap - 1) // 2
    assert all(r["id_a"] < r["id_b"] < cap for r in intra)
    # cross-key pairs: capped hot members x the two near keys
    cross = [r for r in rows if r["dist"] == 1]
    assert len(cross) == 2 * cap
    assert len(rows) == len(intra) + len(cross)

    # 3. audit says exactly what was suppressed
    audit = fuzzy_cluster_audit(docs, max_cluster=cap).collect()
    assert len(audit) == 1
    a = audit[0]
    assert (a["k"], a["n_docs"], a["rep_id"]) == ("chapter 1: in", n_hot, 0)
    assert a["suppressed_pairs"] == n_hot * (n_hot - 1) // 2 - cap * (cap - 1) // 2

    # 4. uncapped output matches brute force on the cross-key pairs and
    #    the quadratic identical-key semantics
    full = fuzzy_pairs(docs, "doc_id", "k")
    assert full.count() == n_hot * (n_hot - 1) // 2 + 2 * n_hot


def test_fuzzy_variant_cap_and_audit(spark):
    """`max_variant_df` drops hot deletion variants from both join sides
    (broadcast anti-join) — losing only pairs whose sole shared variant was
    hot — and `fuzzy_variant_audit` names those variants."""
    from squrve_spark.operators.dedup import (
        fuzzy_key_pairs,
        fuzzy_pairs,
        fuzzy_variant_audit,
    )
    from pyspark.sql import functions as F

    # keys "a0".."a9" all share deletion variant "a" (and pairwise distance
    # 1 via substitution variants "0".."9"... no — deleting position 2 of
    # "aX" gives "a"; deleting position 1 gives "X"); plus one isolated key
    docs = spark.createDataFrame(
        [(i, f"a{i}") for i in range(10)] + [(99, "qq")], "doc_id long, k string"
    )
    exact = fuzzy_pairs(docs, "doc_id", "k")
    assert exact.count() == 45  # all 10 "aX" keys pairwise within distance 1
    keys = docs.groupBy("k").agg(F.count("*").alias("n_docs"))
    capped = fuzzy_key_pairs(keys, max_variant_df=3)
    # every shared variant ("a" df=10; each bare digit df=1... digits unique)
    # -> with the "a" variant dropped, "aX" pairs survive only if another
    # shared variant exists; substitution pairs share NO other variant here
    assert capped.count() < 45
    hot = fuzzy_variant_audit(docs, max_variant_df=3).collect()
    assert [(r["v"], r["n_keys"]) for r in hot] == [("a", 10)]


def test_snapshot_diff_statuses_and_null_text(spark):
    """All four statuses fire; docs present in BOTH snapshots with NULL
    text are judged by membership (unchanged), never mistaken for
    added/removed via fingerprint nullness; the NULL->text transition is
    'changed' (null-safe compare)."""
    from squrve_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "goes away"),
         (5, None), (6, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "Same   TEXT"), (2, "has changed"), (4, "brand new"),
         (5, None), (6, "text now")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        1: "unchanged",  # canon form equal (case/whitespace collapsed)
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",  # NULL on both sides: membership, not fp nullness
        6: "changed",    # NULL -> text is a change (null-safe compare)
    }


def test_source_overlap_doc_unit_counts_mirrors_and_disjoint(spark):
    """Doc-unit overlap: planted mirror docs count once (distinct
    fingerprints, canon-equal variants collapse), zero-overlap pairs are
    emitted with jaccard 0."""
    from squrve_spark.operators.dedup import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "a", "shared doc one"),
            (2, "a", "shared doc two"),
            (3, "a", "only in a"),
            (4, "b", "SHARED   doc one"),   # canon-equal mirror of 1
            (5, "b", "shared doc two"),
            (6, "b", "only in b"),
            (7, "c", "completely disjoint"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(docs, unit="doc").collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = rows[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["shared_fps"]) == (3, 3, 2)
    assert ab["jaccard"] == 0.5  # 2 / (3 + 3 - 2)
    assert rows[("a", "c")]["shared_fps"] == 0
    assert rows[("a", "c")]["jaccard"] == 0.0


def test_shared_spans_finds_planted_overlap(spark):
    from squrve_spark.operators.dedup import shared_spans

    # doc 1 embeds tokens 10..29 of doc 0 starting at its position 5;
    # no other 8-gram run is shared (disjoint vocab elsewhere)
    base = [f"w{i}" for i in range(40)]
    other = [f"x{i}" for i in range(5)] + base[10:30] + [f"y{i}" for i in range(8)]
    rows = [(0, " ".join(base)), (1, " ".join(other))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    out = shared_spans(docs, pairs, k=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["start_a"], r["start_b"], r["span_tokens"]) == (10, 5, 20)


def test_shared_spans_identical_docs_full_span(spark):
    from squrve_spark.operators.dedup import shared_spans

    text = " ".join(f"t{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    r = shared_spans(docs, pairs, k=8).collect()[0]
    assert (r["start_a"], r["start_b"], r["span_tokens"]) == (0, 0, 25)


def test_shared_spans_disjoint_pair_emits_nothing(spark):
    from squrve_spark.operators.dedup import shared_spans

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"a{i}" for i in range(20))),
            (1, " ".join(f"b{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    assert shared_spans(docs, pairs, k=8).count() == 0


# ---------------------------------------------------------------------------
# PPJoin prefix filtering (r10)


def test_ppjoin_matches_bruteforce_on_fixture(spark, docs):
    """Prefix filtering is COMPLETE: the PPJoin pair set must equal the
    brute-force all-pairs Jaccard on the same hashed shingle sets —
    corpus-wide, no blocking."""
    got = sorted(map(tuple, dedup.ppjoin_pairs(docs, threshold=0.5).collect()))
    sh = dedup.with_hashed_shingles(docs.select("doc_id", "text"), "text", 3)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.round(
        dedup.jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6
    ).cast("double")
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )
    want = sorted(map(tuple, brute.collect()))
    assert got == want and got  # non-vacuous: the fixture plants near-dups


def test_ppjoin_finds_cross_block_pairs(spark):
    """Near-identical docs in DIFFERENT (lang, source) blocks: invisible
    to the blocked ngram_jaccard_pairs, found by corpus-wide PPJoin."""
    from pyspark.sql import Row

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        Row(doc_id=1, text=base, lang="en", source="s1"),
        Row(doc_id=2, text=base + " lambda", lang="de", source="s2"),
        Row(doc_id=3, text="one two three four five six seven", lang="en", source="s1"),
    ]
    df = spark.createDataFrame(rows)
    pp = {(r["id_a"], r["id_b"]) for r in dedup.ppjoin_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pp and not any(3 in p for p in pp)
    blocked = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(df, ["lang", "source"], threshold=0.5).collect()
    }
    assert (1, 2) not in blocked


def test_ppjoin_prefix_index_smaller_than_full(spark, docs):
    """The candidate-generation index must hold strictly fewer postings
    than the full inverted index — the whole point of prefix filtering.
    Recomputes both sizes from the operator's own building blocks."""
    sh = dedup.with_hashed_shingles(docs.select("doc_id", "text"), "text", 3)
    sizes = sh.select(F.size("sh").alias("sz"))
    full = sizes.agg(F.sum("sz")).collect()[0][0]
    prefix = sizes.select(
        (F.col("sz") - F.ceil(F.lit(0.5) * F.col("sz")) + F.lit(1)).alias("p")
    ).agg(F.sum("p")).collect()[0][0]
    assert prefix < full * 0.6  # t=0.5 keeps ~half of each doc's postings


def test_containment_detects_quote_inside_article(spark):
    """A short doc fully quoted inside a long one: containment(a in b)=1
    while Jaccard stays below any near-dup threshold — the asymmetric
    case the resemblance family misses by design."""
    from pyspark.sql import Row

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i}" for i in range(200))
    rows = [
        Row(doc_id=1, text=quote),
        Row(doc_id=2, text=filler + " " + quote + " " + filler[::-1].lower()),
        Row(doc_id=3, text="completely unrelated content about other things entirely"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["id_src"], r["id_dst"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.5).collect()
    }
    assert got.get((1, 2)) == 1.0          # quote contained in article
    assert (2, 1) not in got               # article NOT contained in quote
    assert not any(3 in k for k in got)    # unrelated doc pairs with nothing
    jac = {(r["id_a"], r["id_b"]) for r in
           dedup.ngram_jaccard_pairs(df.withColumn("lang", F.lit("en"))
                                       .withColumn("source", F.lit("s")),
                                     ["lang", "source"], threshold=0.5).collect()}
    assert (1, 2) not in jac               # resemblance misses the quote


def test_ppjoin_nondyadic_threshold_no_float_ceil_miss(spark):
    """Regression (r10 review, confirmed): with threshold 0.07 a 100-
    shingle doc fully containing a 7-shingle doc has J exactly 0.07; the
    float ceil(0.07*100)=ceil(7.000000000000001)=8 over-tightened the
    prefix and length filters and silently dropped the pair. Exact
    rational arithmetic must keep it."""
    from pyspark.sql import Row

    small_tokens = [f"t{i}" for i in range(9)]          # 7 shingles
    big_tokens = small_tokens + [f"u{i}" for i in range(93)]  # 100 shingles
    rows = [
        Row(doc_id=1, text=" ".join(small_tokens)),
        Row(doc_id=2, text=" ".join(big_tokens)),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ppjoin_pairs(df, threshold=0.07).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 0.07


# ---------------------------------------------------------------------------
# similarity_join — cost-based regime router (r11, verdict task 3)


def _heavy_tail_corpus(spark, n_docs=40, seed=11):
    """Mostly-unique vocabulary (each doc draws fresh random words) with a
    planted near-dup pair — the regime where rare prefixes are selective."""
    import random

    from pyspark.sql import Row

    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        words = [f"w{rng.randrange(10**9)}" for _ in range(20)]
        rows.append(Row(doc_id=i, text=" ".join(words)))
    # planted near-dup: doc n_docs shares 19/20 words with doc 0
    dup = rows[0].text.split()
    dup[-1] = "changed"
    rows.append(Row(doc_id=n_docs, text=" ".join(dup)))
    return spark.createDataFrame(rows)


def _warm_vocab_corpus(spark, n_docs=40, seed=12):
    """Tiny shared vocabulary: every shingle is hot, prefixes buy nothing
    — the fixture-like anti-regime where the full index wins."""
    import random

    from pyspark.sql import Row

    rng = random.Random(seed)
    # 4 words -> at most 64 possible 3-gram shingles, so every shingle is
    # shared by many docs (mean df >> 1) and no rare prefix exists
    vocab = [f"v{k}" for k in range(4)]
    rows = [
        Row(doc_id=i, text=" ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows)


def test_similarity_route_picks_regimes(spark):
    """The router must choose ppjoin on the heavy-tailed corpus and
    full_index on the warm-vocabulary corpus — the two measured regimes."""
    heavy = dedup.similarity_route(_heavy_tail_corpus(spark), threshold=0.5)
    warm = dedup.similarity_route(_warm_vocab_corpus(spark), threshold=0.5)
    assert heavy["route"] == "ppjoin", heavy
    assert warm["route"] == "full_index", warm
    # the decision numbers must be internally consistent
    assert heavy["ppjoin_rows"] * 4.0 < heavy["full_rows"]
    assert warm["ppjoin_rows"] * 4.0 >= warm["full_rows"]


@pytest.mark.parametrize("mk", [_heavy_tail_corpus, _warm_vocab_corpus])
def test_similarity_join_routes_are_equal(spark, mk):
    """Property (verdict task 3): BOTH routes return the identical exact
    pair set on BOTH regimes — the router changes the plan, never the
    result."""
    df = mk(spark)
    pp = sorted(map(tuple, dedup.similarity_join(df, 0.5, route="ppjoin").collect()))
    fi = sorted(map(tuple, dedup.similarity_join(df, 0.5, route="full_index").collect()))
    assert pp == fi
    auto = sorted(map(tuple, dedup.similarity_join(df, 0.5).collect()))
    assert auto == pp


def test_similarity_join_heavy_tail_finds_planted_pair(spark):
    df = _heavy_tail_corpus(spark)
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.similarity_join(df, 0.5).collect()}
    assert (0, 40) in pairs


def test_similarity_join_plan_shows_chosen_route(spark):
    """The dispatched PLAN differs by regime: the ppjoin route verifies
    candidates with an array_intersect over shipped shingle arrays (its
    prefix-index subtree sits behind a memo checkpoint); the full-index
    route counts shared shingles via groupBy and never intersects
    arrays."""
    heavy_plan = dedup.similarity_join(
        _heavy_tail_corpus(spark), 0.5, route="ppjoin"
    )._jdf.queryExecution().analyzed().toString()
    full_plan = dedup.similarity_join(
        _warm_vocab_corpus(spark), 0.5, route="full_index"
    )._jdf.queryExecution().analyzed().toString()
    assert "array_intersect" in heavy_plan
    assert "array_intersect" not in full_plan


def test_similarity_join_rejects_unknown_route(spark):
    with pytest.raises(ValueError, match="unknown similarity_join route"):
        dedup.similarity_join(_warm_vocab_corpus(spark), 0.5, route="bogus")


def test_similarity_route_memoized(spark):
    """r12 (r11 verdict task 4): the route diagnostic (shingle explode +
    two aggregates) is memoized per (corpus snapshot, params) — a repeat
    call must be a pure dict copy, with NO Spark job. Different params on
    the same corpus must still re-measure (distinct cache keys)."""
    df = _warm_vocab_corpus(spark)
    spark.__dict__.pop("_squrve_simroute_cache", None)
    first = dedup.similarity_route(df, threshold=0.5)
    cache = spark.__dict__["_squrve_simroute_cache"]
    assert len(cache) == 1
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    second = dedup.similarity_route(df, threshold=0.5)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert second == first
    assert after == before, "cache hit must not launch Spark jobs"
    # the returned dict is a COPY — caller mutation can't poison the memo
    second["route"] = "poisoned"
    assert dedup.similarity_route(df, threshold=0.5)["route"] == first["route"]
    # a different threshold is a different decision -> new cache entry
    dedup.similarity_route(df, threshold=0.8)
    assert len(cache) == 2
