"""Sampling / selection / packing operators (squrve_spark/operators/
sampling.py): determinism, DuckDB parity for the hash-rank sample and
per-group top-k, and pack invariants for FFD token packing.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import sampling, text
from squrve_spark.plans import REGISTRY
from tests.conftest import SF_SMALL

DOCS = f"{SF_SMALL}/documents.parquet"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_deterministic_sample_matches_duckdb(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    got = _rows(sampling.deterministic_sample(docs, 7, ["lang"]), ["doc_id", "lang"])
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(f"""
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                FROM read_parquet('{DOCS}')
            ) WHERE rk <= 7
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_deterministic_sample_exact_sizes_and_stability(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    out = sampling.deterministic_sample(docs, 5, ["lang"])
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    pool = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {lang: min(5, n) for lang, n in pool.items()}
    # repartitioned input -> identical selection (the sampleBy failure mode)
    again = sampling.deterministic_sample(docs.repartition(13), 5, ["lang"])
    assert _rows(out, ["doc_id"]) == _rows(again, ["doc_id"])


def test_prefilter_factor_preserves_selection(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    exact = sampling.deterministic_sample(docs, 5, ["lang"])
    fast = sampling.deterministic_sample(docs, 5, ["lang"], prefilter_factor=8)
    assert _rows(exact, ["doc_id", "lang"]) == _rows(fast, ["doc_id", "lang"])


def test_topk_per_group_matches_duckdb(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    scored = text.quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    got = _rows(
        sampling.topk_per_group(
            scored.select("doc_id", "lang", "stopword_ratio"),
            ["lang"],
            [F.col("stopword_ratio").desc(), F.col("doc_id")],
            k=3,
        ),
        ["doc_id", "lang", "rank"],
    )
    # independent DuckDB reimplementation of the same quality signal
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(f"""
            WITH toks AS (
                SELECT doc_id, lang,
                       regexp_split_to_array(trim(text), '\\s+') AS w
                FROM read_parquet('{DOCS}')
            ), scored AS (
                SELECT doc_id, lang,
                       ROUND(len(list_filter(w, t -> list_contains({text.STOPWORDS_EN!r}, t)))
                             / len(w), 4) AS sr
                FROM toks
            )
            SELECT doc_id, lang, CAST(rk AS INTEGER) FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang ORDER BY sr DESC, doc_id) AS rk
                FROM scored
            ) WHERE rk <= 3
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_pack_documents_invariants(spark):
    counts = text.token_count(load_table(spark, SF_SMALL, "documents"))
    src = counts.select("doc_id", "n_tokens")
    budget = 256
    packed = sampling.pack_documents(src, budget=budget, num_shards=4).collect()
    # every doc assigned exactly once
    assert sorted(r["doc_id"] for r in packed) == sorted(
        r["doc_id"] for r in src.collect()
    )
    by_pack: dict = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, rows in by_pack.items():
        total = sum(r["n_tokens"] for r in rows)
        assert all(r["pack_tokens"] == total for r in rows)
        # budget holds unless the pack is a single over-budget doc
        assert total <= budget or len(rows) == 1
        # packs never span shards
        assert len({r["shard"] for r in rows}) == 1
    # determinism
    again = sampling.pack_documents(src.repartition(11), budget=budget, num_shards=4)
    assert sorted((r["doc_id"], r["pack_id"]) for r in again.collect()) == sorted(
        (r["doc_id"], r["pack_id"]) for r in packed
    )


def test_stratified_sample_runs(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    out = sampling.stratified_sample(docs, "lang", {l: 0.5 for l in langs}, seed=7)
    assert 0 < out.count() <= docs.count()


@pytest.mark.parametrize(
    "name", ["doc_sample_per_lang", "doc_topk_quality", "doc_pack_budget"]
)
def test_registry_entries_run(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMALL)
    assert df.columns and df.count() > 0


def test_hash_split_deterministic_and_proportional(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    out = sampling.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    n = len(rows)
    from collections import Counter

    c = Counter(rows.values())
    assert set(c) <= {"train", "val", "test"}
    # md5 is uniform: 80/10/10 within a loose tolerance at fixture size
    assert 0.6 * n <= c["train"] <= 0.95 * n
    # rerun is identical (no RNG)
    again = {r["doc_id"]: r["split"] for r in sampling.hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == rows


def test_hash_split_stable_under_corpus_growth(spark):
    """Adding rows must never move existing rows between splits (the
    property seeded randomSplit lacks)."""
    half = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    full = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = {r["doc_id"]: r["split"] for r in sampling.hash_split(half, w).collect()}
    big = {r["doc_id"]: r["split"] for r in sampling.hash_split(full, w).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_hash_split_rejects_bad_weights(spark):
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        sampling.hash_split(docs, {"train": 0.5, "val": 0.1})


def test_hash_split_is_map_only(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    out = sampling.hash_split(docs, {"train": 0.9, "test": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure projection


def test_weighted_mix_quotas_and_determinism(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "source")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = sampling.weighted_mix(docs, weights)
    rows = [(r["doc_id"], r["source"]) for r in out.collect()]
    from collections import Counter

    per_src = Counter(s for _, s in rows)
    counts = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("source").isin(list(weights)))
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    t = min(counts[s] / w for s, w in weights.items())
    assert per_src == {s: int(w * t) for s, w in weights.items()}
    # achieved proportions match the target mixture (within flooring)
    total = sum(per_src.values())
    for s, w in weights.items():
        assert abs(per_src[s] / total - w) < 0.05
    # deterministic rerun
    again = [(r["doc_id"], r["source"]) for r in sampling.weighted_mix(docs, weights).collect()]
    assert sorted(again) == sorted(rows)


def test_weighted_mix_drops_unlisted_sources(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "source")
    out = sampling.weighted_mix(docs, {"src0": 1.0})
    srcs = {r["source"] for r in out.collect()}
    assert srcs == {"src0"}


def test_bm25_hand_computed(spark):
    """Two tiny docs, one query term each way — verify against the formula
    by hand: idf = ln(1 + (N - df + .5)/(df + .5)), tf-part with k1=1.2,
    b=0.75."""
    import math

    df = spark.createDataFrame(
        [(1, "spark spark fast"), (2, "slow engine here"), (3, "spark once more there")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in text.bm25_scores(df, ["spark"]).collect()}
    assert set(got) == {1, 3}  # doc 2 has no query terms
    n, avgdl = 3.0, (3 + 3 + 4) / 3
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert got[1] == round(score(2, 3), 4)
    assert got[3] == round(score(1, 4), 4)


def test_weighted_mix_rejects_missing_supply_and_bad_weights(spark):
    """Review regression (late r4): a weighted source with zero rows must
    fail loudly (the constraint gives T=0; silent renormalization ships the
    wrong mixture), and non-positive weights are invalid."""
    import pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="no rows"):
        sampling.weighted_mix(docs, {"src0": 0.5, "no_such_src": 0.5})
    with pytest.raises(ValueError, match="> 0"):
        sampling.weighted_mix(docs, {"src0": 0.0, "src1": 1.0})


def test_leakproof_split_clusters_never_straddle(spark):
    """Every member of an exact-dup cluster lands in the SAME split, and the
    assignment is append-stable (new dup of an existing text inherits it)."""
    from pyspark.sql import functions as F

    rows = [(i, "dup text alpha" if i % 3 == 0 else f"unique {i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.leakproof_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    per_fp = (
        out.groupBy("fp_md5")
        .agg(F.countDistinct("split").alias("n_splits"), F.count("*").alias("n"))
        .collect()
    )
    dup_groups = [r for r in per_fp if r["n"] > 1]
    assert dup_groups, "fixture must contain a duplicate cluster"
    assert all(r["n_splits"] == 1 for r in per_fp)
    # append stability: adding one more copy of the dup text changes nothing
    # for existing rows
    base = {r["doc_id"]: r["split"] for r in out.collect()}
    df2 = spark.createDataFrame(rows + [(99, "dup text alpha")],
                                "doc_id long, text string")
    out2 = {r["doc_id"]: r["split"]
            for r in sampling.leakproof_split(
                df2, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(out2[i] == s for i, s in base.items())
    assert out2[99] == base[0]  # the new copy joins its cluster's split


def test_leakproof_split_keeps_input_columns(spark):
    df = spark.createDataFrame(
        [(1, "t1", "en"), (2, "t2", "de")], "doc_id long, text string, lang string"
    )
    out = sampling.leakproof_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert {"doc_id", "text", "lang", "fp_md5", "rep_id", "split"} <= set(out.columns)


def test_bm25_per_query_matches_single_query_path(spark):
    """A query whose term bag equals bm25_scores' input must reproduce the
    single-query scores exactly — same formula, same rounding — and a
    second query's presence must not perturb the first (dft is per-term,
    not per-(query, term))."""
    docs = load_table(spark, SF_SMALL, "documents")
    single = {r["doc_id"]: r["bm25"] for r in text.bm25_scores(docs, ["spark", "merge"]).collect()}
    multi = text.bm25_per_query(docs, {0: ["spark", "merge"], 1: ["join"]}).collect()
    q0 = {r["doc_id"]: r["bm25"] for r in multi if r["query_id"] == 0}
    assert q0 == single
    assert any(r["query_id"] == 1 for r in multi)


def test_bm25_per_query_rejects_empty(spark):
    import pytest as _pt

    docs = load_table(spark, SF_SMALL, "documents")
    with _pt.raises(ValueError):
        text.bm25_per_query(docs, {})
    with _pt.raises(ValueError):
        text.bm25_per_query(docs, {0: []})


def test_rrf_fuse_hand_computed(spark):
    """Three candidates across two lists: the doc present in BOTH lists
    (even at worse ranks) must outscore single-list docs; exact RRF
    arithmetic checked by hand; absent-list rank is NULL."""
    from squrve_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id int, doc_id int, rank int"
    )
    vec = spark.createDataFrame(
        [(0, 12, 1), (0, 13, 2)], "query_id int, doc_id int, rank int"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([lex, vec], k=60, topk=10).collect()}
    assert rows[12]["rrf_score"] == round(1 / 63 + 1 / 61, 6)  # both lists
    assert rows[10]["rrf_score"] == round(1 / 61, 6)
    assert rows[12]["fused_rank"] == 1  # fusion beats any single list
    assert rows[10]["rank_1"] is None and rows[13]["rank_0"] is None


def test_rrf_fuse_topk_and_tiebreak(spark):
    """Equal-score candidates order by doc_id; topk truncates per query
    independently."""
    from squrve_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 5, 1), (0, 3, 1), (1, 9, 1)], "query_id int, doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [(1, 8, 1)], "query_id int, doc_id int, rank int"
    )
    out = rrf_fuse([a, b], k=60, topk=1).collect()
    got = {(r["query_id"], r["doc_id"]) for r in out}
    assert got == {(0, 3), (1, 8)}  # q0: tie -> lower doc_id; q1: 8 < 9 tie
    import pytest as _pt

    with _pt.raises(ValueError):
        rrf_fuse([a])


def test_cap_per_group_binds_and_is_deterministic(spark):
    """cap_per_group keeps exactly min(cap, group size) rows per group,
    ranks 1..k densely, and repeated runs pick the SAME rows (md5 order,
    not partition order)."""
    from squrve_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_group(df, cap=4).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    assert set(by_group) == {"g0", "g1", "g2"}
    for g, grp in by_group.items():
        assert len(grp) == 4
        assert sorted(r["rank_in_group"] for r in grp) == [1, 2, 3, 4]
    again = {
        (r["doc_id"], r["rank_in_group"])
        for r in cap_per_group(df.repartition(7), cap=4).collect()
    }
    assert again == {(r["doc_id"], r["rank_in_group"]) for r in out}

    # a group smaller than the cap survives whole
    small = spark.createDataFrame(
        [(1, "solo"), (2, "solo")], "doc_id long, source string"
    )
    assert len(cap_per_group(small, cap=10).collect()) == 2


def test_length_bucket_stats_math(spark):
    """Bucket assignment is ceil(n/width); waste is exact integer math vs
    the bucket cap; a doc exactly at the cap contributes zero waste of
    its own."""
    from squrve_spark.operators.sampling import length_bucket_stats

    rows = [
        (0, "a b c"),            # 3 tokens -> bucket 1 (cap 4)
        (1, "a b c d"),          # 4 tokens -> bucket 1 (cap 4)
        (2, " ".join(["t"] * 5)),  # 5 -> bucket 2 (cap 8)
        (3, ""),                  # [''] -> 1 token -> bucket 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in length_bucket_stats(df, bucket_tokens=4).collect()}
    b1 = out[1]
    assert (b1["n_docs"], b1["sum_tokens"], b1["max_tokens"]) == (3, 8, 4)
    # padded mass = 3 docs * cap 4 = 12; waste = (12-8)/12
    assert b1["pad_waste_pct"] == round(100.0 * 4 / 12, 4)
    b2 = out[2]
    assert (b2["n_docs"], b2["cap_tokens"]) == (1, 8)
    assert b2["pad_waste_pct"] == round(100.0 * 3 / 8, 4)


def test_cap_per_group_prefilter_bounds_hot_group_sort_input(spark):
    """r8 (r7 verdict #6): prefilter_factor threaded through cap_per_group.
    One source = half the corpus (the C4 per-domain-cap scenario): with a
    factor set, (a) the selection is IDENTICAL to the exact path, and
    (b) the hot group's rank/sort input shrinks to ~factor*cap hash-picked
    candidates instead of its full row count."""
    from pyspark.sql import functions as F

    from squrve_spark.operators.sampling import cap_per_group

    rows = [(i, "hot" if i < 5000 else f"s{i % 20}") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    cap, factor = 8, 6
    exact = {
        (r["doc_id"], r["rank_in_group"])
        for r in cap_per_group(df, cap=cap).collect()
    }
    pre = {
        (r["doc_id"], r["rank_in_group"])
        for r in cap_per_group(df, cap=cap, prefilter_factor=factor).collect()
    }
    assert pre == exact

    # replicate the documented pre-cut to measure what reaches the sort:
    # bucket(md5-prefix) < factor*cap/|group| * 65536
    hot_n = 5000
    thresh = (factor * cap / hot_n) * 65536
    survivors = df.filter(
        (F.col("source") == "hot")
        & (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            < thresh
        )
    ).count()
    assert cap <= survivors <= 4 * factor * cap  # bounded, nowhere near 5000


def test_mixture_sample_quota_arithmetic_and_determinism(spark):
    """mixture_sample (r8): quotas sum to the budget, each stratum yields
    min(quota, |stratum|), the draw is repartition-invariant, and the
    temperature behaves (t=0 -> equal quotas, t=1 -> proportional)."""
    from squrve_spark.operators.sampling import mixture_sample

    rows = [(i, "big" if i < 800 else ("mid" if i < 950 else "tiny"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    out = mixture_sample(df, budget=100, stratum_col="lang").collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r)
    quotas = {g: rs[0]["quota"] for g, rs in by.items()}
    assert sum(quotas.values()) == 100
    sizes = {"big": 800, "mid": 150, "tiny": 50}
    for g, rs in by.items():
        assert len(rs) == min(quotas[g], sizes[g])
        assert sorted(r["rank_in_stratum"] for r in rs) == list(
            range(1, len(rs) + 1))
    # sqrt flattening: tiny gets far more than its 5% share, big far less
    assert quotas["tiny"] > 10 and quotas["big"] < 60

    again = {(r["lang"], r["doc_id"])
             for r in mixture_sample(df.repartition(13), budget=100).collect()}
    assert again == {(r["lang"], r["doc_id"]) for r in out}

    eq = mixture_sample(df, budget=99, temperature=0.0).collect()
    qs = sorted({r["lang"]: r["quota"] for r in eq}.values())
    assert qs == [33, 33, 33]

    prop = mixture_sample(df, budget=100, temperature=1.0).collect()
    qp = {r["lang"]: r["quota"] for r in prop}
    assert qp == {"big": 80, "mid": 15, "tiny": 5}


# ---------------------------------------------------------------------------
# UniMax water-filling (r10)


def _unimax_rows(spark, rows, budget, epoch_cap=1):
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    return {
        (r["lang"], r["doc_id"]): (r["n_tokens"], r["alloc_tokens"])
        for r in sampling.unimax_mix(df, budget, epoch_cap=epoch_cap).collect()
    }


def test_unimax_both_regimes(spark):
    """Small language caps out at its full corpus; larger ones sit at the
    integer water level; total selected never exceeds the budget. Docs
    are 10 tokens each so selections can fill allocations exactly."""
    rows = (
        [(i, "a", "x " * 10) for i in range(1, 3)]      # a: 20 tokens
        + [(i, "b", "x " * 10) for i in range(10, 20)]  # b: 100
        + [(i, "c", "x " * 10) for i in range(30, 42)]  # c: 120
    )
    # B=120, caps asc [20,100,120]: s1=40>=20 -> a capped at 20;
    # s2=(120-20)//2=50<100 -> theta=50 for b and c
    got = _unimax_rows(spark, rows, budget=120)
    allocs = {lang: alloc for (lang, _), (_, alloc) in got.items()}
    assert allocs == {"a": 20, "b": 50, "c": 50}
    per_lang_tok = {}
    for (lang, _), (n, _) in got.items():
        per_lang_tok[lang] = per_lang_tok.get(lang, 0) + n
    # every language fills its allocation exactly (10-token granularity)
    assert per_lang_tok == {"a": 20, "b": 50, "c": 50}
    assert sum(per_lang_tok.values()) <= 120


def test_unimax_budget_exceeds_caps(spark):
    """Budget above the total corpus: every language allocates its full
    cap (theta never fires) and every document is selected."""
    rows = [(1, "a", "x " * 5), (2, "b", "x " * 7)]
    got = _unimax_rows(spark, rows, budget=1000)
    assert {(l, d): v[1] for (l, d), v in got.items()} == {
        ("a", 1): 5, ("b", 2): 7,
    }


def test_unimax_epoch_cap_scales_capacity(spark):
    """epoch_cap multiplies per-language capacity: with cap 2 the small
    language's allocation doubles and the water language absorbs less."""
    rows = [(1, "a", "x " * 10)] + [(i, "b", "x " * 10) for i in range(10, 20)]
    one = _unimax_rows(spark, rows, budget=60, epoch_cap=1)
    two = _unimax_rows(spark, rows, budget=60, epoch_cap=2)
    # epoch_cap=1: caps [10,100], s1=30>=10 -> a capped 10, b gets 50;
    # epoch_cap=2: caps [20,200], s1=30>=20 -> a capped 20, b gets 40.
    # a has only 10 distinct tokens, so its SELECTION stays one doc either
    # way while the recorded allocation doubles.
    alloc_b_one = {v[1] for (l, _), v in one.items() if l == "b"}
    alloc_b_two = {v[1] for (l, _), v in two.items() if l == "b"}
    assert one[("a", 1)][1] == 10 and alloc_b_one == {50}
    assert two[("a", 1)][1] == 20 and alloc_b_two == {40}
    assert sum(v[0] for (l, _), v in one.items() if l == "b") == 50
    assert sum(v[0] for (l, _), v in two.items() if l == "b") == 40
