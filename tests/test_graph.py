"""Connected-components parity against a driver-side union-find oracle,
plus canonical-doc selection invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import dedup, graph
from tests.conftest import SF_SMALL


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id reachable (two passes flatten chains)
    return {x: find(x) for x in list(parent)}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
    )


def _labels(df):
    return {r["id"]: r["comp"] for r in df.collect()}


def test_components_match_union_find_random(spark):
    """Random graphs with chains, cliques and singleton-free edge soup:
    Spark labels must equal the union-find oracle exactly."""
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _labels(graph.connected_components(_pairs_df(spark, edges)))
    want = _union_find(edges)
    assert got == want


def test_components_chain_and_clique(spark):
    """A 12-node chain (worst diameter per edge) and a 5-clique in one
    graph; chain forces multiple label-propagation iterations."""
    chain = [(i, i + 1) for i in range(100, 112)]
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges = chain + clique
    got = _labels(graph.connected_components(_pairs_df(spark, edges)))
    assert {got[i] for i in range(100, 113)} == {100}
    assert {got[i] for i in range(5)} == {0}


def test_components_max_iter_guard(spark):
    """A chain deeper than max_iter must raise, not silently mislabel."""
    chain = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(_pairs_df(spark, chain), max_iter=2)


def test_canonical_docs_on_fixture(spark):
    """canonical_docs keeps exactly one doc (the min id) per LSH duplicate
    cluster plus every singleton; validated against the union-find oracle
    over the same pair set."""
    docs = load_table(spark, SF_SMALL, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    edge_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    comp = _union_find(edge_rows)
    losers = {x for x, c in comp.items() if x != c}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    kept = {r["doc_id"] for r in graph.canonical_docs(docs, pairs).select("doc_id").collect()}
    assert kept == all_ids - losers
    assert losers  # fixture plants duplicates; the test must not be vacuous


def test_dedup_components_registry_entry(spark):
    """Registry query returns (doc_id, component_id) with component = min
    member id, consistent with the union-find oracle on the same pairs."""
    from squrve_spark.plans.pipeline import dedup_components

    out = dedup_components(spark, SF_SMALL)
    assert out.columns == ["doc_id", "component_id"]
    got = {r["doc_id"]: r["component_id"] for r in out.collect()}
    docs = load_table(spark, SF_SMALL, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    want = _union_find([(r["id_a"], r["id_b"]) for r in pairs.collect()])
    assert got == want


def _numpy_pagerank(edges, n_iter=10, damping=0.85):
    """Dense power iteration on the same undirected edge set."""
    import numpy as np

    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({x for e in und for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, d in und:
        M[idx[d], idx[s]] = 1.0
    deg = M.sum(axis=0)
    M = M / deg  # every node has degree >= 1 on a pair-built graph
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - damping) / n + damping * (M @ r)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_power_iteration(spark):
    random.seed(11)
    edges = list({(random.randrange(40), random.randrange(40)) for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    got = {r["id"]: r["rank"] for r in graph.pagerank(df, n_iter=10).collect()}
    want = _numpy_pagerank(edges, n_iter=10)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    # probability mass is conserved (no dangling nodes on a pair graph)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_hub_ranks_highest(spark):
    # star graph: the hub must out-rank every leaf
    df = spark.createDataFrame([Row(id_a=0, id_b=i) for i in range(1, 9)])
    ranks = {r["id"]: r["rank"] for r in graph.pagerank(df, n_iter=15).collect()}
    hub, leaves = ranks[0], [v for k, v in ranks.items() if k != 0]
    assert all(hub > leaf for leaf in leaves)
    assert max(leaves) - min(leaves) < 1e-12  # symmetric leaves tie exactly


def test_graph_pagerank_registry_entry(spark):
    from squrve_spark.plans import REGISTRY

    out = REGISTRY["graph_pagerank"].fn(spark, SF_SMALL).collect()
    assert len(out) > 0
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks, reverse=True)  # ordered by rank desc
    assert abs(sum(ranks) - 1.0) < 1e-6  # mass ~1 (9 dp rounding slack)


def test_pagerank_exact_tracks_float_ranks(spark):
    # the integer fixed-point recurrence must agree with float PageRank
    # up to the floor bleed: per-node relative error << 1e-6 at scale=1e12
    random.seed(13)
    edges = list({(random.randrange(30), random.randrange(30)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    fl = {r["id"]: r["rank"] for r in graph.pagerank(df, n_iter=8).collect()}
    ix = {r["id"]: r["rank"] for r in graph.pagerank_exact(df, n_iter=8).collect()}
    assert set(fl) == set(ix)
    for k in fl:
        assert abs(ix[k] / 1e12 - fl[k]) < 1e-6, k


def test_pagerank_exact_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]]
    )
    a = sorted((r["id"], r["rank"]) for r in graph.pagerank_exact(df).collect())
    b = sorted((r["id"], r["rank"]) for r in graph.pagerank_exact(df).collect())
    assert a == b  # bit-identical, not approximately equal
    assert all(isinstance(v, int) for _, v in a)


def test_pagerank_exact_hub_outranks_leaves(spark):
    df = spark.createDataFrame([Row(id_a=0, id_b=i) for i in range(1, 9)])
    ranks = {r["id"]: r["rank"] for r in graph.pagerank_exact(df, n_iter=10).collect()}
    hub, leaves = ranks[0], [v for k, v in ranks.items() if k != 0]
    assert all(hub > leaf for leaf in leaves)
    assert max(leaves) == min(leaves)  # symmetric leaves tie EXACTLY


def test_memo_eviction_keeps_returned_frames_alive(spark):
    """_memo_put eviction must NOT unpersist evicted entries: the cached
    frames are eager localCheckpoints already returned to callers, and
    localCheckpoint truncates lineage — releasing the blocks would make a
    still-held reference unrecoverable (r10 advice, medium)."""
    cache = {}
    first = spark.range(5).localCheckpoint(eager=True)
    graph._memo_put(cache, ("t", 0), first)
    for i in range(1, 20):  # push well past the 16-entry cap
        graph._memo_put(cache, ("t", i), spark.range(2).localCheckpoint(eager=True))
    assert ("t", 0) not in cache  # it WAS evicted...
    assert first.count() == 5  # ...but the returned frame still computes


def test_connected_components_use_memo_false_bypasses_cache(spark):
    """use_memo=False neither reads nor writes the session memo — the
    escape hatch for non-snapshot (overwritten-path) inputs."""
    edges = [(0, 1), (1, 2), (5, 6)]
    df = _pairs_df(spark, edges)
    cache = df.sparkSession.__dict__.setdefault("_squrve_graph_cache", {})
    before = set(cache)
    got = _labels(graph.connected_components(df, use_memo=False))
    assert got == _union_find(edges)
    assert set(cache) == before  # nothing was added
