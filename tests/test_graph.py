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
