"""ANN quality properties: the approximate paths against the exact baseline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import similarity
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    # full probe (all cells) must reproduce exact top-k
    approx_full = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8)
    assert _pairs(approx_full) == _pairs(exact)
    # partial probe: recall can drop but must stay useful and be a valid
    # ranking (no duplicates, k per query at most)
    approx = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3)
    got = _pairs(approx)
    recall = len(got & _pairs(exact)) / len(_pairs(exact))
    assert recall >= 0.5
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] <= 5 for r in per_q)


def test_lsh_topk_subset_property(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.lsh_topk(emb, queries, dim=64, k=5, bands=16)
    recall = len(_pairs(approx) & _pairs(exact)) / len(_pairs(exact))
    assert recall >= 0.5
