"""ANN quality properties: the approximate paths against the exact baseline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import similarity
from tests.conftest import SF_MED, SF_SMALL


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


def _numpy_neardup_reference(rows, threshold):
    """Driver-side all-pairs reference for the block-grid implementation."""
    import numpy as np

    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    Mu = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(Mu @ Mu.T, 6)
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and S[i, j] >= threshold:
                out.add((int(ids[i]), int(ids[j]), float(S[i, j])))
    return out


def test_exact_neardup_block_grid_matches_reference(spark, emb):
    """Planted near-dups: perturbed copies of existing vectors must surface,
    and the distributed block-grid result must equal the all-pairs numpy
    reference exactly — for several n_blocks (incl. 1 = single cell)."""
    import numpy as np

    from pyspark.sql import Row

    base = [(r["vec_id"], list(r["embedding"])) for r in emb.limit(40).collect()]
    rng = np.random.default_rng(7)
    planted = [
        (10_000 + vid, [x + rng.normal(0, 1e-3) for x in vec]) for vid, vec in base[:10]
    ]
    rows = base + planted
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )
    expect = _numpy_neardup_reference(rows, 0.99)
    assert len(expect) >= 10  # every planted copy pairs with its source
    for n_blocks in (1, 3, 8):
        got = {
            (r["id_a"], r["id_b"], r["sim"])
            for r in similarity.exact_neardup_pairs(
                df, threshold=0.99, n_blocks=n_blocks
            ).collect()
        }
        assert got == expect, f"n_blocks={n_blocks}"


def test_neardup_first_collision_dedup_unique_and_complete(spark, emb):
    """The first-colliding-band predicate must emit every LSH-colliding
    pair exactly once: (a) output pairs are unique, (b) the pair set equals
    the LSH-verified subset of the exhaustive reference — i.e. dedup by
    predicate loses nothing vs the old dropDuplicates approach."""
    out = similarity.embedding_neardup_pairs(emb, threshold=0.42)
    rows = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert len(rows) == len(set(rows))  # no duplicate emissions
    # completeness: every exhaustive near-dup pair whose signatures share
    # >= 1 band must be in the output
    # reference signatures: the r9 integer sign-LSH (int8 codes x md5
    # planes) the operator now uses
    sig = similarity.with_int_lsh_signature(
        emb, similarity.int8_scales(emb), dim=64, tag="hp:7"
    )
    sigs = {r["vec_id"]: r["lsh_sig"] for r in sig.collect()}
    ref = _numpy_neardup_reference(
        [(r["vec_id"], r["embedding"]) for r in emb.collect()], 0.42
    )

    def collides(a, b, bands=8, width=8):
        mask = (1 << width) - 1
        sa, sb = sigs[a] & (2**64 - 1), sigs[b] & (2**64 - 1)
        return any(((sa >> (i * width)) & mask) == ((sb >> (i * width)) & mask)
                   for i in range(bands))

    want = {(a, b) for a, b, _ in ref if collides(a, b)}
    assert set(rows) == want and want  # non-vacuous on the fixture


def test_kmeans_objective_monotone_and_full_probe_exact(spark, emb):
    """Distributed spherical k-means must improve its own objective (mean
    max-cosine to the nearest centroid) monotonically from the sampled
    init, and trained-centroid IVF with a full probe must still reproduce
    the exact top-k (routing never changes full-probe semantics)."""
    import numpy as np

    V = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    Vu = V / np.linalg.norm(V, axis=1, keepdims=True)

    def objective(Cu):
        return float((Vu @ Cu.T).max(axis=1).mean())

    obj = [objective(similarity.sampled_centroids(emb, 8))]
    for it in (1, 3):
        obj.append(objective(similarity.train_centroids(emb, n_centroids=8, n_iter=it)))
    assert obj == sorted(obj), obj  # each extra Lloyd round only improves
    assert obj[-1] > obj[0]  # and strictly beats the raw sample on the fixture

    queries = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    trained_full = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=8, train_iters=2
    )
    assert _pairs(trained_full) == _pairs(exact)


# ---------------------------------------------------------------------------
# SemDeDup (r4)


def _semdedup_frames(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    # two far-apart direction groups + exact copies inside each
    base_a = rng.normal(size=8)
    base_b = -base_a  # antipodal: never near-dup of group a
    rows = []
    for i in range(6):
        v = base_a + rng.normal(scale=0.01, size=8)  # tight near-dup cluster
        rows.append((i, [float(x) for x in v]))
    for i in range(6, 12):
        v = base_b + rng.normal(scale=1.5, size=8)  # loose, mostly distinct
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_invariants(spark):
    import numpy as np

    from squrve_spark.operators.similarity import semantic_dedup

    df = _semdedup_frames(spark)
    eps = 0.95
    out = semantic_dedup(df, eps=eps, n_centroids=2, train_iters=2).collect()
    assert len(out) == 12  # one row per input, none lost
    rows = {r["vec_id"]: r for r in out}
    vecs = {r["vec_id"]: np.asarray(r["embedding"], float) for r in df.collect()}
    unit = {k: v / np.linalg.norm(v) for k, v in vecs.items()}

    # kept rows within one cell are pairwise below eps
    kept = [r for r in out if r["keep"]]
    for a in kept:
        for b in kept:
            if a["vec_id"] < b["vec_id"] and a["cell"] == b["cell"]:
                sim = round(float(unit[a["vec_id"]] @ unit[b["vec_id"]]), 6)
                assert sim < eps, (a["vec_id"], b["vec_id"], sim)
    # every dropped row has a same-cell neighbor at >= eps, and its rep is
    # kept, same cell, with centroid_sim <= its own (paper keep rule)
    for r in out:
        if r["keep"]:
            assert r["rep_id"] == r["vec_id"]
            continue
        rep = rows[r["rep_id"]]
        assert rep["keep"] and rep["cell"] == r["cell"]
        assert rep["centroid_sim"] <= r["centroid_sim"] + 1e-9
        same_cell = [
            o for o in out
            if o["cell"] == r["cell"] and o["vec_id"] != r["vec_id"]
        ]
        assert any(
            round(float(unit[r["vec_id"]] @ unit[o["vec_id"]]), 6) >= eps
            for o in same_cell
        )
    # the tight cluster (ids 0-5) collapses to one representative
    tight_kept = [r for r in kept if r["vec_id"] < 6]
    assert len(tight_kept) == 1


def test_semdedup_eps_one_keeps_all_and_filter_form(spark):
    from squrve_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_keep,
    )

    df = _semdedup_frames(spark)
    out = semantic_dedup(df, eps=1.000001, n_centroids=2, train_iters=1).collect()
    assert all(r["keep"] for r in out)
    survivors = semantic_dedup_keep(df, eps=0.95, n_centroids=2, train_iters=2)
    flags = semantic_dedup(df, eps=0.95, n_centroids=2, train_iters=2)
    assert {r["vec_id"] for r in survivors.collect()} == {
        r["vec_id"] for r in flags.collect() if r["keep"]
    }


# ---------------------------------------------------------------------------
# product quantization (r4)


def test_pq_codebooks_and_encoding(spark):
    import numpy as np

    from squrve_spark.operators.similarity import pq_encode, train_pq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq(emb, m=8, ksub=16, sample=256, iters=5)
    assert books.shape == (8, 16, 8)  # dim 64 / m 8
    codes = pq_encode(emb, books).collect()
    n = emb.count()
    assert len(codes) == n
    for r in codes[:20]:
        cs = list(r["pq_codes"])
        assert len(cs) == 8 and all(0 <= c < 16 for c in cs)
    # deterministic: re-train + re-encode gives identical codes
    books2 = train_pq(emb, m=8, ksub=16, sample=256, iters=5)
    assert np.array_equal(books, books2)


def test_pq_topk_recall_vs_bruteforce(spark):
    from squrve_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
        train_pq,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    books = train_pq(emb, m=8, ksub=32)
    exact = brute_force_topk(emb, queries, k=5)
    approx = pq_topk(emb, queries, books, k=5, refine=8)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    sims = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        sims[(r["query_id"], r["neighbor_id"])] = r["sim"]
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # re-rank sims are EXACT cosine — spot-check against the exact run
    exact_sims = {
        (r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()
    }
    shared = set(sims) & set(exact_sims)
    assert shared
    for key in shared:
        assert abs(sims[key] - exact_sims[key]) < 1e-9


def test_persisted_ivf_index_matches_inmemory(spark, tmp_path):
    """save_ivf_index -> ivf_topk_indexed must return exactly the in-memory
    ivf_topk result with the same parameters (training is deterministic),
    and the stored cells must cover every corpus vector exactly once."""
    from pyspark.sql import functions as F

    from squrve_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        load_ivf_centroids,
        save_ivf_index,
        train_centroids,
    )
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    Cu = save_ivf_index(emb, path, n_centroids=8, train_iters=2)
    assert np.allclose(load_ivf_centroids(spark, path), Cu)
    assert np.allclose(Cu, train_centroids(emb, 8, 2))  # deterministic build
    cells = spark.read.parquet(f"{path}/cells")
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()
    queries = emb.filter(F.col("vec_id") < 8)
    direct = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3, train_iters=2)
    indexed = ivf_topk_indexed(emb, queries, path, k=5, n_probe=3)
    d = sorted(tuple(r) for r in direct.collect())
    i = sorted(tuple(r) for r in indexed.collect())
    assert d == i


def test_sampled_centroid_training_matches_distributed(spark):
    """Bounded-sample driver-side Lloyd (`train_centroids(sample=N)`) must
    reproduce the distributed trainer exactly when the sample covers the
    corpus (same hash-ordered init, same per-cell sums), and semantic_dedup
    must make identical keep/rep decisions under either trainer — the fast
    path is a pure perf substitution, not a semantics change."""
    import numpy as np

    from squrve_spark.operators.similarity import semantic_dedup, train_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Cd = train_centroids(emb, 8, 2)
    Cs = train_centroids(emb, 8, 2, sample=1 << 20)
    assert float(np.max(1.0 - np.sum(Cd * Cs, axis=1))) < 1e-12

    a = semantic_dedup(emb, eps=0.42, n_centroids=8, train_iters=2).orderBy("vec_id")
    b = semantic_dedup(
        emb, eps=0.42, n_centroids=8, train_iters=2, train_sample=None
    ).orderBy("vec_id")
    ra, rb = a.collect(), b.collect()
    # decisions identical; centroid_sim agrees to float epsilon (its stored
    # value is round(.,6), so a sim sitting ON a rounding boundary may print
    # one ulp apart between the two trainers)
    assert [(r["vec_id"], r["cell"], r["keep"], r["rep_id"]) for r in ra] == [
        (r["vec_id"], r["cell"], r["keep"], r["rep_id"]) for r in rb
    ]
    assert all(
        abs(x["centroid_sim"] - y["centroid_sim"]) <= 1.5e-6 for x, y in zip(ra, rb)
    )


def test_cluster_balanced_sample_properties(spark):
    """Per-cell cap respected; every non-empty cell is represented; output
    ids unique and drawn from the corpus; exact replay across reruns; and
    the cap binds (some dense cell actually loses rows on the fixture)."""
    from squrve_spark.operators.similarity import (
        assign_cells,
        cluster_balanced_sample,
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    cap = 5
    sel = cluster_balanced_sample(emb, per_cluster=cap, n_centroids=4, train_iters=2)
    rows = sel.collect()
    assert [tuple(r) for r in cluster_balanced_sample(
        emb, per_cluster=cap, n_centroids=4, train_iters=2
    ).collect()] == [tuple(r) for r in rows]  # deterministic replay

    per_cell: dict[int, int] = {}
    ids = set()
    for r in rows:
        per_cell[r["cell"]] = per_cell.get(r["cell"], 0) + 1
        assert 1 <= r["rank"] <= cap
        ids.add(r["vec_id"])
    assert len(ids) == len(rows)  # no duplicates
    assert max(per_cell.values()) <= cap

    Cu = train_centroids(emb, 4, 2, sample=1 << 20)
    cells = assign_cells(emb, Cu)
    full = {r["cell"]: r["n"] for r in cells.groupBy("cell").count()
            .withColumnRenamed("count", "n").collect()}
    assert set(per_cell) == {c for c, k in full.items() if k >= 1}
    assert len(rows) == sum(min(k, cap) for k in full.values())
    assert len(rows) < n  # the cap actually binds somewhere


def test_sampled_trainer_matches_distributed_on_nonunit_vectors(spark):
    """Regression (review r4): the sampled trainer must sum RAW vectors in
    its update (like the distributed path), so parity holds on corpora
    whose embeddings are NOT unit-norm — magnitudes must steer centroids
    identically under both trainers."""
    import numpy as np

    from squrve_spark.operators.similarity import train_centroids

    rng = np.random.default_rng(3)
    rows = [
        # wildly varying magnitudes: unit-sum vs raw-sum updates diverge
        (i, [float(x) for x in rng.normal(size=8) * (10.0 ** (i % 4))])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    Cd = train_centroids(df, 4, 3)
    Cs = train_centroids(df, 4, 3, sample=1 << 20)
    assert float(np.max(1.0 - np.sum(Cd * Cs, axis=1))) < 1e-9


def test_exact_neardup_count_equals_collect(spark):
    """Regression (r5): self-cogroup attribute dedup mis-bound the right
    side's UDF arguments to the left's exprIds; with a fully-pruned
    downstream (count(), noop writes after projection) the right child
    lost its value columns and the kernel crashed with KeyError. The right
    branch now carries fresh column names; count() and collect() must
    agree on every scale the fixtures ship."""
    from squrve_spark.catalog import load_table
    from squrve_spark.operators import similarity

    for sf in (SF_SMALL, SF_MED):
        emb = load_table(spark, sf, "embeddings")
        pairs = similarity.exact_neardup_pairs(emb, threshold=0.42)
        assert pairs.count() == len(pairs.collect()) > 0, sf


def test_ivfpq_recall_and_full_probe_exactness(spark, emb, tmp_path):
    """IVF-PQ (r5): full probe + corpus-covering refine reproduces the
    exact top-k (re-rank is exact cosine over ALL scored candidates);
    partial probe keeps useful recall; the codes scan is partition-pruned
    to the probed cells."""
    from squrve_spark.operators.similarity import ivfpq_topk, save_ivfpq_index

    path = str(tmp_path / "ivfpq")
    save_ivfpq_index(emb, path, n_centroids=8, m=8, ksub=16)
    queries = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, queries, k=5)

    n = emb.count()
    full = ivfpq_topk(emb, queries, path, k=5, n_probe=8, refine=(n // 5) + 1)
    assert _pairs(full) == _pairs(exact)
    # re-rank similarities are exact cosine, matching brute force values
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    for r in full.collect():
        assert abs(r["sim"] - exact_sims[(r["query_id"], r["neighbor_id"])]) < 1e-9

    # Partial probe on the RANDOM fixture vectors: near-uniform cell
    # occupancy means recall tracks the probe fraction (4/8 cells) plus
    # whatever locality the coarse quantizer finds — the bound asserts the
    # machinery is sound, not real-corpus recall (clustered corpora probe
    # far better; the full-probe case above pins correctness exactly).
    part = ivfpq_topk(emb, queries, path, k=5, n_probe=4, refine=8)
    recall = len(_pairs(part) & _pairs(exact)) / len(_pairs(exact))
    assert recall >= 0.4
    per_q = part.groupBy("query_id").count().collect()
    assert all(r["count"] <= 5 for r in per_q)

    # partition pruning: the probed-cells filter reaches the codes scan
    plan = (
        ivfpq_topk(emb, queries, path, k=5, n_probe=2, refine=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "cell" in plan and "PartitionFilters" in plan


def test_ivfpq_registry_entry(spark):
    from squrve_spark.plans import REGISTRY

    out = REGISTRY["sim_ivfpq_topk"].fn(spark, SF_SMALL)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "sim"}


def test_pq_and_ivfpq_empty_query_set(spark, emb, tmp_path):
    """Empty query frames return an empty, correctly-typed result instead
    of crashing np.stack (r5 guard)."""
    from squrve_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
        save_ivfpq_index,
        train_pq,
    )

    none = emb.filter(F.col("vec_id") < 0)
    books = train_pq(emb, m=8, ksub=16, sample=256, iters=2)
    out = pq_topk(emb, none, books, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank", "sim"]
    path = str(tmp_path / "ivfpq_e")
    save_ivfpq_index(emb, path, n_centroids=4, m=8, ksub=16)
    out2 = ivfpq_topk(emb, none, path, k=5)
    assert out2.count() == 0 and out2.columns == out.columns


def test_ivf_index_incremental_append(spark, emb, tmp_path):
    """r5: appending new vectors to a persisted IVF index (assignment
    against the EXISTING centroids, dynamic partition append) must answer
    queries identically to a from-scratch index over the union built with
    the same centroids."""
    import numpy as np

    from pyspark.sql import Row

    from squrve_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_topk_indexed,
        load_ivf_centroids,
        save_ivf_index,
    )

    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    assert extra.count() > 0
    path = str(tmp_path / "ivf_inc")
    save_ivf_index(base, path, n_centroids=8, train_iters=2)
    append_to_ivf_index(extra, path)

    # reference: full rebuild under the SAME centroids (skip retraining by
    # assigning the union against the loaded centroids)
    from squrve_spark.operators.similarity import assign_cells

    Cu = load_ivf_centroids(spark, path)
    ref_path = str(tmp_path / "ivf_ref")
    assign_cells(emb, Cu).select("vec_id", "cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{ref_path}/cells")
    spark.read.parquet(f"{path}/centroids").write.mode("overwrite").parquet(
        f"{ref_path}/centroids"
    )

    queries = emb.filter(F.col("vec_id") < 8)
    got = ivf_topk_indexed(emb, queries, path, k=5, n_probe=8)
    want = ivf_topk_indexed(emb, queries, ref_path, k=5, n_probe=8)
    assert _pairs(got) == _pairs(want)
    # appended ids are present in the store and queryable
    stored = spark.read.parquet(f"{path}/cells")
    assert stored.count() == emb.count()


def test_int8_quantize_roundtrip_bounds(spark, emb):
    """Quantization audit: per-dim error bounded by half a quantization
    step (maxabs/254), cosine drift tiny on 64-dim vectors, and the codes
    really are int8-range."""
    import numpy as np

    scales = similarity.int8_scales(emb)
    assert len(scales) == 64 and all(s > 0 for s in scales)
    out = similarity.quantize_int8(emb, scales).collect()
    worst_step = max(1.0 / s for s in scales if s > 0)
    for r in out:
        assert all(-127 <= c <= 127 for c in r["qcodes"])
        assert r["max_abs_err"] <= worst_step / 2 + 1e-9
        assert r["cos_drift"] >= 0.999
    # numpy replay of one vector's codes
    row = emb.filter(F.col("vec_id") == 3).first()
    got = next(r for r in out if r["vec_id"] == 3)
    v = np.asarray(row["embedding"], dtype=np.float64)
    codes = np.clip(np.floor(v * np.asarray(scales) + 0.5), -127, 127).astype(int)
    assert list(codes) == list(got["qcodes"])


def test_hamming_topk_matches_numpy_sign_mismatch(spark, emb):
    """Packed xor+popcount Hamming == direct sign-mismatch count, and the
    packed words stay in [0, 2^32) (no sign-bit corner)."""
    import numpy as np

    packed = similarity.pack_sign_bits(emb, dim=64).collect()
    by_id = {}
    for r in packed:
        assert len(r["sign_bits"]) == 2
        assert all(0 <= w < 2**32 for w in r["sign_bits"])
        by_id[r["vec_id"]] = np.asarray(r["embedding"], dtype=np.float64) > 0

    queries = emb.filter(F.col("vec_id") < 4)
    got = similarity.hamming_topk(emb, queries, dim=64, k=5).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2, 3}
    for r in got:
        direct = int((by_id[r["query_id"]] != by_id[r["neighbor_id"]]).sum())
        assert r["hamming"] == direct
    # ranks are 1..5 per query and non-decreasing in distance
    for q in (0, 1, 2, 3):
        rows = sorted((r for r in got if r["query_id"] == q), key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert all(a["hamming"] <= b["hamming"] for a, b in zip(rows, rows[1:]))


def test_int8_topk_recall_and_numpy_parity(spark, emb):
    """int8-code retrieval: integer dot == numpy replay exactly, and
    recall vs the float brute-force baseline stays high (quantization at
    64 dims barely perturbs the ranking)."""
    import numpy as np

    scales = similarity.int8_scales(emb)
    queries = emb.filter(F.col("vec_id") < 8)
    got = similarity.int8_topk(emb, queries, scales, k=5).collect()

    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
         for r in emb.collect()}
    S = np.asarray(scales)
    C = {i: np.clip(np.floor(v * S + 0.5), -127, 127).astype(np.int64)
         for i, v in V.items()}
    for r in got:
        assert r["qdot"] == int(C[r["query_id"]] @ C[r["neighbor_id"]])

    exact = similarity.brute_force_topk(emb, queries, k=5)
    recall = len(_pairs(similarity.int8_topk(emb, queries, scales, k=5))
                 & _pairs(exact)) / len(_pairs(exact))
    assert recall >= 0.7


def test_local_topk_prefilter_is_exact_and_bounded(spark):
    """local_topk (r8): the map-side per-partition top-k prefilter must be
    (a) EXACT — the final per-key window over the reduced frame returns
    bit-identical rows to the same window over the full frame, including
    through score ties, and (b) BOUNDED — at most partitions x keys x k
    rows survive. Adversarial fixture: heavy ties, keys skewed across
    partitions."""
    import random as _random

    from pyspark.sql import Window as W

    rng = _random.Random(8)
    rows = [
        (i % 4, i, float(rng.randint(0, 9)))  # 10 score levels -> many ties
        for i in range(5000)
    ]
    df = spark.createDataFrame(
        rows, "query_id int, doc_id long, score double"
    ).repartition(16)

    k = 7
    reduced = similarity.local_topk(df, ["query_id"], "score", k, "doc_id")
    n_reduced = reduced.count()
    assert n_reduced <= 16 * 4 * k

    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))

    def topk(frame):
        return sorted(
            frame.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .collect(),
            key=lambda r: (r["query_id"] is None, r["query_id"] or 0, r["r"]),
        )

    assert topk(reduced) == topk(df)

    # ascending variant (the md5-rank-draw ordering) is exact too
    w_asc = W.partitionBy("query_id").orderBy(F.col("score"), F.col("doc_id"))

    def bottomk(frame):
        return sorted(
            frame.withColumn("r", F.row_number().over(w_asc))
            .filter(F.col("r") <= k)
            .collect(),
            key=lambda r: (r["query_id"] is None, r["query_id"] or 0, r["r"]),
        )

    reduced_asc = similarity.local_topk(
        df, ["query_id"], "score", k, "doc_id", ascending=True
    )
    assert reduced_asc.count() <= 16 * 4 * k
    assert bottomk(reduced_asc) == bottomk(df)

    # null keys form their own group and null scores sort where Spark
    # puts them (asc -> first, desc -> last) — r8 review finding
    nullish = spark.createDataFrame(
        [(None, 1, 5.0), (None, 2, 7.0), (None, 3, None),
         (0, 4, None), (0, 5, 1.0), (0, 6, 2.0)],
        "query_id int, doc_id long, score double",
    ).repartition(4)
    red_desc = similarity.local_topk(nullish, ["query_id"], "score", 2, "doc_id")
    assert topk(red_desc) == topk(nullish)
    red_asc2 = similarity.local_topk(
        nullish, ["query_id"], "score", 2, "doc_id", ascending=True
    )
    assert bottomk(red_asc2) == bottomk(nullish)


def test_mmr_step1_is_pure_relevance_top1(spark, emb):
    q = emb.filter(F.col("vec_id") < 4)
    mmr = {
        (r["query_id"], r["step"]): r
        for r in similarity.mmr_rerank(emb, q, k=3).collect()
    }
    rel = {
        r["query_id"]: r
        for r in similarity.brute_force_topk(emb, q, k=1).collect()
    }
    for qid, r in rel.items():
        first = mmr[(qid, 1)]
        # step 1 has no diversity penalty: it must be the relevance top-1
        assert first["neighbor_id"] == r["neighbor_id"]
        import numpy as np

        # np.round: the operator's documented rounding (builtin round
        # differs at scaled-half boundaries — see mmr_rerank)
        assert abs(first["mmr_score"] - float(np.round(0.7 * r["sim"], 6))) < 1e-12


def test_mmr_diversifies_vs_pure_relevance(spark, emb):
    q = emb.filter(F.col("vec_id") < 8)
    mmr_sel = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.mmr_rerank(emb, q, k=5).collect()
    }
    rel_sel = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    # the diversity penalty must change SOME selection on a clustered
    # fixture — identical sets would mean the penalty never bit
    assert mmr_sel != rel_sel
    # and every MMR pick comes from the relevance pool
    pool = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=12).collect()
    }
    assert mmr_sel <= pool


def test_mmr_lambda_one_degenerates_to_relevance_order(spark, emb):
    q = emb.filter(F.col("vec_id") < 4)
    mmr = sorted(
        (r["query_id"], r["step"], r["neighbor_id"])
        for r in similarity.mmr_rerank(emb, q, k=5, lam=1.0).collect()
    )
    rel = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    )
    assert mmr == rel


def test_integer_kmeans_assignment_is_nearest_centroid(spark, emb):
    import numpy as np

    from squrve_spark.operators.similarity import (
        int8_codes_expr,
        int8_scales,
        integer_kmeans,
    )

    k, iters = 4, 3
    out = {r["vec_id"]: r for r in integer_kmeans(emb, k=k, n_iter=iters).collect()}
    # replicate in pure python: same codes, same recurrence
    codes_rows = emb.select(
        "vec_id", int8_codes_expr(int8_scales(emb), "embedding").alias("c")
    ).collect()
    codes = {r["vec_id"]: np.array(r["c"], dtype=np.int64) for r in codes_rows}
    ids = sorted(codes)
    cents = [codes[i].copy() for i in ids[:k]]
    assign = {}
    for it in range(iters):
        assign = {}
        for vid in ids:
            d = [int(((codes[vid] - c) ** 2).sum()) for c in cents]
            best = min(range(k), key=lambda j: (d[j], j))
            assign[vid] = (best, d[best])
        if it == iters - 1:
            break
        for j in range(k):
            members = [codes[v] for v, (c, _) in assign.items() if c == j]
            if members:
                s = np.sum(members, axis=0)
                cents[j] = np.array(
                    [int(x) // len(members) for x in s], dtype=np.int64
                )
    for vid in ids:
        assert (out[vid]["cell"], out[vid]["dist"]) == assign[vid], vid


def test_integer_kmeans_deterministic(spark, emb):
    from squrve_spark.operators.similarity import integer_kmeans

    a = sorted(tuple(r) for r in integer_kmeans(emb, k=8, n_iter=2).collect())
    b = sorted(tuple(r) for r in integer_kmeans(emb, k=8, n_iter=2).collect())
    assert a == b
    cells = {c for _, c, _ in a}
    assert cells <= set(range(8)) and len(cells) > 1


def test_cluster_balanced_sample_integer_mode_cap(spark, emb):
    from squrve_spark.operators.similarity import cluster_balanced_sample

    sel = cluster_balanced_sample(
        emb, per_cluster=7, n_centroids=4, train_iters=2, integer_codes=True
    ).collect()
    by_cell: dict[int, int] = {}
    for r in sel:
        by_cell[r["cell"]] = by_cell.get(r["cell"], 0) + 1
        assert 1 <= r["rank"] <= 7
    assert all(v <= 7 for v in by_cell.values())
    assert len(by_cell) > 1


def test_ivf_integer_mode_full_probe_exact_and_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    # full probe with integer routing still reproduces the exact top-k
    full = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=8, integer_codes=True
    )
    assert _pairs(full) == _pairs(exact)
    # partial probe: valid ranking, useful recall
    part = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=3, integer_codes=True
    )
    recall = len(_pairs(part) & _pairs(exact)) / len(_pairs(exact))
    assert recall >= 0.5


def test_integer_kmeans_zero_iters_matches_one(spark, emb):
    # the float path's "train_iters=0 keeps the raw sample" convention:
    # 0 and 1 both mean one assignment round against the seed codebook
    # (0 used to crash with assigned=None — r10 review finding)
    from squrve_spark.operators.similarity import integer_kmeans

    a = sorted(tuple(r) for r in integer_kmeans(emb, k=4, n_iter=0).collect())
    b = sorted(tuple(r) for r in integer_kmeans(emb, k=4, n_iter=1).collect())
    assert a == b and a


# ---------------------------------------------------------------------------
# margin-based mining (r10)


def _margin_brute(rows_a, rows_b, k, threshold):
    """Driver-side replay of margin_mine_pairs on tiny inputs."""
    import numpy as np

    ids_a = [r[0] for r in rows_a]
    ids_b = [r[0] for r in rows_b]
    A = np.array([r[1] for r in rows_a], dtype=np.float64)
    B = np.array([r[1] for r in rows_b], dtype=np.float64)
    S = np.round(
        (A / np.linalg.norm(A, axis=1, keepdims=True))
        @ (B / np.linalg.norm(B, axis=1, keepdims=True)).T,
        6,
    )
    Si = np.round(S * 1e6).astype(np.int64)
    topa = {}
    for i, ia in enumerate(ids_a):
        order = sorted(range(len(ids_b)), key=lambda j: (-S[i, j], ids_b[j]))[:k]
        topa[ia] = order
    topb = {}
    for j, jb in enumerate(ids_b):
        order = sorted(range(len(ids_a)), key=lambda i: (-S[i, j], ids_a[i]))[:k]
        topb[jb] = order
    sum_a = {ia: sum(int(Si[ids_a.index(ia), j]) for j in js) for ia, js in topa.items()}
    sum_b = {jb: sum(int(Si[i, ids_b.index(jb)]) for i in is_) for jb, is_ in topb.items()}
    cand = {(ia, ids_b[j]) for ia, js in topa.items() for j in js}
    cand |= {(ids_a[i], jb) for jb, is_ in topb.items() for i in is_}
    out = []
    for ia, jb in cand:
        i, j = ids_a.index(ia), ids_b.index(jb)
        denom = sum_a[ia] / len(topa[ia]) + sum_b[jb] / len(topb[jb])
        if denom <= 0:
            continue
        margin = round(2.0 * float(Si[i, j]) / denom, 6)
        if margin >= threshold:
            out.append((ia, jb, float(S[i, j]), margin))
    return sorted(out, key=lambda t: (-t[3], t[0], t[1]))


def _mk_emb(spark, rows):
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], schema
    )


def test_margin_mine_matches_brute_replay(spark, emb):
    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 60).collect()
    ]
    rows_a = [r for r in rows if r[0] % 2 == 0]
    rows_b = [r for r in rows if r[0] % 2 == 1]
    got = [
        (r["id_a"], r["id_b"], r["sim"], r["margin"])
        for r in similarity.margin_mine_pairs(
            _mk_emb(spark, rows_a), _mk_emb(spark, rows_b), k=4, threshold=1.0
        ).collect()
    ]
    want = _margin_brute(
        [(i, v) for i, v in rows_a], [(i, v) for i, v in rows_b], 4, 1.0
    )
    assert got == want


def test_margin_mine_side_smaller_than_k(spark):
    # B side has 2 vectors < k=4: averages must use the ACTUAL neighbor
    # count, not k — a padded denominator would inflate every margin
    rows_a = [(0, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]), (4, [0.0, 1.0, 0.0])]
    rows_b = [(1, [1.0, 0.05, 0.0]), (3, [0.0, 0.9, 0.1])]
    got = [
        (r["id_a"], r["id_b"], r["sim"], r["margin"])
        for r in similarity.margin_mine_pairs(
            _mk_emb(spark, rows_a), _mk_emb(spark, rows_b), k=4, threshold=0.0
        ).collect()
    ]
    want = _margin_brute(rows_a, rows_b, 4, 0.0)
    assert got == want
    # every candidate pair appears exactly once despite the union of
    # both directions retrieving each of these pairs twice
    assert len({(a, b) for a, b, _, _ in got}) == len(got)


def test_margin_mine_nonpositive_neighborhood_filtered(spark):
    # anti-correlated sides: all cross cosines negative -> denominators
    # non-positive -> the margin contract yields no pairs (never a
    # negative-over-negative "high margin")
    rows_a = [(0, [1.0, 0.0]), (2, [0.8, 0.2])]
    rows_b = [(1, [-1.0, -0.05]), (3, [-0.9, -0.2])]
    got = similarity.margin_mine_pairs(
        _mk_emb(spark, rows_a), _mk_emb(spark, rows_b), k=2, threshold=-10.0
    ).collect()
    assert got == []


# ---------------------------------------------------------------------------
# integer PQ (r11): the replayable ADC tier


def test_integer_pq_shape_and_determinism(spark, emb):
    """Exactly k ranked rows per query, ranks 1..k, ADC non-decreasing in
    rank, no self pairs; bit-identical across runs (integer arithmetic,
    deterministic seeds)."""
    queries = emb.filter(F.col("vec_id") < 8)
    out = similarity.integer_pq_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["code_dist"], r["neighbor_id"]))
    assert len(by_q) == 8
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
        dists = [r[1] for r in rows]
        assert dists == sorted(dists)
        assert all(isinstance(d, int) for d in dists)
    again = similarity.integer_pq_topk(emb, queries, k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_integer_pq_code_dist_is_exact(spark, emb):
    """The reported code_dist must equal the DIRECT integer squared
    distance between the query's and neighbor's full int8 codes — the
    re-rank is exact on the candidate set (numpy recomputation)."""
    import numpy as np

    queries = emb.filter(F.col("vec_id") < 8)
    rows = similarity.integer_pq_topk(emb, queries, k=3).collect()
    scales = similarity.int8_scales(emb)
    codes = {
        r["vec_id"]: np.array(r["qcodes"], dtype=np.int64)
        for r in similarity.quantize_int8(emb, scales).select("vec_id", "qcodes").collect()
    }
    assert rows
    for r in rows:
        want = int(((codes[r["query_id"]] - codes[r["neighbor_id"]]) ** 2).sum())
        assert want == r["code_dist"], (r, want)


def test_integer_pq_recall_vs_bruteforce(spark, emb):
    """4x16 integer PQ on the fixture keeps useful recall against the
    exact float baseline (coarse quantizer: the bound is deliberately
    loose — the point is 'useful and deterministic', exactness comes from
    the replayable oracle, not from recall)."""
    queries = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.integer_pq_topk(emb, queries, k=5)
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_integer_pq_rejects_indivisible_subspaces(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.integer_pq_topk(emb, emb.limit(1), m=7)


def test_integer_ivfpq_composition_properties(spark, emb):
    """r12: the IVFPQ composition — every query gets at most k ranked,
    self-free, duplicate-free neighbors, and FULL probe (nprobe ==
    coarse_k) is IDENTICAL to plain integer PQ: with every cell probed
    the probe equi-join admits each (query, row) pair exactly once, so
    ADC scoring, the candidate window and the exact re-rank coincide
    row-for-row with integer_pq_topk's. (End-to-end result quality is
    deliberately NOT asserted monotone in nprobe: a wider ADC pool can
    displace a candidate that would have re-ranked better — that
    approximation loss is measured in sim_recall_audit, not assumed
    away.)"""
    queries = emb.filter(F.col("vec_id") < 8)
    out = similarity.integer_ivfpq_topk(emb, queries, k=5, nprobe=3)
    per_q = {}
    for r in out.collect():
        assert r["query_id"] != r["neighbor_id"]
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= 5
        assert len({r["neighbor_id"] for r in rs}) == len(rs)
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
    full_probe = sorted(
        map(
            tuple,
            similarity.integer_ivfpq_topk(
                emb, queries, k=5, coarse_k=8, nprobe=8
            ).collect(),
        )
    )
    plain_pq = sorted(
        map(tuple, similarity.integer_pq_topk(emb, queries, k=5).collect())
    )
    assert full_probe == plain_pq


def test_integer_ivfpq_frozen_append_contract(spark, emb):
    """r12: train_on=corpus must be IDENTICAL to the default (freezing on
    everything is a no-op), and a strict-subset base must (a) still rank
    appended ids among the neighbors on this fixture (the frozen encode
    really routes them) and (b) differ from the retrained index (the
    freeze is observable, not vacuous)."""
    queries = emb.filter(F.col("vec_id") < 8)
    default = sorted(
        map(tuple, similarity.integer_ivfpq_topk(emb, queries, k=5).collect())
    )
    noop = sorted(
        map(
            tuple,
            similarity.integer_ivfpq_topk(emb, queries, k=5, train_on=emb).collect(),
        )
    )
    assert noop == default
    frozen = sorted(
        map(
            tuple,
            similarity.integer_ivfpq_topk(
                emb, queries, k=5,
                train_on=emb.filter(F.col("vec_id") % 5 != 0),
            ).collect(),
        )
    )
    assert frozen != default
    assert any(r[1] % 5 == 0 for r in frozen)  # appended ids reachable
