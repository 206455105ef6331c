"""Distributed connected components over near-duplicate pair sets.

Every pairwise dedup operator in this package (exact groups, MinHash/LSH,
SimHash, n-gram Jaccard, embedding near-dup) emits PAIRS; production
dedup needs the transitive closure of those pairs — duplicate CLUSTERS —
so one canonical document per cluster survives. The reference frames the
same need as its dedup/eval grouping (SURVEY §2 pipeline rows); here it is
the standard iterative min-label propagation expressed as DataFrame joins:

* labels only ever DECREASE (monotone to the component minimum), so the
  per-iteration convergence check is a single SUM aggregate — the sum of
  labels strictly decreases until fixpoint, no change-join needed;
* each iteration is one equi-join (edges ⋈ labels on dst) + one groupBy
  min — both shuffle on ids, no driver materialization at any point;
* lineage is truncated per iteration with an eager ``localCheckpoint``
  (iterative DataFrame plans otherwise grow exponentially and re-execute
  the whole history each pass);
* iteration count is bounded by the component diameter. Near-dup clusters
  are dense and shallow (diameter 2-4 in practice); ``max_iter`` guards
  pathological chains and raises rather than silently mislabeling.

At 100 TB the edge set (pairs) is orders of magnitude smaller than the
corpus — components run on pairs only; the corpus joins in once at the end
for canonical selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _iter_memo(pairs: DataFrame, tag: str, params: tuple):
    """Session memo for the iterative runs (connected_components /
    pagerank / pagerank_exact), keyed on (tag, pairs plan, params) — the
    integer_kmeans reclaim pattern: repeat queries over one read-only
    pair-graph snapshot pay the multi-iteration checkpoint chain once.
    Returns (cache, key). Stale-read caveat matches memo_checkpoint's:
    read-only snapshot inputs only."""
    from squrve_spark.catalog import plan_key

    spark = pairs.sparkSession
    cache = spark.__dict__.setdefault("_squrve_graph_cache", {})
    key = (tag, *plan_key(pairs), *params)
    return cache, key


def _memo_put(cache: dict, key: tuple, value: DataFrame) -> DataFrame:
    while len(cache) >= 16:
        # Evicted entries are left for GC, NOT unpersisted: the cached
        # frames are eager localCheckpoints already RETURNED to callers on
        # earlier invocations; localCheckpoint truncates lineage, so
        # explicitly releasing the blocks would make a still-held reference
        # unrecoverable (missing-checkpoint-block on its next action).
        # memo_checkpoint makes the same trade for the same reason.
        cache.pop(next(iter(cache)))
    cache[key] = value
    return value


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    use_memo: bool = True,
) -> DataFrame:
    """Transitive closure of a pair set: (id, component) with component =
    the minimum id reachable from ``id``. Only ids appearing in ``pairs``
    are returned (singletons are their own component by definition and
    need no computation — join back against the corpus for them).

    ``use_memo=False`` bypasses the session memo for NON-snapshot inputs
    (e.g. an overwritten parquet path whose plan text is unchanged) —
    the memo's stale-read contract covers read-only snapshots only."""
    cache, mkey = _iter_memo(pairs, "cc", (id_a, id_b, max_iter))
    hit = cache.get(mkey) if use_memo else None
    if hit is not None:
        return hit
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("comp")
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.alias("l")
            .join(nbr_min.alias("m"), F.col("l.id") == F.col("m.src"), "left")
            .select(
                F.col("l.id").alias("id"),
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("m.nbr_comp"), F.col("l.comp"))
                ).alias("comp"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        old = labels
        labels = new_labels
        old.unpersist()
        if new_sum == prev_sum:  # monotone decrease stalled -> fixpoint
            return _memo_put(cache, mkey, labels) if use_memo else labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(component diameter exceeds max_iter; raise it for chain-shaped graphs)"
    )


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    use_memo: bool = True,
) -> DataFrame:
    """Distributed PageRank over an undirected pair set -> (id, rank).

    The similarity/dedup pair graphs double as relatedness graphs; rank
    over them surfaces the most-connected (hub) documents — a standard
    corpus-curation signal (e.g. for picking representative docs per
    near-dup neighborhood). Expressed as the classic DataFrame iteration:

    * contributions = ranks ⋈ edges (shuffle on src) -> groupBy dst sum —
      both shuffle on ids; nothing driver-side but the loop counter;
    * dangling mass: an undirected graph built from pairs has none (every
      node has degree >= 1), so the update is exactly
      ``rank = (1-d)/n + d * sum(contribs)`` with total mass conserved at
      1.0 every iteration (property-tested against numpy power iteration);
    * lineage is truncated every ``checkpoint_every`` iterations with an
      eager localCheckpoint — the iterative-plan blowup guard, same as
      connected_components, amortized because rank converges smoothly and
      intermediate recompute depth is bounded.

    Ranks are normalized to sum to 1 (probability form). Deterministic:
    decimal-free double math but every engine computes the same join
    results; iteration count is fixed, not convergence-tested.
    """
    cache, mkey = _iter_memo(
        pairs, "pr", (id_a, id_b, n_iter, damping, checkpoint_every)
    )
    hit = cache.get(mkey) if use_memo else None
    if hit is not None:
        return hit
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    degrees = edges.groupBy("src").agg(F.count("*").alias("deg"))
    out_edges = (
        edges.join(degrees, on="src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n = nodes.count()  # scalar: node count, pair-scale not corpus-scale
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    prev_ckpt = None  # superseded checkpoints release their blocks eagerly
    for i in range(n_iter):
        contribs = (
            out_edges.join(ranks, out_edges.src == ranks.id)
            .select("dst", (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                prev_ckpt.unpersist()
            prev_ckpt = ranks
    return _memo_put(cache, mkey, ranks) if use_memo else ranks


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Deduplicated corpus: keep the minimum-id document of every duplicate
    cluster plus all singletons. Anti-join of the corpus against the
    non-canonical member set — one broadcast-or-shuffle hash join; the
    member set is pair-scale, not corpus-scale."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")


def pagerank_exact(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_iter: int = 8,
    scale: int = 10**12,
    checkpoint_every: int = 3,
    use_memo: bool = True,
) -> DataFrame:
    """Integer FIXED-POINT PageRank -> (id, rank BIGINT) — the
    engine-replayable variant of `pagerank` (r10).

    Float PageRank's per-iteration double sums depend on reduction order,
    so no cross-engine oracle can replay it bit-exactly. This variant
    defines the recurrence over scaled integers with explicit floors:

        r0(v)  = scale div n
        share  = r(u) div deg(u)            (per-edge integer floor)
        r'(v)  = (15*(scale div n)) div 100 + (85 * sum(shares)) div 100

    Every operation is exact int64 arithmetic (max magnitude
    85*scale*~1 << 2^63), so ANY engine — including a DuckDB oracle that
    unrolls the iterations as chained CTEs — reproduces identical ranks,
    making the iterative join+aggregate loop itself cross-engine
    checkable. The floors bleed ~deg ulps of mass per node per iteration
    (bounded by n_edges/scale relative error — negligible at scale=1e12);
    ranking agreement with float `pagerank` is property-tested.

    Same distributed shape as `pagerank`: contributions = ranks ⋈ edges
    shuffled on ids, groupBy-sum with map-side partials, lineage truncated
    every ``checkpoint_every`` iterations.
    """
    cache, mkey = _iter_memo(
        pairs, "pre", (id_a, id_b, n_iter, scale, checkpoint_every)
    )
    hit = cache.get(mkey) if use_memo else None
    if hit is not None:
        return hit
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    degrees = edges.groupBy("src").agg(F.count("*").alias("deg"))
    out_edges = edges.join(degrees, on="src").localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n = nodes.count()  # scalar: node count, pair-scale not corpus-scale
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    init = scale // n
    base = (15 * init) // 100
    ranks = nodes.select("id", F.lit(init).cast("long").alias("rank"))
    prev_ckpt = None
    for i in range(n_iter):
        contribs = (
            out_edges.join(ranks, out_edges.src == ranks.id)
            .select("dst", F.expr("rank div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = nodes.join(contribs, nodes.id == contribs.dst, "left").select(
            "id",
            (
                F.lit(base).cast("long")
                + F.expr("(85 * coalesce(contrib, cast(0 as bigint))) div 100")
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                prev_ckpt.unpersist()
            prev_ckpt = ranks
    return _memo_put(cache, mkey, ranks) if use_memo else ranks
