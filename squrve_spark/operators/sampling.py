"""Corpus sampling & selection operators: deterministic stratified samples,
per-group top-k selection, token-budget packing.

A training-data pipeline's curation stage between dedup and tokenization:
draw balanced per-language/per-source samples, keep the best-k documents per
bucket, and pack variable-length documents into fixed token-budget bins for
sharded tokenizer/training jobs. The reference engine has no analog (its
data plane is per-task sqlite rows); these follow the same public designs
as the rest of ``operators/`` (C4/Gopher curation recipes, first-fit
bin packing).

Scale notes (100 TB):
  * ``deterministic_sample`` replaces seeded-random sampling with a rank on
    ``md5(id)``: reproducible across engines AND across reruns on changed
    cluster topology (Bernoulli sampleBy depends on partition iteration
    order; a hash rank doesn't). One shuffle on the strata key; with
    ``prefilter_factor`` the stratum sort input is first cut to
    ~``factor * k`` rows by a hash-prefix threshold, so the window sorts
    a bounded candidate set instead of the full stratum.
  * ``topk_per_group`` is a window row_number — single shuffle; for tiny k
    Spark's WindowGroupLimit pushes the limit below the sort at scale.
  * ``pack_documents`` shards by hash then packs each shard independently
    in one Arrow-batched ``applyInPandas`` pass — shard count bounds state,
    no cross-shard coordination, linear in rows.
"""

from __future__ import annotations

from squrve_spark.catalog import MEMO_CAP

from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_rank_window(strata_cols: list[str], id_col: str):
    """THE md5-rank draw ordering — (md5(cast(id as string)), id) ascending
    within the strata. ONE implementation (r8 review): the tie-break and
    the cast are oracle-critical, so every deterministic draw in this
    module (`md5_rank_pick`, `deterministic_sample`, `weighted_mix`) must
    rank through this exact window or its DuckDB twin silently drifts."""
    return Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )


def md5_rank_pick(
    df: DataFrame,
    strata_cols: list[str],
    quotas,
    id_col: str = "doc_id",
    rank_col: str = "_rk",
    k_max: Optional[int] = None,
) -> DataFrame:
    """THE md5-rank winner selection (r8), shared by the deterministic
    draws in this module: rank ``id_col`` within each stratum by
    ``(md5(id), id)`` ascending over a SLIM ``(strata..., id)``
    projection and keep each stratum's quota.

    ``quotas`` is an int (same cap everywhere) or a DataFrame
    ``(strata..., quota)`` (per-stratum caps — `weighted_mix`,
    `mixture_sample`).

    Scale contract — the part every caller inherits: the rank filter is
    applied against a LITERAL ``k_max`` FIRST, which lets Catalyst plan
    ``WindowGroupLimit(Partial)`` BELOW the exchange (SPARK-37099): each
    map partition keeps only its own top-``k_max`` per stratum, so the
    shuffle carries at most partitions x strata x k rows even though the
    strata columns are low-cardinality. A quota COLUMN filter alone
    defeats that optimization (the limit must be a literal) — exactly the
    hole the pre-r8 `weighted_mix` had; per-stratum quotas are applied as
    a second filter on the already-bounded rows. Plan-asserted in
    tests/test_plan_shapes.py.

    Returns ``(strata..., id_col, rank_col[, quota])``.
    """
    slim = df.select(*strata_cols, id_col)
    if isinstance(quotas, int):
        qdf, k_max = None, quotas
    else:
        qdf = quotas
        if k_max is None:  # callers that hold the quotas driver-side pass
            # k_max to skip this one-row aggregate job (r8 review)
            k_max = int(qdf.agg(F.max("quota")).first()[0] or 0)
    w = _md5_rank_window(strata_cols, id_col)
    ranked = slim.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= F.lit(k_max)  # literal -> WindowGroupLimit Partial
    )
    if qdf is not None:
        ranked = ranked.join(F.broadcast(qdf), strata_cols).filter(
            F.col(rank_col) <= F.col("quota")
        )
    return ranked


def deterministic_sample(
    df: DataFrame,
    per_stratum: int,
    strata_cols: list[str],
    id_col: str = "doc_id",
    prefilter_factor: Optional[int] = None,
    rank_col: Optional[str] = None,
) -> DataFrame:
    """Exactly ``min(per_stratum, |stratum|)`` rows per stratum, selected by
    md5-hash rank of ``id_col`` — a reproducible, engine-portable 'random'
    sample (md5 is uniform; rank on it is a uniform draw without an RNG).

    ``prefilter_factor`` (scale knob): keep only rows whose hash falls in
    the first ``factor * per_stratum / approx_stratum_size`` of hash space
    before ranking; can only *undershoot* on a pathological hash draw
    (factor >= 4: negligible). Even without it the window is scale-safe:
    the LITERAL ``per_stratum`` rank filter lets Catalyst plan
    ``WindowGroupLimit(Partial)`` below the exchange, so each map
    partition pre-trims to its own top-k per stratum and the shuffle
    carries partitions x strata x k rows, never the corpus — the pre-cut
    just also shrinks the map-side sort input.

    ``rank_col``: name to keep the 1-based within-stratum rank under
    (dropped when None) — `cap_per_group` is this with the rank exposed.
    """
    hash_col = F.md5(F.col(id_col).cast("string"))
    if prefilter_factor is not None:
        counts = df.groupBy(*strata_cols).agg(F.count("*").alias("_n"))
        df = df.join(F.broadcast(counts), strata_cols)
        # hex-prefix threshold: keep ~factor*k of n rows (16^4 buckets)
        frac = F.least(
            F.lit(1.0), F.lit(float(prefilter_factor * per_stratum)) / F.col("_n")
        )
        bucket = F.conv(F.substring(hash_col, 1, 4), 16, 10).cast("long")
        df = df.filter(bucket < frac * 65536).drop("_n")
    w = _md5_rank_window(strata_cols, id_col)
    rk = rank_col or "_rk"
    out = df.withColumn(rk, F.row_number().over(w)).filter(
        F.col(rk) <= per_stratum
    )
    return out if rank_col else out.drop(rk)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by md5-hash bucketing.

    ``weights`` maps split name -> fraction (must sum to ~1, insertion
    order defines the hash-space layout). A row's bucket is the first 8 hex
    digits of ``md5(id)`` compared against cumulative-weight thresholds —
    hex strings compare lexicographically exactly like their numeric
    values, so the thresholds are plain string comparisons.

    Scale shape: MAP-ONLY — no shuffle, no RNG, no state. The same row
    lands in the same split on any engine, any cluster topology, any rerun
    (the property seeded ``randomSplit`` lacks: it reshuffles with
    partitioning). Adding rows never moves existing rows between splits.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        threshold = format(min(int(cum * 16**8), 16**8 - 1), "08x")
        cond = h < F.lit(threshold)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample sources to target mixing proportions (training-mixture
    construction, e.g. '60% web, 30% code, 10% books').

    The largest total T satisfying ``w_s * T <= n_s`` for every source s is
    ``T = min(n_s / w_s)``; each source keeps its ``floor(w_s * T)``
    lowest-``md5(id)`` rows — the deterministic uniform draw used across
    this module. Sources absent from ``weights`` are dropped.

    Scale shape: one tiny per-source count aggregate (broadcast back), one
    window rank per source (single shuffle on ``source_col``). With few
    sources a hot source serializes its rank into one task — at real scale
    swap the rank for a hash-prefix threshold cut at ``k_s / n_s`` of hash
    space (the ``prefilter_factor`` idea) and the plan is map-only.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be > 0, got {weights}")
    # per-source counts: the mix's trained parameter — session-memoized per
    # input snapshot (r12, the mixture_sample contract); the draw itself
    # still executes per action
    from squrve_spark.catalog import MEMO_CAP, plan_key

    spark = df.sparkSession
    _wc = spark.__dict__.setdefault("_squrve_weighted_counts_cache", {})
    _wk = (*plan_key(df), source_col, tuple(sorted(weights)))
    counts = _wc.get(_wk)
    if counts is None:
        counts = {
            r[source_col]: r["n"]
            for r in df.filter(F.col(source_col).isin(list(weights)))
            .groupBy(source_col).agg(F.count("*").alias("n")).collect()
        }
        while len(_wc) >= MEMO_CAP:
            _wc.pop(next(iter(_wc)))
        _wc[_wk] = counts
    missing = sorted(set(weights) - set(counts))
    if missing:
        # a weighted source with zero supply makes the documented
        # 'w_s * T <= n_s for EVERY source' constraint give T = 0; silently
        # renormalizing over the present sources would ship a corpus with
        # the wrong mixture — fail loudly instead (review finding, late r4)
        raise ValueError(
            f"weighted sources have no rows: {missing}; drop them from "
            "weights (and renormalize) to mix without them"
        )
    t = min(counts[s] / w for s, w in weights.items())
    quota = {s: int(w * t) for s, w in weights.items() if s in counts}
    quota_col = F.coalesce(
        *[F.when(F.col(source_col) == s, F.lit(k)) for s, k in quota.items()]
    ) if quota else F.lit(0)
    w = _md5_rank_window([source_col], id_col)
    k_max = max(quota.values(), default=0)
    return (
        df.filter(F.col(source_col).isin(list(quota)))
        .withColumn("_rk", F.row_number().over(w))
        # LITERAL max-quota filter first: Catalyst can only plan the
        # map-side WindowGroupLimit(Partial) pre-trim against a literal —
        # the per-source quota COLUMN filter alone shipped the whole
        # corpus into |sources| sort tasks (r8 fix; plan-asserted)
        .filter(F.col("_rk") <= F.lit(k_max))
        .filter(F.col("_rk") <= quota_col)
        .drop("_rk")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Bernoulli per-stratum sampling (``df.sampleBy``) — the scale-native
    approximate path when exact counts don't matter (no shuffle at all)."""
    return df.sampleBy(strata_col, fractions, seed)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Best-k rows per group under ``order_by`` (pass desc()/asc() columns
    ending with a unique-id tie-break for a deterministic selected set)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def pack_documents(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_shards: int = 32,
    portable: bool = False,
) -> DataFrame:
    """Greedy first-fit-decreasing packing of documents into token-budget
    bins, sharded for parallelism.

    Documents shard by ``hash(id) % num_shards``; within a shard, docs are
    taken longest-first and placed into the first open pack with room
    (fresh pack otherwise — an over-budget single doc gets its own pack).
    Output: ``(id_col, token_col, shard, pack_id, pack_tokens)`` where
    ``pack_id`` is globally unique (``shard * 2^40 + local``) and
    ``pack_tokens`` is the pack's total. Every input row appears exactly
    once; FFD wastes <= 22% of budget asymptotically (textbook bound).

    At 100 TB: per-shard state is the open-pack list (bounded by shard
    doc count), packing is one ``applyInPandas`` over a ``num_shards``-way
    shuffle; raise ``num_shards`` to match cluster parallelism.
    """
    # ``portable`` (r10) swaps the shard hash for a 60-bit md5 prefix of
    # the id's decimal string — nonnegative on both engines, so DuckDB's
    # CAST(('0x'||substr(md5(CAST(id AS VARCHAR)),1,15)) AS UBIGINT) % S
    # replays it and the ENTIRE per-shard FFD scan becomes
    # oracle-checkable (the shard population determines the scan order).
    if portable:
        shard = F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("long"),
            F.lit(num_shards),
        )
    else:
        shard = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(num_shards))
    src = df.select(
        F.col(id_col),
        F.col(token_col).cast("long"),
        shard.cast("int").alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([token_col, id_col], ascending=[False, True])
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        pack_ids, pack_space = [], []  # open packs: remaining room
        assign = []
        for tok in pdf[token_col].to_numpy():
            placed = None
            for i, room in enumerate(pack_space):
                if tok <= room:
                    placed = i
                    break
            if placed is None:
                pack_space.append(max(0, budget - int(tok)))
                placed = len(pack_space) - 1
            else:
                pack_space[placed] -= int(tok)
            assign.append(placed)
        pdf = pdf.assign(pack_local=assign)
        pdf["pack_id"] = (shard << 40) + pdf["pack_local"]
        pdf["pack_tokens"] = pdf.groupby("pack_local")[token_col].transform("sum")
        return pdf[[id_col, token_col, "shard", "pack_id", "pack_tokens"]]

    out_schema = (
        f"{id_col} long, {token_col} long, shard int, pack_id long, pack_tokens long"
    )
    return src.groupBy("shard").applyInPandas(pack, schema=out_schema)


def leakproof_split(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test split that exact-duplicate clusters can never straddle.

    Plain per-row hash splitting leaks: two byte-identical documents can
    land in train AND test, and the eval set silently contains training
    data. Here every row first resolves its exact-dup cluster representative
    (min id over the canonical-text fingerprint), and the split is assigned
    by hashing the REPRESENTATIVE id — so an entire duplicate cluster moves
    as one unit, by construction.

    Scale shape: one hash shuffle on the fingerprint (the same partitioning
    exact dedup already pays), then the map-only `hash_split` thresholds on
    the representative. Deterministic, engine-portable (md5-hex compare),
    append-stable: new duplicates of an existing text inherit its split.
    """
    from pyspark.sql import Window

    from squrve_spark.operators.text import canon_expr

    # annotate, don't project: like hash_split, the caller gets their rows
    # back with fp_md5/rep_id/split added
    rep = df.withColumn("fp_md5", F.md5(canon_expr(text_col))).withColumn(
        "rep_id", F.min(id_col).over(Window.partitionBy("fp_md5"))
    )
    return hash_split(rep, weights, id_col="rep_id")



def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    prefilter_factor: Optional[int] = None,
) -> DataFrame:
    """Deterministic per-group document cap (the C4 / RefinedWeb
    per-domain cap): keep at most ``cap`` rows per ``group_col``, chosen
    by md5-of-id order (uniform, stable across runs and engines), with
    the raw id as tie-break. Adds ``rank_in_group`` (1-based).

    Scale shape: ONE hash-partition exchange on the group key + a
    per-partition sort — the minimum for any exact per-group quota
    (`deterministic_sample` with the rank kept; ONE implementation of
    the oracle-critical md5-rank idiom, so the tie-break and cast can
    never drift between the two). ``prefilter_factor`` (r8, r7 verdict
    #6) is the hot-group pre-cut, threaded straight through to
    `deterministic_sample`: one domain = half the corpus is EXACTLY the
    C4 per-domain-cap scenario, and with a factor set the hot group's
    sort input shrinks from its full row count to ~``factor * cap``
    hash-selected candidates before the rank (factor >= 4 makes an
    undershoot probabilistically negligible; see deterministic_sample).
    """
    return deterministic_sample(
        df, cap, [group_col], id_col=id_col,
        prefilter_factor=prefilter_factor, rank_col="rank_in_group",
    )


def length_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    bucket_tokens: int = 32,
) -> DataFrame:
    """Padding-efficiency audit for LENGTH-BUCKETED batching (the
    fairseq/HF `--group-by-length` planner): assign each document to the
    token-length bucket ``ceil(n_tokens / bucket_tokens)`` and report, per
    bucket, the doc count, token mass, longest member, and the padding
    waste if every member pads to the bucket cap — the numbers that pick
    ``bucket_tokens`` before a training run burns step time on pad
    tokens.

    Scale shape: one scan + one groupBy whose key space is bounded by
    max_doc_tokens / bucket_tokens (a few hundred buckets regardless of
    corpus rows — partial aggregation collapses almost everything
    map-side). Zero Python, zero joins.
    """
    from squrve_spark.catalog import spread
    from squrve_spark.operators.text import tokens_expr

    n = F.size(tokens_expr(text_col))
    bucket = F.ceil(n / F.lit(float(bucket_tokens))).cast("long")
    cap = (F.col("bucket") * bucket_tokens).cast("long")
    padded = F.col("n_docs") * cap
    return (
        spread(df)
        .select(bucket.alias("bucket"), n.alias("_n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("sum_tokens"),
            F.max("_n").alias("max_tokens"),
        )
        .select(
            "bucket",
            cap.alias("cap_tokens"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sum_tokens").cast("long").alias("sum_tokens"),
            F.col("max_tokens").cast("long").alias("max_tokens"),
            F.round(
                F.lit(100.0) * (padded - F.col("sum_tokens")) / padded, 4
            ).cast("double").alias("pad_waste_pct"),
        )
    )


def mixture_sample(
    df: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    temperature: float = 0.5,
    weight_scale: int = 10**6,
) -> DataFrame:
    """Temperature-rebalanced mixture sampling (r8) — the multilingual /
    multi-domain training-mix recipe (mBERT / XLM-R exponential
    smoothing): stratum weights ``n^temperature`` flatten head strata and
    boost tail strata, a total ``budget`` of rows is apportioned to
    strata by the largest-remainder method, and each stratum's quota is
    drawn by the engine-portable md5-of-id rank.

    Cross-engine exactness: the apportionment runs in INTEGER arithmetic
    — weights are ``floor(n^t * weight_scale)`` longs, base quotas are
    ``(budget*w) // total`` with largest ``(budget*w) % total`` remainders
    (ties: stratum asc) taking the leftovers — so no float-summation
    order can flip a quota between engines.

    Scale shape: one bounded groupBy-count (#strata rows to the driver),
    quota table broadcast back, then the md5 rank runs through
    `md5_rank_pick` — a slim (stratum, id, hash) projection whose LITERAL
    max-quota rank filter plans WindowGroupLimit(Partial) below the
    exchange, so with a handful of strata the window's shuffle still
    carries only partitions x strata x max_quota rows instead of funneling
    the corpus into |strata| single-task sorts. Output: (stratum, id,
    rank_in_stratum, quota).
    """
    import math

    # rows with a NULL stratum are excluded up front (r8 review: a None
    # key breaks the apportionment sort, and the quota equi-join could
    # never draw them anyway — fillna a sentinel upstream to include them)
    df = df.filter(F.col(stratum_col).isNotNull())
    # per-stratum counts are the apportionment's trained parameter —
    # session-memoized per input snapshot (r12, the dsir_bucket_weights /
    # train_unigrams contract): repeat builds of the identical pool skip
    # the count job; the draw itself still executes per action.
    from squrve_spark.catalog import plan_key

    spark = df.sparkSession
    cache = spark.__dict__.setdefault("_squrve_mixture_counts_cache", {})
    ckey = (*plan_key(df), stratum_col)
    counts = cache.get(ckey)
    if counts is None:
        counts = {
            r[stratum_col]: r["n"]
            for r in df.groupBy(stratum_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        while len(cache) >= MEMO_CAP:
            cache.pop(next(iter(cache)))
        cache[ckey] = counts
    if not counts:
        raise ValueError("mixture_sample needs a non-empty input")
    wt = {
        s: int(math.floor(math.pow(float(n), temperature) * weight_scale))
        for s, n in counts.items()
    }
    total_wt = sum(wt.values())
    base = {s: (budget * w) // total_wt for s, w in wt.items()}
    rem = {s: (budget * w) % total_wt for s, w in wt.items()}
    leftover = budget - sum(base.values())
    for s in sorted(rem, key=lambda s: (-rem[s], s))[:leftover]:
        base[s] += 1
    quota_rows = [(s, base[s]) for s in sorted(base)]
    spark = df.sparkSession
    from pyspark.sql import types as T

    from squrve_spark.catalog import memo_plan

    stratum_type = df.schema[stratum_col].dataType  # not always string
    # memoize the quota frame OBJECT per content (r12): createDataFrame
    # parallelizes to a LogicalRDD whose semanticHash embeds a fresh RDD id
    # per call, which silently destabilized every downstream plan_key memo
    # (pipeline_curate_v5's sample checkpoint missed on every pass)
    quotas = memo_plan(
        spark,
        ("mixture-quotas", stratum_col, str(stratum_type), tuple(quota_rows)),
        lambda: spark.createDataFrame(
            quota_rows,
            T.StructType([
                T.StructField(stratum_col, stratum_type),
                T.StructField("quota", T.LongType()),
            ]),
        ),
    )
    picked = md5_rank_pick(df, [stratum_col], quotas, id_col,
                           "rank_in_stratum", k_max=max(base.values()))
    return picked.select(
        stratum_col,
        id_col,
        F.col("rank_in_stratum").cast("int").alias("rank_in_stratum"),
        F.col("quota").cast("long").alias("quota"),
    )


def unimax_mix(
    docs: DataFrame,
    budget_tokens: int,
    epoch_cap: int = 1,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): allocate a global
    token budget as UNIFORMLY as possible across languages, capping each
    language at ``epoch_cap`` epochs of its corpus — the published
    alternative to temperature sampling that neither starves tail
    languages nor over-epochs them.

    The sequential budget loop is the classic WATER-FILLING problem, so
    it relationalizes exactly: with per-language caps c_l = tokens_l *
    epoch_cap sorted ascending, position i's candidate share is
    s_i = (B - prefix_caps_{i-1}) div (k - i + 1); every language before
    the first position with c_i > s_i is fully capped (alloc = cap), and
    every language from that position on receives the integer water level
    theta = s_p. Integer divisions throughout: the sub-#languages token
    remainder is left unallocated rather than redistributed (documented
    determinism > a <k-token budget top-up). Selection inside each
    language is the module's md5-rank draw, keeping documents while the
    running token sum stays within the allocation.

    Returns the training-mix manifest: (doc_id, lang, n_tokens, rk,
    cum_tokens, alloc_tokens). Scale shape: caps are one k-row aggregate;
    the water level derives from a window over those k rows (broadcast
    back); selection is the WindowGroupLimit-friendly md5-rank window
    plus a running sum — no shuffle carries more than the corpus once.
    """
    from squrve_spark.operators.text import tokens_expr

    toks = docs.select(
        id_col, lang_col, F.size(tokens_expr(text_col)).cast("long").alias("n_tokens")
    )
    caps = toks.groupBy(lang_col).agg(
        (F.sum("n_tokens") * F.lit(int(epoch_cap))).cast("long").alias("cap")
    )
    wl = Window.orderBy(F.col("cap").asc(), F.col(lang_col).asc())
    k = Window.partitionBy()
    staged = caps.select(
        lang_col,
        "cap",
        F.row_number().over(wl).alias("pos"),
        F.coalesce(
            F.sum("cap").over(wl.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cprefix"),
        F.count(F.lit(1)).over(k).alias("nlang"),
    ).withColumn(
        "share",
        F.expr(f"({int(budget_tokens)} - cprefix) div (nlang - pos + 1)"),
    )
    # theta = the share at the FIRST position whose cap exceeds it (shares
    # beyond that position are computed under a stale all-capped
    # assumption, so neither MIN nor MAX is correct — it must be the
    # first by position); if every language fits (budget >= sum of caps),
    # no such position exists and every alloc is its cap. One window over
    # the k-row caps frame — no driver action, no empty-join hazard.
    wall = Window.orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    alloc = staged.withColumn(
        "theta",
        F.first(
            F.when(F.col("cap") > F.col("share"), F.col("share")), ignorenulls=True
        ).over(wall),
    ).select(
        lang_col,
        "cap",
        F.least(F.col("cap"), F.coalesce(F.col("theta"), F.col("cap"))).alias(
            "alloc_tokens"
        ),
    )
    w = _md5_rank_window([lang_col], id_col)
    sel = (
        toks.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                _md5_rank_window([lang_col], id_col).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .join(F.broadcast(alloc.select(lang_col, "alloc_tokens")), lang_col)
        .filter(F.col("cum_tokens") <= F.col("alloc_tokens"))
    )
    return sel.select(
        id_col,
        lang_col,
        "n_tokens",
        F.col("rk").cast("int").alias("rk"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("alloc_tokens").cast("long").alias("alloc_tokens"),
    )
