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

from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_sample(
    df: DataFrame,
    per_stratum: int,
    strata_cols: list[str],
    id_col: str = "doc_id",
    prefilter_factor: Optional[int] = None,
) -> DataFrame:
    """Exactly ``min(per_stratum, |stratum|)`` rows per stratum, selected by
    md5-hash rank of ``id_col`` — a reproducible, engine-portable 'random'
    sample (md5 is uniform; rank on it is a uniform draw without an RNG).

    ``prefilter_factor`` (scale path): keep only rows whose hash falls in
    the first ``factor * per_stratum / approx_stratum_size`` of hash space
    before ranking. Left None (default), selection is exact with no extra
    pass; with a factor the candidate cut needs a per-stratum count first
    (one cheap agg) and can only *undershoot* if a stratum's hash draw is
    pathologically skewed — factor >= 4 makes that probability negligible.
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
    w = Window.partitionBy(*strata_cols).orderBy(hash_col, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_stratum)
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
    src = df.select(
        F.col(id_col),
        F.col(token_col).cast("long"),
        (F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(num_shards)))
        .cast("int")
        .alias("shard"),
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
