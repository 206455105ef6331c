"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute_force_topk — exact cosine top-k: query set broadcast against the
    corpus, per-query heap via window row_number. Linear in corpus size per
    query; the correctness baseline.
  * lsh_topk — random-hyperplane LSH: 64-bit sign signature per vector
    (map-side projection against a broadcast seeded hyperplane matrix),
    candidates = bucket collisions on signature bands, exact cosine re-rank
    on candidates only. The 100 TB path: turns the cross join into an
    equi-join; recall tunable via bands/bits.

Vector math is done in DOUBLE via built-in higher-order functions
(zip_with/aggregate fold — codegen, deterministic left-to-right order so
results are reproducible across engines and partitionings).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Deterministic double dot product (ordered fold, no FMA surprises)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, sim), self-matches excluded.

    The query side is broadcast — at scale the corpus stays partitioned and
    each partition scores its shard against the in-memory query block
    (classic brute-force ANN sharding); row_number per query keeps k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).withColumn(
        "sim", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6).cast("double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def random_hyperplanes(dim: int, bits: int = 64, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side, tiny)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def with_lsh_signature(
    df: DataFrame, dim: int, bits: int = 64, seed: int = 42, vec_col: str = "embedding"
) -> DataFrame:
    """Add a 64-bit sign-LSH signature column ('lsh_sig').

    The hyperplane matrix is embedded as a literal array (broadcast with the
    plan); signature = bit i set iff dot(v, H_i) > 0. Pure codegen fold.
    """
    planes = random_hyperplanes(dim, bits, seed)
    planes_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in planes])
    v = _as_double(F.col(vec_col))
    sig_bits = F.transform(
        planes_lit, lambda plane: F.when(dot_expr(plane, v) > 0, F.lit(1)).otherwise(F.lit(0))
    )
    sig = F.aggregate(
        F.zip_with(
            sig_bits,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda b, i: F.when(
                b == 1, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.withColumn("lsh_sig", sig)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bands: int = 8,
    bits: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: LSH band collision candidates + exact re-rank.

    Bands of bits/bands hyperplane signs; a candidate shares >=1 band with the
    query. Join is an equi-join on (band_idx, band_val) — shuffle instead of
    cross join; recall rises with bands.
    """
    width = bits // bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, role: str) -> DataFrame:
        sig = with_lsh_signature(df, dim, bits, seed, vec_col)
        return sig.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_vec"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.call_function(
                        "shiftrightunsigned", F.col("lsh_sig"), b * width
                    ).bitwiseAND(F.lit(mask)),
                )
            ).alias("band_idx", "band_val"),
        )

    qb = banded(queries, "query")
    cb = banded(corpus, "neighbor")
    cand = (
        qb.join(cb, ["band_idx", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "sim", F.round(cosine_expr(F.col("query_vec"), F.col("neighbor_vec")), 6).cast("double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking + exact verify."""
    sig = with_lsh_signature(df, dim, seed=7, vec_col=vec_col)
    width = 64 // bands
    mask = (1 << width) - 1
    chunked = sig.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.call_function(
                    "shiftrightunsigned", F.col("lsh_sig"), b * width
                ).bitwiseAND(F.lit(mask)),
            )
        ).alias("band_idx", "band_val"),
    )
    cand = (
        chunked.alias("a")
        .join(
            chunked.alias("b"),
            [
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("vec_a"),
            F.col(f"b.{vec_col}").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = cosine_expr(F.col("vec_a"), F.col("vec_b"))
    return cand.select(
        "id_a", "id_b", F.round(sim, 6).cast("double").alias("sim")
    ).filter(F.col("sim") >= threshold)
