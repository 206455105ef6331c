"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding near-dup.

Scale design notes (the point of each variant):
  * exact        — one hash-shuffle on the 128-bit fingerprint; linear.
  * n-gram Jaccard — exact pairwise similarity, quadratic per block; only
                     usable behind a blocking key (or behind LSH candidates).
  * MinHash+LSH  — the linear-ish scale path: signature is a map-side
                    projection, banding turns near-dup search into an
                    equi-join on (band, band_hash); candidate pairs are then
                    verified with true Jaccard so precision is exact.
  * SimHash      — 64-bit signature; near-dup = hamming<=k. Blocking by the
                    pigeonhole principle: split signature into k+1 chunks,
                    any pair at hamming<=k shares >=1 exact chunk -> equi-join.
  * embedding    — cosine > threshold over a vector column (see similarity.py
                    for the ANN machinery).

All signature computation is nested array expressions over built-ins
(codegen'd, zero Python); joins are equi-joins Catalyst can shuffle-plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from squrve_spark.operators.text import tokens_expr


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts (by md5 fingerprint): survivor = min id.

    Returns one row per distinct text: (fp_md5, keep_id, n_copies).
    """
    canon = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        df.select(F.md5(canon).alias("fp_md5"), F.col(id_col))
        .groupBy("fp_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingles_expr(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of the document."""
    toks = tokens_expr(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(gram)


def _pairs_from_blocks(
    left: DataFrame, right: DataFrame, block_cols: list[str], id_col: str
) -> DataFrame:
    """Join two copies of a corpus on blocking keys, keeping each unordered
    pair once (id_a < id_b)."""
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    return left.alias("a").join(right.alias("b"), cond)


def jaccard_expr(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within blocks.

    Output: (id_a, id_b, jaccard) for pairs above threshold. Quadratic per
    block — block_cols must bound block size (or feed LSH candidates instead).
    """
    docs = df.select(id_col, *block_cols, shingles_expr(text_col, n).alias("sh")).filter(
        F.size("sh") > 0
    )
    pairs = _pairs_from_blocks(docs, docs, block_cols, id_col)
    jac = jaccard_expr(F.col("a.sh"), F.col("b.sh"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).cast("double").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature_expr(shingle_col: str = "sh", num_hashes: int = 64) -> Column:
    """MinHash signature: per seed i, min over shingles of xxhash64(shingle, i).

    xxhash64 is Spark's built-in 64-bit hash (JVM-side); one pass over the
    shingle array per seed, all inside codegen.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(F.col(shingle_col), lambda s: F.xxhash64(s, i))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with true Jaccard.

    banding: `bands` bands of `num_hashes/bands` rows; candidate pairs share
    at least one identical band (equi-join on (band_idx, band_hash) — the
    only shuffle). Verification re-computes exact Jaccard on the candidate
    pairs only, so the output has exact precision; recall is the standard
    LSH S-curve (1-(1-s^r)^b).
    """
    rows = num_hashes // bands
    docs = (
        df.select(id_col, shingles_expr(text_col, n).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("sig", minhash_signature_expr("sh", num_hashes))
    )
    banded = docs.select(
        id_col,
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows), b),
            )
        ).alias("band_idx", "band_hash"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            [
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = jaccard_expr(F.col("sh_a"), F.col("sh_b"))
    return cand.select(
        "id_a", "id_b", F.round(jac, 6).cast("double").alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def simhash_expr(text_col: str = "text") -> Column:
    """64-bit SimHash over whitespace tokens.

    Per bit position: sum +1/-1 across token hashes, bit set iff sum > 0.
    Nested transform/aggregate over built-ins; 64 x n_tokens codegen ops.
    """
    toks = F.array_distinct(tokens_expr(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_sums = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                h.bitwiseAND(F.call_function("shiftleft", F.lit(1).cast("long"), i)) != 0, 1
            ).otherwise(-1),
        ),
    )
    return _simhash_from_bitsums(bit_sums)


def _simhash_from_bitsums(bit_sums: Column) -> Column:
    # fold bit sums into the signature: sum of 2^i where bit_sum[i] > 0
    # shiftleft via call_function: the Python wrapper insists on int numBits,
    # the underlying SQL function accepts a column
    return F.aggregate(
        F.zip_with(
            bit_sums,
            F.sequence(F.lit(0), F.lit(63)),
            lambda s, i: F.when(
                s > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs at hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit signature into (max_hamming+1)
    chunks; any pair within distance shares an exact chunk, so candidates
    come from an equi-join on (chunk_idx, chunk_value) — no cross join.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    sigs = df.select(id_col, simhash_expr(text_col).alias("sig"))
    mask = (1 << width) - 1
    chunked = sigs.select(
        id_col,
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(chunks - 1)),
                lambda c: F.call_function("shiftrightunsigned", F.col("sig"), c * width).bitwiseAND(
                    F.lit(mask)
                ),
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    cand = (
        chunked.alias("a")
        .join(
            chunked.alias("b"),
            [
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk_val") == F.col("b.chunk_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
