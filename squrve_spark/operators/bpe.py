"""Byte-pair-encoding tokenizer: driver-trained merges, distributed encode.

The training-data pipeline's own tokenizer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
public BPE algorithm): learn a merge table from the corpus, then encode
the corpus to subword ids for token counting / packing / sequence length
budgeting.

Scale split (the same pattern as the trained quality classifier and PQ):

- **Training** runs driver-side on a bounded deterministic sample — the
  merge table is a property of the corpus distribution, and classic BPE
  training is inherently sequential in the merge index (merge k depends on
  k-1), so distributing it buys nothing at sample sizes. Word frequencies
  for the sample ARE computed by Spark (one groupBy), so training cost is
  independent of document count.
- **Encoding** is corpus-scale and embarrassingly parallel: the merge
  table broadcasts, and an Arrow-batched pandas UDF applies merges per
  word with a cache — map-only, no shuffle.

Word-internal BPE over characters with an end-of-word marker (the paper's
formulation); unknown characters fall back to themselves, so encoding is
total and decode(encode(x)) == x is exact (property-tested).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from squrve_spark.catalog import spread
from squrve_spark.operators.text import jvm_tokens, tokens_expr

EOW = "▁"  # end-of-word marker (SentencePiece's visible space)


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe_merges(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training on a word-frequency table: repeatedly merge the
    most frequent adjacent symbol pair (ties break lexicographically for
    determinism). Pure Python; cost ~ O(n_merges * distinct_words)."""
    vocab = {_word_symbols(w): f for w, f in word_freqs.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break  # nothing repeats; further merges are memorization
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order (lowest rank first) — the standard BPE
    inference loop."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def decode_tokens(tokens: Iterable[str]) -> str:
    """Inverse of encode over a whole document's subword stream."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")


def corpus_word_freqs(
    df: DataFrame, text_col: str = "text", sample_words: int | None = 50_000
) -> dict[str, int]:
    """Spark-side word-frequency table for training: explode + groupBy (one
    shuffle bounded by vocabulary), hash-ordered cap for a deterministic
    bounded driver collect. ``sample_words=None`` keeps the FULL vocabulary
    (no cap, no engine-specific hash order) — the cross-engine-replayable
    form `doc_bpe_merge_table`'s oracle requires."""
    counts = (
        spread(df.select(text_col))
        .select(F.explode(tokens_expr(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if sample_words is not None:
        counts = counts.orderBy(F.desc("n"), F.xxhash64("w")).limit(sample_words)
    return {r["w"]: r["n"] for r in counts.collect()}


def train_bpe(
    df: DataFrame, n_merges: int = 200, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Corpus -> merge table (Spark word counts + driver merges)."""
    return train_bpe_merges(corpus_word_freqs(df, text_col), n_merges)


def encode_documents(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE encode: (id, tokens array<string>, n_bpe_tokens).
    Merge table broadcasts; per-word results memoize within each Arrow
    batch (Zipf makes the cache hit rate high). Map-only, no shuffle."""
    import pandas as pd

    spark = df.sparkSession
    from squrve_spark.catalog import memo_broadcast

    bc = memo_broadcast(spark, {p: i for i, p in enumerate(merges)}, "bpe-merges")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.IntegerType()),
        ]
    )

    def batches(it):
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in it:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                # ASCII-\s+ split mirrors the JVM tokens_expr used by the
                # trainer's word counts — Python's default Unicode .split()
                # would tokenize NBSP-joined words differently from the
                # merge table's training vocabulary
                for w in jvm_tokens(text):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = encode_word(w, ranks)
                    toks.extend(cache[w])
                out.append((doc_id, toks, len(toks)))
            yield pd.DataFrame(out, columns=["doc_id", "tokens", "n_bpe_tokens"])

    return spread(df.select(id_col, text_col)).mapInPandas(batches, schema)
