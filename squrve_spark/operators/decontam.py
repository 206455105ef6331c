"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation set.

The standard pre-training hygiene step (the reference's data-prep stage has
no analog — this is part of the engine's LLM-pipeline extension surface,
like the dedup family it shares machinery with): a training document is
contaminated when it shares verbatim n-grams with a benchmark/eval document.
Expressed Spark-first:

* both sides reuse ``with_hashed_shingles`` — shingles are xxhash64 longs,
  never strings, so the overlap join is a long equi-join;
* the eval side is DISTINCT shingles only — benchmark suites are tiny
  relative to a 100 TB corpus, so it broadcasts (flag to disable when an
  eval set is genuinely huge);
* the overlap is a broadcast LEFT SEMI join (map-side, zero shuffle of the
  corpus) followed by one groupBy on doc id — the only shuffle, keyed the
  same as every other per-doc aggregate in the pipeline.

Fixture calibration: TESTDATA documents are vocabulary-soup, so n=3 grams
collide incidentally (~85% of docs share one); n=4 separates planted
duplicated passages (33-77 shared grams) from noise (0-2) — the registry
query uses n=4 with a min_hits threshold between those bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from squrve_spark.operators.dedup import with_hashed_shingles


def contamination_scores(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document overlap with the eval set: (id, n_shingles, n_hits).

    Documents shorter than n tokens carry no shingles and are dropped (they
    cannot be contaminated under this definition).
    """
    train = with_hashed_shingles(docs, text_col=text_col, n=n).select(
        F.col(id_col), F.size("sh").alias("n_shingles"), F.explode("sh").alias("sh")
    )
    ev = (
        with_hashed_shingles(eval_docs, text_col=text_col, n=n)
        .select(F.explode("sh").alias("sh"))
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = train.join(ev, on="sh", how="left_semi")
    per_doc = hits.groupBy(id_col, "n_shingles").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    all_docs = train.select(id_col, "n_shingles").distinct()
    return (
        all_docs.join(per_doc.select(id_col, "n_hits"), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training corpus minus documents with >= min_hits shared n-grams.

    Anti-join against the contaminated id set (pair-scale, not
    corpus-scale); documents too short to shingle are KEPT (no evidence of
    contamination)."""
    scores = contamination_scores(
        docs, eval_docs, n=n, text_col=text_col, id_col=id_col,
        broadcast_eval=broadcast_eval,
    )
    bad = scores.filter(F.col("n_hits") >= min_hits).select(id_col)
    return docs.join(bad, on=id_col, how="left_anti")
