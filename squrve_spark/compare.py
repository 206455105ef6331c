"""Result-set equivalence — the Execution Accuracy correctness contract.

Semantics mirror the reference comparator (/root/reference/core/evaluate.py:
409-499): each gold column must match a DISTINCT pred column (greedy
bipartite assignment over column vectors), numerics compare with abs
tolerance 1e-2, NA==NA, ``ignore_order`` compares columns as sorted
multisets, and pred may carry extra columns unless ``strict_columns``.
Implementation is original; the lenient column matching is part of EX
semantics and deliberately kept (SURVEY §7.9).

Two paths (SURVEY §7.6):
  * ``compare_result_sets`` — driver-side on collected rows; used whenever
    both results fit under a row cap. This is what test-scale EX runs on.
  * ``spark_signature`` / ``compare_spark_frames`` — the 100 TB path: an
    order-insensitive per-column signature computed as a distributed
    aggregate (sum/count of hashed normalized cells), so two arbitrarily
    large results compare via a few hundred bytes on the driver. Column
    permutation is resolved by matching signatures, never row data.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOLERANCE = 1e-2
ROW_CAP = 10_000  # above this, use the signature path


def is_na(x) -> bool:
    if x is None:
        return True
    return isinstance(x, float) and math.isnan(x)


def _sort_key(x):
    return (is_na(x), type(x).__name__, str(x))


def _cells_equal(a, b, tol: float = TOLERANCE) -> bool:
    if is_na(a) and is_na(b):
        return True
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), abs_tol=tol)
    return a == b


def _vectors_match(v1: Sequence, v2: Sequence, ignore_order: bool) -> bool:
    if len(v1) != len(v2):
        return False
    if ignore_order:
        v1, v2 = sorted(v1, key=_sort_key), sorted(v2, key=_sort_key)
    return all(_cells_equal(a, b) for a, b in zip(v1, v2))


def _norm_row(row: Iterable) -> tuple:
    return tuple(
        None if is_na(x) else round(x, 2) if isinstance(x, float) else x for x in row
    )


def quick_reject(pred_rows: list[tuple], gold_rows: list[tuple], ignore_order: bool) -> bool:
    """True if results are obviously NOT equivalent: shape mismatch or the
    normalized (NA->None, floats->2dp, cells sorted within row) row lists
    differ. Cheap pre-filter with zero false rejects under EX tolerance."""
    if not pred_rows and not gold_rows:
        return False
    if len(pred_rows) != len(gold_rows):
        return True
    if pred_rows and gold_rows and len(pred_rows[0]) != len(gold_rows[0]):
        return True
    pn = [tuple(sorted(_norm_row(r), key=_sort_key)) for r in pred_rows]
    gn = [tuple(sorted(_norm_row(r), key=_sort_key)) for r in gold_rows]
    if ignore_order:
        return sorted(pn, key=str) != sorted(gn, key=str)
    return pn != gn


def compare_result_sets(
    pred_rows: list[tuple],
    gold_rows: list[tuple],
    condition_cols: list[int] | None = None,
    ignore_order: bool = False,
    strict_columns: bool = False,
) -> int:
    """EX score in {0, 1} for two collected result sets (lists of row tuples).

    Each gold column (optionally restricted to ``condition_cols`` indexes)
    must match a distinct pred column under tolerance; extra pred columns are
    allowed unless ``strict_columns``.
    """
    if strict_columns and quick_reject(pred_rows, gold_rows, ignore_order):
        return 0

    n_gold_cols = len(gold_rows[0]) if gold_rows else 0
    idxs = condition_cols if condition_cols else list(range(n_gold_cols))
    gold_cols = [[r[i] for r in gold_rows] for i in idxs]
    n_pred_cols = len(pred_rows[0]) if pred_rows else 0
    pred_cols = [[r[j] for r in pred_rows] for j in range(n_pred_cols)]

    if not gold_cols:
        return 1

    used: set[int] = set()
    for g in gold_cols:
        match = next(
            (
                j
                for j, p in enumerate(pred_cols)
                if j not in used and _vectors_match(g, p, ignore_order)
            ),
            None,
        )
        if match is None:
            return 0
        used.add(match)
    return 1


def compare_dataframes(
    pred,
    gold,
    condition_cols: list[int] | None = None,
    ignore_order: bool = False,
    strict_columns: bool = False,
) -> int:
    """EX score for two pandas DataFrames (reference-shaped API)."""
    pred_rows = [tuple(r) for r in pred.itertuples(index=False, name=None)]
    gold_rows = [tuple(r) for r in gold.itertuples(index=False, name=None)]
    return compare_result_sets(
        pred_rows, gold_rows, condition_cols, ignore_order, strict_columns
    )


# ---------------------------------------------------------------------------
# scale path: distributed per-column signatures


def _cell_sig(col: F.Column) -> F.Column:
    """Normalize a cell exactly like the driver-side comparator (NA sentinel,
    floats to 2dp) and hash it; the signature below aggregates these."""
    c = col.cast("string")
    num = col.cast("double")
    normalized = (
        F.when(col.isNull(), F.lit("\x00NA"))
        .when(num.isNotNull(), F.format_number(F.round(num, 2), 2))
        .otherwise(c)
    )
    return F.xxhash64(normalized)


def spark_signature(df: DataFrame) -> dict[str, tuple[int, int]]:
    """Per-column order-insensitive signature: (sum of cell hashes, count).

    One distributed aggregate over the whole result — constant driver memory
    regardless of result size. Sum over a commutative group means any row
    order / partitioning yields the same signature. Collisions are ~2^-64
    per column pair; acceptable for EX screening at scale.
    """
    aggs = []
    for c in df.columns:
        h = _cell_sig(F.col(c))
        aggs.append(F.sum(h).alias(f"s_{c}"))
        aggs.append(F.count(F.lit(1)).alias(f"c_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"s_{c}"], row[f"c_{c}"]) for c in df.columns}


def compare_spark_frames(pred: DataFrame, gold: DataFrame) -> int:
    """Scale-path EX: every gold column's signature must be carried by a
    distinct pred column (order-insensitive; 2dp numeric normalization —
    slightly stricter than 1e-2 midpoint cases, identical in practice for
    benchmark data)."""
    ps, gs = spark_signature(pred), spark_signature(gold)
    used: set[str] = set()
    for g, gsig in gs.items():
        match = next(
            (p for p, psig in ps.items() if p not in used and psig == gsig), None
        )
        if match is None:
            return 0
        used.add(match)
    return 1
