"""Temporal join operators Spark SQL lacks natively: as-of join and
time-range (interval proximity) join.

Both are expressed as compositions of built-in operators chosen for their
shuffle shape (the brief's option (a) — no Python in the path):

  * **as-of join** — union the two sides, one window pass per key ordered
    by (time, side), carry the last right-side ROW forward as a struct
    (``last(struct, ignoreNulls=True)`` — struct-packed so a null VALUE in
    the nearest row is preserved, not skipped for an older non-null). ONE
    shuffle on the key, zero join fan-out — the classic log-enrichment
    shape that survives 100 TB where a naive inequality join explodes.
  * **time-range pairs** — bucket time into ``window`` -sized cells; a pair
    within ``window`` must land in the same or adjacent cell, so candidates
    come from an equi-join on (key, cell) with the right side exploded to
    (cell-1, cell, cell+1); an exact filter keeps true pairs. Equi-join
    shuffle instead of a per-key cross join.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: int | None = None,
    chunk_size: int | None = None,
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` semantics, distributed): for each
    left row, the nearest right row per key at or before (``backward``,
    default) / at or after (``forward``) / on EITHER side (``nearest``,
    r9: both carries share one sort — two frames over the same window
    ordering, no extra shuffle; distance ties take the backward match,
    pandas semantics) of its timestamp; left rows without a
    match keep NULLs. ``tolerance`` (same unit as the ts columns) nulls out
    matches farther than the bound.

    Same single-shuffle union+window plan for both directions (forward just
    reverses the window order); tolerance adds one carried column and a
    codegen'd conditional — no extra shuffle.

    Right side is first made unique per (key, ts) — deterministically, by
    descending natural column order — so ties are stable across engines.

    **Hot-key bound**: the default plan's window partitions by ``key_cols``
    alone, so ONE task sorts and scans a key's entire timeline — fine for
    event-per-user data, a straggler when one key holds a large share of
    the rows. ``chunk_size`` (same unit as the ts columns) switches to a
    two-pass plan whose per-task work is bounded by (key, time-chunk):

      1. the carry window runs per (key, chunk) — bounded partitions;
      2. a per-(key, chunk) aggregate (latest right row of each chunk — one
         row per key x chunk, tiny) gets a cumulative carry ordered by
         chunk, and rows unmatched within their own chunk take the previous
         chunks' carry via an equi-join on (key, chunk).

    Results are identical for any chunk_size (property-tested); pick it so
    a (key, chunk) slice fits a task comfortably. ``nearest`` supports
    ``chunk_size`` too (r10): one chunked plan computes both carries —
    two in-chunk sorts over one exchange plus the tiny per-chunk summary —
    then the same closer-side pick as the unchunked branch.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if chunk_size is not None and chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    # dedupe right per (key, ts): keep the lexicographically-last value row
    dedup_w = W.partitionBy(*key_cols, right_ts).orderBy(
        *[F.col(v).desc() for v in right_vals]
    )
    r = (
        right.withColumn("__rn", F.row_number().over(dedup_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    l_tagged = left.withColumn("__side", F.lit(1)).withColumn("__t", F.col(left_ts))
    null_left = [
        F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
        for c in left.columns
        if c not in key_cols
    ]
    r_tagged = r.select(
        *key_cols,
        *null_left,
        *[F.col(v).alias(f"{v}{suffix}__c") for v in right_vals],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__t"),
    )
    l_full = l_tagged.select(
        *key_cols,
        *[c for c in left.columns if c not in key_cols],
        *[F.lit(None).cast(dict(r.dtypes)[v]).alias(f"{v}{suffix}__c") for v in right_vals],
        "__side",
        "__t",
    )
    # the matched right row travels as ONE struct (non-null iff the row is a
    # right row): carrying value columns independently with
    # last(ignorenulls) would skip a nearest right row whose VALUE is null
    # and resurrect an older row's value — and tolerance must be checked
    # against the ts of the row the values actually came from
    pack = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__t").alias("__rt"),
            *[F.col(f"{v}{suffix}__c").alias(f"v{i}") for i, v in enumerate(right_vals)],
        ),
    )
    unioned = l_full.unionByName(r_tagged).withColumn("__pack", pack)
    # right rows (side 0) sort before left rows at equal ts -> inclusive
    # bound in BOTH directions (forward reverses the ts order, keeping the
    # side tie-break, so an equal-ts right row still precedes the left row)
    if direction == "nearest":
        # ONE exchange, two sorts: the backward carry over ascending
        # (__t, __side) — inclusive, so the side tie-break delivers
        # distance-0 (equal-ts) matches here — and the forward carry over
        # the REVERSED order with the same unbounded-PRECEDING last()
        # frame. Both frames are running aggregates Spark maintains
        # incrementally in O(m); the tempting single-sort alternative
        # (first() over currentRow..unboundedFollowing) re-aggregates the
        # tail per row — O(m^2) on a hot key, the straggler shape this
        # module exists to avoid (r9 review). In desc (__t, __side) order
        # an equal-ts right row sorts AFTER the left row, so the forward
        # carry correctly excludes equal ts. Distance tie -> backward,
        # pandas merge_asof semantics.
        if chunk_size is None:
            asc = W.partitionBy(*key_cols).orderBy(
                F.col("__t").asc(), F.col("__side").asc()
            )
            desc = W.partitionBy(*key_cols).orderBy(
                F.col("__t").desc(), F.col("__side").desc()
            )
            wb = asc.rowsBetween(W.unboundedPreceding, W.currentRow)
            wf = desc.rowsBetween(W.unboundedPreceding, W.currentRow)
            both = unioned.withColumn(
                "__mb", F.last("__pack", ignorenulls=True).over(wb)
            ).withColumn("__mf", F.last("__pack", ignorenulls=True).over(wf))
        else:
            # chunked NEAREST (r10, r9 verdict #7): the same (key, chunk)
            # bound as the directional chunked plan, both carries at once.
            # Big-frame work: ONE exchange on (key, chunk), two in-chunk
            # sorts (asc for the backward carry, desc for forward — same
            # tie-breaks as the unchunked branch, and equal timestamps can
            # never straddle a chunk boundary, so tie semantics are
            # untouched). Cross-chunk context rides the per-(key, chunk)
            # summary frame — one row per chunk, so its per-key cumulative
            # windows are tiny: max(pack) over preceding chunks = latest
            # earlier right row, min(pack) over following = earliest later
            # (the pack struct leads with __rt; right (key, ts) rows are
            # unique after dedup, so struct extrema ARE time extrema).
            u = unioned.withColumn(
                "__chunk", F.floor(F.col("__t") / F.lit(chunk_size)).cast("long")
            )
            asc_l = (
                W.partitionBy(*key_cols, "__chunk")
                .orderBy(F.col("__t").asc(), F.col("__side").asc())
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            desc_l = (
                W.partitionBy(*key_cols, "__chunk")
                .orderBy(F.col("__t").desc(), F.col("__side").desc())
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            local = u.withColumn(
                "__mb_loc", F.last("__pack", ignorenulls=True).over(asc_l)
            ).withColumn(
                "__mf_loc", F.last("__pack", ignorenulls=True).over(desc_l)
            )
            summary = u.groupBy(*key_cols, "__chunk").agg(
                F.max("__pack").alias("__cmax"), F.min("__pack").alias("__cmin")
            )
            cw = W.partitionBy(*key_cols).orderBy(F.col("__chunk").asc())
            prev = summary.select(
                *key_cols,
                "__chunk",
                F.max("__cmax")
                .over(cw.rowsBetween(W.unboundedPreceding, -1))
                .alias("__b_cross"),
                F.min("__cmin")
                .over(cw.rowsBetween(1, W.unboundedFollowing))
                .alias("__f_cross"),
            )
            both = (
                local.join(prev, [*key_cols, "__chunk"], "left")
                .withColumn("__mb", F.coalesce("__mb_loc", "__b_cross"))
                .withColumn("__mf", F.coalesce("__mf_loc", "__f_cross"))
            )
        db = F.col("__t") - F.col("__mb.__rt")
        df_ = F.col("__mf.__rt") - F.col("__t")
        pick = (
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(db <= df_, F.col("__mb"))
            .otherwise(F.col("__mf"))
        )
        carried = both.withColumn("__m", pick)
    elif chunk_size is None:
        order = [F.col("__t").asc() if direction == "backward"
                 else F.col("__t").desc(), F.col("__side").asc()]
        w = (
            W.partitionBy(*key_cols)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = unioned.withColumn("__m", F.last("__pack", ignorenulls=True).over(w))
    else:
        order = [F.col("__t").asc() if direction == "backward"
                 else F.col("__t").desc(), F.col("__side").asc()]
        backward = direction == "backward"
        u = unioned.withColumn(
            "__chunk", F.floor(F.col("__t") / F.lit(chunk_size)).cast("long")
        )
        w_local = (
            W.partitionBy(*key_cols, "__chunk")
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        local = u.withColumn("__m_loc", F.last("__pack", ignorenulls=True).over(w_local))
        # chunk summary: one row per (key, chunk). The pack struct leads
        # with __rt, so max/min of the struct IS the latest/earliest right
        # row of the chunk (right (key, ts) rows are unique after dedup).
        ext = F.max("__pack") if backward else F.min("__pack")
        summary = u.groupBy(*key_cols, "__chunk").agg(ext.alias("__cp"))
        cum_w = W.partitionBy(*key_cols).orderBy(F.col("__chunk").asc())
        cum_w = (
            cum_w.rowsBetween(W.unboundedPreceding, -1)
            if backward
            else cum_w.rowsBetween(1, W.unboundedFollowing)
        )
        cum = (F.max if backward else F.min)("__cp").over(cum_w)
        prev = summary.select(
            *key_cols, "__chunk", cum.alias("__m_cross")
        )
        carried = (
            local.join(prev, [*key_cols, "__chunk"], "left")
            .withColumn("__m", F.coalesce("__m_loc", "__m_cross"))
        )
    matched = F.col("__m").isNotNull()
    if tolerance is not None:
        matched = matched & (
            F.abs(F.col("__t") - F.col("__m.__rt")) <= F.lit(tolerance)
        )
    out_vals = [
        F.when(matched, F.col(f"__m.v{i}")).alias(f"{v}{suffix}")
        for i, v in enumerate(right_vals)
    ]
    return carried.filter(F.col("__side") == 1).select(*left.columns, *out_vals)


def time_range_pairs(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    window: int,
    n_salts: Optional[int] = None,
) -> DataFrame:
    """Unordered pairs (id_a < id_b) of rows with the same key whose
    timestamps differ by at most ``window`` (same time unit as ``ts_col``).

    Cell blocking: a qualifying pair spans at most one cell boundary, so
    joining a's cell against b's {cell-1, cell, cell+1} (exploded) finds
    every candidate. The three exploded values are distinct, so a given
    (a, b) row pair matches on at most ONE of them — the output is
    duplicate-free by construction, no distinct pass (= no second shuffle)
    needed.

    Skew guard (``n_salts``): at scale a hot user concentrates one
    (key, cell) in a single shuffle task. With ``n_salts`` set, side a takes
    a uniform pseudo-random salt and side b replicates across all salts
    (salt joins the shuffle key), spreading the hot key's candidate
    generation over ``n_salts`` tasks. Each (a, b) candidate still appears
    exactly once — a's salt is single-valued — so the result is identical;
    the cost is b's shuffle volume x ``n_salts`` (standard replicate-one-
    side salting; worth it exactly when a key is hot enough to straggle).
    """
    from squrve_spark.operators.scale import _salt_col

    cell = (F.col(ts_col) / F.lit(window)).cast("long")
    a = df.select(
        *key_cols, F.col(id_col).alias("id_a"), F.col(ts_col).alias("ts_a"),
        cell.alias("cell"),
    )
    b = df.select(
        *key_cols, F.col(id_col).alias("id_b"), F.col(ts_col).alias("ts_b"),
        F.explode(F.array(cell - 1, cell, cell + 1)).alias("cell"),
    )
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in key_cols]
    cond += [F.col("a.cell") == F.col("b.cell"), F.col("a.id_a") < F.col("b.id_b")]
    if n_salts is not None:
        a = a.withColumn("__salt", _salt_col(n_salts))
        b = b.withColumn(
            "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
        )
        cond.append(F.col("a.__salt") == F.col("b.__salt"))
    pairs = (
        a.alias("a")
        .join(b.alias("b"), cond)
        .filter(F.abs(F.col("a.ts_a") - F.col("b.ts_b")) <= window)
        .select(
            *[F.col(f"a.{c}") for c in key_cols],
            "id_a",
            "id_b",
            (F.col("b.ts_b") - F.col("a.ts_a")).alias("dt"),
        )
    )
    return pairs
