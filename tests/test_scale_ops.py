"""Scale utilities: bucketed joins are exchange-free, salted joins/aggs
exactly match their unsalted equivalents."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators.scale import (
    bucketed_join,
    salted_join,
    two_phase_agg,
    write_bucketed_table,
)
from tests.conftest import SF_MED, SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _drop_table(spark, name):
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")
    _drop_table(spark, "b_orders")
    _drop_table(spark, "b_customer")
    write_bucketed_table(
        orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", ["custkey"], 8,
        sort_cols=["custkey"],
    )
    write_bucketed_table(
        customer.withColumnRenamed("c_custkey", "custkey"), "b_customer", ["custkey"], 8,
        sort_cols=["custkey"],
    )
    # force sort-merge (tiny test tables would broadcast) to show the
    # co-location property: a SMJ over same-bucketed tables needs NO shuffle
    joined = spark.table("b_orders").hint("merge").join(
        spark.table("b_customer"), ["custkey"]
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucket co-location
    assert joined.count() == orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    _drop_table(spark, "b_orders")
    _drop_table(spark, "b_customer")


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        ["k"],
        n_salts=4,
    ).agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    assert salted.collect() == plain.collect()


def test_salted_join_rejects_right_outer(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select(F.col("l_orderkey").alias("k"))
    o = load_table(spark, SF_SMALL, "orders").select(F.col("o_orderkey").alias("k"))
    # right/full outer would emit each unmatched small-side row once per salt
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(li, o, ["k"], n_salts=4, how=how)


def test_save_path_exports_full_result(spark, tmp_path):
    """save_path must bypass the row cap: full chunked CSV export."""
    import pandas as pd

    from squrve_spark.catalog import register_tables
    from squrve_spark.execution import get_spark_sql_result

    register_tables(spark, SF_SMALL, ["orders"])
    n_total = spark.table("orders").count()
    out = tmp_path / "export.csv"
    res, err = get_spark_sql_result(
        "SELECT o_orderkey, o_totalprice FROM orders",
        spark,
        save_path=out,
        row_cap=10,  # far below n_total: the cap must NOT truncate the file
        chunk_size=64,
    )
    assert err is None and res is True
    exported = pd.read_csv(out)
    assert len(exported) == n_total
    assert list(exported.columns) == ["o_orderkey", "o_totalprice"]


def test_two_phase_agg_matches_plain(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    plain = {
        (r["l_returnflag"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("s"),
            F.count("l_quantity").alias("c"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    two = two_phase_agg(
        li, ["l_returnflag"],
        {"l_quantity": "sum"} | {},
        n_salts=4,
    )
    # separate calls per aggregate type to exercise all branches
    got_sum = {
        r["l_returnflag"]: round(r["sum_l_quantity"], 2) for r in two.collect()
    }
    for key, (s, _c, _mn, _mx) in plain.items():
        assert got_sum[key] == s
    counts = two_phase_agg(li, ["l_returnflag"], {"l_quantity": "count"}, 4)
    got_c = {r["l_returnflag"]: r["count_l_quantity"] for r in counts.collect()}
    mins = two_phase_agg(li, ["l_returnflag"], {"l_quantity": "min"}, 4)
    got_mn = {r["l_returnflag"]: r["min_l_quantity"] for r in mins.collect()}
    for key, (_s, c, mn, _mx) in plain.items():
        assert got_c[key] == c and got_mn[key] == mn


def test_two_phase_agg_rejects_nonalgebraic(spark):
    import pytest

    li = load_table(spark, SF_SMALL, "lineitem")
    with pytest.raises(ValueError):
        two_phase_agg(li, ["l_returnflag"], {"l_quantity": "median"})


def test_write_range_clustered_bands_are_disjoint(spark, tmp_path):
    """Each output file must cover a narrow, non-overlapping band of the
    cluster key — the property parquet min/max skipping relies on."""
    from squrve_spark.operators.scale import write_range_clustered

    path = str(tmp_path / "clustered")
    df = spark.range(0, 20000).withColumn("k", (F.col("id") * 7919) % 20000)
    write_range_clustered(df, path, ["k"], n_files=8)
    back = spark.read.parquet(path)
    bands = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert len(bands) >= 4  # range partitioner used several files
    spans = sorted((r["lo"], r["hi"]) for r in bands)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint bands
    assert sum(r["n"] for r in bands) == 20000
    # a narrow range predicate is pushed to the scan
    q = back.filter((F.col("k") >= 100) & (F.col("k") < 200))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,100)" in plan


def test_zordered_write_skips_on_both_columns(spark, tmp_path):
    """Z-ordered files must cover narrow min/max bands in BOTH columns
    (parquet stats then prune either predicate), while 1-D range clustering
    only narrows its leading key; and the write must lose no rows."""
    import glob as globmod

    from squrve_spark.catalog import load_table
    from squrve_spark.operators.scale import write_range_clustered, write_zordered
    from tests.conftest import SF_MED

    ev = load_table(spark, SF_MED, "events").select("event_id", "user_id", "value")

    def coverage(path, col):
        """Mean per-file fraction of the column's global range covered."""
        files = sorted(globmod.glob(f"{path}/part-*.parquet"))
        assert len(files) > 4  # multi-file layout or the test is vacuous
        lo = float(ev.agg({col: "min"}).first()[0])
        hi = float(ev.agg({col: "max"}).first()[0])
        fracs = []
        for f in files:
            r = spark.read.parquet(f).agg(
                F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
            ).first()
            fracs.append((float(r[1]) - float(r[0])) / (hi - lo))
        return sum(fracs) / len(fracs)

    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(ev, zpath, "user_id", "value", n_files=16)
    write_range_clustered(ev, rpath, ["user_id"], n_files=16)

    assert spark.read.parquet(zpath).count() == ev.count()  # lossless
    z_user, z_val = coverage(zpath, "user_id"), coverage(zpath, "value")
    r_user, r_val = coverage(rpath, "user_id"), coverage(rpath, "value")
    # 1-D clustering: leading key narrow; second column essentially
    # unclustered (long-tailed `value` keeps per-file max below the global
    # max, so ~0.67 on the fixture rather than 1.0)
    assert r_user < 0.25 and r_val > 0.5, (r_user, r_val)
    # z-order: BOTH columns materially narrowed
    assert z_user < 0.6 and z_val < 0.6, (z_user, z_val)
    assert z_val < r_val / 1.5  # and the second column beats 1-D clearly


def test_global_offset_matches_single_task_window(spark):
    """The two-phase distributed cumsum must equal the textbook global
    window exactly, for several partition counts (including n_parts larger
    than the row count, which leaves empty partitions)."""
    from pyspark.sql import Window

    from squrve_spark.operators.scale import with_global_offset

    rows = [(i, (i * 7919) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    expect = {
        r["k"]: r["o"]
        for r in df.withColumn(
            "o", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    for n_parts in (1, 7, 32, 1000):
        got = {
            r["k"]: r["offset"]
            for r in with_global_offset(df, ["k"], "v", n_parts=n_parts).collect()
        }
        assert got == expect, n_parts


def test_skew_aware_join_salts_on_skew_plain_on_uniform(spark):
    """skew_aware_join (r8, r7 verdict #5): the profile-and-decide lever.
    On a skewed fixture (one key = half the big side) the salted path must
    FIRE and still match the plain join row-for-row; on a uniform fixture
    it must NOT fire and the plan is the untouched equi-join."""
    from squrve_spark.operators.scale import skew_aware_join

    # skewed: key 0 holds 5000 of 10000 rows over 101 keys
    skewed = spark.createDataFrame(
        [(0 if i < 5000 else (i % 100) + 1, float(i)) for i in range(10000)],
        "k long, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(101)], "k long, label string"
    )
    out, dec = skew_aware_join(skewed, dim, ["k"], return_decision=True)
    assert dec["salted"] and dec["n_salts"] > 0
    assert dec["max_share_pct"] > 40.0
    plain = skewed.join(dim, ["k"])
    agg = lambda d: d.groupBy("k").agg(  # noqa: E731
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")
    ).collect()
    assert sorted(map(tuple, agg(out))) == sorted(map(tuple, agg(plain)))
    # the salted plan really is the salted shape
    assert "__salt" in out._jdf.queryExecution().analyzed().toString()

    # uniform: every key appears ~100x; ratio ~1 -> no salt
    uniform = spark.createDataFrame(
        [(i % 100, float(i)) for i in range(10000)], "k long, v double"
    )
    out_u, dec_u = skew_aware_join(uniform, dim, ["k"], return_decision=True)
    assert not dec_u["salted"] and dec_u["n_salts"] == 0
    assert "__salt" not in out_u._jdf.queryExecution().analyzed().toString()
    assert sorted(map(tuple, agg(out_u))) == sorted(
        map(tuple, agg(uniform.join(dim, ["k"])))
    )

    # left joins ride the same contract (salted_join's supported set)
    out_l = skew_aware_join(skewed, dim.filter("k < 50"), ["k"], how="left")
    plain_l = skewed.join(dim.filter("k < 50"), ["k"], "left")
    assert out_l.count() == plain_l.count() == skewed.count()

    # null keys are profiled out, never joined twice
    with_nulls = skewed.withColumn(
        "k", F.when(F.col("v") < 3.0, None).otherwise(F.col("k"))
    )
    out_n, dec_n = skew_aware_join(with_nulls, dim, ["k"], return_decision=True)
    assert dec_n["salted"]
    assert out_n.count() == with_nulls.join(dim, ["k"]).count()


def test_skew_aware_join_backtick_columns(spark):
    """r8 ADVICE regression: a join column needing backticks (reserved
    word, dot, space) must profile exactly like it joins — the null-key
    filter is built with the Column API, not interpolated SQL."""
    from squrve_spark.operators.scale import skew_aware_join

    weird = "order key"  # space: F.expr(f"{c} IS NOT NULL") would parse-fail
    big = (
        spark.range(400)
        .select((F.col("id") % 4).alias("k"), F.col("id").alias("v"))
        .withColumnRenamed("k", weird)
    )
    dim = spark.range(4).select(F.col("id").alias("kk"), F.lit("d").alias("tag"))
    dim = dim.withColumnRenamed("kk", weird)
    out, dec = skew_aware_join(big, dim, [weird], return_decision=True)
    assert out.count() == 400
    assert dec["salt_supported"]


def test_curate_v8_every_stage_bites(spark):
    """pipeline_curate_v8's three stages must each change the pool at
    sf0.01 — a stage that passes everything through is a silent no-op
    masquerading as coverage."""
    from squrve_spark.catalog import load_table
    from squrve_spark.operators import dedup
    from squrve_spark.operators.dedup import _pair_intersections
    from squrve_spark.plans import REGISTRY

    sf = SF_MED
    docs = load_table(spark, sf, "documents")
    n_raw = docs.count()
    deduped = docs.join(
        dedup.exact_dedup_groups(docs).select(F.col("keep_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    ).select("doc_id", "text", "lang")
    n_dedup = deduped.count()
    # the sf0.01 fixture plants NEAR-dups but no byte-identical ones, so
    # exact dedup is an identity here (doc_exact_dedup's own oracle
    # covers the biting case); the composite's teeth are stages 2 and 3
    assert n_dedup <= n_raw
    inter = _pair_intersections(deduped, [], 3, "text", "doc_id", None)
    n_contained = (
        inter.filter(F.col("inter") * 10 >= F.col("sz_a") * 9).count()
        + inter.filter(F.col("inter") * 10 >= F.col("sz_b") * 9).count()
    )
    assert n_contained > 0  # planted near-dup passages survive exact dedup
    out = REGISTRY["pipeline_curate_v8"].fn(spark, sf)
    rows = out.collect()
    assert rows
    # UniMax bit: at least one language's allocation is BELOW its corpus
    # (the water level formed), and selected tokens never exceed alloc
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    # the water level formed: at least one language's allocation sits
    # strictly below its full (kept) corpus token count
    kept_docs = deduped.join(
        inter.filter((F.col("inter") * 10 >= F.col("sz_a") * 9)
                     & ((F.col("sz_b") > F.col("sz_a"))
                        | ((F.col("sz_b") == F.col("sz_a"))
                           & (F.col("id_b") < F.col("id_a")))))
        .select(F.col("id_a").alias("doc_id"))
        .union(inter.filter((F.col("inter") * 10 >= F.col("sz_b") * 9)
                            & ((F.col("sz_a") > F.col("sz_b"))
                               | ((F.col("sz_a") == F.col("sz_b"))
                                  & (F.col("id_a") < F.col("id_b")))))
               .select(F.col("id_b").alias("doc_id"))).distinct(),
        "doc_id", "left_anti",
    )
    assert kept_docs.count() < n_dedup  # containment prune bit
    from squrve_spark.operators.text import tokens_expr

    lang_tok = {
        r["lang"]: r["tot"]
        for r in kept_docs.groupBy("lang")
        .agg(F.sum(F.size(tokens_expr("text"))).alias("tot"))
        .collect()
    }
    assert any(
        v[0]["alloc_tokens"] < lang_tok[lang] for lang, v in by_lang.items()
    )
    total_sel = sum(r["n_tokens"] for r in rows)
    assert total_sel <= 15000
    for v in by_lang.values():
        assert max(x["cum_tokens"] for x in v) <= v[0]["alloc_tokens"]
