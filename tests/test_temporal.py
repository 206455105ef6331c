"""Temporal join operators: as-of semantics and range-pair completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from squrve_spark.operators import temporal


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 10, "m1")],
        "k int, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 10, 200), (1, 15, 300), (3, 1, 999)],
        "k int, t long, rv int",
    )
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"])
    got = {(r["k"], r["t"]): r["rv_r"] for r in out.collect()}
    assert got[(1, 5)] is None  # no right row at or before t=5
    assert got[(1, 10)] == 200  # inclusive: right at t=10 wins over t=8
    assert got[(1, 20)] == 300  # latest prior
    assert got[(2, 10)] is None  # key with no right rows
    assert len(got) == 4  # left join: every left row survives


def test_asof_join_tie_determinism(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k int, t long, lv string")
    right = spark.createDataFrame(
        [(1, 10, 5), (1, 10, 9)], "k int, t long, rv int"
    )
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"])
    assert out.collect()[0]["rv_r"] == 9  # dedupe keeps the max value row


def test_time_range_pairs_exact(spark):
    df = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 100), (3, 140, 100), (4, 260, 100), (5, 0, 200)],
        "id long, t long, k int",
    )
    out = temporal.time_range_pairs(df, ["k"], "t", "id", window=100)
    rows = out.collect()
    pairs = {(r["id_a"], r["id_b"]): r["dt"] for r in rows}
    # |0-50|<=100, |50-140|<=100; |0-140|>100, |140-260|>100; key 200 isolated
    assert pairs == {(1, 2): 50, (2, 3): 90}
    assert len(rows) == len(pairs)  # duplicate-free without a distinct pass


def test_time_range_pairs_salted_equals_unsalted(spark):
    """Skew guard: salting must not change the pair set — only spread the
    hot (key, cell) across tasks. Uses a skewed input (one hot key)."""
    rows = [(i, (i * 13) % 500, 1) for i in range(400)]  # hot key 1
    rows += [(1000 + i, i * 40, 2) for i in range(50)]  # normal key 2
    df = spark.createDataFrame(rows, "id long, t long, k int")
    plain = temporal.time_range_pairs(df, ["k"], "t", "id", window=60)
    salted = temporal.time_range_pairs(df, ["k"], "t", "id", window=60, n_salts=4)
    key = lambda r: (r["k"], r["id_a"], r["id_b"], r["dt"])  # noqa: E731
    p, s = sorted(map(key, plain.collect())), sorted(map(key, salted.collect()))
    assert p == s and len(p) > 0
    # the salt must be part of the shuffle key (the whole point)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan and "hashpartitioning" in plan


def test_asof_join_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 99, "l3")], "k int, t long, lv string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 200), (1, 30, 300)], "k int, t long, rv int"
    )
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"], direction="forward")
    got = {r["t"]: r["rv_r"] for r in out.collect()}
    assert got[10] == 100  # inclusive: equal ts matches
    assert got[20] == 300  # earliest right at or after 20
    assert got[99] is None  # nothing after


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, 100, "x"), (1, 500, "y")], "k int, t long, lv string")
    right = spark.createDataFrame([(1, 90, 7)], "k int, t long, rv int")
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"], tolerance=50)
    got = {r["t"]: r["rv_r"] for r in out.collect()}
    assert got[100] == 7      # |100-90| <= 50
    assert got[500] is None   # beyond tolerance -> nulled
    # unbounded still matches both
    out2 = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"])
    assert {r["t"]: r["rv_r"] for r in out2.collect()} == {100: 7, 500: 7}


def test_asof_join_pandas_merge_asof_parity(spark):
    """Randomized parity against pandas.merge_asof (both directions)."""
    import pandas as pd

    rng = __import__("random").Random(7)
    lrows = [(k, rng.randrange(0, 1000)) for k in (1, 2) for _ in range(40)]
    rrows = [(k, rng.randrange(0, 1000), rng.randrange(100)) for k in (1, 2, 3) for _ in range(25)]
    # unique right (key, ts) to make semantics well-defined for comparison
    seen = set(); rrows = [r for r in rrows if not (r[:2] in seen or seen.add(r[:2]))]
    left = spark.createDataFrame(lrows, "k int, t long")
    right = spark.createDataFrame(rrows, "k int, t long, rv int")
    for direction in ("backward", "forward"):
        got = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"], direction=direction)
        gsort = sorted(((r["k"], r["t"], r["rv_r"]) for r in got.collect()),
                       key=lambda x: (x[0], x[1], -1 if x[2] is None else x[2]))
        lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t")
        rp = pd.DataFrame(rrows, columns=["k", "t", "rv"]).sort_values("t")
        want = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
        wsort = sorted(
            ((int(r.k), int(r.t), None if pd.isna(r.rv) else int(r.rv))
             for r in want.itertuples()),
            key=lambda x: (x[0], x[1], -1 if x[2] is None else x[2]))
        assert gsort == wsort, direction


def test_asof_join_null_value_in_nearest_row_is_preserved(spark):
    """The nearest right row wins even when its value is NULL — carrying
    values independently would resurrect an older non-null value (and leak
    it past the tolerance bound)."""
    left = spark.createDataFrame([(1, 12, "x")], "k int, t long, lv string")
    right = spark.createDataFrame(
        [(1, 1, 5), (1, 10, None)], "k int, t long, rv int"
    )
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"])
    assert out.collect()[0]["rv_r"] is None  # nearest row (t=10) has NULL rv
    out_tol = temporal.asof_join(left, right, ["k"], "t", "t", ["rv"], tolerance=5)
    assert out_tol.collect()[0]["rv_r"] is None  # and never rv=5 from t=1


def test_asof_join_chunked_equals_unchunked(spark):
    """Hot-key scale path: the two-pass (key, chunk)-bounded plan must be
    result-identical to the single-window plan for every direction x
    tolerance x chunk_size combination, on randomized skewed data (one hot
    key owning most rows, boundary-straddling timestamps, chunks with no
    right rows)."""
    import random

    rng = random.Random(41)
    lrows, rrows = [], []
    for i in range(300):
        k = 1 if rng.random() < 0.8 else rng.randint(2, 4)  # hot key 1
        lrows.append((k, rng.randint(0, 400)))
    seen = set()
    for i in range(120):
        k = 1 if rng.random() < 0.8 else rng.randint(2, 5)
        t = rng.randint(0, 400)
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((k, t, rng.randint(0, 999)))
    left = spark.createDataFrame(lrows, "k int, t long")
    right = spark.createDataFrame(rrows, "k int, t long, rv int")

    def norm(df):
        return sorted(
            ((r["k"], r["t"], r["rv_r"]) for r in df.collect()),
            key=lambda x: (x[0], x[1], -1 if x[2] is None else x[2]),
        )

    for direction in ("backward", "forward", "nearest"):
        for tolerance in (None, 25):
            base = norm(temporal.asof_join(
                left, right, ["k"], "t", "t", ["rv"],
                direction=direction, tolerance=tolerance,
            ))
            for chunk in (1, 37, 100, 10_000):  # sub-unit .. everything-in-one
                got = norm(temporal.asof_join(
                    left, right, ["k"], "t", "t", ["rv"],
                    direction=direction, tolerance=tolerance, chunk_size=chunk,
                ))
                assert got == base, (direction, tolerance, chunk)


def test_asof_join_chunked_rejects_bad_chunk():
    import pytest

    with pytest.raises(ValueError):
        temporal.asof_join(None, None, ["k"], "t", "t", ["rv"], chunk_size=0)


def test_asof_nearest_matches_pandas(spark):
    """r9: direction='nearest' — cross-checked against pandas merge_asof
    (the semantics contract), including the distance-tie -> backward rule
    and the tolerance bound on the PICKED side."""
    import pandas as pd

    from squrve_spark.operators.temporal import asof_join

    lrows = [(i, 1, t) for i, t in enumerate([5, 10, 14, 15, 30, 100])]
    rrows = [(1, 8, 80), (1, 12, 120), (1, 20, 200), (1, 40, 400)]
    left = spark.createDataFrame(lrows, "id long, k long, t long")
    right = spark.createDataFrame(rrows, "k long, rt long, v long")
    out = {
        r["id"]: (r["v_r"], r["rt_r"])
        for r in asof_join(
            left, right, ["k"], "t", "rt", ["v", "rt"],
            direction="nearest",
        ).collect()
    }
    lp = pd.DataFrame(lrows, columns=["id", "k", "t"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["k", "rt", "v"]).sort_values("rt")
    ref = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k", direction="nearest"
    ).set_index("id")
    for i in ref.index:
        want = (None, None) if pd.isna(ref.loc[i, "v"]) else (
            int(ref.loc[i, "v"]), int(ref.loc[i, "rt"])
        )
        assert out[i] == want, (i, out[i], want)
    # t=10: dist 2 both sides (8 vs 12) -> backward (80), like pandas
    assert out[1] == (80, 8)
    # tolerance nulls a pick farther than the bound (t=100: nearest is 40
    # at distance 60 > 15)
    out_tol = {
        r["id"]: r["v_r"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", ["v"],
            direction="nearest", tolerance=15,
        ).collect()
    }
    assert out_tol[5] is None and out_tol[0] == 80
    # r10: chunked nearest (bounded per-task hot-key path) is result-
    # identical on this pandas-checked fixture, including the distance-tie
    # -> backward rule across a chunk boundary (t=10 vs right 8/12 with
    # chunk 10 puts the backward match in the previous chunk)
    out_chunked = {
        r["id"]: (r["v_r"], r["rt_r"])
        for r in asof_join(
            left, right, ["k"], "t", "rt", ["v", "rt"],
            direction="nearest", chunk_size=10,
        ).collect()
    }
    assert out_chunked == out
