"""Empirical scale-growth smoke (r4 verdict #6): run the heaviest
operators at sf0.001 / sf0.01 / sf0.1 and assert runtime grows
SUB-QUADRATICALLY in data size.

The plan-shape tests (test_plan_shapes.py) prove static properties —
pushdown, broadcast, no cartesian — but can't catch an accidental
all-pairs kernel INSIDE a pandas UDF or a driver-side loop whose cost is
data-dependent. Measuring wall time across two decades of data size can:
a quadratic operator grows ~100x per decade, 10000x across the range;
an (n log n)-or-better operator stays near ~10x per decade plus fixed
overhead.

Methodology: per operator, one untimed warm-up at sf0.001 (pays codegen /
Python-worker spin-up once), then one timed run per SF, ascending. The
assertion uses the fitted growth EXPONENT over the full 100x span —
log(t_big/t_small)/log(100) — with a generous bound (1.5: quadratic is
2.0, linear is 1.0) plus an absolute floor (1.5s at sf0.1) so trivially
fast operators never flake on scheduler jitter: a sub-second query that
doubles from noise is not a scale risk.
"""

from __future__ import annotations

import math
import time

import pytest

from squrve_spark.plans import REGISTRY

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
SPAN = 100.0  # data-size ratio between the endpoints

# The heaviest registry entries by r4/r5 BENCH_DETAIL steady time, i.e. the
# ones where a hidden quadratic kernel would actually hurt at 100 TB.
HEAVIES = [
    "doc_dsir_select",
    "doc_decontaminate",
    "multimodal_jpeg_stats",
    "pipeline_curate_v2",
    "doc_lm_cross_entropy",
    "doc_quality_model",
    "doc_bpe_tokens",
    "doc_decontam_bloom",
    "dedup_components",
    "doc_bm25",
    # r5 additions (r5 verdict #6): the round's new composite heavies
    "pipeline_curate_v3",
    "graph_pagerank",
    "graph_components_emb",
    "doc_embed_search",
    "doc_source_divergence",
]

MAX_EXPONENT = 1.5  # sub-quadratic with margin (linear == 1.0)
ABS_FLOOR_S = 1.5  # below this at the LARGEST SF, growth is noise


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


@pytest.mark.parametrize("name", HEAVIES)
def test_subquadratic_growth(spark, name):
    spec = REGISTRY[name]
    _force(spec.fn(spark, SF_DIRS[0]))  # warm-up: codegen + worker pool
    times = []
    for sf_dir in SF_DIRS:
        t0 = time.monotonic()
        _force(spec.fn(spark, sf_dir))
        times.append(time.monotonic() - t0)
    t_small, t_big = times[0], times[-1]
    if t_big < ABS_FLOOR_S:
        return  # too fast for growth to be meaningful (or a scale risk)
    exponent = math.log(t_big / t_small) / math.log(SPAN)
    assert exponent < MAX_EXPONENT, (
        f"{name}: runtime grew {t_big / t_small:.1f}x over a {SPAN:.0f}x data "
        f"increase (exponent {exponent:.2f} >= {MAX_EXPONENT}) — "
        f"times per SF: {[round(t, 2) for t in times]}; suspect an all-pairs "
        "kernel or driver-side data-dependent loop"
    )
