#!/usr/bin/env python3
"""Core-count scaling sweep over the heavy registry entries (r13, r12
verdict task 3).

At sf0.1 every entry is sub-3 s and scheduler/driver overhead dominates,
so 8-core vs 32-core ratios carry no signal (the r12 driver measured the
whole bench FASTER at local[8]). This sweep runs the heavy entries on the
derived 10x fixture (tools/make_scaling_fixture.py) where executor work
dominates, at whatever $SPARK_GRAFT_CPUS says — run it once per core
count and compare.

Usage:
    SPARK_GRAFT_CPUS=8  python tools/scaling_sweep.py /root/testdata_sf1 > sweep8.json
    SPARK_GRAFT_CPUS=32 python tools/scaling_sweep.py /root/testdata_sf1 > sweep32.json

Per entry: one untimed cold pass (codegen/worker spin-up), then three
timed noop-sink passes; prints one JSON object {name: median_sec} plus a
per-pass detail map.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squrve_spark.plans import REGISTRY  # noqa: E402
from squrve_spark.session import get_spark  # noqa: E402

HEAVIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "dedup_ppjoin_pairs",
    "dedup_similarity_join",
    "dedup_simhash",
    "doc_line_dedup",
    "doc_segment_dedup",
    "doc_hybrid_search",
    "doc_lm_cross_entropy",
    "doc_bpe_tokens",
    "doc_ngram_repetition",
    "multimodal_jpeg_stats",
    "pipeline_curate_v3",
    "emb_neardup_lsh",
    "sim_recall_audit",
    "stream_neardup",
    "stream_scd2",
    "stream_merge_apply",
    "stream_lm_ppl_monitor",
    "stream_attribution",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_sf1"
    names = sys.argv[2:] or HEAVIES
    spark = get_spark("scaling-sweep")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    detail: dict[str, list[float]] = {}
    med: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"scaling:{name}")
        try:
            t0 = time.monotonic()
            force(fn(spark, sf_dir))  # cold/warm-up, untimed
            cold = time.monotonic() - t0
            if cold > 150:
                # regime blow-up on the derived fixture (e.g. a warm-vocab
                # pair generator going quadratic): record the cold pass
                # only, don't burn the sweep budget on steady passes
                detail[name] = [round(cold, 3)]
                med[name] = round(cold, 3)
                print(f"# {name}: cold {cold:.0f}s > 150s, steady skipped",
                      file=sys.stderr)
                continue
            ts = []
            for _ in range(3):
                t0 = time.monotonic()
                force(fn(spark, sf_dir))
                ts.append(round(time.monotonic() - t0, 3))
            detail[name] = ts
            med[name] = sorted(ts)[1]
        except Exception as exc:  # noqa: BLE001 — record and continue
            detail[name] = []
            med[name] = None
            print(f"# {name} ERROR: {type(exc).__name__}: {exc}"[:300],
                  file=sys.stderr)
    print(json.dumps({"cpus": int(cpus), "sf_dir": sf_dir,
                      "median": med, "passes": detail}))


if __name__ == "__main__":
    main()
