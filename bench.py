#!/usr/bin/env python3
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall seconds.

Execution is forced with the `noop` sink (full plan runs distributed; no
driver-side collect skewing the measurement). One tiny warmup query absorbs
JVM/codegen startup so the numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from squrve_spark.plans import REGISTRY  # noqa: E402
from squrve_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("squrve-bench")

    # warmup: JVM classloading + codegen on a trivial plan
    force(REGISTRY["q_topk"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        t0 = time.monotonic()
        force(REGISTRY[name].fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_seconds_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
