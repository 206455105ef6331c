#!/usr/bin/env python3
"""Isolate-and-measure harness for single registry entries (guide §1).

Usage:
    python3 tools/isolate_bench.py NAME [NAME...] [--plan plans/r12/suffix]
    python3 tools/isolate_bench.py sim_ipq_topk --plan before

Per query: one cold pass + 3 steady passes through the noop sink (same
methodology as bench.py), printing each pass, plus an optional
``.explain("formatted")`` dump to plans/r12/<name>_<suffix>.txt. Jobs are
labelled with setJobDescription so the timeline is readable if the UI is
ever enabled. Streaming entries run the same way (their fn drains to a
batch frame).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squrve_spark.plans import REGISTRY  # noqa: E402
from squrve_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plan_suffix = None
    if "--plan" in args:
        i = args.index("--plan")
        plan_suffix = args[i + 1]
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolate-bench")
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"isolate: {name}")
        times, builds = [], []
        for i in range(4):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            builds.append(round(time.monotonic() - t0, 3))
            force(df)
            times.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = sorted(times[1:])[1]
        print(f"{name}: cold {times[0]} (build {builds[0]}) "
              f"steady {times[1:]} (build {builds[1:]}) median {med}", flush=True)
        if plan_suffix:
            out = os.path.join(plan_dir, f"{name}_{plan_suffix}.txt")
            df = fn(spark, sf_dir)
            with open(out, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"  plan -> {out}", flush=True)


if __name__ == "__main__":
    main()
