#!/usr/bin/env python3
"""Decompose a registry entry's steady cost: plan BUILD (driver/py4j) vs
EXECUTION (noop sink), per pass — guide §1 measurement for the r12
optimization round.

Usage:
    python3 tools/profile_entry.py NAME [NAME...] [--passes N]

Prints, per entry: cold(b/e), then N steady passes as build/exec pairs,
plus median steady build and exec. The sum build+exec matches bench.py's
per-pass timing (fn() + force()), so any reclaim shown here translates
1:1 into the bench artifact.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squrve_spark.plans import REGISTRY  # noqa: E402
from squrve_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-entry")
    for name in args:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile: {name}")
        rows = []
        for _ in range(1 + passes):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.monotonic()
            rows.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        spark.sparkContext.setJobDescription(None)
        sb = sorted(b for b, _ in rows[1:])[len(rows[1:]) // 2]
        se = sorted(e for _, e in rows[1:])[len(rows[1:]) // 2]
        print(
            f"{name}: cold b={rows[0][0]} e={rows[0][1]} | steady "
            + " ".join(f"b={b} e={e}" for b, e in rows[1:])
            + f" | median b={sb} e={se} total={round(sb + se, 3)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
