#!/usr/bin/env python3
"""A/B the state-store partition count for the stateful streaming entries
(guide §2 scale-adaptive partitioning): each entry's registry fn runs with
STREAM_SHUFFLE_PARTITIONS patched to each candidate value, interleaved
(A,B,A,B,...) so host drift cancels, timing fn()+noop per pass.

Usage: python tools/stream_parts_ab.py stream_scd2 stream_merge_apply -- 8 32
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squrve_spark.plans import REGISTRY  # noqa: E402
from squrve_spark.session import get_spark  # noqa: E402
from squrve_spark.streaming import ops  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sep = args.index("--")
    names, parts = args[:sep], [int(x) for x in args[sep + 1 :]]
    rounds = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-parts-ab")
    orig = ops.STREAM_SHUFFLE_PARTITIONS
    for name in names:
        fn = REGISTRY[name].fn
        # one warm pass (python worker pool, codegen) before timing
        ops.STREAM_SHUFFLE_PARTITIONS = orig
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings: dict[int, list[float]] = {p: [] for p in parts}
        for _ in range(rounds):
            for p in parts:
                ops.STREAM_SHUFFLE_PARTITIONS = p
                t0 = time.monotonic()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                timings[p].append(round(time.monotonic() - t0, 3))
        ops.STREAM_SHUFFLE_PARTITIONS = orig
        for p in parts:
            med = sorted(timings[p])[rounds // 2]
            print(f"{name} parts={p}: {timings[p]} median {med}", flush=True)


if __name__ == "__main__":
    main()
