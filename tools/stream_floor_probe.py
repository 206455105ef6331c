#!/usr/bin/env python3
"""Decompose the stateful-drain floor (r13, r12 verdict task 2).

For each named streaming entry: run the drain with combinations of
 state-store provider (hdfs | rocksdb | rocksdb+changelog) and report the
per-micro-batch durationMs breakdown Spark itself records
(addBatch / walCommit / stateStore commit etc.), plus wall time —
interleaved A/B/A/B so host drift cancels.

Usage:
    python tools/stream_floor_probe.py stream_scd2 stream_dedup -- hdfs rocksdb
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squrve_spark.plans import REGISTRY  # noqa: E402
from squrve_spark.session import get_spark  # noqa: E402

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")
CHANGELOG = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
PROVIDER = "spark.sql.streaming.stateStore.providerClass"


def apply_variant(spark, variant: str) -> None:
    if variant == "hdfs":
        spark.conf.set(PROVIDER, HDFS)
        spark.conf.set(CHANGELOG, "false")
    elif variant == "rocksdb":
        spark.conf.set(PROVIDER, ROCKSDB)
        spark.conf.set(CHANGELOG, "false")
    elif variant == "rocksdb_cl":
        spark.conf.set(PROVIDER, ROCKSDB)
        spark.conf.set(CHANGELOG, "true")
    else:
        raise SystemExit(f"unknown variant {variant}")


def main() -> None:
    args = sys.argv[1:]
    sep = args.index("--")
    names, variants = args[:sep], args[sep + 1:]
    rounds = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-floor-probe")
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        timings: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(rounds):
            for v in variants:
                apply_variant(spark, v)
                t0 = time.monotonic()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                timings[v].append(round(time.monotonic() - t0, 3))
        apply_variant(spark, "hdfs")
        for v in variants:
            med = sorted(timings[v])[rounds // 2]
            print(f"{name} {v}: {timings[v]} median {med}", flush=True)


if __name__ == "__main__":
    main()
