"""Custom Spark DataSource for the file-per-column schema store.

The reference persists database schemas as one JSON file per column
(``{base}/{db_id}/{table}_{column}.json`` — reference
``core/data_manage.py:1126-1136, 1593-1601``), and its retrieval pipeline
reads thousands of such files. This module exposes that store to Spark as a
first-class batch source via the Python Data Source API (Spark 4)::

    register_schema_source(spark)
    df = spark.read.format("squrve_schema").load("/path/to/schema_store")
    df.filter("db_id = 'tpch'").select("table_name", "column_name")

Why a data source instead of ``spark.read.json``: the store is a TREE of
tiny per-column files where db_id lives in the DIRECTORY name, the natural
unit of listing is the db directory, and files must tolerate missing keys
uniformly. The reader partitions BY DATABASE DIRECTORY (one InputPartition
per db_id, the natural pruning unit) and parses files executor-side — the
driver only lists directories, so a store with a million columns across
thousands of dbs scales by adding executors.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "db_id string, db_type string, table_name string, column_name string, "
    "column_types string, column_descriptions string, primary_key boolean, "
    "foreign_key string, source_file string"
)

_FIELDS = (
    "db_id", "db_type", "table_name", "column_name", "column_types",
    "column_descriptions", "primary_key", "foreign_key",
)


class _DbPartition(InputPartition):
    def __init__(self, db_dir: str):
        self.db_dir = db_dir


class SchemaStoreReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("squrve_schema source needs a path (.load(path))")

    def partitions(self):
        # one partition per db directory — the store's natural pruning unit;
        # a flat directory of json files is treated as a single anonymous db
        subdirs = sorted(
            os.path.join(self.path, d)
            for d in os.listdir(self.path)
            if os.path.isdir(os.path.join(self.path, d))
        )
        return [_DbPartition(d) for d in subdirs] or [_DbPartition(self.path)]

    def read(self, partition: _DbPartition):
        db_dir = partition.db_dir
        for fn in sorted(os.listdir(db_dir)):
            if not fn.endswith(".json"):
                continue
            fp = os.path.join(db_dir, fn)
            try:
                with open(fp) as fh:
                    col = json.load(fh)
            except (json.JSONDecodeError, OSError):
                continue  # tolerate partial writes, like the reference loader
            if not isinstance(col, dict):
                continue
            yield tuple(
                (
                    bool(col.get(f, False))
                    if f == "primary_key"
                    else (None if col.get(f) is None else str(col.get(f)))
                )
                for f in _FIELDS
            ) + (fp,)


class _WroteFiles(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class SchemaStoreWriter(DataSourceWriter):
    """Executor-side writer for the file-per-column tree: each input row
    becomes ``{path}/{db_id}/{table}_{column}.json`` (the reference's
    save_parallel_schema layout, one write task per input partition, no
    driver collect).

    FILESYSTEM REQUIREMENT (same as the reader): ``path`` must be on a
    filesystem visible to BOTH the driver and every executor — local disk
    in local mode, or a shared mount (NFS/FUSE) on a cluster. Tasks write
    into a staging tree and the driver swaps it in at ``commit()``; with
    executor-local disks those writes would be invisible to the driver
    and silently lost. For cluster-native storage, write the DataFrame as
    parquet/JSON via the normal Hadoop-committer path instead; this sink
    exists for byte-level compatibility with the reference's on-disk
    store layout.

    Job-level safety: tasks write into a hidden STAGING tree next to the
    target; ``commit()`` (driver, after every task succeeded) swaps it in
    — ``overwrite`` replaces the whole store via rename, ``append``
    upserts file-by-file via os.replace — and ``abort()`` just drops the
    staging tree, so a failed/cancelled job never damages the existing
    store. Per-file writes inside staging are atomic too (temp +
    os.replace), so the reader's partial-write tolerance is only needed
    for foreign writers."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("squrve_schema sink needs a path (.save(path))")
        self.overwrite = overwrite
        self.staging = os.path.join(
            os.path.dirname(os.path.abspath(self.path)),
            f".{os.path.basename(self.path)}.staging-{uuid.uuid4().hex[:12]}",
        )
        os.makedirs(self.staging, exist_ok=True)

    def write(self, iterator) -> "_WroteFiles":
        n = 0
        for row in iterator:
            col = row.asDict()
            col.pop("source_file", None)
            db_dir = os.path.join(self.staging, str(col.get("db_id") or "default"))
            os.makedirs(db_dir, exist_ok=True)
            fn = f"{col.get('table_name')}_{col.get('column_name')}.json"
            tmp = os.path.join(db_dir, f".{fn}.tmp-{os.getpid()}")
            with open(tmp, "w") as fh:
                json.dump(col, fh, indent=2)
            os.replace(tmp, os.path.join(db_dir, fn))
            n += 1
        return _WroteFiles(n)

    def commit(self, messages) -> None:
        import shutil

        # Runtime guard for the shared-filesystem requirement: every file a
        # task reported written must be visible here on the driver. On a
        # cluster with executor-local disks the staging tree would be empty
        # — fail loudly instead of committing a silently-truncated store.
        expected = sum(m.n for m in messages if m is not None)
        staged = (
            sum(
                len([f for f in os.listdir(os.path.join(self.staging, d)) if f.endswith(".json")])
                for d in os.listdir(self.staging)
                if os.path.isdir(os.path.join(self.staging, d))
            )
            if os.path.isdir(self.staging)
            else 0
        )
        if staged < expected:
            shutil.rmtree(self.staging, ignore_errors=True)
            raise RuntimeError(
                f"squrve_schema sink: tasks reported {expected} files written but "
                f"only {staged} are visible to the driver — the target path is not "
                "on a driver+executor-shared filesystem (see SchemaStoreWriter docs)"
            )
        if self.overwrite:
            if os.path.isdir(self.path):
                shutil.rmtree(self.path)
            os.replace(self.staging, self.path)
            return
        # append: upsert staged files into the live tree one atomic
        # os.replace at a time, then drop the staging tree
        for db in sorted(os.listdir(self.staging)):
            src_dir = os.path.join(self.staging, db)
            dst_dir = os.path.join(self.path, db)
            os.makedirs(dst_dir, exist_ok=True)
            for fn in sorted(os.listdir(src_dir)):
                os.replace(os.path.join(src_dir, fn), os.path.join(dst_dir, fn))
        shutil.rmtree(self.staging)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class SchemaStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "squrve_schema"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SchemaStoreReader:
        return SchemaStoreReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> SchemaStoreWriter:
        return SchemaStoreWriter(self.options, overwrite)


def register_schema_source(spark: SparkSession) -> None:
    """Idempotent registration of the 'squrve_schema' format."""
    spark.dataSource.register(SchemaStoreDataSource)
