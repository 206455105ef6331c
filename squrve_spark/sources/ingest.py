"""File ingestion: CSV / JSON / parquet (+ optional XLSX) -> engine tables.

Reference analog: the upload path (demo/file_to_db.py in /root/reference) —
pandas ``to_sql`` into sqlite plus schema extraction to the central format.
Here ingestion is ``spark.read.*`` with schema inference into temp views (or
parquet-backed saved tables), and the central-format schema comes from the
catalog via ``squrve_spark.data``.

Scale notes: CSV/JSON read with ``inferSchema`` samples the data once;
explicit ``schema=`` skips that pass (recommended at 100 TB). Ingestion is
metadata-only until first use (lazy scans); ``write_table`` materializes to
parquet with a chosen partitioning column for downstream pruning.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from squrve_spark.data import central_schema_from_catalog
from squrve_spark.session import apply_runtime_confs

_READERS = {
    ".csv": lambda spark, path, schema: (
        spark.read.options(header=True, inferSchema=schema is None)
        .schema(schema)
        .csv(path)
        if schema
        else spark.read.options(header=True, inferSchema=True).csv(path)
    ),
    ".tsv": lambda spark, path, schema: spark.read.options(
        header=True, inferSchema=True, sep="\t"
    ).csv(path),
    ".json": lambda spark, path, schema: spark.read.json(path),
    ".jsonl": lambda spark, path, schema: spark.read.json(path),
    ".parquet": lambda spark, path, schema: spark.read.parquet(path),
    # ORC is native to Spark (vectorized reader, predicate pushdown like
    # parquet) — common in Hive-era lakes a 100 TB migration reads from
    ".orc": lambda spark, path, schema: spark.read.orc(path),
}


def _read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """XLSX via the engine's pure-stdlib OOXML parser (``sources/xlsx.py``)
    -> pandas -> Arrow -> Spark. Driver-side read — spreadsheet files are
    small by construction (reference analog: ``core/utils.py:157-186``
    reads xlsx via pandas/openpyxl; this container has no openpyxl, so the
    zip-of-XML format is parsed directly)."""
    import pandas as pd

    from squrve_spark.sources.xlsx import read_xlsx

    header, rows = read_xlsx(path)
    if not header:
        raise ValueError(f"xlsx file has no header row: {path}")
    cols: dict[str, list] = {h: [] for h in header}
    for row in rows:
        for h, v in zip(header, row):
            cols[h].append(v)
    # Column-wise type unification: numeric columns stay numeric (int/float
    # mix widens to float); any other mix stringifies — same contract as
    # CSV inferSchema.
    series = {}
    for h, vals in cols.items():
        present = [v for v in vals if v is not None]
        if present and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in present
        ):
            dtype = (
                "float64"
                if any(isinstance(v, float) for v in present)
                else "Int64"
            )
            series[h] = pd.array(vals, dtype=dtype)
        elif present and all(isinstance(v, bool) for v in present):
            series[h] = pd.array(vals, dtype="boolean")
        else:
            series[h] = pd.array(
                [str(v) if v is not None else None for v in vals],
                dtype="string",
            )
    pdf = pd.DataFrame(series, columns=header)
    return spark.createDataFrame(pdf)


def ingest_file(
    spark: SparkSession,
    path: str,
    table_name: Optional[str] = None,
    schema=None,
) -> DataFrame:
    """Read one file by extension and register it as a temp view.

    Returns the DataFrame; the view name defaults to the file stem
    (sanitized). Unknown extensions raise ValueError.
    """
    apply_runtime_confs(spark)
    ext = os.path.splitext(path)[1].lower()
    if ext in (".xlsx", ".xls"):
        df = _read_xlsx(spark, path)
    elif ext in _READERS:
        df = _READERS[ext](spark, path, schema)
    else:
        raise ValueError(f"unsupported file type: {ext!r}")
    name = table_name or os.path.splitext(os.path.basename(path))[0]
    name = "".join(c if c.isalnum() or c == "_" else "_" for c in name)
    df.createOrReplaceTempView(name)
    return df


def ingest_files(
    spark: SparkSession, paths: list[str], db_id: str = "uploaded"
) -> dict:
    """Ingest many files and return the central-format schema over them —
    the reference's upload->schema-extraction flow in one call."""
    tables = []
    for p in paths:
        ingest_file(spark, p)
        tables.append(
            "".join(
                c if c.isalnum() or c == "_" else "_"
                for c in os.path.splitext(os.path.basename(p))[0]
            )
        )
    return central_schema_from_catalog(spark, db_id, tables)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Materialize to parquet, optionally hive-partitioned for pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
