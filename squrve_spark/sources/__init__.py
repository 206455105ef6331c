"""Data sources: file ingestion into engine tables (SURVEY §2.C last row)."""

from squrve_spark.sources.ingest import (  # noqa: F401
    ingest_file,
    ingest_files,
    write_table,
)
