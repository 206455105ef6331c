"""Column vector index: schema retrieval by feature-hashed embeddings.

Reference analog: ``build_index`` (data_manage.py:1352-1423) builds a
llama_index vector store over the file-per-column schema docs and retrieves
columns by question similarity (LinkAlign's reducer loop). Here the
embedding is a deterministic hashing-trick vector (word tokens + character
trigrams of "table column description"), so retrieval needs no model
download and is reproducible.

Sizing note: a schema index is inherently small (10^2-10^5 columns), so the
matrix lives driver-side — the same decision the reference makes (SURVEY
§1.3 maps vector stores to "keep embedding model driver-side" as option A).
``to_df`` exports the index as a DataFrame for the Spark-native retrieval
path (cosine via similarity.py) when the corpus is instead document-scale.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from squrve_spark.data import central_schema_from_catalog, central_to_parallel

_TOKEN = re.compile(r"[a-z0-9]+")


def _stable_hash(s: str) -> int:
    """FNV-1a 32-bit — process-independent (builtin hash() is seeded)."""
    h = 2166136261
    for ch in s.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


def _features_stable(text: str, dim: int) -> np.ndarray:
    """Hashing-trick bag of word tokens + char trigrams, l2-normalized."""
    v = np.zeros(dim, dtype=np.float64)
    text = (text or "").lower()
    feats = _TOKEN.findall(text)
    for tok in list(feats):
        padded = f"^{tok}$"
        feats.extend(padded[i : i + 3] for i in range(len(padded) - 2))
    for f in feats:
        v[_stable_hash(f) % dim] += 1.0
    n = np.linalg.norm(v)
    return v / n if n else v


class ColumnIndex:
    """In-memory column retrieval index: (entries, unit-vector matrix)."""

    def __init__(self, entries: list[dict], matrix: np.ndarray, dim: int):
        self.entries = entries
        self.matrix = matrix
        self.dim = dim

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        tables: list[str],
        db_id: str = "default",
        dim: int = 256,
        descriptions: Optional[dict[str, str]] = None,
    ) -> "ColumnIndex":
        central = central_schema_from_catalog(
            spark, db_id, tables, descriptions=descriptions or {}
        )
        entries = central_to_parallel(central)
        rows = []
        for e in entries:
            doc = f"{e['table_name']} {e['column_name']} {e.get('column_descriptions','')}"
            rows.append(_features_stable(doc, dim))
        return cls(entries, np.stack(rows) if rows else np.zeros((0, dim)), dim)

    def retrieve(self, text: str, k: int = 10) -> list[dict]:
        """Top-k columns by cosine; deterministic tie-break by entry order."""
        if not self.entries:
            return []
        q = _features_stable(text, self.dim)
        sims = self.matrix @ q
        order = np.argsort(-sims, kind="stable")[:k]
        return [
            {**self.entries[i], "score": round(float(sims[i]), 6)} for i in order
        ]

    def save(self, path: str) -> None:
        """Persist the index as parquet (entries JSON + embedding vectors)
        plus a meta sidecar — the analog of the reference's per-db persisted
        vector stores (``core/data_manage.py:1352-1423`` persists a
        llama_index store per db and skips rebuild when it exists).

        Parquet (via pyarrow, driver-side — the index is driver-sized by
        design) keeps the store engine-portable: Spark, DuckDB, or pandas
        can read the vectors directly.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        table = pa.table(
            {
                "entry_json": [json.dumps(e, sort_keys=True) for e in self.entries],
                "embedding": [self.matrix[i].tolist() for i in range(len(self.entries))],
            }
        )
        pq.write_table(table, os.path.join(path, "index.parquet"))
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"dim": self.dim, "n_entries": len(self.entries)}, f)

    @classmethod
    def load(cls, path: str) -> "ColumnIndex":
        import pyarrow.parquet as pq

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        t = pq.read_table(os.path.join(path, "index.parquet"))
        entries = [json.loads(s) for s in t.column("entry_json").to_pylist()]
        vecs = t.column("embedding").to_pylist()
        matrix = (
            np.array(vecs, dtype=np.float64)
            if vecs
            else np.zeros((0, meta["dim"]))
        )
        return cls(entries, matrix, meta["dim"])

    @staticmethod
    def store_path(store_dir: str, db_id: str, tables: list[str]) -> str:
        """Deterministic per-(db_id, table set) store location."""
        tables_key = _stable_hash("\x00".join(sorted(tables)))
        return os.path.join(store_dir, f"{db_id}_{tables_key:08x}")

    @classmethod
    def build_or_load(
        cls,
        spark: SparkSession,
        tables: list[str],
        store_dir: str,
        db_id: str = "default",
        dim: int = 256,
        descriptions: Optional[dict[str, str]] = None,
    ) -> "ColumnIndex":
        """Reference-parity warm path: reuse the persisted store for this
        (db_id, table set) when present, else build and persist it (mirrors
        ``build_index``'s 'if vector_store.exists(): continue').

        The store path folds in a hash of the sorted table list: the same
        db_id queried over different table subsets must not share a store —
        a db-only key would serve an index missing the extra tables'
        columns and silently degrade schema linking.
        """
        path = cls.store_path(store_dir, db_id, tables)
        if os.path.isfile(os.path.join(path, "meta.json")):
            return cls.load(path)
        idx = cls.build(spark, tables, db_id=db_id, dim=dim, descriptions=descriptions)
        idx.save(path)
        return idx

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Export as a DataFrame (table, column, embedding) — feeds the
        distributed cosine/LSH path in operators/similarity.py when the
        index outgrows the driver."""
        data = [
            (e["table_name"], e["column_name"], [float(x) for x in self.matrix[i]])
            for i, e in enumerate(self.entries)
        ]
        return spark.createDataFrame(
            data, "table_name string, column_name string, embedding array<double>"
        )
