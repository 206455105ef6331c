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


def _ngram_projection_matrix(dim: int, seed: int, sparse_dim: int = 4096) -> np.ndarray:
    """Seeded Rademacher projection (sparse_dim, dim) — the deterministic
    weight matrix behind ngram_projection_encoder, exposed so distributed
    encoders can broadcast it."""
    rng = np.random.default_rng(seed)
    return rng.choice([-1.0, 1.0], size=(sparse_dim, dim)) / np.sqrt(dim)


def _encode_ngram_projection(texts, proj: np.ndarray) -> np.ndarray:
    """Pure encoding kernel: char 3..5-gram TF hashing -> log scaling ->
    projection. Shared verbatim by the driver-side encoder closure and the
    distributed pandas-UDF path so both produce bit-identical vectors.

    Hashing is zlib.crc32 (C-speed, deterministic, process-independent) —
    the pure-Python FNV used for the schema-index features is ~20x slower
    per n-gram and dominated the corpus-embed wall time (r5 bench:
    pipeline_curate_v3 at 11.9 s was mostly this loop)."""
    import zlib

    sparse_dim, dim = proj.shape
    out = np.zeros((len(texts), dim))
    for i, t in enumerate(texts):
        v = np.zeros(sparse_dim)
        b = f"^{(t or '').lower()}$".encode()
        for n in (3, 4, 5):
            for j in range(len(b) - n + 1):
                v[zlib.crc32(b[j : j + n]) % sparse_dim] += 1.0
        out[i] = np.log1p(v) @ proj
    return out


_MD5_PLANE_CACHE: dict = {}
_GRID_BUCKET_CACHE: dict = {}


def md5_plane_matrix(dim: int = 64, sparse_dim: int = 4096, seed: int = 7) -> np.ndarray:
    """±1 projection matrix (dim, sparse_dim) with sign(j, b) = low bit of
    the first md5 hex byte of "proj:{seed}:{j}:{b}" — the
    `int_hyperplane_signs` idiom, regenerable by ANY engine (DuckDB:
    `CAST(('0x'||substr(md5('proj:7:'||j||':'||b),1,2)) AS INTEGER) & 1`),
    unlike the numpy-PCG64 Rademacher matrix it parallels. Cached per
    (dim, sparse_dim, seed): 262144 md5 calls once per process."""
    key = (dim, sparse_dim, seed)
    hit = _MD5_PLANE_CACHE.get(key)
    if hit is not None:
        return hit
    # ONE plane-generation rule in the codebase (r10 review): delegate to
    # similarity.int_hyperplane_signs — same f"{tag}:{j}:{i}" md5
    # first-byte low bit — keeping only the cache here
    from squrve_spark.operators.similarity import int_hyperplane_signs

    m = int_hyperplane_signs(dim=sparse_dim, bits=dim, tag=f"proj:{seed}")
    _MD5_PLANE_CACHE[key] = m
    return m


def _encode_md5_grid(texts, planes: np.ndarray) -> np.ndarray:
    """Integer-grid encoding kernel (r10, r9 verdict #2): char 3..5-gram
    TF counts md5-bucketed into the sparse space, times a ±1 md5 plane
    matrix — every output component is an EXACT int64 (sum of ±counts),
    so the embedding is bit-identical on any engine in any summation
    order; the float kernel's 4096-term IEEE dot depends on order, which
    is what blocked the oracle. Grams are CHARACTER slices (not bytes) so
    SQL substr() replays them; the gram -> bucket md5 is memoized across
    docs (the n-gram vocabulary is heavy-tailed — the cache turns ~3
    md5/char into ~1 dict hit/char), capped so an adversarial corpus
    cannot grow it unboundedly."""
    import hashlib

    dim, sparse_dim = planes.shape
    cache = _GRID_BUCKET_CACHE
    counts = np.zeros((len(texts), sparse_dim), dtype=np.int64)
    for i, t in enumerate(texts):
        s = f"^{(t or '').lower()}$"
        row = counts[i]
        for n in (3, 4, 5):
            for j in range(len(s) - n + 1):
                g = s[j : j + n]
                b = cache.get(g)
                if b is None:
                    b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % sparse_dim
                    if len(cache) < (1 << 21):
                        cache[g] = b
                row[b] += 1
    return counts @ planes.T  # (n, dim) exact int64


def embed_texts_int(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    seed: int = 7,
    out_col: str = "embedding",
) -> DataFrame:
    """DISTRIBUTED integer-grid text embedding (array<long>): the same
    broadcast-matrix Arrow-batched shape as `embed_texts`, with the
    md5-derived feature buckets and ±1 planes of `_encode_md5_grid` — the
    deterministic, ENGINE-REPLAYABLE variant that lets the RAG-ingest
    query (`doc_embed_search`) carry an exact DuckDB oracle. Cosine over
    these vectors is deterministic too: dots and squared norms are exact
    integers (< 2^53), so sqrt/divide/round are single IEEE ops any
    engine computes identically."""
    from pyspark.sql import functions as F

    enc = _encoder_udf(df.sparkSession, "int", dim, seed)
    return df.withColumn(out_col, enc(F.col(text_col)))


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    seed: int = 7,
    out_col: str = "embedding",
) -> DataFrame:
    """DISTRIBUTED deterministic text embedding: broadcast the seeded
    projection matrix, encode each Arrow batch with the same kernel the
    driver-side encoder uses (bit-identical outputs, parity-tested). This
    is the map-only embed stage of a document-index build — the seam where
    a real model (via pandas-UDF model serving) drops in; at 100 TB the
    encode is embarrassingly parallel and shuffle-free."""
    from pyspark.sql import functions as F

    enc = _encoder_udf(df.sparkSession, "float", dim, seed)
    return df.withColumn(out_col, enc(F.col(text_col)))


def _encoder_udf(spark, kind: str, dim: int, seed: int):
    """Session-memoized encoder pandas UDF for embed_texts / embed_texts_int.

    One UDF object (and one broadcast projection matrix) per (kind, dim,
    seed) per session — NOT one per call. A fresh pandas_udf closure per
    call gives every rebuilt plan a distinct PythonUDF identity, so
    downstream `memo_checkpoint`s keyed on the canonicalized plan can
    never hit across operator re-invocations (measured: the embed stage
    of pipeline_curate_v7 re-ran its full Arrow encode on every repeat
    call, ~3 s/run at sf0.1, with the checkpoint cache silently growing
    one dead entry per run). Reusing the identical UDF object makes
    rebuilt plans canonically equal, which is what the checkpoint memo
    needs. Broadcast lifetime ties to the session, matching the other
    session-dict caches."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    cache = spark.__dict__.setdefault("_squrve_encoder_udfs", {})
    key = (kind, dim, seed)
    hit = cache.get(key)
    if hit is not None:
        return hit
    if kind == "int":
        bc = spark.sparkContext.broadcast(md5_plane_matrix(dim, seed=seed))
        kernel, rtype = _encode_md5_grid, "array<bigint>"
    else:
        bc = spark.sparkContext.broadcast(_ngram_projection_matrix(dim, seed))
        kernel, rtype = _encode_ngram_projection, "array<double>"

    @pandas_udf(rtype)
    def enc(texts):  # pd.Series -> pd.Series (hints omitted: pd is
        # function-local here, so string annotations would not resolve)
        if len(texts) == 0:  # empty Arrow batch
            return pd.Series(dtype="object")
        m = kernel(list(texts), bc.value)
        return pd.Series([row.tolist() for row in m])

    cache[key] = enc
    return enc


def ngram_projection_encoder(dim: int = 64, seed: int = 7):
    """Deterministic stand-in for a neural text encoder (the reference's
    default is ``BAAI/bge-large-en-v1.5``, core/base.py:131 — not
    installable here): char n-gram (3..5) term frequencies hashed into a
    4096-dim sparse space, log-scaled, then a seeded Rademacher random
    projection down to ``dim``. Unlike a one-hot fake this produces DENSE
    embeddings where near-duplicate texts land close in cosine and
    unrelated texts don't, so retrieval quality through the
    ``encode_fn`` seam is actually exercised. Returns a
    ``list[str] -> (n, dim)`` callable for ColumnIndex/``build_or_load``.
    """
    proj = _ngram_projection_matrix(dim, seed)

    def encode(texts: list[str]) -> np.ndarray:
        return _encode_ngram_projection(texts, proj)

    return encode


class ColumnIndex:
    """In-memory column retrieval index: (entries, unit-vector matrix).

    ``encode_fn`` (optional) plugs in a real embedding model — the
    reference defaults to ``BAAI/bge-large-en-v1.5``
    (``core/base.py:131``); this engine ships no model, so the
    deterministic feature-hash encoder is the default. A custom encoder
    takes ``list[str] -> (n, dim) array-like``; outputs are l2-normalized
    here so cosine retrieval is encoder-agnostic. ``encoder_name`` tags
    the persisted store — a store built with one encoder must never be
    served to another (see ``build_or_load``).
    """

    DEFAULT_ENCODER = "feature-hash-v1"

    def __init__(
        self,
        entries: list[dict],
        matrix: np.ndarray,
        dim: int,
        encoder_name: str = DEFAULT_ENCODER,
        encode_fn=None,
    ):
        self.entries = entries
        self.matrix = matrix
        self.dim = dim
        self.encoder_name = encoder_name
        self.encode_fn = encode_fn

    @staticmethod
    def _encode(
        texts: list[str], dim: int, encode_fn=None
    ) -> np.ndarray:
        if encode_fn is None:
            rows = [_features_stable(t, dim) for t in texts]
            return np.stack(rows) if rows else np.zeros((0, dim))
        m = np.asarray(encode_fn(texts), dtype=np.float64)
        if m.ndim != 2 or m.shape[0] != len(texts) or m.shape[1] != dim:
            raise ValueError(
                f"encode_fn returned shape {m.shape}, expected ({len(texts)}, {dim})"
            )
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return m / norms

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        tables: list[str],
        db_id: str = "default",
        dim: int = 256,
        descriptions: Optional[dict[str, str]] = None,
        encode_fn=None,
        encoder_name: Optional[str] = None,
    ) -> "ColumnIndex":
        central = central_schema_from_catalog(
            spark, db_id, tables, descriptions=descriptions or {}
        )
        entries = central_to_parallel(central)
        docs = [
            f"{e['table_name']} {e['column_name']} {e.get('column_descriptions','')}"
            for e in entries
        ]
        matrix = cls._encode(docs, dim, encode_fn)
        name = encoder_name or (
            cls.DEFAULT_ENCODER if encode_fn is None else "custom"
        )
        return cls(entries, matrix, dim, encoder_name=name, encode_fn=encode_fn)

    def retrieve(self, text: str, k: int = 10) -> list[dict]:
        """Top-k columns by cosine; deterministic tie-break by entry order."""
        if not self.entries:
            return []
        q = self._encode([text], self.dim, self.encode_fn)[0]
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
            json.dump(
                {
                    "dim": self.dim,
                    "n_entries": len(self.entries),
                    "encoder": self.encoder_name,
                },
                f,
            )

    @classmethod
    def load(cls, path: str, encode_fn=None) -> "ColumnIndex":
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
        return cls(
            entries,
            matrix,
            meta["dim"],
            encoder_name=meta.get("encoder", cls.DEFAULT_ENCODER),
            encode_fn=encode_fn,
        )

    @staticmethod
    def store_path(
        store_dir: str,
        db_id: str,
        tables: list[str],
        dim: int = 256,
        descriptions: Optional[dict[str, str]] = None,
        encoder_name: str = DEFAULT_ENCODER,
    ) -> str:
        """Deterministic store location keyed by EVERYTHING that shapes the
        vectors: (db_id, sorted table set, dim, descriptions fingerprint,
        encoder). A (db_id, tables)-only key silently reused a store built
        with a different dim or different column descriptions (round-3
        advice); any such change now lands in a fresh path."""
        tables_key = _stable_hash("\x00".join(sorted(tables)))
        desc_key = _stable_hash(
            json.dumps(descriptions or {}, sort_keys=True) + f"|{dim}|{encoder_name}"
        )
        return os.path.join(store_dir, f"{db_id}_{tables_key:08x}_{desc_key:08x}")

    @classmethod
    def build_or_load(
        cls,
        spark: SparkSession,
        tables: list[str],
        store_dir: str,
        db_id: str = "default",
        dim: int = 256,
        descriptions: Optional[dict[str, str]] = None,
        encode_fn=None,
        encoder_name: Optional[str] = None,
    ) -> "ColumnIndex":
        """Reference-parity warm path: reuse the persisted store for this
        configuration when present, else build and persist it (mirrors
        ``build_index``'s 'if vector_store.exists(): continue').

        The store path folds in the sorted table list, dim, descriptions
        fingerprint and encoder name: the same db_id under any different
        configuration must not share a store. On load the meta is
        belt-and-braces validated (dim + encoder); mismatch rebuilds.
        """
        name = encoder_name or (
            cls.DEFAULT_ENCODER if encode_fn is None else "custom"
        )
        path = cls.store_path(
            store_dir, db_id, tables, dim=dim, descriptions=descriptions,
            encoder_name=name,
        )
        if os.path.isfile(os.path.join(path, "meta.json")):
            idx = cls.load(path, encode_fn=encode_fn)
            if idx.dim == dim and idx.encoder_name == name:
                return idx
        idx = cls.build(
            spark, tables, db_id=db_id, dim=dim, descriptions=descriptions,
            encode_fn=encode_fn, encoder_name=name,
        )
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
