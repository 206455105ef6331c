#!/usr/bin/env python3
"""Derive a 10x ("sf1-shaped") scaling fixture from the read-only sf0.1
tables (r13, r12 verdict task 3).

The driver's testdata is read-only and its generator is not available, so
the core-scaling sweep needs a derived volume tier: each table is
replicated REPL times with key offsets that keep every join relationship
intact (order/line keys move together; nation/region dimension keys are
never offset), and content is deterministically perturbed so replication
does not change any operator's REGIME:

  * documents: words are shuffled per (replica, doc_id, line) — replicas
    share vocabulary and length stats but no shingles/lines, so dedup and
    near-dup operators see 10x independent docs, not 10-way duplicate
    clusters (which would turn pair emitters quadratic and poison the
    measurement);
  * embeddings: a deterministic per-replica perturbation (+-5% per
    component, hash-seeded) breaks exact/near-duplicate vector groups for
    the same reason;
  * events: user_id/event_id offset per replica — 10x users at the same
    per-user event counts and time range, so stateful streaming scales in
    KEYS (the axis state stores scale on);
  * TPC-H rows: all fact/dim keys offset consistently per replica except
    nation/region (kept shared, as real scale factors do).

This fixture is for SCALING MEASUREMENT ONLY (core-count ratios at a
volume where sf0.1's scheduler overhead stops dominating) — it is not an
oracle fixture and never feeds CORRECTNESS checks.

Usage: python tools/make_scaling_fixture.py [out_dir] [repl]
       (defaults: /root/testdata_sf1 10)
"""

from __future__ import annotations

import hashlib
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000  # far above any sf0.1 key


def shuffle_words(text: str, seed: str) -> str:
    """Deterministically rewrite a replica's text: shuffle words within
    each line AND replace ~35% of words with replica-tagged variants.

    Shuffling alone preserves the token MULTISET, which keeps bag-based
    signatures identical — simhash/jaccard operators then see each
    10-replica group as a duplicate cluster and their pair emission goes
    quadratic in the replication factor (measured: stream_neardup 78 s,
    dedup_simhash 19 s on the shuffle-only fixture — a regime change,
    not 10x volume). Substituting a third of the words drops
    replica-vs-original jaccard to ~0.48 and replica-vs-replica lower
    still, below every dedup threshold in the registry, while keeping
    length and rough frequency shape."""
    out_lines = []
    for i, line in enumerate(text.split("\n")):
        words = line.split(" ")
        rng = random.Random(hashlib.md5(f"{seed}:{i}".encode()).digest())
        rng.shuffle(words)
        tag = seed.split(":", 1)[0]
        words = [
            (w + "~" + tag) if w and rng.random() < 0.35 else w
            for w in words
        ]
        out_lines.append(" ".join(words))
    return "\n".join(out_lines)


def replicate(out_dir: str, repl: int) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, batches: list[pa.Table]) -> None:
        t = pa.concat_tables(batches)
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows")

    # dimensions shared across replicas, copied verbatim
    for name in ("nation", "region"):
        pq.write_table(
            pq.read_table(os.path.join(SRC, f"{name}.parquet")),
            os.path.join(out_dir, f"{name}.parquet"),
        )
        print(f"{name}: copied")

    def offset(tbl: pa.Table, col: str, r: int) -> pa.Table:
        arr = tbl[col].to_numpy(zero_copy_only=False) + r * STRIDE
        return tbl.set_column(
            tbl.schema.get_field_index(col), col,
            pa.array(arr, type=tbl.schema.field(col).type))

    # --- documents: shuffled words per replica
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    parts = [docs]
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    for r in range(1, repl):
        newtexts = [
            None if t is None else shuffle_words(t, f"r{r}:d{i}")
            for i, t in zip(ids, texts)
        ]
        t = docs.set_column(docs.schema.get_field_index("text"), "text",
                            pa.array(newtexts, type=pa.string()))
        parts.append(offset(t, "doc_id", r))
    write("documents", parts)

    # --- embeddings: rotate each replica ~32 degrees away from its source
    # vector (blend with a seeded random direction, norm preserved). A
    # small relative perturbation keeps cosine ~0.999 and near-dup
    # operators then treat every 10-replica group as one near-dup cluster
    # (quadratic pair regime — measured: emb_neardup_lsh 49 s on the 5%
    # fixture); cos ~0.85 sits below every similarity threshold in the
    # registry while preserving norms and the overall distribution.
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    units = vecs / norms
    parts = [emb]
    cos_t, sin_t = 0.85, float(np.sqrt(1 - 0.85**2))
    for r in range(1, repl):
        rng = np.random.default_rng(1000 + r)
        d = rng.standard_normal(vecs.shape)
        d -= (d * units).sum(axis=1, keepdims=True) * units  # orthogonalize
        dn = np.linalg.norm(d, axis=1, keepdims=True)
        dn[dn == 0] = 1.0
        pert = (norms * (cos_t * units + sin_t * d / dn)).astype(np.float32)
        t = emb.set_column(
            emb.schema.get_field_index("embedding"), "embedding",
            pa.array(list(pert), type=emb.schema.field("embedding").type))
        parts.append(offset(t, "vec_id", r))
    write("embeddings", parts)

    # --- events: new users per replica, same time range
    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    parts = [ev]
    for r in range(1, repl):
        t = offset(offset(ev, "event_id", r), "user_id", r)
        parts.append(t)
    write("events", parts)

    # --- TPC-H facts/dims with consistent key offsets
    plans = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }
    for name, keys in plans.items():
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        parts = [tbl]
        for r in range(1, repl):
            t = tbl
            for k in keys:
                t = offset(t, k, r)
            parts.append(t)
        write(name, parts)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_sf1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    replicate(out, repl)
