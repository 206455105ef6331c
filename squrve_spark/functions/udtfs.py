"""SQL-callable TABLE functions (Python UDTFs, Spark 4 extension surface).

`functions/sqlfuncs.py` exposes scalar primitives as pure Catalyst
expressions; this module covers the table-valued side: operations whose
natural output is ROWS per input (chunking a document, demuxing frames)
registered with ``spark.udtf.register`` so generated SQL can use them in
FROM/LATERAL position::

    SELECT d.doc_id, c.chunk_id, c.chunk
    FROM documents d, LATERAL sq_chunk_text(d.text, 64, 8) c

UDTFs cross the Python boundary per row — for corpus-scale chunking use the
map-only JVM plan in ``operators/text.chunk_documents`` (identical
semantics, asserted by tests/test_sqlfuncs.py); the UDTF exists for the SQL
surface (ad-hoc/LLM-generated queries), where the row counts are
interactive-sized.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from squrve_spark.operators.text import jvm_tokens


@udtf(returnType="chunk_id int, chunk string, n_chunk_tokens int")
class ChunkTextUDTF:
    """Fixed-token-window chunking with overlap — same windowing rule as
    ``operators/text.chunk_documents`` (windows start every size-overlap
    tokens; final window short; empty text yields one empty chunk)."""

    def eval(self, text: str, size: int, overlap: int):  # noqa: D102
        if size is None or size <= 0 or overlap is None or not 0 <= overlap < size:
            raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
        # jvm_tokens mirrors tokens_expr exactly, including empty text -> ['']
        toks = jvm_tokens(text)
        step = size - overlap
        last_start = max(len(toks) - overlap - 1, 0)
        chunk_id = 0
        for start in range(0, last_start + 1, step):
            piece = toks[start : start + size]
            yield chunk_id, " ".join(piece), len(piece)
            chunk_id += 1


def register_udtfs(spark: SparkSession) -> list[str]:
    """Install all engine UDTFs on the session; returns the names."""
    spark.udtf.register("sq_chunk_text", ChunkTextUDTF)
    return ["sq_chunk_text"]
