"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the 100 TB pipeline brief): image/audio/video live as
``binary`` columns (or object-store path columns) with a struct of typed
metadata. Decode / feature-extract run as Arrow-batched pandas iterators
(``mapInPandas``) so each Python worker touches a whole batch at once; the
Spark-side plumbing (schema, batch shape, partition sizing) is real and
tested, while the codec itself is stubbed — image/audio libraries are not in
this container.

``SQURVE_FAKE_DECODE=1`` (default in tests) swaps the codec for a
deterministic fake so the full pipeline is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from squrve_spark.catalog import spread

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """Decode an image payload -> (width, height, channels).

    Real codec is unavailable in this environment; a deterministic fake is
    provided behind SQURVE_FAKE_DECODE for pipeline tests.
    """
    if os.environ.get("SQURVE_FAKE_DECODE", "1") == "1":
        h = hashlib.sha256(payload).digest()
        return (h[0] % 64 + 1, h[1] % 64 + 1, 3)
    raise NotImplementedError(
        "image codec not available in this container; set SQURVE_FAKE_DECODE=1 "
        "or plug a real decoder (PIL/opencv) here"
    )


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary 'payload' column (here: utf-8 of the text — the
    testdata has no real media; schema/partition shape is what matters)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode+profile binary payloads via mapInPandas (Arrow batches).

    Only (doc_id, payload) is shipped to Python — project before the map so
    the Arrow transfer doesn't carry unused columns.
    """
    src = spread(df.select("doc_id", payload_col))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = []
            for doc_id, p in zip(pdf["doc_id"], payloads):
                b = bytes(p)
                try:
                    w, h, c = _decode_image(b)
                    ok = True
                except NotImplementedError:
                    w = h = c = None
                    ok = False
                metas.append(
                    (
                        doc_id,
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        w,
                        h,
                        c,
                        ok,
                    )
                )
            yield pd.DataFrame(
                metas,
                columns=[f.name for f in MEDIA_META_SCHEMA.fields],
            )

    return src.mapInPandas(decode_batches, MEDIA_META_SCHEMA)


def payload_meta_sql(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-only payload profiling (no decode): byte length + md5.

    This is the oracle-checkable slice of the multimodal path — binary
    handling, not codec output.
    """
    return df.select(
        "doc_id",
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )
