"""Multimodal column plumbing: opaque binary media + typed metadata.

Real Spark-side plumbing (schema, partitioning, Arrow batch shape via
mapInPandas) with the codec layer STUBBED: the container has no image/audio
libraries, so `decode_image` is a deterministic fake (documented, tested)
and `decode_image_real` raises NotImplementedError to mark the integration
point. At scale the pattern is identical: binary column in, feature columns
out, one mapInPandas stage, pre-pruned columns.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import spec

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def decode_image_real(data: bytes):  # pragma: no cover - integration stub
    """Real decode hook (PIL/libvips at deployment)."""
    raise NotImplementedError("image codec not available in this container")


def decode_image(data: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dims derived from payload length."""
    n = len(data)
    return n % 640, n % 480


def media_features(media: DataFrame) -> DataFrame:
    """(url, media_type, data:binary) → typed metadata via one Arrow stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("url", "media_type", "n_bytes", "content_md5",
                    "fake_width", "fake_height")}
            for url, mt, data in zip(pdf["url"], pdf["media_type"], pdf["data"]):
                raw = bytes(data)
                w, h = decode_image(raw)
                out["url"].append(url)
                out["media_type"].append(mt)
                out["n_bytes"].append(len(raw))
                out["content_md5"].append(hashlib.md5(raw).hexdigest())
                out["fake_width"].append(w)
                out["fake_height"].append(h)
            yield pd.DataFrame(out)

    return media.select("url", "media_type", "data").mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media table: document text bytes as opaque payloads."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.expr(spec.SQL_URL).alias("url"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "utf-8").alias("data"),
    )


def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_features(media_table(spark, sf_dir))


def media_features_oracle() -> str:
    """Text is ASCII, so n_bytes == length(text) and md5 agrees."""
    return f"""
SELECT {spec.SQL_URL} AS url, 'image/fake' AS media_type,
       CAST(length(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST(length(text) % 640 AS BIGINT) AS fake_width,
       CAST(length(text) % 480 AS BIGINT) AS fake_height
FROM documents
"""
