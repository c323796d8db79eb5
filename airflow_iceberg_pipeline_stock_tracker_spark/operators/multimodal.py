"""Multimodal (image/audio/video) column handling.

Design: media travel as opaque `binary` payload columns + a typed
metadata struct; the expensive decode/feature steps run as Arrow-batched
`mapInPandas` so bytes never round-trip through Python row-at-a-time.

The container has no image/audio codecs, so the decode step is STUBBED:
`decode_image_features` raises NotImplementedError unless
`fake_decoder=True`, in which case a deterministic bytes->features fake
stands in. Everything around the stub — schema, batch iteration, UDF
signature, partition behavior — is real and tested; swapping the fake
for PIL/librosa is a one-function change.

Scale notes: payloads stay in Arrow record batches end-to-end;
`mapInPandas` keeps per-batch memory bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. Partitioning should key on
storage locality (e.g. tar shard), never on payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 doubles from md5."""
    dig = hashlib.md5(payload).digest()
    return [dig[i] / 255.0 for i in range(FEATURE_DIM)]


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Fabricate a media-shaped frame from the documents table (the
    container ships no real image fixtures): payload := utf-8 bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image_features(media: DataFrame, fake_decoder: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    With a real codec stack this would PIL-open each payload, resize,
    and embed; here the fake decoder derives deterministic features so
    the distributed plumbing is exercised for real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decoder:
                raise NotImplementedError(
                    "no image codecs in this environment — pass "
                    "fake_decoder=True or plug a real decoder here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": payloads.map(
                        lambda b: _fake_features(bytes(b))
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def media_byte_stats(docs: DataFrame) -> DataFrame:
    """JVM-only byte statistics over the fabricated payloads — the
    SQL-expressible slice of the multimodal path (oracle-checked)."""
    media = docs_as_media(docs)
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("byte_len"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("media_id")


MEDIA_BYTE_STATS_SQL = """
SELECT doc_id AS media_id,
       'image' AS kind,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS payload_md5,
       640 AS width,
       480 AS height
FROM documents ORDER BY media_id
"""
