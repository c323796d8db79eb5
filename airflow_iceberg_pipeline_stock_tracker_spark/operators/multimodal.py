"""Multimodal (image/audio/video) column handling.

Design: media travel as opaque `binary` payload columns + a typed
metadata struct; the expensive decode/feature steps run as Arrow-batched
`mapInPandas` so bytes never round-trip through Python row-at-a-time.

Codec policy: when Pillow is importable the real decode path is used
automatically (`decoder="auto"`); `fake_decoder=True` forces the
deterministic bytes->features fake (what the oracle-checked driver
queries pin, so their rows never depend on codec availability); with
neither, the decode step raises NotImplementedError. This container
ships no PIL/soundfile/librosa, so here the real path is exercised only
by the skip-if-no-codec pytest; everything around the codec — schema,
batch iteration, UDF signature, partition behavior — runs for real
either way.

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

# module-level so executors (which import this module for the pandas UDF
# closures) resolve the codec exactly once per worker
try:
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

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


def _pil_features(payload: bytes) -> list[float]:
    """Real decode: PIL-open, thumbnail to FEATURE_DIM x FEATURE_DIM
    grayscale, features = per-row mean intensity in [0, 1]."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L")
    img = img.resize((FEATURE_DIM, FEATURE_DIM))
    px = list(img.getdata())  # row-major, FEATURE_DIM^2 values
    return [
        sum(px[r * FEATURE_DIM : (r + 1) * FEATURE_DIM]) / FEATURE_DIM / 255.0
        for r in range(FEATURE_DIM)
    ]


def _pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize: PIL-open -> RGB -> resize -> PNG bytes."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
    out = io.BytesIO()
    img.resize((width, height)).save(out, format="PNG")
    return out.getvalue()


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

    `fake_decoder=True` pins the deterministic md5-derived features (the
    driver queries use this so their hash rows never depend on codec
    availability); otherwise the real PIL path is auto-enabled when
    Pillow is importable, and with no codec the batch raises.
    """
    featurize = _fake_features if fake_decoder else _pil_features
    if not fake_decoder and not HAVE_PIL:
        featurize = None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if featurize is None:
                raise NotImplementedError(
                    "no image codecs in this environment — pass "
                    "fake_decoder=True or install Pillow"
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
                        lambda b: featurize(bytes(b))
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, fake_decoder: bool = False
) -> DataFrame:
    """Arrow-batched resize: decode payload -> scale -> re-encode.

    Same codec policy as decode_image_features: fake path emits a
    deterministic payload (md5 of original + target dims), real path is
    PIL `Image.resize` -> PNG, auto-enabled when Pillow is importable.
    """
    if fake_decoder:
        def transform(b: bytes) -> bytes:
            return hashlib.md5(b + f"|{width}x{height}".encode()).digest()
    elif HAVE_PIL:
        def transform(b: bytes) -> bytes:
            return _pil_resize(b, width, height)
    else:
        transform = None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if transform is None:
                raise NotImplementedError(
                    "no image codecs in this environment — pass "
                    "fake_decoder=True or install Pillow"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads.map(
                        lambda b: transform(bytes(b)) if b is not None else None
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads — JVM-side row expansion.

    Emits one row per sampled frame index (0, every_n, 2*every_n, ...)
    up to meta.n_frames; the per-frame payload extraction would be the
    pandas-UDF decode step downstream (decode_image_features on the
    sampled rows). Expansion via explode(sequence(...)) keeps the frame
    fan-out inside the JVM — no Python in this hot path at all.
    """
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(
                F.when(
                    n > 0,
                    F.sequence(
                        F.lit(0), n - 1, F.lit(every_n)
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("frame_idx"),
        )
        .orderBy("media_id", "frame_idx")
    )


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


def chunk_audio(media: DataFrame, window_ms: int = 250) -> DataFrame:
    """Fixed-window chunk index for audio payloads — JVM-side expansion.

    Treats the payload as 16-bit mono PCM at meta.sample_rate and emits
    one row per window_ms chunk: (media_id, chunk_idx, start_sample,
    n_samples). Like sample_frames, the fan-out is explode(sequence(..))
    — pure integer arithmetic inside codegen, no Python; the per-chunk
    decode/embed step would be the downstream mapInPandas. The final
    partial window is kept (short n_samples), matching how streaming ASR
    front-ends frame audio.
    """
    sr = F.coalesce(F.col("meta.sample_rate"), F.lit(0))
    n_samples = (F.octet_length("payload") / 2).cast("long")
    spc = (sr.cast("long") * window_ms / 1000).cast("long")  # samples/chunk
    n_chunks = F.when(
        (spc > 0) & (n_samples > 0), F.ceil(n_samples / spc)
    ).otherwise(F.lit(0))
    return (
        media.where(F.col("kind") == "audio")
        .select(
            "media_id",
            n_samples.alias("total_samples"),
            spc.alias("spc"),
            F.explode(
                F.when(
                    n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
                ).otherwise(F.array().cast("array<int>"))
            ).alias("chunk_idx"),
        )
        .select(
            "media_id",
            "chunk_idx",
            (F.col("chunk_idx") * F.col("spc")).alias("start_sample"),
            F.least(
                F.col("spc"),
                F.col("total_samples") - F.col("chunk_idx") * F.col("spc"),
            ).cast("int").alias("n_samples"),
        )
        .orderBy("media_id", "chunk_idx")
    )
