"""Multimodal (image/audio/video) column handling.

Design: media travel as opaque `binary` payload columns + a typed
metadata struct; the expensive decode/feature steps run as Arrow-batched
`mapInPandas` so bytes never round-trip through Python row-at-a-time.

Codec policy: when Pillow is importable the real decode path uses it;
otherwise the real path falls back to the built-in pure-Python PPM (P6)
codec below — so a REAL bytes->pixels decode is always executable, even
in this PIL-less container. `fake_decoder=True` forces the
deterministic bytes->features fake (what the long-green oracle rows
pin, so their hashes never depend on codec choice). A non-image payload
on the real path raises ValueError from the parser — an honest decode
error, not a stub.

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
    choice); otherwise the real path is PIL when importable, else the
    built-in pure-Python PPM codec (payloads must then be P6 bytes —
    anything else raises ValueError from the parser).
    """
    if fake_decoder:
        featurize = _fake_features
    elif HAVE_PIL:
        featurize = _pil_features
    else:
        featurize = _ppm_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
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
        def transform(b: bytes) -> bytes:
            return _ppm_resize(b, width, height)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
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


# ---------------------------------------------------------------------------
# Real pure-Python image codec: PPM (P6, maxval 255).
#
# The container ships no PIL, so until round 7 the only *real* decode
# path was never executable here. PPM is a self-describing binary image
# format simple enough to implement honestly in ~30 lines of stdlib
# Python — which makes the multimodal tier end-to-end real: fixture
# payloads are genuine image bytes, and the decode step parses the
# header and raster out of the bytes rather than trusting metadata.
# The decoder still runs inside the same Arrow-batched mapInPandas as
# the PIL path, so the Spark-side plumbing is identical at any scale.
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6): header + width*height*3 raw RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"raster is {len(rgb)} bytes, need {width * height * 3}"
        )
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse P6 bytes -> (width, height, raw RGB raster).

    Honest parser per the netpbm spec: arbitrary whitespace between
    header tokens, ``#`` comments allowed anywhere in the header, a
    single whitespace byte after maxval, then exactly w*h*3 raster
    bytes. Raises ValueError on anything malformed.
    """
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            ch = payload[pos : pos + 1]
            if ch == b"#":  # comment to end-of-line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif ch.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        return payload[start:pos]

    if token() != b"P6":
        raise ValueError("not a P6 PPM payload")
    width, height, maxval = int(token()), int(token()), int(token())
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval} (only 8-bit)")
    pos += 1  # exactly one whitespace byte separates maxval from raster
    raster = payload[pos : pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return width, height, raster


def _ppm_fixture_payload(media_id: int) -> bytes:
    """Deterministic real-image fixture: dims and every pixel are a pure
    function of media_id, so a SQL oracle can recompute the decoded
    statistics closed-form while the Spark path goes through actual
    header+raster bytes. pixel(r, c, k) = (id*31 + r*7 + c*3 + k*11) % 256."""
    import numpy as np

    w = 4 + media_id % 5
    h = 3 + media_id % 4
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    k = np.arange(3).reshape(1, 1, 3)
    px = ((media_id * 31 + r * 7 + c * 3 + k * 11) % 256).astype(np.uint8)
    return encode_ppm(w, h, px.tobytes())


def docs_as_ppm_media(docs: DataFrame) -> DataFrame:
    """Media frame whose payloads are REAL PPM image bytes (one small
    deterministic image per document). Arrow-batched generation."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "payload": ids.map(lambda i: _ppm_fixture_payload(int(i))),
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    return docs.select("doc_id").mapInPandas(batches, schema=schema)


PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def ppm_decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode: parse each payload's PPM header+raster and reduce the
    raster to integer per-channel sums — an exactly-oracle-checkable
    surface (pure integer arithmetic, no float anywhere).

    Scale: same Arrow-batched mapInPandas shape as the PIL path — bytes
    stay in record batches, numpy does the per-image reduction, output is
    7 scalars per image regardless of payload size.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [], "width": [], "height": [],
                "n_px": [], "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = decode_ppm(bytes(payload))
                px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
                sums = px.sum(axis=(0, 1), dtype=np.int64)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=PPM_STATS_SCHEMA)


def _ppm_features(payload: bytes) -> list[float]:
    """Real-decode features without PIL: parse the PPM raster and take
    the mean of every 8th raster byte (8 interleaved strata) / 255.

    A valid PPM with fewer than FEATURE_DIM raster bytes (under 3
    pixels) would leave some strata empty — a 0/0 inside the executor.
    Such payloads fail intelligibly instead (r8 advice fix;
    tests/test_llm_ops.py::test_ppm_features_tiny_raster_fails_intelligibly
    covers 1x1 and 2x1 images)."""
    _, _, raster = decode_ppm(payload)
    n = len(raster)
    if n < FEATURE_DIM:
        raise ValueError(
            f"image too small for {FEATURE_DIM}-stratum features: "
            f"{n} raster bytes (need >= {FEATURE_DIM})"
        )
    return [
        sum(raster[i::FEATURE_DIM]) / len(range(i, n, FEATURE_DIM)) / 255.0
        for i in range(FEATURE_DIM)
    ]


def _ppm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize without PIL: decode the P6 raster, nearest-neighbor
    sample to the target grid, re-encode as P6."""
    import numpy as np

    w, h, raster = decode_ppm(payload)
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = px[rows][:, cols]
    return encode_ppm(width, height, out.tobytes())


# ---------------------------------------------------------------------------
# perceptual (average) hash + banded near-duplicate search over decoded
# rasters — image dedup for a multimodal training-data pipeline
# ---------------------------------------------------------------------------

AHASH_BANDS = 4
AHASH_BAND_BITS = 12  # 4 x 12 = 48 bits covers the largest 8x6 fixture
AHASH_HAMMING_T = 3  # pairs within this distance count as near-dups
AHASH_BUCKET_CAP = 200  # posting cap per (w, h, band) bucket


def ppm_ahash(media: DataFrame) -> DataFrame:
    """(media_id, width, height, ahash): average-hash from REAL decoded
    PPM rasters. bit(r, c) = [gray * n_px > sum_gray] — the mean
    comparison cross-multiplied so it stays exact integer arithmetic —
    at position r*w + c; gray = r + g + b. Same Arrow-batched
    mapInPandas shape as ppm_decode_stats: bytes stay in record
    batches, output is 4 scalars per image."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "ahash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = decode_ppm(bytes(payload))
                px = (
                    np.frombuffer(raster, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                gray = px.sum(axis=2)
                total = int(gray.sum())
                bits = (gray * (w * h) > total).flatten()
                hv = 0
                for idx in np.nonzero(bits)[0]:
                    hv |= 1 << int(idx)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(hv)
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("ahash", T.LongType(), False),
        ]
    )
    return media.mapInPandas(batches, schema=schema)


def ahash_near_dups(hashes: DataFrame) -> DataFrame:
    """(media_id, width, height, ahash, n_near_dups): banded hamming
    near-dup counts over the ahash table.

    Simhash's banding discipline applied to image hashes: candidates
    must share one exact 12-bit band within the same (width, height)
    group — hamming <= 3 across 4 bands pigeonholes at least one equal
    band, so recall is 1 for the threshold — and buckets beyond
    AHASH_BUCKET_CAP postings are dropped whole (deterministic,
    mirrored in the oracle) so a degenerate bucket (e.g. an all-zero
    high band on small rasters) can never go quadratic. The exact
    hamming check is bit_count(xor) on int64 — JVM-side, no Python.
    """
    from pyspark.sql import Window

    bands = hashes.select(
        "media_id",
        "width",
        "height",
        "ahash",
        F.posexplode(
            F.array(
                *[
                    (
                        F.shiftright(F.col("ahash"), AHASH_BAND_BITS * j)
                        .bitwiseAND(F.lit((1 << AHASH_BAND_BITS) - 1))
                    )
                    for j in range(AHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    capped = (
        bands.withColumn(
            "posting_n",
            F.count(F.lit(1)).over(
                Window.partitionBy("width", "height", "band_idx", "band_val")
            ),
        )
        .where(F.col("posting_n") <= AHASH_BUCKET_CAP)
        .drop("posting_n")
    )
    a = capped.select(
        F.col("media_id").alias("id_a"),
        F.col("ahash").alias("ha"),
        "width",
        "height",
        "band_idx",
        "band_val",
    )
    b = capped.select(
        F.col("media_id").alias("id_b"),
        F.col("ahash").alias("hb"),
        "width",
        "height",
        "band_idx",
        "band_val",
    )
    close = (
        a.join(b, ["width", "height", "band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
        .where(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= AHASH_HAMMING_T
        )
        .select("id_a", "id_b")
    )
    neigh = (
        close.select(F.col("id_a").alias("media_id"))
        .unionAll(close.select(F.col("id_b").alias("media_id")))
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        hashes.join(neigh, "media_id", "left")
        .select(
            "media_id",
            "width",
            "height",
            "ahash",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_near_dups"),
        )
        .orderBy("media_id")
    )


AHASH_NEARDUP_SQL = f"""
WITH dims AS (
  SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents
), px AS (
  SELECT media_id, w, h, r.range AS r, c.range AS c,
         ((media_id * 31 + r.range * 7 + c.range * 3) % 256
          + (media_id * 31 + r.range * 7 + c.range * 3 + 11) % 256
          + (media_id * 31 + r.range * 7 + c.range * 3 + 22) % 256) AS gray
  FROM dims, range(0, 8) r, range(0, 8) c
  WHERE r.range < h AND c.range < w
), tot AS (
  SELECT media_id, w, h, SUM(gray) AS sum_gray, COUNT(*) AS n_px
  FROM px GROUP BY 1, 2, 3
), bits AS (
  SELECT p.media_id, p.w, p.h,
         CAST(SUM(CASE WHEN p.gray * t.n_px > t.sum_gray
                       THEN CAST(1 AS BIGINT) << CAST(p.r * p.w + p.c AS INT)
                       ELSE 0 END) AS BIGINT) AS ahash
  FROM px p JOIN tot t USING (media_id)
  GROUP BY 1, 2, 3
), bands AS (
  SELECT media_id, w, h, ahash, j.range AS band_idx,
         (ahash >> CAST({AHASH_BAND_BITS} * j.range AS INT))
           & {(1 << AHASH_BAND_BITS) - 1} AS band_val
  FROM bits, range(0, {AHASH_BANDS}) j
), capped AS (
  SELECT media_id, w, h, ahash, band_idx, band_val FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY w, h, band_idx, band_val)
              AS posting_n
    FROM bands
  ) WHERE posting_n <= {AHASH_BUCKET_CAP}
), close AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           a.ahash AS ha, b.ahash AS hb
    FROM capped a
    JOIN capped b ON a.w = b.w AND a.h = b.h
                 AND a.band_idx = b.band_idx AND a.band_val = b.band_val
                 AND a.media_id < b.media_id
  ) WHERE bit_count(xor(ha, hb)) <= {AHASH_HAMMING_T}
), neigh AS (
  SELECT media_id, COUNT(*) AS n FROM (
    SELECT id_a AS media_id FROM close
    UNION ALL SELECT id_b FROM close
  ) GROUP BY 1
)
SELECT b.media_id,
       CAST(b.w AS INTEGER) AS width,
       CAST(b.h AS INTEGER) AS height,
       b.ahash,
       CAST(COALESCE(n.n, 0) AS BIGINT) AS n_near_dups
FROM bits b LEFT JOIN neigh n USING (media_id)
ORDER BY b.media_id
"""


PATCH = 2  # ViT-style patch edge (pixels); ragged edges keep partial patches


def ppm_patch_grid(media: DataFrame) -> DataFrame:
    """(media_id, pr, pc, n_px, sum_r, sum_g, sum_b): the ViT
    patch-embedding precursor — each REAL decoded PPM raster split into
    a PATCH x PATCH pixel grid (ragged right/bottom edges keep their
    partial patches), reduced to exact integer per-channel sums per
    patch. A linear projection of these patch vectors IS the ViT input
    sequence; keeping the surface at integer sums makes it closed-form
    oracle-checkable like ppm_decode_stats.

    Scale: the same Arrow-batched mapInPandas contract as every other
    real-decode op — payload bytes never leave the record batch, numpy
    does one reshape-pad-reduce per image, and the output is
    O(patches) scalars per image regardless of payload size
    (tests/test_llm_ops.py::test_patch_grid_matches_bruteforce).
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("pr", T.IntegerType(), False),
            T.StructField("pc", T.IntegerType(), False),
            T.StructField("n_px", T.LongType(), False),
            T.StructField("sum_r", T.LongType(), False),
            T.StructField("sum_g", T.LongType(), False),
            T.StructField("sum_b", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("media_id", "pr", "pc", "n_px", "sum_r", "sum_g", "sum_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = decode_ppm(bytes(payload))
                px = (
                    np.frombuffer(raster, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                for pr in range((h + PATCH - 1) // PATCH):
                    for pc in range((w + PATCH - 1) // PATCH):
                        blk = px[
                            pr * PATCH: (pr + 1) * PATCH,
                            pc * PATCH: (pc + 1) * PATCH,
                        ]
                        sums = blk.sum(axis=(0, 1))
                        out["media_id"].append(int(mid))
                        out["pr"].append(pr)
                        out["pc"].append(pc)
                        out["n_px"].append(blk.shape[0] * blk.shape[1])
                        out["sum_r"].append(int(sums[0]))
                        out["sum_g"].append(int(sums[1]))
                        out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=schema)
