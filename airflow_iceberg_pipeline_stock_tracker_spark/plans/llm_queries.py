"""Registry of the LLM-data-pipeline queries (dedup / similarity / text /
multimodal) over the `documents` and `embeddings` tables.

Each entry: name -> (builder(spark, sf_dir) -> DataFrame, oracle_sql | None).
Oracle is None only where the operator is genuinely not SQL-expressible
(the Arrow-batched decode stub); every hash-based variant uses portable
md5-derived hashing precisely so it CAN be oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup, multimodal, similarity, text
from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def _docs(fn: Callable[[DataFrame], DataFrame]) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "documents"))

    return run


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.docs_as_media(docs)
    return multimodal.decode_image_features(media, fake_decoder=True).orderBy(
        "media_id"
    )


def _media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.docs_as_media(docs)
    return multimodal.resize_images(media, 64, 64, fake_decoder=True).orderBy(
        "media_id"
    )


# the fake resizer's output payload is md5(payload || "|64x64"), which SQL
# can reproduce — so even this pandas-UDF path gets a value-level oracle
MEDIA_RESIZE_SQL = """
SELECT doc_id AS media_id,
       'image' AS kind,
       unhex(md5(text || '|64x64')) AS payload,
       64 AS width,
       64 AS height
FROM documents ORDER BY media_id
"""


def _media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.octet_length(F.encode("text", "utf-8")) % 50).alias("n_frames"),
        ).alias("meta"),
    )
    return multimodal.sample_frames(media, every_n=10).select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


MEDIA_FRAMES_SQL = """
SELECT doc_id AS media_id,
       CAST(unnest(range(0, octet_length(encode(text)) % 50, 10)) AS INT) AS frame_idx
FROM documents
ORDER BY media_id, frame_idx
"""


LLM_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "dedup_exact": (_docs(dedup.exact_dedup), dedup.EXACT_DEDUP_SQL),
    "dedup_minhash_lsh": (_docs(dedup.minhash_lsh_pairs), dedup.MINHASH_LSH_SQL),
    "dedup_simhash": (_docs(dedup.simhash_pairs), dedup.SIMHASH_SQL),
    "dedup_ngram_jaccard": (
        _docs(dedup.ngram_jaccard_pairs),
        dedup.NGRAM_JACCARD_SQL,
    ),
    "embedding_near_dup": (
        similarity.embedding_near_dup_pairs,
        similarity.EMBEDDING_NEAR_DUP_SQL,
    ),
    "similarity_cosine_topk": (similarity.cosine_topk, similarity.COSINE_TOPK_SQL),
    "similarity_rp_lsh_topk": (similarity.rp_lsh_topk, similarity.rp_lsh_topk_sql()),
    "text_language_id": (_docs(text.language_id), text.LANGUAGE_ID_SQL),
    "text_quality_score": (_docs(text.quality_score), text.QUALITY_SQL),
    "text_token_stats": (_docs(text.token_stats), text.TOKEN_STATS_SQL),
    "text_fingerprints": (_docs(text.fingerprints), text.FINGERPRINTS_SQL),
    "multimodal_byte_stats": (
        _docs(multimodal.media_byte_stats),
        multimodal.MEDIA_BYTE_STATS_SQL,
    ),
    # Arrow-batched decode plumbing — not SQL-expressible (rows-only check)
    "multimodal_decode_features": (_media_features, None),
    "multimodal_resize": (_media_resize, MEDIA_RESIZE_SQL),
    "multimodal_frame_sample": (_media_frames, MEDIA_FRAMES_SQL),
}
