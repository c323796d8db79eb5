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
}
