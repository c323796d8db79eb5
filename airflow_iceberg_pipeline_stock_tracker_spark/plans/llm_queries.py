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

from ..operators import (
    bpe,
    curation,
    dedup,
    ivfpq,
    multimodal,
    pq,
    retrieval,
    similarity,
    text,
)
from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def _docs(fn: Callable[[DataFrame], DataFrame]) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "documents"))

    return run


# Near-dup pair mining is the expensive half of components/keep_list/
# split, and its output is a small localCheckpoint'ed pair set — exactly
# the intermediate a production pipeline would materialize once and fan
# out from. Memoize it per (session, sf_dir) so the three queries that
# consume the same pair graph don't re-mine it from scratch (the r2
# verdict measured the double-compute at ~40% of the two dedup queries'
# combined wall time). Keyed by session id: checkpoint blocks die with
# their session, so a fresh session recomputes.
_PAIR_CACHE: dict[tuple[str, int, str], DataFrame] = {}


def clear_result_caches() -> None:
    """Drop memoized computed intermediates (pair graphs, contamination
    flags, components) AND free their storage blocks. For benchmarking:
    a second measured pass must re-do the real mining work, not report a
    cache hit as the operator's cost. For a long-lived session: a cache
    the session can never release is a leak. Scratch landing zones
    (source slices) are NOT dropped — they're setup, not operator work."""
    for df in _PAIR_CACHE.values():
        df.unpersist(blocking=False)
    _PAIR_CACHE.clear()


def _materialize(df: DataFrame) -> DataFrame:
    """Persist + eager count: the memoized intermediate is computed once
    and its blocks are releasable later via unpersist() (a public API —
    localCheckpoint blocks have no clean release path). Consumers built
    from the returned DataFrame hit the InMemoryRelation."""
    df = df.persist()
    df.count()
    return df


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (doc_id, h) word-3-gram shingle relation over the full
    corpus, memoized per (session, sf_dir): the tokenize+explode+hash
    scan is the dominant cost of minhash mining, exact n-gram Jaccard,
    AND benchmark decontamination — a production pipeline materializes
    it once and fans out, so the engine does too."""
    key = ("shingles", id(spark), sf_dir)
    if key not in _PAIR_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _PAIR_CACHE[key] = _materialize(dedup._shingle_hashes(docs))
    return _PAIR_CACHE[key]


def _mined_pairs(kind: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (kind, id(spark), sf_dir)
    if key not in _PAIR_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        if kind == "simhash":
            mined = dedup.simhash_pairs(docs)
        else:
            mined = dedup.minhash_lsh_pairs(
                docs, shingles=_shingles(spark, sf_dir)
            )
        # eager checkpoint: the cache is only a saving if the mined pair
        # set is MATERIALIZED once — a lazy plan would re-mine per consumer
        _PAIR_CACHE[key] = _materialize(mined)
    return _PAIR_CACHE[key]


def _contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination flags, memoized + checkpointed — computed
    by the `curation_contamination` query and reused inside
    `curation_corpus_verdict` instead of re-running the inverted-index
    join (the two queries share ~3s of identical work at sf0.1)."""
    key = ("contamination", id(spark), sf_dir)
    if key not in _PAIR_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _PAIR_CACHE[key] = _materialize(
            curation.contamination(docs, shingles=_shingles(spark, sf_dir))
        )
    return _PAIR_CACHE[key]


def _simhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dup_components over the shared simhash pair graph, memoized — the
    propagation loop's labels are reused by dedup_keep_list."""
    key = ("simhash_components", id(spark), sf_dir)
    if key not in _PAIR_CACHE:
        _PAIR_CACHE[key] = _materialize(
            dedup.dup_components(_mined_pairs("simhash", spark, sf_dir))
        )
    return _PAIR_CACHE[key]


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode, feature array exploded to f0..f7 scalars.

    The scalar surface makes the pandas-UDF path fully oracle-checkable:
    the fake decoder's features are md5-byte/255.0, which SQL reproduces
    exactly (same integer byte, same division — bit-identical doubles).
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.docs_as_media(docs)
    feats = multimodal.decode_image_features(media, fake_decoder=True)
    return feats.select(
        "media_id",
        "kind",
        "byte_len",
        "payload_md5",
        *[
            F.element_at("features", i + 1).alias(f"f{i}")
            for i in range(multimodal.FEATURE_DIM)
        ],
    ).orderBy("media_id")


def _hex_byte_sql(hexcol: str, i: int) -> str:
    """DuckDB: i-th byte of a lowercase hex string as an integer."""
    hi = f"(strpos('0123456789abcdef', substr({hexcol}, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({hexcol}, {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


MEDIA_FEATURES_SQL = """
WITH hashed AS (
  SELECT doc_id AS media_id,
         'image' AS kind,
         octet_length(encode(text)) AS byte_len,
         md5(text) AS payload_md5
  FROM documents
)
SELECT media_id, kind, byte_len, payload_md5,
       {feats}
FROM hashed ORDER BY media_id
""".format(
    feats=",\n       ".join(
        f"{_hex_byte_sql('payload_md5', i)} / 255.0 AS f{i}" for i in range(8)
    )
)


def _media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.docs_as_media(docs)
    resized = multimodal.resize_images(media, 64, 64, fake_decoder=True)
    # binary cells are unhashable for the driver canonicalizer: render the
    # payload as lowercase hex (Spark hex() is uppercase; DuckDB md5()
    # already returns lowercase hex)
    return resized.select(
        "media_id",
        "kind",
        F.lower(F.hex("payload")).alias("payload_hex"),
        "width",
        "height",
    ).orderBy("media_id")


# the fake resizer's output payload is md5(payload || "|64x64"), which SQL
# can reproduce — so even this pandas-UDF path gets a value-level oracle
MEDIA_RESIZE_SQL = """
SELECT doc_id AS media_id,
       'image' AS kind,
       md5(text || '|64x64') AS payload_hex,
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


def _media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return multimodal.chunk_audio(media, window_ms=5)


# 16 kHz, 5 ms window -> 80 samples/chunk; payload = utf-8 bytes as
# fake PCM, n_samples = floor(bytes/2)
MEDIA_AUDIO_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) // 2 AS total_samples
  FROM documents
)
SELECT media_id,
       CAST(unnest(range(0, CAST(ceil(total_samples / 80.0) AS BIGINT))) AS INT)
         AS chunk_idx,
       unnest(range(0, CAST(ceil(total_samples / 80.0) AS BIGINT))) * 80
         AS start_sample,
       CAST(least(80,
         total_samples - unnest(range(0, CAST(ceil(total_samples / 80.0) AS BIGINT))) * 80
       ) AS INT) AS n_samples
FROM base
WHERE total_samples > 0
ORDER BY media_id, chunk_idx
"""


MEDIA_FRAMES_SQL = """
SELECT doc_id AS media_id,
       CAST(unnest(range(0, octet_length(encode(text)) % 50, 10)) AS INT) AS frame_idx
FROM documents
ORDER BY media_id, frame_idx
"""


def _media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL bytes->pixels decode, end to end: per-doc PPM (P6) payloads
    are genuine image bytes (header + raster), and the decode step
    parses dims and raster OUT OF THE BYTES with the pure-Python codec
    (operators/multimodal.py) inside the same Arrow-batched mapInPandas
    as the PIL path. The surface is pure integer channel sums, so the
    SQL oracle recomputes it closed-form from the fixture's pixel
    function — a hash mismatch would catch any parsing defect."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.docs_as_ppm_media(docs)
    return multimodal.ppm_decode_stats(media).orderBy("media_id")


# closed form of the decoded raster: pixel(r,c,k) = (id*31+r*7+c*3+k*11)%256
# over w = 4+id%5, h = 3+id%4 — the oracle never touches bytes, so
# agreement proves the Spark side's header/raster parsing is correct
MEDIA_DECODE_REAL_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents
), px AS (
  SELECT media_id, w, h, r.range AS r, c.range AS c
  FROM dims, range(0, 8) r, range(0, 8) c
  WHERE r.range < h AND c.range < w
)
SELECT media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(SUM((media_id * 31 + r * 7 + c * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((media_id * 31 + r * 7 + c * 3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((media_id * 31 + r * 7 + c * 3 + 22) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY media_id, w, h
ORDER BY media_id
"""

def _media_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch grid over REAL decoded PPM rasters (2x2 patches with
    ragged edges); pure integer per-patch channel sums so the oracle
    recomputes them closed-form from the fixture pixel function —
    agreement proves the byte parsing AND the patch geometry."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.docs_as_ppm_media(docs)
    return multimodal.ppm_patch_grid(media).orderBy("media_id", "pr", "pc")


MEDIA_PATCH_GRID_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents
), px AS (
  SELECT media_id, r.range AS r, c.range AS c
  FROM dims, range(0, 8) r, range(0, 8) c
  WHERE r.range < h AND c.range < w
)
SELECT media_id,
       CAST(r // 2 AS INTEGER) AS pr,
       CAST(c // 2 AS INTEGER) AS pc,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM((media_id * 31 + r * 7 + c * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((media_id * 31 + r * 7 + c * 3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((media_id * 31 + r * 7 + c * 3 + 22) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY media_id, r // 2, c // 2
ORDER BY media_id, pr, pc
"""


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# dense (cosine) rankers — the standard production shape for RAG /
# retrieval pipelines (Cormack et al. 2009: RRF outperforms either
# ranker alone and needs no score calibration, only ranks).
# ---------------------------------------------------------------------------

RRF_K = 60        # the canonical damping constant from the RRF paper
RRF_POOL = 50     # depth of each ranker's candidate list
RRF_TOP = 20      # fused results returned


def _rrf_term(rank_col: str):
    from pyspark.sql import functions as F

    return F.coalesce(
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col(rank_col).cast("double")),
        F.lit(0.0),
    )


def similarity_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, doc_id, lex_rank, sem_rank, rrf_score): top-20 documents
    for ONE hybrid query under reciprocal-rank fusion of two proven
    rankers — BM25 over the query's keyword form (text.bm25_search,
    driver-green for 6 rounds) and brute-force cosine over its
    embedding form (the similarity_cosine_topk scoring, vec_id 0
    standing in for the encoded query; the fixture aligns doc_id and
    vec_id). rrf = sum over rankers of 1/(60 + rank), computed over
    the union of both top-50 lists; a doc missing from one list
    contributes 0 from it. The dense ranker never returns the query
    vector itself; the lexical ranker may return doc 0.

    Exactness: both input rankings are integer ranks over quantized /
    bit-identical scores (their own rows prove it); the fusion is two
    exact-int-to-double divisions added in pinned order; the final
    order is (rrf DESC, doc_id) — ties across single-list docs at the
    same rank break on doc_id identically in both engines.

    Scale: each ranker is its own proven plan (BM25: postings-only
    explode + broadcast scalars; cosine: broadcast 1-row query,
    embarrassingly parallel scan + TakeOrdered top-k); the fusion
    joins two <=50-row lists — free. At 100 TB you fuse k-row lists
    per query, never corpora.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    lex = text.bm25_search(docs, k=RRF_POOL).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )

    emb = similarity.with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    cands = emb.where(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = similarity._dot(
        similarity._as_double(F.col("q_emb")),
        similarity._as_double(F.col("c_emb")),
    ) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        F.broadcast(q).crossJoin(cands).withColumn("cosine", cos)
    )
    top = scored.orderBy(F.desc("cosine"), F.col("doc_id")).limit(RRF_POOL)
    wd = Window.orderBy(F.desc("cosine"), F.col("doc_id"))
    dense = top.select(
        "doc_id", F.row_number().over(wd).cast("int").alias("sem_rank")
    )

    fused = lex.join(dense, "doc_id", "full").withColumn(
        "rrf_score", _rrf_term("lex_rank") + _rrf_term("sem_rank")
    )
    topk = fused.orderBy(F.desc("rrf_score"), F.col("doc_id")).limit(RRF_TOP)
    w = Window.orderBy(F.desc("rrf_score"), F.col("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "lex_rank", "sem_rank", "rrf_score")
        .orderBy("rank")
    )


def _rrf_hybrid_sql() -> str:
    kf = float(RRF_K)
    return f"""
WITH lex_full AS ({text.bm25_oracle_sql(k=RRF_POOL)}),
lex AS (SELECT doc_id, rank AS lex_rank FROM lex_full),
normed AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS norm
  FROM embeddings
  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
), dense_scored AS (
  SELECT c.vec_id AS doc_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (q.norm * c.norm) AS cosine
  FROM normed q JOIN normed c ON q.vec_id = 0 AND c.vec_id != 0
), dense AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS INT)
           AS sem_rank
  FROM dense_scored
  ORDER BY cosine DESC, doc_id LIMIT {RRF_POOL}
), fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         l.lex_rank, d.sem_rank,
         COALESCE(1.0 / ({kf!r} + CAST(l.lex_rank AS DOUBLE)), 0.0)
           + COALESCE(1.0 / ({kf!r} + CAST(d.sem_rank AS DOUBLE)), 0.0)
           AS rrf_score
  FROM lex l FULL OUTER JOIN dense d ON d.doc_id = l.doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
         AS rank,
       doc_id, lex_rank, sem_rank, rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id LIMIT {RRF_TOP}
"""


LLM_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "similarity_rrf_hybrid": (similarity_rrf_hybrid, _rrf_hybrid_sql()),
    "dedup_exact": (_docs(dedup.exact_dedup), dedup.EXACT_DEDUP_SQL),
    "dedup_minhash_lsh": (
        lambda spark, sf: _mined_pairs("minhash", spark, sf),
        dedup.MINHASH_LSH_SQL,
    ),
    "dedup_simhash": (
        lambda spark, sf: _mined_pairs("simhash", spark, sf),
        dedup.SIMHASH_SQL,
    ),
    "dedup_ngram_jaccard": (
        lambda spark, sf: dedup.ngram_jaccard_pairs(
            load_table(spark, sf, "documents"),
            shingles=_shingles(spark, sf),
        ),
        dedup.NGRAM_JACCARD_SQL,
    ),
    # r13: PPJoin-lite prefix filtering over the SAME shingle universe —
    # exact recall at Jaccard >= 1/2 by theorem (rarest-first prefixes
    # must collide), vs ngram_jaccard's max_df cap and minhash's bands
    "dedup_prefix_filter": (
        lambda spark, sf: dedup.prefix_filter_pairs(
            load_table(spark, sf, "documents"),
            shingles=_shingles(spark, sf),
        ),
        dedup.PREFIX_FILTER_SQL,
    ),
    # r14 (r13 verdict ask #5): the production composition — exact-dedup
    # first, PPJoin on set representatives, per-group arithmetic pair
    # expansion. The oracle IS the direct PPJoin SQL, so the driver's
    # hash gate re-proves output identity every round; on duplicate-
    # saturated corpora the join runs at DISTINCT-set size while the
    # C(k,2) within-group pairs become expansion-only work
    "dedup_prefix_filter_composed": (
        lambda spark, sf: dedup.prefix_filter_pairs_composed(
            load_table(spark, sf, "documents"),
            shingles=_shingles(spark, sf),
        ),
        dedup.PREFIX_FILTER_SQL,
    ),
    # transitive closure of the simhash pair set -> actionable dedup
    "dedup_components": (
        lambda spark, sf: _simhash_components(spark, sf),
        dedup.DEDUP_COMPONENTS_SQL,
    ),
    "dedup_keep_list": (
        lambda spark, sf: dedup.near_dup_keep_list(
            load_table(spark, sf, "documents"),
            _mined_pairs("simhash", spark, sf),
            components=_simhash_components(spark, sf),
        ),
        dedup.DEDUP_KEEP_LIST_SQL,
    ),
    # exact-substring dedup signal: cross-doc repeated >=20-token spans,
    # shingle-decomposed + interval-merged (Lee et al. 2022 ExactSubstr)
    # asymmetric containment near-dup (Broder resemblance-vs-containment):
    # subset/superset pages Jaccard misses, same inverted-index shape
    "dedup_containment": (
        lambda spark, sf: dedup.containment_pairs(
            load_table(spark, sf, "documents"),
            shingles=_shingles(spark, sf),
        ),
        dedup.CONTAINMENT_SQL,
    ),
    "dedup_repeated_spans": (
        lambda spark, sf: dedup.repeated_span_coverage(
            load_table(spark, sf, "documents")
        ),
        dedup.REPEATED_SPANS_SQL,
    ),
    # incremental dedup: a deterministic 10% "new batch" flagged against
    # the already-indexed 90% corpus — broadcast band-key semi-join
    # prunes the corpus side before any shuffle (the production shape
    # where the corpus band index is a persisted table)
    "dedup_incremental_lsh": (
        lambda spark, sf: dedup.incremental_lsh_flags(
            load_table(spark, sf, "documents")
        ),
        dedup.INCREMENTAL_LSH_SQL,
    ),
    "dedup_winnowing_pairs": (
        _docs(dedup.winnowing_pairs),
        dedup.WINNOW_PAIRS_SQL,
    ),
    "similarity_cluster_balance": (
        similarity.cluster_balance,
        similarity.CLUSTER_BALANCE_SQL,
    ),
    "similarity_knn_graph": (
        lambda spark, sf_dir: similarity.knn_graph_df(
            load_table(spark, sf_dir, "embeddings")
        ),
        similarity.KNN_GRAPH_SQL,
    ),
    # r13 wave 8: the serving-dim ablation (prefix-dim recall vs the
    # full-dim exact top-k) and density-based outlier scoring over the
    # same LSH-bucketed k-NN graph the knn row grades
    "similarity_matryoshka_recall": (
        lambda spark, sf_dir: similarity.matryoshka_recall(
            load_table(spark, sf_dir, "embeddings")
        ),
        similarity.MATRYOSHKA_RECALL_SQL,
    ),
    "embedding_outlier_lof": (
        lambda spark, sf_dir: similarity.lof_scores(
            load_table(spark, sf_dir, "embeddings")
        ),
        similarity.LOF_SCORES_SQL,
    ),
    "embedding_near_dup": (
        similarity.embedding_near_dup_pairs,
        similarity.EMBEDDING_NEAR_DUP_SQL,
    ),
    "similarity_cosine_topk": (similarity.cosine_topk, similarity.COSINE_TOPK_SQL),
    "similarity_rp_lsh_topk": (similarity.rp_lsh_topk, similarity.rp_lsh_topk_sql()),
    "similarity_ivf_topk": (similarity.ivf_topk, similarity.IVF_TOPK_SQL),
    # r16 (r15 verdict ask #1): the retrieval capstone — chunk the
    # documents fixture, hash-projection chunk embeddings, the trained
    # IVFADC index (ivfpq's quantizers, first-chunk seeds), fixed query
    # panel, ADC top-k + exact rerank, recall@k graded in-plan against
    # the brute-force twin; the oracle unrolls the ENTIRE pipeline
    "retrieval_rag_recall": (retrieval.rag_recall, retrieval.RAG_RECALL_SQL),
    # r16 wave 4: the INDEX as a persisted artifact (the tokenizer-
    # artifact discipline applied to retrieval) — build + write
    # vectors/centroids/codebooks/codes parquet, then answer the panel
    # from the artifact alone through a PURE-JVM serving plan; oracle
    # IS RAG_RECALL_SQL, so hash-green == persisted-index parity
    "retrieval_index_artifact": (
        retrieval.rag_index_artifact_roundtrip,
        retrieval.RAG_RECALL_SQL,
    ),
    # product quantization: 32x memory compression + LUT-add scoring
    "similarity_pq_topk": (pq.pq_topk, pq.PQ_TOPK_SQL),
    # SemDeDup (Abbas et al. 2023): k-means cells + within-cluster cosine,
    # keep-lowest-id representative; no corpus-wide pair join
    "similarity_semantic_dedup": (
        similarity.semantic_dedup,
        similarity.SEMANTIC_DEDUP_SQL,
    ),
    # SQ8 scalar quantization: byte codes over the global range, exact
    # int64 code scoring, float rerank of the quantized pool (faiss SQ)
    "similarity_sq_topk": (similarity.sq_topk, similarity.SQ_TOPK_SQL),
    # the full IVFADC composition: coarse cells + PQ over residuals,
    # nprobe-bounded candidate scan — index build AND query hash-checked
    "similarity_ivfpq_topk": (ivfpq.ivfpq_topk, ivfpq.IVFPQ_TOPK_SQL),
    # iterative Lloyd's k-means, exact via integer quantization — the
    # whole 3-round algorithm is hash-checked, not just one step
    "embedding_kmeans": (similarity.embedding_kmeans, similarity.EMBEDDING_KMEANS_SQL),
    # matrix-free power iteration: exact-int iterates, the whole
    # 3-round spectral algorithm hash-checked (kmeans discipline)
    "embedding_power_iteration": (
        similarity.power_iteration_scores,
        similarity.EMBEDDING_POWER_SQL,
    ),
    # r14: SemDeDup — semantic dedup inside k-means clusters, composed
    # from the exact kmeans + the collapsed banded near-dup join; the
    # pairwise smaller-id prune rule is order-free so both engines
    # agree exactly (difference from the paper's greedy sweep
    # documented in the operator)
    "similarity_semdedup": (
        similarity.similarity_semdedup,
        similarity.SIMILARITY_SEMDEDUP_SQL,
    ),
    # r14 wave 5: the duplicate-group census — the collapse machinery
    # (_dup_groups) as its own driver-checked row
    "similarity_dup_groups": (
        similarity.similarity_dup_groups,
        similarity.SIMILARITY_DUP_GROUPS_SQL,
    ),
    "text_language_id": (_docs(text.language_id), text.LANGUAGE_ID_SQL),
    "text_quality_score": (_docs(text.quality_score), text.QUALITY_SQL),
    # r14: fastText-style hashed linear classifier inference — the
    # quality-filter scoring pass, weight table as a pure expression
    "text_classifier_score": (
        _docs(text.classifier_score),
        text.CLASSIFIER_SQL,
    ),
    # r15 (r14 verdict ask #4): the training half — quantized full-
    # batch GD over hashed bag-of-words, ALL-int64 op sequence (exact
    # per-mille features, truncating-div weight updates verified
    # identical in both engines), fit + final-weights scoring in one
    # row; oracle = the same T iterations unrolled as MATERIALIZED CTEs
    "text_classifier_train": (
        _docs(text.classifier_train),
        text.CLASSIFIER_TRAIN_SQL,
    ),
    # r16 (r15 verdict ask #5): the curation-grade eval — fit on the
    # LEAKAGE-SAFE train fold (near-dup clusters co-travel via the
    # minhash pair graph), score every doc with the trained weights,
    # per-fold accuracy; the holdout number a curation pipeline gates on
    "text_classifier_holdout": (
        lambda spark, sf: text.classifier_holdout(
            load_table(spark, sf, "documents"),
            _mined_pairs("minhash", spark, sf),
        ),
        text.classifier_holdout_oracle_sql(dedup.MINHASH_LSH_SQL),
    ),
    "text_token_stats": (_docs(text.token_stats), text.TOKEN_STATS_SQL),
    "text_fingerprints": (_docs(text.fingerprints), text.FINGERPRINTS_SQL),
    # winnowing (MOSS): rightmost-min-per-window k-gram selection with
    # the guarantee threshold w+k-1; per-doc summary, zero-shuffle
    "text_winnowing": (_docs(text.winnowing), text.WINNOWING_SQL),
    # per-source simhash bit profiles + pairwise drift: the corpus
    # distribution-shift monitor (exact cross-multiplied comparison)
    "text_source_drift": (_docs(dedup.source_drift), dedup.SOURCE_DRIFT_SQL),
    "text_pack_shards": (_docs(text.pack_shards), text.PACK_SHARDS_SQL),
    "text_top_terms": (_docs(text.top_terms), text.TOP_TERMS_SQL),
    "text_corpus_stats": (_docs(text.corpus_stats), text.CORPUS_STATS_SQL),
    "text_chunk_documents": (_docs(text.chunk_documents), text.CHUNK_DOCUMENTS_SQL),
    # per-row char-level Shannon entropy (gibberish/boilerplate signal),
    # pinned-order fold quantized to exact integer millibits
    "text_char_entropy": (_docs(text.char_entropy), text.CHAR_ENTROPY_SQL),
    # corpus-bigram LM scoring (CCNet-style statistical quality filter),
    # exact-count probabilities, pinned-order fold, millibit surface
    "text_lm_score": (_docs(text.lm_score), text.LM_SCORE_SQL),
    # Gopher rule battery (Rae et al. 2021 A.1.1): the standard
    # document-level pretraining quality gates, exact-integer ratios
    "text_gopher_rules": (_docs(text.gopher_rules), text.GOPHER_RULES_SQL),
    # per-doc TF-IDF keywords: the one legitimate full-token-stream
    # shuffle (wordcount shape), millibit-quantized ranking
    "text_tfidf_keywords": (_docs(text.tfidf_keywords), text.TFIDF_KEYWORDS_SQL),
    "text_collocations": (_docs(text.collocations), text.COLLOCATIONS_SQL),
    # corpus curation: decontamination, sampling, split, scrubbing
    "curation_contamination": (
        lambda spark, sf: _contamination(spark, sf),
        curation.CONTAMINATION_SQL,
    ),
    "curation_mixture_sample": (
        _docs(curation.mixture_sample),
        curation.MIXTURE_SAMPLE_SQL,
    ),
    # r14: CCNet's head/middle/tail perplexity split — per-SOURCE
    # terciles of the exact-millibit LM score, integer-cross-multiplied
    # cuts (the ship-SLA percentile discipline)
    "curation_ppl_buckets": (
        _docs(curation.ppl_buckets),
        curation.PPL_BUCKETS_SQL,
    ),
    "curation_stratified_sample": (
        _docs(curation.stratified_sample),
        curation.STRATIFIED_SAMPLE_SQL,
    ),
    # r13: A-ES weighted sampling without replacement (top-k by
    # u^(1/w) keys) and the character-level fuzzy-dedup complement to
    # the shingle-based miners (prefix-blocked Levenshtein pairs)
    "curation_weighted_sample": (
        _docs(curation.weighted_sample),
        curation.WEIGHTED_SAMPLE_SQL,
    ),
    # r13: per-source median calibration of the LM quality score —
    # exact-int histogram thresholds, the mixed-corpus survival check
    "curation_score_calibration": (
        _docs(curation.score_calibration),
        curation.SCORE_CALIBRATION_SQL,
    ),
    # r13 wave 7: closed-form capped waterfill — quality weights in,
    # per-source epochs out; exact-int surface except λ itself
    "curation_token_budget": (
        _docs(curation.token_budget),
        curation.TOKEN_BUDGET_SQL,
    ),
    "dedup_edit_distance": (
        _docs(dedup.edit_distance_pairs),
        dedup.EDIT_DISTANCE_SQL,
    ),
    # r15 (r14 verdict ask #1): the production composition — cap on raw
    # ranks (the direct operator's survivor set), exact (pfx, len)
    # collapse, Levenshtein DP on representatives only, arithmetic
    # per-group pair expansion. The oracle IS the direct blocked-
    # Levenshtein SQL, so the driver's hash gate re-proves output
    # identity every round; on duplicate-saturated corpora the DP runs
    # once per distinct value pair, never per duplicate pair
    "dedup_edit_distance_composed": (
        _docs(dedup.edit_distance_pairs_composed),
        dedup.EDIT_DISTANCE_SQL,
    ),
    # split over the minhash-LSH near-dup graph (simhash drives keep_list;
    # using the other miner here exercises components over both)
    "curation_split": (
        lambda spark, sf: curation.leakage_safe_split(
            load_table(spark, sf, "documents"), _mined_pairs("minhash", spark, sf)
        ),
        curation._split_sql(dedup.MINHASH_LSH_SQL),
    ),
    "curation_pii_scrub": (_docs(curation.pii_scrub), curation.PII_SCRUB_SQL),
    "curation_repetition": (_docs(curation.repetition_stats), curation.REPETITION_SQL),
    # exact + near-dup (minhash) discipline: the near half is what makes
    # the row non-vacuous — the sf fixtures plant near-identical docs
    # across sources but no byte-identical ones
    "curation_source_overlap": (
        lambda spark, sf: curation.source_overlap(
            load_table(spark, sf, "documents"),
            pairs=_mined_pairs("minhash", spark, sf),
        ),
        curation._source_overlap_sql(dedup.MINHASH_LSH_SQL),
    ),
    # capstone: the full curation decision (quality x language x exact
    # dedup x decontamination x benchmark holdout) per document
    "curation_corpus_verdict": (
        lambda spark, sf: curation.corpus_verdict(
            load_table(spark, sf, "documents"),
            contam=_contamination(spark, sf),
        ),
        curation.CORPUS_VERDICT_SQL,
    ),
    "multimodal_byte_stats": (
        _docs(multimodal.media_byte_stats),
        multimodal.MEDIA_BYTE_STATS_SQL,
    ),
    # Arrow-batched decode plumbing; the fake decoder is md5-derived, so
    # even this pandas-UDF path gets a full value-level oracle
    "multimodal_decode_features": (_media_features, MEDIA_FEATURES_SQL),
    "multimodal_resize": (_media_resize, MEDIA_RESIZE_SQL),
    "multimodal_frame_sample": (_media_frames, MEDIA_FRAMES_SQL),
    # REAL decode: PPM payload bytes parsed by the pure-Python codec,
    # integer-exact oracle (new r7 — closes the "no registered query
    # ever decodes real bytes" gap)
    "multimodal_decode_real": (_media_decode_real, MEDIA_DECODE_REAL_SQL),
    "multimodal_patch_grid": (_media_patch_grid, MEDIA_PATCH_GRID_SQL),
    # image near-dup via average-hash + banded hamming search (new r9):
    # REAL raster decode feeds the hash; the oracle recomputes hashes
    # closed-form from the fixture pixel function and replays the same
    # banded join, so the whole bytes->hash->candidates->counts path is
    # value-hashed
    "multimodal_phash_neardup": (
        lambda spark, sf: multimodal.ahash_near_dups(
            multimodal.ppm_ahash(
                multimodal.docs_as_ppm_media(load_table(spark, sf, "documents"))
            )
        ),
        multimodal.AHASH_NEARDUP_SQL,
    ),
    # BM25 keyword retrieval over the corpus (new r7): explode-filter to
    # query postings, broadcast df + corpus scalars, pinned-order fold,
    # millibit-quantized ranking
    "text_bm25_search": (
        _docs(text.bm25_search),
        text.bm25_oracle_sql(),
    ),
    # BPE tokenizer training (new r7): iterative argmax-merge loop, one
    # aggregation + one 1-row collect + one JVM fold per round; DuckDB
    # twin is the same 8 rounds unrolled with MATERIALIZED CTEs (greedy
    # rewrite as gaps-and-islands parity)
    "text_bpe_train": (
        _docs(bpe.bpe_train),
        bpe.bpe_oracle_sql(),
    ),
    # tokenizer APPLY (new r7): per-doc token counts under the trained
    # merge table — the vocabulary-bounded (word -> count) map broadcasts
    "text_bpe_tokenize": (
        _docs(bpe.bpe_tokenize),
        bpe.bpe_tokenize_oracle_sql(),
    ),
    # r15 (r14 verdict ask #7): tokenizer ENCODING — the positioned
    # token-id stream itself (what text_pack_shards consumes), not just
    # counts. The trained word state + vocab-id table are vocabulary-
    # bounded broadcasts; output is linear in corpus tokens
    "text_bpe_encode": (
        _docs(bpe.bpe_encode),
        bpe.bpe_encode_oracle_sql(),
    ),
    # r16 (r15 verdict ask #4): the tokenizer as a PERSISTED artifact —
    # train, write merges+vocab parquet, read back, encode under the
    # pinned vocabulary. The oracle IS bpe_encode's, so a hash-green
    # round proves artifact round-trip == in-query retrain
    "text_bpe_encode_artifact": (
        bpe.bpe_encode_artifact_roundtrip,
        bpe.bpe_encode_oracle_sql(),
    ),
    # triangle census over the memoized minhash pair graph (new r7):
    # ordered 3-join triangle count + exact wedge count -> integer
    # triadic-closure coefficient
    "dedup_graph_stats": (
        lambda spark, sf: dedup.graph_stats(_mined_pairs("minhash", spark, sf)),
        dedup.GRAPH_STATS_SQL,
    ),
    # DSIR importance weighting (new r7): log-likelihood ratio between a
    # target-slice bigram LM and the full-corpus LM, add-one smoothed
    "curation_importance_weights": (
        _docs(text.importance_weights),
        text.IMPORTANCE_SQL,
    ),
    # MMR diversified reranking (new r7): cosine top-20 candidates ->
    # per-query greedy selection inside applyInPandas; oracle unrolls
    # the same k greedy steps
    "similarity_mmr_rerank": (
        lambda spark, sf: similarity.mmr_rerank(
            load_table(spark, sf, "embeddings")
        ),
        similarity.mmr_oracle_sql(),
    ),
    # contrastive hard-negative mining (new r7): top-k cross-label
    # neighbors per anchor + margin against the best same-label neighbor
    "similarity_hard_negatives": (
        lambda spark, sf: similarity.hard_negatives(
            load_table(spark, sf, "embeddings")
        ),
        similarity.HARD_NEGATIVES_SQL,
    ),
    "multimodal_audio_chunks": (_media_audio_chunks, MEDIA_AUDIO_SQL),
}
