"""LLM-data-pipeline operators: dedup quality, ANN recall, text analysis,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_exact_dedup_idempotent_and_total(spark, docs):
    out = dedup.exact_dedup(docs).collect()
    assert sum(r.n_copies for r in out) == docs.count()
    assert len({r.text_hash for r in out}) == len(out)


def test_exact_dedup_catches_planted_dup(spark, docs):
    planted = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = dedup.exact_dedup(docs.unionByName(planted)).collect()
    dup_groups = [r for r in out if r.n_copies > 1]
    assert any(r.n_copies == 2 for r in dup_groups)


def test_minhash_lsh_finds_near_duplicate(spark, docs):
    # plant a near-dup: copy a doc, perturb one token
    base = docs.orderBy("doc_id").limit(1).collect()[0]
    perturbed = base.text.replace(base.text.split()[0], "zzz", 1)
    extra = spark.createDataFrame(
        [(1_000_000, perturbed)], ["doc_id", "text"]
    )
    all_docs = docs.select("doc_id", "text").unionByName(extra)
    pairs = dedup.minhash_lsh_pairs(all_docs).collect()
    assert (base.doc_id, 1_000_000) in {(r.doc_a, r.doc_b) for r in pairs}


def test_minhash_agrees_with_exact_jaccard(spark, docs):
    """LSH candidates should contain every high-jaccard pair (recall) and
    mostly high-jaccard pairs (precision at the 4x4 banding threshold)."""
    lsh = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert exact <= lsh or not exact  # full recall at j>=0.8
    if lsh:
        loose = {
            (r.doc_a, r.doc_b)
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
        }
        assert len(lsh & loose) / len(lsh) >= 0.5  # banding precision


def test_dup_components_transitive_closure(spark):
    """A~B, B~C collapse into one cluster labeled min(doc_id); disjoint
    pairs stay separate; keep-list keeps exactly one doc per cluster.
    Both physical strategies (driver union-find and the distributed
    label-propagation loop, forced via local_threshold=0) must agree."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (3, 5)], ["doc_a", "doc_b"]
    )
    expect = {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 9: 7}
    comp = {r.doc_id: r.cluster_id for r in dedup.dup_components(pairs).collect()}
    assert comp == expect
    dist = {
        r.doc_id: r.cluster_id
        for r in dedup.dup_components(pairs, local_threshold=0).collect()
    }
    assert dist == expect

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 5, 7, 9, 11]], ["doc_id", "text"]
    )
    keep = dedup.near_dup_keep_list(docs, pairs).collect()
    kept = {r.doc_id for r in keep if r.keep == 1}
    assert kept == {1, 7, 11}  # one per cluster + the singleton
    assert {r.doc_id for r in keep} == {1, 2, 3, 5, 7, 9, 11}  # total


def test_ngram_jaccard_df_cap_drops_boilerplate_grams(spark, docs):
    """Grams above the document-frequency cap must not generate candidate
    pairs: two docs overlapping ONLY through a boilerplate sentence
    shared by many documents fall out when the cap bites, and intersection
    counts are conservative (never above the uncapped truth)."""
    boiler = "terms of service apply to all users of this product"
    rows = [(10_000 + i, f"{boiler} unique{i} filler{i} token{i}") for i in range(20)]
    extra = spark.createDataFrame(rows, ["doc_id", "text"])
    # uncapped: the 20 boilerplate docs pair up through the shared grams
    uncapped = dedup.ngram_jaccard_pairs(extra, threshold=0.5, max_df=1000).collect()
    assert len(uncapped) > 0
    # cap below 20: the boilerplate postings are dropped, no pairs remain
    capped = dedup.ngram_jaccard_pairs(extra, threshold=0.5, max_df=10).collect()
    assert capped == []
    # default cap leaves the real fixture results untouched (max DF ~25)
    default = {
        (r.doc_a, r.doc_b, r.inter)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    unbounded = {
        (r.doc_a, r.doc_b, r.inter)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=10**9).collect()
    }
    assert default == unbounded


def test_simhash_banding_is_lossless(spark, docs):
    """The banded candidate join must return exactly the brute-force set
    (pigeonhole guarantees recall at radius 3)."""
    sh = dedup.simhash_values(docs)
    a = sh.selectExpr("doc_id AS doc_a", "simhash AS h_a")
    b = sh.selectExpr("doc_id AS doc_b", "simhash AS h_b")
    brute = (
        a.crossJoin(b)
        .where("doc_a < doc_b AND bit_count(h_a ^ h_b) <= 3")
        .select("doc_a", "doc_b")
        .collect()
    )
    banded = dedup.simhash_pairs(docs).select("doc_a", "doc_b").collect()
    assert {tuple(r) for r in brute} == {tuple(r) for r in banded}


def test_simhash_bucket_cap_drops_boilerplate_pileup(spark):
    """A pile of identical texts puts every doc in the same 4 chunk
    buckets; with the cap below the pile size all four buckets are
    dropped and no candidate pairs are generated — the bounded-bucket
    guarantee that stops a quadratic within-bucket expansion at scale."""
    rows = [(50_000 + i, "exactly the same boilerplate text") for i in range(12)]
    pile = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = dedup.simhash_pairs(pile, max_bucket=1000).collect()
    assert len(uncapped) == 12 * 11 // 2  # identical docs: all pairs
    capped = dedup.simhash_pairs(pile, max_bucket=10).collect()
    assert capped == []


def test_rp_lsh_retrieves_planted_near_dup(spark, sf_dir):
    """A true near-duplicate (tiny perturbation of a stored vector) must
    land in the same LSH bucket and be retrieved as the top neighbor —
    the property that matters for near-dup retrieval at 0.95+ cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where("vec_id = 42").collect()[0]
    perturbed = [float(x) + 0.001 for x in base.embedding]
    extra = spark.createDataFrame(
        [(1_000_000, perturbed, 99)], ["vec_id", "embedding", "label"]
    ).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    )
    union = emb.unionByName(extra)
    approx = similarity.rp_lsh_topk_df(union, n_queries=100, k=5).collect()
    mine = [r for r in approx if r.query_id == 42]
    assert mine and mine[0].neighbor_id == 1_000_000
    assert mine[0].cosine > 0.999
    assert all(1 <= r.rank <= 5 for r in approx)


def test_near_dup_lsh_is_subset_of_exact_with_recall(spark, sf_dir):
    """The banded-LSH near-dup path returns a non-empty SUBSET of the
    brute-force pairs (precision 1 by construction; recall is the banded
    trade-off), and every survivor clears the threshold."""
    exact = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_dup_pairs_exact(
            spark, sf_dir, threshold=0.4
        ).collect()
    }
    lsh_rows = similarity.embedding_near_dup_pairs(
        spark, sf_dir, threshold=0.4
    ).collect()
    lsh = {(r.vec_a, r.vec_b) for r in lsh_rows}
    assert lsh  # non-empty even on near-orthogonal fixtures
    assert lsh <= exact
    assert all(r.cosine >= 0.4 for r in lsh_rows)


def test_near_dup_lsh_finds_planted_duplicate(spark, sf_dir):
    """A true near-duplicate (cosine ~1) must survive the band prefilter:
    at production thresholds banding is ~93% recall per pair, and for a
    0.001-perturbed copy every sign projection almost surely agrees."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where("vec_id = 7").collect()[0]
    perturbed = [float(x) + 0.001 for x in base.embedding]
    extra = spark.createDataFrame(
        [(1_000_000, perturbed, 99)], ["vec_id", "embedding", "label"]
    ).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    )
    pairs = similarity.embedding_near_dup_pairs_df(
        emb.unionByName(extra), threshold=0.99
    ).collect()
    assert (7, 1_000_000) in {(r.vec_a, r.vec_b) for r in pairs}


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    """IVF with nprobe=4 of 16 cells must recover most exact neighbors
    (measured 94% at sf0.001; assert with margin) and return a full,
    correctly-ranked top-k per query."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(spark, sf_dir).collect()
    }
    ivf_rows = similarity.ivf_topk(spark, sf_dir).collect()
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    assert len(exact & ivf) / len(exact) >= 0.6
    by_q: dict[int, list] = {}
    for r in ivf_rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_cosine_topk_selfconsistency(spark, sf_dir):
    out = similarity.cosine_topk(spark, sf_dir, n_queries=5, k=3).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_pack_shards_invariants(spark, docs):
    """Every doc gets exactly one (shard, offset); offsets stay inside
    capacity; the assignment equals a sequential greedy fill recomputed
    in plain Python for one source."""
    cap = 512
    out = text.pack_shards(docs, capacity=cap).collect()
    assert len(out) == docs.count()
    assert all(0 <= r.shard_offset < cap for r in out)
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    src, rows = next(iter(by_source.items()))
    rows.sort(key=lambda r: r.doc_id)
    cum = 0
    for r in rows:
        assert (r.shard_id, r.shard_offset) == (cum // cap, cum % cap)
        cum += r.n_tokens


def test_chunk_audio_covers_payload_exactly(spark):
    """Chunks tile the sample range: contiguous starts, full windows
    except a short tail, and the sample counts sum to the total."""
    from pyspark.sql import functions as F

    media = spark.createDataFrame(
        [(1, b"\x00" * 1000), (2, b"\x00" * 160), (3, b"")],
        ["media_id", "payload"],
    ).select(
        "media_id",
        F.lit("audio").alias("kind"),
        "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    # 16 kHz, 10 ms -> 160 samples per chunk
    out = multimodal.chunk_audio(media, window_ms=10).collect()
    by_media: dict[int, list] = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    assert 3 not in by_media  # empty payload -> no chunks
    m1 = sorted(by_media[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in m1] == [0, 1, 2, 3]  # 500 samples / 160
    assert [r.n_samples for r in m1] == [160, 160, 160, 20]
    assert all(r.start_sample == i * 160 for i, r in enumerate(m1))
    (m2,) = by_media[2]
    assert (m2.chunk_idx, m2.n_samples) == (0, 80)


def test_language_id_output_shape(spark, docs):
    out = text.language_id(docs).collect()
    assert len(out) == docs.count()
    assert {r.lang_pred for r in out} <= {"en", "es", "fr", "de", "unknown"}


def test_quality_score_bounds(spark, docs):
    out = text.quality_score(docs).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in out)
    assert all(r.punct_ratio >= 0 for r in out)


def test_token_stats_positive(spark, docs):
    out = text.token_stats(docs).collect()
    assert all(r.bpe_ish_tokens >= r.ws_tokens for r in out)


def test_fingerprint_survives_whitespace_noise(spark):
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick   brown fox\tjumps over the lazy dog again and again"
    sdf = _spark_docs(spark, [(1, a), (2, b)])
    out = {r.doc_id: r for r in text.fingerprints(sdf).collect()}
    assert out[1].content_md5 == out[2].content_md5
    assert out[1].min_shingle_hash == out[2].min_shingle_hash


def _spark_docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.skipif(
    multimodal.HAVE_PIL, reason="Pillow present: auto mode decodes via PIL"
)
def test_multimodal_real_path_rejects_non_image_bytes(spark, docs):
    # without PIL the real path is the pure-Python PPM codec; feeding it
    # text bytes must fail with an honest parse error, not a stub
    media = multimodal.docs_as_media(docs.limit(5))
    with pytest.raises(Exception, match="P6"):
        multimodal.decode_image_features(media).collect()


def test_ppm_codec_roundtrip_and_header_parsing():
    raster = bytes(range(2 * 3 * 3)) # 2x3 image
    payload = multimodal.encode_ppm(2, 3, raster)
    assert multimodal.decode_ppm(payload) == (2, 3, raster)
    # spec-compliant variations the parser must accept: comments and
    # arbitrary whitespace between header tokens
    weird = b"P6 # comment\n# another\n 2\t3\n255\n" + raster
    assert multimodal.decode_ppm(weird) == (2, 3, raster)
    for bad in (b"P5\n2 3\n255\n" + raster,          # wrong magic
                b"P6\n2 3\n65535\n" + raster * 2,    # 16-bit maxval
                payload[:-1]):                        # truncated raster
        with pytest.raises(ValueError):
            multimodal.decode_ppm(bad)


def test_ppm_features_tiny_raster_fails_intelligibly():
    """The r8 tiny-raster guard (multimodal._ppm_features): a VALID PPM
    with fewer raster bytes than FEATURE_DIM (under 3 pixels) would
    leave a stratum empty — a 0/0 inside the executor. It must raise a
    clear ValueError instead; 3 pixels (9 bytes >= 8 strata) is the
    smallest image that decodes to features."""
    for w, h in ((1, 1), (2, 1)):  # 3 and 6 raster bytes, both < 8
        payload = multimodal.encode_ppm(w, h, bytes(range(w * h * 3)))
        with pytest.raises(ValueError, match="raster bytes"):
            multimodal._ppm_features(payload)
    ok = multimodal.encode_ppm(3, 1, bytes(range(9)))
    feats = multimodal._ppm_features(ok)
    assert len(feats) == multimodal.FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in feats)


def test_ppm_real_decode_stats_match_fixture_pixels(spark, docs):
    """ppm_decode_stats must recover dims + exact channel sums from the
    BYTES alone — cross-checked against the fixture's pixel function."""
    media = multimodal.docs_as_ppm_media(docs.limit(25))
    got = {r.media_id: r for r in multimodal.ppm_decode_stats(media).collect()}
    assert len(got) == 25
    for mid, r in got.items():
        w, h = 4 + mid % 5, 3 + mid % 4
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        for k, col in ((0, r.sum_r), (11, r.sum_g), (22, r.sum_b)):
            expect = sum(
                (mid * 31 + rr * 7 + cc * 3 + k) % 256
                for rr in range(h)
                for cc in range(w)
            )
            assert col == expect


@pytest.mark.skipif(
    multimodal.HAVE_PIL, reason="PIL would shadow the PPM real path"
)
def test_ppm_real_decode_and_resize_via_auto_mode(spark, docs):
    """The REAL (non-fake) decode_image_features/resize_images paths now
    execute in this container via the PPM codec — no skip, no stub."""
    media = multimodal.docs_as_ppm_media(docs.limit(8))
    feats = multimodal.decode_image_features(media).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r.features)
    resized = multimodal.resize_images(media, 4, 2).collect()
    for r in resized:
        w, h, raster = multimodal.decode_ppm(bytes(r.payload))
        assert (w, h) == (4, 2) and len(raster) == 4 * 2 * 3


@pytest.mark.skipif(
    not multimodal.HAVE_PIL, reason="no Pillow in this environment"
)
def test_multimodal_real_codec_roundtrip(spark):
    """With Pillow present, auto mode must decode real PNGs: features are
    row-mean intensities (a solid-white image -> all 1.0) and resize
    re-encodes at the target dimensions."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (32, 32), color=255).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), (32, 32, None, None))],
        multimodal.MEDIA_SCHEMA,
    )
    feats = multimodal.decode_image_features(media).collect()[0]
    assert all(abs(f - 1.0) < 1e-9 for f in feats.features)
    resized = multimodal.resize_images(media, 8, 8).collect()[0]
    out = Image.open(io.BytesIO(bytes(resized.payload)))
    assert out.size == (8, 8)


def test_multimodal_fake_decode_plumbing(spark, docs):
    media = multimodal.docs_as_media(docs.limit(20))
    out = multimodal.decode_image_features(media, fake_decoder=True).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r.features)
        assert r.byte_len > 0 and len(r.payload_md5) == 32


def test_multimodal_resize_stub(spark, docs):
    media = multimodal.docs_as_media(docs.limit(10))
    out = multimodal.resize_images(media, 64, 64, fake_decoder=True).collect()
    assert len(out) == 10
    for r in out:
        assert (r.width, r.height) == (64, 64)
        assert len(r.payload) == 16  # md5 digest stand-in


def test_multimodal_frame_sampling(spark):
    from pyspark.sql import functions as F, types as T

    rows = [(1, "video", None, (None, None, None, 25)),
            (2, "video", None, (None, None, None, 0)),
            (3, "image", None, (None, None, None, 99))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = [(r.media_id, r.frame_idx)
           for r in multimodal.sample_frames(media, every_n=10).collect()]
    # 25 frames sampled every 10 -> 0,10,20; zero frames -> nothing;
    # non-video rows excluded entirely
    assert got == [(1, 0), (1, 10), (1, 20)]


def test_kmeans_deterministic_and_nearest(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import similarity

    a = similarity.embedding_kmeans(spark, sf_dir).collect()
    b = similarity.embedding_kmeans(spark, sf_dir).collect()
    assert a == b  # exact arithmetic: bit-identical every run
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(a) == n_vecs  # every vector assigned exactly once
    clusters = {r.cluster for r in a}
    assert len(clusters) <= similarity.KMEANS_K
    assert len(clusters) > 1  # the data actually partitions


def test_pq_topk_recall_and_self_exclusion(spark, sf_dir):
    """PQ/ADC ranking is approximate; pin its behavior: every query gets
    exactly k neighbors, never itself, and the ADC distances are
    non-decreasing within a query (rank order). Recall sanity: the ADC
    top-1 neighbor should sit inside the exact Euclidean top-25% of
    candidates for most queries (the quantization is 16 codes over
    near-orthogonal synthetic vectors — coarse, but far better than
    random)."""
    import numpy as np

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import pq
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        _quantized,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    out = pq.pq_topk(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.adc_dist))
    assert len(by_q) == 10
    for q, rows in by_q.items():
        rows.sort()
        assert [r for r, _ in rows] == [1, 2, 3, 4, 5]
        dists = [d for _, d in rows]
        assert dists == sorted(dists), q

    emb = {
        r["vec_id"]: np.array(r["q"], dtype=np.int64)
        for r in _quantized(load_table(spark, sf_dir, "embeddings")).collect()
    }
    ids = sorted(emb)
    ok = 0
    for r in out:
        if r.rank != 1:
            continue
        qv = emb[r.query_id]
        exact = sorted(
            ids, key=lambda i: (int(((emb[i] - qv) ** 2).sum()), i)
        )
        exact = [i for i in exact if i != r.query_id]
        cutoff = max(1, len(exact) // 4)
        ok += r.neighbor_id in exact[:cutoff]
    assert ok >= 7, f"ADC top-1 inside exact top-25% for only {ok}/10 queries"


def test_pq_training_reduces_quantization_distortion(spark, sf_dir):
    """Lloyd's guarantee, made executable: each training round must not
    increase total quantization distortion, and 2 rounds must beat the
    untrained seed codebook by a clear margin (~24% on these fixtures).

    Distortion — not recall@k — is the right pin here: the synthetic
    fixture vectors are near-orthogonal with no cluster structure, so
    recall over 10 queries is statistically flat no matter the codebook;
    on real embedding corpora the distortion reduction is what buys
    recall (Jégou et al. 2011, §V).
    """
    import numpy as np

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import pq
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        _quantized,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    emb = _quantized(load_table(spark, sf_dir, "embeddings")).persist()
    X = np.array(
        [r["q"] for r in emb.collect()], dtype=np.int64
    ).reshape(-1, pq.PQ_M, pq.PQ_D)

    def distortion(iters: int) -> float:
        cmat, valid = pq._train_codebook(emb, iters)
        codes = pq._encode(X, cmat, valid)
        recon = cmat[np.arange(pq.PQ_M)[None, :], codes]
        return float(((X - recon) ** 2).sum(axis=(1, 2)).mean())

    d0, d1, d2 = distortion(0), distortion(1), distortion(2)
    emb.unpersist()
    assert d1 <= d0 and d2 <= d1, (d0, d1, d2)  # Lloyd monotonicity
    assert d2 < 0.9 * d0, f"trained codebook only {d2/d0:.3f}x of seed distortion"


def test_repeated_span_coverage_semantics(spark):
    """Hand-built corpus pinning the ExactSubstr-style contract:
    coverage counts tokens inside >=SPAN-token runs shared verbatim
    with ANOTHER doc; overlapping shingle hits merge into one interval;
    within-doc-only repeats and short docs contribute zero."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import dedup

    span = dedup.SPAN_TOKENS  # 20
    shared = " ".join(f"w{i}" for i in range(span + 5))  # 25-token run
    docs = spark.createDataFrame(
        [
            # doc 0 and 1 share the 25-token run (plus distinct tails)
            (0, shared + " a b c"),
            (1, "x y z " + shared),
            # doc 2: long but fully unique
            (2, " ".join(f"u{i}" for i in range(40))),
            # doc 3: shorter than the span -> no shingles at all
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in dedup.repeated_span_coverage(docs).collect()
    }
    # the shared run is 25 tokens; its 6 shingle starts merge into ONE
    # interval of exactly 25 tokens in both sharers
    assert got[0] == (28, 25)
    assert got[1] == (28, 25)
    assert got[2] == (40, 0)
    assert got[3] == (2, 0)


def test_ivfpq_probes_bound_candidates_and_rank_sanely(spark, sf_dir):
    """IVFADC contract: every emitted neighbor must live in one of the
    query's nprobe probed cells (the IVF pruning actually prunes), ranks
    are dense per query with non-decreasing ADC distance, and the ADC
    top-1 lands in the exact top-25% for most queries (residual-PQ at 16
    codes is coarse, but far better than random)."""
    import numpy as np

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import ivfpq
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        _quantized,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    out = ivfpq.ivfpq_topk(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.adc_dist, r.neighbor_id))
    assert len(by_q) == 10
    for q, rows in by_q.items():
        rows.sort()
        assert [r for r, _, _ in rows] == [1, 2, 3, 4, 5]
        dists = [d for _, d, _ in rows]
        assert dists == sorted(dists), q

    # replicate the deterministic index driver-side to check the probe
    # restriction: neighbor's cell must be among the query's probes
    emb = _quantized(load_table(spark, sf_dir, "embeddings")).persist()
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["q"] for r in rows], dtype=np.int64)
    cmat = ivfpq._train_coarse(emb, ivfpq.IVFPQ_CELLS, ivfpq.IVFPQ_COARSE_ITERS)
    emb.unpersist()
    cells = dict(zip(ids.tolist(), ivfpq._coarse_assign(X, cmat).tolist()))
    c2 = (cmat * cmat).sum(axis=1)
    ok_top1 = 0
    emb_by_id = dict(zip(ids.tolist(), X))
    for q, rows_q in by_q.items():
        qv = X[ids == q][0]
        qdist = c2 - 2 * (qv @ cmat.T)
        probe = set(
            np.argsort(qdist, kind="stable")[: ivfpq.IVFPQ_NPROBE].tolist()
        )
        for _, _, nb in rows_q:
            assert cells[nb] in probe, (q, nb, cells[nb], probe)
        # recall sanity on the top-1
        exact = sorted(
            (int(((emb_by_id[i] - qv) ** 2).sum()), i)
            for i in ids.tolist()
            if i != q
        )
        cutoff = max(1, len(exact) // 4)
        top_ids = {i for _, i in exact[:cutoff]}
        ok_top1 += rows_q[0][2] in top_ids
    assert ok_top1 >= 6, f"IVFADC top-1 inside exact top-25% for only {ok_top1}/10"


def test_ivfpq_rerank_closes_the_recall_gap(spark, sf_dir):
    """Two-stage retrieval contract: exact re-ranking of the ADC top-20
    must never lose recall@5 vs plain ADC (it scores the same candidate
    set with the true metric), and its distances must BE the exact int64
    L2 — verified against a driver-side recompute."""
    import numpy as np

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import ivfpq
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        _quantized,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    emb = {
        r["vec_id"]: np.array(r["q"], dtype=np.int64)
        for r in _quantized(load_table(spark, sf_dir, "embeddings")).collect()
    }
    ids = sorted(emb)

    def exact_top5(q):
        srt = sorted(
            (int(((emb[i] - emb[q]) ** 2).sum()), i) for i in ids if i != q
        )
        return [i for _, i in srt[:5]]

    def recall(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(nbs & set(exact_top5(q))) for q, nbs in by_q.items()
        ) / (5 * len(by_q))

    plain = ivfpq.ivfpq_topk(spark, sf_dir).collect()
    rr = ivfpq.ivfpq_topk(spark, sf_dir, rerank=20).collect()
    assert recall(rr) >= recall(plain), (recall(rr), recall(plain))
    for r in rr:  # distances are the true metric now
        want = int(((emb[r.query_id] - emb[r.neighbor_id]) ** 2).sum())
        assert r.adc_dist == want, (r.query_id, r.neighbor_id)


def test_char_entropy_known_values(spark):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        char_entropy,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),          # single symbol: H = 0
            (2, "abab"),          # two equiprobable symbols: H = 1 bit
            (3, "abcdabcdabcd"),  # four equiprobable symbols: H = 2 bits
            (4, ""),              # empty: 0 chars, 0 distinct
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert rows[1].entropy_millibits == 0
    assert rows[2].entropy_millibits == 1000
    assert rows[3].entropy_millibits == 2000
    assert rows[1].n_distinct_chars == 1
    assert rows[3].n_distinct_chars == 4
    assert rows[4].n_chars == 0 and rows[4].n_distinct_chars == 0


def test_lm_score_known_values(spark):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        lm_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b"),   # c(a b)=1, context c(a .)=2 -> log2(1/2) = -1 bit
            (2, "a c"),   # same: -1 bit
            (3, "z"),     # one token: no bigrams
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in lm_score(docs).collect()}
    assert rows[1].lm_score_millibits == -1000
    assert rows[2].lm_score_millibits == -1000
    assert rows[3].n_bigrams == 0
    assert rows[3].lm_score_millibits is None


def test_lm_score_repetitive_text_scores_higher(spark):
    """Text whose bigrams dominate the corpus scores closer to 0 than
    text made of one-off bigrams."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        lm_score,
    )

    docs = spark.createDataFrame(
        [
            # dominant pattern: p(cat|the)=3/5 — mildly surprising only
            (1, "the cat sat the cat sat the cat sat"),
            # one-off continuations of the shared context: p(dog|the)=
            # p(bird|the)=1/5 — much more surprising per bigram
            (2, "the dog sat the bird sat"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in lm_score(docs).collect()}
    assert rows[1].lm_score_millibits > rows[2].lm_score_millibits


def test_bm25_known_ranking(spark):
    docs = _spark_docs(
        spark,
        [
            (1, "spark spark spark join"),       # heavy on two terms
            (2, "spark filter filter filter"),   # one term, once
            (3, "filter scan merge sort"),       # no query term
            (4, "join window spark"),            # all three terms
        ],
    )
    out = text.bm25_search(docs, query_terms=["join", "spark", "window"]).collect()
    # doc 3 matches nothing and must be absent
    assert sorted(r.doc_id for r in out) == [1, 2, 4]
    by_id = {r.doc_id: r for r in out}
    assert by_id[4].n_terms_matched == 3
    assert by_id[1].n_terms_matched == 2
    assert by_id[2].n_terms_matched == 1
    # doc 4 (all three distinct terms, shortest doc) outranks the others;
    # single-common-term doc 2 is last
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [4, 1, 2]
    # ranks are dense from 1 and scores non-increasing
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    scores = [r.score_millibits for r in sorted(out, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)


def test_bm25_idf_downweights_common_terms(spark):
    # "spark" in every doc (low idf), "window" in one (high idf): for
    # equal tf and dl the rare term must contribute a higher score
    docs = _spark_docs(
        spark,
        [(i, "spark aaa bbb ccc") for i in range(1, 6)] + [(6, "window aaa bbb ccc")],
    )
    out = {r.doc_id: r for r in
           text.bm25_search(docs, query_terms=["spark", "window"]).collect()}
    assert out[6].score_millibits > out[1].score_millibits


def test_bpe_spark_matches_python_reference(spark):
    """Planted corpus incl. the 'aaa' overlap case: the Spark trainer's
    merge table must equal the pure-Python reference exactly."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import bpe

    corpus = {
        "aaa": 5,       # overlap: greedy left-to-right gives [aa, a]
        "aab": 3,
        "banana": 4,
        "bandana": 2,
        "ab": 7,
    }
    rows = [(i, " ".join([w] * c)) for i, (w, c) in enumerate(corpus.items())]
    docs = _spark_docs(spark, rows)
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe.bpe_train(docs, n_merges=6).collect()
    ]
    assert got == bpe.bpe_train_reference(corpus, n_merges=6)


def test_bpe_merge_fold_greedy_overlap(spark):
    """The fold's greedy rule directly: [a,a,a] + (a,a) -> [aa,a];
    [a,b,a,b] + (a,b) -> [ab,ab]."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.bpe import _merge_fold

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],)], ["syms"]
    )
    out = [r.m for r in df.select(_merge_fold(F.col("syms"), "a", "a").alias("m")).collect()]
    assert out[0] == ["aa", "a"]
    out2 = [r.m for r in df.select(_merge_fold(F.col("syms"), "a", "b").alias("m")).collect()]
    assert out2[1] == ["ab", "ab"]


def test_bpe_tokenize_compression_invariants(spark, docs):
    """Tokenizing with the trained table must never exceed the raw
    symbol stream, and totals must be consistent per doc."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import bpe

    rows = bpe.bpe_tokenize(docs.limit(50)).collect()
    assert rows
    for r in rows:
        assert r.n_words > 0
        # each word contributes at least 1 token and at most its raw run
        assert r.n_words <= r.n_tokens <= r.n_symbols_before
    # 8 merges on this corpus must actually compress something
    assert any(r.n_tokens < r.n_symbols_before for r in rows)


def test_graph_stats_counts_planted_triangle(spark):
    """Planted graph: one triangle (1,2,3) + a pendant edge (3,4).
    deg = [1:2, 2:2, 3:3, 4:1] -> wedges = 1+1+3+0 = 5, closure =
    3*1*1e6 // 5 = 600000."""
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["doc_a", "doc_b"]
    )
    r = dedup.graph_stats(pairs).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 4, 5, 1)
    assert r.closure_millionths == 600000


def test_graph_stats_counts_each_triangle_once(spark):
    """K4: C(4,3) = 4 triangles, each counted exactly once by the
    ordered 3-join; wedges = 4 * C(3,2) = 12, closure = 1e6."""
    import itertools

    edges = list(itertools.combinations(range(1, 5), 2))
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    r = dedup.graph_stats(pairs).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.closure_millionths == 1000000


def test_importance_weights_favor_target_distribution(spark, sf_dir):
    """DSIR sanity on the real fixtures: the mean importance of target-
    language (en) docs must exceed the mean of non-en docs — the whole
    point of the likelihood-ratio weight."""
    docs = load_table(spark, sf_dir, "documents")
    w = {r.doc_id: r.importance_millibits
         for r in text.importance_weights(docs).collect()
         if r.importance_millibits is not None}
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    en = [v for k, v in w.items() if langs[k] == "en"]
    other = [v for k, v in w.items() if langs[k] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_mmr_prefers_diverse_over_redundant(spark):
    """Planted geometry: candidates A and B are near-duplicates with the
    highest relevance; C is distinct with slightly lower relevance. Pure
    relevance ranks A, B; MMR must rank A then C (B's redundancy penalty
    sinks it)."""
    import math

    q = [1.0, 0.0, 0.0, 0.0]
    a = [0.99, 0.14, 0.0, 0.0]          # rel ~0.990
    b = [0.99, 0.141, 0.001, 0.0]       # near-dup of a, rel ~0.990
    c = [0.7, 0.0, 0.71, 0.0]           # diverse, rel ~0.70
    rows = [(0, q, 0), (10, a, 0), (11, b, 0), (12, c, 0)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    )
    out = similarity.mmr_rerank(emb, n_queries=1, n_cands=3, k=3).collect()
    order = [r.vec_id for r in sorted(out, key=lambda r: r.mmr_rank)]
    assert order[0] == 10          # best relevance first
    assert order[1] == 12          # diversity beats the near-duplicate
    assert order[2] == 11
    # scores are non-increasing never guaranteed for MMR, but rank-1
    # score must be lam*rel and all rows carry real relevance
    r1 = next(r for r in out if r.mmr_rank == 1)
    assert math.isclose(r1.mmr_score, 0.5 * r1.relevance, rel_tol=1e-12)


def test_hard_negatives_are_cross_label_with_margin(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = similarity.hard_negatives(emb).collect()
    assert rows
    for r in rows:
        assert r.anchor_label == labels[r.anchor_id]
        assert r.negative_label != r.anchor_label   # strictly cross-label
        assert -1.0001 <= r.cosine <= 1.0001
        # margin = cosine - best same-label cosine, so it must be
        # consistent within an anchor (same offset for every rank)
    by_anchor: dict = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for rs in by_anchor.values():
        offs = {round(r.cosine - r.margin_to_best_positive, 9) for r in rs}
        assert len(offs) == 1
        # ranks dense from 1, cosine non-increasing
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_patch_grid_matches_bruteforce(spark, docs):
    """ppm_patch_grid must reproduce the per-patch integer channel sums
    a brute-force loop over the fixture pixels computes — including the
    ragged right/bottom partial patches (fixture widths 4-8 and heights
    3-6 hit odd sizes in both axes)."""
    media = multimodal.docs_as_ppm_media(docs.limit(25))
    got = {
        (r.media_id, r.pr, r.pc): (r.n_px, r.sum_r, r.sum_g, r.sum_b)
        for r in multimodal.ppm_patch_grid(media).collect()
    }
    P = multimodal.PATCH
    expect = {}
    for mid in range(25):
        w, h = 4 + mid % 5, 3 + mid % 4
        for pr in range((h + P - 1) // P):
            for pc in range((w + P - 1) // P):
                rows = range(pr * P, min((pr + 1) * P, h))
                cols = range(pc * P, min((pc + 1) * P, w))
                sums = [
                    sum(
                        (mid * 31 + rr * 7 + cc * 3 + k) % 256
                        for rr in rows
                        for cc in cols
                    )
                    for k in (0, 11, 22)
                ]
                expect[(mid, pr, pc)] = (
                    len(rows) * len(cols), *sums
                )
    assert got == expect


# ---------------------------------------------------------------------------
# incremental LSH dedup (new batch vs indexed corpus)
# ---------------------------------------------------------------------------

def test_incremental_lsh_flags_planted_matches(spark):
    """Deterministic synthetic corpus: an exact duplicate shares every
    band, so a batch doc copying a corpus text MUST flag 'corpus' with
    the corpus doc_id, a batch doc copying an EARLIER batch doc flags
    'batch', and a unique batch doc flags 'new'. Corpus-only dups never
    appear (the incremental contract: only the new batch is reported)."""
    texts = {
        3: "alpha beta gamma delta epsilon zeta",
        4: "shared corpus duplicate text one two",
        5: "shared corpus duplicate text one two",   # corpus-internal dup
        6: "completely different corpus text here",
        7: "batch internal duplicate foo bar baz",   # batch (id%10==7)
        17: "batch internal duplicate foo bar baz",  # dup of 7
        27: "alpha beta gamma delta epsilon zeta",   # dup of corpus 3
        37: "a genuinely novel document with fresh words",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in dedup.incremental_lsh_flags(docs).collect()}
    assert set(out) == {7, 17, 27, 37}  # exactly the new batch
    assert out[27].match_kind == "corpus" and out[27].dup_of == 3
    assert out[17].match_kind == "batch" and out[17].dup_of == 7
    assert out[7].match_kind == "new" and out[7].dup_of is None
    assert out[37].match_kind == "new" and out[37].dup_of is None


def test_incremental_lsh_invariants_on_fixture(spark, docs):
    """Structural contract on the real fixture corpus: one row per new
    doc; dup_of always points at a smaller id; 'corpus' targets live
    outside the batch residue class, 'batch' targets inside it."""
    out = dedup.incremental_lsh_flags(docs).collect()
    n_new = docs.where(
        F.col("doc_id") % dedup.INCR_BATCH_MOD == dedup.INCR_BATCH_REM
    ).count()
    assert len(out) == n_new
    for r in out:
        if r.match_kind == "new":
            assert r.dup_of is None
        elif r.match_kind == "corpus":
            assert r.dup_of % dedup.INCR_BATCH_MOD != dedup.INCR_BATCH_REM
        else:
            assert r.match_kind == "batch"
            assert r.dup_of % dedup.INCR_BATCH_MOD == dedup.INCR_BATCH_REM
            assert r.dup_of < r.doc_id
