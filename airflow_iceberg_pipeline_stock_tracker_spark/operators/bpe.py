"""BPE tokenizer training — the core LLM-data operation the reference's
domain (a training-data pipeline at scale) ultimately feeds.

Classic byte-pair encoding (Sennrich et al. 2016, the public algorithm
behind GPT-2/RoBERTa-style vocabularies): start from characters (plus an
end-of-word marker), repeatedly find the most frequent adjacent symbol
pair across the corpus and merge it, recording the merge table — the
merge table IS the tokenizer.

Spark-first shape:
  * the corpus collapses to a (word, count) table first — bounded by
    VOCABULARY (Zipf), not corpus size, so at 100 TB the iterative state
    is a few million rows regardless of input rows;
  * each round is ONE aggregation (adjacent-pair counts weighted by word
    count) + a driver collect of exactly ONE row (the argmax pair —
    bounded metadata, per the repo's collect rule) + ONE distributed
    array rewrite (a JVM higher-order fold, no Python);
  * `localCheckpoint` cuts lineage each round, as in the PageRank loop.

Greedy merge semantics (matters for "aaa" with pair (a,a)): occurrences
merge left-to-right, non-overlapping — "aaa" -> ["aa", "a"]. The fold
implements this directly; the DuckDB oracle implements the same rule as
gaps-and-islands parity (within each maximal run of consecutive match
positions, every odd-offset occurrence merges), and the two are
cross-checked by hash at two SFs plus a pure-Python reference pytest.

Determinism: pair counts are exact integers; the argmax tie-break is
(count DESC, left ASC, right ASC) in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texthash import tokens

END_MARK = "</w>"
N_MERGES = 8


def _merge_fold(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) in a symbol array, as a JVM aggregate fold: append
    each symbol unless it is `right` and the accumulator's last element
    is `left` — then replace that last element with the merged symbol.
    A chain like [a,a,a] with (a,a) yields [aa,a]: after the first
    merge the tail is "aa" != "a", so overlap is impossible."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _char_syms(word_col: str):
    """chars + end marker for a word column — the canonical initial
    symbol sequence. ONE definition (r16 review finding): word_table
    (training) and bpe_encode_pinned (artifact apply) must split words
    identically or round-trip parity breaks."""
    return F.concat(
        F.filter(F.split(word_col, ""), lambda c: c != F.lit("")),
        F.array(F.lit(END_MARK)),
    )


def _doc_words(docs: DataFrame) -> DataFrame:
    """(doc_id, widx, w): the positioned non-empty word stream — shared
    by bpe_encode (retrain-per-query) and bpe_encode_pinned (artifact
    apply), whose outputs are contractually bit-identical."""
    return (
        docs.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(tokens(F.lower(F.col("text")))).alias("widx", "w"),
        )
        .where(F.length("w") > 0)
    )


def word_table(docs: DataFrame) -> DataFrame:
    """(w, syms array<string>, wcount): per-distinct-word symbol
    sequences (chars + end marker) weighted by corpus frequency."""
    return (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .select("w", _char_syms("w").alias("syms"), "wcount")
    )


# Checkpoint the folded word state every K merge rounds instead of every
# round (r16, guide §1.2 "per-task work" / job-count reduction): a round
# without a checkpoint re-evaluates at most K-1 extra interpreted fold
# levels over the VOCABULARY-bounded word table in the next pair-count
# job — bounded work at any corpus scale because the word table is
# distinct-word-sized — while each skipped checkpoint saves a scheduled
# job. K=4 measured 3.2s -> 2.4s for the 8-round sf0.1 train with a
# bit-identical merge table; at K rounds per checkpoint the recompute
# never exceeds K fold levels, so the cadence is scale-safe, not a
# local[32] tune.
TRAIN_CKPT_EVERY = 4


def _train(
    docs: DataFrame, n_merges: int
) -> tuple[list[tuple], DataFrame]:
    """Run the merge loop; returns (merge table rows, final word state —
    (w, syms, wcount) after all merges)."""
    words = word_table(docs).localCheckpoint()
    out: list[tuple] = []
    pending = 0
    for r in range(1, n_merges + 1):
        n = F.size("syms")
        # guard: sequence(0, -1) would generate a DESCENDING sequence for
        # a word already fused to one symbol — emit no pairs instead
        idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
            F.array().cast("array<int>")
        )
        pairs = words.select(
            "wcount",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.get("syms", i).alias("a"),
                        F.get("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("wcount").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:  # every word fused to a single symbol
            break
        a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
        out.append((r, a, b, a + b, cnt))
        words = words.select(
            "w", _merge_fold(F.col("syms"), a, b).alias("syms"), "wcount"
        )
        pending += 1
        if pending >= TRAIN_CKPT_EVERY:
            words = words.localCheckpoint()
            pending = 0
    if pending:
        # the returned word state must stay materialized: its consumers
        # (vocab derivation, the encode broadcast) would otherwise
        # re-inline the trailing fold levels per consumer
        words = words.localCheckpoint()
    return out, words


def bpe_train(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(merge_rank, left, right, merged, pair_count): the trained merge
    table, one row per round in training order."""
    out, _words = _train(docs, n_merges)
    from ..sources.tables import local_df

    return local_df(
        docs.sparkSession,
        out,
        "merge_rank int, left string, right string, merged string, "
        "pair_count bigint",
    )


def bpe_tokenize(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(doc_id, n_words, n_symbols_before, n_tokens): tokenize the corpus
    with the freshly-trained merge table — the apply half of the
    tokenizer. n_symbols_before counts the pre-merge symbol stream
    (chars + end marker per word); n_tokens counts it after all merges,
    so n_tokens <= n_symbols_before and the gap is the compression the
    vocabulary buys.

    Scale shape: the trained word state is vocabulary-bounded, so the
    doc-side join is a broadcast of (word -> token count) — corpus rows
    stream once, no shuffle of text."""
    _, words = _train(docs, n_merges)
    counts = words.select("w", F.size("syms").alias("n_toks"))
    doc_words = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w")
    ).where(F.length("w") > 0)
    return (
        doc_words.join(F.broadcast(counts), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w") + F.lit(1)).alias("n_symbols_before"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def bpe_encode(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(doc_id, widx, sidx, token_id, token): ENCODE the corpus with the
    freshly-trained merge table — the actual token-id stream a
    pre-training pipeline feeds to text_pack_shards (r14 verdict ask
    #7; bpe_tokenize above reports only per-doc counts).

    widx is the word's 0-based position in the doc's whitespace split,
    sidx the token's 0-based position within the word's final symbol
    sequence; token_id is the symbol's 0-based rank in the
    lexicographically-ordered final vocabulary (deterministic in both
    engines — real tokenizers ship an id table the same way).

    Scale shape: the trained word state and the vocab table are
    VOCABULARY-bounded (Zipf), so both attach to the doc-side word
    stream as broadcast joins — the corpus streams once with no text
    shuffle, and output is the token stream itself (linear by
    definition). The global vocab row_number window runs on |vocab|
    rows, never on data.
    """
    from pyspark.sql import Window

    _, words = _train(docs, n_merges)
    words = words.select("w", "syms").persist()
    words.count()  # read twice below: vocab derivation + the word join
    vocab = (
        words.select(F.explode("syms").alias("token"))
        .distinct()
        .withColumn(
            "token_id",
            (F.row_number().over(Window.orderBy("token")) - 1).cast(
                "bigint"
            ),
        )
    )
    doc_words = _doc_words(docs)
    out = (
        doc_words.join(F.broadcast(words), "w")
        .select("doc_id", "widx", F.posexplode("syms").alias("sidx", "token"))
        .join(F.broadcast(vocab), "token")
        .select(
            "doc_id",
            F.col("widx").cast("bigint").alias("widx"),
            F.col("sidx").cast("bigint").alias("sidx"),
            "token_id",
            "token",
        )
        .orderBy("doc_id", "widx", "sidx")
    )
    out = out.localCheckpoint(eager=True)
    words.unpersist()
    return out


def bpe_write_artifact(
    docs: DataFrame, path: str, n_merges: int = N_MERGES
) -> None:
    """Train the tokenizer and persist it as a versioned ARTIFACT
    (r15 verdict ask #4): `merges` (the ordered merge table — the
    tokenizer itself) and `vocab` (token -> id, lexicographic rank of
    the final symbol set) as parquet under ``path``. A production
    pipeline trains once, ships this pair, and every batch/stream
    encoder reads it — the vocabulary is a pinned artifact, never
    recomputed per batch."""
    out, words = _train(docs, n_merges)
    spark = docs.sparkSession
    from ..sources.tables import local_df

    merges = local_df(
        spark,
        out,
        "merge_rank int, left string, right string, merged string, "
        "pair_count bigint",
    )
    merges.coalesce(1).write.mode("overwrite").parquet(f"{path}/merges")
    from pyspark.sql import Window

    vocab = (
        words.select(F.explode("syms").alias("token"))
        .distinct()
        .withColumn(
            "token_id",
            (F.row_number().over(Window.orderBy("token")) - 1).cast("bigint"),
        )
    )
    vocab.coalesce(1).write.mode("overwrite").parquet(f"{path}/vocab")


def bpe_encode_pinned(docs: DataFrame, path: str) -> DataFrame:
    """ENCODE a corpus under a persisted tokenizer artifact — the
    production shape (train once, encode forever), vs bpe_encode's
    self-contained retrain-per-query. Output is bit-identical to
    bpe_encode on the training corpus (pinned by the registered row's
    oracle, which IS bpe_encode's: replaying the merge table in rank
    order on each distinct word reproduces the trained word state
    exactly, because training itself is that same fold sequence).

    Scale shape: the merge table is a bounded driver collect
    (n_merges rows); the vocab broadcasts (vocabulary-bounded); the
    merge replay runs on the DISTINCT-word table of the incoming batch
    (Zipf-bounded), then attaches to the word stream as a broadcast
    join — the corpus streams once, no text shuffle. Tokens outside
    the artifact's vocabulary would drop at the inner vocab join (the
    standard closed-vocab contract; cannot occur when the corpus'
    characters are covered, as on the training corpus itself)."""
    spark = docs.sparkSession
    merges = sorted(
        (
            (int(r.merge_rank), r.left, r.right)
            for r in spark.read.parquet(f"{path}/merges").collect()
        )
    )
    vocab = spark.read.parquet(f"{path}/vocab")
    words = (
        _doc_words(docs)
        .select("w")
        .distinct()
        .select("w", _char_syms("w").alias("syms"))
    )
    for _rank, a, b in merges:
        words = words.select(
            "w", _merge_fold(F.col("syms"), a, b).alias("syms")
        )
    # Materialize the replayed word state BEFORE it feeds the broadcast
    # join (optimization guide §7.2 "duplicated subtrees"): without the
    # barrier, CollapseProject inlines the n_merges-deep aggregate-fold
    # expression tree past the distinct and the join, so Spark evaluates
    # it once per word OCCURRENCE (plus once more in the generated
    # not-null/size filter) instead of once per DISTINCT word — measured
    # 13.7s -> 3.8s for the sf0.1 encode. The checkpoint is one job over
    # the vocabulary-bounded distinct-word table.
    words = words.localCheckpoint(eager=True)
    doc_words = _doc_words(docs)
    return (
        doc_words.join(F.broadcast(words), "w")
        .select("doc_id", "widx", F.posexplode("syms").alias("sidx", "token"))
        .join(F.broadcast(vocab), "token")
        .select(
            "doc_id",
            F.col("widx").cast("bigint").alias("widx"),
            F.col("sidx").cast("bigint").alias("sidx"),
            "token_id",
            "token",
        )
        .orderBy("doc_id", "widx", "sidx")
    )


def bpe_encode_artifact_roundtrip(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """The registered artifact round-trip row: train on the documents
    fixture, WRITE the tokenizer artifact, READ it back, and encode the
    corpus under the pinned vocabulary. The oracle is bpe_encode's
    (BPE_ENCODE_SQL) — a hash-green round proves persisted-artifact
    encoding == in-query retraining, which is exactly the contract a
    production pipeline relies on when it pins a tokenizer version.

    The artifact lands under the session's warehouse dir keyed by the
    fixture name (deterministic, overwritten per run — the 'current
    tokenizer version' slot)."""
    import os

    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    path = os.path.join(
        wh, "bpe_tokenizer", os.path.basename(sf_dir.rstrip("/"))
    )
    bpe_write_artifact(docs, path, n_merges)
    return bpe_encode_pinned(docs, path).localCheckpoint(eager=True)


def bpe_encode_reference(
    doc_texts: dict[int, str], n_merges: int = N_MERGES
):
    """Pure-Python reference (pytest ground truth): train via
    bpe_train_reference's loop, then encode each doc with the final
    per-word symbol state and the lexicographic vocab ids.

    Whitespace semantics mirror the ENGINES, not Python's defaults
    (r15 code-review finding): the engines split trim(lower(text)) on
    ASCII ``\\s+`` where trim strips SPACES only, so a doc starting
    with a tab/newline keeps a leading empty token (widx 0 stays
    unoccupied after the length filter) and Unicode whitespace
    (e.g. NBSP) does NOT split. Python's ``.strip().split()`` would
    disagree on both, so the reference uses the same space-trim +
    ASCII-``\\s+`` split."""
    import re

    word_counts: dict[str, int] = {}
    split_docs: dict[int, list[str]] = {}
    for doc_id, t in doc_texts.items():
        if t is None:
            continue
        ws = re.split(r"\s+", t.lower().strip(" "), flags=re.ASCII)
        split_docs[doc_id] = ws
        for w in ws:
            if w:
                word_counts[w] = word_counts.get(w, 0) + 1
    table = bpe_train_reference(word_counts, n_merges)
    syms_of = {w: list(w) + [END_MARK] for w in word_counts}
    for _, a, b, merged, _cnt in table:
        for w, syms in syms_of.items():
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = merged
                else:
                    acc.append(x)
            syms_of[w] = acc
    vocab = sorted({s for syms in syms_of.values() for s in syms})
    tid = {s: i for i, s in enumerate(vocab)}
    out = []
    for doc_id, ws in split_docs.items():
        for widx, w in enumerate(ws):
            if not w:
                continue
            for sidx, s in enumerate(syms_of[w]):
                out.append((doc_id, widx, sidx, tid[s], s))
    return sorted(out)


def bpe_train_reference(word_counts: dict[str, int], n_merges: int = N_MERGES):
    """Pure-Python reference (pytest ground truth): same algorithm, same
    tie-break, same greedy rewrite."""
    words = [
        (list(w) + [END_MARK], c) for w, c in sorted(word_counts.items())
    ]
    table = []
    for r in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        table.append((r, a, b, a + b, cnt))
        new_words = []
        for syms, c in words:
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            new_words.append((acc, c))
        words = new_words
    return table


def _bpe_cte_chain(n_merges: int) -> str:
    """The shared unrolled-round CTE chain: per round, pair counts +
    argmax via ORDER BY ... LIMIT 1, then the greedy rewrite as
    gaps-and-islands parity (odd-offset occurrences within each run of
    consecutive match positions merge; the following position is
    consumed). Every CTE is MATERIALIZED — plain CTEs inline, and each
    round references its predecessor several times, so inlining would
    duplicate the scan tree exponentially (2^rounds parquet opens)."""
    ctes = [
        f"""w1 AS MATERIALIZED (
  SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS wid,
         CAST(COUNT(*) AS BIGINT) AS wcount,
         list_append(string_split(w, ''), '{END_MARK}') AS syms
  FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM documents
  ) WHERE length(w) > 0
  GROUP BY w
)"""
    ]
    for r in range(1, n_merges + 1):
        ctes.append(f"""pos{r} AS MATERIALIZED (
  SELECT w, wid, wcount, syms,
         unnest(range(1, len(syms) + 1)) AS i
  FROM w{r}
), pairs{r} AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i + 1] AS b,
         CAST(SUM(wcount) AS BIGINT) AS cnt
  FROM pos{r} WHERE i < len(syms)
  GROUP BY a, b
), best{r} AS MATERIALIZED (
  SELECT a, b, cnt FROM pairs{r} ORDER BY cnt DESC, a, b LIMIT 1
), flags{r} AS MATERIALIZED (
  SELECT w, wid, wcount, i, syms[i] AS tok,
         (i < len(syms) AND syms[i] = best.a AND syms[i + 1] = best.b) AS m
  FROM pos{r}, best{r} best
), runs{r} AS MATERIALIZED (
  SELECT wid, i,
         i - ROW_NUMBER() OVER (PARTITION BY wid ORDER BY i) AS run
  FROM flags{r} WHERE m
), sel{r} AS MATERIALIZED (
  SELECT wid, i,
         (ROW_NUMBER() OVER (PARTITION BY wid, run ORDER BY i) % 2 = 1)
           AS take
  FROM runs{r}
), w{r + 1} AS MATERIALIZED (
  SELECT f.w, f.wid, f.wcount,
         list(CASE WHEN COALESCE(s.take, FALSE)
                   THEN b2.a || b2.b ELSE f.tok END
              ORDER BY f.i) AS syms
  FROM flags{r} f
  LEFT JOIN sel{r} s ON s.wid = f.wid AND s.i = f.i
  LEFT JOIN sel{r} p ON p.wid = f.wid AND p.i = f.i - 1 AND p.take
  CROSS JOIN best{r} b2
  WHERE p.i IS NULL
  GROUP BY f.w, f.wid, f.wcount
)""")
    return "WITH " + ",\n".join(ctes)


def bpe_oracle_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB twin of :func:`bpe_train`."""
    unions = "\nUNION ALL ".join(
        f"SELECT {r} AS merge_rank, a AS left_, b, cnt FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        _bpe_cte_chain(n_merges)
        + f"""
SELECT CAST(merge_rank AS INTEGER) AS merge_rank,
       left_ AS "left", b AS "right", left_ || b AS merged,
       cnt AS pair_count
FROM ({unions})
ORDER BY merge_rank
"""
    )


def bpe_tokenize_oracle_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB twin of :func:`bpe_tokenize`: train through the same
    unrolled chain, then join the final per-word token counts back to
    each document's word stream."""
    return (
        _bpe_cte_chain(n_merges)
        + f""",
final_counts AS MATERIALIZED (
  SELECT w, CAST(len(syms) AS BIGINT) AS n_toks FROM w{n_merges + 1}
), doc_words AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(d.w) + 1) AS BIGINT) AS n_symbols_before,
       CAST(SUM(f.n_toks) AS BIGINT) AS n_tokens
FROM doc_words d JOIN final_counts f USING (w)
WHERE length(d.w) > 0
GROUP BY d.doc_id
ORDER BY d.doc_id
"""
    )


def bpe_encode_oracle_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB twin of :func:`bpe_encode`: train through the same
    unrolled chain, rank the final vocabulary lexicographically, and
    emit each document's positioned token stream."""
    return (
        _bpe_cte_chain(n_merges)
        + f""",
vocab AS MATERIALIZED (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS BIGINT)
           AS token_id
  FROM (SELECT DISTINCT unnest(syms) AS token FROM w{n_merges + 1})
), doc_words AS MATERIALIZED (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS widx, words[i] AS w
  FROM (
    SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i
    FROM (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS words
      FROM documents WHERE text IS NOT NULL
    )
  ) WHERE length(words[i]) > 0
), doc_syms AS (
  SELECT doc_id, widx, CAST(i - 1 AS BIGINT) AS sidx, syms[i] AS token
  FROM (
    SELECT d.doc_id, d.widx, fw.syms,
           unnest(range(1, len(fw.syms) + 1)) AS i
    FROM doc_words d JOIN w{n_merges + 1} fw ON fw.w = d.w
  )
)
SELECT ds.doc_id, ds.widx, ds.sidx, v.token_id, ds.token
FROM doc_syms ds JOIN vocab v USING (token)
ORDER BY ds.doc_id, ds.widx, ds.sidx
"""
    )
