"""Training-data operators over `documents`/`embeddings` (+X9 cleaner),
each with a DuckDB oracle twin.

Near-dup queries *construct* duplicates in-query (append a mutated
copy of low-id docs) so the operators demonstrably find pairs on the
otherwise-unique synthetic corpus — same construction in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pero_ocr_api_spark.functions import text_stats as ts
from pero_ocr_api_spark.operators import similarity
from pero_ocr_api_spark.functions.html_clean import (
    clean_html_col,
    duckdb_clean_html_sql,
)
from pero_ocr_api_spark.functions.portable import duckdb_round_bin, round_bin
from pero_ocr_api_spark.operators import dedup
from pero_ocr_api_spark.sources.tables import read_table

DUP_OFFSET = 1_000_000
N_DUP_DOCS = 40  # doc_id < 40 get a mutated twin
MUTATION_SUFFIX = " near duplicate suffix"

# Cache hygiene (mirrors plans.extract's release_run): several queries
# cache an intermediate (LSH bands before their self-join, shingle
# sets verified twice, winnow gram arrays). Entries are bounded per
# query and deduplicated by plan in Spark's CacheManager, but a
# long-lived session that runs many queries should call
# release_query_caches() between batches to keep storage flat.
_QUERY_CACHES: list[DataFrame] = []


def _tracked_cache(df: DataFrame) -> DataFrame:
    df = df.cache()
    _QUERY_CACHES.append(df)
    return df


def release_query_caches() -> None:
    """Unpersist every cache created by the queries in this module
    (including the shared mega-bucket bands, the trained-IVF centroid
    table, and the similarity operators' internal caches).

    Honest caveat on the IVF store: trained centroids come from
    ``localCheckpoint`` (not ``.cache()``), and ``unpersist()`` is a
    no-op on checkpointed plans — their blocks (nlist ≈ 16 rows, i.e.
    negligible) are freed by the ContextCleaner once this registry
    drops the last reference, which the ``clear()`` below does."""
    for df in _QUERY_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _QUERY_CACHES.clear()
    for store in (_MEGA_BANDS_CACHE, _IVF_CENTS_CACHE):
        for df in store.values():
            try:
                df.unpersist()
            except Exception:
                pass
        store.clear()
    similarity.release_similarity_caches()

HTML_PRE = (
    "<html><head><script>var t=1;</script></head><body>"
    "<nav>Home | <a href='/a'>About</a></nav><p>"
)
HTML_POST = "</p><div><a href='/x'>x</a> <a href='/y'>y</a></div><footer>(c) 2024</footer></body></html>"


def _docs(spark, sf):
    return read_table(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source", "n_chars"
    )


def _with_dups(docs: DataFrame) -> DataFrame:
    twins = docs.filter(F.col("doc_id") < N_DUP_DOCS).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(MUTATION_SUFFIX)).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(twins)


SQL_WITH_DUPS = f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL
SELECT doc_id + {DUP_OFFSET}, text || '{MUTATION_SUFFIX}', lang, source, n_chars
FROM documents WHERE doc_id < {N_DUP_DOCS}
"""


# --- X9: HTML cleaner over documents ---------------------------------------
def q_clean_html_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Wrap each doc in a deterministic boilerplate shell, clean it,
    emit the recovered length — X9 end to end, JVM-only."""
    docs = _docs(spark, sf)
    html = F.concat(F.lit(HTML_PRE), F.col("text"), F.lit(HTML_POST))
    cleaned = clean_html_col(html)
    return docs.select(
        "doc_id",
        F.length(cleaned).alias("clean_len"),
        (F.length(cleaned) == F.length(F.col("text"))).alias("roundtrip"),
    )


def _sql_clean_html_docs() -> str:
    pre = HTML_PRE.replace("'", "''")
    post = HTML_POST.replace("'", "''")
    html = f"'{pre}' || text || '{post}'"
    cleaned = duckdb_clean_html_sql(html)
    return f"""
SELECT doc_id, length({cleaned}) AS clean_len,
       (length({cleaned}) = length(text)) AS roundtrip
FROM documents
"""


# --- language ID ------------------------------------------------------------
def q_lang_guess_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return (
        docs.select("lang", ts.lang_guess_col(F.col("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("n_docs"))
    )


SQL_LANG_GUESS_COUNTS = f"""
SELECT lang, {ts.duckdb_lang_guess_sql('text')} AS guess, count(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


# --- quality scoring ---------------------------------------------------------
def q_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    q = ts.quality_score_col(F.col("text"))
    return docs.groupBy("source").agg(
        round_bin(F.sum(q), 4).alias("quality_sum"),
        F.count("*").alias("n_docs"),
    )


SQL_QUALITY_SCORES = f"""
SELECT source, {duckdb_round_bin(f"sum({ts.duckdb_quality_score_sql('text')})", 4)}
       AS quality_sum,
       count(*) AS n_docs
FROM documents GROUP BY source
"""


# --- token counting ----------------------------------------------------------
def q_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return docs.groupBy("lang").agg(
        F.sum(ts.token_count_col(F.col("text"))).alias("ws_tokens"),
        F.sum(ts.bpe_token_count_col(F.col("text"))).alias("bpe_tokens"),
    )


SQL_TOKEN_STATS = f"""
SELECT lang,
       CAST(sum({ts.duckdb_token_count_sql('text')}) AS BIGINT) AS ws_tokens,
       CAST(sum({ts.duckdb_bpe_token_count_sql('text')}) AS BIGINT) AS bpe_tokens
FROM documents GROUP BY lang
"""


# --- exact dedup -------------------------------------------------------------
def q_exact_dup_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via fingerprint groupBy: constructed exact twins
    (same text re-inserted) collapse to groups of 2."""
    docs = _docs(spark, sf)
    exact_twins = docs.filter(F.col("doc_id") < N_DUP_DOCS).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "text"
    )
    all_docs = docs.select("doc_id", "text").unionByName(exact_twins)
    fp = ts.fingerprint_col(F.col("text"))
    return (
        all_docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


SQL_EXACT_DUP_GROUPS = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM documents WHERE doc_id < {N_DUP_DOCS}
)
SELECT {ts.duckdb_fingerprint_sql('text')} AS fingerprint,
       count(*) AS n_copies, min(doc_id) AS keep_id
FROM all_docs
GROUP BY 1 HAVING count(*) > 1
"""


# --- MinHash + LSH near-dup ---------------------------------------------------
def q_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """shingle → minhash → band → bucket-join: candidate near-dup
    pairs among docs ∪ mutated twins."""
    all_docs = _with_dups(_docs(spark, sf))
    sigs = dedup.minhash_signatures(all_docs)
    # cached: the candidate join is a self-join of this DF
    bands = _tracked_cache(dedup.lsh_bands_df(sigs))
    return dedup.lsh_candidate_pairs(bands)


def _sql_bands_cte(
    source_cte: str = "all_docs", prefix: str = "", with_sized: bool = True
) -> str:
    """Shared CTE chain: source docs → shingle ints → sigs → bands.
    ``prefix`` namespaces the CTEs so two chains (e.g. corpus + batch
    in the incremental query) can coexist in one statement."""
    p = prefix
    ints = dedup.duckdb_shingle_ints_sql("text")
    sig = dedup.duckdb_minhash_from_ints_sql("ints")
    rows = dedup.MINHASH_K // dedup.LSH_BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_hash FROM {p}sigs".format(
            b=b,
            p=p,
            cols=" || '|' || ".join(
                f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(dedup.LSH_BANDS)
    )
    sized = (
        f",\n{p}sized AS ({dedup.duckdb_sized_cte_sql(p + 'bands')})"
        if with_sized
        else ""
    )
    return f"""
{p}sh_ints AS (SELECT doc_id, {ints} AS ints FROM {source_cte}),
{p}sigs AS (SELECT doc_id, {sig} AS sig FROM {p}sh_ints),
{p}bands AS ({band_rows}){sized}"""


def _sql_minhash_lsh_pairs() -> str:
    return f"""
WITH all_docs AS ({SQL_WITH_DUPS}),
{_sql_bands_cte()}
{dedup.duckdb_capped_pairs_sql()}
"""


# --- LSH skew guard: constructed mega-bucket ----------------------------------
MEGA_OFFSET = 2_000_000
N_MEGA = 500  # 500 boilerplate-identical docs → one 501-member bucket


def _with_mega(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """documents ∪ 500 exact copies of doc 0's text — the web-data
    boilerplate mega-group that blows up an uncapped LSH self-join."""
    copies = spark.range(N_MEGA).select(
        (F.lit(MEGA_OFFSET) + F.col("id")).alias("doc_id")
    )
    seed_text = docs.filter(F.col("doc_id") == 0).select("text")
    return docs.select("doc_id", "text").unionByName(copies.crossJoin(seed_text))


SQL_WITH_MEGA = f"""
SELECT doc_id, text FROM documents
UNION ALL
SELECT {MEGA_OFFSET} + r.range AS doc_id, d.text
FROM range({N_MEGA}) r CROSS JOIN (SELECT text FROM documents WHERE doc_id = 0) d
"""


# (session applicationId, sf_dir) -> cached bands DF. The pairs and
# histogram queries run over the SAME mega corpus; sharing one cached
# bands DF means the shingle+md5+minhash pipeline runs once instead of
# once per query (it was ~2x the combined cost). Bands rows are
# (doc_id, band_idx, band_hash) — a few hundred KB, bounded.
_MEGA_BANDS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _mega_bands(spark: SparkSession, sf: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf)
    bands = _MEGA_BANDS_CACHE.get(key)
    if bands is None:
        all_docs = _with_mega(spark, _docs(spark, sf))
        sigs = dedup.minhash_signatures(all_docs)
        bands = dedup.lsh_bands_df(sigs).cache()
        # one live session: drop stale keys, releasing their executor
        # storage (a bare clear() would leak the evicted DF's cache
        # blocks until GC when the session switches sf dirs)
        for old in _MEGA_BANDS_CACHE.values():
            try:
                old.unpersist()
            except Exception:
                pass
        _MEGA_BANDS_CACHE.clear()
        _MEGA_BANDS_CACHE[key] = bands
    return bands


def q_lsh_mega_bucket_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-guarded candidate pairs on the mega-bucket corpus: the
    501-member bucket collapses to a 500-row star around doc 0 instead
    of a 125k-row clique (operators/dedup.py:lsh_candidate_pairs)."""
    return dedup.lsh_candidate_pairs(_mega_bands(spark, sf)).filter(
        F.col("id2") >= MEGA_OFFSET
    )


def _sql_lsh_mega_bucket_pairs() -> str:
    return f"""
WITH all_docs AS ({SQL_WITH_MEGA}),
{_sql_bands_cte()}
SELECT id1, id2 FROM ({dedup.duckdb_capped_pairs_sql()})
WHERE id2 >= {MEGA_OFFSET}
"""


def q_lsh_bucket_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """The cap's metric surface: per band, bucket count, largest
    bucket, and how many buckets the star-guard truncated."""
    sizes = dedup.lsh_bucket_sizes(_mega_bands(spark, sf))
    return sizes.groupBy("band_idx").agg(
        F.count("*").alias("n_buckets"),
        F.max("bucket_n").alias("max_bucket_n"),
        F.sum(
            F.when(F.col("bucket_n") > dedup.MAX_BUCKET, 1).otherwise(0)
        ).alias("n_capped"),
    )


def _sql_lsh_bucket_histogram() -> str:
    return f"""
WITH all_docs AS ({SQL_WITH_MEGA}),
{_sql_bands_cte()}
SELECT band_idx, count(*) AS n_buckets, max(bucket_n) AS max_bucket_n,
       CAST(sum(CASE WHEN bucket_n > {dedup.MAX_BUCKET} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_capped
FROM (SELECT DISTINCT band_idx, band_hash, bucket_n FROM sized)
GROUP BY band_idx
"""


# --- SimHash -------------------------------------------------------------------
def q_simhash_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """16-bit simhash per doc, aggregated into bucket histogram."""
    docs = _docs(spark, sf)
    return (
        dedup.simhash_signatures(docs)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"))
    )


SQL_SIMHASH_BUCKETS = f"""
SELECT {dedup.duckdb_simhash_sql('text')} AS simhash, count(*) AS n_docs
FROM documents GROUP BY 1
"""


# --- SimHash near-pairs (Hamming <= 1 via bit-flip probe join) -----------------
NEAR_PAIR_BITS = 32  # 16-bit buckets collide quadratically; see operator doc


def q_simhash_near_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact re-inserted twins land in their originals' signature
    groups (hamming-0 star rows); distinct-signature flip probes add
    hamming-1 representative pairs — linear in corpus, never a
    within-group quadratic join."""
    docs = _docs(spark, sf)
    exact_twins = docs.filter(F.col("doc_id") < N_DUP_DOCS).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "text"
    )
    all_docs = docs.select("doc_id", "text").unionByName(exact_twins)
    sigs = dedup.simhash_signatures(all_docs, bits=NEAR_PAIR_BITS)
    return dedup.simhash_near_pairs(sigs, bits=NEAR_PAIR_BITS)


def _sql_simhash_near_pairs() -> str:
    sim = dedup.duckdb_simhash_sql("text", bits=NEAR_PAIR_BITS)
    flips = ", ".join(f"({1 << b})" for b in range(NEAR_PAIR_BITS))
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM documents WHERE doc_id < {N_DUP_DOCS}
),
sigs AS (SELECT doc_id, {sim} AS simhash FROM all_docs),
groups AS (SELECT simhash, min(doc_id) AS rep FROM sigs GROUP BY simhash),
star AS (
  SELECT g.rep AS id1, s.doc_id AS id2, 0 AS hamming
  FROM sigs s JOIN groups g USING (simhash)
  WHERE s.doc_id != g.rep
),
probes AS (
  SELECT rep AS id1, xor(simhash, f.v) AS probe
  FROM groups CROSS JOIN (VALUES {flips}) AS f(v)
),
cross_pairs AS (
  SELECT DISTINCT p.id1, g2.rep AS id2, 1 AS hamming
  FROM probes p JOIN groups g2 ON p.probe = g2.simhash
  WHERE p.id1 < g2.rep
)
SELECT id1, id2, hamming FROM star
UNION ALL
SELECT id1, id2, hamming FROM cross_pairs
"""


# --- n-gram Jaccard verification -------------------------------------------------
def q_ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Jaccard over shingle sets for the constructed twin pairs
    (the verify stage after LSH candidate generation)."""
    all_docs = _with_dups(_docs(spark, sf))
    sh = all_docs.select(
        "doc_id", dedup.shingles_col(F.col("text")).alias("sh")
    )
    pairs = (
        sh.filter(F.col("doc_id") < N_DUP_DOCS)
        .select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"))
        .join(
            sh.filter(F.col("doc_id") >= DUP_OFFSET).select(
                (F.col("doc_id") - DUP_OFFSET).alias("id1"),
                F.col("sh").alias("sh2"),
            ),
            "id1",
        )
    )
    return pairs.select(
        "id1",
        (F.col("id1") + DUP_OFFSET).alias("id2"),
        round_bin(dedup.jaccard_col(F.col("sh1"), F.col("sh2")), 4).alias(
            "jaccard"
        ),
    ).filter(F.col("jaccard") >= 0.3)


def _sql_ngram_jaccard_pairs() -> str:
    sh = dedup.duckdb_shingles_sql("text")
    jac = dedup.duckdb_jaccard_sql("a.sh", "b.sh")
    return f"""
WITH all_docs AS ({SQL_WITH_DUPS}),
shingled AS (SELECT doc_id, {sh} AS sh FROM all_docs)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       {duckdb_round_bin(jac, 4)} AS jaccard
FROM shingled a
JOIN shingled b ON b.doc_id = a.doc_id + {DUP_OFFSET}
WHERE a.doc_id < {N_DUP_DOCS}
  AND {duckdb_round_bin(jac, 4)} >= 0.3
"""


# --- winnowing fingerprint overlap (rolling-hash dedup family) ----------------
def q_winnow_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: Jaccard over the
    windowed-min fingerprint sets of each constructed twin pair —
    MOSS-style overlap detection; a suffix mutation must still share
    most fingerprints with its original."""
    all_docs = _with_dups(_docs(spark, sf))
    # Two-step winnowing with a materialization boundary: the one-shot
    # winnow_col expression inlines its md5-gram pipeline four times
    # and its Janino compile dominated this query (12-13 s at sf0.1
    # for 80 docs → ~5 s with the split; see
    # dedup.winnow_fingerprints). Bounded working set: only the
    # constructed twin pairs, never the corpus.
    fp = dedup.winnow_fingerprints(
        all_docs.filter(
            (F.col("doc_id") < N_DUP_DOCS) | (F.col("doc_id") >= DUP_OFFSET)
        ),
        tracker=_QUERY_CACHES,
    )
    pairs = (
        fp.filter(F.col("doc_id") < N_DUP_DOCS)
        .select(F.col("doc_id").alias("id1"), F.col("fp").alias("fp1"))
        .join(
            fp.filter(F.col("doc_id") >= DUP_OFFSET).select(
                (F.col("doc_id") - DUP_OFFSET).alias("id1"),
                F.col("fp").alias("fp2"),
            ),
            "id1",
        )
    )
    return pairs.select(
        "id1",
        (F.col("id1") + DUP_OFFSET).alias("id2"),
        round_bin(dedup.jaccard_col(F.col("fp1"), F.col("fp2")), 4).alias(
            "overlap"
        ),
    ).filter(F.col("overlap") >= 0.3)


def _sql_winnow_overlap() -> str:
    fp = dedup.duckdb_winnow_sql("text")
    jac = dedup.duckdb_jaccard_sql("a.fp", "b.fp")
    return f"""
WITH all_docs AS ({SQL_WITH_DUPS}),
fps AS (SELECT doc_id, {fp} AS fp FROM all_docs)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       {duckdb_round_bin(jac, 4)} AS overlap
FROM fps a
JOIN fps b ON b.doc_id = a.doc_id + {DUP_OFFSET}
WHERE a.doc_id < {N_DUP_DOCS}
  AND {duckdb_round_bin(jac, 4)} >= 0.3
"""


# --- similarity search (operators/similarity.py) ----------------------------------
N_QUERY_VECS = 5
TOP_K = 5
EMB_DIM = 64


def _query_ids(spark: SparkSession, sf: str) -> DataFrame:
    return (
        read_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERY_VECS)
        .select("vec_id")
    )


def q_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N query vectors
    (brute-force baseline; scale path is q_ann_topk)."""
    emb = read_table(spark, sf, "embeddings")
    return similarity.cosine_topk(emb, _query_ids(spark, sf), TOP_K, EMB_DIM)


def q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed approximate top-k (candidates share the query's
    random-hyperplane bucket — the equi-join ANN scale path)."""
    emb = read_table(spark, sf, "embeddings")
    return similarity.ann_topk(emb, _query_ids(spark, sf), TOP_K, EMB_DIM)


def _sql_ann_topk() -> str:
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, "
        f"{_duckdb_bucket_sql('v', similarity.ANN_TABLE_PLANES, t)} AS bucket FROM emb"
        for t in range(similarity.ANN_TABLES)
    )
    cos = "list_dot_product(a.v, q.v) / (a.norm * q.norm)"
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
),
bucketed AS ({per_table}),
qb AS (SELECT vec_id AS qid, t, bucket FROM bucketed WHERE vec_id < {N_QUERY_VECS}),
cand AS (
  SELECT DISTINCT qb.qid, b.vec_id
  FROM bucketed b JOIN qb USING (t, bucket)
  WHERE b.vec_id != qb.qid
),
sims AS (
  SELECT c.qid, c.vec_id, {duckdb_round_bin(cos, 4)} AS cosine
  FROM cand c JOIN emb a ON a.vec_id = c.vec_id JOIN emb q ON q.vec_id = c.qid
)
SELECT qid, vec_id, cosine, rn FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
"""


def q_ann_multiprobe_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-probe variant: each query also probes the Hamming-1
    buckets in every table (query-side-only fan-out — the recall
    amplifier for the LSH scale path)."""
    emb = read_table(spark, sf, "embeddings")
    return similarity.ann_topk_multiprobe(
        emb, _query_ids(spark, sf), TOP_K, EMB_DIM
    )


def _sql_ann_multiprobe_topk() -> str:
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, "
        f"{_duckdb_bucket_sql('v', similarity.ANN_TABLE_PLANES, t)} AS bucket FROM emb"
        for t in range(similarity.ANN_TABLES)
    )
    flips = ", ".join(
        ["(0)"] + [f"({1 << p})" for p in range(similarity.ANN_TABLE_PLANES)]
    )
    cos = "list_dot_product(a.v, q.v) / (a.norm * q.norm)"
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
),
bucketed AS ({per_table}),
qb AS (SELECT vec_id AS qid, t, bucket FROM bucketed WHERE vec_id < {N_QUERY_VECS}),
probes AS (
  SELECT qid, t, xor(bucket, f.flip) AS bucket
  FROM qb CROSS JOIN (VALUES {flips}) AS f(flip)
),
cand AS (
  SELECT DISTINCT p.qid, b.vec_id
  FROM bucketed b JOIN probes p USING (t, bucket)
  WHERE b.vec_id != p.qid
),
sims AS (
  SELECT c.qid, c.vec_id, {duckdb_round_bin(cos, 4)} AS cosine
  FROM cand c JOIN emb a ON a.vec_id = c.vec_id JOIN emb q ON q.vec_id = c.qid
)
SELECT qid, vec_id, cosine, rn FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
"""


# (session applicationId, sf_dir) -> trained+checkpointed centroid
# table (nlist rows). A production IVF index trains once per corpus;
# per-call training was the r3 perf regression (2.7 s -> 7.7 s).
# Same single-live-entry policy as _MEGA_BANDS_CACHE.
_IVF_CENTS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _ivf_cents(spark: SparkSession, sf: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf)
    cents = _IVF_CENTS_CACHE.get(key)
    if cents is None:
        emb = read_table(spark, sf, "embeddings")
        cents = similarity.trained_centroids(emb)
        for old in _IVF_CENTS_CACHE.values():
            try:
                old.unpersist()
            except Exception:
                pass
        _IVF_CENTS_CACHE.clear()
        _IVF_CENTS_CACHE[key] = cents
    return cents


def q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN: nlist coarse cells (inverted file), nprobe-cell query
    fan-out, exact re-score inside probed cells — the trained-
    quantizer counterpart to the LSH path. Centroids are k-means
    trained (spread sample + Lloyd) and reproduced bit-for-bit by the
    oracle via 2^-16-grid exact arithmetic; training is amortized per
    (session, corpus) via _ivf_cents — an index trains once, queries
    pay only assignment+probe."""
    emb = read_table(spark, sf, "embeddings")
    return similarity.ivf_topk(
        emb, _query_ids(spark, sf), TOP_K, EMB_DIM,
        centroids=_ivf_cents(spark, sf),
    )


def _sql_ivf_topk() -> str:
    ccos = duckdb_round_bin(
        "list_dot_product(e.v, c.cv) / (e.norm * c.cn)", 4
    )
    cos = "list_dot_product(a.v, q.v) / (a.norm * q.norm)"
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
),
{similarity.duckdb_ivf_cents_cte_sql(EMB_DIM)},
assigned AS (
  SELECT vec_id, cell, rn FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {ccos} DESC, c.cell) AS rn
    FROM emb e CROSS JOIN cents c)
),
cells AS (SELECT vec_id, cell FROM assigned WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS qid, cell FROM assigned
  WHERE rn <= {similarity.IVF_NPROBE} AND vec_id < {N_QUERY_VECS}
),
cand AS (
  SELECT DISTINCT q.qid, cl.vec_id
  FROM cells cl JOIN qprobe q USING (cell)
  WHERE cl.vec_id != q.qid
),
sims AS (
  SELECT c.qid, c.vec_id, {duckdb_round_bin(cos, 4)} AS cosine
  FROM cand c JOIN emb a ON a.vec_id = c.vec_id JOIN emb q ON q.vec_id = c.qid
)
SELECT qid, vec_id, cosine, rn FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
"""


def _sql_cosine_topk() -> str:
    dot = "list_dot_product(a.v, q.v)"
    cos = f"{dot} / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v)))"
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v FROM emb WHERE vec_id < {N_QUERY_VECS}),
sims AS (
  SELECT q.qid, a.vec_id, {duckdb_round_bin(cos, 4)} AS cosine
  FROM emb a, q WHERE a.vec_id != q.qid
)
SELECT qid, vec_id, cosine, rn FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
"""


# --- embedding-cosine near-dup (the 5th dedup family) ------------------------------
NEARDUP_OFFSET = 100_000
N_NEARDUP = 20
NEARDUP_THRESHOLD = 0.999


def q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate detection by embedding cosine: constructed
    scaled twins (same direction ⇒ cosine 1.0) must pair with their
    originals above the threshold. Candidates come from the LSH
    buckets (scaled twins share all sign buckets with the original),
    so this composes the ANN machinery into the dedup family."""
    emb = read_table(spark, sf, "embeddings")
    twins = emb.filter(F.col("vec_id") < N_NEARDUP).select(
        (F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.1).alias("embedding"),
        "label",
    )
    all_emb = emb.unionByName(twins)
    qids = all_emb.filter(F.col("vec_id") >= NEARDUP_OFFSET).select("vec_id")
    top1 = similarity.ann_topk(all_emb, qids, 1, EMB_DIM)
    return top1.filter(F.col("cosine") >= NEARDUP_THRESHOLD).select(
        (F.col("qid") - NEARDUP_OFFSET).alias("orig_id"),
        F.col("vec_id").alias("dup_of"),
        "cosine",
    )


def _sql_embedding_near_dup() -> str:
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, "
        f"{_duckdb_bucket_sql('v', similarity.ANN_TABLE_PLANES, t)} AS bucket FROM emb"
        for t in range(similarity.ANN_TABLES)
    )
    cos = "list_dot_product(a.v, q.v) / (a.norm * q.norm)"
    return f"""
WITH all_emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {NEARDUP_OFFSET}, list_transform(embedding, x -> x * 1.1)
  FROM embeddings WHERE vec_id < {N_NEARDUP}
),
emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM all_emb
),
bucketed AS ({per_table}),
qb AS (SELECT vec_id AS qid, t, bucket FROM bucketed WHERE vec_id >= {NEARDUP_OFFSET}),
cand AS (
  SELECT DISTINCT qb.qid, b.vec_id FROM bucketed b JOIN qb USING (t, bucket)
  WHERE b.vec_id != qb.qid
),
sims AS (
  SELECT c.qid, c.vec_id, {duckdb_round_bin(cos, 4)} AS cosine
  FROM cand c JOIN emb a ON a.vec_id = c.vec_id JOIN emb q ON q.vec_id = c.qid
),
top1 AS (
  SELECT qid, vec_id, cosine FROM (
    SELECT *, row_number() OVER (
      PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn FROM sims
  ) WHERE rn = 1
)
SELECT qid - {NEARDUP_OFFSET} AS orig_id, vec_id AS dup_of, cosine
FROM top1 WHERE cosine >= {NEARDUP_THRESHOLD}
"""


# --- corpus-scale ANN self-join (no broadcast of either side) ----------------------


def q_ann_self_near_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Whole-corpus embedding near-pair discovery: corpus ∪ scaled
    twins, bucketed LSH *self*-join on (table, bucket) with the
    clique→star cap — the op a full-corpus embedding dedup needs,
    where the query side IS the corpus and nothing can be broadcast
    (operators/similarity.py:ann_self_pairs)."""
    emb = read_table(spark, sf, "embeddings")
    twins = emb.filter(F.col("vec_id") < N_NEARDUP).select(
        (F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.1).alias("embedding"),
        "label",
    )
    all_emb = emb.unionByName(twins)
    return similarity.ann_self_pairs(all_emb, NEARDUP_THRESHOLD, EMB_DIM)


def _sql_ann_self_near_pairs() -> str:
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS band_idx, "
        f"{_duckdb_bucket_sql('v', similarity.ANN_SELF_PLANES, t)} AS band_hash "
        f"FROM emb"
        for t in range(similarity.ANN_SELF_TABLES)
    )
    cos = "list_dot_product(a.v, b.v) / (a.norm * b.norm)"
    return f"""
WITH all_emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {NEARDUP_OFFSET}, list_transform(embedding, x -> x * 1.1)
  FROM embeddings WHERE vec_id < {N_NEARDUP}
),
emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM all_emb
),
bands AS ({per_table}),
sized AS ({dedup.duckdb_sized_cte_sql('bands', 'vec_id')}),
pairs AS ({dedup.duckdb_capped_pairs_sql('vec_id')})
SELECT p.id1, p.id2, {duckdb_round_bin(cos, 4)} AS cosine
FROM pairs p
JOIN emb a ON a.vec_id = p.id1
JOIN emb b ON b.vec_id = p.id2
WHERE {duckdb_round_bin(cos, 4)} >= {NEARDUP_THRESHOLD}
"""


def q_embedding_dedup_keep(spark: SparkSession, sf: str) -> DataFrame:
    """Composed 5th-family dedup keep-list: corpus ∪ scaled twins →
    ANN self-join near pairs → drop every id2 (keep-min-id, the same
    contract as the text `dedup_keep_list`) — the query shape the
    curate job's --embeddings stage runs, as an oracle-checked entry.
    One anti-join over the pair set; nothing broadcast by
    construction."""
    emb = read_table(spark, sf, "embeddings")
    twins = emb.filter(F.col("vec_id") < N_NEARDUP).select(
        (F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.1).alias("embedding"),
        "label",
    )
    all_emb = emb.unionByName(twins)
    pairs = similarity.ann_self_pairs(all_emb, NEARDUP_THRESHOLD, EMB_DIM)
    drops = pairs.select(F.col("id2").alias("vec_id")).distinct()
    return all_emb.select("vec_id").join(drops, "vec_id", "left_anti")


def _sql_embedding_dedup_keep() -> str:
    return f"""
WITH self_pairs AS ({_sql_ann_self_near_pairs()}),
all_ids AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + {NEARDUP_OFFSET} FROM embeddings
  WHERE vec_id < {N_NEARDUP}
)
SELECT vec_id FROM all_ids
WHERE vec_id NOT IN (SELECT id2 FROM self_pairs)
"""


def q_incremental_embedding_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (batch-vs-corpus) EMBEDDING dedup — the daily-drop
    shape for the embedding family, completing its production triangle
    (self-join `ann_self_near_pairs` → persistent index
    `plans/io.write_embedding_index` → this). A new batch (scaled
    twins of vec_id < N_NEARDUP, same direction ⇒ cosine 1.0) is
    sign-LSH-hashed and equi-joined against the CORPUS band index on
    (t, bucket) — the corpus is hashed once and reused (in production
    the bands live in the bucketed index table written by
    write_embedding_index, so only the batch is hashed per run; here
    the tracked-cached bands DF stands in for the index, exactly as in
    `incremental_dedup`). Candidates dedupe across tables before the
    exact-cosine verify, which joins vectors for CANDIDATE rows only —
    batch-linear, never corpus × batch."""
    emb = read_table(spark, sf, "embeddings")
    corpus = _tracked_cache(
        similarity._with_norm(emb).select("vec_id", "v", "norm")
    )
    batch = similarity._with_norm(
        emb.filter(F.col("vec_id") < N_NEARDUP).select(
            (F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
            F.transform("embedding", lambda x: x * 1.1).alias("embedding"),
        )
    ).select("vec_id", "v", "norm")

    def bands(e: DataFrame, id_alias: str) -> DataFrame:
        return e.select(
            F.col("vec_id").alias(id_alias),
            F.explode(
                similarity.bucket_struct_col(
                    F.col("v"),
                    EMB_DIM,
                    similarity.ANN_SELF_TABLES,
                    similarity.ANN_SELF_PLANES,
                )
            ).alias("b"),
        ).select(id_alias, "b.t", "b.bucket")

    # the persisted index stand-in: corpus hashed once, joined per batch
    c_bands = _tracked_cache(bands(corpus, "corpus_id"))
    cand = (
        bands(batch, "batch_id")
        .join(c_bands, ["t", "bucket"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    cos = round_bin(
        similarity.dot_col(F.col("v1"), F.col("v2"))
        / (F.col("n1") * F.col("n2")),
        4,
    )
    return (
        cand.join(
            batch.select(
                F.col("vec_id").alias("batch_id"),
                F.col("v").alias("v1"),
                F.col("norm").alias("n1"),
            ),
            "batch_id",
        )
        .join(
            corpus.select(
                F.col("vec_id").alias("corpus_id"),
                F.col("v").alias("v2"),
                F.col("norm").alias("n2"),
            ),
            "corpus_id",
        )
        .select("batch_id", "corpus_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_THRESHOLD)
    )


def _sql_incremental_embedding_dedup() -> str:
    def per_table(cte: str, id_alias: str) -> str:
        return " UNION ALL ".join(
            f"SELECT vec_id AS {id_alias}, {t} AS t, "
            f"{_duckdb_bucket_sql('v', similarity.ANN_SELF_PLANES, t)} AS bucket "
            f"FROM {cte}"
            for t in range(similarity.ANN_SELF_TABLES)
        )

    cos = "list_dot_product(b.v, c.v) / (b.norm * c.norm)"
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
),
batch AS (
  SELECT vec_id + {NEARDUP_OFFSET} AS vec_id,
         list_transform(embedding, x -> x * 1.1)::DOUBLE[] AS v,
         sqrt(list_dot_product(list_transform(embedding, x -> x * 1.1)::DOUBLE[],
                               list_transform(embedding, x -> x * 1.1)::DOUBLE[]))
           AS norm
  FROM embeddings WHERE vec_id < {N_NEARDUP}
),
c_bands AS ({per_table('corpus', 'corpus_id')}),
b_bands AS ({per_table('batch', 'batch_id')}),
cand AS (
  SELECT DISTINCT b.batch_id, c.corpus_id
  FROM b_bands b JOIN c_bands c USING (t, bucket)
)
SELECT cand.batch_id, cand.corpus_id, {duckdb_round_bin(cos, 4)} AS cosine
FROM cand
JOIN batch b ON b.vec_id = cand.batch_id
JOIN corpus c ON c.vec_id = cand.corpus_id
WHERE {duckdb_round_bin(cos, 4)} >= {NEARDUP_THRESHOLD}
"""


# --- kNN label vote over exact top-k ------------------------------------------------
def q_knn_label_vote(spark: SparkSession, sf: str) -> DataFrame:
    """Majority label among the exact top-5 neighbors per query
    (deterministic tie-break: count desc, label asc)."""
    emb = read_table(spark, sf, "embeddings")
    topk = similarity.cosine_topk(emb, _query_ids(spark, sf), TOP_K, EMB_DIM)
    labeled = topk.join(emb.select("vec_id", "label"), "vec_id")
    counts = labeled.groupBy("qid", "label").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("qid").orderBy(F.desc("votes"), "label")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("label").alias("predicted_label"), "votes")
    )


def _sql_knn_label_vote() -> str:
    return f"""
WITH topk AS ({_sql_cosine_topk()}),
counts AS (
  SELECT t.qid, e.label, count(*) AS votes
  FROM topk t JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
)
SELECT qid, label AS predicted_label, votes FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY votes DESC, label) AS rn FROM counts
) WHERE rn = 1
"""


# --- LSH bucket histogram (partition-key diagnostics) ------------------------------


def _duckdb_bucket_sql(
    v: str, planes: int = similarity.ANN_PLANES, table: int = 0
) -> str:
    terms = []
    for p, w in enumerate(similarity.hyperplanes(EMB_DIM, planes, table)):
        wl = "[" + ", ".join(f"{float(x)}" for x in w) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({v}, {wl}) >= 0 THEN {2**p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def q_ann_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: the partition key for
    cluster-scale ANN (search only within bucket)."""
    emb = similarity.as_double_vec(read_table(spark, sf, "embeddings"))
    return (
        emb.select(similarity.bucket_col(F.col("v"), EMB_DIM).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


SQL_ANN_LSH_BUCKETS = None  # filled below (needs the hyperplane literals)


def _sql_ann_lsh_buckets() -> str:
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT {_duckdb_bucket_sql('v')} AS bucket, count(*) AS n_vecs
FROM emb GROUP BY 1
"""


# --- composed curation pipelines ---------------------------------------------------


def q_dedup_keep_list(spark: SparkSession, sf: str) -> DataFrame:
    """Full dedup pass: drop exact-fingerprint duplicates, then drop
    LSH-candidate near-dups verified by Jaccard >= 0.5 (keep the
    lowest doc_id of each group) — the canonical two-stage
    cheap-filter → exact-verify shape. Emits per-lang keep counts."""
    all_docs = _with_dups(_docs(spark, sf))
    fp = all_docs.select(
        "doc_id", "lang", ts.fingerprint_col(F.col("text")).alias("fp")
    )
    w_exact = Window.partitionBy("fp").orderBy("doc_id")
    exact_kept = (
        fp.withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )
    # near-dup pairs among survivors: LSH candidates + Jaccard verify.
    # The bands DF self-joins and the shingle DF joins twice — cache
    # both so the shingle/md5 pipeline runs once, not once per branch.
    survivors = all_docs.join(exact_kept.select("doc_id"), "doc_id")
    sigs = dedup.minhash_signatures(survivors)
    bands = _tracked_cache(dedup.lsh_bands_df(sigs))
    pairs = dedup.lsh_candidate_pairs(bands)
    sh = _tracked_cache(
        survivors.select("doc_id", dedup.shingles_col(F.col("text")).alias("sh"))
    )
    verified = (
        pairs.join(sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1")), "id1")
        .join(sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2")), "id2")
        .filter(dedup.jaccard_col(F.col("sh1"), F.col("sh2")) >= 0.5)
        .select(F.col("id2").alias("doc_id"))  # id1 < id2: drop the higher
        .distinct()
    )
    kept = exact_kept.join(verified, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


def _sql_dedup_keep_list() -> str:
    sh = dedup.duckdb_shingles_sql("text")
    jac = dedup.duckdb_jaccard_sql("s1.sh", "s2.sh")
    return f"""
WITH all_docs AS ({SQL_WITH_DUPS}),
fp AS (
  SELECT doc_id, lang, {ts.duckdb_fingerprint_sql('text')} AS fp FROM all_docs
),
exact_kept AS (
  SELECT doc_id, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp
  ) WHERE rn = 1
),
survivors AS (SELECT a.* FROM all_docs a JOIN exact_kept USING (doc_id)),
{_sql_bands_cte('survivors')},
pairs AS ({dedup.duckdb_capped_pairs_sql()}),
shingled AS (SELECT doc_id, {sh} AS sh FROM survivors),
verified AS (
  SELECT DISTINCT p.id2 AS doc_id
  FROM pairs p
  JOIN shingled s1 ON s1.doc_id = p.id1
  JOIN shingled s2 ON s2.doc_id = p.id2
  WHERE {jac} >= 0.5
)
SELECT lang, count(*) AS n_kept
FROM exact_kept WHERE doc_id NOT IN (SELECT doc_id FROM verified)
GROUP BY lang
"""


# --- benchmark decontamination (n-gram overlap vs an eval set) ---------------
CONTAM_N = 8  # 8-gram window — the standard decontamination unit
N_BENCH_ITEMS = 10
CONTAM_WINDOW_TOKENS = 16
CONTAM_MIN_SHARED = 2


def q_benchmark_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Training-set decontamination: flag corpus docs sharing ≥2
    distinct 8-grams with any benchmark item. The benchmark set is
    constructed in-query (the middle 16 tokens of docs 0-9 — stand-ins
    for eval questions that leaked from the corpus), so the op
    demonstrably fires: each source doc must flag against its own
    benchmark item with all 9 window 8-grams shared.

    Scale shape: the benchmark side is small by definition (an eval
    suite) → broadcast; the corpus side is one scan + a flat
    position-explode of gram-hash OCCURRENCES (codegen projection —
    the per-gram ``transform`` lambda ran on the interpreted path and
    was ~20x slower, guide §4.1); per-doc set semantics are recovered
    AFTER the selective broadcast semi-join by counting DISTINCT
    shared hashes, so only matching rows pay the dedup. The hit count
    stays an integer aggregate — no floats anywhere."""
    docs = _docs(spark, sf)
    toks = dedup.tokens_col(F.col("text"))
    start = F.greatest(
        F.lit(1),
        (F.floor(F.size(toks) / 2) - (CONTAM_WINDOW_TOKENS // 2 - 1)).cast("int"),
    )
    mid = F.concat_ws(" ", F.slice(toks, start, CONTAM_WINDOW_TOKENS))
    bench = docs.filter(F.col("doc_id") < N_BENCH_ITEMS).select(
        F.col("doc_id").alias("bench_id"), mid.alias("btext")
    )
    bgrams = bench.select(
        "bench_id",
        F.explode(dedup.word_ngram_ints_col(F.col("btext"), CONTAM_N)).alias("h"),
    )
    cgrams = dedup.exploded_word_ngram_hashes(
        dedup.spread_to_parallelism(docs), CONTAM_N
    )
    hits = (
        cgrams.join(F.broadcast(bgrams), "h")
        .groupBy("doc_id", "bench_id")
        # distinct-count restores word_ngram_ints_col's per-doc set
        # semantics (count of DISTINCT shared grams) now that the
        # corpus stream keeps duplicate occurrences
        .agg(F.count_distinct(F.col("h")).alias("n_shared"))
    )
    return hits.filter(F.col("n_shared") >= CONTAM_MIN_SHARED)


def _sql_benchmark_contamination() -> str:
    toks = dedup.duckdb_tokens_sql("text")
    start = (
        f"greatest(1, CAST(floor(len({toks}) / 2) AS INTEGER) "
        f"- {CONTAM_WINDOW_TOKENS // 2 - 1})"
    )
    mid = (
        f"array_to_string(list_slice({toks}, {start}, "
        f"{start} + {CONTAM_WINDOW_TOKENS - 1}), ' ')"
    )
    return f"""
WITH bench AS (
  SELECT doc_id AS bench_id, {mid} AS btext
  FROM documents WHERE doc_id < {N_BENCH_ITEMS}
),
bgrams AS (
  SELECT bench_id, unnest({dedup.duckdb_word_ngram_ints_sql('btext', CONTAM_N)}) AS h
  FROM bench
),
cgrams AS (
  SELECT doc_id, unnest({dedup.duckdb_word_ngram_ints_sql('text', CONTAM_N)}) AS h
  FROM documents
)
SELECT c.doc_id, b.bench_id, count(*) AS n_shared
FROM cgrams c JOIN bgrams b USING (h)
GROUP BY 1, 2 HAVING count(*) >= {CONTAM_MIN_SHARED}
"""


# --- intra-document repetition filters (Gopher-style) ------------------------
# thresholds as integer cross-multiplications: frac > a/b ⟺ b*dups > a*total
REP_TOKEN_NUM, REP_TOKEN_DEN = 1, 2  # duplicate-token fraction > 1/2
REP_GRAM_NUM, REP_GRAM_DEN = 1, 20  # duplicate-3-gram fraction > 1/20


def q_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source counts of repetition-heavy documents (duplicate
    token / duplicate 3-gram fractions over thresholds) — the
    MassiveText/Gopher-style intra-doc repetition filter. All
    comparisons are integer cross-multiplications and all outputs are
    counts: no float crosses the engine boundary."""
    docs = _docs(spark, sf)
    toks = dedup.tokens_col(F.col("text"))
    n_tok = F.size(toks)
    nd_tok = F.size(F.array_distinct(toks))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_tok - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]),
    )
    grams = F.when(n_tok >= 3, grams).otherwise(F.array().cast("array<string>"))
    n_g = F.size(grams)
    nd_g = F.size(F.array_distinct(grams))
    flags = docs.select(
        "source",
        (
            F.lit(REP_TOKEN_DEN) * (n_tok - nd_tok)
            > F.lit(REP_TOKEN_NUM) * n_tok
        ).alias("tok_rep"),
        (
            (F.lit(REP_GRAM_DEN) * (n_g - nd_g) > F.lit(REP_GRAM_NUM) * n_g)
            & (n_g > 0)
        ).alias("gram_rep"),
    )
    return flags.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("tok_rep").cast("int")).alias("n_token_repetitive"),
        F.sum(F.col("gram_rep").cast("int")).alias("n_gram_repetitive"),
    )


def _sql_repetition_stats() -> str:
    toks = dedup.duckdb_tokens_sql("text")
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - 3, 0) + 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + 2), ' '))"
    )
    grams = f"(CASE WHEN len({toks}) >= 3 THEN {grams} ELSE [] END)"
    return f"""
WITH sized AS (
  SELECT source,
         len({toks}) AS n_tok,
         len(list_distinct({toks})) AS nd_tok,
         len({grams}) AS n_g,
         len(list_distinct({grams})) AS nd_g
  FROM documents
)
SELECT source, count(*) AS n_docs,
  CAST(sum(CASE WHEN {REP_TOKEN_DEN} * (n_tok - nd_tok)
                     > {REP_TOKEN_NUM} * n_tok THEN 1 ELSE 0 END) AS BIGINT)
    AS n_token_repetitive,
  CAST(sum(CASE WHEN {REP_GRAM_DEN} * (n_g - nd_g) > {REP_GRAM_NUM} * n_g
                 AND n_g > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_gram_repetitive
FROM sized GROUP BY source
"""


# --- corpus bigram LM quality scoring (CCNet-style) ---------------------------
def q_lm_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document add-one-smoothed bigram log-likelihood under the
    corpus's own bigram model (operators/lm.py) — the CCNet/KenLM
    quality-filter shape with the corpus as the model. sum_lp is an
    exact 2^-16-grid sum (order-independent); callers derive the
    perplexity proxy as exp(-sum_lp / n_bigrams)."""
    from pero_ocr_api_spark.operators.lm import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf))


def _sql_lm_quality_scores() -> str:
    from pero_ocr_api_spark.operators.lm import duckdb_bigram_lm_sql

    return duckdb_bigram_lm_sql("documents")


# --- corpus vocabulary + tokenization handoff ---------------------------------
def q_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic top-k corpus vocabulary (operators/lm.vocab_topk):
    TakeOrdered over map-side partial counts, ids assigned over the k
    retained rows only."""
    from pero_ocr_api_spark.operators.lm import vocab_topk

    return vocab_topk(_docs(spark, sf))


def _sql_vocab_topk() -> str:
    from pero_ocr_api_spark.operators.lm import VOCAB_K, duckdb_vocab_cte_sql

    return f"WITH {duckdb_vocab_cte_sql(VOCAB_K)} SELECT tok, token_id, n FROM vocab"


def q_tokenize_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenization handoff: encode every doc against the corpus's own
    top-k vocabulary (UNK = 0); ids_md5 fingerprints the ordered id
    stream so any two engines/cluster sizes agree iff the token
    sequences are identical (operators/lm.encode_docs)."""
    from pero_ocr_api_spark.operators.lm import encode_docs, vocab_topk

    docs = _docs(spark, sf)
    return encode_docs(docs, vocab_topk(docs))


def _sql_tokenize_corpus() -> str:
    from pero_ocr_api_spark.operators.lm import duckdb_encode_docs_sql

    return duckdb_encode_docs_sql()


# --- C4-style corpus line dedup + URL canonicalization dedup -------------------
LINE_HEADER = "subscribe to our newsletter for updates"
LINE_FOOTER = "copyright example corp all rights reserved"


def q_line_dedup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level LINE dedup (C4 §2.2 / RefinedWeb): every line
    keeps only its globally first occurrence. Constructed multi-line
    docs — a shared boilerplate header/footer around each doc's own
    text — so exactly one doc keeps the boilerplate and every doc's
    kept_md5 reassembles its surviving lines in order
    (operators/dedup.line_dedup)."""
    docs = _docs(spark, sf)
    ml = docs.select(
        "doc_id",
        F.concat_ws(
            "\n", F.lit(LINE_HEADER), F.col("text"), F.lit(LINE_FOOTER)
        ).alias("text"),
    )
    return dedup.line_dedup(ml)


def _sql_line_dedup_stats() -> str:
    return f"""
WITH ml AS (
  SELECT doc_id,
         '{LINE_HEADER}' || chr(10) || text || chr(10) || '{LINE_FOOTER}'
           AS text
  FROM documents
),
{dedup.duckdb_line_dedup_sql('ml')}
"""


def q_url_dedup_groups(spark: SparkSession, sf: str) -> DataFrame:
    """URL-level dedup after canonicalization (functions/urls.py):
    scheme+host case-folded, fragments and utm_* trackers stripped —
    synthesized re-crawl URLs (mixed-case host, tracking params,
    per-doc fragments) collapse into canonical groups keyed by the
    surviving (source, path, ref) triple; keep_doc = min doc_id per
    group, the crawl dedup contract. One scan + one hash aggregate."""
    from pero_ocr_api_spark.functions import urls

    docs = _docs(spark, sf)
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(
        F.lit("HTTPS://")
    )
    url = F.concat(
        scheme,
        F.col("source"),
        F.lit(".Example.COM/p/"),
        (F.col("doc_id") % 37).cast("string"),
        F.lit("?utm_campaign=spring&utm_medium=rss&ref="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("#section"),
        F.col("doc_id").cast("string"),
    )
    return (
        docs.select(
            urls.canonical_url_col(url).alias("canon_url"), "doc_id"
        )
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
        )
    )


def _sql_url_dedup_groups() -> str:
    from pero_ocr_api_spark.functions import urls

    raw = (
        "(CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END"
        " || source || '.Example.COM/p/' || CAST(doc_id % 37 AS VARCHAR)"
        " || '?utm_campaign=spring&utm_medium=rss&ref='"
        " || CAST(doc_id % 3 AS VARCHAR)"
        " || '#section' || CAST(doc_id AS VARCHAR))"
    )
    canon = urls.duckdb_canonical_url_sql(raw)
    return f"""
SELECT {canon} AS canon_url,
       count(*) AS n_docs,
       min(doc_id) AS keep_doc
FROM documents GROUP BY 1
"""


# --- distributed BPE (subword vocabulary training) -----------------------------
def q_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Learned BPE merge table (operators/bpe.bpe_train): bounded
    rounds of pair-count hash aggregate + deterministic argmax + fold
    merge application over the word-frequency table — the corpus is
    scanned ONCE; training never touches it again. (merge_rank, p1,
    p2) is the model artifact a production tokenizer ships."""
    from pero_ocr_api_spark.operators.bpe import bpe_merges

    return bpe_merges(_docs(spark, sf))


def _sql_bpe_merges() -> str:
    from pero_ocr_api_spark.operators.bpe import duckdb_bpe_merges_sql

    return duckdb_bpe_merges_sql()


def q_tokenize_corpus_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """Subword tokenization handoff: encode every doc against the
    corpus's own trained BPE segmentation (operators/bpe) — the
    merge-learned variant of `tokenize_corpus`. ids_md5 fingerprints
    the ordered piece-id stream."""
    from pero_ocr_api_spark.operators.bpe import (
        bpe_encode_docs,
        bpe_train,
        bpe_vocab,
    )

    docs = _docs(spark, sf)
    segments, _ = bpe_train(docs)
    return bpe_encode_docs(docs, segments, bpe_vocab(segments))


def _sql_tokenize_corpus_bpe() -> str:
    from pero_ocr_api_spark.operators.bpe import duckdb_bpe_encode_sql

    return duckdb_bpe_encode_sql()


# --- quality-weighted sampling (soft curation) ---------------------------------
def q_quality_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Soft curation: keep each doc with probability proportional to
    its quality score (DSIR-lite importance resampling — a hard
    threshold discards borderline docs entirely; weighting keeps the
    distribution smooth). The keep decision is the house deterministic
    coin (md5 hash vs an integer rate), the rate is floor(quality*100)
    — both engines compute the identical double product before the
    floor, so the decision is reproducible across engines, runs, and
    cluster sizes. One scan, map-side partials."""
    docs = _docs(spark, sf)
    q = ts.quality_score_col(F.col("text"))
    rate = F.floor(q * 100)
    u = dedup.md5_int_col(
        F.concat(F.lit("qsample|"), F.col("doc_id").cast("string")), 7
    )
    kept = (u * 100) < (rate * _SAMPLE_SPACE)
    return (
        docs.select("source", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
    )


def _sql_quality_weighted_sample() -> str:
    q = ts.duckdb_quality_score_sql("text")
    u = dedup.duckdb_md5_int_sql(
        "'qsample|' || CAST(doc_id AS VARCHAR)", 7
    )
    return f"""
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN ({u} * 100) < (floor({q} * 100) * {_SAMPLE_SPACE})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""


# --- sequence-packing index (pretraining data-loader handoff) -----------------
def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-packing placement index (operators/lm.pack_sequences):
    concatenated token stream cut every SEQ_LEN tokens, per-doc global
    offset + block span via the distributed exclusive prefix sum
    (scheduling.global_prefix_sum) — plan-tested to never funnel data
    through a single partition."""
    from pero_ocr_api_spark.operators.lm import pack_sequences

    return pack_sequences(_docs(spark, sf))


def _sql_pack_sequences() -> str:
    from pero_ocr_api_spark.operators.lm import duckdb_pack_sequences_sql

    return duckdb_pack_sequences_sql()


def q_pack_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """Assembled packed-block fingerprints (operators/lm.pack_blocks):
    vocab-encoded token stream re-shuffled once by block id, each
    block's ordered ids md5'd — every block except the last is exactly
    SEQ_LEN tokens."""
    from pero_ocr_api_spark.operators.lm import pack_blocks, vocab_topk

    docs = _docs(spark, sf)
    return pack_blocks(docs, vocab_topk(docs))


def _sql_pack_blocks() -> str:
    from pero_ocr_api_spark.operators.lm import duckdb_pack_blocks_sql

    return duckdb_pack_blocks_sql()


# --- deterministic stratified sampling (training-mix weighting) ---------------
# per-lang keep rates in integer percent — mixture weighting a
# pretraining pipeline applies before tokenization
SAMPLE_RATES_PCT = {"en": 50, "de": 75, "es": 25, "fr": 100, "zh": 10}
_SAMPLE_SPACE = 16**7  # md5_int_col(_, 7) range


def q_stratified_sample_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-based stratified sampling: doc kept iff
    md5('sample|' || doc_id) < rate — reproducible across engines,
    runs, and cluster sizes (no RNG state), the property a resumable
    100 TB mixing job needs. Integer threshold compare
    (u * 100 < pct * 16^7): no float boundary anywhere."""
    docs = _docs(spark, sf)
    u = dedup.md5_int_col(
        F.concat(F.lit("sample|"), F.col("doc_id").cast("string")), 7
    )
    expr = None
    for lang, pct in SAMPLE_RATES_PCT.items():
        cond = F.col("lang") == lang
        expr = F.when(cond, pct) if expr is None else expr.when(cond, pct)
    rate_pct = expr.otherwise(F.lit(0))
    kept = (u * 100) < (rate_pct.cast("long") * _SAMPLE_SPACE)
    return docs.select("lang", kept.alias("kept")).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("kept").cast("int")).alias("n_sampled"),
    )


def _sql_stratified_sample_counts() -> str:
    u = dedup.duckdb_md5_int_sql("'sample|' || CAST(doc_id AS VARCHAR)", 7)
    rate = "CASE " + " ".join(
        f"WHEN lang = '{lang}' THEN {pct}"
        for lang, pct in SAMPLE_RATES_PCT.items()
    ) + " ELSE 0 END"
    return f"""
SELECT lang, count(*) AS n_docs,
  CAST(sum(CASE WHEN {u} * 100 < CAST({rate} AS BIGINT) * {_SAMPLE_SPACE}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents GROUP BY lang
"""


QUALITY_MIN = 0.55
TOKENS_MIN, TOKENS_MAX = 10, 2000


def q_training_filter_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The curation filter chain a pretraining pipeline runs per doc:
    language-ID agreement, quality threshold, token-count band —
    emitted as per-source funnel counts (all JVM expressions, one
    scan + one aggregate)."""
    docs = _docs(spark, sf)
    t = F.col("text")
    flags = docs.select(
        "source",
        (ts.lang_guess_col(t) == F.col("lang")).alias("lang_ok"),
        (ts.quality_score_col(t) >= QUALITY_MIN).alias("quality_ok"),
        ts.token_count_col(t).between(TOKENS_MIN, TOKENS_MAX).alias("len_ok"),
    )
    return flags.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("lang_ok").cast("int")).alias("n_lang_ok"),
        F.sum((F.col("lang_ok") & F.col("quality_ok")).cast("int")).alias(
            "n_quality_ok"
        ),
        F.sum(
            (F.col("lang_ok") & F.col("quality_ok") & F.col("len_ok")).cast("int")
        ).alias("n_kept"),
    )


def _sql_training_filter_pipeline() -> str:
    lang_ok = f"({ts.duckdb_lang_guess_sql('text')} = lang)"
    quality_ok = f"({ts.duckdb_quality_score_sql('text')} >= {QUALITY_MIN})"
    len_ok = (
        f"({ts.duckdb_token_count_sql('text')} BETWEEN {TOKENS_MIN} AND {TOKENS_MAX})"
    )
    return f"""
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN {lang_ok} THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
       CAST(sum(CASE WHEN {lang_ok} AND {quality_ok} THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
       CAST(sum(CASE WHEN {lang_ok} AND {quality_ok} AND {len_ok} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""


PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def q_table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Pre-ingest data-quality profile of the documents drop: per-column
    null count, exact cardinality, string-form min/max, total payload
    chars — ONE scan for all 5 columns (operators/profile.py; the
    100 TB variant flips approx=True for HLL cardinalities)."""
    from pero_ocr_api_spark.operators.profile import profile_table

    return profile_table(_docs(spark, sf), PROFILE_COLS)


def _sql_table_profile() -> str:
    from pero_ocr_api_spark.operators.profile import duckdb_profile_sql

    return duckdb_profile_sql("documents", PROFILE_COLS)


PII_MOD = 7  # doc_id % 7 == 0 gets injected contact PII


def _pii_text_col() -> "F.Column":
    """documents.text with deterministic contact PII appended to every
    PII_MOD-th doc — the scrubber must find exactly these (the synthetic
    corpus carries none of its own)."""
    two = F.lpad((F.col("doc_id") % 90 + 10).cast("string"), 2, "0")
    injected = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-202-555-01"),
        two,
        F.lit("."),
    )
    return F.when(F.col("doc_id") % PII_MOD == 0, injected).otherwise(
        F.col("text")
    )


def q_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub over the corpus: count e-mails/phones per doc and
    emit the redacted length delta — JVM regexp projections only
    (functions/pii.py), one scan, no shuffle before the final agg-free
    projection."""
    from pero_ocr_api_spark.functions import pii

    docs = _docs(spark, sf)
    t = _pii_text_col()
    return docs.select(
        "doc_id",
        pii.email_count_col(t).alias("n_emails"),
        pii.phone_count_col(t).alias("n_phones"),
        (F.length(t) - F.length(pii.redact_pii_col(t))).alias("chars_removed"),
    )


def _sql_pii_redaction() -> str:
    from pero_ocr_api_spark.functions import pii

    two = "lpad(CAST(doc_id % 90 + 10 AS VARCHAR), 2, '0')"
    injected = (
        "text || ' Contact: user' || CAST(doc_id AS VARCHAR) || "
        f"'@mail.example.com or +1-202-555-01' || {two} || '.'"
    )
    t = f"(CASE WHEN doc_id % {PII_MOD} = 0 THEN {injected} ELSE text END)"
    return f"""
SELECT doc_id, {pii.duckdb_email_count_sql(t)} AS n_emails,
       {pii.duckdb_phone_count_sql(t)} AS n_phones,
       (length({t}) - length({pii.duckdb_redact_pii_sql(t)})) AS chars_removed
FROM documents
"""


HREF_RE = r"href='([^']*)'"
N_CATS = 13
N_EXT = 5
# Shared HTML-shell fragments (text and two doc_id-derived ids are
# interleaved between them) — both engines concat the identical shell,
# then each re-parses it with its OWN regex engine.
_LINK_FRAGS = (
    "<html><body><nav><a href='/'>Home</a></nav><p>",
    "</p><a href='/cat/",
    "'>c</a> <a href='https://ext",
    ".example.com/p'>x</a></body></html>",
)


def _linked_html_col() -> "F.Column":
    """Deterministic 3-link HTML shell per doc: site root, a category
    page (doc_id % N_CATS), an external domain (doc_id % N_EXT)."""
    return F.concat(
        F.lit(_LINK_FRAGS[0]),
        F.col("text"),
        F.lit(_LINK_FRAGS[1]),
        (F.col("doc_id") % N_CATS).cast("string"),
        F.lit(_LINK_FRAGS[2]),
        (F.col("doc_id") % N_EXT).cast("string"),
        F.lit(_LINK_FRAGS[3]),
    )


def q_link_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Link-graph edge extraction: pull every href from the (synthetic)
    HTML shell, explode, count in-degree per target — the crawl-side
    op that feeds PageRank-style corpus weighting. regexp_extract_all
    + explode + partial-agg groupBy: one scan, one shuffle on href."""
    docs = _docs(spark, sf)
    hrefs = F.regexp_extract_all(_linked_html_col(), F.lit(HREF_RE), F.lit(1))
    return (
        docs.select(F.explode(hrefs).alias("href"))
        .groupBy("href")
        .agg(F.count("*").alias("n_refs"))
    )


def _sql_link_graph() -> str:
    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    html = " || ".join(
        [
            lit(_LINK_FRAGS[0]),
            "text",
            lit(_LINK_FRAGS[1]),
            f"CAST(doc_id % {N_CATS} AS VARCHAR)",
            lit(_LINK_FRAGS[2]),
            f"CAST(doc_id % {N_EXT} AS VARCHAR)",
            lit(_LINK_FRAGS[3]),
        ]
    )
    return f"""
WITH edges AS (
  SELECT unnest(regexp_extract_all({html}, {lit(HREF_RE)}, 1)) AS href
  FROM documents
)
SELECT href, count(*) AS n_refs FROM edges GROUP BY href
"""


INCR_JACCARD = 0.3  # same verify threshold as ngram_jaccard_pairs


def q_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (batch-vs-corpus) near-dedup: the daily-ingest
    shape. A new drop (mutated twins of doc_id < N_DUP_DOCS) is
    checked against the EXISTING corpus via a band equi-join — corpus
    signatures are computed once and reused (in production they live
    in a bucketed index table, so the new batch is the only side
    hashed per run; here the cached bands DF stands in for the index).
    Candidates dedupe across bands before the exact Jaccard verify —
    batch-linear, never corpus × batch."""
    docs = _docs(spark, sf)
    corpus = docs.select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") < N_DUP_DOCS).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(MUTATION_SUFFIX)).alias("text"),
    )
    # the persisted index stand-in: hashed once, joined by every batch
    c_bands = _tracked_cache(
        dedup.lsh_bands_df(dedup.minhash_signatures(corpus))
    )
    b_bands = dedup.lsh_bands_df(dedup.minhash_signatures(batch))
    # cached: referenced three times below (two semi-filters + the
    # final join); candidate sets are tiny by construction
    cand = _tracked_cache(
        b_bands.select(
            F.col("doc_id").alias("batch_id"), "band_idx", "band_hash"
        )
        .join(
            c_bands.select(
                F.col("doc_id").alias("corpus_id"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("batch_id", "corpus_id")
        .distinct()
    )
    # candidates-only verification: shingle ONLY rows that appear in
    # cand (a semi-join each side), never the whole corpus — at corpus
    # scale the full-text parse is the expensive stage and candidates
    # are a vanishing fraction (measured here: 17.5 s -> 0.9 s, the
    # un-filtered corpus shingle pass ran single-partition)
    sh_c = (
        corpus.join(
            cand.select(F.col("corpus_id").alias("doc_id")).distinct(),
            "doc_id",
        )
        .select("doc_id", dedup.shingles_col(F.col("text")).alias("sh"))
    )
    sh_b = (
        batch.join(
            cand.select(F.col("batch_id").alias("doc_id")).distinct(),
            "doc_id",
        )
        .select("doc_id", dedup.shingles_col(F.col("text")).alias("sh"))
    )
    jac = round_bin(dedup.jaccard_col(F.col("sh1"), F.col("sh2")), 4)
    return (
        cand.join(
            sh_b.select(F.col("doc_id").alias("batch_id"), F.col("sh").alias("sh1")),
            "batch_id",
        )
        .join(
            sh_c.select(F.col("doc_id").alias("corpus_id"), F.col("sh").alias("sh2")),
            "corpus_id",
        )
        .select("batch_id", "corpus_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= INCR_JACCARD)
    )


def _sql_incremental_dedup() -> str:
    sh = dedup.duckdb_shingles_sql("text")
    jac = dedup.duckdb_jaccard_sql("b.sh", "c.sh")
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id + {DUP_OFFSET} AS doc_id, text || '{MUTATION_SUFFIX}' AS text
  FROM documents WHERE doc_id < {N_DUP_DOCS}
),
{_sql_bands_cte('corpus', prefix='c_', with_sized=False)},
{_sql_bands_cte('batch', prefix='b_', with_sized=False)},
cand AS (
  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
  FROM b_bands b JOIN c_bands c USING (band_idx, band_hash)
),
sh_c AS (SELECT doc_id, {sh} AS sh FROM corpus),
sh_b AS (SELECT doc_id, {sh} AS sh FROM batch)
SELECT cand.batch_id, cand.corpus_id,
       {duckdb_round_bin(jac, 4)} AS jaccard
FROM cand
JOIN sh_b b ON b.doc_id = cand.batch_id
JOIN sh_c c ON c.doc_id = cand.corpus_id
WHERE {duckdb_round_bin(jac, 4)} >= {INCR_JACCARD}
"""


CC_N = 350  # chain construction covers doc_id < CC_N
CC_CHAIN = 7  # link doc i -> i+1 except every CC_CHAIN-th boundary


def _cc_edges(docs: DataFrame) -> DataFrame:
    """Deterministic chain graph over the corpus ids: edge
    (i, i+1) for i < CC_N except at every CC_CHAIN-th boundary →
    path components of CC_CHAIN nodes (diameter CC_CHAIN-1, so the
    transitive closure is NOT recoverable from any single pair list —
    the property connected_components exists to solve)."""
    ids = docs.select(F.col("doc_id").alias("id")).filter(
        F.col("id") < CC_N
    )
    return (
        ids.filter(F.col("id") % CC_CHAIN != CC_CHAIN - 1)
        .select(F.col("id").alias("id1"), (F.col("id") + 1).alias("id2"))
        .join(ids.select(F.col("id").alias("id2")), "id2")
        .select("id1", "id2")
    )


def q_dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive near-dup clustering: connected components over a
    chained pair graph — the keep-one-per-CLUSTER step that pair
    lists alone cannot express (similarity is not transitive).
    O(log diameter) label-propagation rounds, each a groupBy-min +
    two equi-joins (operators/dedup.py connected_components)."""
    return dedup.connected_components(_cc_edges(_docs(spark, sf)))


def _sql_dedup_components() -> str:
    return f"""
WITH RECURSIVE ids AS (
  SELECT doc_id AS id FROM documents WHERE doc_id < {CC_N}
),
edges AS (
  SELECT a.id AS id1, a.id + 1 AS id2
  FROM ids a JOIN ids b ON b.id = a.id + 1
  WHERE a.id % {CC_CHAIN} != {CC_CHAIN - 1}
),
{dedup.duckdb_components_sql("edges")}
SELECT node, component FROM components
"""


# --- corpus-level boilerplate phrase detection -------------------------------
TOP_NGRAM_N = 3  # word 3-grams
TOP_NGRAM_K = 20  # report the top-k by document frequency


def _ngram_texts_col(text: "F.Column", n: int) -> "F.Column":
    """Distinct word-n-gram TEXTS per document (the human-readable
    sibling of dedup.word_ngram_ints_col — boilerplate reports need
    the phrase itself, not its hash). Empty when the doc has fewer
    than n tokens."""
    toks = dedup.tokens_col(text)
    cnt = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), cnt - n),
        lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)]),
    )
    return F.when(cnt >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _duckdb_ngram_texts_sql(expr: str, n: int) -> str:
    toks = dedup.duckdb_tokens_sql(expr)
    grams = (
        f"list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )
    return (
        f"(CASE WHEN len({toks}) >= {n} THEN list_distinct({grams}) "
        f"ELSE [] END)"
    )


def q_top_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level boilerplate phrase detection: the top-k word
    3-grams by DOCUMENT frequency (distinct grams per doc, so a
    phrase repeated inside one page counts once — boilerplate is a
    cross-document phenomenon). The decontamination complement of
    `benchmark_contamination`: there the n-gram index hunts leaked
    eval items, here it surfaces the nav/footer phrases a cleaner
    should strip corpus-wide (C4 dropped its most frequent lines the
    same way).

    Scale shape: flat position-explode of gram OCCURRENCES (codegen
    projection — the per-gram ``transform`` + array_distinct lambda
    ran interpreted and was the dominant cost) → count(DISTINCT
    doc_id) per gram, which equals the old count over per-doc distinct
    gram arrays; partial aggregation dedups (gram, doc) map-side. The
    final top-k is a TakeOrdered over per-partition heaps — no global
    sort materializes. Ties across the k-boundary are broken by the
    gram text itself, so the result is deterministic in both engines.
    Reference analog: pero-ocr-api has no corpus analytics; this is
    a graft-required training-data addition (SURVEY.md §2)."""
    docs = _docs(spark, sf)
    toks = dedup.tokens_col(F.col("text"))
    n = TOP_NGRAM_N
    base = dedup.spread_to_parallelism(docs).select(
        "doc_id", toks.alias("_t")
    )
    pos = F.when(
        F.size("_t") >= n, F.sequence(F.lit(0), F.size("_t") - n)
    ).otherwise(F.array().cast("array<int>"))
    gram = F.concat_ws(
        " ",
        *[F.element_at(F.col("_t"), F.col("_i") + j + 1) for j in range(n)],
    )
    grams = base.select("doc_id", "_t", F.explode(pos).alias("_i")).select(
        "doc_id", gram.alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count_distinct(F.col("doc_id")).cast("long").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("gram").asc())
        .limit(TOP_NGRAM_K)
    )


def _sql_top_ngrams() -> str:
    return f"""
WITH grams AS (
  SELECT unnest({_duckdb_ngram_texts_sql('text', TOP_NGRAM_N)}) AS gram
  FROM documents
)
SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq
FROM grams GROUP BY gram
ORDER BY doc_freq DESC, gram ASC
LIMIT {TOP_NGRAM_K}
"""


# --- cross-source overlap estimation (MinHash similarity matrix) -------------
def q_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise corpus-overlap estimate between sources: one MinHash
    signature per SOURCE (min over the union of all its docs'
    shingle hashes — reuses dedup.minhash_signatures with the source
    as the grouping key), then signature agreement counts per source
    pair. n_agree/k estimates the shingle-set Jaccard between two
    crawls/dumps — the standard pre-merge dedup-pressure check before
    unioning corpora. Output stays integer (n_agree out of
    MINHASH_K=16): no float crosses the engine boundary.

    Scale shape: the per-source signature is the same explode +
    groupBy k-min pattern as document MinHash — map-side partial
    minima, one shuffle keyed by source. The pairwise stage is
    #sources² but sources are FEW by definition (corpus dumps, not
    documents); 1000 sources is a 500k-row join of 17-column rows.
    Spark compares signatures via zip_with inside one projection."""
    docs = _docs(spark, sf)
    # Cache the tiny signature table (#sources rows) before the
    # self-join: without the boundary BOTH join sides re-run the full
    # corpus scan + shingle hashing (the ann_self_pairs lesson).
    sigs = _tracked_cache(
        dedup.minhash_signatures(docs, id_col="source").select(
            F.col("source"), F.col("signature")
        )
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    agree = F.size(
        F.filter(
            F.zip_with("a.signature", "b.signature", lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            agree.cast("long").alias("n_agree"),
        )
    )


def _sql_source_overlap() -> str:
    coeffs = dedup._minhash_coeffs(dedup.MINHASH_K)
    mins = ",\n    ".join(
        f"min((h * {a} + {b}) % {dedup.MINHASH_PRIME}) AS s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    agree = " + ".join(
        f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)"
        for i in range(dedup.MINHASH_K)
    )
    return f"""
WITH ex AS (
  SELECT source, unnest({dedup.duckdb_shingle_ints_sql('text')}) AS h
  FROM documents
),
sig AS (
  SELECT source,
    {mins}
  FROM ex GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST({agree} AS BIGINT) AS n_agree
FROM sig a JOIN sig b ON a.source < b.source
"""


TEXTOPS_QUERIES: dict[str, tuple] = {
    "top_ngrams": (q_top_ngrams, _sql_top_ngrams()),
    "source_overlap": (q_source_overlap, _sql_source_overlap()),
    "table_profile": (q_table_profile, _sql_table_profile()),
    "dedup_components": (q_dedup_components, _sql_dedup_components()),
    "incremental_dedup": (q_incremental_dedup, _sql_incremental_dedup()),
    "pii_redaction": (q_pii_redaction, _sql_pii_redaction()),
    "link_graph": (q_link_graph, _sql_link_graph()),
    "clean_html_docs": (q_clean_html_docs, _sql_clean_html_docs()),
    "lang_guess_counts": (q_lang_guess_counts, SQL_LANG_GUESS_COUNTS),
    "quality_scores": (q_quality_scores, SQL_QUALITY_SCORES),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "exact_dup_groups": (q_exact_dup_groups, SQL_EXACT_DUP_GROUPS),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, _sql_minhash_lsh_pairs()),
    "lsh_mega_bucket_pairs": (q_lsh_mega_bucket_pairs, _sql_lsh_mega_bucket_pairs()),
    "lsh_bucket_histogram": (q_lsh_bucket_histogram, _sql_lsh_bucket_histogram()),
    "simhash_buckets": (q_simhash_buckets, SQL_SIMHASH_BUCKETS),
    "simhash_near_pairs": (q_simhash_near_pairs, _sql_simhash_near_pairs()),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, _sql_ngram_jaccard_pairs()),
    "winnow_overlap": (q_winnow_overlap, _sql_winnow_overlap()),
    "cosine_topk": (q_cosine_topk, _sql_cosine_topk()),
    "ann_topk": (q_ann_topk, _sql_ann_topk()),
    "ann_multiprobe_topk": (q_ann_multiprobe_topk, _sql_ann_multiprobe_topk()),
    "ivf_topk": (q_ivf_topk, _sql_ivf_topk()),
    "ann_self_near_pairs": (q_ann_self_near_pairs, _sql_ann_self_near_pairs()),
    "ann_lsh_buckets": (q_ann_lsh_buckets, _sql_ann_lsh_buckets()),
    "embedding_near_dup": (q_embedding_near_dup, _sql_embedding_near_dup()),
    "embedding_dedup_keep": (q_embedding_dedup_keep, _sql_embedding_dedup_keep()),
    "incremental_embedding_dedup": (
        q_incremental_embedding_dedup,
        _sql_incremental_embedding_dedup(),
    ),
    "knn_label_vote": (q_knn_label_vote, _sql_knn_label_vote()),
    "dedup_keep_list": (q_dedup_keep_list, _sql_dedup_keep_list()),
    "training_filter_pipeline": (
        q_training_filter_pipeline,
        _sql_training_filter_pipeline(),
    ),
    "benchmark_contamination": (
        q_benchmark_contamination,
        _sql_benchmark_contamination(),
    ),
    "repetition_stats": (q_repetition_stats, _sql_repetition_stats()),
    "lm_quality_scores": (q_lm_quality_scores, _sql_lm_quality_scores()),
    "vocab_topk": (q_vocab_topk, _sql_vocab_topk()),
    "tokenize_corpus": (q_tokenize_corpus, _sql_tokenize_corpus()),
    "line_dedup_stats": (q_line_dedup_stats, _sql_line_dedup_stats()),
    "url_dedup_groups": (q_url_dedup_groups, _sql_url_dedup_groups()),
    "bpe_merges": (q_bpe_merges, _sql_bpe_merges()),
    "tokenize_corpus_bpe": (q_tokenize_corpus_bpe, _sql_tokenize_corpus_bpe()),
    "pack_sequences": (q_pack_sequences, _sql_pack_sequences()),
    "pack_blocks": (q_pack_blocks, _sql_pack_blocks()),
    "quality_weighted_sample": (
        q_quality_weighted_sample,
        _sql_quality_weighted_sample(),
    ),
    "stratified_sample_counts": (
        q_stratified_sample_counts,
        _sql_stratified_sample_counts(),
    ),
}
