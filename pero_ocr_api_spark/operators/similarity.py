"""Similarity search over embedding columns (`array<float>`).

Two paths:

* :func:`cosine_topk` — exact brute force: broadcast the (small)
  query side, one scan of the corpus, per-query window top-k. The
  correctness baseline; O(|corpus| x |queries|) dot products.
* :func:`ann_topk` — random-hyperplane LSH: corpus and queries are
  bucketed by the sign pattern of dot products with fixed
  hyperplanes; candidates only join within a bucket. At cluster
  scale the bucket is the shuffle/partition key, turning ANN into an
  equi-join — the standard way to make nearest-neighbor shuffle-
  bounded instead of all-pairs.

Hyperplanes are deterministic md5-derived integer vectors computed
driver-side and embedded as literals (engine-portable: the DuckDB
oracle embeds the same numbers).

All dot products run as JVM `zip_with`/`aggregate` expressions — no
Python in the scoring path.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pero_ocr_api_spark.functions.portable import round_bin

ANN_PLANES = 6
ANN_TABLES = 4
ANN_TABLE_PLANES = 4

# Cache hygiene (mirrors queries_textops._QUERY_CACHES): ann_self_pairs
# caches its normed-vector and bands intermediates — each is referenced
# from 2-4 places of one plan, and without a boundary the 16x64-literal
# hyperplane dot-product subtree re-executes per reference (measured
# 24 s -> with cache the dominant stage runs once). Callers release via
# release_similarity_caches() (queries_textops.release_query_caches
# forwards here).
_SIM_CACHES: list[DataFrame] = []


def _tracked_cache(df: DataFrame) -> DataFrame:
    df = df.cache()
    _SIM_CACHES.append(df)
    return df


def release_similarity_caches() -> None:
    """Unpersist every cache created by operators in this module."""
    for df in _SIM_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _SIM_CACHES.clear()


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def as_double_vec(df: DataFrame, col: str = "embedding", out: str = "v") -> DataFrame:
    return df.withColumn(out, F.transform(col, lambda x: x.cast("double")))


@lru_cache(maxsize=256)
def hyperplanes(dim: int, planes: int = ANN_PLANES, table: int = 0) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplanes in [-128, 127];
    `table` salts the family so multiple hash tables are independent.
    Memoized — every bucket expression construction re-derives the same
    md5 literals (driver-side cost, but paid per plan build). Callers
    must treat the returned lists as read-only."""
    out = []
    for p in range(planes):
        out.append(
            [
                int(
                    hashlib.md5(f"t{table}_plane{p}_{d}".encode()).hexdigest()[:2],
                    16,
                )
                - 128
                for d in range(dim)
            ]
        )
    return out


def _planes_lit(dim: int, planes: int, table: int) -> Column:
    """The plane family as ONE foldable literal array<array<double>> —
    ConstantFolding collapses it to a single Literal node, so the
    codegen'd projection carries one constant instead of `planes`
    inlined 64-literal expressions (the Janino-compile hazard the
    winnow fix taught, see dedup.winnow_fingerprints)."""
    return F.array(
        *[
            F.array(*[F.lit(float(x)) for x in w])
            for w in hyperplanes(dim, planes, table)
        ]
    )


def _bucket_from_planes(v: Column, planes_arr: Column) -> Column:
    """bucket = Σ_p 2^p · [v · plane_p ≥ 0] over an array-of-planes
    column — a single higher-order expression regardless of plane
    count (2^p exact in doubles for any plausible p)."""
    contribs = F.transform(
        planes_arr,
        lambda w, p: F.when(dot_col(v, w) >= 0, F.pow(F.lit(2.0), p)).otherwise(
            F.lit(0.0)
        ),
    )
    return F.aggregate(contribs, F.lit(0.0), lambda a, x: a + x).cast("int")


def bucket_col(
    v: Column, dim: int, planes: int = ANN_PLANES, table: int = 0
) -> Column:
    """LSH bucket id: bit p = sign(v . plane_p)."""
    return _bucket_from_planes(v, _planes_lit(dim, planes, table))


def bucket_struct_col(v: Column, dim: int, tables: int, planes: int) -> Column:
    """Array of (table, bucket) structs — one entry per hash table.
    All tables' planes ride in one constant-folded literal matrix; the
    per-table bucket is computed by one shared higher-order expression
    (same values as the unrolled form — 2^p weights, ≥0 sign test)."""
    mat = F.array(*[_planes_lit(dim, planes, t) for t in range(tables)])
    return F.transform(
        mat,
        lambda tp, t: F.struct(
            t.cast("int").alias("t"),
            _bucket_from_planes(v, tp).alias("bucket"),
        ),
    )


def _with_norm(emb: DataFrame) -> DataFrame:
    # spread first: a single-file embedding scan would serialize the
    # per-vector dot products onto one core (see dedup.spread_to_parallelism)
    from pero_ocr_api_spark.operators.dedup import spread_to_parallelism

    emb = as_double_vec(spread_to_parallelism(emb))
    return emb.withColumn("norm", F.sqrt(dot_col(F.col("v"), F.col("v"))))


def _topk(sims: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine", "rn")
    )


def _cosine(sims: DataFrame) -> DataFrame:
    return sims.select(
        "qid",
        "vec_id",
        round_bin(
            dot_col(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qn")), 4
        ).alias("cosine"),
    )


def cosine_topk(
    emb: DataFrame, query_ids: DataFrame, k: int, dim: int
) -> DataFrame:
    """Exact top-k cosine neighbors per query vec_id."""
    # two plan references (query lookup + corpus scan) — one cached
    # norm pass instead of two
    e = _tracked_cache(_with_norm(emb))
    q = e.join(query_ids, "vec_id").select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    sims = e.join(F.broadcast(q), e.vec_id != q.qid)
    return _topk(_cosine(sims), k)


def ann_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int,
    dim: int,
    tables: int = ANN_TABLES,
    planes: int = ANN_TABLE_PLANES,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Candidates = union over `tables` independent hash tables of the
    query's bucket (recall stacks as 1-(1-p)^L). Candidate ids are
    deduplicated *before* vectors are re-joined for scoring — the
    shape that matters at scale, where re-scoring a duplicate
    candidate is the dominant waste. On unstructured (near-random)
    embeddings recall ≈ the scanned corpus fraction by information-
    theoretic necessity; on clustered real embeddings the same plan
    concentrates neighbors into shared buckets."""
    # e is referenced by the bucket pass, the candidate re-score join
    # and the query-vector lookup; bucketed by the corpus and query
    # sides — tracked-cache both so the norm and hyperplane pipelines
    # run once per call, not once per plan reference (the
    # ann_self_pairs lesson; on an unbounded corpus the same boundary
    # comes free from the persisted bucketed index table).
    e = _tracked_cache(_with_norm(emb))
    bucketed = _tracked_cache(
        e.select(
            "vec_id",
            F.explode(bucket_struct_col(F.col("v"), dim, tables, planes)).alias(
                "b"
            ),
        ).select("vec_id", "b.t", "b.bucket")
    )
    q_buckets = bucketed.join(query_ids, "vec_id").select(
        F.col("vec_id").alias("qid"), "t", "bucket"
    )
    cand = (
        bucketed.join(F.broadcast(q_buckets), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    q_vec = e.join(query_ids, "vec_id").select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    sims = cand.join(e, "vec_id").join(F.broadcast(q_vec), "qid")
    return _topk(_cosine(sims), k)


# ---------------------------------------------------- corpus-scale self-join ---

ANN_SELF_PLANES = 8  # more planes than the query path: bucket size is
# the self-join fan-out, so it must shrink as the corpus grows (add a
# plane per doubling); the star cap below is the backstop for
# degenerate dense clusters that no plane count can split.
ANN_SELF_TABLES = 2


def ann_self_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    tables: int = ANN_SELF_TABLES,
    planes: int = ANN_SELF_PLANES,
    max_bucket: int | None = None,
    bands_out: list | None = None,
) -> DataFrame:
    """Corpus-scale near-pair discovery: the whole corpus vs itself,
    with NO broadcast of either side — the op a 100 TB embedding-dedup
    run actually needs (the ``*_topk`` entries assume a broadcast-sized
    query set; here query side == corpus).

    Shape: every vector lands in one bucket per hash table; candidate
    pairs come from a *bucketed equi-self-join* on (table, bucket),
    reusing the dedup LSH cap machinery (`lsh_candidate_pairs`) — a
    bucket up to ``max_bucket`` members emits its clique, an oversized
    bucket (a dense near-identical cluster, the web-scale hazard)
    collapses to a star around its min id, keeping keep-min-id
    connectivity at linear fan-out. Candidates are deduped across
    tables before the exact cosine re-score, and both vector joins are
    plain shuffles on vec_id — Catalyst/AQE may still *choose* a
    broadcast when a side is genuinely small, but nothing in this plan
    requires one (asserted in tests: no broadcast hint, and the plan
    compiles to shuffle joins with broadcasting disabled).

    Both intermediates are tracked-cached: `e` (vec_id, v, norm) is
    referenced by two scored joins, `bands` by three subtrees of the
    cap machinery — without a boundary the hyperplane dot-product
    pipeline re-executes ~4× (it was the dominant stage). df.cache()
    is MEMORY_AND_DISK (spills, never OOMs); on an unbounded corpus
    the same boundary comes free from writing `bands` to the bucketed
    index table. Release via :func:`release_similarity_caches`.
    `bands_out` (a list) receives the cached bands DF so callers can
    derive skew diagnostics (`dedup.lsh_bucket_sizes`) at no extra
    compute."""
    from pero_ocr_api_spark.operators import dedup

    if max_bucket is None:
        max_bucket = dedup.MAX_BUCKET
    e = _tracked_cache(_with_norm(emb).select("vec_id", "v", "norm"))
    bands = _tracked_cache(
        e.select(
            "vec_id",
            F.explode(bucket_struct_col(F.col("v"), dim, tables, planes)).alias(
                "b"
            ),
        ).select(
            "vec_id",
            F.col("b.t").alias("band_idx"),
            F.col("b.bucket").alias("band_hash"),
        )
    )
    if bands_out is not None:
        bands_out.append(bands)
    cand = dedup.lsh_candidate_pairs(bands, id_col="vec_id", max_bucket=max_bucket)
    scored = (
        cand.join(
            e.select(
                F.col("vec_id").alias("id1"),
                F.col("v").alias("v1"),
                F.col("norm").alias("n1"),
            ),
            "id1",
        )
        .join(
            e.select(
                F.col("vec_id").alias("id2"),
                F.col("v").alias("v2"),
                F.col("norm").alias("n2"),
            ),
            "id2",
        )
        .select(
            "id1",
            "id2",
            round_bin(
                dot_col(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 4
            ).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= threshold)


IVF_NLIST = 16
IVF_NPROBE = 4
# Training-sample budget in ROWS, not a rate: the modulus is derived
# from the corpus count at plan time (mod = max(1, n div budget)), so
# the sample — and therefore the single-partition ntile-init window —
# is metadata-sized BY CONSTRUCTION at any corpus size. A production
# index wants ~nlist*256; the query-level default is nlist*16 — enough
# sample per centroid for stable Lloyd cells at sandbox scale.
IVF_SAMPLE_ROWS = 256
IVF_LLOYD_ITERS = 2


def quant16(c: Column) -> Column:
    """Snap a double onto the 2^-16 binary grid (round-half-up).

    This is the exact-arithmetic keystone of the trained-IVF oracle
    parity: grid values are exactly representable doubles, so every
    cross-row SUM of them (centroid means, dot products of grid
    vectors) is exact and therefore independent of Spark's partial-
    aggregation order vs DuckDB's — the one place float summation
    order could diverge between engines. x*65536 (power-of-two
    multiply), +0.5, floor, /65536 are each individually exact, so
    the whole expression is bit-identical across engines."""
    return F.floor(c * F.lit(65536.0) + F.lit(0.5)) / F.lit(65536.0)


def duckdb_quant16_sql(expr: str) -> str:
    return f"(floor({expr} * 65536.0 + 0.5) / 65536.0)"


def ivf_train_centroids(
    e: DataFrame,
    nlist: int = IVF_NLIST,
    sample_rows: int = IVF_SAMPLE_ROWS,
    iters: int = IVF_LLOYD_ITERS,
) -> DataFrame:
    """K-means-trained coarse centroids for the IVF index, fully
    distributed (no collect): deterministic row-budgeted sample →
    ntile init → `iters` Lloyd iterations as tiny Spark jobs.

    * sample: row kept iff ``md5('ivfsamp|'||vec_id) % mod == 0`` with
      ``mod = max(1, n div sample_rows)`` where n is the corpus count
      (a 1-row aggregate cross-joined in — no driver action). Expected
      sample size is in [sample_rows, 2*sample_rows) whenever
      n >= sample_rows, so the single-partition ntile-init window is
      metadata-sized BY CONSTRUCTION at any corpus size — not by
      caller discipline. The md5 coin is the house engine-portable
      hash (dedup.md5_int_col), reproduced bit-for-bit by the twin.
    * init: ntile(nlist) over vec_id order, one representative per
      tile — spread across the ingest order, so data clustered by
      ingest (where first-n init collapses into one region) still gets
      covering centroids.
    * Lloyd: assign sample to nearest centroid by cosine (tie-break
      cell id), recompute element-wise means, re-snap onto the 2^-16
      grid (see :func:`quant16` — keeps every sum exact so the DuckDB
      oracle reproduces the centroids bit-for-bit).

    Returns (cell, cv, cn) — broadcast-sized (nlist rows)."""
    from pero_ocr_api_spark.operators.dedup import md5_int_col

    nrow = e.agg(F.count("*").alias("_n"))
    u = md5_int_col(
        F.concat(F.lit("ivfsamp|"), F.col("vec_id").cast("string")), 7
    )
    mod = F.greatest(F.lit(1).cast("long"), F.expr(f"_n div {sample_rows}"))
    samp = (
        e.crossJoin(nrow)
        .filter(u % mod == 0)
        .select("vec_id", F.transform("v", quant16).alias("vq"))
    )
    w_tile = Window.orderBy("vec_id")
    tiled = samp.withColumn("cell", F.ntile(nlist).over(w_tile))
    w_rep = Window.partitionBy("cell").orderBy("vec_id")
    cents = (
        tiled.withColumn("rn", F.row_number().over(w_rep))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("vq").alias("cv"))
    )
    for _ in range(iters):
        scored = samp.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "cell",
            (
                dot_col(F.col("vq"), F.col("cv"))
                / (
                    F.sqrt(dot_col(F.col("vq"), F.col("vq")))
                    * F.sqrt(dot_col(F.col("cv"), F.col("cv")))
                )
            ).alias("s"),
        )
        w_assign = Window.partitionBy("vec_id").orderBy(F.desc("s"), "cell")
        assign = (
            scored.withColumn("rn", F.row_number().over(w_assign))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cell")
        )
        vals = assign.join(samp, "vec_id").select(
            "cell", F.posexplode("vq").alias("pos", "val")
        )
        means = (
            vals.groupBy("cell", "pos")
            .agg((F.sum("val") / F.count("*")).alias("raw"))
            .select("cell", "pos", quant16(F.col("raw")).alias("m"))
        )
        cents = means.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
    return cents.select(
        "cell", "cv", F.sqrt(dot_col(F.col("cv"), F.col("cv"))).alias("cn")
    )


def trained_centroids(emb: DataFrame, nlist: int = IVF_NLIST) -> DataFrame:
    """Train IVF coarse centroids once and materialize them (eager
    localCheckpoint: the nlist-row table's plan is the whole Lloyd
    iteration tree — truncating it keeps every downstream consumer
    from re-planning AND re-executing the training). A production
    index trains per corpus, not per query: callers cache the result
    per (session, corpus) and pass it to :func:`ivf_topk` via
    ``centroids=`` (see queries_textops._ivf_cents, the
    _MEGA_BANDS_CACHE pattern)."""
    return ivf_train_centroids(_with_norm(emb), nlist).localCheckpoint(eager=True)


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, rank_limit: int = 1
) -> DataFrame:
    """Assign each vector to its `rank_limit` nearest centroids by
    cosine (rounded, centroid-id tie-break — deterministic across
    engines). Returns (vec_id, cell, rn)."""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "cell",
        round_bin(
            dot_col(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn")), 4
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "cell")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= rank_limit)
        .select("vec_id", "cell", "rn")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int,
    dim: int,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    trained: bool = True,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: the corpus is partitioned into `nlist`
    cells around coarse centroids; a query probes its `nprobe` nearest
    cells and re-scores exactly inside them.

    ``trained=True`` (default) runs :func:`ivf_train_centroids` —
    a deterministic spread sample + Lloyd iterations, fully in
    DataFrame ops, reproduced bit-for-bit by the DuckDB oracle via
    2^-16-grid exact arithmetic. ``trained=False`` keeps the naive
    first-`nlist`-vectors init (the k-means|| sampling step alone) —
    retained because it is the instructive failure mode: on data
    clustered by ingest order its centroids collapse into one region
    and recall craters (tests/test_similarity_recall.py measures
    exactly this).

    Scale shape: the cell id is the partition key of the inverted
    file (cluster-by on write); assignment is a broadcast cross-join
    against nlist rows (nlist ~ sqrt(N) << N); probing fans out only
    the query side nprobe ways. Complements the LSH path: IVF adapts
    to the data's density, LSH needs no training."""
    # e feeds corpus assignment, query probing, the candidate re-score
    # join and the query-vector lookup (4 plan references) — tracked-
    # cache it so the norm pass runs once per call (see ann_topk)
    e = _tracked_cache(_with_norm(emb))
    if centroids is not None:
        # amortized path: the caller trained once per corpus (see
        # trained_centroids) — this call pays only assignment+probe
        cents = centroids
    elif trained:
        # The centroid table is nlist rows of metadata, but its plan
        # is the whole Lloyd iteration tree; every downstream consumer
        # (corpus assignment, query probing — and each window branch
        # inside them) would otherwise re-plan AND re-execute that
        # subtree. Eager localCheckpoint materializes the 16-odd rows
        # once and truncates the lineage (measured 12.5 s → ~1 s at
        # sf0.001).
        cents = ivf_train_centroids(e, nlist).localCheckpoint(eager=True)
    else:
        cents = e.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("cell"),
            F.col("v").alias("cv"),
            F.col("norm").alias("cn"),
        )
    cells = ivf_assign(e, cents, 1).select("vec_id", "cell")
    q_probe = ivf_assign(e.join(query_ids, "vec_id"), cents, nprobe).select(
        F.col("vec_id").alias("qid"), "cell"
    )
    cand = (
        cells.join(F.broadcast(q_probe), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    q_vec = e.join(query_ids, "vec_id").select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    sims = cand.join(e, "vec_id").join(F.broadcast(q_vec), "qid")
    return _topk(_cosine(sims), k)


def duckdb_ivf_cents_cte_sql(
    dim: int,
    nlist: int = IVF_NLIST,
    sample_rows: int = IVF_SAMPLE_ROWS,
    iters: int = IVF_LLOYD_ITERS,
    emb_cte: str = "emb",
) -> str:
    """DuckDB twin of :func:`ivf_train_centroids` as a CTE chain ending
    in ``cents (cell, cv, cn)``. Expects an ``{emb_cte}`` CTE with
    (vec_id, v DOUBLE[]). Bit-identical to the Spark path because all
    cross-row sums run over 2^-16-grid values (see :func:`quant16`) —
    exact in any accumulation order — and the sample coin is the same
    md5 integer hash with the same count-derived modulus."""
    from pero_ocr_api_spark.operators.dedup import duckdb_md5_int_sql

    q = duckdb_quant16_sql
    u = duckdb_md5_int_sql("'ivfsamp|' || CAST(vec_id AS VARCHAR)", 7)
    parts = [
        f"ivf_nrow AS (SELECT count(*) AS n FROM {emb_cte})",
        f"""samp AS (
  SELECT vec_id, list_transform(v, x -> {q('x')}) AS vq
  FROM {emb_cte} CROSS JOIN ivf_nrow
  WHERE {u} % greatest(1, n // {sample_rows}) = 0
)""",
        f"""tiled AS (
  SELECT vec_id, vq, ntile({nlist}) OVER (ORDER BY vec_id) AS cell FROM samp
)""",
        """c0 AS (
  SELECT cell, vq AS cv FROM (
    SELECT *, row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
    FROM tiled
  ) WHERE rn = 1
)""",
    ]
    cos = (
        "list_dot_product(s.vq, c.cv) / "
        "(sqrt(list_dot_product(s.vq, s.vq)) * sqrt(list_dot_product(c.cv, c.cv)))"
    )
    for i in range(1, iters + 1):
        parts.append(
            f"""a{i} AS (
  SELECT vec_id, cell FROM (
    SELECT s.vec_id, c.cell, row_number() OVER (
      PARTITION BY s.vec_id ORDER BY {cos} DESC, c.cell) AS rn
    FROM samp s CROSS JOIN c{i - 1} c
  ) WHERE rn = 1
)""",
        )
        parts.append(
            f"""c{i} AS (
  SELECT cell, list(m ORDER BY pos) AS cv FROM (
    SELECT cell, pos, {q('(sum(val) / count(*))')} AS m
    FROM (
      SELECT a.cell, r.pos, s.vq[r.pos] AS val
      FROM a{i} a JOIN samp s USING (vec_id)
      CROSS JOIN (SELECT CAST(range AS INTEGER) AS pos
                  FROM range(1, {dim + 1})) r
    ) GROUP BY cell, pos
  ) GROUP BY cell
)""",
        )
    parts.append(
        f"cents AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn "
        f"FROM c{iters})"
    )
    return ",\n".join(parts)


def ann_topk_multiprobe(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int,
    dim: int,
    tables: int = ANN_TABLES,
    planes: int = ANN_TABLE_PLANES,
) -> DataFrame:
    """Multi-probe ANN: each query additionally probes the buckets at
    Hamming distance 1 from its own (one sign-bit flip per hyperplane)
    in every table — the standard recall amplifier (Lv et al.,
    multi-probe LSH) that costs nothing on the corpus side.

    Scale shape: probing explodes only the *query* rows ((planes+1)x
    per table); the corpus keeps exactly one bucket row per table, so
    the shuffle/storage footprint of the index is unchanged and the
    candidate join stays an equi-join on (table, bucket). Probing
    1-bit neighbors scans the buckets whose boundary the query sits
    closest to — where near-misses of sign-LSH live."""
    # same tracked-cache boundaries as ann_topk: e feeds three plan
    # references, bucketed two — without them the norm + hyperplane
    # pipelines re-execute per reference
    e = _tracked_cache(_with_norm(emb))
    bucketed = _tracked_cache(
        e.select(
            "vec_id",
            F.explode(bucket_struct_col(F.col("v"), dim, tables, planes)).alias(
                "b"
            ),
        ).select("vec_id", "b.t", "b.bucket")
    )
    q_own = bucketed.join(query_ids, "vec_id").select(
        F.col("vec_id").alias("qid"), "t", "bucket"
    )
    probe_set = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)],
    )
    probes = q_own.select(
        "qid", "t", F.explode(probe_set).alias("bucket")
    )
    cand = (
        bucketed.join(F.broadcast(probes), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    q_vec = e.join(query_ids, "vec_id").select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    sims = cand.join(e, "vec_id").join(F.broadcast(q_vec), "qid")
    return _topk(_cosine(sims), k)
