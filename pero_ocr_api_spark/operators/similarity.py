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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pero_ocr_api_spark.functions.portable import round_bin

ANN_PLANES = 6
ANN_TABLES = 4
ANN_TABLE_PLANES = 4


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def as_double_vec(df: DataFrame, col: str = "embedding", out: str = "v") -> DataFrame:
    return df.withColumn(out, F.transform(col, lambda x: x.cast("double")))


def hyperplanes(dim: int, planes: int = ANN_PLANES, table: int = 0) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplanes in [-128, 127];
    `table` salts the family so multiple hash tables are independent."""
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


def bucket_col(
    v: Column, dim: int, planes: int = ANN_PLANES, table: int = 0
) -> Column:
    """LSH bucket id: bit p = sign(v . plane_p)."""
    out = F.lit(0)
    for p, w in enumerate(hyperplanes(dim, planes, table)):
        wl = F.array(*[F.lit(float(x)) for x in w])
        out = out + F.when(dot_col(v, wl) >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return out


def bucket_struct_col(v: Column, dim: int, tables: int, planes: int) -> Column:
    """Array of (table, bucket) structs — one entry per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                bucket_col(v, dim, planes, t).alias("bucket"),
            )
            for t in range(tables)
        ]
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
    e = _with_norm(emb)
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
    e = _with_norm(emb)
    bucketed = e.select(
        "vec_id",
        F.explode(bucket_struct_col(F.col("v"), dim, tables, planes)).alias("b"),
    ).select("vec_id", "b.t", "b.bucket")
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


IVF_NLIST = 16
IVF_NPROBE = 4


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
) -> DataFrame:
    """IVF (inverted-file) ANN: the corpus is partitioned into `nlist`
    cells around coarse centroids; a query probes its `nprobe` nearest
    cells and re-scores exactly inside them.

    Centroids here are the first `nlist` corpus vectors (the sampling
    step of k-means|| init) — deterministic and data-derived, so the
    DuckDB oracle computes the identical structure from the same
    table; a production build would Lloyd-iterate the sample on the
    driver and broadcast, which changes only the centroid rows.

    Scale shape: the cell id is the partition key of the inverted
    file (cluster-by on write); assignment is a broadcast cross-join
    against nlist rows (nlist ~ sqrt(N) << N); probing fans out only
    the query side nprobe ways. Complements the LSH path: IVF adapts
    to the data's density, LSH needs no training."""
    e = _with_norm(emb)
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
    e = _with_norm(emb)
    bucketed = e.select(
        "vec_id",
        F.explode(bucket_struct_col(F.col("v"), dim, tables, planes)).alias("b"),
    ).select("vec_id", "b.t", "b.bucket")
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
