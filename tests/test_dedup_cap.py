"""LSH bucket skew guard: oversized buckets collapse to a star around
the min-id representative (linear), small buckets keep exact clique
semantics (operators/dedup.py:lsh_candidate_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pero_ocr_api_spark.operators import dedup


def _bands(spark, n_identical=100):
    data = [(i, "the exact same boilerplate text body here") for i in range(n_identical)]
    data += [
        (1000, "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    return dedup.lsh_bands_df(dedup.minhash_signatures(df))


def test_mega_bucket_collapses_to_star(spark):
    bands = _bands(spark).cache()
    pairs = dedup.lsh_candidate_pairs(bands, max_bucket=10).collect()
    star = sorted((p.id1, p.id2) for p in pairs if p.id2 < 1000)
    # 100 identical docs: 99 star rows around doc 0, not 4950 clique rows
    assert star == [(0, i) for i in range(1, 100)]


def test_uncapped_is_quadratic(spark):
    bands = _bands(spark).cache()
    unc = (
        dedup.lsh_candidate_pairs(bands, max_bucket=None)
        .filter(F.col("id2") < 1000)
        .count()
    )
    assert unc == 100 * 99 // 2  # the O(n²) blow-up the cap prevents


def test_small_buckets_keep_clique(spark):
    bands = _bands(spark).cache()
    sizes = dedup.lsh_bucket_sizes(bands)
    # near-identical pair 1000/1001: if any band buckets them together
    # (small bucket), the capped join must still emit the exact pair
    shared = sizes.filter(F.col("bucket_n") == 2).count()
    pairs = {
        (p.id1, p.id2)
        for p in dedup.lsh_candidate_pairs(bands, max_bucket=10).collect()
    }
    if shared:
        assert (1000, 1001) in pairs
