"""Persistent LSH band index: idempotent build, batch-only shuffle on
candidate lookup (the corpus-hashed-ONCE artifact incremental dedup
amortizes against)."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from pero_ocr_api_spark.operators import dedup
from pero_ocr_api_spark.plans.io import band_index_candidates, write_band_index

CORPUS = [
    (i, f"corpus doc {i} with shared vocabulary alpha beta gamma delta w{i}")
    for i in range(30)
]


def _cleanup(spark, table):
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_band_index_idempotent_and_incremental(spark):
    d = tempfile.mkdtemp()
    table = "band_index_test1"
    _cleanup(spark, table)
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    try:
        assert write_band_index(spark, docs, table, path=f"{d}/t", buckets=4) == 30
        # re-run: nothing new (MERGE analog — a crashed build re-submits as-is)
        assert write_band_index(spark, docs, table, path=f"{d}/t", buckets=4) == 0
        assert spark.table(table).count() == 30 * dedup.LSH_BANDS
        # a later drop indexes only its new docs
        more = spark.createDataFrame(
            [(100, "entirely new drop document epsilon zeta eta")],
            "doc_id long, text string",
        )
        assert write_band_index(spark, docs.unionByName(more), table,
                                path=f"{d}/t", buckets=4) == 1
        assert spark.table(table).count() == 31 * dedup.LSH_BANDS
    finally:
        _cleanup(spark, table)


def test_band_index_candidates_match_fresh_join(spark):
    d = tempfile.mkdtemp()
    table = "band_index_test2"
    _cleanup(spark, table)
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    # batch: near-twins of corpus docs 0-4 + one novel doc
    batch = spark.createDataFrame(
        [(1000 + i, t + " suffix") for i, t in
         [(i, t) for i, t in CORPUS[:5]]]
        + [(2000, "unrelated novel ingest text nothing shared here at all")],
        "doc_id long, text string",
    )
    try:
        write_band_index(spark, corpus, table, path=f"{d}/t", buckets=4)
        got = {
            (r.batch_id, r.corpus_id)
            for r in band_index_candidates(spark, batch, table).collect()
        }
        c_bands = dedup.lsh_bands_df(dedup.minhash_signatures(corpus))
        b_bands = dedup.lsh_bands_df(dedup.minhash_signatures(batch))
        expected = {
            (r.batch_id, r.corpus_id)
            for r in b_bands.select(
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
            .collect()
        }
        assert got == expected
        assert all(b != 2000 for b, _ in got)  # the novel doc has no candidates
    finally:
        _cleanup(spark, table)


def test_band_index_join_shuffles_batch_only(spark):
    """The index side must scan bucketed (no Exchange); joining the
    same data as plain parquet costs exactly one more Exchange."""
    d = tempfile.mkdtemp()
    table = "band_index_test3"
    _cleanup(spark, table)
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1000, "corpus doc 0 with shared vocabulary alpha beta gamma delta w0")],
        "doc_id long, text string",
    )
    try:
        write_band_index(spark, corpus, table, path=f"{d}/t", buckets=4)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bucketed_plan = (
                band_index_candidates(spark, batch, table)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            b_bands = dedup.lsh_bands_df(dedup.minhash_signatures(batch))
            plain = spark.read.parquet(f"{d}/t").select(
                F.col("doc_id").alias("corpus_id"), "band_idx", "band_hash"
            )
            plain_plan = (
                b_bands.select(
                    F.col("doc_id").alias("batch_id"), "band_idx", "band_hash"
                )
                .join(plain, ["band_idx", "band_hash"])
                .select("batch_id", "corpus_id")
                .distinct()
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Bucketed: true" in bucketed_plan
        assert (
            bucketed_plan.count("Exchange")
            == plain_plan.count("Exchange") - 1
        ), (bucketed_plan, plain_plan)
    finally:
        _cleanup(spark, table)


def test_build_dedup_index_job_cli(spark, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import build_dedup_index

    table = "band_index_test_cli"
    _cleanup(spark, table)
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(CORPUS, "doc_id long, text string").write.parquet(
        docs_path
    )
    try:
        import io as _io
        from contextlib import redirect_stdout

        buf = _io.StringIO()
        with redirect_stdout(buf):
            rc = build_dedup_index.main(
                [
                    "--documents", docs_path,
                    "--table", table,
                    "--path", str(tmp_path / "idx"),
                    "--buckets", "4",
                ]
            )
        assert rc == 0
        report = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert report["docs_indexed"] == 30
        assert report["band_rows"] == 30 * dedup.LSH_BANDS
        assert report["max_lsh_bucket"] >= 1
        assert report["lsh_buckets_over_cap"] == 0
        # idempotent re-run
        buf2 = _io.StringIO()
        with redirect_stdout(buf2):
            assert build_dedup_index.main(
                [
                    "--documents", docs_path,
                    "--table", table,
                    "--path", str(tmp_path / "idx"),
                    "--buckets", "4",
                ]
            ) == 0
        report2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
        assert report2["docs_indexed"] == 0
        assert report2["band_rows"] == 30 * dedup.LSH_BANDS
    finally:
        _cleanup(spark, table)


def test_retried_batch_emits_no_self_pairs(spark):
    """A crashed-then-retried ingest looks itself up in the index it
    already wrote: its own stored rows must not surface as (X, X)
    duplicates (a keep-list consumer would drop every retried doc)."""
    d = tempfile.mkdtemp()
    table = "band_index_retry"
    _cleanup(spark, table)
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    try:
        write_band_index(spark, docs, table, path=f"{d}/t", buckets=4)
        cand = band_index_candidates(spark, docs, table)
        assert cand.filter(F.col("batch_id") == F.col("corpus_id")).count() == 0
    finally:
        _cleanup(spark, table)


def test_empty_first_build_creates_table(spark):
    """write_band_index on an empty input still creates the (empty)
    table so the CLI report and candidate lookups don't crash on a
    fresh catalog."""
    d = tempfile.mkdtemp()
    table = "band_index_empty"
    _cleanup(spark, table)
    empty = spark.createDataFrame([], "doc_id long, text string")
    try:
        assert write_band_index(spark, empty, table, path=f"{d}/t", buckets=4) == 0
        assert spark.table(table).count() == 0
        batch = spark.createDataFrame(CORPUS[:3], "doc_id long, text string")
        assert band_index_candidates(spark, batch, table).count() == 0
    finally:
        _cleanup(spark, table)
