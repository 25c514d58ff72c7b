"""The flagship end-to-end extraction pipeline (SURVEY.md §3.1 rebuild).

One declarative job replaces the reference's submit→poll→process→upload
loop (``routes.py:39-59`` → ``general.py:112-151`` →
``run_client.py:290-340``):

    documents ─ explode(spans) ─┬─ text/html path: X9 cleaner + X4
                                │   normalization — pure Catalyst
                                │   expressions, whole-stage codegen
                                ├─ media path: join `media` on
                                │   media_ref → mapInPandas OCR kernel
                                │   (Arrow batches, per-doc failure
                                │   capture — U4 semantics)
                                └─ union → restitch (X10, salted) →
                                    `extracted` (+ per-partition
                                    lineage rows)

Scale notes (designed for 10^12 docs / 100 TB, tested at local[32]):

* The media join shuffles on ``media_ref`` — a *unique* key, so the
  expensive OCR work is spread row-by-row with no inherent skew; a
  media-heavy document's 1000 spans land on ~1000 different tasks.
  (Repartitioning by ``doc_id`` *before* the UDF would concentrate a
  heavy doc on one executor — deliberately avoided; doc locality is
  only needed at the stitch, where rows are already small.)
* The stitch groupBy is two-level salted (operators/restitch.py).
* Text path never leaves the JVM; only media rows pay the Arrow hop.
* Resume (U6/watchdog analog): ``resume_from`` anti-joins already-
  extracted doc_ids, so a rerun after failure is incremental and
  exactly-once per document.
* Lineage: each UDF partition emits one sentinel row with metrics
  (run_id, docs_in/out, order-insensitive span hash, wall ms) —
  mirrors the reference's per-page audit timestamps
  (``model.py:48-50,68-70``) without a second pass over the data.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pero_ocr_api_spark.functions.arabic import normalize_arabic_col
from pero_ocr_api_spark.functions.html_clean import clean_html_col
from pero_ocr_api_spark.ocr import kernel
from pero_ocr_api_spark.operators.restitch import restitch
from pero_ocr_api_spark.sources.tables import LINEAGE_SCHEMA

LINEAGE_SENTINEL = "__lineage__"

# run_id -> persisted media-UDF output (see media_path). Callers that
# are done with a run's (rows, lineage) DataFrames should call
# release_run(run_id) to free the cached partitions.
_PERSISTED: dict[str, DataFrame] = {}


def release_run(run_id: str) -> None:
    """Unpersist the cached media-UDF output of one extraction run."""
    df = _PERSISTED.pop(run_id, None)
    if df is not None:
        df.unpersist()


def release_all_runs() -> None:
    """Unpersist every tracked extraction cache (session teardown)."""
    for run_id in list(_PERSISTED):
        release_run(run_id)

MEDIA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("state", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("alto_xml", T.StringType(), True),
        T.StructField("page_xml", T.StringType(), True),
        T.StructField("txt", T.StringType(), True),
        T.StructField("confs", T.ArrayType(T.DoubleType()), True),
    ]
)


def _media_map_fn(config: dict[str, Any], run_id: str):
    """Build the mapInPandas kernel wrapper.

    Loads nothing per row: per-partition state (the glyph templates are
    module-level constants — the analog of the reference client's
    engine cache, ``run_client.py:61-79``) plus lineage accumulation.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        docs_in: set[str] = set()
        docs_failed: set[str] = set()
        rows_out = 0
        hash_acc = 0
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MEDIA_OUT_SCHEMA.fields}
            for doc_id, offset, media_ref, media_kind, media_bytes in zip(
                pdf["doc_id"],
                pdf["offset"],
                pdf["media_ref"],
                pdf["media_kind"],
                pdf["media_bytes"],
            ):
                res = kernel.process_media(
                    None if media_bytes is None else bytes(media_bytes),
                    media_kind,
                    media_ref,
                    config,
                )
                docs_in.add(doc_id)
                if res.state != kernel.STATE_PROCESSED:
                    docs_failed.add(doc_id)
                out["doc_id"].append(doc_id)
                out["offset"].append(int(offset))
                out["media_ref"].append(media_ref)
                out["text"].append(res.text)
                out["state"].append(res.state)
                out["error"].append(res.error)
                out["alto_xml"].append(res.alto_xml)
                out["page_xml"].append(res.page_xml)
                out["txt"].append(res.txt)
                out["confs"].append(res.confidences)
                rows_out += 1
                key = f"{doc_id}|{offset}|{res.state}|{res.text}".encode()
                # order-insensitive partition hash: sum of row digests
                hash_acc = (
                    hash_acc + int.from_bytes(hashlib.md5(key).digest()[:8], "big")
                ) % (2**64)
            yield pd.DataFrame(out)
        payload = json.dumps(
            {
                "run_id": run_id,
                "docs_in": len(docs_in),
                "docs_out": len(docs_in) - len(docs_failed),
                "span_hash": f"{hash_acc:016x}",
                "rows": rows_out,
                "wall_ms": int((time.monotonic() - t0) * 1000),
            }
        )
        yield pd.DataFrame(
            {
                "doc_id": [""],
                "offset": [-1],
                "media_ref": [LINEAGE_SENTINEL],
                "text": [payload],
                "state": ["LINEAGE"],
                "error": [None],
                "alto_xml": [None],
                "page_xml": [None],
                "txt": [None],
                "confs": [None],
            }
        )

    return fn


def text_path(spans: DataFrame, engine=None) -> DataFrame:
    """X9 + X4 over text/html spans — pure JVM column expressions.

    The per-kind transform is dispatched through the engine registry
    (plans/registry.py), the analog of the reference's engine/model
    rows; the default engine wires html→cleaner, text→passthrough."""
    from pero_ocr_api_spark.plans.registry import DEFAULT_ENGINE

    eng = engine or DEFAULT_ENGINE
    cleaned = eng.text_expr(F.col("kind"), F.col("text"))
    return spans.filter(F.col("kind") != "media").select(
        "doc_id",
        "offset",
        "kind",
        normalize_arabic_col(cleaned).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit("PROCESSED").alias("state"),
        F.lit(None).cast("string").alias("error"),
        F.lit(None).cast("string").alias("alto_xml"),
        F.lit(None).cast("string").alias("page_xml"),
        F.lit(None).cast("string").alias("txt"),
        F.array().cast("array<double>").alias("confs"),
    )


def media_path(
    spans: DataFrame,
    media: DataFrame,
    config: dict[str, Any] | None = None,
    run_id: str = "run0",
    udf_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Join media blobs + run the OCR kernel; returns (rows, lineage).

    The explicit repartition before the UDF is load-bearing: the OCR
    stage is compute-bound per row, not byte-bound, so AQE's
    byte-sized coalescing would otherwise shrink this stage to a
    handful of partitions and serialize the kernel. Hash on media_ref
    (unique) → perfectly uniform spread regardless of doc skew."""
    cfg = {**kernel.DEFAULT_CONFIG, **(config or {})}
    if udf_partitions is None:
        # one partition per core: per-task Python round-trips carry a
        # fixed cost, so bigger partitions beat finer ones as long as
        # rows-per-partition stays balanced (media_ref is unique)
        udf_partitions = spans.sparkSession.sparkContext.defaultParallelism
    # Pre-partition BOTH join inputs on (media_ref, udf_partitions):
    # the join then preserves that partitioning (no second exchange),
    # so the heavy blobs cross the wire exactly once — vs joining
    # first and repartitioning after, which shuffles every blob twice.
    # The explicit partition count also keeps AQE from byte-coalescing
    # the compute-bound UDF stage down to one task. On Iceberg the
    # media table would be bucketed by media_ref, removing even this
    # single blob shuffle.
    refs = (
        spans.filter(F.col("kind") == "media")
        .select("doc_id", "offset", "media_ref")
        .repartition(udf_partitions, "media_ref")
    )
    blobs = media.select("media_ref", "media_kind", "media_bytes").repartition(
        udf_partitions, "media_ref"
    )
    joined = refs.join(blobs, "media_ref", "left").select(
        "doc_id", "offset", "media_ref", "media_kind", "media_bytes"
    )
    out = joined.mapInPandas(_media_map_fn(cfg, run_id), MEDIA_OUT_SCHEMA)
    # the UDF output feeds two consumers (extracted rows + lineage);
    # persist so the expensive OCR stage runs exactly once. Persisted
    # outputs are tracked per run_id: re-running the same run_id
    # replaces (and unpersists) the previous cache, and callers free
    # storage explicitly via release_run()/release_all_runs() — a
    # long-lived session no longer accumulates cached partitions
    # until LRU eviction.
    # (unpersist the previous same-run_id cache BEFORE persisting: an
    # identical plan re-persisted maps to the same CacheManager entry,
    # and unpersisting the old handle afterwards would drop the new
    # cache with it)
    prev = _PERSISTED.pop(run_id, None)
    if prev is not None:
        prev.unpersist()
    out = out.persist()
    _PERSISTED[run_id] = out
    rows = out.filter(F.col("media_ref").isNull() | (F.col("media_ref") != LINEAGE_SENTINEL))
    lineage_raw = out.filter(F.col("media_ref") == LINEAGE_SENTINEL)
    lineage = lineage_raw.select(
        F.get_json_object("text", "$.run_id").alias("run_id"),
        F.spark_partition_id().alias("partition_id"),
        F.get_json_object("text", "$.docs_in").cast("long").alias("docs_in"),
        F.get_json_object("text", "$.docs_out").cast("long").alias("docs_out"),
        F.get_json_object("text", "$.span_hash").alias("span_hash"),
        F.get_json_object("text", "$.wall_ms").cast("long").alias("wall_ms"),
    )
    return rows, lineage


def run_extract(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    config: dict[str, Any] | None = None,
    run_id: str = "run0",
    resume_from: DataFrame | None = None,
    salt_buckets: int = 16,
    udf_partitions: int | None = None,
    engine=None,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline; returns (extracted, lineage) DataFrames.

    Caller writes `extracted` wherever it lives (parquet in sandbox,
    ``writeTo(...).append()`` on Iceberg); writes are idempotent per
    doc_id because resume anti-joins existing output.
    """
    if resume_from is not None:
        docs = docs.join(
            resume_from.select("doc_id"), "doc_id", "left_anti"
        )
    spans = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    if engine is not None:
        config = {**engine.kernel_config(), **(config or {})}
    t_rows = text_path(spans, engine)
    m_rows, lineage = media_path(spans, media, config, run_id, udf_partitions)
    m_rows = m_rows.withColumn("kind", F.lit("media"))
    extracted = restitch(t_rows.unionByName(m_rows), salt_buckets=salt_buckets)
    return extracted, lineage
