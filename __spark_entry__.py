"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interleaved-extraction pipeline
over sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB twins for the driver's
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleave the sf0.001 documents into (doc_id, spans)
    rows, run the full extraction plan (X9 cleaner + X10 re-stitch),
    return per-document results."""
    from pero_ocr_api_spark.plans.extract import run_extract
    from pero_ocr_api_spark.sources.tables import MEDIA_SCHEMA, read_table

    raw = read_table(spark, SF_SMOKE, "documents")
    docs = raw.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.concat(
                    F.lit(
                        "<html><head><script>t()</script></head><body>"
                        "<nav>Home | <a href='/'>x</a></nav><p>"
                    ),
                    F.col("text"),
                    F.lit("</p><footer>(c) 2024</footer></body></html>"),
                ).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            ),
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(1).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    empty_media = spark.createDataFrame([], MEDIA_SCHEMA)
    extracted, _ = run_extract(spark, docs, empty_media, run_id="entry")
    return extracted.select(
        "doc_id",
        "state",
        "score",
        F.size("spans").alias("n_spans"),
        F.length(F.get(F.col("spans"), 0)["text"]).alias("cleaned_chars"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pero_ocr_api_spark.plans.queries import QUERIES

    return {name: spec[0] for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query."""
    from pero_ocr_api_spark.plans.queries import QUERIES

    return {
        name: spec[1] for name, spec in QUERIES.items() if spec[1] is not None
    }
