"""X10 — re-stitch processed spans back into per-document arrays.

Reading order is re-established by sorting on ``offset`` *inside the
aggregate* — never by relying on shuffle arrival order. This produces
the per-row invariant: span-sequence equality ``(kind, text,
media_ref, order)``.

Scale design: a media-heavy document (FIXTURES §1: 20-50+ spans, at
100 TB potentially thousands) is a skewed group for
``groupBy(doc_id)``. The aggregation therefore runs in two levels —
partial collect per ``(doc_id, salt)`` where ``salt =
pmod(hash(offset), salt_buckets)``, then a final merge per ``doc_id``
— so no single reducer receives one giant unsplittable group
(map-side partials spread over ``salt_buckets`` reducers). The final
merge handles only pre-bundled arrays. ``salt_buckets=1`` degenerates
to a plain one-level groupBy for tiny inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# processed-span relation expected by restitch (output of the text and
# media paths in plans/extract.py)
SPAN_COLS = (
    "doc_id",
    "offset",
    "kind",
    "text",
    "media_ref",
    "state",
    "error",
    "alto_xml",
    "page_xml",
    "txt",
    "confs",
)


def restitch(span_rows: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Aggregate processed span rows into `extracted` documents."""
    span_struct = F.struct("offset", "kind", "text", "media_ref")
    fail_struct = F.when(
        F.col("state") != "PROCESSED", F.struct("offset", "state", "error")
    )
    export_struct = F.when(
        F.col("alto_xml").isNotNull(),
        F.struct("offset", "alto_xml", "page_xml", "txt"),
    )

    partial = (
        span_rows.groupBy(
            "doc_id",
            F.pmod(F.hash("offset"), F.lit(salt_buckets)).alias("_salt"),
        )
        .agg(
            F.collect_list(span_struct).alias("p_spans"),
            F.collect_list(fail_struct).alias("p_fails"),
            F.collect_list(export_struct).alias("p_exports"),
            F.flatten(F.collect_list("confs")).alias("p_confs"),
        )
    )

    merged = partial.groupBy("doc_id").agg(
        F.array_sort(F.flatten(F.collect_list("p_spans"))).alias("o_spans"),
        F.array_sort(F.flatten(F.collect_list("p_fails"))).alias("o_fails"),
        F.array_sort(F.flatten(F.collect_list("p_exports"))).alias("o_exports"),
        F.array_sort(F.flatten(F.collect_list("p_confs"))).alias("o_confs"),
    )

    n = F.size("o_confs")
    h = (n - F.lit(1)).cast("double") * 0.5
    lo = F.floor(h).cast("int")
    # F.get is 0-based and null-safe out of bounds (ANSI mode safe)
    v_lo = F.get("o_confs", lo)
    v_hi = F.get("o_confs", lo + 1)
    # np.quantile(v, .5) bit-exact: for t=0.5 numpy's _lerp uses the
    # upper-anchored form b - (b-a)*0.5 (not a + (b-a)*0.5 — they can
    # differ by one ulp, which flips a rounding boundary; found by
    # the hypothesis property test)
    median = F.when(h == lo.cast("double"), v_lo).otherwise(
        v_hi - (v_hi - v_lo) * 0.5
    )
    score = F.when(n == 0, F.lit(100.0)).otherwise(F.round(median * 100.0, 2))

    first_fail = F.get("o_fails", 0)
    join_exports = lambda field, sep: F.when(  # noqa: E731
        F.size("o_exports") > 0,
        F.array_join(F.transform("o_exports", lambda e: e[field]), sep),
    )

    return merged.select(
        "doc_id",
        F.transform(
            "o_spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
        score.alias("score"),
        F.coalesce(first_fail["state"], F.lit("PROCESSED")).alias("state"),
        first_fail["error"].alias("error"),
        join_exports("alto_xml", "\n").alias("alto_xml"),
        join_exports("page_xml", "\n").alias("page_xml"),
        # per-media txt is already newline-terminated — plain concat
        join_exports("txt", "").alias("txt"),
    )
