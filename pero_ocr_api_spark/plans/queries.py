"""Unified query registry: name → (spark_builder, duckdb_sql | None).

Aggregates the reference-parity relational queries and the
training-data operators (dedup / similarity / text analysis) into the
single registry consumed by ``__spark_entry__``.
"""

from __future__ import annotations

from pero_ocr_api_spark.plans.queries_relational import RELATIONAL_QUERIES

QUERIES: dict[str, tuple] = {}
QUERIES.update(RELATIONAL_QUERIES)

try:  # text/dedup/similarity operators (added incrementally)
    from pero_ocr_api_spark.plans.queries_textops import TEXTOPS_QUERIES

    QUERIES.update(TEXTOPS_QUERIES)
except ImportError:
    pass

try:  # event-log analytics (sessionization / funnel / as-of attribution)
    from pero_ocr_api_spark.plans.queries_events import EVENTS_QUERIES

    QUERIES.update(EVENTS_QUERIES)
except ImportError:
    pass
