"""Fair scheduler + engine metadata queries (J1-J3, J7, A6, O1-O2).

The reference dequeues one page per HTTP poll
(``get_page_by_preferred_engine``, ``app/main/general.py:112-151``):

1. J1 — keys that have WAITING work, suspension honored;
2. J2 — per-key processed count over the last minute, default 0;
3. A6 — argmin key (client-side ``min(...)``);
4. J3/O1 — oldest WAITING page of that key (FIFO by
   waiting_timestamp, backed by a btree index).

The batch analog generalizes this to assigning the *whole* queue at
once with the same fairness semantics: pages are ranked FIFO within
each key, then interleaved round-robin across keys (keys with the
lowest recent processed-count first) — one window + one sort, no
N+1 loops. ``limit=1`` reproduces the reference's single dequeue
exactly.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FAIR_WINDOW_S = 60  # general.py:102-106: last 1 min


def keys_with_waiting_work(
    page: DataFrame, request: DataFrame, api_key: DataFrame, engine_id: int | None = None
) -> DataFrame:
    """J1 (general.py:92-99): distinct unsuspended keys with WAITING
    pages, optional engine filter. Dims broadcast."""
    req = request
    if engine_id is not None:
        req = req.filter(F.col("engine_id") == engine_id)
    return (
        page.filter(F.col("state") == "WAITING")
        .join(req.select(F.col("id").alias("rid"), "api_key_id"),
              page.request_id == F.col("rid"))
        .join(
            F.broadcast(
                api_key.filter(~F.col("suspension")).select(
                    F.col("id").alias("key_id")
                )
            ),
            F.col("api_key_id") == F.col("key_id"),
        )
        .select("key_id")
        .distinct()
    )


def processed_counts_last_window(
    page: DataFrame, request: DataFrame, now: datetime
) -> DataFrame:
    """J2 (general.py:102-109): per-key PROCESSED count in the last
    minute (keys absent → 0 handled by the left join in fair_assign)."""
    cutoff = now - timedelta(seconds=FAIR_WINDOW_S)
    return (
        page.filter(
            (F.col("state") == "PROCESSED")
            & (F.col("finish_timestamp") > F.lit(cutoff))
        )
        .join(request.select(F.col("id").alias("rid"), "api_key_id"),
              page.request_id == F.col("rid"))
        .groupBy("api_key_id")
        .agg(F.count("*").alias("recent_processed"))
    )


def fair_assign(
    page: DataFrame,
    request: DataFrame,
    api_key: DataFrame,
    now: datetime,
    engine_id: int | None = None,
    limit: int | None = None,
) -> DataFrame:
    """J3 batch analog: fairness-ordered assignment of WAITING pages.

    Order: FIFO rank within key (O1), then recent processed count
    (A6 argmin), then key id (deterministic tie-break, matching the
    reference's stable dict-order min). ``limit=1`` == the reference's
    single dequeue. Returns (page_id, request_id, api_key_id,
    engine_id, fair_rank)."""
    keys = keys_with_waiting_work(page, request, api_key, engine_id)
    counts = processed_counts_last_window(page, request, now)
    key_order = keys.join(
        counts, keys.key_id == counts.api_key_id, "left"
    ).select(
        "key_id",
        F.coalesce("recent_processed", F.lit(0)).alias("recent_processed"),
    )
    req = request.select(
        F.col("id").alias("rid"), "api_key_id", "engine_id"
    )
    if engine_id is not None:
        req = req.filter(F.col("engine_id") == engine_id)
    waiting = (
        page.filter(F.col("state") == "WAITING")
        .select(F.col("id").alias("page_id"), "request_id", "waiting_timestamp")
        .join(req, F.col("request_id") == F.col("rid"))
        .join(F.broadcast(key_order), F.col("api_key_id") == F.col("key_id"))
    )
    fifo = Window.partitionBy("key_id").orderBy("waiting_timestamp", "page_id")
    ranked = waiting.withColumn("fifo_rank", F.row_number().over(fifo))
    global_order = Window.orderBy(
        "fifo_rank", "recent_processed", "key_id", "page_id"
    )
    out = ranked.withColumn("fair_rank", F.row_number().over(global_order)).select(
        "page_id", "request_id", F.col("api_key_id"), "engine_id", "fair_rank"
    )
    if limit is not None:
        out = out.filter(F.col("fair_rank") <= limit)
    return out


def latest_engine_versions(
    engine: DataFrame,
    engine_version: DataFrame,
    engine_version_model: DataFrame,
    model: DataFrame,
) -> DataFrame:
    """J7 (general.py:70-77, 272-278): the reference's per-engine N+1
    loop (latest version per engine, then its models) collapsed into
    one windowed query + join."""
    w = Window.partitionBy("engine_id").orderBy(F.desc("id"))
    latest = (
        engine_version.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias("version_id"),
            F.col("version"),
            "engine_id",
        )
    )
    evm = engine_version_model.select(
        F.col("engine_version_id"), F.col("model_id")
    )
    models = (
        latest.join(evm, latest.version_id == evm.engine_version_id, "left")
        .join(
            F.broadcast(model.select(F.col("id").alias("mid"), F.col("name").alias("model_name"))),
            F.col("model_id") == F.col("mid"),
            "left",
        )
        .groupBy("engine_id", "version_id", "version")
        .agg(F.sort_array(F.collect_list("model_name")).alias("models"))
    )
    return (
        F.broadcast(engine.select(F.col("id").alias("engine_id"), F.col("name").alias("engine_name")))
        .join(models, "engine_id", "left")
        .select("engine_id", "engine_name", "version_id", "version", "models")
    )
