"""Event-log analytics over the `events` table, each with a DuckDB twin.

The reference pipeline's request lifecycle is an event log (page state
transitions timestamped by waiting/processing/finish columns,
app/db/model.py:60-80); these queries are the standard web-scale
analytics a training-data pipeline runs over interaction/telemetry
logs before turning them into training rows:

* sessionization — gaps-and-islands with an inactivity gap;
* funnel conversion — staged signup -> click -> purchase reach;
* last-touch attribution — an as-of join of purchases onto clicks.

All plans are single-shuffle-per-stage window/aggregate shapes: the
only partitioning key is user_id, timestamps are compared as exact
integer microseconds (`unix_micros` / `epoch_us` — no float time
arithmetic anywhere), and outputs are integers, so driver hash
equality is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pero_ocr_api_spark.operators.asof import asof_join
from pero_ocr_api_spark.sources.tables import read_table

# Inactivity gap that splits two events into separate sessions. The
# synthetic corpus averages one event per user per ~10 h, so 6 h gives
# a non-degenerate mix of singleton and multi-event sessions at every
# SF (a 30 min web-analytics gap would make ~every event its own
# session on this data).
SESSION_GAP_US = 6 * 3600 * 1_000_000


def _us(col: str) -> F.Column:
    """Exact integer epoch microseconds. The parquet column reads as
    TIMESTAMP_NTZ; the session timezone is pinned to UTC
    (session.py:67), so casting to TIMESTAMP is the identity embedding
    that makes `unix_micros` equal DuckDB's naive `epoch_us`."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return read_table(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )


# --- sessionization (gaps-and-islands) --------------------------------------
def q_user_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Split each user's event stream into sessions at >6 h gaps and
    aggregate per session.

    Plan: one hash shuffle on user_id feeds BOTH windows (lag and the
    running session counter share the identical (partitionBy user_id,
    orderBy ts/event_id) spec, so Catalyst plans a single Sort+Window
    pair) and the final (user_id, session_seq) aggregation is a
    partial-agg groupBy. At 100 TB the shuffle is one pass over the
    log keyed by user — the minimum any order-dependent sessionizer
    needs; state per key is one row (the previous timestamp).
    """
    e = _events(spark, sf).withColumn("us", _us("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    new_sess = (
        F.when(prev.isNull() | ((F.col("us") - prev) > SESSION_GAP_US), 1)
        .otherwise(0)
    )
    sess = e.withColumn("session_seq", F.sum(new_sess).over(run))
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_purchases"
        ),
    )


SQL_USER_SESSIONS = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), numbered AS (
  SELECT *, CAST(sum(new_sess) OVER (
      PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT
    ) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       max(us) - min(us) AS duration_us,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases
FROM numbered GROUP BY user_id, session_seq
"""


# --- funnel conversion -------------------------------------------------------
def q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Staged funnel: users with a signup, users whose first click
    follows their first signup, users whose first purchase follows
    that click. One row of three counts.

    Plan: three per-user aggregations chained by equi-joins on
    user_id — every stage is a partial-agg groupBy plus a same-key
    join (co-partitioned after the first shuffle), and the final
    counts are scalar cross joins of three 1-row aggregates. Nothing
    scales with event count except the first scan.
    """
    e = _events(spark, sf)
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s.agg(F.count("*").alias("signup_users"))
        .crossJoin(c.agg(F.count("*").alias("click_after_signup_users")))
        .crossJoin(p.agg(F.count("*").alias("purchase_after_click_users")))
    )


SQL_FUNNEL_CONVERSION = """
WITH s AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s) AS signup_users,
       (SELECT count(*) FROM c) AS click_after_signup_users,
       (SELECT count(*) FROM p) AS purchase_after_click_users
"""


# --- last-touch attribution (as-of join) -------------------------------------
def q_last_touch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Attribute every purchase to the user's most recent click at or
    before it (null when none) — :func:`operators.asof.asof_join`
    end-to-end, oracled by DuckDB's native ASOF LEFT JOIN.

    Clicks are pre-deduplicated to one row per (user_id, ts) (max
    event_id) so the as-of match is engine-independent at timestamp
    ties. Gap is exact integer microseconds.
    """
    e = _events(spark, sf)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    j = asof_join(purchases, clicks, on=["user_id"])
    return j.select(
        "purchase_id",
        F.col("r_click_id").alias("click_id"),
        (_us("ts") - _us("r_ts")).alias("gap_us"),
    )


SQL_LAST_TOUCH_ATTRIBUTION = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, max(event_id) AS click_id FROM events
  WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.purchase_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --- rolling activity rate (RANGE-frame window) ---------------------------
ROLLING_WINDOW_US = 24 * 3600 * 1_000_000


def q_rolling_event_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Per event: how many events the same user produced in the
    preceding 24 h (inclusive) — the rate-limit / burst-detection
    statistic, and the one window-frame family the suite didn't yet
    exercise (a RANGE frame over event-time microseconds; rows at
    equal timestamps are peers, so the count is tie-order-independent
    by construction). Same single user_id shuffle as every other
    events window."""
    e = _events(spark, sf).withColumn("us", _us("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ROLLING_WINDOW_US, 0)
    )
    return e.select(
        "event_id", F.count("*").over(w).alias("n_events_24h")
    )


SQL_ROLLING_EVENT_RATE = f"""
SELECT event_id,
       count(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN {ROLLING_WINDOW_US} PRECEDING AND CURRENT ROW
       ) AS n_events_24h
FROM events
"""


# --- next-event transition matrix ---------------------------------------
def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user next-event transition counts: (prev_type, event_type,
    n) over each user's time-ordered stream — the first-order Markov
    statistics a behavioral model trains on. One window shuffle on
    user_id (same spec as the sessionizer) + a partial-agg groupBy;
    deterministic ordering via the (ts, event_id) total order."""
    e = _events(spark, sf).withColumn("us", _us("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    return pairs.groupBy("prev_type", "event_type").agg(
        F.count("*").alias("n_transitions")
    )


SQL_EVENT_TRANSITIONS = """
SELECT prev_type, event_type, count(*) AS n_transitions FROM (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
) WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


EVENTS_QUERIES: dict[str, tuple] = {
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "rolling_event_rate": (q_rolling_event_rate, SQL_ROLLING_EVENT_RATE),
    "user_sessions": (q_user_sessions, SQL_USER_SESSIONS),
    "funnel_conversion": (q_funnel_conversion, SQL_FUNNEL_CONVERSION),
    "last_touch_attribution": (
        q_last_touch_attribution,
        SQL_LAST_TOUCH_ATTRIBUTION,
    ),
}
