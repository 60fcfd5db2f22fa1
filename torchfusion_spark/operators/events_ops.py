"""Event-stream batch operators: sessionization and as-of join.

Spark lacks a native as-of join; the scale-correct pattern is the
union-tag + running ``last(ignoreNulls)`` window — O(n log n) with one
shuffle on the entity key, versus the O(n·m)-per-key nested-loop a naive
range join would cost. DuckDB *has* a native ASOF JOIN, which makes a
perfect independent oracle for the same semantics.

Sessionization is the classic lag-gap + running-sum window (guide
"Common OLAP patterns"), expressible identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SESSION_GAP_S = 1800  # 30 min


def _epoch_us(expr: str, d: str) -> str:
    return f"unix_micros({expr})" if d == "spark" else f"epoch_us({expr})"


def sessionize_sql(d: str) -> str:
    """Per-user sessions split on >30 min inactivity; one row per session."""
    e = _epoch_us("ts", d)
    el = _epoch_us("lag(ts) OVER w", d)
    return f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR {e} - {el} > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM gaps)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """


def session_window_agg(spark: SparkSession) -> DataFrame:
    """Per-user sessions via Spark's native ``session_window`` (the same
    machinery Structured Streaming uses for streaming sessionization,
    applied in batch). Window end = last event ts + gap, per Spark's
    session-window semantics; the gaps-and-islands oracle reproduces
    exactly that (new session when the gap is >= 30 min — session_window
    merges windows that strictly overlap)."""
    return (
        spark.table("events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_WINDOW_ORACLE = f"""
WITH gaps AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM gaps)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def asof_join(spark: SparkSession) -> DataFrame:
    """For each purchase event: the most recent click (ts <= purchase ts)
    by the same user. Union-tag + last(ignoreNulls) running window."""
    ev = spark.table("events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        # collapse same-(user, ts) clicks so the as-of answer is unique
        .groupBy("user_id", "ts").agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(0).alias("is_purchase"),
                F.lit(None).cast("bigint").alias("purchase_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("bigint").alias("click_id"),
        F.lit(1).alias("is_purchase"), F.col("event_id").alias("purchase_id"),
    )
    tagged = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase")  # click sorts before purchase at equal ts → <= semantics
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("prev_click_ts",
                          F.last(F.when(F.col("is_purchase") == 0, F.col("ts")), ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select("purchase_id", "user_id", "ts", "prev_click_ts")
        .orderBy("purchase_id")
    )


ASOF_ORACLE = """
WITH clicks AS (
    SELECT user_id, ts FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
    SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts, c.ts AS prev_click_ts
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""
