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
    """Per-user sessions split on >30 min inactivity; one row per session.

    NULL-ts rows are excluded up front: an event without a time has no
    event-time semantics, and leaving it in would diverge the engines
    (Spark sorts NULLS FIRST in an ASC window, DuckDB NULLS LAST, and the
    ``lag(ts) IS NULL`` first-row test would conflate the two)."""
    e = _epoch_us("ts", d)
    el = _epoch_us("lag(ts) OVER w", d)
    return f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR {e} - {el} > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE ts IS NOT NULL
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
    exactly that — new session when the gap is STRICTLY greater than
    30 min. The boundary is inclusive (r15 session-window model fuzzer,
    probed in batch AND streaming): an event at exactly session_end
    still merges, i.e. windows [t, t+gap) and [t+gap, t+2·gap) become
    ONE session — the pre-r15 oracle split there (``>=``), and since
    the fixture grid never produces an exact-gap collision the hash
    gate could not see the disagreement; note ``sessionize_sql`` (the
    lag-gap operator) has always used the strict ``>`` rule, so the two
    session families now agree at the boundary."""
    return (
        spark.table("events")
        .filter(F.col("ts").isNotNull())  # no event-time, no session (parity w/ oracle)
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
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events WHERE ts IS NOT NULL
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
    ev = spark.table("events").filter(F.col("ts").isNotNull())
    clicks = (
        ev.filter(F.col("event_type") == "click")
        # collapse same-(user, ts) clicks so the as-of answer is unique;
        # only the ts matters downstream (the oracle's clicks CTE is the
        # same DISTINCT user_id, ts)
        .select("user_id", "ts").distinct()
        .select("user_id", "ts", F.lit(0).alias("is_purchase"),
                F.lit(None).cast("bigint").alias("purchase_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
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
    SELECT user_id, ts FROM events
    WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY user_id, ts
),
purchases AS (
    SELECT event_id AS purchase_id, user_id, ts FROM events
    WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT p.purchase_id, p.user_id, p.ts, c.ts AS prev_click_ts
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    delta_s: int = 300,
) -> DataFrame:
    """Range join ``|l.ts - r.ts| <= delta`` as an equi-join (the scale path).

    Spark plans a raw interval predicate as a broadcast-nested-loop join —
    O(n·m) work and a full broadcast of one side; at 100 TB that is the
    single worst plan the optimizer can emit. The standard fix (bin-bucket
    then refine) makes it shuffle-bounded:

    * bin both sides' timestamps to ``delta``-wide buckets;
    * explode the LEFT side to {bin-1, bin, bin+1} (×3 rows, cheap);
    * equi-join on (key, bin) — ONE hash shuffle each side; every
      qualifying pair matches exactly once because the right row keeps
      its unique bin;
    * refine with the exact |Δts| <= delta predicate.

    Candidate work is linear in input + pairs-per-bucket, never global-
    quadratic; hot (key, bin) buckets fall under AQE skew-join like any
    other equi-join (vs. the nested loop, which AQE cannot help).
    Returns the joined frame with columns from both sides; callers
    project/filter further.
    """
    bin_us = int(delta_s) * 1_000_000
    l = left.withColumn("__bin0", F.floor(F.unix_micros(F.col(left_ts)) / bin_us))
    l = l.withColumn(
        "__bin", F.explode(F.array(F.col("__bin0") - 1, F.col("__bin0"), F.col("__bin0") + 1))
    ).drop("__bin0")
    r = right.withColumn("__bin", F.floor(F.unix_micros(F.col(right_ts)) / bin_us))
    lk, rk = f"l_{key}", f"r_{key}"
    l = l.select(
        F.col(key).alias(lk),
        F.col("__bin"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
    )
    r = r.select(
        F.col(key).alias(rk),
        F.col("__bin"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    joined = l.join(r, (F.col(lk) == F.col(rk)) & (l["__bin"] == r["__bin"])).drop("__bin")
    return joined.filter(
        F.abs(F.unix_micros(F.col(f"l_{left_ts}")) - F.unix_micros(F.col(f"r_{right_ts}")))
        <= bin_us
    )


RANGE_DELTA_S = 300


def range_join_pairs(spark: SparkSession) -> DataFrame:
    """Same-user event pairs within RANGE_DELTA_S seconds via the banded
    equi-join; the oracle runs the plain inequality join (exact, fine at
    oracle scale)."""
    ev = spark.table("events").select("user_id", "event_id", "ts")
    j = banded_interval_join(ev, ev, "user_id", delta_s=RANGE_DELTA_S)
    return (
        j.filter(F.col("l_event_id") < F.col("r_event_id"))
        .select(
            F.col("l_user_id").alias("user_id"),
            F.col("l_event_id").alias("id_a"),
            F.col("r_event_id").alias("id_b"),
            F.floor(
                F.abs(F.unix_micros("l_ts") - F.unix_micros("r_ts")) / 1_000_000
            ).cast("bigint").alias("gap_s"),
        )
        .orderBy("user_id", "id_a", "id_b")
    )


RANGE_JOIN_ORACLE = f"""
    SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b,
           CAST(FLOOR(abs(epoch_us(a.ts) - epoch_us(b.ts)) / 1000000) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_DELTA_S} * 1000000
    ORDER BY user_id, id_a, id_b
    """


FUNNEL_ORACLE = """
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(t_view IS NOT NULL AS INT) AS did_view,
           COALESCE(CAST(t_view IS NOT NULL AND t_click > t_view AS INT), 0) AS did_click_after,
           COALESCE(CAST(t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click AS INT), 0)
               AS did_purchase_after
    FROM stages ORDER BY user_id
    """


def funnel(spark: SparkSession) -> DataFrame:
    """view → click → purchase funnel per user: first-touch timestamp per
    stage (conditional MIN — ONE shuffle on user_id, no joins, no
    window), then ordered-stage flags. The standard product-analytics
    funnel at corpus scale: conditional aggregation beats N self-joins
    (one pass, map-side combinable) and beats sequence UDFs (pure
    codegen). Missing-stage comparisons are three-valued (NULL), so the
    flags are COALESCEd to 0 on both dialects."""
    e = spark.table("events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    return (
        e.groupBy("user_id")
        .agg(
            stage("view").alias("t_view"),
            stage("click").alias("t_click"),
            stage("purchase").alias("t_purchase"),
        )
        .select(
            "user_id",
            F.col("t_view").isNotNull().cast("int").alias("did_view"),
            F.coalesce(
                (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))).cast("int"),
                F.lit(0),
            ).alias("did_click_after"),
            F.coalesce(
                (
                    F.col("t_view").isNotNull()
                    & (F.col("t_click") > F.col("t_view"))
                    & (F.col("t_purchase") > F.col("t_click"))
                ).cast("int"),
                F.lit(0),
            ).alias("did_purchase_after"),
        )
        .orderBy("user_id")
    )


def histogram_sql(d: str, width: int = 50) -> str:
    """Fixed-width value histogram per event type — the profiling op for
    choosing clip bounds / bin budgets. Pure single-pass aggregate (bin is
    a scalar expression, no shuffle beyond the group-by); identical ANSI
    on both dialects."""
    return f"""
    SELECT event_type, CAST(FLOOR(value / {width}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS bin_min, ROUND(MAX(value), 6) AS bin_max
    FROM events GROUP BY event_type, CAST(FLOOR(value / {width}) AS BIGINT)
    ORDER BY event_type NULLS FIRST, bin NULLS FIRST
    """


def winsorize_sql(d: str) -> str:
    """Percentile winsorization per event type: clip values to [p01, p99]
    and report clipped sums/counts. The per-type percentile relation is
    tiny — broadcast side of the join; the fact scans once. Quantiles are
    rounded to 6dp on both dialects before clipping (interpolated doubles
    drift in the last ulp), and the clipped sum goes through
    floor(x*100+0.5) cents so float summation order can't shift the
    hash.

    NULL-value rows count in ``n`` but are OUTSIDE the clipped sum (r15
    events fuzzer + recompute): SQL ``greatest``/``least`` skip NULL
    arguments on BOTH engines (Postgres semantics), so an unguarded
    ``greatest(NULL, lo)`` silently clipped every NULL measurement to
    the p01 bound and charged it ``lo`` cents — engines agreed, only
    the independent Python reference could see it (the zscore
    COUNT(value) rule, applied to the sum)."""
    q = "percentile(value, {p})" if d == "spark" else "quantile_cont(value, {p})"
    lo, hi = q.format(p="0.01"), q.format(p="0.99")
    return f"""
    WITH p AS (
        SELECT event_type, ROUND({lo}, 6) AS lo, ROUND({hi}, 6) AS hi
        FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN e.value IS NOT NULL
                    THEN CAST(FLOOR(least(greatest(e.value, p.lo), p.hi) * 100 + 0.5) AS BIGINT)
                    END) AS BIGINT)
               AS clipped_cents,
           CAST(SUM(CASE WHEN e.value < p.lo OR e.value > p.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped
    FROM events e JOIN p ON e.event_type = p.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """


US_PER_DAY = 86_400_000_000


def retention_sql(d: str) -> str:
    """Cohort retention: users grouped by first-seen week, counted per
    week-offset they return in — the engagement matrix behind every
    retention curve.

    Scale shape: one shuffle to find each user's first day (map-side
    combined MIN), a user-key-co-partitioned join back to the events
    (same key, so AQE reuses the partitioning), and one tiny rollup on
    (cohort_week, week_offset). Day/week arithmetic is integer division
    on epoch micros — identical on both engines, no timezone or DATE
    semantics in play. NULL-ts events are excluded up front (the
    sessionize rule: no event time, no event-time semantics) — left in,
    they formed a NULL cohort row whose position diverged under the
    engines' opposite NULL-ordering defaults (time-fuzzer, r11)."""
    from torchfusion_spark.operators import sqlgen as G

    day = G.intdiv(_epoch_us("ts", d), str(US_PER_DAY), d)
    return f"""
    WITH e AS (SELECT user_id, {day} AS day FROM events WHERE ts IS NOT NULL),
    f AS (SELECT user_id, MIN(day) AS day0 FROM e GROUP BY user_id),
    w AS (
        SELECT e.user_id,
               {G.intdiv("f.day0", 7, d)} AS cohort_week,
               {G.intdiv("e.day - f.day0", 7, d)} AS week_offset
        FROM e JOIN f ON e.user_id = f.user_id)
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM w GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """


def anomaly_zscore_sql(d: str, threshold: float = 3.0) -> str:
    """Outlier detection per event type: flag events with |z| >= threshold.

    Moments come from exact DECIMAL sums (s1, s2) rather than
    avg()/stddev() — float aggregates are accumulation-order-dependent
    across engines/partitionings, decimal sums are not, so the z-scores
    are bit-stable and the gate can hash them. The moment relation is a
    few rows → broadcast back onto the scan; total cost is one map-side-
    combined shuffle plus one pass.

    Edge contract (events-fuzzer + code-review r11): NULL-value rows
    are outside the sample entirely — n = COUNT(value), not COUNT(*),
    so they cannot deflate the mean and manufacture anomalies out of
    the real events (1 real + 10 NULL rows used to z-score the real
    one at sqrt(11)); a single-event type has zero
    sample variance — the greatest(n-1, 1) guard + the 1e-12 variance
    floor yield z = 0 instead of an ANSI divide-by-zero job abort; the
    exact-moment domain is |value| < 1e6 at 6dp (past it the square
    sum exceeds both engines' 128-bit decimal headroom)."""
    # the square-sum factor precision is per-dialect: DuckDB keeps a
    # DECIMAL(18)x(18) product INT64-backed and overflows at |v| >= 1e6,
    # so its factors go through DECIMAL(19,6) (INT128-backed, product
    # DECIMAL(38,12)); Spark's (18,6)x(18,6) -> DECIMAL(37,12) is already
    # exact, and widening IT would push past 38 and trigger
    # precision-loss scale reduction. Identical exact values either way
    # for the documented |value| < 1e6 domain (events-fuzzer finding).
    fp = 18 if d == "spark" else 19
    return f"""
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(value) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) AS s1,
               SUM(CAST(value AS DECIMAL({fp},6)) * CAST(value AS DECIMAL({fp},6))) AS s2
        FROM events GROUP BY event_type),
    z AS (
        SELECT e.event_id, e.event_type, e.value,
               ROUND((CAST(e.value AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n)
                 / sqrt(greatest(
                       (CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE) / m.n)
                           / greatest(m.n - 1, 1),
                       1e-12)), 6) AS zscore
        FROM events e JOIN m ON e.event_type = m.event_type
        WHERE e.value IS NOT NULL)
    SELECT event_id, event_type, ROUND(value, 6) AS value, zscore
    FROM z WHERE abs(zscore) >= {threshold}
    ORDER BY event_id
    """
