"""Round-5 catalog entries — event-analytics surface.

The reference is a music-analytics warehouse (Airflow → Kafka →
ClickHouse views → Superset); the product-analytics queries its BI
layer would serve next are the classic event-table shapes. Each is
expressed as the partitioned-window / grouped-agg plan you'd want at
100 TB of events:

* **x35_scd2_intervals** — slowly-changing-dimension (type-2) interval
  construction: each event opens a validity interval closed by the
  user's next event (lead over a user-partitioned window).
* **x36_funnel_steps** — ordered conversion funnel
  (view → click → purchase) via stepwise conditional-min aggs joined
  back per user — no window over the global event stream.
* **x37_retention_cohorts** — weekly cohort retention triangle:
  cohort week = first-event week, offset = activity week − cohort
  week, distinct users per (cohort, offset).
* **x39_session_window_native** — Spark's built-in ``session_window``
  (gap-merged event-time sessions) certified against the lag+cumsum
  SQL formulation (the x6_sessionize shape) — proving the native
  operator and the portable formulation agree row-for-row.

All window/agg work partitions on user_id; nothing global. Timestamp
outputs are exact micros on both engines (events.parquet nanos are
truncated identically by sources/tables.py and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x35 — SCD2 validity intervals
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
SELECT user_id, event_id, value,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
       CAST(CASE WHEN lead(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS INT) AS is_current
FROM events ORDER BY user_id, valid_from, event_id
"""


@q(
    "x35_scd2_intervals",
    "OP-W3-ext",
    "SCD type-2 interval construction: every event opens a validity "
    "interval for its value, closed by the user's NEXT event (lead) — "
    "open-ended + is_current flag on the latest. The warehouse "
    "dimension-history primitive. One user-partitioned window pass; "
    "at 100 TB the shuffle is the user_id repartition and each "
    "partition sorts locally — no global order anywhere (the final "
    "ORDER BY is presentation-only).",
    _SCD2_ORACLE,
)
def x35_scd2_intervals(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    ).orderBy("user_id", "valid_from", "event_id")


# ---------------------------------------------------------------------------
# x36 — conversion funnel
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2 FROM events e
    JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3 FROM events e
    JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
),
staged AS (
    SELECT u.user_id,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS stage
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
)
SELECT CAST(stage AS INT) AS stage, CAST(count(*) AS BIGINT) AS n_users
FROM staged GROUP BY stage ORDER BY stage
"""


@q(
    "x36_funnel_steps",
    "OP-G1/J3-ext",
    "Ordered conversion funnel (view → click → purchase, strict "
    "temporal order): stepwise conditional-min aggregations, each "
    "stage joining back only users who reached the previous stage — "
    "monotonically SHRINKING user sets, all aggs and joins keyed on "
    "user_id (co-partitioned after the first shuffle; no window over "
    "the global event stream, no per-user event-array collection). "
    "The product-analytics staple over the reference's event domain.",
    _FUNNEL_ORACLE,
)
def x36_funnel_steps(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    staged = (
        u.join(s1.select("user_id", F.lit(1).alias("__s1")), "user_id", "left")
        .join(s2.select("user_id", F.lit(1).alias("__s2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("__s3")), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("__s3").isNotNull(), 3)
            .when(F.col("__s2").isNotNull(), 2)
            .when(F.col("__s1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
        )
    )
    return (
        staged.groupBy("stage")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# x37 — weekly retention cohorts
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH wk AS (
    SELECT user_id,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
               AS BIGINT) AS week
    FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
SELECT c.cohort_week, wk.week - c.cohort_week AS week_offset,
       CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
FROM wk JOIN cohort c ON wk.user_id = c.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


@q(
    "x37_retention_cohorts",
    "OP-G3/D1-ext",
    "Weekly cohort-retention triangle: cohort = first-active week per "
    "user, offset = activity week − cohort week, distinct users per "
    "cell. Two user-keyed aggs + one user-keyed join (co-partitioned) "
    "+ the small (cohort, offset) rollup — the BI retention chart "
    "behind every activation dashboard. At 100 TB the distinct-user "
    "count per cell is the only wide agg and it's keyed on the tiny "
    "(cohort, offset) space with map-side partial distinct.",
    _RETENTION_ORACLE,
)
def x37_retention_cohorts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
        ).cast("long").alias("week"),
    )
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# x39 — native session_window vs the portable lag+cumsum formulation
# ---------------------------------------------------------------------------

_SESSION_NATIVE_ORACLE = """
WITH g AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
lab AS (
    SELECT user_id, ts,
           sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM lab GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@q(
    "x39_session_window_native",
    "OP-W3/T2-ext",
    "Spark's BUILT-IN session_window (30-min gap merge) certified "
    "against the portable lag+cumsum SQL formulation (x6_sessionize's "
    "shape): both sides emit (user, session_start, session_end = "
    "last_event + gap, n_events). The native operator is the one to "
    "use at scale — it's a single user-partitioned agg with "
    "merge-able session state (and the same operator powers the "
    "STREAMING sessionizer under watermarks); the SQL twin proves its "
    "gap semantics exactly. Note session_window merges on gap "
    "STRICTLY LESS THAN 30 min (next < prev + gap), hence the "
    "oracle's >= 1800s break condition — expressed in exact "
    "MICROSECONDS: date_diff('second') counts second-BOUNDARY "
    "crossings, so with fractional-second timestamps a 1799.2s gap "
    "can cross 1800 boundaries and split where the native operator "
    "merges (one such pair exists at sf0.1; caught by the sf-variation "
    "gate).",
    _SESSION_NATIVE_ORACLE,
)
def x39_session_window_native(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
