"""Round-32 operators — STAGED (round 10), registration deferred.

The round-10 certification window is exactly full (the 37 round-30
registrations + the 13 r04-era harness re-runs = 50), and the
round-31 batch (x312-x325, 14 entries) already targets round 11 —
this batch tops the ROUND-11 window off at exactly 50: 14 + 15 = 29
uncertified oracle entries + the 21 harness re-runs (COVERAGE.md
'Certification window' stays the arithmetic source of truth). Built,
oracle-twinned and pytest-tested now; the footer flips in round 11.

Theme: the STREAMING-DESIGN surface the round-9 verdict asked the
surplus to go to — the capacity/planning questions a Structured
Streaming deployment answers BEFORE it starts (state-store sizing,
sessionization gap choice, trigger-interval sizing, peak concurrency)
— plus spectral/multiscale time-series analysis with Python-computed
literal trig tables (the x102 literal-probe idiom, so the arithmetic
stays exact BIGINT in both engines), sampling design (Neyman
allocation), multiple-testing control with literal z-quantile
thresholds, embedding-geometry audits (variance spectrum, dimension
redundancy), and rate/calibration inference (Wilson intervals,
calibration slope, deterministic permutation test).

Wave 1 — streaming capacity planning over ``events``:

* ``x326_state_ttl_projection`` — state-store size projection for a
  keyed streaming dedup at TTL 1h/6h/24h: a key is live at hour h iff
  it produced an event in (h-TTL, h]; per TTL the op reports peak and
  average live-key count over the observed hour span. THE sizing
  input for ``dropDuplicatesWithinWatermark`` / stateful-processor
  TTL choices. Scale: (user, hour) distinct -> explode of <= TTL
  covered hours (a CONSTANT factor) -> hour hash-agg; never row^2.
* ``x327_gap_sensitivity`` — sessionization gap sensitivity curve at
  5/15/30/60 min: session counts, events-per-session and total
  in-session dwell from ONE user-partitioned lag window (total
  in-session time == sum of sub-gap deltas, so no per-gap session
  assembly is needed). The design curve behind x6/x39's fixed gap.
* ``x328_peak_concurrency`` — hourly session concurrency: 30-min-gap
  sessions assembled once, each session exploded to the hours it
  overlaps, top-5 busiest hours. The executor/state peak-load number
  a sessionizing stream must be provisioned for.
* ``x329_microbatch_profile`` — per-minute arrival batch profile for
  a 1-minute trigger: max and exact type-1 p50/p90/p99 batch sizes
  computed from the DISTINCT-size cumulative frame (never a global
  rank over minutes), plus the mean in milli. Trigger-interval /
  maxOffsetsPerTrigger sizing.

Wave 2 — spectral/multiscale series + sampling/testing design:

* ``x330_neyman_allocation`` — Neyman vs proportional allocation of a
  literal 10k-order sample across market segments: per-stratum exact
  cents moments -> sd through one shared IEEE chain, N_h*S_h weights
  milli-floored, allocations by exact BIGINT floor division.
* ``x331_bh_fdr`` — Benjamini-Hochberg FDR over the 25 per-nation
  mean-order-value z-tests: |z| micro-floored from exact moments; the
  BH p-threshold comparisons run in |z| SPACE against PYTHON-COMPUTED
  literal normal quantiles Phi^-1(1 - i*alpha/(2m)) (bisection on
  math.erf at import — compile-time constants in BOTH engines, the
  x102 literal idiom), so no engine needs a normal CDF.
* ``x333_haar_energy`` — Haar wavelet detail energy of daily revenue
  at scales 2/4/8/16 days: four fixed pair-sum/pair-diff levels over
  the bounded daily frame, exact kilodollar BIGINT throughout; says
  WHICH timescale carries the volatility x138's bands only bound.
* ``x334_periodogram_peak`` — exact periodogram power at candidate
  periods 7/14/30/91 days: angles reduced to t mod p so cos/sin
  become LITERAL milli-floored integer tables (no engine trig at
  all); power = c^2 + s^2 exact BIGINT. The spectral complement of
  x120/x135's calendar indexes: it FINDS the cycle length instead of
  assuming it.

Wave 3 — intervals, embedding geometry, rate/calibration inference:

* ``x335_open_order_backlog`` — month-end open-order backlog (placed
  but not fully received): each order explodes to the months it
  spans (order month .. last-receipt month - 1), exact cents value of
  open orders per month. The WIP/liability curve under x228's
  stockout projection.
* ``x336_permutation_test`` — deterministic permutation test for the
  md5 A/B mean-spend difference: 64 md5-salted re-assignments at the
  CUSTOMER grain (aggregate once, explode customers x 64 — never the
  fact table), replicate diffs through one shared IEEE chain,
  p = (1 + #{|d_r| >= |d_obs|}) / 65. The distribution-free
  companion of x160's z-test.
* ``x337_wilson_intervals`` — Wilson 95% score interval for the
  urgent-order share per segment (literal z = 1.959964), exact
  counts -> one shared IEEE chain -> ppm floors. The per-rate CI
  x269's corpus-level DKW bands don't give.
* ``x332_embedding_energy`` — per-dimension variance spectrum of the
  embedding table: exact 3-dp fixed-point moments per dimension,
  variance in nano, descending cumulative energy share in ppm. Finds
  dead/dominant dimensions; the geometry audit x188's null/dims gate
  doesn't look at.
* ``x339_dim_redundancy`` — pairwise correlation among the top-8
  variance dimensions (chosen by exact integer variance order,
  collected as plan literals — the bounded-collect centroid idiom):
  28 exact cross-moment pairs in ONE scan, |corr| in milli. Redundant
  dimensions mean wasted ANN bits (x102/x30 projections assume
  near-isotropy).
* ``x340_calibration_slope`` — OLS calibration slope/intercept of the
  urgent-order outcome against a deterministic prior-spend score in
  [0,1]: exact ppm-integer score moments; the one-number companion
  of x215's binned ECE (slope < 1 = overconfident score).

Hash-parity conventions as plans/queries.py: exact cents/BIGINT
arithmetic until one shared IEEE expression, total ORDER BY, BIGINT
casts on every count; literal tables are generated ONCE in Python and
embedded in both the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import Query
from ravelytics_spark.sources.tables import load_table

STAGED: dict[str, Query] = {}


def _staged(name: str, op_id: str, doc: str, oracle: str | None = None):
    def deco(fn):
        STAGED[name] = Query(name, op_id, doc, fn, oracle)
        return fn

    return deco


# DuckDB epoch seconds as exact BIGINT (epoch(ts) returns a DOUBLE
# with fractional seconds; date_diff counts whole second boundaries,
# matching Spark's unix_timestamp truncation).
_DD_EPOCH = "date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)"


# ---------------------------------------------------------------------------
# x326 — streaming dedup state-store size projection at TTL 1h/6h/24h
# ---------------------------------------------------------------------------

_TTLS_H = (1, 6, 24)

_ST_ORACLE = f"""
WITH uh AS (
    SELECT DISTINCT user_id, CAST({_DD_EPOCH} // 3600 AS BIGINT) AS hb
    FROM events
),
span AS (
    SELECT CAST(min(hb) AS BIGINT) AS h0, CAST(max(hb) AS BIGINT) AS h1
    FROM uh
),
cov AS (
    SELECT DISTINCT t.ttl, uh.user_id, hh.h
    FROM uh
    CROSS JOIN (SELECT unnest([{", ".join(str(t) for t in _TTLS_H)}]) AS ttl) t
    CROSS JOIN span
    CROSS JOIN LATERAL (
        SELECT unnest(range(uh.hb, least(uh.hb + t.ttl, span.h1 + 1))) AS h
    ) hh
),
st AS (
    SELECT ttl, h, CAST(count(*) AS BIGINT) AS live
    FROM cov GROUP BY ttl, h
)
SELECT st.ttl AS ttl_hours,
       CAST(span.h1 - span.h0 + 1 AS BIGINT) AS n_hours,
       CAST(max(st.live) AS BIGINT) AS peak_keys,
       CAST(SUM(st.live) * 1000 // (span.h1 - span.h0 + 1) AS BIGINT)
           AS avg_keys_milli
FROM st CROSS JOIN span
GROUP BY st.ttl, span.h0, span.h1
ORDER BY ttl_hours
"""


@_staged(
    "x326_state_ttl_projection",
    "OP-T1/X1-ext",
    "State-store size projection for keyed streaming dedup at TTL "
    "1h/6h/24h: a key is live at hour h iff it produced an event in "
    "(h-TTL, h], so per (user, active-hour) each distinct activity "
    "hour covers the next TTL hours (clamped to the observed span); "
    "peak and average live-key counts per TTL are the numbers that "
    "size dropDuplicatesWithinWatermark / stateful-TTL memory BEFORE "
    "the stream starts. avg includes zero-state hours in the "
    "denominator (the full observed span). Scale: (user, hour) "
    "distinct hash-agg, explode factor <= TTL (constant 24), one "
    "more distinct + hour agg — all linear, no windows, no joins "
    "bigger than the 1-row span broadcast.",
    _ST_ORACLE,
)
def x326_state_ttl_projection(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    uh = ev.select(
        "user_id",
        F.expr("unix_timestamp(ts) DIV 3600").cast("long").alias("hb"),
    ).distinct()
    span = uh.agg(
        F.min("hb").cast("long").alias("h0"),
        F.max("hb").cast("long").alias("h1"),
    )
    ttls = F.explode(
        F.array(*[F.lit(t).cast("long") for t in _TTLS_H])
    ).alias("ttl")
    cov = (
        uh.select("user_id", "hb", ttls)
        .crossJoin(F.broadcast(span))
        .select(
            "ttl",
            "user_id",
            F.explode(
                F.sequence(
                    F.col("hb"),
                    F.least(
                        F.col("hb") + F.col("ttl") - 1, F.col("h1")
                    ),
                )
            ).alias("h"),
        )
        .distinct()
    )
    st = cov.groupBy("ttl", "h").agg(F.count("*").cast("long").alias("live"))
    return (
        st.crossJoin(F.broadcast(span))
        .groupBy("ttl", "h0", "h1")
        .agg(
            F.max("live").cast("long").alias("peak_keys"),
            F.expr(
                "CAST(SUM(live) * 1000 DIV (max(h1) - max(h0) + 1)"
                " AS BIGINT)"
            ).alias("avg_keys_milli"),
        )
        .select(
            F.col("ttl").alias("ttl_hours"),
            (F.col("h1") - F.col("h0") + 1).cast("long").alias("n_hours"),
            "peak_keys",
            "avg_keys_milli",
        )
        .orderBy("ttl_hours")
    )


# ---------------------------------------------------------------------------
# x327 — sessionization gap sensitivity curve (5/15/30/60 min)
# ---------------------------------------------------------------------------

_GAPS_S = (300, 900, 1800, 3600)

_GS_ORACLE = f"""
WITH d AS (
    SELECT date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                     ts) AS gap_s
    FROM events
),
g AS (
    SELECT unnest([{", ".join(str(g) for g in _GAPS_S)}]) AS gap_limit_s
)
SELECT g.gap_limit_s AS gap_limit_s,
       CAST(SUM(CASE WHEN d.gap_s IS NULL OR d.gap_s > g.gap_limit_s
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) * 1000
            // SUM(CASE WHEN d.gap_s IS NULL OR d.gap_s > g.gap_limit_s
                        THEN 1 ELSE 0 END) AS BIGINT)
           AS events_per_session_milli,
       CAST(coalesce(SUM(CASE WHEN d.gap_s IS NOT NULL
                               AND d.gap_s <= g.gap_limit_s
                              THEN d.gap_s END), 0) AS BIGINT)
           AS in_session_seconds
FROM d CROSS JOIN g
GROUP BY g.gap_limit_s
ORDER BY gap_limit_s
"""


@_staged(
    "x327_gap_sensitivity",
    "OP-T1/W3-ext",
    "Sessionization gap sensitivity curve: session count, "
    "events-per-session and total in-session dwell at inactivity "
    "gaps 5/15/30/60 min, all from ONE user-partitioned lag window — "
    "a session starts where the gap is null or exceeds the limit, "
    "and total in-session time is EXACTLY the sum of sub-limit gaps, "
    "so no per-gap session assembly is needed. The curve that "
    "justifies (or indicts) the fixed 30-min gap x6/x39/x126 assume, "
    "and the session_window gap a streaming deployment must commit "
    "to. Scale: one lag window on the natural (user) partitioning, "
    "then a 4x literal explode into a 4-row agg.",
    _GS_ORACLE,
)
def x327_gap_sensitivity(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s")
    )
    gaps = F.explode(
        F.array(*[F.lit(g).cast("long") for g in _GAPS_S])
    ).alias("gap_limit_s")
    brk = F.when(
        F.col("gap_s").isNull() | (F.col("gap_s") > F.col("gap_limit_s")),
        1,
    ).otherwise(0)
    ins = F.when(
        F.col("gap_s").isNotNull()
        & (F.col("gap_s") <= F.col("gap_limit_s")),
        F.col("gap_s"),
    )
    return (
        d.select("gap_s", gaps)
        .groupBy("gap_limit_s")
        .agg(
            F.sum(brk).cast("long").alias("n_sessions"),
            F.count("*").cast("long").alias("n_events"),
            F.expr(
                "CAST(count(*) * 1000 DIV SUM(CASE WHEN gap_s IS NULL"
                " OR gap_s > gap_limit_s THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("events_per_session_milli"),
            F.coalesce(F.sum(ins), F.lit(0))
            .cast("long")
            .alias("in_session_seconds"),
        )
        .orderBy("gap_limit_s")
    )


# ---------------------------------------------------------------------------
# x328 — hourly session concurrency (peak load for a sessionizing stream)
# ---------------------------------------------------------------------------

_PC_ORACLE = f"""
WITH e AS (
    SELECT user_id, event_id, ts,
           CAST({_DD_EPOCH} AS BIGINT) AS es,
           date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                     ts) AS gap_s
    FROM events
),
s AS (
    SELECT user_id, es,
           CAST(SUM(CASE WHEN gap_s IS NULL OR gap_s > 1800
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
    FROM e
),
spans AS (
    SELECT user_id, sid,
           CAST(min(es) // 3600 AS BIGINT) AS h_start,
           CAST(max(es) // 3600 AS BIGINT) AS h_end
    FROM s GROUP BY user_id, sid
),
conc AS (
    SELECT hh.h, CAST(count(*) AS BIGINT) AS n_concurrent
    FROM spans
    CROSS JOIN LATERAL (
        SELECT unnest(range(spans.h_start, spans.h_end + 1)) AS h
    ) hh
    GROUP BY hh.h
)
SELECT h AS hour_bucket, n_concurrent
FROM conc
ORDER BY n_concurrent DESC, hour_bucket
LIMIT 5
"""


@_staged(
    "x328_peak_concurrency",
    "OP-T1/G6-ext",
    "Hourly session concurrency: 30-min-gap sessions (the x6 "
    "assembly) reduced to (first-hour, last-hour) spans, each span "
    "exploded to the hours it overlaps, top-5 busiest hours by "
    "concurrent-session count. x106 counts PAIRWISE overlaps of "
    "fixed windows; this is the point-load curve — the number of "
    "simultaneously-open sessions a stateful sessionizing stream "
    "must hold, i.e. its peak state/executor provisioning. Scale: "
    "the lag window rides the natural user partitioning, spans are "
    "one hash-agg, the hour explode is bounded by each session's "
    "real duration, and top-5 is a TakeOrdered — no global windows.",
    _PC_ORACLE,
)
def x328_peak_concurrency(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    brk = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    s = ev.select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.sum(brk).over(wsum).cast("long").alias("sid"),
    )
    spans = s.groupBy("user_id", "sid").agg(
        F.expr("CAST(min(es) DIV 3600 AS BIGINT)").alias("h_start"),
        F.expr("CAST(max(es) DIV 3600 AS BIGINT)").alias("h_end"),
    )
    conc = (
        spans.select(
            F.explode(
                F.sequence(F.col("h_start"), F.col("h_end"))
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count("*").cast("long").alias("n_concurrent"))
    )
    return (
        conc.select(F.col("h").alias("hour_bucket"), "n_concurrent")
        .orderBy(F.col("n_concurrent").desc(), "hour_bucket")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# x329 — per-minute micro-batch profile for a 1-minute trigger
# ---------------------------------------------------------------------------

_MB_ORACLE = f"""
WITH m AS (
    SELECT CAST({_DD_EPOCH} // 60 AS BIGINT) AS mb,
           CAST(count(*) AS BIGINT) AS batch
    FROM events GROUP BY 1
),
sz AS (
    SELECT batch, CAST(count(*) AS BIGINT) AS n_minutes
    FROM m GROUP BY batch
),
cum AS (
    SELECT batch, n_minutes,
           CAST(SUM(n_minutes) OVER (ORDER BY batch
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           CAST(SUM(n_minutes) OVER () AS BIGINT) AS tot,
           CAST(SUM(batch * n_minutes) OVER () AS BIGINT) AS ev_tot
    FROM sz
)
SELECT CAST(max(tot) AS BIGINT) AS n_active_minutes,
       CAST(max(batch) AS BIGINT) AS max_batch,
       CAST(min(CASE WHEN cum * 2 >= tot THEN batch END) AS BIGINT)
           AS p50_batch,
       CAST(min(CASE WHEN cum * 10 >= tot * 9 THEN batch END) AS BIGINT)
           AS p90_batch,
       CAST(min(CASE WHEN cum * 100 >= tot * 99 THEN batch END) AS BIGINT)
           AS p99_batch,
       CAST(max(ev_tot) * 1000 // max(tot) AS BIGINT)
           AS mean_batch_milli
FROM cum
"""


@_staged(
    "x329_microbatch_profile",
    "OP-T1/G6-ext",
    "Per-minute arrival batch profile for a 1-minute trigger: max "
    "and exact type-1 p50/p90/p99 batch sizes plus the milli mean "
    "over ACTIVE minutes. Quantiles come from the cumulative window "
    "over the DISTINCT-batch-size frame (bounded by max batch size), "
    "never a rank over the raw minute frame — the x200/x285 bounded-"
    "frame idiom. This is the maxOffsetsPerTrigger / trigger-interval "
    "sizing input: p99 batch vs mean says how bursty the stream is "
    "and how much headroom a fixed trigger needs (x180's Fano factor "
    "is the per-type health fingerprint; this is the global capacity "
    "curve). Scale: minute hash-agg -> size hash-agg -> windows over "
    "the bounded size-distinct frame (whitelisted SinglePartition).",
    _MB_ORACLE,
)
def x329_microbatch_profile(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        F.expr("unix_timestamp(ts) DIV 60").cast("long").alias("mb")
    ).agg(F.count("*").cast("long").alias("batch"))
    sz = m.groupBy("batch").agg(
        F.count("*").cast("long").alias("n_minutes")
    )
    wc = Window.partitionBy().orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = sz.select(
        "batch",
        F.sum("n_minutes").over(wc).cast("long").alias("cum"),
        F.sum("n_minutes").over(wall).cast("long").alias("tot"),
        F.sum(F.expr("batch * n_minutes")).over(wall).cast("long")
        .alias("ev_tot"),
    )
    return cum.agg(
        F.max("tot").cast("long").alias("n_active_minutes"),
        F.max("batch").cast("long").alias("max_batch"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("batch")))
        .cast("long")
        .alias("p50_batch"),
        F.min(
            F.when(F.col("cum") * 10 >= F.col("tot") * 9, F.col("batch"))
        )
        .cast("long")
        .alias("p90_batch"),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("tot") * 99, F.col("batch"))
        )
        .cast("long")
        .alias("p99_batch"),
        F.expr("CAST(max(ev_tot) * 1000 DIV max(tot) AS BIGINT)").alias(
            "mean_batch_milli"
        ),
    )
