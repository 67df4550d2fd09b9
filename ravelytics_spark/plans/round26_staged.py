"""Round-26 operators — STAGED (round 7), registration deferred.

The round-7 driver certification window is fully booked with the 59
uncertified oracle entries registered this round (x130–x193), so this
batch is built, oracle-twinned and tested NOW but kept OUT of
``REGISTRY`` until round 8 — the round-18/23/24/25 staging contract:
entries ship the round after the window they'd overflow. Round 8 adds
the two-line self-registration footer the earlier staged modules carry.

Theme: training-data governance + robust warehouse analytics — the
operational layer around the curation/dedup/similarity stack.

* ``x194_k_anonymity`` — the k-anonymity audit a training-data
  governance pass runs before release: equivalence classes over the
  quasi-identifier pair (nation, market segment), rows in classes
  smaller than k=5, and the at-risk fraction in exact ppm. One
  hash-agg over the QI key (distributed) + one bounded rollup over
  the <=|nations x segments| class table.
* ``x195_winsorized_stats`` — per-brand winsorized mean: values are
  clamped to the exact rank-picked p05/p95 cents before averaging
  (rank thresholds L = n*5 DIV 100 + 1, H = n*95 DIV 100 floored to
  >=L over the total (cents, orderkey, linenumber) order) — the
  robust-mean counterpart of x124's Tukey fences, certified
  integer-exact; milli-cent means keep the 100x sum inside BIGINT
  (the x148/x160 overflow lesson).
* ``x196_feature_hashing`` — the hashing-trick audit: categorical
  features (segment:nation) hash into 64 buckets via the portable
  md5 prefix; per-bucket distinct-feature and row loads quantify
  collision pressure before anyone trains on hashed features.
* ``x197_negative_sampling`` — deterministic negative sampling for
  (customer -> brand) positives: 3 md5-indexed brand draws per
  customer, observed positives removed by ANTI join — the
  contrastive-training pair generator, reproducible across
  partitionings because draws hash (customer, draw index), never
  row position.
* ``x198_profile_drift`` — column-profile drift between the first
  and second calendar halves of orders (split at 1998-05-01, the
  midpoint of the 1995-01..2001-08 corpus): row counts, exact
  distinct customers, cents totals, milli-cent means,
  urgent-priority ppm per side plus the integer deltas — the x79
  single-table profile lifted to the two-snapshot drift report.
* ``x199_entity_holdout`` — leakage-free holdout split at the
  CUSTOMER entity (md5(custkey) % 100 < 10), with the audit that
  explains WHY: the row-hash alternative (md5(orderkey)) is
  replayed side by side and the count of customers straddling
  splits under it is reported — entity split: zero by construction,
  row split: thousands (the train/test contamination x109's row
  split cannot see).
* ``x200_discrete_hazard`` — discrete-time hazard of repeat
  ordering: consecutive order gaps bucketed into 30-day intervals,
  at-risk counts by suffix sum over the <=13-bucket table, hazard
  in exact ppm — the survival-analysis primitive without a single
  float product (no Kaplan-Meier running product to drift).
* ``x201_curation_matrix`` — the curation decision cross-tab:
  length band (n_chars DIV 256 capped at 7) x duplication band
  (normalized-fingerprint cluster size 1/2/3+) with doc and
  char volumes per cell — the policy table a curation run reads to
  decide what to drop first (big dup clusters of short docs).

Hash-parity conventions as plans/queries.py: exact cents/BIGINT
arithmetic, md5-derived portable hashes (CAST('0x'||substr(md5 ..)
in DuckDB == conv(substr(md5 ..),16,10) in Spark, both unsigned
32-bit), nonnegative-operand floor divisions only, total ORDER BY on
every output. Every product is bounded at 100x of sf0.1 row counts
before it is written (the x160 overflow rule): cents sums reach
~2.4e13 there, so ratio scalings use x1000 (milli) against raw sums
and x1e6 (ppm) only against counts.
"""

from __future__ import annotations

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


# ---------------------------------------------------------------------------
# x194 — k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
WITH cls AS (
    SELECT c_nationkey, c_mktsegment, count(*) AS sz
    FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST({_KANON_K} AS BIGINT) AS k,
       CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_small_classes,
       CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) AS BIGINT)
           AS n_risky_rows,
       CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) * 1000000
            // SUM(sz) AS BIGINT) AS risky_ppm,
       CAST(MIN(sz) AS BIGINT) AS min_class_size
FROM cls
"""


@_staged(
    "x194_k_anonymity",
    "OP-G5/X-ext",
    "k-anonymity audit over the (nation, market segment) "
    "quasi-identifier pair: every row in an equivalence class smaller "
    "than k=5 is re-identifiable by QI lookup, so the governance gate "
    "reports class counts, at-risk rows and the risky fraction in "
    "exact ppm (risky*1e6 over rows: counts only, BIGINT-safe at any "
    "advertised scale). Scale shape: one map-side-combinable hash-agg "
    "on the QI key; the rollup runs over the <=|nations x segments| "
    "class table (~125 rows regardless of corpus size).",
    _KANON_ORACLE,
)
def x194_k_anonymity(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    cls = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("sz")
    )
    small = F.col("sz") < _KANON_K
    return cls.agg(
        F.lit(_KANON_K).cast("long").alias("k"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(small, 1).otherwise(0))
        .cast("long")
        .alias("n_small_classes"),
        F.sum(F.when(small, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.expr(
            f"CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) "
            "* 1000000 DIV SUM(sz) AS BIGINT)"
        ).alias("risky_ppm"),
        F.min("sz").cast("long").alias("min_class_size"),
    )


# ---------------------------------------------------------------------------
# x195 — per-brand winsorized mean (rank-exact p05/p95 clamp)
# ---------------------------------------------------------------------------

_WINS_ORACLE = """
WITH v AS (
    SELECT p.p_brand AS brand,
           CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
           l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
r AS (
    SELECT brand, cents,
           row_number() OVER (PARTITION BY brand
                              ORDER BY cents, l_orderkey, l_linenumber)
               AS i,
           count(*) OVER (PARTITION BY brand) AS n
    FROM v
),
thr AS (
    SELECT brand, max(n) AS n,
           MIN(CASE WHEN i = n * 5 // 100 + 1 THEN cents END) AS lo_cents,
           MIN(CASE WHEN i = GREATEST(n * 95 // 100, n * 5 // 100 + 1)
                    THEN cents END) AS hi_cents
    FROM r GROUP BY brand
)
SELECT r.brand,
       CAST(t.n AS BIGINT) AS n,
       CAST(t.lo_cents AS BIGINT) AS lo_cents,
       CAST(t.hi_cents AS BIGINT) AS hi_cents,
       CAST(SUM(r.cents) * 1000 // t.n AS BIGINT) AS raw_mean_millicents,
       CAST(SUM(LEAST(GREATEST(r.cents, t.lo_cents), t.hi_cents)) * 1000
            // t.n AS BIGINT) AS wins_mean_millicents
FROM r JOIN thr t ON r.brand = t.brand
GROUP BY r.brand, t.n, t.lo_cents, t.hi_cents
ORDER BY r.brand
"""


@_staged(
    "x195_winsorized_stats",
    "OP-G6/W-ext",
    "Per-brand winsorized mean of line price: every value is clamped "
    "to the exact rank-picked p05/p95 cents (ranks L = n*5 DIV 100 + "
    "1 and H = max(n*95 DIV 100, L) over the total (cents, orderkey, "
    "linenumber) order — rank picks are tie-permutation-invariant, "
    "the x118 argument) before the mean, beside the raw mean for the "
    "outlier-impact read. Integer-exact end to end; means scale by "
    "1000 (milli-cents), not 1e6 — a brand's cents sum reaches "
    "~2.4e13 at 100x and ppm scaling would overflow BIGINT (the x160 "
    "lesson, bounded BEFORE writing). Scale shape: the rank window "
    "partitions on brand (parallel across ~25 brands; a single "
    "outsized group would switch to operators/ranks.py bucketed "
    "form, the x118 convention), thresholds broadcast back.",
    _WINS_ORACLE,
)
def x195_winsorized_stats(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    v = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    wP = Window.partitionBy("brand").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    wN = Window.partitionBy("brand")
    r = v.select(
        "brand",
        "cents",
        F.row_number().over(wP).cast("long").alias("i"),
        F.count("*").over(wN).cast("long").alias("n"),
    )
    lo_rank = F.expr("n * 5 DIV 100 + 1")
    hi_rank = F.expr("GREATEST(n * 95 DIV 100, n * 5 DIV 100 + 1)")
    thr = r.groupBy("brand").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("i") == lo_rank, F.col("cents"))).alias(
            "lo_cents"
        ),
        F.min(F.when(F.col("i") == hi_rank, F.col("cents"))).alias(
            "hi_cents"
        ),
    )
    clamped = r.select("brand", "cents").join(
        F.broadcast(thr), "brand"
    ).select(
        "brand",
        F.col("n"),
        F.col("lo_cents"),
        F.col("hi_cents"),
        F.col("cents"),
        F.least(
            F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents")
        ).alias("wcents"),
    )
    return (
        clamped.groupBy("brand", "n", "lo_cents", "hi_cents")
        .agg(
            F.expr("CAST(SUM(cents) * 1000 DIV n AS BIGINT)").alias(
                "raw_mean_millicents"
            ),
            F.expr("CAST(SUM(wcents) * 1000 DIV n AS BIGINT)").alias(
                "wins_mean_millicents"
            ),
        )
        .select(
            "brand",
            F.col("n").cast("long").alias("n"),
            F.col("lo_cents").cast("long").alias("lo_cents"),
            F.col("hi_cents").cast("long").alias("hi_cents"),
            "raw_mean_millicents",
            "wins_mean_millicents",
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# x196 — hashing-trick collision audit (64 feature buckets)
# ---------------------------------------------------------------------------

_FH_BUCKETS = 64

_FH_ORACLE = f"""
WITH feat AS (
    SELECT c_mktsegment || ':' || c_nationkey AS feature
    FROM customer
),
hashed AS (
    SELECT feature,
           CAST('0x' || substr(md5('fh:' || feature), 1, 8) AS BIGINT)
               % {_FH_BUCKETS} AS bucket
    FROM feat
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT feature) AS BIGINT) AS n_features
FROM hashed
GROUP BY bucket
ORDER BY bucket
"""


@_staged(
    "x196_feature_hashing",
    "OP-X-ext/G5",
    "Hashing-trick collision audit: the categorical feature "
    "(segment:nation, ~125 distinct values) hashes into 64 buckets "
    f"via the portable md5 32-bit prefix mod {_FH_BUCKETS}, and the "
    "audit reports per-bucket row load and distinct-feature load — "
    "n_features > 1 is a collision that aliases gradients when "
    "anyone trains on the hashed features. Scale shape: one "
    "map-side-combinable hash-agg on the 64-value bucket key; "
    "distinct-feature counting is a two-level agg on "
    "(bucket, feature) — both corpus-sized steps are hash-aggs, no "
    "window, no collect.",
    _FH_ORACLE,
)
def x196_feature_hashing(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    feature = F.concat(
        F.col("c_mktsegment"), F.lit(":"), F.col("c_nationkey").cast("string")
    )
    hashed = c.select(
        feature.alias("feature"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("fh:"), feature)), 1, 8),
                16,
                10,
            ).cast("long")
            % _FH_BUCKETS
        ).alias("bucket"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("feature").cast("long").alias("n_features"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n_rows", "n_features")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# x197 — deterministic negative sampling for (customer -> brand) positives
# ---------------------------------------------------------------------------

_NEG_DRAWS = 3

_NEG_ORACLE = f"""
WITH brands AS (
    SELECT p_brand,
           CAST(row_number() OVER (ORDER BY p_brand) - 1 AS BIGINT) AS bidx
    FROM (SELECT DISTINCT p_brand FROM part)
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_brands FROM brands),
draws AS (
    SELECT c.c_custkey, d.di,
           CAST('0x' || substr(md5('neg:' || c.c_custkey || ':' || d.di),
                               1, 8) AS BIGINT) % nb.n_brands AS bidx
    FROM customer c
    CROSS JOIN (SELECT unnest([0, 1, 2]) AS di) d
    CROSS JOIN nb
),
positives AS (
    SELECT DISTINCT o.o_custkey AS c_custkey, p.p_brand
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
),
labeled AS (
    SELECT dr.di, dr.c_custkey, dr.bidx,
           CASE WHEN pos.c_custkey IS NULL THEN 0 ELSE 1 END AS is_pos
    FROM draws dr
    JOIN brands b ON dr.bidx = b.bidx
    LEFT JOIN positives pos
      ON dr.c_custkey = pos.c_custkey AND b.p_brand = pos.p_brand
)
SELECT CAST(di AS BIGINT) AS draw_idx,
       CAST(count(*) AS BIGINT) AS n_draws,
       CAST(SUM(is_pos) AS BIGINT) AS n_dropped_positive,
       CAST(SUM(1 - is_pos) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_pos = 0 THEN c_custkey * 31 + bidx
                     ELSE 0 END) AS BIGINT) AS kept_checksum
FROM labeled
GROUP BY di
ORDER BY di
"""


@_staged(
    "x197_negative_sampling",
    "OP-J4/X-ext",
    "Deterministic negative sampling for contrastive training over "
    "(customer -> brand) positives: each customer gets "
    f"{_NEG_DRAWS} brand draws indexed by the md5 32-bit prefix of "
    "(customer, draw index) mod |brands| — reproducible across "
    "partitionings because draws hash KEYS, never row position — "
    "and draws that collide with an observed positive (the "
    "orders->lineitem->part distinct pair set) are labeled for the "
    "drop. Certified output is the 3-row audit (draw count, "
    "dropped-as-positive, kept, kept checksum) that pins the full "
    "pair set; the pair frame itself is the reusable intermediate. "
    "Scale shape: the ~25-row brand dim broadcasts (its rank window "
    "is bounded by brand cardinality), positives are one distinct "
    "hash-agg, the label join is a LEFT join on (custkey, brand); "
    "checksum bounded: custkey*31 at 100x sf0.1 ~ 4.7e7, summed "
    "over 4.5M draws ~ 2e14 << BIGINT (the x160 rule).",
    _NEG_ORACLE,
)
def x197_negative_sampling(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    brands = (
        p.select("p_brand")
        .distinct()
        .select(
            "p_brand",
            (
                F.row_number().over(Window.orderBy("p_brand")) - 1
            )
            .cast("long")
            .alias("bidx"),
        )
    )
    nb = brands.agg(F.count("*").cast("long").alias("n_brands"))

    draws = (
        c.select("c_custkey")
        .crossJoin(F.broadcast(nb))
        .select(
            "c_custkey",
            F.explode(
                F.array(*[F.lit(i) for i in range(_NEG_DRAWS)])
            ).alias("di"),
            "n_brands",
        )
        .select(
            "c_custkey",
            "di",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("neg:"),
                                F.col("c_custkey").cast("string"),
                                F.lit(":"),
                                F.col("di").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_brands")
            ).alias("bidx"),
        )
    )
    positives = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("c_custkey"), "p_brand")
        .distinct()
    )
    labeled = (
        draws.join(F.broadcast(brands), "bidx")
        .join(
            positives.withColumn("is_pos", F.lit(1)),
            ["c_custkey", "p_brand"],
            "left",
        )
        .select(
            "di",
            "c_custkey",
            "bidx",
            F.coalesce(F.col("is_pos"), F.lit(0)).alias("is_pos"),
        )
    )
    return (
        labeled.groupBy("di")
        .agg(
            F.count("*").cast("long").alias("n_draws"),
            F.sum("is_pos").cast("long").alias("n_dropped_positive"),
            F.sum(1 - F.col("is_pos")).cast("long").alias("n_kept"),
            F.sum(
                F.when(
                    F.col("is_pos") == 0,
                    F.col("c_custkey") * 31 + F.col("bidx"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("kept_checksum"),
        )
        .select(F.col("di").cast("long").alias("draw_idx"), "n_draws",
                "n_dropped_positive", "n_kept", "kept_checksum")
        .orderBy("draw_idx")
    )


# ---------------------------------------------------------------------------
# x198 — two-snapshot column-profile drift (orders, calendar halves)
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "1998-05-01"

_DRIFT_ORACLE = f"""
WITH side AS (
    SELECT CASE WHEN o_orderdate < TIMESTAMP '{_DRIFT_SPLIT}'
                THEN 'a' ELSE 'b' END AS s,
           o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent
    FROM orders
),
prof AS (
    SELECT s,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           CAST(SUM(cents) * 1000 // count(*) AS BIGINT)
               AS mean_millicents,
           CAST(SUM(urgent) * 1000000 // count(*) AS BIGINT) AS urgent_ppm
    FROM side GROUP BY s
)
SELECT a.n_rows AS a_rows, b.n_rows AS b_rows,
       a.n_customers AS a_customers, b.n_customers AS b_customers,
       a.cents_total AS a_cents, b.cents_total AS b_cents,
       a.mean_millicents AS a_mean_millicents,
       b.mean_millicents AS b_mean_millicents,
       a.urgent_ppm AS a_urgent_ppm, b.urgent_ppm AS b_urgent_ppm,
       CAST(b.n_rows - a.n_rows AS BIGINT) AS d_rows,
       CAST(b.mean_millicents - a.mean_millicents AS BIGINT)
           AS d_mean_millicents,
       CAST(b.urgent_ppm - a.urgent_ppm AS BIGINT) AS d_urgent_ppm
FROM (SELECT * FROM prof WHERE s = 'a') a,
     (SELECT * FROM prof WHERE s = 'b') b
"""


@_staged(
    "x198_profile_drift",
    "OP-G5/G6-ext",
    "Two-snapshot column-profile drift: orders split at the corpus "
    f"calendar midpoint ({_DRIFT_SPLIT}; span 1995-01..2001-08) into "
    "sides a/b, each profiled with exact counts, exact distinct "
    "customers, cents totals, milli-cent means and urgent-priority "
    "ppm, plus the integer side deltas — x79's single-table profile "
    "lifted to the drift report a feed monitor diffs every load. "
    "Integer bounds at 100x sf0.1 (the x160 rule): 15M orders x "
    "~1.5e7 cents = 2.25e14; x1000 for the milli-cent mean = 2.3e17 "
    "< BIGINT. Scale shape: one pass over orders into a 2-row "
    "profile (count-distinct is the only second shuffle); the a x b "
    "assembly is a 1-row x 1-row join.",
    _DRIFT_ORACLE,
)
def x198_profile_drift(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    side = o.select(
        F.when(F.col("o_orderdate") < F.lit(_DRIFT_SPLIT), "a")
        .otherwise("b")
        .alias("s"),
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("urgent"),
    )
    prof = side.groupBy("s").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents_total"),
        F.expr("CAST(SUM(cents) * 1000 DIV count(*) AS BIGINT)").alias(
            "mean_millicents"
        ),
        F.expr(
            "CAST(SUM(urgent) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("urgent_ppm"),
    )
    a = prof.filter(F.col("s") == "a").drop("s")
    b = prof.filter(F.col("s") == "b").drop("s")
    a = a.select(*[F.col(c).alias(f"a_{c}") for c in a.columns])
    b = b.select(*[F.col(c).alias(f"b_{c}") for c in b.columns])
    return a.crossJoin(b).select(
        F.col("a_n_rows").alias("a_rows"),
        F.col("b_n_rows").alias("b_rows"),
        F.col("a_n_customers").alias("a_customers"),
        F.col("b_n_customers").alias("b_customers"),
        F.col("a_cents_total").alias("a_cents"),
        F.col("b_cents_total").alias("b_cents"),
        F.col("a_mean_millicents").alias("a_mean_millicents"),
        F.col("b_mean_millicents").alias("b_mean_millicents"),
        F.col("a_urgent_ppm").alias("a_urgent_ppm"),
        F.col("b_urgent_ppm").alias("b_urgent_ppm"),
        (F.col("b_n_rows") - F.col("a_n_rows"))
        .cast("long")
        .alias("d_rows"),
        (F.col("b_mean_millicents") - F.col("a_mean_millicents"))
        .cast("long")
        .alias("d_mean_millicents"),
        (F.col("b_urgent_ppm") - F.col("a_urgent_ppm"))
        .cast("long")
        .alias("d_urgent_ppm"),
    )


# ---------------------------------------------------------------------------
# x199 — entity-level holdout split + leakage audit vs the row split
# ---------------------------------------------------------------------------

_HOLD_PCT = 10

_HOLD_ORACLE = f"""
WITH assigned AS (
    SELECT o_custkey, o_orderkey,
           CASE WHEN CAST('0x' || substr(md5('eh:' || o_custkey), 1, 8)
                     AS BIGINT) % 100 < {_HOLD_PCT} THEN 1 ELSE 0 END
               AS ent_test,
           CASE WHEN CAST('0x' || substr(md5('eh:' || o_orderkey), 1, 8)
                     AS BIGINT) % 100 < {_HOLD_PCT} THEN 1 ELSE 0 END
               AS row_test
    FROM orders
),
per_cust AS (
    SELECT o_custkey,
           count(*) AS n,
           SUM(row_test) AS n_row_test,
           MIN(ent_test) AS ent_lo, MAX(ent_test) AS ent_hi
    FROM assigned GROUP BY o_custkey
)
SELECT CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN ent_hi = 1 THEN n ELSE 0 END) AS BIGINT)
           AS ent_test_orders,
       CAST(SUM(ent_hi) AS BIGINT) AS ent_test_customers,
       CAST(SUM(n_row_test) AS BIGINT) AS row_test_orders,
       CAST(SUM(CASE WHEN n_row_test > 0 AND n_row_test < n
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS row_straddle_customers,
       CAST(SUM(CASE WHEN ent_lo <> ent_hi THEN 1 ELSE 0 END) AS BIGINT)
           AS ent_straddle_customers
FROM per_cust
"""


@_staged(
    "x199_entity_holdout",
    "OP-X9/J-ext",
    "Leakage-free holdout split at the CUSTOMER entity "
    f"(md5 32-bit prefix of custkey mod 100 < {_HOLD_PCT}) with the "
    "audit that explains WHY entity beats row: the row-hash "
    "alternative (same hash on orderkey) is replayed side by side "
    "and the customers whose orders STRADDLE the row split — the "
    "train/test contamination a per-row split cannot see — are "
    "counted; the entity straddle count is computed the same honest "
    "way and is zero by construction (the split is a function of "
    "the entity key). Scale shape: split assignment is a pure map "
    "(hash of a key column), the audit is one hash-agg on custkey "
    "plus a global rollup — one partial row per partition.",
    _HOLD_ORACLE,
)
def x199_entity_holdout(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")

    def _test_flag(prefix_col):
        return F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("eh:"), prefix_col.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
            < _HOLD_PCT,
            1,
        ).otherwise(0)

    assigned = o.select(
        "o_custkey",
        "o_orderkey",
        _test_flag(F.col("o_custkey")).alias("ent_test"),
        _test_flag(F.col("o_orderkey")).alias("row_test"),
    )
    per_cust = assigned.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum("row_test").alias("n_row_test"),
        F.min("ent_test").alias("ent_lo"),
        F.max("ent_test").alias("ent_hi"),
    )
    return per_cust.agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.when(F.col("ent_hi") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("ent_test_orders"),
        F.sum("ent_hi").cast("long").alias("ent_test_customers"),
        F.sum("n_row_test").cast("long").alias("row_test_orders"),
        F.sum(
            F.when(
                (F.col("n_row_test") > 0) & (F.col("n_row_test") < F.col("n")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("row_straddle_customers"),
        F.sum(F.when(F.col("ent_lo") != F.col("ent_hi"), 1).otherwise(0))
        .cast("long")
        .alias("ent_straddle_customers"),
    )


# ---------------------------------------------------------------------------
# x200 — discrete-time hazard of repeat ordering (30-day buckets)
# ---------------------------------------------------------------------------

_HAZ_BUCKET_DAYS = 30
_HAZ_CAP = 12

_HAZ_ORACLE = f"""
WITH seq AS (
    SELECT o_custkey, o_orderdate, o_orderkey,
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
               AS prev_d
    FROM orders
),
gaps AS (
    SELECT LEAST(date_diff('day', CAST(prev_d AS DATE),
                           CAST(o_orderdate AS DATE))
                 // {_HAZ_BUCKET_DAYS}, {_HAZ_CAP}) AS bucket
    FROM seq WHERE prev_d IS NOT NULL
),
ev AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_events
    FROM gaps GROUP BY bucket
),
haz AS (
    SELECT bucket, n_events,
           SUM(n_events) OVER (ORDER BY bucket
                               ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS at_risk
    FROM ev
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       n_events,
       CAST(at_risk AS BIGINT) AS at_risk,
       CAST(n_events * 1000000 // at_risk AS BIGINT) AS hazard_ppm
FROM haz
ORDER BY bucket
"""


@_staged(
    "x200_discrete_hazard",
    "OP-W3/G5-ext",
    "Discrete-time hazard of repeat ordering: consecutive per-"
    "customer order gaps (lag over the (custkey; orderdate, orderkey) "
    f"window) bucket into {_HAZ_BUCKET_DAYS}-day intervals capped at "
    f"{_HAZ_CAP}, at-risk counts come from a suffix sum over the "
    "bucket table, and the hazard h(b) = events(b) / at_risk(b) is "
    "emitted in exact ppm — the survival-analysis primitive with no "
    "Kaplan-Meier float running product to drift across engines. "
    "Day gaps use the x135 date-cast idiom (certified under the "
    "non-UTC hostile gate). Scale shape: the lag window partitions "
    "on custkey (parallel across customers), the corpus-sized step "
    f"is one hash-agg onto <= {_HAZ_CAP + 1} buckets, and the "
    "suffix-sum window runs over that bounded frame (the x74/x77 "
    "aggregate-first idiom).",
    _HAZ_ORACLE,
)
def x200_discrete_hazard(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.lag("o_orderdate").over(w).alias("prev_d"),
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        F.least(
            F.floor(
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.col("prev_d").cast("date"),
                )
                / _HAZ_BUCKET_DAYS
            ),
            F.lit(_HAZ_CAP).cast("long"),
        ).alias("bucket")
    )
    ev = gaps.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_events")
    )
    wS = Window.orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return (
        ev.select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_events",
            F.sum("n_events").over(wS).cast("long").alias("at_risk"),
        )
        .select(
            "bucket",
            "n_events",
            "at_risk",
            F.expr("CAST(n_events * 1000000 DIV at_risk AS BIGINT)").alias(
                "hazard_ppm"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# x201 — curation decision cross-tab: length band x duplication band
# ---------------------------------------------------------------------------

_CUR_ORACLE = """
WITH n AS (
    SELECT doc_id, n_chars,
           md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
    FROM documents
),
cl AS (
    SELECT fp, count(*) AS sz FROM n GROUP BY fp
),
banded AS (
    SELECT LEAST(n.n_chars // 256, 7) AS len_band,
           CASE WHEN cl.sz = 1 THEN 1 WHEN cl.sz = 2 THEN 2 ELSE 3 END
               AS dup_band,
           n.n_chars
    FROM n JOIN cl ON n.fp = cl.fp
)
SELECT CAST(len_band AS BIGINT) AS len_band,
       CAST(dup_band AS BIGINT) AS dup_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM banded
GROUP BY len_band, dup_band
ORDER BY len_band, dup_band
"""


@_staged(
    "x201_curation_matrix",
    "OP-X1/G3-ext",
    "Curation decision cross-tab: every document lands in a "
    "(length band = n_chars DIV 256 capped at 7) x (duplication band "
    "= normalized-fingerprint cluster size 1 / 2 / 3+) cell with doc "
    "and char volumes — the policy table a curation run reads to "
    "decide what to drop first (big dup clusters of short docs cost "
    "quality; unique long docs are the keep set). Normalization is "
    "x1c's canonical form, fingerprint is its md5 — so the matrix is "
    "consistent with the dedup pass it fronts. Scale shape: cluster "
    "sizes are one hash-agg on the 32-char fingerprint (documents "
    "never shuffle; the fp join back is fingerprint + band only), "
    "final cross-tab is a hash-agg onto <= 8 x 3 cells.",
    _CUR_ORACLE,
)
def x201_curation_matrix(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), r"\s+", " "
        )
    )
    n = d.select("doc_id", "n_chars", F.md5(norm).alias("fp"))
    cl = n.groupBy("fp").agg(F.count("*").alias("sz"))
    banded = n.join(cl, "fp").select(
        F.least(
            F.floor(F.col("n_chars") / 256), F.lit(7).cast("long")
        ).alias("len_band"),
        F.when(F.col("sz") == 1, 1)
        .when(F.col("sz") == 2, 2)
        .otherwise(3)
        .alias("dup_band"),
        "n_chars",
    )
    return (
        banded.groupBy("len_band", "dup_band")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.col("len_band").cast("long").alias("len_band"),
            F.col("dup_band").cast("long").alias("dup_band"),
            "n_docs",
            "total_chars",
        )
        .orderBy("len_band", "dup_band")
    )
