"""Round-20 operators (round 5): the portable-hash program of
plans/round19.py extended to the remaining rows-only sketch family.

Reference parity: the reference warehouse exposes approximate
distinct counts (ClickHouse ``uniq``/``uniqHLL12`` family — see
SURVEY.md §2.10's sketch inventory) and sampling; the production
Spark forms (``x7_approx_distinct``, ``x63_hll_rollup``,
``x64_kmv_rollup``, ``x9_stratified_sample``) use engine-native
primitives (approx_count_distinct, xxhash64) whose exact outputs no
second engine can reproduce, so the driver records rows-only checks.
These entries re-express each ALGORITHM with a cross-engine hash
family (one md5 per item + exact BIGINT arithmetic), so signatures,
registers and estimates are DuckDB-hash-certified end to end:

* ``x97_kmv_portable`` — K-Minimum-Values distinct sketch (Bar-Yossef
  et al. 2002) per source + the sketch-union merge, certifying both
  the estimator and the mergeability contract of ``x64_kmv_rollup``.
* ``x98_hll_portable`` — HyperLogLog (Flajolet et al. 2007) with
  integer-exact registers: rho from the BINARY STRING length of the
  hash remainder (no log2), the indicator sum as scaled BIGINT
  2^(55-M) terms, alpha*m^2*2^55 as ONE Python-computed literal, and
  the linear-counting correction as a 63-entry literal lookup (the
  x90 Benford precedent: no transcendental runs in either engine).
  Registers roll up monthly → yearly by max-merge, certifying the
  mergeable-register contract of ``x63_hll_rollup``.
* ``x99_sample_portable`` — deterministic per-stratum hash sampling
  (the portable twin of ``x9_stratified_sample``): membership is a
  pure function of the row key, so the SAMPLE ITSELF is
  hash-certified, reproducible across engines, layouts and runs —
  the property df.sample's partition-seeded RNG cannot give.

Hash-parity conventions as plans/queries.py: one md5 per item then
exact integer math; estimator divisions as ONE IEEE divide of two
deterministic operands + round; total ORDER BY.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x97 — K-Minimum-Values distinct sketch, portable hash family
# ---------------------------------------------------------------------------

# 48-bit hash (12 hex chars of md5): h < 2^48 and (K-1)*2^48 both sit
# inside double's 53-bit mantissa EXACTLY (63*2^48 has 6 significant
# bits), so the estimator (K-1)*2^48 / h_K is ONE IEEE division of two
# exactly-represented operands — bit-identical across engines.
_KMV_K = 64
_KMV_SCALE_NUM = float((_KMV_K - 1) * (1 << 48))  # 63 * 2^48, exact

_KMV_ORACLE = f"""
WITH tok AS (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents
),
t2 AS (SELECT source, w FROM tok WHERE w <> ''),
dh AS (
    SELECT DISTINCT source,
           CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) AS h
    FROM t2
),
rk AS (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM dh
),
keep AS (SELECT source, h FROM rk WHERE rn <= {_KMV_K}),
per AS (
    SELECT source, count(*) AS n_small, max(h) AS hk
    FROM keep GROUP BY source
),
exact AS (
    SELECT source, count(*) AS exact_distinct FROM dh GROUP BY source
),
mk AS (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM keep)
),
mper AS (
    SELECT count(*) AS n_small, max(h) AS hk FROM mk WHERE rn <= {_KMV_K}
),
mexact AS (SELECT count(DISTINCT h) AS exact_distinct FROM dh),
unioned AS (
    SELECT p.source,
           CASE WHEN p.n_small < {_KMV_K} THEN CAST(p.n_small AS DOUBLE)
                ELSE round({_KMV_SCALE_NUM!r} / p.hk, 6) END AS est_distinct,
           e.exact_distinct
    FROM per p JOIN exact e USING (source)
    UNION ALL
    SELECT '(all)',
           CASE WHEN m.n_small < {_KMV_K} THEN CAST(m.n_small AS DOUBLE)
                ELSE round({_KMV_SCALE_NUM!r} / m.hk, 6) END,
           x.exact_distinct
    FROM mper m CROSS JOIN mexact x
)
SELECT source, est_distinct, CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM unioned ORDER BY source
"""


@q(
    "x97_kmv_portable",
    "OP-G5/X8-ext",
    "K-Minimum-Values distinct-count sketch with a portable hash "
    "family — the oracle-certified twin of x64_kmv_rollup/"
    "x7_approx_distinct (whose xxhash64/HLL++ internals no second "
    "engine reproduces). Per source: the K=64 smallest distinct "
    "48-bit md5 hashes of the vocabulary; estimate (K-1)*2^48/h_K is "
    "ONE IEEE division of two exactly-double-representable operands. "
    "The '(all)' row is the SKETCH-UNION merge — the K smallest of "
    "the union of per-source K-min sets, never a re-scan — "
    "certifying the mergeability contract that makes KMV roll up "
    "(per-shard sketches at 100 TB combine in O(K) driver state). "
    "Per-source state is K values (bounded agg), the vocab agg is "
    "map-side combined, and the merge input is sketch-sized "
    "(sources x K rows).",
    _KMV_ORACLE,
)
def x97_kmv_portable(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    dh = (
        toks.select(
            "source",
            F.conv(F.substring(F.md5("w"), 1, 12), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .groupBy("source", "h")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    rn = F.row_number().over(Window.partitionBy("source").orderBy("h"))
    keep = dh.select("source", "h", rn.alias("rn")).filter(
        F.col("rn") <= _KMV_K
    )
    est = F.when(
        F.col("n_small") < _KMV_K, F.col("n_small").cast("double")
    ).otherwise(F.round(F.lit(_KMV_SCALE_NUM) / F.col("hk"), 6))
    per = (
        keep.groupBy("source")
        .agg(F.count("*").alias("n_small"), F.max("h").alias("hk"))
        .select("source", est.alias("est_distinct"))
    )
    exact = dh.groupBy("source").agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    rows = per.join(exact, "source")
    # sketch-union merge: sources x K rows -> distinct h -> K smallest.
    # The single-partition window is SKETCH-sized by construction.
    merged_rn = F.row_number().over(Window.orderBy("h"))
    mk = (
        keep.select("h")
        .distinct()
        .select("h", merged_rn.alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
    )
    mper = mk.agg(F.count("*").alias("n_small"), F.max("h").alias("hk"))
    mexact = dh.select("h").distinct().agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    mrow = mper.crossJoin(mexact).select(
        F.lit("(all)").alias("source"),
        est.alias("est_distinct"),
        "exact_distinct",
    )
    return rows.unionByName(mrow).orderBy("source")


# ---------------------------------------------------------------------------
# x98 — HyperLogLog with integer-exact registers, portable hash family
# ---------------------------------------------------------------------------

_HLL_M = 64  # 2^6 registers
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# alpha * m^2 * 2^55: ONE Python-computed double literal injected into
# both engines, so the estimate is literal / S — a single IEEE divide.
_HLL_C = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 55)
_HLL_EMPTY_TERM = 1 << 55  # empty register: 2^-0 scaled by 2^55
# Linear-counting correction m*ln(m/V) for V = 1..63 as literals (the
# x90 precedent: no transcendental evaluates in either engine).
_HLL_LINEAR = [
    round(_HLL_M * math.log(_HLL_M / v), 4) for v in range(1, _HLL_M)
]
_HLL_LINEAR_SQL = ", ".join(repr(x) for x in _HLL_LINEAR)

_HLL_ORACLE = f"""
WITH h AS (
    SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS o_year,
           CAST(strftime(o_orderdate, '%m') AS BIGINT) AS o_month,
           CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                AS BIGINT) AS hv,
           o_custkey
    FROM orders
),
r AS (
    SELECT o_year, o_month, hv % {_HLL_M} AS bucket,
           CASE WHEN hv // {_HLL_M} = 0 THEN 55
                ELSE 55 - length(bin(hv // {_HLL_M})) END AS rho,
           o_custkey
    FROM h
),
regs_m AS (
    SELECT o_year, o_month, bucket, max(rho) AS m
    FROM r GROUP BY o_year, o_month, bucket
),
regs_y AS (
    SELECT o_year, bucket, max(m) AS m FROM regs_m GROUP BY o_year, bucket
),
s AS (
    SELECT o_year,
           sum(1::BIGINT << (55 - m)) AS s_present,
           count(*) AS nb
    FROM regs_y GROUP BY o_year
),
est AS (
    SELECT o_year,
           {_HLL_M} - nb AS v,
           {_HLL_C!r} / (s_present + ({_HLL_M} - nb) * {_HLL_EMPTY_TERM})
               AS e_raw
    FROM s
),
exact AS (
    SELECT o_year, count(DISTINCT o_custkey) AS exact_custkeys
    FROM r GROUP BY o_year
)
SELECT e.o_year,
       CASE WHEN e.v > 0 AND e.e_raw <= {2.5 * _HLL_M!r}
            THEN ([{_HLL_LINEAR_SQL}])[CAST(e.v AS INT)]
            ELSE round(e.e_raw, 4) END AS est_hll,
       CAST(x.exact_custkeys AS BIGINT) AS exact_custkeys
FROM est e JOIN exact x USING (o_year)
ORDER BY o_year
"""


@q(
    "x98_hll_portable",
    "OP-G5-ext",
    "HyperLogLog distinct-count with integer-exact registers and a "
    "portable hash family — the oracle-certified twin of "
    "x63_hll_rollup (Spark's HLL++ sketch bytes are engine-private). "
    "rho comes from the BINARY-STRING length of the 54-bit hash "
    "remainder (pure string op, no log2); the indicator sum is "
    "scaled-BIGINT 2^(55-M) terms plus 2^55 per empty register "
    "(commutative integer addition — partitioning-independent); the "
    "estimate is ONE Python-literal constant / S IEEE division; the "
    "linear-counting small-range branch reads a 63-entry literal "
    "table so no transcendental evaluates in either engine. Registers "
    "aggregate monthly first, then max-merge to yearly — certifying "
    "the mergeable-register rollup contract (per-shard registers at "
    "100 TB combine by elementwise max with m=64 longs of state per "
    "group). Exact per-year distincts ride alongside for the error "
    "story.",
    _HLL_ORACLE,
)
def x98_hll_portable(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    hv = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = o.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        hv.alias("hv"),
        "o_custkey",
    )
    rest = F.expr(f"hv div {_HLL_M}")
    r = base.select(
        "o_year",
        "o_month",
        F.pmod("hv", F.lit(_HLL_M)).alias("bucket"),
        F.when(rest == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin(rest)))
        .alias("rho"),
        "o_custkey",
    )
    regs_m = r.groupBy("o_year", "o_month", "bucket").agg(
        F.max("rho").alias("m")
    )
    regs_y = regs_m.groupBy("o_year", "bucket").agg(F.max("m").alias("m"))
    s = regs_y.groupBy("o_year").agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m AS INT))")
        ).alias("s_present"),
        F.count("*").alias("nb"),
    )
    v = F.lit(_HLL_M) - F.col("nb")
    e_raw = F.lit(_HLL_C) / (
        F.col("s_present") + v * F.lit(_HLL_EMPTY_TERM)
    )
    linear = F.element_at(
        F.array(*[F.lit(x) for x in _HLL_LINEAR]), v.cast("int")
    )
    est = s.select(
        "o_year",
        F.when((v > 0) & (e_raw <= F.lit(2.5 * _HLL_M)), linear)
        .otherwise(F.round(e_raw, 4))
        .alias("est_hll"),
    )
    exact = r.groupBy("o_year").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_custkeys")
    )
    return est.join(exact, "o_year").orderBy("o_year")


# ---------------------------------------------------------------------------
# x99 — deterministic per-stratum hash sampling, portable hash family
# ---------------------------------------------------------------------------

_SAMPLE_RATES = {"en": 500, "de": 250, "fr": 250, "es": 250}  # per mille
_SAMPLE_RATES_SQL = " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in _SAMPLE_RATES.items()
)

_SAMPLE_ORACLE = f"""
WITH b AS (
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                AS BIGINT) % 1000 AS bucket,
           CASE lang {_SAMPLE_RATES_SQL} ELSE 0 END AS rate
    FROM documents
)
SELECT doc_id, lang FROM b WHERE bucket < rate ORDER BY doc_id
"""


@q(
    "x99_sample_portable",
    "OP-X-ext",
    "Deterministic per-stratum hash sampling — the oracle-certified "
    "twin of x9_stratified_sample (whose xxhash64 bucket no second "
    "engine computes). Membership = md5(key) mod 1000 < per-stratum "
    "rate: a pure function of the row key, so the SAMPLE ITSELF is "
    "hash-certified and reproducible across engines, partitionings "
    "and reruns — the property df.sample's partition-seeded RNG "
    "cannot give, and the one that makes a 100 TB sampled corpus "
    "re-derivable (membership re-checks from the key alone, append "
    "jobs keep prior members). Map-only: filter at the scan, no "
    "shuffle, no state.",
    _SAMPLE_ORACLE,
)
def x99_sample_portable(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
        ).cast("long"),
        F.lit(1000),
    )
    rate = None
    for lang, r in _SAMPLE_RATES.items():
        cond = F.col("lang") == lang
        rate = (
            F.when(cond, F.lit(r))
            if rate is None
            else rate.when(cond, F.lit(r))
        )
    rate = rate.otherwise(F.lit(0))
    return (
        d.filter(bucket < rate).select("doc_id", "lang").orderBy("doc_id")
    )
