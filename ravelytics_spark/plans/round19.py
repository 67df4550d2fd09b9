"""Round-19 operators (registered in round 5).

The headline pair converts the LSH dedup family's *semantics* from
harness-only to driver-hash-certified: ``x91_minhash_portable`` and
``x92_simhash_portable`` re-express MinHash-LSH and SimHash with a
hash family both Spark and DuckDB can compute bit-identically (one
md5 per shingle/token + exact BIGINT affine mixing), so the full
pipeline — signatures → banded/blocked candidate generation → exact
verification — is DuckDB-hash-compared end to end, not just
rows-checked. The production generators (xxhash64-based, in
operators/dedup.py) remain the fast path; these entries certify the
ALGORITHM (same banding, same pigeonhole, same verify math) with a
portable hash family.

Also:

* ``x93_tfidf_cosine_pairs`` — sparse lexical cosine similarity join
  over an inverted token index (the classic all-pairs similarity
  shape: candidate pairs share >= 1 discriminative token, never the
  corpus cross product).
* ``x94_rollup_reaggregate`` — two-level pre-aggregation (daily
  partials re-aggregated to monthly) certified equal to direct
  aggregation over base rows: the continuous-aggregate / hypertable
  rollup contract, exact because partial sums stay DECIMAL between
  levels.
* ``x95_pareto_frontier`` — running-record skyline (strictly
  increasing cumulative max) per priority over daily pre-aggregates.
* ``x96_grid_ivf_topk`` — the IVF prune-then-exact ANN pattern with a
  DETERMINISTIC coarse quantizer (sign-bit grid cells), so candidate
  pruning + exact re-rank is oracle-certified (x3_ivf_topk's k-means
  cells are data-fitted and stay harness-checked).

Hash-parity conventions as plans/queries.py: one md5 per item then
exact integer math; decimal-exact sums; libm outputs (ln) rounded
per-term before aggregation; IEEE-only multiply/divide/sqrt
downstream; thresholds applied to bit-identical unrounded doubles;
total ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ravelytics_spark.functions import text as TX
from ravelytics_spark.functions.vectors import cosine
from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x91 — MinHash-LSH with a portable (cross-engine) hash family
# ---------------------------------------------------------------------------

# K = 12 minhashes in B = 6 bands x R = 2 rows: candidate probability
# 1-(1-J^2)^6 (~0.82 at J=0.5). Base hash: 29 bits of md5 (exact in
# both engines); per-function affine mix h_i = (A_i*h + B_i) mod P
# with P = 2^31-1 — A_i < 2^31 and h < 2^29 keep every product under
# 2^60, so BIGINT arithmetic never overflows in either engine.
_MH_K = 12
_MH_R = 2
_MH_P = 2147483647
_MH_A = [((2654435761 * (i + 1)) % 2147483648) | 1 for i in range(_MH_K)]
_MH_B = [(40503 * (i + 7)) % 2147483648 for i in range(_MH_K)]
_MH_JACCARD_MIN = 0.35

_MH_HASH_SQL = (
    "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) % 536870912"
)
# Shared by the DuckDB oracle (joined into the CTE) and the Spark side
# (each parsed with one F.expr): the SAME SQL text drives both engines,
# and parsing beats ~85 py4j Column round-trips of the equivalent chain.
_MH_MIN_EXPRS = [
    f"min(({_MH_A[i]} * h + {_MH_B[i]}) % {_MH_P}) AS m{i}"
    for i in range(_MH_K)
]
_MH_MINS_SQL = ",\n           ".join(_MH_MIN_EXPRS)
_MH_BAND_JOINS_SQL = "\n    UNION\n".join(
    "    SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b\n"
    "      ON a.doc_id < b.doc_id AND "
    + " AND ".join(
        f"a.m{b * _MH_R + r} = b.m{b * _MH_R + r}" for r in range(_MH_R)
    )
    for b in range(_MH_K // _MH_R)
)

def _minhash_pair_ctes(src: str) -> str:
    """The x91 pipeline (shingles → portable signatures → banded
    candidates → exact hash-set Jaccard) as a CTE fragment over an
    arbitrary (doc_id, text) relation ``src`` — reused by round20's
    composed pipelines (x100 curation, x101 clusters)."""
    return f"""d AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM {src}
),
shs AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1),
                                   i -> array_to_string(w[i:i+2], ' '))
               ELSE [array_to_string(w, ' ')] END) AS s
    FROM d
),
ex AS (
    SELECT doc_id, {_MH_HASH_SQL} AS h
    FROM (SELECT doc_id, unnest(s) AS sh FROM shs)
),
sig AS (
    SELECT doc_id, list(DISTINCT h) AS hset,
           {_MH_MINS_SQL}
    FROM ex GROUP BY doc_id
),
cand AS (
{_MH_BAND_JOINS_SQL}
),
jac AS (
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(sa.hset, sb.hset)) AS DOUBLE)
               / (len(sa.hset) + len(sb.hset)
                  - len(list_intersect(sa.hset, sb.hset))) AS j
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b
)"""


_MINHASH_ORACLE = f"""
WITH {_minhash_pair_ctes("documents")}
SELECT id_a, id_b, round(j, 6) AS jaccard
FROM jac WHERE j >= {_MH_JACCARD_MIN}
ORDER BY id_a, id_b
"""


_X91_DOC = (
    "MinHash-LSH near-dup pairs, ORACLE-CERTIFIED end to end: 3-gram "
    "shingles -> one md5 per shingle (29-bit base) -> 12 affine-mixed "
    "minhashes mod the Mersenne prime 2^31-1 (exact BIGINT math, "
    "products bounded under 2^60 so neither engine can overflow) -> "
    "6 bands x 2 rows banded equi-join for candidates -> exact "
    "Jaccard verify on candidates only, over the HASHED shingle sets "
    "(8-byte ints through every exchange, shingle strings built "
    "exactly once corpus-wide — the dedup.py hashed-shingles "
    "rationale; 29-bit hash-merge collisions perturb a pair's Jaccard "
    "at ~|set|^2/2^29 odds, identically in both engines). Identical "
    "hash family in DuckDB certifies signatures, banding AND "
    "verification by value hash — the rows-only gap of the xxhash64 "
    "production generator (x2_minhash_lsh) closed for the algorithm "
    "itself. Scale shape unchanged from dedup.py: one shuffle keyed "
    "on (band, key), candidates only through the verify, no "
    "all-pairs anywhere; ONE agg builds signature mins + verify sets."
)


def portable_minhash_pairs(spark, docs):
    """x91's verified near-dup pair generator over an arbitrary
    (doc_id, text) frame: portable signatures → banded candidates →
    exact hash-set Jaccard, threshold ``_MH_JACCARD_MIN``. Returns
    (id_a, id_b, jaccard) unordered; reused by round20's composed
    pipelines (x100 curation, x101 clusters)."""
    # repartition(N, doc_id) is the dedup.py shared-exchange idiom:
    # the per-doc signature agg requires a doc_id clustering anyway,
    # so this exchange REPLACES the agg's (shuffling compact raw docs
    # instead of the 50x-wider shingle rows) — and it breaks the
    # single-row-group local scan across all cores so the
    # shingle+md5+mix CPU runs parallel instead of on one task. The
    # EXPLICIT partition count matters: this stage is CPU-bound but
    # tiny in bytes, and AQE's size-based coalescing would fold an
    # unnumbered repartition back to one partition (measured: the
    # whole hash stage re-serialized). A user-specified count is
    # exempt from coalescing.
    n_par = spark.sparkContext.defaultParallelism
    d = docs.repartition(n_par, "doc_id")
    # Shingle STRINGS via posexplode + lead-window + concat_ws instead
    # of TX.shingles' transform/array_join/slice HOFs (r13): Spark runs
    # higher-order-function lambdas INTERPRETED, and the sf1 stage
    # trace showed this expansion at 97 CPU-seconds — the largest
    # single compute in the suite (the dedup.py _hashed_shingles
    # rationale, applied to the portable twin that must keep the
    # oracle's md5-of-string hash family). Same strings: trim+split
    # mirrors tokenize_ws on this corpus (no interior double spaces —
    # the _hashed_shingles precondition), rows with a full 3-gram keep
    # concat_ws(w,l1,l2), and the p==0 row is the whole-doc fallback
    # for shorter docs (concat_ws skips the null leads). The dropped
    # per-doc array_distinct is free: every consumer below dedups
    # (collect_set / list(DISTINCT) / min over a multiset == over the
    # set), certified by the unchanged DuckDB oracle. Interleaved A/B
    # and gate evidence in OPTIMIZATION_r13.md.
    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "__p", "__w"
        ),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("__p")
    l1 = F.lead("__w", 1).over(wdoc)
    l2 = F.lead("__w", 2).over(wdoc)
    sh_rows = words.select(
        "doc_id", "__p", F.col("__w"), l1.alias("__l1"), l2.alias("__l2")
    ).filter(F.col("__l2").isNotNull() | (F.col("__p") == 0))
    base = sh_rows.select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", "__w", "__l1", "__l2")), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % F.lit(536870912)
        ).alias("h"),
    )
    # ONE agg builds both the 12 signature mins AND the per-doc hash
    # set the verify uses — the shingle strings are built exactly once
    # corpus-wide, and everything downstream (bands, verify arrays)
    # carries 8-byte hashes, never shingle text (the hashed-shingles
    # rationale of operators/dedup.py). The verify's Jaccard is over
    # the 29-bit hash sets — identical in both engines; hash-merge
    # collisions perturb it at ~|set|^2/2^29 odds per pair.
    # The lineage cut makes the signature store a single shared
    # RDD: its three consumers (banding, both verify sides) prune
    # DIFFERENT columns (mins vs hset), so Catalyst pushes divergent
    # projections below any exchange and ReusedExchange dies — the
    # 10x scale sweep measured the shingle+md5 pipeline executing 3x
    # (29.7s) before the cut vs once after (the operators/dedup.py
    # minhash_dedup_pairs rationale, applied to the portable twin).
    # EAGER stands (r13): lazy measured ~5% faster on the dedup.py twin
    # but its consumer stages race the materialization inside one job —
    # the sf1 sweep logged ERROR-level "non-existent accumulator"
    # DAGScheduler traces (and duplicate partition compute); reverted
    # after measuring both.
    sig = (
        base.groupBy("doc_id")
        .agg(
            F.collect_set("h").alias("hset"),
            *[F.expr(e) for e in _MH_MIN_EXPRS],
        )
        .localCheckpoint(eager=True)
    )
    # band key = struct of the band's R minhashes; ONE equi-join on
    # (band, key) — the banded-bucket shuffle of dedup.py, not B
    # separate self-joins. One parsed expression, not B×R Column calls.
    band_array = ",".join(
        "named_struct("
        + ",".join(f"'k{r}', m{b * _MH_R + r}" for r in range(_MH_R))
        + ")"
        for b in range(_MH_K // _MH_R)
    )
    bands = sig.select(
        "doc_id",
        F.expr(f"posexplode(array({band_array}))").alias("band", "key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("hset").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("hset").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.size("sa") + F.size("sb") - inter).cast("double")
            ).alias("j"),
        )
    )
    return jac.filter(F.col("j") >= _MH_JACCARD_MIN).select(
        "id_a", "id_b", F.round("j", 6).alias("jaccard")
    )


@q("x91_minhash_portable", "OP-X2", _X91_DOC, _MINHASH_ORACLE)
def x91_minhash_portable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return portable_minhash_pairs(spark, docs).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# x92 — SimHash with a portable hash, Hamming<=3 pairs, oracle-certified
# ---------------------------------------------------------------------------

_SH_BITS = 32
_SH_BLOCKS = 4  # pigeonhole-complete for Hamming <= 3
_SH_MAXHAM = 3

_SH_SUMS_SQL = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN cnt ELSE -cnt END) AS s{j}"
    for j in range(_SH_BITS)
)
_SH_SIG_SQL = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {j})"
    for j in range(_SH_BITS)
)
_SH_BLOCK_JOINS_SQL = "\n    UNION\n".join(
    "    SELECT a.doc_id AS id_a, b.doc_id AS id_b,\n"
    "           a.sig AS siga, b.sig AS sigb FROM sig a JOIN sig b\n"
    f"      ON a.doc_id < b.doc_id AND (a.sig >> {8 * blk}) & 255"
    f" = (b.sig >> {8 * blk}) & 255"
    for blk in range(_SH_BLOCKS)
)

_SIMHASH_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ) WHERE w <> ''
),
tf AS (
    SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY doc_id, w
),
hashed AS (
    SELECT doc_id, cnt,
           CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
    FROM tf
),
sums AS (
    SELECT doc_id,
           {_SH_SUMS_SQL}
    FROM hashed GROUP BY doc_id
),
sig AS (
    SELECT doc_id, {_SH_SIG_SQL} AS sig FROM sums
),
cand AS (
{_SH_BLOCK_JOINS_SQL}
)
SELECT DISTINCT id_a, id_b,
       CAST(bit_count(xor(siga, sigb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(siga, sigb)) <= {_SH_MAXHAM}
ORDER BY id_a, id_b
"""


@q(
    "x92_simhash_portable",
    "OP-X2",
    "SimHash near-dup pairs, ORACLE-CERTIFIED end to end: token "
    "counts -> one md5 per distinct token (60-bit) -> 32-bit "
    "count-weighted sign signature -> 4x8-bit block pigeonhole join "
    "(complete for Hamming<=3) -> popcount(xor) verify. The same "
    "blocked candidate generation as operators/dedup.py's 64-bit "
    "xxhash64 form (x2_simhash, harness-checked), re-expressed with "
    "engine-portable integer math so the driver hash-compares the "
    "whole algorithm. One token-count shuffle + one block-keyed "
    "self-join shuffle; signatures are 8 bytes through the exchange.",
    _SIMHASH_ORACLE,
)
def x92_simhash_portable(spark, sf_dir):
    # Explicit-count doc_id repartition: same shared-exchange + AQE
    # rationale as x91 — the (doc_id, w) count and the 32-sum
    # signature agg are both satisfied by a doc_id clustering, so one
    # doc-sized exchange serves every downstream agg and parallelizes
    # tokenize+md5 (explicit N so AQE cannot re-serialize the
    # CPU-bound, byte-light hash stage).
    n_par = spark.sparkContext.defaultParallelism
    d = load_table(spark, sf_dir, "documents").repartition(n_par, "doc_id")
    tf = (
        d.select("doc_id", F.explode(TX.tokenize_ws("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    hashed = tf.select(
        "doc_id",
        "cnt",
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                    F.col("cnt"),
                ).otherwise(-F.col("cnt"))
            ).alias(f"s{j}")
            for j in range(_SH_BITS)
        ]
    )
    bit = lambda j: F.when(F.col(f"s{j}") > 0, F.lit(1).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    sig_col = None
    for j in range(_SH_BITS):
        term = F.shiftleft(bit(j), j)
        sig_col = term if sig_col is None else sig_col + term
    sig = sums.select("doc_id", sig_col.alias("sig"))
    blocks = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), 8 * blk).bitwiseAND(F.lit(255))
                    for blk in range(_SH_BLOCKS)
                ]
            )
        ).alias("blk", "key"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= _SH_MAXHAM)
        .distinct()
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# x93 — sparse TF-IDF cosine similarity join (inverted-index all-pairs)
# ---------------------------------------------------------------------------

_TFIDF_COS_MIN = 0.12

_TFIDF_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, string_split(text, ' ') AS ws
    FROM documents WHERE doc_id % 10 = 0
),
tok AS (
    SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(ws) >= 2
                   THEN list_transform(range(1, len(ws)),
                                       i -> array_to_string(ws[i:i+1], ' '))
                   ELSE [array_to_string(ws, ' ')] END) AS w
        FROM docs
    ) WHERE w <> ''
),
tf AS (
    SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY doc_id, w
),
n AS (SELECT count(*) AS n FROM docs),
df AS (
    SELECT w, count(*) AS df FROM tf GROUP BY w
),
wt AS (
    SELECT tf.doc_id, tf.w,
           tf.cnt * round(ln(CAST(n.n AS DOUBLE) / df.df), 9) AS wt
    FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
    WHERE 2 * df.df <= n.n
),
nrm AS (
    SELECT doc_id,
           sqrt(CAST(SUM(CAST(wt * wt AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
    FROM wt GROUP BY doc_id
),
dot AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(SUM(CAST(a.wt * b.wt AS DECIMAL(28,12))) AS DOUBLE) AS dot
    FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
cos AS (
    SELECT d.id_a, d.id_b, d.dot / (na.nrm * nb.nrm) AS c
    FROM dot d JOIN nrm na ON na.doc_id = d.id_a
               JOIN nrm nb ON nb.doc_id = d.id_b
)
SELECT id_a, id_b, round(c, 6) AS cos_sim
FROM cos WHERE c >= {_TFIDF_COS_MIN}
ORDER BY id_a, id_b
"""


@q(
    "x93_tfidf_cosine_pairs",
    "OP-X2/OP-X3-ext",
    "Sparse lexical similarity join: per-doc TF-IDF vectors, candidate "
    "pairs generated by the INVERTED TOKEN INDEX (pairs must share a "
    "discriminative token — the token-keyed equi-join IS the candidate "
    "generator; never a doc cross product), dot via decimal-exact "
    "per-token product sums, cosine thresholded on bit-identical "
    "doubles. Ubiquitous tokens (df > N/2) are dropped BEFORE the "
    "join — the classic posting-list cap that bounds the hottest "
    "token's join fan-out; at 100 TB the df cut is the skew lever "
    "(p99 posting list, not stop-word heuristics). ln() is rounded "
    "per term to 9 places — libm outputs are the one non-IEEE step, "
    "so they are pinned before any cross-engine arithmetic. Runs on "
    "a deterministic doc_id%10 subset (the pair STRUCTURE is what is "
    "certified; the full-corpus form is x91/x2's LSH, which prunes "
    "candidates instead of scoring all shared-token pairs).",
    _TFIDF_ORACLE,
)
def x93_tfidf_cosine_pairs(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        # explicit-count doc_id repartition: parallelizes the bigram
        # explode off the single-row-group scan (AQE-coalescing-proof,
        # see x91); the (doc_id, w) tf agg reuses the exchange
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    # terms are word BIGRAMS (not unigrams): the discriminative unit —
    # unigram df over a small shared vocabulary approaches N for every
    # word and the df cut would empty the index; bigram vocabulary is
    # |V|^2-ish and document-selective
    tf = (
        docs.select("doc_id", F.explode(TX.shingles("text", 2)).alias("w"))
        .filter(F.col("w") != "")  # empty-doc fallback gram, as the oracle
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    n = docs.agg(F.count("*").alias("n"))
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    wt = (
        tf.join(df, "w")
        .join(F.broadcast(n))
        .filter(2 * F.col("df") <= F.col("n"))
        .select(
            "doc_id",
            "w",
            (
                F.col("cnt")
                * F.round(F.log(F.col("n").cast("double") / F.col("df")), 9)
            ).alias("wt"),
        )
    )
    nrm = wt.groupBy("doc_id").agg(
        F.sqrt(
            F.sum((F.col("wt") * F.col("wt")).cast("decimal(28,12)")).cast(
                "double"
            )
        ).alias("nrm")
    )
    a, b = wt.alias("a"), wt.alias("b")
    dot = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.sum(
                (F.col("a.wt") * F.col("b.wt")).cast("decimal(28,12)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    cos = (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("c")
        )
    )
    return (
        cos.filter(F.col("c") >= _TFIDF_COS_MIN)
        .select("id_a", "id_b", F.round("c", 6).alias("cos_sim"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# x94 — two-level rollup re-aggregation (continuous-aggregate contract)
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
           o_orderpriority AS priority,
           SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS s,
           count(*) AS c
    FROM orders GROUP BY 1, 2
)
SELECT CAST(date_trunc('month', d) AS DATE) AS month, priority,
       CAST(SUM(s) AS DOUBLE) AS revenue,
       CAST(SUM(c) AS BIGINT) AS n_orders,
       round(CAST(SUM(s) AS DOUBLE) / SUM(c), 6) AS avg_price
FROM daily GROUP BY 1, 2 ORDER BY 1, 2
"""


@q(
    "x94_rollup_reaggregate",
    "OP-T/OP-G-ext",
    "Two-level pre-aggregation: daily (day, priority) partials "
    "re-aggregated to monthly — the continuous-aggregate / hypertable "
    "rollup contract, certified equal to direct aggregation because "
    "partial sums stay DECIMAL between levels (re-aggregating float "
    "partials would drift; decimal partial-sum compose is exact and "
    "order-free). The scale pattern 100 TB dashboards live on: the "
    "day-level agg collapses the fact table once; month/quarter/year "
    "views re-aggregate the tiny daily relation instead of rescanning "
    "facts. Both levels are map-side-combined group-bys; the second "
    "operates on ~days x priorities rows.",
    _ROLLUP_ORACLE,
)
def x94_rollup_reaggregate(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("s"),
        F.count("*").alias("c"),
    )
    return (
        daily.groupBy(
            F.date_trunc("month", "d").cast("date").alias("month"), "priority"
        )
        .agg(
            F.sum("s").cast("double").alias("revenue"),
            F.sum("c").cast("long").alias("n_orders"),
            F.round(
                F.sum("s").cast("double") / F.sum("c"), 6
            ).alias("avg_price"),
        )
        .orderBy("month", "priority")
    )


# ---------------------------------------------------------------------------
# x95 — running-record skyline (Pareto frontier over time)
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH daily AS (
    SELECT o_orderpriority AS priority,
           CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           max(o_totalprice) AS mx
    FROM orders GROUP BY 1, 2
),
r AS (
    SELECT priority, day, mx,
           max(mx) OVER (PARTITION BY priority ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev
    FROM daily
)
SELECT priority, day, mx AS record_price
FROM r WHERE prev IS NULL OR mx > prev
ORDER BY priority, day
"""


@q(
    "x95_pareto_frontier",
    "OP-W/OP-O-ext",
    "Running-record skyline: per priority, the days that set a new "
    "all-time price record — the 2-D Pareto frontier (no earlier day "
    "dominates with an equal-or-higher max). Dominance collapses to a "
    "strictly-increasing cumulative max, so the quadratic "
    "dominance-pair formulation becomes ONE window over DAILY "
    "pre-aggregates: the fact scan reduces to days x priorities rows "
    "before any window state, and the window partitions on priority "
    "(parallel across groups, never a global sort of facts). max() "
    "of doubles is exact — no float-accumulation hazard.",
    _PARETO_ORACLE,
)
def x95_pareto_frontier(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
    ).agg(F.max("o_totalprice").alias("mx"))
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        daily.withColumn("prev", F.max("mx").over(w))
        .filter(F.col("prev").isNull() | (F.col("mx") > F.col("prev")))
        .select("priority", "day", F.col("mx").alias("record_price"))
        .orderBy("priority", "day")
    )


# ---------------------------------------------------------------------------
# x96 — deterministic grid-IVF ANN (prune-then-exact, oracle-certified)
# ---------------------------------------------------------------------------

# Deterministic 64-dim query: values cycle {-1, -0.5, 0, 0.5, 1}.
_GRID_Q = [((d % 5) - 2) / 2.0 for d in range(64)]
_GRID_Q_SQL = "[" + ", ".join(str(x) for x in _GRID_Q) + "]"

# Coarse cell = 4 sign bits of dims 0..3 (16 cells). Probe the query's
# cell + its 4 Hamming-1 neighbors in sign space.
_GRID_CELL_Q = sum((1 << d) for d in range(4) if _GRID_Q[d] > 0)
_GRID_PROBE = sorted({_GRID_CELL_Q} | {_GRID_CELL_Q ^ (1 << d) for d in range(4)})
_GRID_PROBE_SQL = ", ".join(str(c) for c in _GRID_PROBE)

_GRID_ORACLE = f"""
WITH q AS (SELECT {_GRID_Q_SQL}::DOUBLE[] AS qv),
cells AS (
    SELECT vec_id, embedding,
           (CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN CAST(embedding[2] AS DOUBLE) > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN CAST(embedding[3] AS DOUBLE) > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN CAST(embedding[4] AS DOUBLE) > 0 THEN 8 ELSE 0 END)
           AS cell
    FROM embeddings
),
scored AS (
    SELECT vec_id,
        round(
            list_sum(list_transform(list_zip(embedding, (SELECT qv FROM q)),
                     p -> CAST(p[1] AS DOUBLE) * p[2]))
            / (sqrt(list_sum(list_transform(embedding,
                                            x -> CAST(x AS DOUBLE) * x)))
               * sqrt(list_sum((SELECT list_transform(qv, x -> x * x) FROM q)))),
        4) AS cos_sim
    FROM cells WHERE cell IN ({_GRID_PROBE_SQL})
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


@q(
    "x96_grid_ivf_topk",
    "OP-X3",
    "IVF prune-then-exact ANN with a DETERMINISTIC coarse quantizer: "
    "cell = 4 sign bits of dims 0-3 (16 cells), probe the query cell "
    "+ its 4 sign-flip neighbors (5/16 of the corpus), exact cosine "
    "re-rank on candidates only, top-10 with vec_id tie-break. "
    "Because the quantizer is closed-form (no fitted centroids), the "
    "whole prune->score->rank pipeline is DuckDB-hash-certified — "
    "the same two-stage shape as x3_ivf_topk (k-means cells, harness) "
    "and the similarity.py IVF serving path. The cell predicate is a "
    "map-side filter: at 100 TB with cell as a partition/cluster key "
    "it becomes partition PRUNING (only probed cells are read); "
    "scoring compiles to TakeOrderedAndProject (per-partition heaps, "
    "no global sort).",
    _GRID_ORACLE,
)
def x96_grid_ivf_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cell = None
    for d in range(4):
        term = F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << d)).otherwise(
            F.lit(0)
        )
        cell = term if cell is None else cell + term
    qv = F.array(*[F.lit(x) for x in _GRID_Q])
    return (
        e.withColumn("cell", cell)
        .filter(F.col("cell").isin(_GRID_PROBE))
        .select(
            "vec_id", F.round(cosine("embedding", qv), 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )
