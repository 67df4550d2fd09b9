"""Fuzzy string joins at scale: edit-distance-≤1 matching WITHOUT the
N² cross join, via deletion neighborhoods (the FastSS family of
algorithms; Bocek et al., "Fast Similarity Search in Large
Dictionaries", 2007 — public literature).

Capability context: the reference normalizes free-text fields (artist
names, genres) before grouping (spotify_artist_genres_to_kafka.py:100-
108); near-identical strings that survive normalization (typos, OCR
noise, mojibake variants) are exactly what an LLM-data curation pass
needs to reconcile — fuzzy key joins are the standard tool.

Why deletion neighborhoods: lev(a, b) ≤ 1 ⟺ the deletion
neighborhoods D(a) = {a} ∪ {a minus one char} and D(b) intersect —
  * a == b        → a ∈ both;
  * substitution  → deleting the substituted position from each yields
                    the same string;
  * insert/delete → the longer string minus the extra char equals the
                    shorter string itself.
Sharing a variant does NOT imply distance ≤ 1 (deleting different
positions can collide), so candidates are verified with an exact
``levenshtein`` — the same candidates→verify shape as MinHash-LSH.

Scale shape (100 TB): each string of length L emits L+1 variants — a
map-only expansion keyed on ``xxhash64`` of the variant (8-byte
shuffle keys, not strings; hash collisions only add candidates, which
verification rejects). Candidates come from ONE groupBy shuffle of the
Σ(L+1) variant rows into per-bucket id arrays (a spillable hash
aggregate — not a variant self-join, which would shuffle and sort the
rows twice; that form needed 64g of heap at 15M names, this one clears
the same sweep at the default heap), with pairs expanded lazily inside
each bucket. Cost is Σ(L+1) rows through one shuffle vs N²/2
comparisons — for a 1e9-key dictionary of 20-char strings that is
2·10¹⁰ cheap rows instead of 5·10¹⁷ levenshteins. Hot variants (a
shared stem) are bounded by the dictionary's true near-dup cluster
sizes; clusters above ``max_bucket_size`` can be skipped like LSH
mega-buckets when the caller wants pair mining rather than exhaustive
joins — with the bucket form the cap is a free ``size()`` filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: str) -> F.Column:
    """Array of the string plus every single-character deletion.

    Pure codegen: ``transform`` over ``sequence(1, length)`` with
    substring concatenation — no UDF. Empty strings get just
    themselves (``sequence(1, 0)`` would count DOWN in Spark, so the
    deletion list is guarded to non-empty inputs).
    """
    dels = F.expr(
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), substring({col}, i + 1)))"
    )
    return F.concat(
        F.array(F.col(col)),
        F.when(F.length(col) > 0, dels).otherwise(F.array().cast("array<string>")),
    )


def _variant_rows(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    from ravelytics_spark.operators.skew import fan_out_scan

    # (id, variant-hash) ONLY — the strings do not ride through the
    # candidate shuffle; they re-join after pair dedup (measured ~40%
    # of the operator's wall-clock at sf0.1 when carried through).
    # fan_out_scan: the L+1 deletion expansion is CPU-dense; an
    # under-parallel dictionary scan (one small file) serializes it on
    # one core (r12 stage trace: 1 task, 0.6 s) — no-op on any
    # well-partitioned input. Project to the two surviving columns and
    # drop null strings FIRST so the round-robin exchange shuffles
    # 2-column rows, not full dictionary rows (r12 ADVICE).
    df = fan_out_scan(
        df.filter(F.col(str_col).isNotNull()).select(id_col, str_col)
    )
    return df.select(
        F.col(id_col).alias("__fid"),
        F.explode(F.array_distinct(deletion_variants(str_col))).alias("__v"),
    ).select("__fid", F.xxhash64("__v").alias("__vh"))


def _bucket_ids(v: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """One row per variant bucket with its sorted member-id array.

    This is the heap-cliff fix (SCALING.md r3: the 15M-name sweep
    GC-thrashed at the default 8g heap, needing 64g): the previous form
    SELF-JOINED the variant rows, so the ~450M (id, hash) rows at 15M
    names were computed and shuffled TWICE and sort-merge-sorted on
    both sides, with pair dedup as a third full shuffle of the join
    output. A groupBy + collect_set shuffles the variant rows ONCE into
    a spillable hash aggregate whose per-group state is the true
    near-dup cluster size (bounded by ``max_bucket_size`` when set —
    now a free ``size()`` filter instead of an extra counting pass),
    and in-bucket pair expansion happens lazily inside the explode.
    """
    if max_bucket_size is not None:
        # Cap BEFORE the collect: filtering on size(__ids) after the agg
        # bounds the output but not the aggregation itself — a 50M-member
        # hot bucket would still be accumulated into one ObjectHashAgg
        # buffer (per-GROUP state cannot spill) before being dropped.
        # The count pre-pass keys on the SAME __vh the collect groups
        # on, so its exchange is reused, and (id, hash) rows are unique
        # per id (array_distinct upstream) — count(*) == size of the
        # eventual id set, making pre- and post-filter equivalent.
        small = (
            v.groupBy("__vh")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("__vh")
        )
        v = v.join(small, "__vh")
    return v.groupBy("__vh").agg(
        F.array_sort(F.collect_set("__fid")).alias("__ids")
    )


# Buckets up to this size expand through a single in-row pair array
# (C(1024, 2) structs ~ 8 MB); above it, pairs stream row-by-row.
_PAIR_STREAM_THRESHOLD = 1024


def _attachable_by_broadcast(names: DataFrame) -> bool:
    """Whether the (id, string) dictionary side is provably small enough
    to broadcast for the verification joins.

    The candidate side's size estimate is garbage (agg → in-bucket
    explode → distinct wildly undershoots), so the planner can't be
    trusted to pick a strategy on its own — but the DICTIONARY side is a
    pruned scan of the input whose optimizer estimate is reliable.
    Broadcasting it turns both verification joins map-side (the
    candidate stream is never shuffled or sorted; r12 measured
    x47 3.55 s -> 2.95 s), while a large dictionary (100 TB corpus:
    tens of GB of keys) falls back to the pinned spillable sort-merge.
    The bar is the session's own autoBroadcastJoinThreshold so
    deployment tuning is respected; <= 0 (auto-broadcast disabled)
    forces the sort-merge path."""
    threshold_str = names.sparkSession.conf.get(
        "spark.sql.autoBroadcastJoinThreshold", "10485760"
    )
    try:
        threshold = int(threshold_str)
    except ValueError:  # e.g. '10MB' form
        units = {"k": 1024, "m": 1024**2, "g": 1024**3}
        s = threshold_str.strip().lower().rstrip("b")
        threshold = (
            int(float(s[:-1]) * units[s[-1]]) if s[-1] in units else int(s)
        )
    if threshold <= 0:
        return False
    size = names._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return size <= threshold


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within edit distance 1.

    Returns (id_a, id_b, dist). Physical shape: ONE shuffle of the
    (id, hash) variant rows into per-bucket sorted id arrays; candidate
    pairs are generated by an in-bucket combination explode (id_a <
    id_b falls out of the array sort) and deduplicated while still
    id-only (a pair can share several variants); the strings join back
    just for the exact ``levenshtein`` verification — one comparison
    per unique candidate pair, with Catalyst/AQE free to broadcast the
    (id, string) side when the dictionary is small.
    """
    v = _variant_rows(df, id_col, str_col)
    buckets = _bucket_ids(v, max_bucket_size).filter(F.size("__ids") >= 2)
    # pairs (ids[i], ids[j]) for i < j — SIZE-SPLIT. Small buckets (the
    # overwhelming majority) build one modest in-row pair array: this
    # form is sweep-proven at 15M names / 450M variant rows on the
    # default heap, while routing EVERY bucket through the chained
    # posexplode+slice streaming form was measured to OOM that same
    # sweep (each first-explode output row duplicates the whole __ids
    # array and each slice() reallocates — ~2-3x the allocation rate
    # on the hot path). Giant buckets take the streaming form anyway:
    # one flatten(transform(...)) array of C(n, 2) structs hits the
    # 2^31 element limit near n=65k and executor memory well before —
    # there, O(n) per-row state beats O(n^2) in one row.
    small = buckets.filter(F.size("__ids") <= _PAIR_STREAM_THRESHOLD)
    combos = F.flatten(
        F.transform(
            "__ids",
            lambda x, i: F.transform(
                F.slice("__ids", i + F.lit(2), F.size("__ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    small_pairs = small.select(F.explode(combos).alias("__p")).select(
        "__p.id_a", "__p.id_b"
    )
    large_pairs = (
        buckets.filter(F.size("__ids") > _PAIR_STREAM_THRESHOLD)
        .select("__ids", F.posexplode("__ids").alias("__i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice("__ids", F.col("__i") + F.lit(2), F.size("__ids"))
            ).alias("id_b"),
        )
    )
    cand = small_pairs.unionByName(large_pairs).distinct()
    names = df.select(F.col(id_col).alias("__nid"), F.col(str_col).alias("__ns"))
    # Join strategy is chosen HERE, deliberately: Catalyst's static size
    # estimate of the candidate side (agg → in-bucket explode →
    # distinct) wildly undershoots its true pair volume, so left alone
    # the planner tried to BROADCAST tens of millions of pairs (driver
    # OOM at the 1.5M-name sweep). A provably-small dictionary side is
    # broadcast instead (both verification joins go map-side — the
    # candidate stream is never shuffled); otherwise pin the spillable
    # sort-merge join on both — AQE skew splitting still applies.
    if _attachable_by_broadcast(names):
        names = F.broadcast(names)
        with_a = cand.join(names, cand.id_a == names.__nid).select(
            "id_a", "id_b", F.col("__ns").alias("s_a")
        )
    else:
        cand = cand.hint("merge")
        with_a = (
            cand.join(names, cand.id_a == names.__nid)
            .select("id_a", "id_b", F.col("__ns").alias("s_a"))
            .hint("merge")  # hints are consumed per join: re-pin for the second
        )
    return (
        with_a.join(names, F.col("id_b") == names.__nid)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("s_a", F.col("__ns")).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
) -> DataFrame:
    """Two-sided edit-distance-≤1 join: (left_id, right_id, dist) for
    every cross pair within distance 1 — same single-shuffle bucket
    shape as ``fuzzy_self_pairs``: the two variant streams union with a
    side tag, one groupBy collects each bucket's left and right id sets
    (collect_set drops the other side's nulls), and the left×right
    cross happens inside the bucket row."""
    lv = _variant_rows(left, left_id, left_str)
    rv = _variant_rows(right, right_id, right_str)
    tagged = lv.select(
        "__vh",
        F.col("__fid").alias("__lid"),
        F.lit(None).cast(rv.schema["__fid"].dataType).alias("__rid"),
    ).unionByName(
        rv.select(
            "__vh",
            F.lit(None).cast(lv.schema["__fid"].dataType).alias("__lid"),
            F.col("__fid").alias("__rid"),
        )
    )
    buckets = tagged.groupBy("__vh").agg(
        F.collect_set("__lid").alias("__ls"),
        F.collect_set("__rid").alias("__rs"),
    )
    cand = (
        buckets.filter((F.size("__ls") > 0) & (F.size("__rs") > 0))
        .select(F.explode("__ls").alias("left_id"), "__rs")
        .select("left_id", F.explode("__rs").alias("right_id"))
        .distinct()
    )
    # same static-stats hazard as fuzzy_self_pairs: never broadcast the
    # unbounded candidate side — broadcast a provably-small dictionary
    # side, else pin spillable sort-merge joins.
    ln = left.select(F.col(left_id).alias("__lid"), F.col(left_str).alias("__ls"))
    rn = right.select(F.col(right_id).alias("__rid"), F.col(right_str).alias("__rs"))
    if _attachable_by_broadcast(ln) and _attachable_by_broadcast(rn):
        ln, rn = F.broadcast(ln), F.broadcast(rn)
        return (
            cand.join(ln, cand.left_id == ln.__lid)
            .join(rn, cand.right_id == rn.__rid)
            .select(
                "left_id",
                "right_id",
                F.levenshtein("__ls", "__rs").cast("long").alias("dist"),
            )
            .filter(F.col("dist") <= 1)
        )
    cand = cand.hint("merge")
    return (
        cand.join(ln, cand.left_id == ln.__lid)
        .hint("merge")
        .join(rn, cand.right_id == rn.__rid)
        .select(
            "left_id",
            "right_id",
            F.levenshtein("__ls", "__rs").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )
