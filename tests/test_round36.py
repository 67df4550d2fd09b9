"""Oracle-comparison + semantic tests for the round-36 portable twins:
the x192 compression-quality metric with an engine-portable codec
proxy, and the x3_near_pairs pipeline certified end-to-end over a
deterministic planted corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
NAMES = ["x361_lz78_quality_portable", "x362_planted_near_pairs"]

TWINS = {
    "x361_lz78_quality_portable": "x192_compression_quality",
    "x362_planted_near_pairs": "x3_near_pairs",
}


@pytest.mark.parametrize("name", NAMES)
@pytest.mark.parametrize("sf_dir", SFS)
def test_round36_matches_oracle(spark, name, sf_dir):
    entry = REGISTRY[name]
    assert entry.oracle is not None
    con = duckdb_connection(sf_dir)
    problems = compare(
        entry.spark(spark, sf_dir),
        con,
        entry.oracle,
        name,
        strict_row_order=True,
    )
    assert not problems, problems


def test_every_twin_points_at_a_live_harness_entry():
    for twin, harness in TWINS.items():
        assert REGISTRY[twin].oracle is not None, twin
        assert REGISTRY[harness].oracle is None, harness


# ---------------------------------------------------------------------------
# x361 — novelty metric semantics
# ---------------------------------------------------------------------------


def test_lz78_quality_ratios_sane_and_template_floor_bites(spark):
    """ratio_ppm is a true ratio (0 < r <= 1e6), per-source counts sum
    to the corpus, and the 50% template floor fires on SOME but not
    all documents at sf0.01 (18 measured at authoring; assert the
    discriminative property, not the number)."""
    sf = SFS[1]
    rows = REGISTRY["x361_lz78_quality_portable"].spark(spark, sf).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    n_template = sum(r.n_template for r in rows)
    for r in rows:
        assert 0 < r.ratio_ppm <= 1_000_000
        assert 0 <= r.n_template <= r.n_docs
        assert r.novel4 <= r.shingles
    assert 0 < n_template < total_docs


def test_lz78_repetitive_doc_scores_lower_than_novel_doc(spark):
    """The signal discriminates: a looped string scores far lower
    novelty than random-ish text of the same length (the property the
    zlib form x192 buys; the proxy must preserve it)."""
    looped = "spam " * 40
    novel = " ".join(f"w{i}x{i * 7 % 13}" for i in range(40))
    df = spark.createDataFrame(
        [("a", looped), ("b", novel)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.dct / r.t
        for r in df.select(
            "doc_id",
            (F.length("text") - 3).alias("t"),
            F.expr(
                "size(array_distinct(transform("
                "sequence(1, length(text) - 3), i -> substring(text, i, 4)"
                ")))"
            ).alias("dct"),
        ).collect()
    }
    assert got["a"] < 0.2 < 0.5 < got["b"]


# ---------------------------------------------------------------------------
# x362 — pipeline semantics vs independent ground truth
# ---------------------------------------------------------------------------


def _true_planted_corpus_pairs(sf_dir):
    """Independent Python reconstruction (no Spark, no DuckDB): the
    full set of cos>=0.9 pairs over the planted corpus under the exact
    integer algebra. Small: (n + n/10)^2 at 550 rows."""
    import pyarrow.parquet as pq
    from decimal import Decimal, ROUND_HALF_UP

    from ravelytics_spark.plans.round36 import (
        _NP_EVERY,
        _NP_JITTER,
        _NP_OFFSET,
    )
    from ravelytics_spark.plans.round20 import _KNUTH

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vecs = {}
    widths = [len(v) for v in tbl["embedding"] if v is not None]
    d = max(widths) if widths else 0
    for vid, emb in zip(tbl["vec_id"], tbl["embedding"]):
        if emb is None or len(emb) != d:
            continue
        f3 = [
            int(
                Decimal(repr(float(x))).quantize(
                    Decimal("0.001"), rounding=ROUND_HALF_UP
                )
                * 1000
            )
            for x in emb
        ]
        vecs[int(vid)] = f3
        if vid % _NP_EVERY == 0:
            vecs[int(vid) + _NP_OFFSET] = [
                x + (i * _KNUTH + int(vid)) % _NP_JITTER - 10
                for i, x in enumerate(f3)
            ]
    ids = sorted(vecs)
    n2 = {v: sum(x * x for x in vecs[v]) for v in ids}
    out = set()
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            if dot > 0 and 100 * dot * dot >= 81 * n2[a] * n2[b]:
                out.add((a, b))
    return out


def test_planted_pairs_precision_exact_and_recall_bounded(spark):
    """Every emitted pair is a TRUE cos>=0.9 pair of the planted
    corpus (the exact verify means SRP bucketing can only lose pairs,
    never invent them — precision 1.0 by construction, checked against
    an independent Python reconstruction), and 8-bit bucketing keeps
    recall >= 0.6 on the shipped corpus."""
    sf = SFS[1]
    got = {
        (r.id_a, r.id_b)
        for r in REGISTRY["x362_planted_near_pairs"].spark(spark, sf).collect()
    }
    truth = _true_planted_corpus_pairs(sf)
    assert got, "pipeline found no pairs at all"
    assert got <= truth, f"false positives: {sorted(got - truth)[:5]}"
    assert len(got) / len(truth) >= 0.6, (len(got), len(truth))


def test_planted_pairs_are_planted_and_typed(spark):
    """On a corpus with zero organic near pairs, every emitted pair is
    a planted (original, copy) pair and flagged as such."""
    sf = SFS[1]
    rows = REGISTRY["x362_planted_near_pairs"].spark(spark, sf).collect()
    from ravelytics_spark.plans.round36 import _NP_EVERY, _NP_OFFSET

    for r in rows:
        assert r.planted == 1
        assert r.id_b - r.id_a == _NP_OFFSET
        assert r.id_a % _NP_EVERY == 0
        assert r.dot > 0
