"""Behavioral tests for round-13: PQ encode/search invariants and
recall, novelty bounds, prefix-cluster semantics.

(Cross-engine value parity for x60/x61 is covered by the oracle
catalog sweep; x62 is approximate by design — recall is the contract.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.operators import similarity as SIM
from ravelytics_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def _embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pq_encode_shape_and_code_range(spark):
    e = _embeddings(spark)
    books = SIM.pq_codebooks(e, "embedding", dim=64, n_sub=8, n_codes=16)
    assert books.count() == 8 * 16
    codes = SIM.pq_encode(e, books, "embedding", dim=64, n_sub=8)
    assert codes.count() == e.count()
    stats = codes.select(
        F.min(F.size("codes")).alias("lo"),
        F.max(F.size("codes")).alias("hi"),
        F.min(F.array_min("codes")).alias("cmin"),
        F.max(F.array_max("codes")).alias("cmax"),
    ).collect()[0]
    assert stats.lo == stats.hi == 8
    assert 0 <= stats.cmin and stats.cmax <= 15


def test_pq_recall_against_exact(spark):
    """Recall@10 (with 50-candidate re-rank) averaged over 5 probes
    must beat 0.5 — PQ with 16 codes/subspace on 64-dim clustered
    embeddings comfortably clears that; a broken ADC table or encode
    collapses it to ~0.1 (chance)."""
    e = _embeddings(spark)
    probes = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < 5).collect()
    }
    total, hit = 0, 0
    for qid, vec in probes.items():
        exact = {
            r.vec_id
            for r in SIM.cosine_topk(e, "embedding", vec, k=10).collect()
        }
        approx = {
            r.vec_id
            for r in SIM.pq_topk(e, "embedding", vec, dim=64, k=10, rerank=50).collect()
        }
        total += len(exact)
        hit += len(exact & approx)
        # the probe's own vector can never be missed: ADC distance 0
        assert qid in approx
    assert hit / total > 0.5, f"recall {hit}/{total}"


def test_novelty_bounds_and_duplicate_docs_score_zero(spark):
    rows = REGISTRY["x60_ngram_novelty"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_shingles



def test_novelty_planted_duplicates_score_zero(spark, tmp_path):
    """Run the same catalog entry against a planted warehouse: twins
    share every shingle (novelty 0), the unique doc shares none
    (novelty 1)."""
    twin = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one two three four five six seven"
    spark.createDataFrame(
        [(1, twin), (2, twin), (3, uniq)], ["doc_id", "text"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.novelty
        for r in REGISTRY["x60_ngram_novelty"].spark(spark, str(tmp_path)).collect()
    }
    assert got == {1: 0.0, 2: 0.0, 3: 1.0}


def test_prefix_clusters_members_share_prefix(spark):
    rows = REGISTRY["x61_prefix_clusters"].spark(spark, SF).collect()
    d = {r.doc_id: r.text for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    assert rows
    for r in rows[:20]:
        members = [int(x) for x in r.member_ids.split(",")]
        assert r.n_docs == len(members) >= 2
        for m in members:
            assert " ".join(d[m].split()[:8]) == r.prefix


def test_ivf_pq_recall_and_self_hit(spark):
    """IVF-PQ (residual-encoded, per-cell ADC) recall@10 over 5 probes
    must beat 0.4 with 4/16 cells probed — worse than flat PQ by the
    probe miss rate, far above chance; the probe's own vector is in a
    probed cell (its home cell ranks first) so it can never be missed."""
    e = _embeddings(spark)
    probes = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < 5).collect()
    }
    total, hit = 0, 0
    for qid, vec in probes.items():
        exact = {
            r.vec_id for r in SIM.cosine_topk(e, "embedding", vec, k=10).collect()
        }
        approx = {
            r.vec_id
            for r in SIM.ivf_pq_topk(
                e, "embedding", vec, dim=64, k=10, n_probe=4, rerank=50
            ).collect()
        }
        total += len(exact)
        hit += len(exact & approx)
        assert qid in approx
    assert hit / total > 0.4, f"recall {hit}/{total}"
