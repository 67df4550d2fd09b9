"""Connected components: chains merge transitively; singletons and
separate clusters stay apart; cluster dedup keeps exactly one per
component."""

from __future__ import annotations

from ravelytics_spark.operators.clusters import connected_components, dedup_by_clusters


def test_chain_merges_into_one_component(spark):
    # chain 1-2, 2-3, 3-4 + island 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # path of 12 nodes — needs several propagation rounds
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)], ["id_a", "id_b"])
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 13


def test_dedup_by_clusters_keeps_min_per_component(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)], ["doc_id", "text"])
    # components {0,1,2} and {4,5}; 3 untouched
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"])
    kept = sorted(r.doc_id for r in dedup_by_clusters(docs, pairs, "doc_id").collect())
    assert kept == [0, 3, 4]


def test_cc_nonconvergence_raises(spark):
    """A path graph of diameter 6 cannot converge in 2 min-propagation
    rounds — the partial labels would be wrong, so the operator must
    raise rather than return them."""
    import pytest as _pytest

    from ravelytics_spark.operators.clusters import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["id_a", "id_b"]
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iterations=2)
    # with budget it converges to a single component rooted at 0
    comp = connected_components(chain, max_iterations=10)
    assert {r.component for r in comp.collect()} == {0}
