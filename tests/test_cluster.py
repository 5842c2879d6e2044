"""connected_components: chain, clique, isolated nodes, convergence."""

from __future__ import annotations

import pytest

from iceberg_evaluation_spark.operators.cluster import connected_components


def _cc(spark, nodes, edges, **kw):
    n = spark.createDataFrame([(x,) for x in nodes], "id bigint")
    e = spark.createDataFrame(edges or [(None, None)], "id_a bigint, id_b bigint")
    if not edges:
        e = e.limit(0)
    out = connected_components(n, e, **kw)
    return {r["node"]: r["cluster"] for r in out.collect()}


def test_chain_clique_and_isolated(spark):
    # chain 1-2-3-4, clique {10,11,12}, isolated 20
    got = _cc(
        spark,
        [1, 2, 3, 4, 10, 11, 12, 20],
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_empty_edges_all_singletons(spark):
    got = _cc(spark, [5, 6, 7], [])
    assert got == {5: 5, 6: 6, 7: 7}


def test_long_chain_exceeding_bound_raises(spark):
    nodes = list(range(12))
    edges = [(i, i + 1) for i in range(11)]
    with pytest.raises(RuntimeError, match="converge"):
        _cc(spark, nodes, edges, max_iter=2)
    # and converges with an adequate bound
    got = _cc(spark, nodes, edges, max_iter=15)
    assert set(got.values()) == {0}
