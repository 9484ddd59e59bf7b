"""PageRank (operators/graph.py) unit pins beside the oracle-paired
neardup_graph_pagerank catalog query."""

from __future__ import annotations


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_pagerank_star_center_dominates_and_mass_conserves(spark):
    """On a star, the hub out-ranks every leaf, all leaves tie
    exactly (identical quantized inputs), and total mass stays ~1
    (up to the 1e-9 contribution quantization)."""
    from machine_downtime_monitor_on_aws_spark.operators.graph import (
        pagerank_unrolled,
    )

    star = _pairs(spark, [(0, i) for i in range(1, 6)])
    rows = {r.node: r for r in pagerank_unrolled(star, iters=3).collect()}
    assert rows[0].degree == 5
    leaf_prs = {rows[i].pagerank for i in range(1, 6)}
    assert len(leaf_prs) == 1
    assert rows[0].pagerank > max(leaf_prs)
    total = sum(r.pagerank for r in rows.values())
    assert abs(total - 1.0) < 1e-6


def test_pagerank_deterministic_under_repartition(spark):
    """Quantized contribution sums make each iteration partition-
    order independent: a different input layout yields bit-identical
    ranks."""
    from machine_downtime_monitor_on_aws_spark.operators.graph import (
        pagerank_unrolled,
    )

    edges = [(i, (i * 7 + 3) % 23) for i in range(40) if i != (i * 7 + 3) % 23]
    a = {
        (r.node, r.degree): repr(r.pagerank)
        for r in pagerank_unrolled(_pairs(spark, edges), iters=3).collect()
    }
    b = {
        (r.node, r.degree): repr(r.pagerank)
        for r in pagerank_unrolled(
            _pairs(spark, edges).repartition(7), iters=3
        ).collect()
    }
    assert a == b
