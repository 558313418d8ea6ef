"""Graph export family (reference S3/G6/G7 data side)."""

from __future__ import annotations


def _edges(spark):
    # two triangles bridged by d-e, plus an isolated pair x-y
    rows = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"),
        ("d", "e"),
        ("e", "f"), ("f", "g"), ("e", "g"),
        ("x", "y"),
    ]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_bfs_subgraph_depth_limits(spark):
    from entity_resolution__spark.operators.graph_export import bfs_subgraph

    nodes1, edges1 = bfs_subgraph(_edges(spark), ["a"], depth=1)
    got1 = {r["node"] for r in nodes1.collect()}
    assert got1 == {"a", "b", "c"}
    e1 = {(r["src"], r["dst"]) for r in edges1.collect()}
    assert e1 == {("a", "b"), ("b", "c"), ("a", "c")}

    nodes2, _ = bfs_subgraph(_edges(spark), ["a"], depth=2)
    assert {r["node"] for r in nodes2.collect()} == {"a", "b", "c", "d"}
    # x/y unreachable at any depth
    nodes4, _ = bfs_subgraph(_edges(spark), ["a"], depth=4)
    assert "x" not in {r["node"] for r in nodes4.collect()}


def test_label_propagation_components(spark):
    from entity_resolution__spark.operators.graph_export import (
        label_propagation_communities,
    )

    out = {
        r["node"]: r["community"]
        for r in label_propagation_communities(
            _edges(spark), weighted=False
        ).collect()
    }
    # min-label mode: connected subgraph a..g converges to min label 'a';
    # x-y to 'x' (per-component coloring)
    assert all(out[n] == "a" for n in "abcdefg")
    assert out["x"] == out["y"] == "x"


def test_weighted_lpa_splits_bridged_communities(spark):
    """G7 weighted-majority LPA (round-2 VERDICT #7): two K4 communities
    joined by one weak bridge stay SEPARATE — min-label LPA merges them
    into one component-wide label regardless of weights."""
    from itertools import combinations

    from entity_resolution__spark.operators.graph_export import (
        label_propagation_communities,
    )

    rows = [(u, v, 1.0) for u, v in combinations("abcd", 2)]
    rows += [(u, v, 1.0) for u, v in combinations("efgh", 2)]
    rows += [("d", "e", 0.1)]  # weak bridge
    edges = spark.createDataFrame(rows, ["src", "dst", "weight"])
    out = {
        r["node"]: r["community"]
        for r in label_propagation_communities(edges, max_iter=20).collect()
    }
    left = {out[n] for n in "abcd"}
    right = {out[n] for n in "efgh"}
    assert len(left) == 1 and len(right) == 1
    assert left != right
    # the min-label variant demonstrably gets this graph wrong (one label)
    mono = {
        r["community"]
        for r in label_propagation_communities(edges, weighted=False).collect()
    }
    assert len(mono) == 1


def test_weighted_lpa_no_bipartite_oscillation(spark):
    """Round-3 review: without a self-vote, synchronous LPA 2-cycles on
    bipartite structures — a single edge returned two singletons and a
    star split its center from the leaves. The self-vote (max incident
    weight, min-label tie-break) must yield ONE community per component."""
    from entity_resolution__spark.operators.graph_export import (
        label_propagation_communities,
    )

    pair = spark.createDataFrame([("x", "y")], ["src", "dst"])
    out = {r["node"]: r["community"]
           for r in label_propagation_communities(pair).collect()}
    assert out["x"] == out["y"] == "x"

    star = spark.createDataFrame(
        [("c", f"l{i}") for i in range(4)], ["src", "dst"]
    )
    out = {r["node"]: r["community"]
           for r in label_propagation_communities(star).collect()}
    assert len(set(out.values())) == 1

    path = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    out = {r["node"]: r["community"]
           for r in label_propagation_communities(path).collect()}
    assert len(set(out.values())) == 1


def test_to_gexf_string(spark):
    from entity_resolution__spark.operators.graph_export import (
        bfs_subgraph,
        to_gexf,
    )
    import pytest

    nodes, edges = bfs_subgraph(_edges(spark), ["a"], depth=1)
    xml = to_gexf(nodes, edges)
    assert xml.startswith('<?xml version="1.0"')
    assert '<node id="a"' in xml and '<edge id="0"' in xml
    assert xml.count("<node ") == 3 and xml.count("<edge ") == 3
    with pytest.raises(ValueError):
        to_gexf(nodes, edges, max_nodes=2)
    # edge side is bounded too (ADVICE round 2: node-bounded graphs can
    # still carry O(n²) edges into the driver)
    with pytest.raises(ValueError, match="max_edges"):
        to_gexf(nodes, edges, max_edges=2)
