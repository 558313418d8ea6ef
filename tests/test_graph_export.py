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
        for r in label_propagation_communities(_edges(spark)).collect()
    }
    # connected subgraph a..g converges to min label 'a'; x-y to 'x'
    assert all(out[n] == "a" for n in "abcdefg")
    assert out["x"] == out["y"] == "x"


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
