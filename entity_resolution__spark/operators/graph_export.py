"""Graph export / sampling / communities (reference S3, G6, G7).

The reference ships matplotlib/networkx visualization utilities
(/root/reference/src/graph/visualize_graph_utils.py:9-103): GEXF export,
BFS-sampled subgraphs, and community coloring. The plotting itself is
out of scope here (SURVEY.md §2.1) — what this module keeps is the DATA
side, Spark-first:

  S3  to_gexf            edges/nodes → GEXF XML string (driver-side,
                         explicitly bounded — viz-scale graphs only)
  G6  bfs_subgraph       distributed k-hop expansion from seed nodes:
                         one semi-join per hop, frontier stays a
                         DataFrame (no driver adjacency)
  G7  label_propagation_communities
                         synchronous min-label propagation — the
                         scale-safe stand-in for the reference's
                         networkx Louvain coloring; deterministic
                         (min-label tie-break, fixed iteration cap)

At 100 TB: bfs_subgraph is hash joins keyed on node (frontier ≪ graph,
broadcastable when small); LPA is one groupBy+join per round like the
CC loop. Only to_gexf collects, and it refuses unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter(
        F.col("u") != F.col("v")
    )


def bfs_subgraph(
    edges: DataFrame, seeds: list, depth: int = 2
) -> tuple[DataFrame, DataFrame]:
    """G6: nodes within `depth` hops of `seeds`, plus the induced edges
    (reference visualize_graph_utils.py BFS sample). Each hop is one
    join + distinct; the frontier is broadcast when small (Spark decides
    via AQE). Returns (nodes(node), edges(src, dst))."""
    spark = edges.sparkSession
    sym = _sym(edges).localCheckpoint(eager=True)
    visited = spark.createDataFrame([(s,) for s in seeds], ["node"]).distinct()
    frontier = visited
    for _ in range(depth):
        nxt = (
            sym.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        visited = visited.union(nxt).distinct().localCheckpoint(eager=True)
        frontier = nxt
    vn = visited.withColumnRenamed("node", "u")
    induced = (
        sym.join(vn, "u")
        .join(visited.withColumnRenamed("node", "v"), "v")
        .filter(F.col("u") < F.col("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
    )
    return visited, induced


def label_propagation_communities(
    edges: DataFrame, max_iter: int = 10
) -> DataFrame:
    """G7: communities via synchronous min-label propagation — each round
    every node adopts the minimum label in its closed neighborhood.
    Deterministic (min tie-break) and converges to per-component stable
    labels on cluster-shaped graphs in a few rounds; one groupBy+join
    shuffle pair per round, same cost envelope as a CC iteration.

    Returns (node, community) with community = a member node id."""
    sym = _sym(edges).distinct().localCheckpoint(eager=True)
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "node")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("community"))


def to_gexf(
    nodes: DataFrame,
    edges: DataFrame,
    label_col: str | None = None,
    max_nodes: int = 10_000,
) -> str:
    """S3: GEXF 1.2 XML for a BOUNDED graph (reference
    visualize_graph_utils.py:9-40 exports nx.write_gexf). Refuses graphs
    over `max_nodes` — this is a viz exit ramp, not a data path."""
    n_rows = nodes.limit(max_nodes + 1).collect()
    if len(n_rows) > max_nodes:
        raise ValueError(
            f"to_gexf is viz-only: graph exceeds max_nodes={max_nodes}; "
            "sample with bfs_subgraph first"
        )
    e_rows = edges.collect()

    def esc(s: object) -> str:
        return (
            str(s)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
        )

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gexf xmlns="http://gexf.net/1.2" version="1.2">',
        '  <graph mode="static" defaultedgetype="undirected">',
        "    <nodes>",
    ]
    for r in n_rows:
        node = r["node"]
        label = r[label_col] if label_col and label_col in r.__fields__ else node
        out.append(f'      <node id="{esc(node)}" label="{esc(label)}"/>')
    out.append("    </nodes>")
    out.append("    <edges>")
    for i, r in enumerate(e_rows):
        w = f' weight="{r["weight"]}"' if "weight" in r.__fields__ else ""
        out.append(
            f'      <edge id="{i}" source="{esc(r["src"])}" '
            f'target="{esc(r["dst"])}"{w}/>'
        )
    out.append("    </edges>")
    out.append("  </graph>")
    out.append("</gexf>")
    return "\n".join(out)
