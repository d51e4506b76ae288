"""Connected components over an edge list — the step that turns
pairwise duplicate findings (Jaccard / LSH / SimHash pairs) into
dedup *clusters*, so a corpus can keep exactly one representative per
group of mutual near-duplicates.

Algorithm: iterative min-label propagation, pure DataFrame ops. Each
round every node takes the minimum component label among itself and
its neighbors; convergence in O(component diameter) rounds. Near-dup
clusters are dense (pairs come from a similarity threshold), so
diameters are tiny — 3-4 rounds in practice. At extreme scale the
per-round cost is one shuffle join on the edge list plus one
aggregate, both keyed by node id (uniform); the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond") halves round count on pathological chain graphs but shares
the same per-round shape.

The per-round convergence check is a driver-side count of changed
labels — control-plane only (one boolean per round), never row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges``; ``comp`` is
    the minimum node id of the node's connected component."""
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    # labels carries (node, comp) — names disjoint from sym's (a, b) so
    # the per-round self-referential join has unambiguous lineage.
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .persist()
    )
    for _ in range(max_iter):
        neigh = sym.join(labels, sym["b"] == labels["node"]).select(
            F.col("a").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.union(neigh).groupBy("node").agg(F.min("comp").alias("comp"))
        ).persist()
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
