"""Connected components over a pair graph — the clustering step of a
near-dup pipeline: candidate PAIRS (MinHash/Jaccard output) become dedup
GROUPS by taking connected components, then one representative per
component survives.

Implemented as iterative min-label propagation on DataFrames: each round
every node takes the minimum label among itself and its neighbors;
converged when no label changes. Rounds = graph diameter, which for
near-dup graphs is small (clusters are cliques-ish). Each round is one
keyed join + one keyed aggregation — both map-side combined, no driver-side
graph state.

Scale notes (100 TB): min-label propagation's round count is bounded by the
longest chain; for adversarial long-chain graphs the production upgrade is
the large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond"), same join/agg primitives with O(log n) rounds.
The convergence test is one count() action per round on a label-change
anti-join — the only driver interaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.utils import materialize


def connected_components(
    edges: DataFrame,
    src_col: str = "d1",
    dst_col: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by (src_col, dst_col) pairs.
    Returns (node, comp) where comp is the component's minimum node id —
    deterministic, engine-independent. Only nodes appearing in edges are
    labeled (singletons carry no dedup information)."""
    und = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    und = materialize(und)

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
    )
    for _ in range(max_iter):
        neighbor_labels = und.join(
            labels, und["b"] == labels["node"]
        ).select(und["a"].alias("node"), F.col("comp"))
        new_labels = materialize(
            neighbor_labels.unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def component_sizes(labels: DataFrame) -> DataFrame:
    """Cluster roll-up: (cluster_id, n_docs) per component."""
    return (
        labels.groupBy(F.col("comp").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("cluster_id")
    )
