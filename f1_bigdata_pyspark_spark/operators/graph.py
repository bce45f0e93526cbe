"""Connected components over a pair graph — the clustering step of a
near-dup pipeline: candidate PAIRS (MinHash/Jaccard output) become dedup
GROUPS by taking connected components, then one representative per
component survives.

Primary implementation: alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round is a
pair of groupBy-min + join steps over the edge set, and the number of
rounds is O(log² n) worst-case / O(log n) in practice, INDEPENDENT of the
graph diameter. That is the property that matters at 100 TB: a near-dup
graph with an adversarial chain (docs A~B~C~… each within threshold of the
next) has diameter O(n), which makes per-round label propagation a
driver-serialized O(n)-round loop; the star algorithm collapses the same
chain in ~log n rounds. The round cap is computed once from the node count
(one upfront action), so the driver interaction is bounded by O(log n)
convergence probes, not by the data's shape.

``connected_components_propagation`` keeps the simpler min-label
propagation form (rounds = diameter) — used as the cross-check in
``tests/test_operators.py`` which proves label-equivalence on a chain
graph far deeper than the star round cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.utils import materialize


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round. Input: symmetric neighbor pairs (u, v).
    For each u with m = min(N(u) ∪ {u}), emit (v, m) for every strictly
    larger neighbor v > u. Output pairs are oriented big→small."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round. Input: pairs (u, v) oriented u > v.
    For each u with m = min(N(u)), re-point every other small neighbor at m
    and keep (u, m). Output stays oriented big→small."""
    mins = e.groupBy("u").agg(F.min("v").alias("mn"))
    moved = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    kept = mins.select("u", F.col("mn").alias("v"))
    return (
        moved.unionByName(kept).filter(F.col("u") != F.col("v")).distinct()
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "d1",
    dst_col: str = "d2",
    max_iter: int | None = None,
) -> DataFrame:
    """Components of the undirected graph given by (src_col, dst_col) pairs
    via alternating large-star/small-star. Returns (node, comp) where comp
    is the component's minimum node id — deterministic, engine-independent.
    Only nodes appearing in edges are labeled (singletons carry no dedup
    information).

    ``max_iter`` caps star ROUND PAIRS; the default 200 is a runaway
    backstop (covers n ≈ 2^48 at 4·log₂ n pessimism), not a budget —
    convergence exits in ~log₂ n pairs in practice, and exceeding the cap
    RAISES rather than returning possibly-corrupt labels. Driver
    interaction is one count() per round pair plus one exceptAll probe on
    the candidate final round."""
    sym = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
    # Node set from the UNFILTERED pairs: a node appearing only in
    # self-loops still gets a (node, node) label, matching the propagation
    # form's contract. Self-loop edges themselves carry no connectivity and
    # are dropped from the star iteration. Lazy — consumed once at the end.
    nodes = sym.select(F.col("u").alias("node")).distinct()
    und = materialize(sym.filter(F.col("u") != F.col("v")).distinct())

    if max_iter is None:
        # Backstop, not a budget: convergence exits the loop in ~log₂ n
        # round pairs in practice; 200 pairs covers n ≈ 2^48 even at the
        # paper's 4·log₂ n pessimism, and non-convergence RAISES below —
        # so no upfront count() action is spent sizing the cap to the data.
        max_iter = 200

    # Orient big→small for the first small-star by one large-star pass.
    e = materialize(_large_star(und))
    c_prev = e.count()
    converged = False
    for _ in range(max_iter):
        # e2 stays lazy: small-star over the materialized e is two cheap
        # stages, recomputed by large-star's two readers — cheaper than an
        # extra eager localCheckpoint write per round.
        e2 = _small_star(e)
        e3 = materialize(_large_star(e2.unionByName(e2.select(F.col("v").alias("u"), F.col("u").alias("v")))))
        # Converged when a full large+small round leaves the edge set
        # fixed. One count() action per round; the exceptAll probe runs
        # only when the cardinality already matches (candidate final
        # round), so a non-final round costs a single action.
        c3 = e3.count()
        if c3 == c_prev and e3.exceptAll(e).isEmpty():
            e = e3
            converged = True
            break
        e, c_prev = e3, c3
    if not converged:
        # Never return labels from a non-star edge set: a node with two
        # outgoing pairs would emit conflicting (node, comp) rows and
        # silently corrupt downstream dedup grouping.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} star round"
            " pairs (practical graphs need ~log2(n)); pass a larger max_iter"
        )

    # At convergence e is a star forest oriented (node → component min).
    star = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    # Centers (component minima) and degenerate self-loop-only nodes have no
    # outgoing pair — label them with themselves. Materialized like the
    # rounds: labels are consumed repeatedly downstream (size roll-ups,
    # joins back onto the doc table), and this keeps the consumer's plan a
    # scan of the label table rather than a replay of the label join.
    return materialize(
        nodes.join(star, "node", "left").select(
            "node", F.coalesce(F.col("comp"), F.col("node")).alias("comp")
        )
    )


def connected_components_propagation(
    edges: DataFrame,
    src_col: str = "d1",
    dst_col: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation form — each round every node takes the minimum
    label among itself and its neighbors; converged when no label changes.
    Rounds = graph diameter, so this is the CROSS-CHECK implementation (and
    fine for clique-ish near-dup graphs); production path is
    ``connected_components`` above."""
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


def bfs_hops(edges: DataFrame, source, max_hops: int = 4) -> DataFrame:
    """(node, d) breadth-first distances from ``source`` within
    ``max_hops`` rounds over a directed edge list (src, dst). Unrolled
    frontier expansion — the PageRank/k-core loop discipline: per round
    one co-partitioned join on src (pre-partition edges by src once
    upstream to reuse the exchange) plus one anti-join against the
    visited set, both materialized so round r+1 never recomputes round r.
    Nodes beyond ``max_hops`` are absent (the caller reports them as
    unreached). Frontier rows are bounded by |V|; rounds by the constant
    k — no driver-side convergence polling."""
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.utils import materialize

    spark = edges.sparkSession
    visited = materialize(
        spark.createDataFrame([(int(source), 0)], "node long, d long")
    )
    frontier = visited
    for depth in range(1, max_hops + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src", "left_semi"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(depth).cast("long").alias("d"))
        )
        frontier = materialize(nxt)
        visited = materialize(visited.unionByName(frontier))
    return visited


def bellman_ford(edges: DataFrame, source, rounds: int = 4) -> DataFrame:
    """(node, dist) shortest WEIGHTED distances from ``source`` after
    ``rounds`` relaxation sweeps over a directed (src, dst, w) edge list —
    the Pregel SSSP kernel as unrolled dataflow. Per round: one
    co-partitioned join on src (pre-partition edges by src upstream to
    reuse the exchange) feeding a min-combine on node, materialized so
    round r+1 never recomputes round r. After k rounds the distances are
    exact for every shortest path of <= k edges (the classic Bellman-Ford
    guarantee); callers pick k from the expected hop diameter, exactly as
    PageRank picks its iteration count.

    Determinism note: every candidate distance is the same left-to-right
    chain of IEEE additions in any engine, and min() over exact doubles is
    order-independent — so the result is bit-comparable to an unrolled-CTE
    oracle without any rounding tricks mid-loop."""
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.utils import materialize

    spark = edges.sparkSession
    dist = materialize(
        spark.createDataFrame([(int(source), 0.0)], "node long, dist double")
    )
    for _ in range(rounds):
        relax = edges.join(
            dist.select(F.col("node").alias("src"), "dist"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = materialize(
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist
