"""Property-based tests (hypothesis) for the numeric/semantic helpers the
oracle comparisons lean on. Few examples, one Spark job each — property
breadth over example count.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from f1_bigdata_pyspark_spark.functions.stats import (
    slope_from_stats,
    slope_sufficient_stats,
)
from f1_bigdata_pyspark_spark.sources.parquet import upsert_keep_latest

_xy = st.lists(
    st.tuples(
        st.floats(-1e3, 1e3, allow_nan=False, width=32),
        st.floats(-1e3, 1e3, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(_xy)
def test_slope_matches_numpy_polyfit(spark, pts):
    """Sufficient-statistics slope == numpy least-squares slope (or NULL
    exactly when var(x) == 0)."""
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], ["x", "y"]
    )
    from pyspark.sql import functions as F

    stats = slope_sufficient_stats(F.col("x"), F.col("y"))
    row = (
        df.agg(*stats.values())
        .select(
            slope_from_stats(
                F.col("avg_x"), F.col("avg_y"), F.col("avg_xy"), F.col("avg_xx")
            ).alias("slope")
        )
        .first()
    )
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    if np.var(xs) == 0.0:
        assert row.slope is None
    else:
        want = float(np.polyfit(xs, ys, 1)[0])
        assert row.slope is not None
        assert math.isclose(row.slope, want, rel_tol=1e-6, abs_tol=1e-6)


_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(0, 5),  # key
            st.integers(0, 100),  # payload
        ),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None)
@given(_batches)
def test_upsert_keep_latest_properties(spark, batches):
    """The parquet upsert (reference's Mongo $set-upsert semantics): after
    any batch sequence, (a) keys are unique, (b) each key holds the payload
    of its LAST write across all batches, (c) re-applying the final batch is
    idempotent."""
    state = None
    seq = 0
    last_write: dict[int, int] = {}
    final_batch = None
    for batch in batches:
        rows = []
        for k, v in batch:
            rows.append((k, v, seq))
            last_write[k] = v
            seq += 1
        final_batch = spark.createDataFrame(
            rows, ["key", "payload", "ingested_at"]
        ) if rows else None
        if final_batch is None:
            continue
        state = upsert_keep_latest(state, final_batch, ["key"], "ingested_at")
    if state is None:
        return
    got = {r.key: r.payload for r in state.collect()}
    assert got == last_write  # uniqueness + keep-latest
    if final_batch is not None:
        again = upsert_keep_latest(state, final_batch, ["key"], "ingested_at")
        assert {r.key: r.payload for r in again.collect()} == last_write


_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None)
@given(_edges)
def test_connected_components_match_union_find(spark, edges):
    """Distributed min-label propagation == a driver-side union-find on
    arbitrary random graphs (same node set, same partition, min-id label)."""
    from f1_bigdata_pyspark_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "d1 long, d2 long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for node in parent:
        groups.setdefault(find(node), []).append(node)
    want = {n: min(members) for members in groups.values() for n in members}
    assert got == want
