"""Size-aware dimension-join policy.

``F.broadcast(dim)`` is an unconditional override: Catalyst will replicate
the dimension to every executor no matter how big it is. That is right for
TPC-H ``region``/``nation`` (fixed 5/25 rows at every SF) and right for
``customer`` at sf0.1 (~15k rows) — and catastrophically wrong for
``customer`` at sf100 (15M rows, gigabytes serialized to every executor).

``broadcast_if_small`` makes the hint conditional on Catalyst's OWN size
estimate for the frame (optimized-plan ``stats().sizeInBytes`` — for a
parquet scan this is the on-disk footprint, the same statistic the
auto-broadcast planner uses) against ``spark.sql.autoBroadcastJoinThreshold``.
Under the threshold → broadcast hint (guaranteeing the map-side join even
when the dim is a derived frame whose stats Catalyst over-estimates).
Over the threshold (or threshold = -1) → the frame is returned unhinted and
the join degrades to the co-partitioned shuffle join (SortMergeJoin /
ShuffledHashJoin) that a large dimension needs; AQE may still convert it
back at runtime if the actual build side turns out small.

Plan contract tested in ``tests/test_join_policy.py``: with broadcast
disabled, customer joins must compile to SortMergeJoin and results stay
oracle-identical.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUFFIX = {
    "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def parse_byte_size(s: str) -> int:
    """Parse Spark byte-size conf strings: '10485760', '10MB', '1g', '-1'."""
    m = re.fullmatch(r"\s*(-?\d+)\s*([a-zA-Z]*)\s*", str(s))
    if not m:
        raise ValueError(f"unparseable byte size {s!r}")
    n, suffix = int(m.group(1)), m.group(2).lower()
    if suffix and suffix not in _SUFFIX:
        raise ValueError(f"unknown byte-size suffix in {s!r}")
    return n * (_SUFFIX.get(suffix, 1) if n >= 0 else 1)


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the frame's optimized plan (for a bare
    parquet scan: the file bytes; derived frames inherit conservative
    propagation). One driver-side JVM call, no job."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def local_dim(spark, rows, schema) -> DataFrame:
    """Build a literal driver-side dimension as a LocalRelation
    (``LocalTableScan``) so Catalyst sees its REAL byte size.

    ``spark.createDataFrame(list, ...)`` plans as ``Scan ExistingRDD``
    whose size statistic is ``defaultSizeInBytes`` (effectively +inf), so
    every downstream size decision — auto-broadcast, the
    ``broadcast_if_small`` policy, and the over-sized-broadcast plan
    audit — treats a 4-row constant as unbroadcastable. Routing the same
    rows through pandas produces a LocalRelation with accurate stats:
    a literal dim then broadcasts because it IS small, not because a
    hint overrode the planner."""
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame.from_records(list(rows)), schema=schema
    )


def as_local_dim(df: DataFrame) -> DataFrame:
    """Collect a provably-tiny computed frame (trained centroids, k-row
    seeds) and rebuild it as a LocalRelation with accurate size stats.
    The honest alternative to ``localCheckpoint`` for frames that feed
    broadcasts: a checkpointed RDD scan reports +inf to Catalyst, while
    the rebuilt LocalRelation reports its true bytes — so the broadcast
    is planner-approved, and the plan audit can verify it. Only for
    frames whose row count is bounded by an algorithm constant (k), never
    by data volume."""
    return df.sparkSession.createDataFrame(df.toPandas(), schema=df.schema)


def broadcast_if_small(df: DataFrame, threshold_bytes: int | None = None) -> DataFrame:
    """Broadcast hint iff the estimated size is under the threshold
    (default: the session's ``spark.sql.autoBroadcastJoinThreshold``);
    otherwise return the frame unhinted so the planner picks a shuffle
    join. threshold <= 0 disables broadcasting entirely."""
    if threshold_bytes is None:
        threshold_bytes = parse_byte_size(
            df.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        )
    if threshold_bytes <= 0:
        return df
    if estimated_size_bytes(df) <= threshold_bytes:
        return F.broadcast(df)
    return df
