"""Skew-mitigation operators.

AQE's skew-join handling covers sort-merge joins at runtime; these helpers
cover the cases AQE doesn't: a single hot *aggregation* key, and hot keys in
a hash-partitioned pre-shuffle. Both use salting — append a random-but-
deterministic salt component, aggregate partially per (key, salt), then
merge. The classic two-stage combine; results are exactly equal to the
unsalted plan because count/sum/min/max are associative.

Scale notes: at 100 TB a hot key (e.g. the empty-string language bucket of a
web corpus) can put >10% of rows in one partition; two-stage salted agg
bounds any partition at rows/salt_buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(cols: list[Column], buckets: int) -> Column:
    """Deterministic pseudo-random salt derived from row content: stable
    across retries (no rand(), which breaks task re-execution)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_agg_counts(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe count/sum/min/max aggregation per key.
    Stage 1 aggregates per (key, salt); stage 2 merges partials per key.
    Output columns: *key_cols, n_rows, sum_v, min_v, max_v.

    The default salt hashes EVERY column of the row: salting from
    ``value_col`` alone collapses to a single bucket whenever the hot
    key's values are constant/low-cardinality — exactly the skew the
    helper exists to break. (Results are salt-invariant either way; only
    the stage-1 partition bound depends on it.)"""
    src = salt_source or df.columns
    salted = df.withColumn(
        "__salt", salt_column([F.col(c) for c in src], salt_buckets)
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_col).alias("__s"),
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").alias("n_rows"),
        F.sum("__s").alias("sum_v"),
        F.min("__mn").alias("min_v"),
        F.max("__mx").alias("max_v"),
    )


def salted_join_broadcast_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
) -> DataFrame:
    """Skewed-join split: route hot keys through a broadcast join and the
    long tail through the normal shuffled join, then union. Deterministic
    replacement for AQE skew handling when the hot set is known up front."""
    hot_fact = fact.filter(F.col(key).isin(hot_keys))
    cold_fact = fact.filter(~F.col(key).isin(hot_keys))
    hot_dim = dim.filter(F.col(key).isin(hot_keys))
    hot = hot_fact.join(F.broadcast(hot_dim), key, "inner")
    cold = cold_fact.join(dim, key, "inner")
    return hot.unionByName(cold)
