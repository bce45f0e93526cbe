"""As-of (point-in-time) join — for each probe row, the most recent state
row of the same key at or before the probe's timestamp. The temporal join
financial ticks, feature stores, and SCD lookups need, and one Spark has no
native operator for.

Implemented the SCALABLE way: tag both inputs, union them, and run a single
per-key ``last(..., ignorenulls=True)`` window ordered by (ts, tag) — every
probe row then carries the latest preceding state values. One hash exchange
on the key, one per-key sort, zero row multiplication. The naive
alternative — an inequality join ``p.ts >= s.ts`` + keep-latest — explodes
to |probes|·|states| rows per key before pruning, which at 100 TB turns a
hot key into a cross product; the union form's cost is (|probes|+|states|)
log per key, the same as sorting the inputs.

Tie semantics (backward form): state rows order BEFORE probe rows at equal
timestamps, so a state exactly at the probe time is visible (ts_state <=
ts_probe — matching DuckDB's ``ASOF JOIN ... ON p.ts >= s.ts``, which the
oracle uses). ``asof_join_forward`` mirrors everything toward the earliest
following state (pandas ``merge_asof(direction='forward')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    probes: DataFrame,
    states: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every probe row, plus ``state_cols`` from the latest
    state row with the same ``key_col`` and state ts <= probe ts (NULL when
    no state precedes). ``states`` must be unique per (key, ts) for
    deterministic output — pre-aggregate if it isn't.

    ``tolerance_seconds`` bounds the lookback (the feature-store staleness
    guard): a match older than the tolerance is nulled out, exactly like
    pandas ``merge_asof(tolerance=...)``. Applied as a post-window null-out
    of the carried state timestamp, so it adds no exchange."""
    overlap = set(probes.columns) & set(state_cols)
    if overlap:
        raise ValueError(f"state_cols {sorted(overlap)} collide with probe columns")
    # The matched state travels as ONE struct (its ts + all payload cols),
    # carried by a single last(ignorenulls) — so the probe receives the
    # entire latest row, NULL payload fields included. Forward-filling each
    # payload column independently would resurrect values from OLDER rows
    # whenever the latest row holds a NULL (and could stitch together
    # fields of different rows) — diverging from ASOF-join semantics.
    p = probes.withColumn("__is_probe", F.lit(1))
    # a NULL-ts state can never match (s.ts <= p.ts is false under
    # three-valued logic) — but the window form would order it FIRST and
    # leak it into every probe; drop such rows up front
    s = (
        states.filter(F.col(ts_col).isNotNull())
        .select(
            key_col,
            ts_col,
            F.struct(
                F.col(ts_col).alias("__ts"), *state_cols
            ).alias("__state"),
        )
        .withColumn("__is_probe", F.lit(0))
    )
    u = p.unionByName(s, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("__is_probe"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__state", F.last("__state", ignorenulls=True).over(w))
    out = u.filter(F.col("__is_probe") == 1)
    matched = F.col("__state").isNotNull()
    if tolerance_seconds is not None:
        matched = matched & (
            (
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.col("__state.__ts"))
            )
            <= int(tolerance_seconds * 1_000_000)
        )
    for c in state_cols:
        out = out.withColumn(c, F.when(matched, F.col("__state")[c]))
    return out.drop("__is_probe", "__state")


def asof_join_forward(
    probes: DataFrame,
    states: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Forward as-of join: every probe row, plus ``state_cols`` from the
    EARLIEST state row with the same key and state ts >= probe ts (pandas
    ``merge_asof(direction='forward')``). Mirror of the backward form:
    probe rows order BEFORE state rows at equal timestamps so an exact-tie
    state is visible to the probe, and ``first(ignorenulls)`` over the
    following frame picks the whole matched row as one struct."""
    overlap = set(probes.columns) & set(state_cols)
    if overlap:
        raise ValueError(f"state_cols {sorted(overlap)} collide with probe columns")
    p = probes.withColumn("__is_probe", F.lit(1))
    # same NULL-ts guard as the backward form (s.ts >= p.ts is false for
    # a NULL state ts; asc_nulls_first would otherwise be benign here,
    # but the guard keeps both directions on one contract)
    s = (
        states.filter(F.col(ts_col).isNotNull())
        .select(
            key_col,
            ts_col,
            F.struct(
                F.col(ts_col).alias("__ts"), *state_cols
            ).alias("__state"),
        )
        .withColumn("__is_probe", F.lit(0))
    )
    u = p.unionByName(s, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("__is_probe").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = u.withColumn(
        "__state", F.first("__state", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("__is_probe") == 1)
    matched = F.col("__state").isNotNull()
    if tolerance_seconds is not None:
        matched = matched & (
            (
                F.unix_micros(F.col("__state.__ts"))
                - F.unix_micros(F.col(ts_col))
            )
            <= int(tolerance_seconds * 1_000_000)
        )
    for c in state_cols:
        out = out.withColumn(c, F.when(matched, F.col("__state")[c]))
    return out.drop("__is_probe", "__state")
