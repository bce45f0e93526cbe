"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming aggregations (window / session_window /
dropDuplicates) cover the reference-parity scope; this is the escape hatch
for semantics they can't express — arbitrary per-key state with
user-controlled emission. The demo operator keeps per-user running totals
(event count + value sum), the streaming twin of ``groupBy(user).agg``.

Scale notes: state lives in the state store, partitioned by the grouping
key — one shuffle on user_id, state size O(#users), not O(#events). Arrow
batches in/out (vectorized, not row-at-a-time). A production variant adds a
timeout (``GroupStateTimeout``) to expire idle keys and bound the store.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) with explicit state; emits the
    current totals for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
