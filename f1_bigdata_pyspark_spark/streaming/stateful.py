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


# --------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 successor to
# applyInPandasWithState: typed state handles (value/list/map state),
# explicit init/close lifecycle, timers. Same operational shape (state
# partitioned by key, one shuffle, O(#keys) store); richer state API.
# The demo keeps per-user (count, max value) in a ValueState and emits the
# running totals each micro-batch — batch-equivalence pinned in tests
# (skipped where the runner's google-protobuf wheel is absent, as in this
# container — same gating policy as the multimodal codec stubs).
# --------------------------------------------------------------------------
try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserMaxProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG, mx DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, mx = (
                self._state.get() if self._state.exists() else (0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    def running_user_max(events: DataFrame) -> DataFrame:
        """Per-user running (count, max) via the transformWithStateInPandas
        typed-state API."""
        return events.groupBy("user_id").transformWithStateInPandas(
            UserMaxProcessor(),
            outputStructType="user_id long, n_events long, max_value double",
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover — older Spark
    UserMaxProcessor = None

    def running_user_max(events: DataFrame) -> DataFrame:
        raise NotImplementedError("transformWithStateInPandas requires Spark 4")
