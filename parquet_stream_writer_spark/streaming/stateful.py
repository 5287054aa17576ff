"""Custom keyed streaming state via ``applyInPandasWithState``.

For operators the built-in window/dedup state machines can't express:
arbitrary per-key accumulators updated each micro-batch, with timeout-
based finalization. The example operator here is a running per-user
profile (event count, value sum, last seen) — the shape of a feature-
store updater in an LLM-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp_ntz"
_STATE_SCHEMA = "n long, s double, last timestamp_ntz"


def _update_profile(key, pdf_iter, state: GroupState):
    import pandas as pd

    n, s, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None or batch_max > last else last
    state.update((n, s, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "last_ts": [last]}
    )


def running_user_profile(stream: DataFrame) -> DataFrame:
    """Per-user running aggregate maintained across micro-batches.

    Emits the refreshed profile for every user touched by each
    micro-batch (update semantics). State is per-key and compact
    (three scalars), so it scales horizontally with the shuffle
    partitioning of user_id.
    """
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
