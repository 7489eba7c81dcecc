"""Custom stateful streaming operators via applyInPandasWithState.

Where the built-in windowed aggregations can't express the semantics
(per-key running counters with emission on every batch, custom session
logic, fraud counters...), Structured Streaming's
``applyInPandasWithState`` gives an Arrow-batched per-key state
machine. State is bounded by timeouts; at 100 TB/day the key space is
partitioned across executors and each key's state lives in the state
store (RocksDB in production configs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = "n_events LONG, total_value DOUBLE"


# user-facing timeout names → GroupStateTimeout constants
_TIMEOUTS = {
    "NoTimeout": GroupStateTimeout.NoTimeout,
    "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
    "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
}


def user_running_totals(
    events: DataFrame,
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 3_600_000,
) -> DataFrame:
    """Per-user running event count + value sum, emitted every batch.

    Works on a *streaming* grouped DataFrame; each micro-batch updates
    the per-key state and emits the new totals — the unified-API
    counterpart is a plain groupBy().agg() in batch mode (see tests,
    which assert the final streaming state equals the batch totals).

    ``timeout`` selects the state-expiry policy (``NoTimeout``,
    ``ProcessingTimeTimeout``, ``EventTimeTimeout``); without one, state
    for dead keys grows without bound. With ProcessingTimeTimeout, keys
    idle for ``timeout_duration_ms`` are dropped; EventTimeTimeout
    expires against the stream's watermark.
    """
    if timeout not in _TIMEOUTS:
        raise ValueError(
            f"timeout must be one of {sorted(_TIMEOUTS)}, got {timeout!r}"
        )

    def update(key, pdfs, state: GroupState):
        if timeout != "NoTimeout" and state.hasTimedOut:
            state.remove()
            return
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if timeout == "ProcessingTimeTimeout":
            state.setTimeoutDuration(timeout_duration_ms)
        elif timeout == "EventTimeTimeout":
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeout_duration_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_TIMEOUTS[timeout],
    )
