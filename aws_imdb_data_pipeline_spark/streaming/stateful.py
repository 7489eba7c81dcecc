"""Custom stateful streaming operators via applyInPandasWithState and
the Spark 4 ``transformWithStateInPandas`` API.

Where the built-in windowed aggregations can't express the semantics
(per-key running counters with emission on every batch, custom session
logic, fraud counters...), Structured Streaming's
``applyInPandasWithState`` gives an Arrow-batched per-key state
machine. State is bounded by timeouts; at 100 TB/day the key space is
partitioned across executors and each key's state lives in the state
store (RocksDB in production configs).

``transformWithStateInPandas`` (Spark ≥4.0) supersedes it with typed
composite state (ValueState/ListState/MapState), per-state TTLs, and
timers; ``user_event_type_counts`` demonstrates MapState — sub-keyed
state that applyInPandasWithState could only fake by serializing a
whole dict into one value column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
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


# user-facing timeout names; resolved to GroupStateTimeout constants
# lazily so importing this module (via streaming/__init__) never pulls
# pandas / the state-server modules — only running an operator does
_TIMEOUT_NAMES = ("NoTimeout", "ProcessingTimeTimeout", "EventTimeTimeout")


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
    if timeout not in _TIMEOUT_NAMES:
        raise ValueError(
            f"timeout must be one of {sorted(_TIMEOUT_NAMES)}, got {timeout!r}"
        )
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


EVENT_TYPE_COUNTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def user_event_type_counts(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Running per-(user, event_type) counts via the Spark 4
    ``transformWithStateInPandas`` API with MapState.

    Each grouping key (user) holds a map event_type → count in the
    state store; every micro-batch increments only the touched
    sub-keys and emits their new totals (update-mode semantics). The
    batch-mode equivalent is ``groupBy(user_id, event_type).count()``
    — the stream-vs-batch test asserts exactly that equality after
    draining the stream.

    ``ttl_ms`` bounds state lifetime per sub-key (RocksDB-evictable at
    scale); None keeps counts forever. Spark forbids TTL-configured
    state outside ProcessingTime time mode
    (STATEFUL_PROCESSOR_CANNOT_ASSIGN_TTL_IN_NO_TIME_MODE), so passing
    ttl_ms switches the operator to ``timeMode="ProcessingTime"``;
    without it we keep ``"None"`` so batch-equivalence is exact. State
    is sharded by user across executors exactly like the aggregate's
    shuffle would be, so the operator scales with the key space, not
    the stream length.

    Runtime dependency: the transformWithState state-server protocol
    needs ``protobuf`` in the Python environment (this container lacks
    it, so the stream-vs-batch test auto-skips there; the operator is
    fully exercised on any protobuf-equipped cluster).
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-specific
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's state-server protocol); install protobuf or use "
            "user_running_totals (applyInPandasWithState) instead"
        ) from exc
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _EventTypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n long", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            batch: dict[str, int] = {}
            for pdf in rows:
                for et, cnt in pdf.groupby("event_type").size().items():
                    batch[et] = batch.get(et, 0) + int(cnt)
            out = []
            for et, add in sorted(batch.items()):
                k = (et,)
                prev = (
                    self._counts.getValue(k)[0]
                    if self._counts.containsKey(k)
                    else 0
                )
                self._counts.updateValue(k, (prev + add,))
                out.append((key[0], et, prev + add))
            yield pd.DataFrame(
                out, columns=["user_id", "event_type", "n_events"]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_EventTypeCounts(),
        outputStructType=EVENT_TYPE_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
