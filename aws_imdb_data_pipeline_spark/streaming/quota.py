"""Per-source quota admission on a document stream.

The streaming twin of the batch domain-cap curation rule
(`plans.extensions3.corpus_per_source_cap`): as documents arrive, each
source may admit at most ``cap`` of them — curation-on-ingest, so an
over-crawled domain stops contributing the moment its quota fills
instead of being trimmed in a nightly batch.

Semantics: admission is ARRIVAL-order (the only order a stream has).
Within one micro-batch, ties are broken by ``id_col`` so a batch's
admissions are deterministic under Spark's unordered per-key batch
delivery; across batches, state carries the admitted count. When the
arrival order equals the id order (a replayed/backfilled feed — the
test's docgen case), the admitted set equals the batch rule's
lowest-id-first survivors exactly; under out-of-order arrival the two
legitimately differ, which is the inherent batch/stream curation gap
(the batch rule sees the whole corpus, the stream admits online).

State per source is ONE long (admitted count) — at 100 TB/day the
state store holds n_sources longs, not documents. State never expires
here by design (a quota is forever for a corpus version); wire a
timeout like stateful.user_running_totals when quotas reset per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

ADMITTED_SCHEMA = StructType(
    [
        StructField("source", StringType(), False),
        StructField("doc_id", LongType(), False),
    ]
)

_STATE_SCHEMA = "n_admitted LONG"


def admit_per_source_quota(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming per-source admission: emit (source, doc_id) for every
    admitted document; a source's admissions stop at ``cap``. Works on
    a streaming frame via applyInPandasWithState (one long of state
    per source); on a batch frame the equivalent is
    ``top_n_per_group`` over the same (arrival ≡ id) order."""
    # Deferred like every other heavy import in this package: importing
    # the streaming package (e.g. for stream_to_lake) must not require
    # pandas — only actually RUNNING this stateful operator does.
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (n,) = state.get if state.exists else (0,)
        # materialize the key's WHOLE batch before sorting: the runner
        # may deliver one key's batch rows as several Arrow chunks, and
        # a per-chunk sort would make admissions chunking-dependent.
        # NB: columns were aliased to (source, doc_id) BEFORE the
        # grouping, so the UDF always reads the canonical names —
        # never the caller's id_col.
        ids = pd.concat([pdf["doc_id"] for pdf in pdfs]).sort_values()
        take = ids.iloc[: max(cap - n, 0)]
        state.update((n + len(take),))
        if len(take):
            yield pd.DataFrame({"source": key[0], "doc_id": take.to_numpy()})

    return (
        docs.select(
            docs[source_col].alias("source"), docs[id_col].alias("doc_id")
        )
        .groupBy("source")
        .applyInPandasWithState(
            update,
            outputStructType=ADMITTED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
