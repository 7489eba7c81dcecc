"""CDC changelog application (MERGE-INTO semantics on a parquet lake).

The reference refreshes its warehouse by full reload (staged drop-and-
recreate, see the staged-load lifecycle it drives through Athena DDL —
`/root/reference` has no notion of row-level change capture). At 100 TB
a full reload to pick up 0.1% changed rows is the dominant cost; the
standard fix is to ship a CDC changelog (insert/update/delete rows with
a monotone sequence) and fold it into the snapshot:

    state' = (snapshot ⟕anti touched_keys)  ∪  latest_non_delete(changelog)

Scale shape:

- ``latest_state`` is one hash shuffle on the key columns (the window's
  partitionBy); no driver-side data, no collect.
- ``apply_changelog``'s anti-join broadcasts the touched-key set when
  the slice is small relative to the snapshot (the common CDC case —
  Spark's AQE/size estimation picks broadcast automatically because the
  distinct-key frame derives from the slice, not the snapshot). The
  snapshot itself is never shuffled: anti-join probe + unionByName are
  both narrow on the snapshot side under a broadcast, so cost is
  O(snapshot scan + slice shuffle), not O(snapshot shuffle).
- Deletes are first-class: a key whose LAST op in the changelog is the
  delete op disappears from the result (tombstone), matching Debezium /
  MERGE ... WHEN MATCHED AND op='D' THEN DELETE semantics.

Invariant (tested): folding any time-split of a changelog equals
collapsing the whole changelog in one pass —
``apply_changelog(latest_state(old), new) == latest_state(old ∪ new)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_state(
    changelog: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Collapse a CDC changelog to current state: the last op per key
    (ordered by ``seq_cols``, descending) wins; keys whose final op is
    the delete op are dropped (or kept as tombstone rows when
    ``keep_tombstones`` — used by :func:`apply_changelog`, which still
    needs to know the key was touched).

    One shuffle (hash on ``keys``); ``row_number`` keeps a single row
    of state per key per partition, so memory is bounded by the key
    count, not the changelog length.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    out = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if not keep_tombstones:
        out = out.filter(F.col(op_col) != delete_op).drop(op_col)
    return out


def apply_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Fold a changelog slice into a snapshot (MERGE INTO on parquet).

    ``snapshot`` holds current state (schema = changelog minus
    ``op_col``); the result is the post-merge state: untouched snapshot
    rows pass through an anti-join (broadcast when the slice is small),
    touched keys take their latest non-delete changelog row, and keys
    whose last op is a delete vanish.
    """
    latest = latest_state(
        changelog, keys, seq_cols, op_col, delete_op, keep_tombstones=True
    )
    touched = latest.select(*keys)
    kept = snapshot.join(touched, on=keys, how="left_anti")
    survivors = latest.filter(F.col(op_col) != delete_op).drop(op_col)
    return kept.unionByName(survivors)
