"""Build-if-missing lake artifacts: one fingerprint/marker convention.

Several operators amortize a corpus-sized pass into a persisted
artifact that every later query serves from (the pattern a real
deployment uses — nobody retrains an ANN index or re-shuffles a fact
table per query batch):

- the IVF-PQ index           (extensions/pq.py)
- the IVF assignment table   (extensions/ivf.py)
- the MinHash band index     (extensions/dedup.py)
- the CLUSTER-BY events copy (plans/relational2.py)
- the bucketed partsupp      (plans/partsupp.py)

Rounds 4-5 grew four hand-rolled copies of the same stat-fingerprint +
marker logic, and they drifted (one GC'd stale outputs, the others did
not; one re-attached a possibly PARTIAL previous write because it keyed
on directory existence alone). This module is the single copy:

- :func:`source_fingerprint` — staleness key from source file stat
  (mtime_ns, size) + the build parameters. A free filesystem check;
  no data is scanned to decide freshness.
- :func:`ensure_artifact` — check the marker, run ``build`` when
  missing/stale, and write ``_meta.json`` ATOMICALLY AFTER the build
  returns. A crashed/partial build leaves no marker, so the next
  caller rebuilds instead of serving garbage — the completion-marker
  property every builder now inherits.

Artifacts live under ``$SPARK_GRAFT_ARTIFACTS`` (default
``<repo>/.artifacts``), keyed ``<kind>/<sf-dir-basename>`` and rebuilt
IN PLACE on staleness, so path-keyed artifacts cannot accumulate stale
siblings. Name-keyed artifacts (catalog tables) handle their own GC
but share the fingerprint helper.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable


def artifacts_root() -> str:
    """$SPARK_GRAFT_ARTIFACTS, default <repo>/.artifacts."""
    return os.environ.get(
        "SPARK_GRAFT_ARTIFACTS",
        os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".artifacts",
        ),
    )


from contextlib import contextmanager


@contextmanager
def sized_write(spark, advisory: str = "64m"):
    """Scope for artifact/lake WRITES: let AQE coalesce the final
    stage by ADVISORY SIZE instead of parallelism.

    The session default keeps ``parallelismFirst=true`` (and r14
    lowers ``minPartitionSize`` to 64k) because COMPUTE stages in this
    engine are often compute-dense at tiny byte sizes — but that same
    setting makes a write stage emit one small file per core-sized
    sliver (guide §6's small-files problem twice over: driver listing
    on every later read, per-file open cost on every scan task, and
    here each tiny artifact file also becomes its own Python-boundary
    task in the pandas-kernel serve paths). Inside this scope the
    write stage coalesces to ~``advisory`` bytes per output file;
    everything outside is untouched. Restores prior conf on exit."""
    pf = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    # get(k, None) is None when the key was never explicitly SET (the
    # built-in default does not count) — restore-to-unset must not pin
    # today's built-in default into the session
    old = {k: spark.conf.get(k, None) for k in (pf, adv)}
    spark.conf.set(pf, "false")
    spark.conf.set(adv, advisory)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def artifact_dir(kind: str, sf_dir: str) -> str:
    """Artifact path for (kind, data dir).

    Keyed by the data dir's basename PLUS a short hash of its absolute
    path: two dirs sharing a basename (/a/sf0.1 and /b/sf0.1) would
    otherwise share one artifact slot and — since the fingerprint embeds
    the full source path — alternate callers would see a perpetually
    stale fingerprint and rebuild on every switch (silent thrash, not
    wrong results, but the whole point of an artifact is to not do
    that). The basename stays in the key for human-debuggable paths."""
    norm = os.path.normpath(os.path.abspath(sf_dir))
    tag = hashlib.sha256(norm.encode()).hexdigest()[:8]
    return os.path.join(
        artifacts_root(), kind, f"{os.path.basename(norm)}-{tag}"
    )


def source_fingerprint(sources: list[str] | str, params: dict) -> str:
    """Staleness key: (mtime_ns, size) of every source file + the build
    params, hashed. stat() only — deciding freshness never reads data."""
    if isinstance(sources, str):
        sources = [sources]
    parts = []
    for s in sources:
        st = os.stat(s)
        parts.append(f"{s}={st.st_mtime_ns}:{st.st_size}")
    parts.append(str(sorted(params.items())))
    return hashlib.sha256(";".join(parts).encode()).hexdigest()[:16]


def read_artifact_meta(path: str) -> dict | None:
    """_meta.json if present and parseable, else None (== stale).

    Underscore-prefixed so Spark's file listing skips it when the
    artifact's parquet files live at the path root (events_clustered)."""
    try:
        with open(os.path.join(path, "_meta.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def write_artifact_meta(path: str, meta: dict) -> None:
    """Atomic marker write (tmp + rename): readers see either the old
    complete meta or the new complete meta, never a torn file."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "_meta.json"))


def ensure_artifact(
    kind: str,
    sf_dir: str,
    sources: list[str] | str,
    params: dict,
    build: Callable[[str, str], dict | None],
    meta_reader: Callable[[str], dict | None] | None = None,
) -> tuple[str, dict, bool]:
    """Serve the artifact at ``artifact_dir(kind, sf_dir)``, building it
    first when missing or stale. Returns (path, meta, rebuilt).

    ``build(path, fingerprint)`` runs the one corpus-sized pass. If it
    returns a dict, the helper writes ``meta.json`` (fingerprint +
    params + the dict) AFTER the build completes — the completion
    marker. If it returns None, the build is expected to have written
    its own marker (pass ``meta_reader`` so staleness checks read it);
    builders that own rich metas (PQ codebooks) use this form.
    """
    fp = source_fingerprint(sources, params)
    path = artifact_dir(kind, sf_dir)
    reader = meta_reader or read_artifact_meta
    meta = reader(path)
    if meta is not None and meta.get("fingerprint") == fp:
        return path, meta, False
    extra = build(path, fp)
    if extra is not None:
        meta = {"fingerprint": fp, "params": dict(params), **extra}
        write_artifact_meta(path, meta)
    else:
        meta = reader(path)
        if meta is None or meta.get("fingerprint") != fp:
            raise RuntimeError(
                f"artifact build for {kind} wrote no valid marker at {path}"
            )
    return path, meta, True
