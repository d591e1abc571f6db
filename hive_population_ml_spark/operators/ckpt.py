"""Releasable localCheckpoint for iterative DataFrame algorithms.

``Dataset.localCheckpoint()`` persists the materialized RDD
(MEMORY_AND_DISK) and wraps it in a LogicalRDD — but
``DataFrame.unpersist()`` only talks to the CACHE manager, so it is a
**no-op for checkpoint blocks** (verified empirically: the persistent
RDD count does not drop). The blocks are freed only when the JVM
Dataset is garbage-collected AND the async ContextCleaner gets to it —
under the allocation pressure of an iterative algorithm that cleanup
loses the race, and every iteration pins another full-size table.
Round 12 measured the failure: the suffix tier's 100x probe (148 M
chars, ~12 doubling rounds each checkpointing a corpus-sized rank
table) OOM'd an 80 GiB heap.

``local_ckpt``/``free_ckpt`` make the release explicit: the checkpoint
RDD ids are captured by diffing the SparkContext's persistent-RDD
registry around the (eager) checkpoint call, and ``free_ckpt``
unpersists exactly those ids. The diff can over-capture only if
another THREAD checkpoints concurrently (single-threaded drivers —
every caller in this repo — are exact).

Usage pattern (the three iterative loops: suffixes, components,
pagerank):

    r = local_ckpt(df)
    while ...:
        nxt = local_ckpt(transform(r))
        free_ckpt(r)          # superseded; nxt is already materialized
        r = nxt
    return r                  # final checkpoint stays for the caller
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_IDS_ATTR = "_hpml_ckpt_rdd_ids"

# Serialized storage (PySpark's MEMORY_AND_DISK is deserialized=False,
# unlike Scala's): checkpoint blocks hold compact UnsafeRow bytes
# instead of per-row Java objects. The default DESERIALIZED level
# inflates a 16-byte (pos, rank) row ~10x in object headers — the
# second half of the round-12 suffix-probe OOM (32 concurrent tasks
# unrolling deserialized value arrays blew a 60 GiB heap even with
# superseded rounds freed). Serialized blocks also spill to disk
# per-buffer instead of per-object-array.
_LEVEL = StorageLevel.MEMORY_AND_DISK


def _persistent_ids(df: DataFrame) -> set[int]:
    sc = df.sparkSession.sparkContext
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet()}


def local_ckpt(
    df: DataFrame, level: StorageLevel | None = _LEVEL
) -> DataFrame:
    """Eager localCheckpoint whose blocks ``free_ckpt`` can release;
    serialized storage by default (see ``_LEVEL``)."""
    before = _persistent_ids(df)
    out = df.localCheckpoint(eager=True, storageLevel=level)
    ids = _persistent_ids(out) - before
    setattr(out, _IDS_ATTR, ids)
    return out


def free_ckpt(df: DataFrame) -> None:
    """Release the checkpoint blocks captured by ``local_ckpt`` (no-op
    for other DataFrames). Non-blocking unpersist: the blocks drop as
    the BlockManager gets to them, which is immediate in practice."""
    ids = getattr(df, _IDS_ATTR, None)
    if not ids:
        return
    jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)
