"""Named query registry wired into ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers:
  - a PySpark callable  (spark, sf_dir) -> DataFrame
  - (when SQL-expressible) an equivalent ANSI-SQL string the DuckDB
    oracle runs on the same parquet views.

Import side effects populate the registry; add new query modules to
``_MODULES``.
"""

from __future__ import annotations

import importlib

from .registry import ORACLE, QUERIES, register

_MODULES = [
    "core",
    "aggregates",
    "windows",
    "scalars",
    "mlmetrics",
    "dedup",
    "text",
    "similarity",
    "streamq",
    # sampling's queries rotated INTO the driver window in round 4;
    # _prioritize() orders oracle-backed entries first, so module order
    # only fixes relative position within each class.
    "sampling",
]


def load_all() -> None:
    for m in _MODULES:
        importlib.import_module(f"{__name__}.{m}")
    _prioritize()


def _prioritize() -> None:
    """Stable-reorder the registry so every oracle-backed query precedes
    the rows-only (no-oracle) approximate ops.

    The round driver evaluates registry entries in insertion order with
    a bounded window; keeping the hash-checkable queries first ensures
    each gets a full correctness row, while rows-only ops (MinHash/
    SimHash/ANN — approximate by design, covered by pytest recall
    bounds — plus the real-WAV-decode query, value-pinned by
    closed-form sine tests) take the tail positions where a weaker
    check costs least.
    """
    ordered = sorted(QUERIES.items(), key=lambda kv: kv[0] not in ORACLE)
    QUERIES.clear()
    QUERIES.update(ordered)


__all__ = ["QUERIES", "ORACLE", "register", "load_all"]
