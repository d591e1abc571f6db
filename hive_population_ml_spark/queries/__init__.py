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
]


def load_all() -> None:
    for m in _MODULES:
        importlib.import_module(f"{__name__}.{m}")


__all__ = ["QUERIES", "ORACLE", "register", "load_all"]
