"""Driver-sim: run registered queries vs their DuckDB oracles the way the
round driver does — vanilla SparkSession, sf0.01 views, order-insensitive
value hash that is TYPE-SENSITIVE (DuckDB HUGEINT vs Spark BIGINT must
mismatch, mirroring CORRECTNESS_r01 behavior).

Usage: python tools/driver_sim.py [query ...]   (no args = all queries)
"""
from __future__ import annotations

import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _tag(v) -> str:
    """Type-tagged canonical string for one cell value.

    Tag granularity mirrors the driver (calibrated on CORRECTNESS_r02):
    integer WIDTH does not matter (Spark int32 `rn` vs DuckDB BIGINT was
    green), but FAMILY does (DuckDB HUGEINT fetches as float64 next to
    Spark's int64 — the corpus_clean_pipeline red). So all ints share one
    tag; floats, bools, and object types (Decimal, str, ...) get their own.
    """
    import numpy as np

    if v is None:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        if v != v:  # NaN
            return "null"
        return f"f:{round(float(v), 9)}"
    try:
        if v != v:  # NaT / NaN-like objects
            return "null"
    except (TypeError, ValueError):
        pass
    # type tag distinguishes Decimal/object from numerics
    return f"{type(v).__name__}:{v}"


class DriverCanonError(RuntimeError):
    """The REAL driver's canonicalizer would error on this frame."""


def _canon(df: pd.DataFrame) -> tuple[str, list[str]]:
    """Order-insensitive, type-sensitive canonical hash of a result.

    Values are read PER-COLUMN (``df[c].iloc[i]``), never via ``iterrows()``:
    iterrows() materializes each row as a Series with one common dtype, so an
    int64 column sitting next to a float64 column is silently coerced to
    float on BOTH the Spark and oracle side — which hides exactly the
    DuckDB-HUGEINT-vs-Spark-BIGINT class this hash exists to catch
    (see CORRECTNESS_r02 `corpus_clean_pipeline`).

    FIDELITY PROBE (r5 lesson — VERDICT r5 #2): the real driver
    canonicalizes with ``df.sort_values(by=<all columns>)``, which raises
    ``TypeError: unhashable type`` on array-typed cells (ndarray/list) —
    that killed `f_array_funcs`/`f_lambda_funcs` in CORRECTNESS_r05 while
    this sim's per-cell tagging happily stringified them and said PASS.
    So before hashing, run the driver's exact call; if it raises, surface
    a DriverCanonError so the sweep FAILS exactly where the driver would.
    """
    import numpy as np

    cols = sorted(df.columns)
    for c in cols:
        s = df[c]
        if s.dtype == object and len(s):
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], (list, np.ndarray)):
                # INTENTIONALLY STRICTER than the driver (ADVICE r6 low):
                # the real driver's sort_values only raises on MULTI-column
                # frames (factorize path); a single-column frame of list
                # cells sorts via direct comparison and would hash. This
                # sim still rejects ANY array-typed column because the
                # repo convention is scalar result columns everywhere —
                # list-vs-ndarray stringification differs between the
                # Spark (toPandas → ndarray) and DuckDB (list) sides, so
                # an array column that happens to sort is still a hash
                # hazard. Serialize to a joined string on both engines.
                raise DriverCanonError(
                    f"array-typed result column {c!r}: repo convention is "
                    "scalar result columns (stricter than the driver on "
                    "single-column frames, by design) — serialize to a "
                    "joined string (array_join / array_to_string) on both "
                    "engines"
                )
    try:
        df.sort_values(by=cols)
    except Exception as ex:  # noqa: BLE001 — mirror ANY driver-side error
        raise DriverCanonError(
            f"driver canonicalizer (pandas sort_values) would fail: "
            f"{type(ex).__name__}: {ex}"
        ) from ex
    series = [df[c] for c in cols]
    cells = []
    for i in range(len(df)):
        cells.append("|".join(_tag(s.iloc[i]) for s in series))
    cells.sort()
    h = hashlib.md5("\n".join(cells).encode()).hexdigest()
    return h, cols


def main(names: list[str]) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    # Shadow oracles (queries past the driver's 50-entry window) carry
    # the same DuckDB-differential contract — the driver sees them as
    # rows-only, but this sim hash-checks them identically ("PASS*").
    from hive_population_ml_spark.queries.registry import SHADOW_ORACLE

    shadow = set(SHADOW_ORACLE) - set(osql)
    osql = {**SHADOW_ORACLE, **osql}
    targets = names or list(qs)
    failures = 0
    if not names:  # full sweep: also smoke-check entry() like the driver
        n_entry = len(e.entry(spark).collect())
        print(f"entry(): {n_entry} rows" + (" EMPTY!" if n_entry == 0 else ""))
        if n_entry == 0:
            failures += 1
    for name in targets:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failures += 1
            continue
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {ex}")
            failures += 1
            continue
        if name not in osql:
            print(f"{name}: rows-only ({len(sdf)} rows)"
                  + (" EMPTY!" if len(sdf) == 0 else ""))
            if len(sdf) == 0:
                failures += 1
            continue
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {ex}")
            failures += 1
            continue
        try:
            sh, scols = _canon(sdf)
            oh, ocols = _canon(odf)
        except DriverCanonError as ex:
            print(f"{name}: DRIVER-CANON FAIL {ex}")
            failures += 1
            continue
        ok = sh == oh and scols == ocols and len(sdf) == len(odf)
        status = ("PASS*" if name in shadow else "PASS") if ok else "FAIL"
        detail = ""
        if not ok:
            failures += 1
            if scols != ocols:
                detail = f" cols spark={scols} oracle={ocols}"
            elif len(sdf) != len(odf):
                detail = f" rows spark={len(sdf)} oracle={len(odf)}"
            else:
                detail = " hash mismatch"
                # show dtype diff to speed diagnosis
                sd = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
                od = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
                if sd != od:
                    detail += f" dtypes spark={sd} oracle={od}"
        print(f"{name}: {status} ({len(sdf)} rows){detail}")
    print(json.dumps({"checked": len(targets), "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
