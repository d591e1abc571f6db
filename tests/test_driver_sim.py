"""Regression tests for tools/driver_sim.py hash fidelity.

Round-2 post-mortem (VERDICT r2 §wrong-2): the sim's ``iterrows()`` coerced a
mixed int64/float64 row to float64 on BOTH sides, so the "TYPE-SENSITIVE"
hash could no longer distinguish a DuckDB HUGEINT (fetched as float64) from
a Spark BIGINT — the sim printed PASS for ``corpus_clean_pipeline`` while
the driver printed FAIL. These tests pin the fixed per-column behavior.
"""

import importlib.util
import pathlib

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "driver_sim", pathlib.Path(__file__).resolve().parents[1] / "tools" / "driver_sim.py"
)
driver_sim = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(driver_sim)


def test_mixed_dtype_frame_fails_against_hugeint_oracle():
    # Spark side: BIGINT count next to a float metric (mixed-dtype row —
    # the exact shape of corpus_clean_pipeline's 1-row summary).
    spark_df = pd.DataFrame(
        {"n_dropped": pd.array([182], dtype="int64"), "avg_q": [0.901758]}
    )
    # Oracle side: DuckDB sum(BIGINT) -> HUGEINT, fetched by pandas as float64.
    oracle_df = pd.DataFrame({"n_dropped": [182.0], "avg_q": [0.901758]})
    sh, _ = driver_sim._canon(spark_df)
    oh, _ = driver_sim._canon(oracle_df)
    assert sh != oh, (
        "type-sensitive hash must distinguish int64 from HUGEINT-as-float64 "
        "even when the row mixes dtypes (iterrows() coercion regression)"
    )


def test_identically_typed_frames_match_regardless_of_row_order():
    a = pd.DataFrame({"k": pd.array([1, 2], dtype="int64"), "v": [1.5, 2.5]})
    b = pd.DataFrame({"v": [2.5, 1.5], "k": pd.array([2, 1], dtype="int64")})
    assert driver_sim._canon(a)[0] == driver_sim._canon(b)[0]


def test_integer_width_is_not_a_mismatch():
    # Calibrated on CORRECTNESS_r02: Spark IntegerType results (row_number,
    # length, size -> int32) were green against DuckDB BIGINT oracles, so
    # the driver's hash is int-FAMILY-sensitive, not int-WIDTH-sensitive.
    a = pd.DataFrame({"rn": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"rn": pd.array([1, 2], dtype="int64")})
    assert driver_sim._canon(a)[0] == driver_sim._canon(b)[0]


def test_array_typed_cells_fail_like_the_driver():
    # Round-5 post-mortem (VERDICT r5 #2): the driver canonicalizes with
    # pandas sort_values over all columns, which raises on array cells
    # (ndarray/list are unhashable in factorize) — f_array_funcs and
    # f_lambda_funcs burned both their r5 window slots on this while the
    # sim stringified the arrays and said PASS. _canon must now raise
    # DriverCanonError on exactly the frames the driver cannot hash.
    import numpy as np
    import pytest

    arr_df = pd.DataFrame(
        {"doc_id": pd.array([1, 2], dtype="int64"),
         "u": [np.array(["a", "b"]), np.array(["c"])]}
    )
    with pytest.raises(driver_sim.DriverCanonError):
        driver_sim._canon(arr_df)
    list_df = pd.DataFrame({"u": [["a", "b"], ["c"]]})
    with pytest.raises(driver_sim.DriverCanonError):
        driver_sim._canon(list_df)
    # ...and the FIXED serialized form (joined strings) must hash fine.
    ok_df = pd.DataFrame(
        {"doc_id": pd.array([1, 2], dtype="int64"), "u": ["a b", "c"]}
    )
    driver_sim._canon(ok_df)


def test_nan_and_none_both_null():
    a = pd.DataFrame({"x": [float("nan")], "s": pd.array([None], dtype=object)})
    b = pd.DataFrame({"x": [float("nan")], "s": pd.array([None], dtype=object)})
    assert driver_sim._canon(a)[0] == driver_sim._canon(b)[0]
    assert "null" == driver_sim._tag(None) == driver_sim._tag(float("nan"))
