"""Property tests for the differential harness itself (testing.py).

The harness is the local stand-in for the external verifier's hash
check — if ITS normalization were order- or representation-sensitive,
a green gate would mean nothing. These pin the invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ravelytics_spark.testing import _dtype_class, _norm_cell, _normalize

cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
)


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(st.tuples(cell, cell, cell), max_size=30),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_normalize_is_row_order_invariant(rows, seed):
    df = pd.DataFrame(rows, columns=["b", "a", "c"])
    rng = np.random.default_rng(seed)
    shuffled = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    assert _normalize(df) == _normalize(shuffled)


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(st.tuples(cell, cell), max_size=20))
def test_normalize_is_column_order_invariant(rows):
    df = pd.DataFrame(rows, columns=["y", "x"])
    assert _normalize(df) == _normalize(df[["x", "y"]])


@settings(max_examples=200, deadline=None)
@given(v=cell)
def test_norm_cell_idempotent(v):
    once = _norm_cell(v)
    assert _norm_cell(once) == once


def test_dtype_class_flags_the_x9_pivot_drift():
    """The exact round-2 failure mode: same values, int64 vs float64."""
    ints = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    floats = pd.DataFrame({"n": pd.array([1.0, 2.0], dtype="float64")})
    assert _dtype_class(ints, "n") == "int"
    assert _dtype_class(floats, "n") == "float"
    assert _dtype_class(ints, "n") != _dtype_class(floats, "n")
    # but the VALUES compare equal in Python — which is why the class
    # check exists at all
    assert _normalize(ints)[1] == _normalize(floats)[1]


def test_dtype_class_object_column_classification():
    df = pd.DataFrame(
        {
            "s": pd.Series([None, "x"], dtype="object"),
            "i": pd.Series([None, 3], dtype="object"),
            "f": pd.Series([None, 3.5], dtype="object"),
            "b": pd.Series([None, b"z"], dtype="object"),
            "seq": pd.Series([None, [1, 2]], dtype="object"),
            "empty": pd.Series([None, None], dtype="object"),
        }
    )
    assert _dtype_class(df, "s") == "str"
    assert _dtype_class(df, "i") == "int"
    assert _dtype_class(df, "f") == "float"
    assert _dtype_class(df, "b") == "bytes"
    assert _dtype_class(df, "seq") == "seq"
    assert _dtype_class(df, "empty") == "any"
