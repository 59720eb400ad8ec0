"""The local correctness gate (scripts/check_queries.py) must be
hash-STRICT like the driver: a value that is numerically equal but
dtype-drifted (int64 7949 vs float64 7949.0 — the exact artifact that
made `mixture_reweight` fail the driver while passing locally in r04)
must NOT canonicalize to the same form."""
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from check_queries import _fmt, canon  # noqa: E402


def test_fmt_distinguishes_float_from_int():
    assert _fmt(np.int64(7949)) == "7949"
    assert _fmt(np.float64(7949.0)) == "7949.0"
    assert _fmt(7949) != _fmt(7949.0)
    assert _fmt(None) == "NULL"
    assert _fmt(float("nan")) == "NULL"
    assert _fmt(True) == "True"


def test_canon_flags_dtype_drift():
    """An engine int64 column vs an oracle float64 column with equal
    values: the r04 driver hash-mismatched them; canon must too."""
    got = pd.DataFrame({"total_chars": pd.array([7949, 304], dtype="int64")})
    want = pd.DataFrame({"total_chars": pd.array([7949.0, 304.0],
                                                 dtype="float64")})
    assert not canon(got).equals(canon(want))
    # and equal-dtype frames still canonicalize equal across row order
    a = pd.DataFrame({"x": [2, 1], "y": ["b", "a"]})
    b = pd.DataFrame({"x": [1, 2], "y": ["a", "b"]})
    assert canon(a).equals(canon(b))
