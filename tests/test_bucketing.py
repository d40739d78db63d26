"""key_bucket edge cases: dtype stability and null-key routing (one null
conv_id anywhere in the corpus must not crash the shuffle)."""

import numpy as np
import pandas as pd
import pytest

from lauchy_ray.stages.bucketing import key_bucket


def test_int_float_presentations_agree():
    ints = np.array([5, 70, 135, 200], dtype=np.int64)
    floats = ints.astype(np.float64)
    assert np.array_equal(key_bucket(ints, 64), key_bucket(floats, 64))


def test_nan_keys_route_to_bucket_zero():
    vals = np.array([1.0, np.nan, 65.0, np.nan], dtype=np.float64)
    out = key_bucket(vals, 64)
    assert out.tolist() == [1, 0, 1, 0]


def test_none_string_keys_route_to_bucket_zero():
    vals = np.array(["c1", None, "c2", None], dtype=object)
    out = key_bucket(vals, 64)
    assert out[1] == 0 and out[3] == 0
    # non-null keys keep their deterministic crc32 buckets
    ref = key_bucket(np.array(["c1", "c2"], dtype=object), 64)
    assert out[0] == ref[0] and out[2] == ref[1]


def test_pd_na_object_keys():
    s = pd.array([1, None, 3], dtype="Int64")
    out = key_bucket(np.asarray(s, dtype=object), 64)
    assert out.tolist() == [1, 0, 3]


def test_non_integral_float_still_raises():
    with pytest.raises(TypeError):
        key_bucket(np.array([1.5, 2.0]), 64)
