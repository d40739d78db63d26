"""Checksum unit vectors (FIXTURES.md §4 ≙ TopologyProducer.java:304-340)."""
import numpy as np
import pytest

from lauchy_ray.functions.checksums import (
    abn_valid, abn_valid_np, luhn_valid, luhn_valid_np,
)

ABN_CASES = [
    ("51824753556", True),    # weighted sum mod 89 == 0
    ("51824753557", False),   # bad checksum
    ("5182475355", False),    # wrong length (digit guard, java:306-308)
    ("5182A753556", False),   # non-numeric → exception⇒invalid (java:311, 275-277)
    ("", False),              # parseInt("") throws → invalid
    ("518247535567", False),  # too long
]

LUHN_CASES = [
    ("4539578763621486", True),
    ("4539578763621487", False),
    ("4539x78763621486", False),  # non-numeric → exception⇒invalid
    ("", True),                   # faithful: empty loop, sum 0 % 10 == 0 (java:325-340)
    ("0", True),
    ("1", False),
    ("79927398713", True),        # classic Luhn test number
]


@pytest.mark.parametrize("value,expected", ABN_CASES)
def test_abn_scalar(value, expected):
    assert abn_valid(value) is expected


@pytest.mark.parametrize("value,expected", LUHN_CASES)
def test_luhn_scalar(value, expected):
    assert luhn_valid(value) is expected


def test_abn_vectorized_matches_scalar():
    vals = np.array([v for v, _ in ABN_CASES] + ["12345678901", None], dtype=object)
    got = abn_valid_np(vals)
    want = [abn_valid(v) if v is not None else False for v in vals]
    assert got.tolist() == want


def test_luhn_vectorized_matches_scalar():
    vals = np.array([v for v, _ in LUHN_CASES] + ["1234567890123456", None], dtype=object)
    got = luhn_valid_np(vals)
    want = [luhn_valid(v) if v is not None else False for v in vals]
    assert got.tolist() == want


def test_vectorized_random_agreement():
    rng = np.random.default_rng(7)
    vals = np.array(["".join(str(d) for d in rng.integers(0, 10, size=int(n)))
                     for n in rng.integers(0, 20, size=500)], dtype=object)
    assert abn_valid_np(vals).tolist() == [abn_valid(v) for v in vals]
    assert luhn_valid_np(vals).tolist() == [luhn_valid(v) for v in vals]
