"""Checksum validators (≙ TopologyProducer.java:304-340).

Three synchronized implementations of each checksum:

- ``abn_valid`` / ``luhn_valid`` — scalar Python, used by the pure-Python
  oracle (the correctness anchor).
- ``abn_valid_np`` / ``luhn_valid_np`` — vectorized numpy over a string
  array, used in the hot path of the validator stage (digit-matrix tricks
  instead of a per-row Python loop).
- ``ABN_SQL`` / ``LUHN_SQL`` — DuckDB SQL expression templates (``{v}`` is
  the value column), used by the driver-facing oracle_sql().

Faithful reference semantics, including the quirks:

- ABN (TopologyProducer.java:304-317): a *numeric* string of length != 11
  is rejected by the guard; a non-numeric string skips the guard and
  crashes in parseInt → caught by the blanket catch → invalid
  (TopologyProducer.java:275-277). Net: valid iff fullmatch ``[0-9]{11}``
  and weighted sum (weights {10,1,3,5,7,9,11,13,15,17,19}, first digit
  minus 1) % 89 == 0. The empty string throws in parseInt → invalid.
- Luhn (TopologyProducer.java:325-340): standard mod-10 from the right;
  non-digit → exception → invalid; the EMPTY string never enters the loop,
  sum stays 0, 0 % 10 == 0 → **valid** (faithful to the reference loop).
"""

from __future__ import annotations

import re

import numpy as np

ABN_WEIGHTS = np.array([10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19], dtype=np.int64)
_ABN_RE = re.compile(r"[0-9]{11}")
_DIGITS_RE = re.compile(r"[0-9]*")


def abn_valid(value: str) -> bool:
    """Scalar ABN check (oracle path)."""
    if value is None or _ABN_RE.fullmatch(value) is None:
        return False
    digits = np.frombuffer(value.encode("ascii"), dtype=np.uint8).astype(np.int64) - 48
    digits[0] -= 1
    return int((digits * ABN_WEIGHTS).sum()) % 89 == 0


def luhn_valid(value: str) -> bool:
    """Scalar Luhn check (oracle path). Empty string is VALID (see module doc)."""
    if value is None or _DIGITS_RE.fullmatch(value) is None:
        return False
    total = 0
    alternate = False
    for ch in reversed(value):
        n = int(ch)
        if alternate:
            n *= 2
            if n > 9:
                n = (n % 10) + 1
        total += n
        alternate = not alternate
    return total % 10 == 0


def _digit_matrix(values: np.ndarray, length: int) -> np.ndarray:
    """(n, length) int64 digit matrix from an array of equal-length digit strings."""
    joined = "".join(values.tolist())
    return (np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
            .reshape(-1, length).astype(np.int64) - 48)


def abn_valid_np(values: np.ndarray) -> np.ndarray:
    """Vectorized ABN over an object/str array → bool array."""
    values = np.asarray(values, dtype=object)
    ok_shape = np.array([isinstance(v, str) and _ABN_RE.fullmatch(v) is not None
                         for v in values], dtype=bool)
    out = np.zeros(len(values), dtype=bool)
    if ok_shape.any():
        digits = _digit_matrix(values[ok_shape].astype(str), 11)
        digits[:, 0] -= 1
        out[ok_shape] = (digits @ ABN_WEIGHTS) % 89 == 0
    return out


# Luhn doubling map for the alternate digits: n*2, and (n*2 % 10) + 1 when > 9.
_LUHN_DOUBLE = np.array([0, 2, 4, 6, 8, 1, 3, 5, 7, 9], dtype=np.int64)


def luhn_valid_np(values: np.ndarray) -> np.ndarray:
    """Vectorized Luhn: group equal-length digit strings into matrices."""
    values = np.asarray(values, dtype=object)
    out = np.zeros(len(values), dtype=bool)
    is_digits = np.array([isinstance(v, str) and _DIGITS_RE.fullmatch(v) is not None
                          for v in values], dtype=bool)
    lengths = np.array([len(v) if isinstance(v, str) else -1 for v in values])
    out[is_digits & (lengths == 0)] = True  # empty string: sum 0 → valid
    for length in np.unique(lengths[is_digits & (lengths > 0)]):
        mask = is_digits & (lengths == length)
        digits = _digit_matrix(values[mask].astype(str), int(length))
        # alternate=True for digits at distance 1, 3, 5... from the right
        alt = (length - 1 - np.arange(length)) % 2 == 1
        digits[:, alt] = _LUHN_DOUBLE[digits[:, alt]]
        out[mask] = digits.sum(axis=1) % 10 == 0
    return out


# DuckDB SQL equivalents ({v} = value expression). String/list indexing is 1-based.
ABN_SQL = (
    "(CASE WHEN regexp_full_match({v}, '[0-9]{{11}}') THEN "
    "(list_sum(list_transform(range(1, 12), i -> "
    "(CAST(({v})[i] AS INT) - CASE WHEN i = 1 THEN 1 ELSE 0 END) "
    "* ([10,1,3,5,7,9,11,13,15,17,19])[i])) % 89) = 0 "
    "ELSE false END)"
)

LUHN_SQL = (
    "(CASE WHEN regexp_full_match({v}, '[0-9]*') THEN "
    "(COALESCE(list_sum(list_transform(range(1, length({v}) + 1), i -> "
    "CASE WHEN (length({v}) - i) % 2 = 1 THEN "
    "([0,2,4,6,8,1,3,5,7,9])[CAST(({v})[i] AS INT) + 1] "
    "ELSE CAST(({v})[i] AS INT) END)), 0) % 10) = 0 "
    "ELSE false END)"
)
