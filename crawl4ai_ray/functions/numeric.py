"""Numeric helpers for oracle-exact results.

Two classes of float hazards when a distributed engine is hash-compared
against a sequential SQL engine:

  * rounding mode — Python's round() is half-to-even, DuckDB's round() is
    half-away-from-zero (std::round).  Small-integer ratios (154/32 = 4.8125)
    hit exact halves constantly.  ``duck_round`` reproduces DuckDB.
  * summation order — a distributed sum visits the same multiset of doubles
    in a different order than the SQL engine, so the low bits differ and a
    final round() can land on opposite sides of a boundary.  ``cents`` turns
    fixed-decimal values into exact int64 *before* aggregation, making the
    sum order-independent; divide back at the end.
"""

from __future__ import annotations

import numpy as np


def duck_round(x, ndigits: int = 0):
    """Half-away-from-zero rounding (DuckDB / C++ std::round semantics).
    Works on scalars and ndarrays; values may be negative."""
    p = 10.0 ** ndigits
    scaled = np.multiply(x, p)
    return np.where(
        np.greater_equal(scaled, 0), np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
    ) / p if isinstance(x, np.ndarray) else (
        (np.floor(scaled + 0.5) if scaled >= 0 else np.ceil(scaled - 0.5)) / p
    )


def cents(values: np.ndarray, scale: int = 100) -> np.ndarray:
    """Fixed-decimal doubles → exact int64 (order-independent summation)."""
    v = np.asarray(values, dtype=np.float64) * scale
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)
