"""Normalization for Spark-vs-DuckDB differential comparison.

Mirrors the driver's t2 contract: columns sorted by name,
order-insensitive rows, floats at 6 decimal places, timestamps as naive
microsecond datetimes (FIXTURES.md §5).
"""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds")
    if hasattr(v, "isoformat"):
        try:
            return v.replace(tzinfo=None).isoformat(timespec="microseconds")
        except TypeError:
            return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple((x is not None, x) for x in r))


def assert_frames_match(spark_df, duck_rel, label: str = ""):
    s = canonical_rows(spark_df.toPandas())
    d = canonical_rows(duck_rel.df())
    assert len(s) == len(d), f"{label}: row count {len(s)} != {len(d)}"
    if s != d:
        diff_s = [r for r in s if r not in set(d)][:5]
        diff_d = [r for r in d if r not in set(s)][:5]
        raise AssertionError(
            f"{label}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )
