"""Differential-compare helpers: Spark result vs DuckDB oracle.

Mirrors the driver's t2 check: row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted).
Floats compared exactly first; on failure we report max abs diff so a
tolerance-level regression is visible, but tests require exact equality —
the decimal-sum policy in plans/inventory.py is designed to deliver it.
"""

from __future__ import annotations

import datetime
import math
from typing import Any


def _norm(v: Any) -> Any:
    # NB: deliberately does NOT coerce Decimal→float: a Decimal on one side
    # and a float on the other is a real engine-type mismatch the driver's
    # hash would catch (both engines must emit the same logical type).
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, then rows by value — order-insensitive canon."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda row: tuple((x is None, str(type(x)), str(x)) for x in row))


def assert_matches_oracle(sdf, duck, oracle_sql: str, name: str = "") -> None:
    scols = [f.name for f in sdf.schema.fields]
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.execute(oracle_sql)
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"

    s_can = canonical_rows(scols, srows)
    d_can = canonical_rows(dcols, drows)
    if s_can == d_can:
        return
    n_bad = 0
    msgs = []
    for a, b in zip(s_can, d_can):
        if a != b:
            n_bad += 1
            if len(msgs) < 5:
                msgs.append(f"  spark={a}\n  duck ={b}")
    raise AssertionError(f"{name}: {n_bad} mismatched rows of {len(s_can)}\n" + "\n".join(msgs))
