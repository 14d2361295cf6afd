"""Canonical row hashing shared by the oracle-compare tools.

ONE implementation of the driver-gate canonicalization (float %.10g,
NULL sentinel, nested lists, column-name sort, order-insensitive line
sort) imported by both tools/driver_sim.py and tools/check_query.py —
a precision tweak applied to one copy can no longer desynchronize the
two gates.
"""

from __future__ import annotations

import hashlib


def canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def hash_rows(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]
