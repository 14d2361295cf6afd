"""Property-based tests (hypothesis) — SURVEY §5's harness goes beyond the
reference's eyeball checks.

Pure-Python properties (formula-level, hundreds of examples): prefix-filter
safety, bucket arithmetic, LCG ranges. Spark-backed properties (few
examples, deadline off): gap_fill grid/interpolation laws, dedup identity.
"""

from __future__ import annotations

import datetime
import math

import pytest
from hypothesis import given, settings, strategies as st_

from open_data_lakehouse_demo_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)


# ---------------------------------------------------------------------------
# Formula-level properties (no Spark)
# ---------------------------------------------------------------------------

def _prefix_len(n: int, t_pct: int) -> int:
    # mirrors operators/dedup.py prefix_length
    return n - (t_pct * n + 99) // 100 + 1


@given(
    a=st_.sets(st_.integers(0, 500), min_size=1, max_size=60),
    b=st_.sets(st_.integers(0, 500), min_size=1, max_size=60),
    t_pct=st_.integers(50, 95),
)
@settings(max_examples=500)
def test_prefix_filter_never_loses_a_qualifying_pair(a, b, t_pct):
    """The SSJoin prefix theorem, as implemented: J(a,b) ≥ t ⇒ the sorted
    prefixes of a and b intersect."""
    inter = len(a & b)
    union = len(a | b)
    if inter / union >= t_pct / 100:
        pa = set(sorted(a)[: _prefix_len(len(a), t_pct)])
        pb = set(sorted(b)[: _prefix_len(len(b), t_pct)])
        assert pa & pb, (sorted(a), sorted(b), t_pct)


@given(
    ts=st_.datetimes(
        min_value=datetime.datetime(1990, 1, 1),
        max_value=datetime.datetime(2100, 1, 1),
    ),
    bucket=st_.sampled_from([60, 300, 900, 3600, 86400]),
)
@settings(max_examples=300)
def test_bucket_arithmetic_laws(ts, bucket):
    """Wall-clock bucketing (mirrors compat.ntz_epoch_seconds): floor lands
    at-or-before ts, within one bucket, and is idempotent."""
    epoch_day = datetime.date(1970, 1, 1)
    def to_epoch(t):
        return (t.date() - epoch_day).days * 86400 + t.hour * 3600 + t.minute * 60 + t.second
    e = to_epoch(ts)
    floored = e - e % bucket
    assert floored <= e < floored + bucket
    fl_ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=floored)
    assert to_epoch(fl_ts) - to_epoch(fl_ts) % bucket == floored


@given(h=st_.integers(0, 2**32 - 1))
@settings(max_examples=200)
def test_minhash_permutations_stay_in_range_and_injective_inputs(h):
    """Permutation hash outputs stay in [0, P) with no bigint overflow."""
    for a, b in zip(MINHASH_A, MINHASH_B):
        v = (a * h + b) % MINHASH_P
        assert 0 <= v < MINHASH_P
        assert a * h + b < 2**63  # no silent overflow in either engine


@given(
    xs=st_.lists(st_.floats(-1e3, 1e3, allow_nan=False), min_size=2, max_size=64),
)
@settings(max_examples=200)
def test_fold_dot_product_is_deterministic(xs):
    """Left-to-right fold is a pure function of the sequence — the bit-parity
    contract both engines rely on."""
    def fold(vals):
        acc = 0.0
        for v in vals:
            acc = acc + v * v
        return acc
    assert fold(xs) == fold(list(xs))


# ---------------------------------------------------------------------------
# Spark-backed properties (small example counts)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gap_fill_fn():
    from open_data_lakehouse_demo_spark.operators.gapfill import gap_fill

    return gap_fill


@given(
    obs=st_.dictionaries(
        keys=st_.integers(0, 40),  # bucket index
        values=st_.floats(-100, 100, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=10,
    )
)
@settings(max_examples=12, deadline=None)
def test_gap_fill_grid_and_interpolation_laws(spark, gap_fill_fn, obs):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("s", base + datetime.timedelta(minutes=5 * i), float(v))
        for i, v in sorted(obs.items())
    ]
    df = spark.createDataFrame(rows, "series STRING, bucket TIMESTAMP_NTZ, v DOUBLE")
    out = gap_fill_fn(
        df,
        ts_column="bucket",
        bucket_width_seconds=300,
        partitioning_columns=["series"],
        value_columns={"v": "linear"},
    ).collect()
    idx = sorted(obs)
    lo, hi = idx[0], idx[-1]
    got = {
        int((r["bucket"] - base).total_seconds() // 300): r["v"] for r in out
    }
    # law 1: the grid is exactly the closed bucket range
    assert sorted(got) == list(range(lo, hi + 1))
    # law 2: observations survive untouched
    for i, v in obs.items():
        assert got[i] == float(v)
    # law 3: every interpolated value lies within its bracketing endpoints
    for i in range(lo, hi + 1):
        if i in obs:
            continue
        prev_i = max(j for j in idx if j < i)
        next_i = min(j for j in idx if j > i)
        lo_v, hi_v = sorted((obs[prev_i], obs[next_i]))
        assert lo_v - 1e-9 <= got[i] <= hi_v + 1e-9
        # exact linear formula
        frac = (i - prev_i) / (next_i - prev_i)
        expect = obs[prev_i] + (obs[next_i] - obs[prev_i]) * frac
        assert math.isclose(got[i], expect, rel_tol=1e-12, abs_tol=1e-12)


@given(
    texts=st_.lists(
        st_.text(alphabet="abcd ", min_size=8, max_size=40), min_size=2, max_size=5
    )
)
@settings(max_examples=8, deadline=None)
def test_exact_dedup_partitions_docs_completely(spark, texts):
    from open_data_lakehouse_demo_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    groups = exact_dedup(df, "doc_id", "text").collect()
    # total copies conserve the corpus; canonical ids are distinct members
    assert sum(r["n_copies"] for r in groups) == len(texts)
    assert len({r["canonical_id"] for r in groups}) == len(groups)
    assert len(groups) == len(set(texts))


@given(
    edges=st_.lists(
        st_.tuples(st_.integers(0, 24), st_.integers(0, 24)),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    """Pointer-jumping components == a reference union-find on random
    graphs (self-loops and parallel/reversed edges included) — guards the
    iterative loop's early-exit and convergence logic, not just the
    hand-picked chain/island/cycle shapes."""
    from open_data_lakehouse_demo_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(
        edges or [(0, 0)], "doc_a BIGINT, doc_b BIGINT"
    )
    if not edges:
        df = df.filter("doc_a <> doc_a")  # empty frame, schema kept
    got = {
        (r["node"], r["component"]) for r in connected_components(df).collect()
    }

    # reference: path-compressed union-find, min-id canonical labels
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {(n, find(n)) for n in parent}
    assert got == expected
