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


# ---------------------------------------------------------------------------
# ExactSubstr scrub vs a brute-force reference (r9: the driver-red area
# gets an oracle that is independent of BOTH engines' SQL dialects)
# ---------------------------------------------------------------------------

def _brute_scrub(docs: list[tuple[int, str]], k: int, min_run: int,
                 max_df: int) -> list[tuple[int, str, int, int]]:
    """Pure-Python reference for operators/dedup.py scrub_shared_spans:
    positioned k-shingles (string equality, no hashing), df-cap, maximal
    same-diagonal runs >= min_run, keep-first interval cut from the
    higher id, merge overlapping/adjacent intervals, token-join clean
    text (untouched docs keep their ORIGINAL text verbatim)."""
    toks = {d: t.split() for d, t in docs}
    sh = {
        d: [" ".join(tk[i:i + k]) for i in range(len(tk) - k + 1)]
        for d, tk in toks.items() if len(tk) >= k
    }
    df_count: dict[str, set] = {}
    for d, ss in sh.items():
        for s in ss:
            df_count.setdefault(s, set()).add(d)
    ok = {s for s, ds in df_count.items() if len(ds) <= max_df}
    intervals: dict[int, list[tuple[int, int]]] = {}
    ids = sorted(sh)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            sa, sb = sh[a], sh[b]
            for diag in range(-(len(sb) - 1), len(sa)):
                run = 0
                for pb in range(len(sb)):
                    pa = pb + diag
                    hit = 0 <= pa < len(sa) and sa[pa] == sb[pb] and sa[pa] in ok
                    if hit:
                        run += 1
                    if (not hit or pb == len(sb) - 1) and run >= min_run:
                        pb0 = (pb if hit else pb - 1) - run + 1
                        intervals.setdefault(b, []).append(
                            (pb0, pb0 + run + k - 2)
                        )
                    if not hit:
                        run = 0
    out = []
    for d, t in docs:
        if d not in intervals:
            out.append((d, t, 0, 0))
            continue
        merged: list[list[int]] = []
        for s, e in sorted(intervals[d]):
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        cut = {i for s, e in merged for i in range(s, e + 1)}
        clean = " ".join(tok for i, tok in enumerate(toks[d]) if i not in cut)
        out.append((d, clean, len(merged), len(cut)))
    return sorted(out)


@st_.composite
def _scrub_corpora(draw):
    """3-6 docs over a tiny alphabet, with a shared span planted into a
    random subset so the scrub path always has work; plus occasional
    empty/short docs for the <k-token edge."""
    words = ["a", "b", "c", "d", "e"]
    n_docs = draw(st_.integers(3, 6))
    span_len = draw(st_.integers(7, 10))
    span = draw(st_.lists(st_.sampled_from(words), min_size=span_len,
                          max_size=span_len))
    docs = []
    for i in range(n_docs):
        body = draw(st_.lists(st_.sampled_from(words), min_size=0, max_size=12))
        if draw(st_.booleans()):
            pos = draw(st_.integers(0, len(body)))
            body = body[:pos] + span + body[pos:]
        docs.append((i * 7 + draw(st_.integers(0, 6)) % 7 + i * 100,
                     " ".join(body)))
    # distinct ids guaranteed by the i*100 stride
    max_df = draw(st_.sampled_from([2, 20]))
    return docs, max_df


@given(corpus=_scrub_corpora())
@settings(max_examples=12, deadline=None)
def test_scrub_shared_spans_matches_bruteforce(spark, corpus):
    """scrub_shared_spans (inverted index + diagonal islands + window
    interval-merge + indexed token filter) must equal the O(n²·len²)
    brute force on small corpora — the dialect-independent oracle for
    the ExactSubstr ACTION semantics (Lee et al. 2107.06499 §4
    keep-first behavior)."""
    from open_data_lakehouse_demo_spark.operators.dedup import scrub_shared_spans

    docs, max_df = corpus
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in scrub_shared_spans(
            sdf, "doc_id", "text", k=4, min_run=4, max_df=max_df
        ).collect()
    )
    assert got == _brute_scrub(docs, k=4, min_run=4, max_df=max_df)


@given(corpus=_scrub_corpora(), mod=st_.integers(2, 4))
@settings(max_examples=8, deadline=None)
def test_incremental_scrub_equals_full_scrub_restricted(spark, corpus, mod):
    """The incremental scrub's equivalence contract, as a property over
    ARBITRARY disjoint splits (not just the query's %10): batch rows of
    scrub_batch_incremental(corpus, batch) == scrub_shared_spans(all)
    restricted to batch ids — keep-first is id-based, so a batch doc's
    partners are the same whichever side they arrived on."""
    from open_data_lakehouse_demo_spark.operators.dedup import (
        scrub_batch_incremental,
        scrub_shared_spans,
    )

    docs, max_df = corpus
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    batch = sdf.filter(f"doc_id % {mod} = 0")
    rest = sdf.filter(f"doc_id % {mod} != 0")
    want = sorted(
        tuple(r) for r in scrub_shared_spans(
            sdf, "doc_id", "text", k=4, min_run=4, max_df=max_df
        ).filter(f"doc_id % {mod} = 0").collect()
    )
    got = sorted(
        tuple(r) for r in scrub_batch_incremental(
            rest, batch, "doc_id", "text", k=4, min_run=4, max_df=max_df
        ).collect()
    )
    assert got == want


def _brute_report(docs: list[tuple[int, str]], k: int, min_run: int,
                  max_df: int) -> list[tuple[int, int, int, int]]:
    """Pure-Python reference for shared_substring_runs: per doc pair,
    the longest same-diagonal run of shared k-shingles (df-capped),
    reported when >= min_run as (doc_a, doc_b, max_run, span_tokens)."""
    toks = {d: t.split() for d, t in docs}
    sh = {
        d: [" ".join(tk[i:i + k]) for i in range(len(tk) - k + 1)]
        for d, tk in toks.items() if len(tk) >= k
    }
    df_count: dict[str, set] = {}
    for d, ss in sh.items():
        for s in ss:
            df_count.setdefault(s, set()).add(d)
    ok = {s for s, ds in df_count.items() if len(ds) <= max_df}
    out = []
    ids = sorted(sh)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            sa, sb = sh[a], sh[b]
            best = 0
            for diag in range(-(len(sb) - 1), len(sa)):
                run = 0
                for pb in range(len(sb)):
                    pa = pb + diag
                    if 0 <= pa < len(sa) and sa[pa] == sb[pb] and sa[pa] in ok:
                        run += 1
                        best = max(best, run)
                    else:
                        run = 0
            if best >= min_run:
                out.append((a, b, best, best + k - 1))
    return sorted(out)


@given(corpus=_scrub_corpora())
@settings(max_examples=10, deadline=None)
def test_shared_substring_runs_matches_bruteforce(spark, corpus):
    """The ExactSubstr REPORT (inverted index + diagonal islands) vs the
    brute force — completes the dialect-independent oracle pair with
    test_scrub_shared_spans_matches_bruteforce (same generated corpora,
    detection side)."""
    from open_data_lakehouse_demo_spark.operators.dedup import (
        shared_substring_runs,
    )

    docs, max_df = corpus
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in shared_substring_runs(
            sdf, "doc_id", "text", k=4, min_run=4, max_df=max_df
        ).collect()
    )
    assert got == _brute_report(docs, k=4, min_run=4, max_df=max_df)
