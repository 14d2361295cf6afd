"""Similarity operator tests: known-answer numpy cross-check + oracle parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.operators import similarity as sim
from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, sim.DIM)).astype(np.float32)
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=sim.DIM).astype(np.float32)  # near-dup of 0
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    return df, vecs.astype(np.float64)


def _numpy_topk(vecs: np.ndarray, probe_ids, k: int):
    Vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = Vn @ Vn.T
    out = {}
    for q in probe_ids:
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-S[q, i], i),
        )
        out[q] = order[:k]
    return out


def test_brute_force_matches_numpy(emb_df):
    df, vecs = emb_df
    probes = df.filter(F.col("vec_id") < 3)
    got = sim.brute_force_topk(df, probes, k=4).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], -r["cosine"], r["neighbor_id"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    expected = _numpy_topk(vecs, [0, 1, 2], 4)
    assert by_q == expected
    assert by_q[0][0] == 1  # the planted near-dup is rank-1


def test_ivf_recall_at_least_half(emb_df):
    """nprobe=2 of 8 lists on random data: exact rank-1 must mostly survive."""
    df, vecs = emb_df
    got = sim.ivf_topk(
        df, k=4, n_centroids=8, nprobe=2, probe_filter=F.col("vid") < 10
    ).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], -r["cosine"], r["neighbor_id"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    exact = _numpy_topk(vecs, range(10), 1)
    hits = sum(1 for q in range(10) if q in by_q and exact[q][0] in by_q[q])
    assert hits >= 5
    assert by_q[0][0] == 1  # near-identical pair lands in the same list


def test_lsh_near_dup_finds_planted_pair(emb_df):
    df, _ = emb_df
    pairs = {(r["vec_a"], r["vec_b"]) for r in sim.lsh_near_dup_pairs(df, threshold=0.9).collect()}
    assert (0, 1) in pairs


@pytest.mark.parametrize(
    "name", ["cosine_topk_bruteforce", "cosine_topk_ivf", "embedding_near_dup_lsh"]
)
def test_similarity_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    assert q.oracle is not None
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, name)
