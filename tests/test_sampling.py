"""Deterministic weighted sampling (operators/sampling.py) — the
Efraimidis-Spirakis exponential-key sampler with hash-derived uniforms."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.operators import sampling as sp
from open_data_lakehouse_demo_spark.sources.io import read_parquet

SF_DIR = "/root/testdata/sf0.01"


def test_deterministic_and_exact_k(spark):
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("w")
    )
    a = sp.weighted_sample(docs, "doc_id", "w", 50, salt="s1")
    b = sp.weighted_sample(docs, "doc_id", "w", 50, salt="s1")
    ra = sorted(r["doc_id"] for r in a.collect())
    rb = sorted(r["doc_id"] for r in b.collect())
    assert ra == rb and len(ra) == 50  # reproducible, exactly k
    c = sorted(r["doc_id"] for r in sp.weighted_sample(docs, "doc_id", "w", 50, salt="s2").collect())
    assert c != ra  # a new salt is an independent redraw


def test_matches_driver_side_reference(spark):
    """The distributed sampler must pick exactly the rows a plain Python
    implementation of ln(u)/w top-k picks from the same hash uniforms."""
    import hashlib

    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("w")
    )
    rows = [(r["doc_id"], r["w"]) for r in docs.collect()]

    def u(salt, i):
        h = int(hashlib.md5(f"{salt}#{i}".encode()).hexdigest()[:8], 16)
        return (h + 1) / float(1 << 32)

    keys = sorted(
        ((math.log(u("s1", i)) / w, -i) for i, w in rows if w > 0), reverse=True
    )
    want = sorted(-neg_i for _, neg_i in keys[:50])
    got = sorted(r["doc_id"] for r in sp.weighted_sample(docs, "doc_id", "w", 50, salt="s1").collect())
    assert got == want


def test_weight_proportional_inclusion(spark):
    """Across many independent redraws, a row with 9x the weight must be
    included ~9x as often (loose band — statistical sanity, seeded)."""
    df = spark.createDataFrame(
        [(i, 9.0 if i < 50 else 1.0) for i in range(500)], ["id", "w"]
    )
    heavy = light = 0
    for t in range(30):
        picked = {
            r["id"] for r in sp.weighted_sample(df, "id", "w", 50, salt=f"t{t}").collect()
        }
        heavy += sum(1 for i in picked if i < 50)
        light += sum(1 for i in picked if i >= 50)
    # E[heavy pick] per draw: 9x odds per unit; heavy pool is 50 ids at
    # w=9 vs 450 at w=1 → heavy share ≈ 450/(450+450) = 0.5 of 50 picks
    share = heavy / (heavy + light)
    assert 0.35 < share < 0.65, share


def test_grouped_sampling_and_zero_weights(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], float(i % 7)) for i in range(200)],
        ["id", "grp", "w"],
    )
    out = sp.weighted_sample(df, "id", "w", 10, by=["grp"]).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert set(by_grp) == {"a", "b"}
    assert all(len(v) == 10 for v in by_grp.values())
    # zero-weight rows (w == 0 when i % 7 == 0) can never be sampled
    assert all(r["w"] > 0 for r in out)


def test_global_topk_plans_as_take_ordered(spark):
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("w")
    )
    plan = sp.weighted_sample(docs, "doc_id", "w", 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no full global sort
