"""Curated-corpus composite pipeline: oracle parity + stage semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle


def test_curated_corpus_oracle_parity(spark, duck):
    q = QUERIES["curated_corpus"]
    assert q.oracle is not None
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, "curated_corpus")


def test_curated_corpus_drops_near_dups(spark):
    out = QUERIES["curated_corpus"].spark(spark, SF_DIR)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    pairs = QUERIES["minhash_lsh_dups"].spark(spark, SF_DIR).collect()
    assert len(pairs) > 0  # fixture actually contains near-dups
    for p in pairs:
        assert p["doc_b"] not in kept  # higher id of every verified pair dropped
    # survivors respect the quality gate
    bad = out.filter((F.col("alpha_ratio") < 0.4) | (F.col("ws_tokens") < 5)).count()
    assert bad == 0
