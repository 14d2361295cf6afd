"""Dedup operator tests: known-answer unit cases + DuckDB oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.operators import dedup
from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river edge"),  # near dup of 1
    (4, "completely different content about spark shuffle partitions and joins"),
    (5, "another unrelated document mentioning adaptive query execution only"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups(docs_df):
    rows = {r["canonical_id"]: r["n_copies"] for r in dedup.exact_dedup(docs_df, "doc_id", "text").collect()}
    assert rows[1] == 2  # docs 1+2 collapse
    assert rows[3] == 1 and rows[4] == 1 and rows[5] == 1


def test_ngram_jaccard_finds_near_dup(docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, "doc_id", "text", threshold_pct=50).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_minhash_lsh_finds_near_dup(docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(docs_df, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (4, 5) not in pairs


def test_simhash_identical_docs_distance_zero(docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs_df, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (4, 5) not in pairs


@pytest.mark.parametrize(
    "name", ["exact_dedup_docs", "ngram_jaccard_dups", "minhash_lsh_dups", "simhash_dups"]
)
def test_dedup_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    assert q.oracle is not None
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, name)


def test_connected_components_chain_and_islands(spark):
    """Label propagation resolves transitive chains, separate islands, and
    cycles to min-id components."""
    from open_data_lakehouse_demo_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4, island pair 10-11, triangle 20-21-22
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a BIGINT, doc_b BIGINT",
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_shared_substring_runs_planted_span(spark):
    """A planted 10-token exact span between otherwise-different docs must
    yield max_run = 10-k+1 consecutive shared k-shingles; unrelated docs
    must not pair."""
    from open_data_lakehouse_demo_spark.operators.dedup import shared_substring_runs

    span = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + span + " delta epsilon"),
            (2, "zeta eta " + span + " theta iota kappa"),
            (3, "completely different words nothing shared here at all"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = shared_substring_runs(docs, "doc_id", "text", k=4, min_run=4).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["max_run"] == 10 - 4 + 1  # 7 consecutive shared 4-shingles
    assert r["span_tokens"] == 10


def test_shared_substring_runs_matches_lcs_dp(spark):
    """Independent cross-check: on random small-vocab docs (uncapped df),
    span_tokens per pair must equal the true longest common token
    substring computed by classic DP — the relational diagonal-islands
    plan and the quadratic reference must agree exactly."""
    import numpy as np

    from open_data_lakehouse_demo_spark.operators.dedup import shared_substring_runs

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(8)]
    docs_py = [
        [vocab[j] for j in rng.integers(0, len(vocab), size=rng.integers(10, 41))]
        for _ in range(12)
    ]
    k = 3

    def lcs_tokens(a, b):  # longest common substring (tokens), O(n*m) DP
        best = 0
        prev = [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    expected = {}
    for i in range(len(docs_py)):
        for j in range(i + 1, len(docs_py)):
            l = lcs_tokens(docs_py[i], docs_py[j])
            if l >= k:  # pairs below the shingle width can't appear
                expected[(i, j)] = l

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs_py)],
        "doc_id BIGINT, text STRING",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["span_tokens"]
        for r in shared_substring_runs(
            df, "doc_id", "text", k=k, min_run=1, max_df=10**6
        ).collect()
    }
    assert got == expected


def test_incremental_minhash_equals_full_restricted(spark):
    """Incremental (batch vs indexed corpus) must equal the full-corpus
    pair set restricted to pairs touching the batch — the exact
    equivalence contract of continuous-ingestion dedup."""
    from open_data_lakehouse_demo_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for i in range(12):
        # clusters of near-identical docs spanning the batch boundary
        text = base + f" tail{i % 4}"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    old = docs.filter(F.col("doc_id") % 3 != 0)
    incr = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs_incremental(
            old, batch, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
        if r["doc_a"] % 3 == 0 or r["doc_b"] % 3 == 0
    }
    assert incr == full and len(incr) > 0


def test_canonical_per_component_keep_best_and_ties(spark):
    """Each cluster keeps its max-score member; score ties resolve to the
    LOWEST id (total, engine-portable order)."""
    from open_data_lakehouse_demo_spark.operators.dedup import canonical_per_component

    comps = spark.createDataFrame(
        # cluster 1: clear winner (node 3); cluster 10: tie between 10, 11
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "node BIGINT, component BIGINT",
    )
    scored = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 12), (10, 7), (11, 7)],
        "doc_id BIGINT, score BIGINT",
    )
    rows = {
        r["doc_id"]: (r["canonical_doc"], r["is_canonical"])
        for r in canonical_per_component(comps, scored, "doc_id", "score").collect()
    }
    assert rows == {
        1: (3, False), 2: (3, False), 3: (3, True),
        10: (10, True), 11: (10, False),  # tie -> lowest id
    }


def test_containment_dups_oracle_parity(spark, duck):
    from tests.oracle_utils import assert_matches_oracle

    q = QUERIES["containment_dups"]
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, "containment_dups")


def test_containment_catches_planted_subset_dup(spark):
    """A short doc fully quoted inside a much longer one: Jaccard stays
    tiny (size ratio) but containment fires — the asymmetric class."""
    from open_data_lakehouse_demo_spark.operators.dedup import containment_pairs

    snippet = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i}" for i in range(200))
    rows = [
        (1, snippet),
        (2, filler + " " + snippet + " " + filler),
        (3, "totally different words here " + " ".join(f"x{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): r for r in containment_pairs(df, "doc_id", "text").collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["containment_a"] == 1.0  # snippet fully contained
    assert r["jaccard"] < 0.1  # Jaccard would never flag it
    assert (1, 3) not in got and (2, 3) not in got


def test_scrub_shared_spans_removes_exactly_the_span(spark):
    """ExactSubstr ACTION: the planted span must be cut from the
    HIGHER-id doc only (keep-first), the surrounding text must survive
    verbatim, untouched docs pass through, and n_tokens_removed equals
    the span length."""
    from open_data_lakehouse_demo_spark.operators.dedup import scrub_shared_spans

    span = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + span + " delta epsilon"),
            (2, "zeta eta " + span + " theta iota kappa"),
            (3, "completely different words nothing shared here at all"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r["doc_id"]: r for r in scrub_shared_spans(docs, "doc_id", "text", k=4, min_run=4).collect()}
    assert set(got) == {1, 2, 3}
    # keep-first: doc 1 (lower id) keeps its copy, doc 3 untouched
    assert got[1]["clean_text"] == "alpha beta gamma " + span + " delta epsilon"
    assert got[1]["n_spans"] == 0 and got[1]["n_tokens_removed"] == 0
    assert got[3]["n_spans"] == 0
    # doc 2 loses exactly the 10 span tokens, neighbors intact
    assert got[2]["clean_text"] == "zeta eta theta iota kappa"
    assert got[2]["n_spans"] == 1 and got[2]["n_tokens_removed"] == 10


def test_scrub_shared_spans_merges_overlapping_intervals(spark):
    """A doc duplicating spans from TWO partners with overlapping
    extents must scrub the merged interval once (n_spans counts merged
    intervals, tokens are never double-counted)."""
    from open_data_lakehouse_demo_spark.operators.dedup import scrub_shared_spans

    s = [f"w{i}" for i in range(14)]
    doc3 = "pre " + " ".join(s) + " post"
    docs = spark.createDataFrame(
        [
            (1, "one filler " + " ".join(s[:9]) + " more filler stuff"),
            (2, "other junk " + " ".join(s[5:]) + " trailing bits here"),
            (3, doc3),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r["doc_id"]: r for r in scrub_shared_spans(docs, "doc_id", "text", k=4, min_run=4).collect()}
    # doc 3 shares s[0:9] with doc 1 and s[5:14] with doc 2 — overlapping
    # intervals merge into one covering all 14 tokens
    assert got[3]["n_spans"] == 1
    assert got[3]["n_tokens_removed"] == 14
    assert got[3]["clean_text"] == "pre post"
    assert got[1]["n_tokens_removed"] == 0 and got[2]["n_tokens_removed"] == 0


def test_shared_index_param_matches_internal_build(spark):
    """r8: report and scrub accept a caller-owned positioned_hash_index
    (the sharing that lets one materialized pass feed both, and that
    inventory_corpus caches per session). Passing the shared index must
    be result-identical to each path building its own."""
    from open_data_lakehouse_demo_spark.operators.dedup import (
        positioned_hash_index,
        scrub_shared_spans,
        shared_substring_runs,
    )

    span = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + span + " delta epsilon"),
            (2, "zeta eta " + span + " theta iota kappa"),
            (3, "one more " + span + " trailing words here"),
            (4, "completely different words nothing shared here at all"),
        ],
        "doc_id BIGINT, text STRING",
    )
    idx = positioned_hash_index(docs, "doc_id", "text", k=4, max_df=20)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    own = shared_substring_runs(docs, "doc_id", "text", k=4, min_run=4)
    shared = shared_substring_runs(docs, "doc_id", "text", k=4, min_run=4, index=idx)
    assert rows(own) == rows(shared) and shared.count() == 3  # pairs (1,2)(1,3)(2,3)

    own_s = scrub_shared_spans(docs, "doc_id", "text", k=4, min_run=4)
    shared_s = scrub_shared_spans(docs, "doc_id", "text", k=4, min_run=4, index=idx)
    assert rows(own_s) == rows(shared_s)
    # keep-first: doc 1 keeps its copy, docs 2 and 3 lose the span
    by_id = {r["doc_id"]: r for r in shared_s.collect()}
    assert by_id[1]["n_spans"] == 0 and by_id[2]["n_spans"] == 1
    assert by_id[3]["n_spans"] == 1 and by_id[4]["n_spans"] == 0


def test_incremental_scrub_matches_full_scrub_on_batch(spark):
    """scrub_batch_incremental's equivalence contract: output rows are
    identical to the full-corpus scrub restricted to batch docs (keep-
    first is id-based, so partner provenance — index vs full corpus —
    cannot change a batch doc's merged intervals)."""
    from open_data_lakehouse_demo_spark.operators.dedup import (
        scrub_batch_incremental,
        scrub_shared_spans,
    )

    span = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, "alpha beta gamma " + span + " delta epsilon"),       # corpus
        (2, "zeta eta " + span + " theta iota kappa"),            # corpus dup
        (3, "completely different words nothing shared here ok"),  # corpus
        (10, "new doc one " + span + " trailing tokens here now"),  # batch dup
        (11, "fresh unrelated material with no overlap at all"),   # batch
        (12, "two copies " + span + " and " + span + " again yes"),  # batch 2 spans
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    batch = docs.filter("doc_id >= 10")
    corpus = docs.filter("doc_id < 10")

    incr = scrub_batch_incremental(corpus, batch, "doc_id", "text", k=4, min_run=4)
    full = scrub_shared_spans(docs, "doc_id", "text", k=4, min_run=4).filter(
        "doc_id >= 10"
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(incr) == key(full)
    by_id = {r["doc_id"]: r for r in incr.collect()}
    assert set(by_id) == {10, 11, 12}  # batch rows only, all of them
    assert by_id[10]["n_spans"] == 1 and by_id[10]["n_tokens_removed"] == 10
    assert by_id[11]["n_spans"] == 0
    assert by_id[12]["n_spans"] >= 1 and "s0" not in by_id[12]["clean_text"]


def test_incremental_scrub_leaves_corpus_out_and_uses_batch_partners(spark):
    """Batch docs also scrub against EACH OTHER (the union is the partner
    side): a span shared only within the batch is still cut from the
    higher-id batch doc, and no corpus doc ever appears in the output."""
    from open_data_lakehouse_demo_spark.operators.dedup import (
        scrub_batch_incremental,
    )

    span = " ".join(f"b{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (1, "corpus text with nothing shared anywhere at all"),
            (20, "first batch doc " + span + " tail words"),
            (21, "second batch doc " + span + " other tail"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = scrub_batch_incremental(
        docs.filter("doc_id < 10"), docs.filter("doc_id >= 10"),
        "doc_id", "text", k=4, min_run=4,
    )
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert set(by_id) == {20, 21}
    assert by_id[20]["n_spans"] == 0  # lower id keeps its copy
    assert by_id[21]["n_spans"] == 1 and "b0" not in by_id[21]["clean_text"]


def test_logged_substr_index_scrub_order_independent(spark, tmp_path):
    """Snapshot-versioned ExactSubstr index (build/append/scrub_logged):
    scrubbing a batch gives the same rows as scrub_batch_incremental
    whether it runs BEFORE or AFTER the batch is appended to the index
    (fresh batch hashes + anti-join dedupe), an idempotent-txn re-append
    is a no-op, and a scrub pinned to the pre-append snapshot still
    sees the same corpus partners."""
    from open_data_lakehouse_demo_spark.operators import dedup
    from open_data_lakehouse_demo_spark.sources import table_log as tl

    span = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + span + " delta epsilon"),
            (2, "plain corpus text with no shared overlap at all"),
            (10, "new doc one " + span + " trailing tokens here now"),
            (11, "fresh unrelated material with no overlap anywhere"),
        ],
        "doc_id BIGINT, text STRING",
    )
    corpus = docs.filter("doc_id < 10")
    batch = docs.filter("doc_id >= 10")
    path = str(tmp_path / "substr_idx")

    assert dedup.build_substr_index_logged(corpus, path) == 0
    want = sorted(
        tuple(r)
        for r in dedup.scrub_batch_incremental(
            corpus, batch, "doc_id", "text", k=4, min_run=4
        ).collect()
    )

    # scrub BEFORE append
    got_pre = sorted(
        tuple(r)
        for r in dedup.scrub_batch_logged(spark, path, batch, k=4, min_run=4).collect()
    )
    assert got_pre == want

    # append (exactly-once txn), then scrub AFTER — identical
    s1 = dedup.append_substr_index_logged(spark, path, batch, txn=("ingest", 1))
    assert s1 == 1
    assert dedup.append_substr_index_logged(spark, path, batch, txn=("ingest", 1)) == 1
    got_post = sorted(
        tuple(r)
        for r in dedup.scrub_batch_logged(spark, path, batch, k=4, min_run=4).collect()
    )
    assert got_post == want

    # time travel: pin the pre-append snapshot — same partners, same rows
    got_pinned = sorted(
        tuple(r)
        for r in dedup.scrub_batch_logged(
            spark, path, batch, k=4, min_run=4, snapshot=0
        ).collect()
    )
    assert got_pinned == want
    # the appended index serves a SECOND batch against corpus ∪ batch1
    batch2 = spark.createDataFrame(
        [(20, "second wave " + span + " more words after")],
        "doc_id BIGINT, text STRING",
    )
    got2 = {r["doc_id"]: r for r in dedup.scrub_batch_logged(
        spark, path, batch2, k=4, min_run=4
    ).collect()}
    assert got2[20]["n_spans"] == 1 and "s0" not in got2[20]["clean_text"]


def _minhash_cluster_docs(spark):
    """12 docs in near-identical clusters spanning the batch boundary
    (same shape as test_incremental_minhash_equals_full_restricted)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base + f" tail{i % 4}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    return docs, docs.filter(F.col("doc_id") % 3 != 0), docs.filter(F.col("doc_id") % 3 == 0)


def test_logged_minhash_index_order_independent_and_exactly_once(spark, tmp_path):
    """Snapshot-versioned MinHash index (build/append/near_dups_batch
    _logged — the persisted form minhash_lsh_pairs_incremental's
    docstring promises, as tested code): querying a batch gives the same
    pairs as the in-session incremental path whether it runs BEFORE or
    AFTER the batch is appended; a replayed two-table txn append is a
    no-op on both tables; and a snapshot pin time-travels the index."""
    from open_data_lakehouse_demo_spark.operators import dedup
    from open_data_lakehouse_demo_spark.sources import table_log as tl

    docs, old, batch = _minhash_cluster_docs(spark)
    path = str(tmp_path / "mh_idx")
    assert dedup.build_minhash_index_logged(old, path) == 0

    want = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in dedup.minhash_lsh_pairs_incremental(
            old, batch, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    )
    assert want  # clusters guarantee pairs

    def got(**kw):
        return sorted(
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in dedup.near_dups_batch_logged(
                spark, path, batch, threshold=0.8, **kw
            ).collect()
        )

    assert got() == want  # query BEFORE append

    s1 = dedup.append_minhash_index_logged(spark, path, batch, txn=("ingest", 1))
    assert s1 == 1
    # replay: no-op on BOTH tables (per-table idempotent txn)
    assert dedup.append_minhash_index_logged(spark, path, batch, txn=("ingest", 1)) == 1
    assert len(tl._list_snapshots(f"{path}/sets")) == 2
    assert len(tl._list_snapshots(f"{path}/bands")) == 2

    assert got() == want          # query AFTER append (anti-join dedupe)
    assert got(snapshot=0) == want  # pinned pre-append snapshot

    # the appended index serves a SECOND batch against corpus ∪ batch1:
    # doc 20 joins the tail0 cluster, whose members span old AND batch1
    docs2 = spark.createDataFrame(
        [(20, "the quick brown fox jumps over the lazy dog again and again today tail0"),
         (21, "nothing like the others at all in any way whatsoever")],
        "doc_id BIGINT, text STRING",
    )
    pairs2 = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dups_batch_logged(spark, path, docs2).collect()
    }
    tail0 = {0, 4, 8}  # doc_id % 4 == 0 → the tail0 cluster
    assert {(a, 20) for a in tail0} <= pairs2
    assert all(b == 20 or a == 20 for a, b in pairs2)  # only batch-touching pairs
    assert not any(21 in p for p in pairs2)


def test_logged_minhash_index_survives_compact_and_vacuum(spark, tmp_path):
    """Index maintenance loop: after several appends, compact + vacuum
    on BOTH tables must leave near-dup queries byte-identical — this
    also exercises compact/schema-union/vacuum over an ARRAY column
    (sets.sh), a path the scalar-table table_log tests never touch
    (array columns carry no manifest stats, so every file must stay a
    may-match candidate rather than being wrongly pruned)."""
    from open_data_lakehouse_demo_spark.operators import dedup
    from open_data_lakehouse_demo_spark.sources import table_log as tl

    docs, old, batch = _minhash_cluster_docs(spark)
    path = str(tmp_path / "mh_idx")
    dedup.build_minhash_index_logged(old, path)
    for j in range(3):
        dedup.append_minhash_index_logged(
            spark, path,
            batch.withColumn("doc_id", F.col("doc_id") + 100 * (j + 1)),
        )
    want = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in dedup.near_dups_batch_logged(spark, path, batch).collect()
    )
    assert want
    for t in ("sets", "bands"):
        tl.compact(spark, f"{path}/{t}")
        tl.vacuum(spark, f"{path}/{t}", keep_last=1)
    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in dedup.near_dups_batch_logged(spark, path, batch).collect()
    )
    assert got == want


def test_logged_minhash_append_heals_partial_two_table_commit(spark, tmp_path):
    """Crash between the sets commit and the bands commit: replaying the
    SAME txn append must skip the already-committed sets table and land
    the bands append — the per-table idempotency that makes the
    two-table protocol exactly-once. Until healed, the batch is simply
    absent from candidate generation (bands drive candidates), never a
    wrong answer."""
    from open_data_lakehouse_demo_spark.operators import dedup
    from open_data_lakehouse_demo_spark.operators.dedup import _doc_shingle_sets
    from open_data_lakehouse_demo_spark.sources import table_log as tl

    docs, old, batch = _minhash_cluster_docs(spark)
    path = str(tmp_path / "mh_idx")
    dedup.build_minhash_index_logged(old, path)

    # simulate the crash: ONLY the sets half of the txn landed
    tl.append(spark, f"{path}/sets",
              _doc_shingle_sets(batch, "doc_id", "text", 3), txn=("ingest", 1))
    assert len(tl._list_snapshots(f"{path}/sets")) == 2
    assert len(tl._list_snapshots(f"{path}/bands")) == 1

    # a query between crash and heal: batch docs aren't index candidates
    # yet, but querying THEM as the probe batch still works (fresh-side
    # bands + anti-join dedupe) and equals the incremental contract
    want = sorted(
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs_incremental(
            old, batch, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    )
    mid = sorted(
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dups_batch_logged(spark, path, batch).collect()
    )
    assert mid == want

    # heal: same txn, same call — sets skipped, bands lands
    assert dedup.append_minhash_index_logged(spark, path, batch, txn=("ingest", 1)) == 1
    assert len(tl._list_snapshots(f"{path}/sets")) == 2
    assert len(tl._list_snapshots(f"{path}/bands")) == 2
    # no duplicated sets rows (the skip really skipped)
    n_batch = batch.count()
    assert tl.read(spark, f"{path}/sets").count() == old.count() + n_batch
    assert tl.read(spark, f"{path}/bands").filter(
        F.col("doc") % 3 == 0
    ).select("doc").distinct().count() == n_batch


def test_dedup_operators_on_empty_corpus(spark):
    """Degenerate-input hardening (r9): every dedup operator must run on
    a 0-row corpus and return 0 rows — no window/aggregate/explode path
    may require at least one row (the first micro-batch of a fresh
    ingest stream and a filtered-out partition both present exactly
    this shape)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    ops = [
        dedup.exact_dedup(empty, "doc_id", "text"),
        dedup.ngram_jaccard_pairs(empty, "doc_id", "text"),
        dedup.simhash60(empty, "doc_id", "text"),
        dedup.shared_substring_runs(empty, "doc_id", "text"),
        dedup.scrub_shared_spans(empty, "doc_id", "text"),
        dedup.shared_span_intervals(empty, "doc_id", "text"),
        dedup.scrub_batch_incremental(empty, empty, "doc_id", "text"),
        dedup.decontaminate(empty, empty, "doc_id", "text"),
    ]
    for df in ops:
        assert df.count() == 0
    # scrubbing a non-empty batch against an empty corpus passes every
    # doc through untouched
    batch = spark.createDataFrame(
        [(7, "only doc in the whole corpus right now")], "doc_id long, text string"
    )
    out = dedup.scrub_batch_incremental(empty, batch, "doc_id", "text").collect()
    assert [(r["doc_id"], r["n_spans"]) for r in out] == [(7, 0)]


def test_minhash_logged_index_tag_pins_training_run(spark):
    """Composition: snapshot TAGS over the logged MinHash index pin 'the
    index version training run N deduped against' — queries via the
    tagged snapshot stay byte-identical while the index keeps advancing,
    and vacuum retains the tagged version past the retention cut."""
    import tempfile

    from open_data_lakehouse_demo_spark.sources import table_log as tl

    _docs_all, corpus, batch = _minhash_cluster_docs(spark)
    with tempfile.TemporaryDirectory() as root:
        path = f"{root}/mh"
        dedup.build_minhash_index_logged(corpus, path)
        # tag the version run-7 saw (both lockstep tables, same name)
        tl.tag(f"{path}/sets", "run-7")
        tl.tag(f"{path}/bands", "run-7")
        pin = tl.tags(f"{path}/bands")["run-7"]
        def rows(df):
            return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())

        before = rows(
            dedup.near_dups_batch_logged(spark, path, batch, snapshot=pin)
        )
        # the index keeps evolving: append the batch itself (index now
        # contains it -> the unpinned query would see new candidates)
        dedup.append_minhash_index_logged(spark, path, batch, txn=("t", 1))
        after_latest = dedup.near_dups_batch_logged(spark, path, batch)
        assert rows(
            dedup.near_dups_batch_logged(spark, path, batch, snapshot=pin)
        ) == before
        assert after_latest.count() >= len(before)
        # vacuum with keep_last=1 would expire the tagged snapshots —
        # the tags retain them
        tl.vacuum(spark, f"{path}/sets", keep_last=1, orphan_retention_ms=0)
        tl.vacuum(spark, f"{path}/bands", keep_last=1, orphan_retention_ms=0)
        assert rows(
            dedup.near_dups_batch_logged(spark, path, batch, snapshot=pin)
        ) == before


def test_positioned_hash_index_text_pass_runs_once(spark):
    """r13: the ExactSubstr index build evaluates the text column ONCE
    per doc. Two regressions this pins, both measured at 2n before the
    fix: (a) the old ``filter(size(tk) >= k)`` guard alias-inlined the
    tokenize tree (and anything under it) into a pushed-down predicate,
    duplicating every text-side expression per row — now the short-doc
    exclusion is fused into the generator as an empty array; (b) the
    raw (doc, pos, h) relation is EAGERLY checkpointed before the
    df-cap, so _cap_index's aggregate and join subtrees replay blocks
    instead of racing to recompute the text lineage (AQE submits those
    independent stages concurrently, so a lazy checkpoint still paid
    2x). Counted with an accumulator UDF as the text column.

    ASSUMPTION (r13 ADVICE): the exact-count assertion is valid only
    without task retries/speculation — true for this suite's local-mode
    session (spark.speculation defaults false; a task failure would fail
    the test itself). On a retrying CI runner, relax to a [n, 2n) band."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("string")
    def counted_text(i):
        acc.add(1)
        return f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4}"

    n = 300
    docs = spark.range(0, n).select(
        F.col("id").alias("doc_id"), counted_text("id").alias("text")
    )
    idx = dedup.positioned_hash_index(docs, "doc_id", "text", k=4, max_df=20)
    idx.write.format("noop").mode("overwrite").save()
    assert acc.value == n, (
        f"text column evaluated {acc.value}x for {n} docs — a filter "
        "re-inlined the text lineage or the index build re-executed it"
    )


def test_connected_components_distributed_path_matches_local(spark, monkeypatch):
    """r14: connected_components resolves bounded graphs with driver-local
    union-find (_cc_local) and larger ones with the distributed
    label-propagation loop. Pin both paths to identical output on the
    same graph — cap monkeypatched to 0 forces the distributed loop on a
    graph the fast path would otherwise take (incl. a multi-round chain,
    so propagation + certification actually iterate)."""
    from open_data_lakehouse_demo_spark.operators import dedup

    edges = spark.createDataFrame(
        # long chain (forces >1 propagation round distributed), star,
        # island pair, triangle with a reversed edge
        [(i, i + 1) for i in range(1, 9)]
        + [(50, 51), (50, 52), (50, 53), (70, 71), (80, 81), (81, 82), (82, 80)],
        "doc_a BIGINT, doc_b BIGINT",
    )
    local = {
        (r["node"], r["component"])
        for r in dedup.connected_components(edges).collect()
    }
    monkeypatch.setattr(dedup, "_LOCAL_CC_CAP", 0)
    dist = {
        (r["node"], r["component"])
        for r in dedup.connected_components(edges).collect()
    }
    assert local == dist
    assert (2, 1) in local and (9, 1) in local  # chain fully resolved
