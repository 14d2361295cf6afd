"""Text-analysis tests: known-answer unit cases + DuckDB oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.functions import text as tx
from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, "The cat and the dog sat, quietly."),
        (2, "der die und das ist hier nicht da"),
        (3, "!!! ??? ... 123 456"),
        (4, "x" * 40),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _one(df, doc_id, col):
    return {r["doc_id"]: r[col] for r in df.collect()}[doc_id]


def test_token_counts(sample):
    df = sample.select(
        "doc_id",
        tx.ws_token_count(F.col("text")).alias("ws"),
        tx.bpe_token_count(F.col("text")).alias("bpe"),
        tx.est_token_count(F.col("text")).alias("est"),
    )
    assert _one(df, 1, "ws") == 7
    # BPE-ish: 7 words + comma + period = 9
    assert _one(df, 1, "bpe") == 9
    assert _one(df, 4, "est") == 10  # 40 chars / 4


def test_stopword_and_punct(sample):
    df = sample.select(
        "doc_id",
        tx.stopword_count(F.col("text")).alias("stop"),
        tx.punct_count(F.col("text")).alias("punct"),
    )
    # 'and', 'the' (The is capitalized → not matched; tokens are case-sensitive)
    assert _one(df, 1, "stop") == 2
    assert _one(df, 1, "punct") == 2  # comma + period


def test_predicted_lang(sample):
    df = sample.select("doc_id", tx.predicted_lang(F.col("text")).alias("lang"))
    langs = {r["doc_id"]: r["lang"] for r in df.collect()}
    assert langs[1] == "en"
    assert langs[2] == "de"
    assert langs[3] == "und"


def test_lang_scores_matches_reference_formula(spark):
    """Differential: the single-pass lang_scores vector equals the
    one-filter-per-language reference formula (lang_marker_count) on
    real corpus text, and predicted_lang agrees with the argmax derived
    from those reference counts — including ties and the all-zero 'und'
    case (doc 3 above, plus the synthetic tie row here)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(400)
    extra = spark.createDataFrame(
        [(9000001, "el la der die"), (9000002, ""), (9000003, "   ")],
        ["doc_id", "text"],
    )
    docs = docs.select("doc_id", "text").unionByName(extra)
    both = docs.select(
        "doc_id",
        tx.lang_scores(F.col("text")).alias("vec"),
        F.array(
            *[tx.lang_marker_count(F.col("text"), g).cast("int") for g in tx.LANG_ORDER]
        ).alias("ref"),
        tx.predicted_lang(F.col("text")).alias("pred"),
    )
    rows = both.collect()
    assert rows and all(r["vec"] == r["ref"] for r in rows)
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[9000001]["pred"] == "de"  # tie de/es → earlier LANG_ORDER wins
    assert by_id[9000002]["pred"] == "und" and by_id[9000003]["pred"] == "und"


def test_fingerprint_deterministic(sample):
    df = sample.select("doc_id", tx.doc_fingerprint_min(F.col("text")).alias("fp"))
    a = {r["doc_id"]: r["fp"] for r in df.collect()}
    b = {r["doc_id"]: r["fp"] for r in df.collect()}
    assert a == b and all(v is not None for v in a.values())


def test_kmin_fingerprint_is_k_smallest_shingle_hashes(sample):
    """doc_fingerprint_kmin's contract: the CSV of the k SMALLEST distinct
    shingle hashes (shingle sets are pre-sorted, so slice(1,k) IS the
    k-min sketch), consistent with the full set and containing
    doc_fingerprint_min as its first element — the sketch a containment
    estimator unions/intersects."""
    rows = sample.select(
        "doc_id",
        tx.doc_fingerprint_kmin(F.col("text"), k=4).alias("kmin"),
        tx.doc_fingerprint_min(F.col("text")).alias("fpmin"),
        tx.shingle_hash_set(F.col("text"), 3).alias("sh"),
    ).collect()
    assert rows
    for r in rows:
        sh = r["sh"]
        want = ",".join(str(h) for h in sorted(sh)[:4])
        assert r["kmin"] == want, r["doc_id"]
        if sh:
            assert r["kmin"].split(",")[0] == str(r["fpmin"])


@pytest.mark.parametrize(
    "name",
    ["text_quality_profile", "language_id", "corpus_quality_by_source", "doc_fingerprints"],
)
def test_text_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    assert q.oracle is not None
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, name)


def test_pii_scrub_profile_oracle_parity(spark, duck):
    q = QUERIES["pii_scrub_profile"]
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, "pii_scrub_profile")


def test_scrub_pii_patterns_and_pass_order(spark):
    """Known-answer scrub: realistic PII redacts, decoys survive, and the
    email pass runs before phone/ip (replacement tokens never re-match)."""
    rows = [
        ("reach me at jane.doe+spam@corp.example.co.uk thanks",),
        ("call +1-555-0100 or +44-123-4567 now",),
        ("host 192.168.0.1 and 10.0.0.255 up; ver 9.9 is not an ip",),
        ("ref +12345 has no dashes; 1.2.3 has three octets",),
        ("mixed a@b.io then +1-555-9999 then 8.8.8.8",),
    ]
    df = spark.createDataFrame(rows, ["t"]).select(
        tx.scrub_pii(F.col("t")).alias("s"),
        tx.pii_count(F.col("t"), tx.PII_EMAIL_RE).alias("ne"),
        tx.pii_count(F.col("t"), tx.PII_PHONE_RE).alias("np"),
        tx.pii_count(F.col("t"), tx.PII_IPV4_RE).alias("ni"),
    )
    got = df.collect()
    assert got[0]["s"] == "reach me at <EMAIL> thanks" and got[0]["ne"] == 1
    assert got[1]["s"] == "call <PHONE> or <PHONE> now" and got[1]["np"] == 2
    assert got[2]["s"] == "host <IP> and <IP> up; ver 9.9 is not an ip"
    assert got[2]["ni"] == 2
    assert got[3]["s"] == rows[3][0]  # decoys untouched
    assert got[4]["s"] == "mixed <EMAIL> then <PHONE> then <IP>"


# ---------------------------------------------------------------------------
# TX9 — BPE merge learning vs an independent pure-Python reference
# ---------------------------------------------------------------------------

def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference BPE (dict-of-tuples formulation, Sennrich's
    algorithm): returns [(rank, left, right, merged, pair_count)]."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[syms[i], syms[i + 1]] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        # max count, lexicographic (left, right) tiebreak
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, left + right, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark):
    import duckdb

    wc = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""
            SELECT w, COUNT(*) FROM (
              SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                        x -> x <> '')) AS w
              FROM '{SF_DIR}/documents.parquet'
            ) GROUP BY 1
            """
        ).fetchall()
    }
    expected = _py_bpe(wc, 8)
    got = [tuple(r) for r in QUERIES["bpe_merges"].spark(spark, SF_DIR).collect()]
    assert got == expected


def test_bpe_merge_is_left_to_right_non_overlapping(spark):
    """'aaa' under pair (a,a) must become [aa, a], not [a, aa] or [aa, aa]."""
    from open_data_lakehouse_demo_spark.operators import bpe

    df = spark.createDataFrame([("aaa",), ("aaaa",), ("ab",)], ["w"])
    out = df.select(
        bpe._merge_pair(bpe._char_symbols(F.col("w")), "a", "a").alias("s")
    ).collect()
    assert [r["s"] for r in out] == [["aa", "a"], ["aa", "aa"], ["a", "b"]]


def test_bpe_encode_batch_matches_reference_and_reconstructs(spark):
    """Tokenizer application: the Arrow kernel (bpe_encode_batch) agrees
    with an independent pure-Python apply of the learned table, matches
    the JVM _merge_pair twin on a 2-merge slice, and concatenating a
    word's subwords reproduces the word."""
    from open_data_lakehouse_demo_spark.operators import bpe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    merges = [
        (r["left"], r["right"])
        for r in bpe.learn_bpe(spark, docs, n_merges=8).orderBy("rank").collect()
    ]
    assert merges, "no merges learned"

    def py_apply(word: str, table) -> list[str]:
        syms = list(word)
        for left, right in table:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms

    got = docs.select(
        "doc_id", bpe.bpe_encode_batch("text", merges).alias("a"), "text"
    ).collect()
    vocab_merged = {left + right for left, right in merges}
    for r in got:
        expected = [s for w in (r["text"] or "").split() for s in py_apply(w, merges)]
        assert list(r["a"]) == expected, f"kernel/reference divergence doc {r['doc_id']}"
        assert "".join(r["a"]) == "".join((r["text"] or "").split())
        for tok in r["a"]:
            assert len(tok) == 1 or tok in vocab_merged

    # JVM twin: safe at 1-2 chained merges (see bpe_encode_symbols doc)
    two = merges[:2]
    small = docs.limit(8)
    jvm = {r["doc_id"]: list(r["s"]) for r in small.select(
        "doc_id", bpe.bpe_encode_symbols("text", two).alias("s")).collect()}
    ref = {r["doc_id"]: [s for w in (r["text"] or "").split() for s in py_apply(w, two)]
           for r in small.select("doc_id", "text").collect()}
    assert jvm == ref


def test_chunk_documents_window_invariants(spark):
    """PIPE9 chunking: full coverage, exact overlap between consecutive
    chunks, reconstruction from the non-overlapped prefixes, and the
    short-doc/empty edge cases."""
    from open_data_lakehouse_demo_spark.operators.chunking import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    CH, OV = 32, 8
    stride = CH - OV
    out = chunk_documents(docs, chunk_tokens=CH, overlap=OV).collect()
    texts = {r["doc_id"]: (r["text"] or "") for r in docs.collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        words = texts[doc_id].split()
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        toks = [r["chunk_text"].split() if r["chunk_text"] else [] for r in rows]
        # each chunk matches its window slice of the source tokens
        for i, tk in enumerate(toks):
            assert tk == words[i * stride : i * stride + CH]
        # last chunk is non-empty for any non-empty document
        assert not words or len(toks[-1]) >= 1
        # consecutive chunks share exactly OV tokens
        for a, b in zip(toks, toks[1:]):
            assert a[stride:] == b[: len(a) - stride]
        # reconstruction: stride-prefixes + last chunk = the document
        recon = [w for tk in toks[:-1] for w in tk[:stride]] + toks[-1]
        assert recon == words
        # short docs (< CH tokens) must be exactly one whole-doc chunk
        if len(words) <= CH:
            assert len(rows) == 1 and toks[0] == words


def test_chunk_documents_rejects_bad_overlap(spark):
    from open_data_lakehouse_demo_spark.operators.chunking import chunk_documents

    import pytest as _pytest
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=16, overlap=16)


def test_bpe_local_and_distributed_learn_identical_tables(spark):
    """The at-scale driver-side loop (learn_bpe_local, 1 job) and the
    distributed job-per-round loop (learn_bpe) must produce the EXACT
    same merge table — ranks, pairs, and weighted pair counts — on the
    fixture corpus (test_bpe_merges_match_python_reference closes the
    triangle against the independent recount-per-round reference)."""
    from open_data_lakehouse_demo_spark.operators import bpe
    from open_data_lakehouse_demo_spark.sources.io import read_parquet

    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    local = [tuple(r) for r in bpe.learn_bpe_local(spark, docs, n_merges=8).collect()]
    dist = [tuple(r) for r in bpe.learn_bpe(spark, docs, n_merges=8).collect()]
    assert local == dist
    assert len(local) == 8


def test_bpe_greedy_merges_incremental_vs_edge_cases():
    """_greedy_merges' incremental pair-statistics bookkeeping on the
    overlap-heavy cases: repeated symbols ('aaaa'), a merge that creates
    a new winning pair, exhaustion before n_merges."""
    from open_data_lakehouse_demo_spark.operators.bpe import _greedy_merges

    # 'aaaa' ⇒ (a,a) weight 3·5; merge → ['aa','aa'] ⇒ (aa,aa) next
    got = _greedy_merges({"aaaa": 5}, 3)
    assert got[0] == (1, "a", "a", "aa", 15)
    assert got[1] == (2, "aa", "aa", "aaaa", 5)
    assert len(got) == 2  # single-symbol words have no pairs: stop early

    # tie on count → lexicographically smallest pair wins
    got = _greedy_merges({"ab": 3, "cd": 3}, 1)
    assert got == [(1, "a", "b", "ab", 3)]

    # merging (b,c) inside 'abcd' must decrement (a,b)/(c,d) and create
    # (a,bc)/(bc,d) — the incremental update's before/after diff
    got = _greedy_merges({"abcd": 2, "bc": 5}, 2)
    assert got[0][1:3] == ("b", "c") and got[0][4] == 7
    assert got[1][4] == 2
