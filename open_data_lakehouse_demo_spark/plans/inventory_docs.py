"""Query inventory — document dedup suite (beyond-reference operators).

Registers the dedup operators (operators/dedup.py) as named queries over
the ``documents`` testdata table, each with a DuckDB oracle built from the
SAME Python constants (MinHash permutation tables, df-cap, thresholds) so
both engines execute one formula — see the portability contract in
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_data_lakehouse_demo_spark.operators import dedup
from open_data_lakehouse_demo_spark.plans.inventory import query, t

# ---------------------------------------------------------------------------
# Shared DuckDB oracle fragments (single source of truth = dedup.py constants)
# ---------------------------------------------------------------------------

# distinct sorted 3-word-shingle hashes per doc (mirror of shingle_hash_set)
_SHINGLE_SETS_SQL = """
toks AS (
  SELECT doc_id AS doc,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
), shs AS (
  SELECT doc,
    list_sort(list_distinct(list_transform(
      list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                     i -> array_to_string(tk[i:i+2], ' ')),
      s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)))) AS sh
  FROM toks
)
"""

_VERIFY_SQL = f"""
SELECT c.doc_a, c.doc_b,
  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
FROM cands c JOIN shs a ON c.doc_a = a.doc JOIN shs b ON c.doc_b = b.doc
"""

_JACCARD_THRESHOLD = 0.8
_MAX_DF = 100
_MAX_HAMMING = 3

_T_PCT = int(_JACCARD_THRESHOLD * 100)

# prefix-filtered inverted index (mirrors dedup.prefix_length — exact
# integer ceil so both engines agree; see the theorem note there)
_NGRAM_JACCARD_ORACLE = f"""
WITH {_SHINGLE_SETS_SQL},
pref AS (
  SELECT doc, unnest(sh[1:CAST(len(sh) - floor(({_T_PCT} * len(sh) + 99) / 100) + 1 AS INT)]) AS h
  FROM shs
),
rare AS (SELECT h FROM pref GROUP BY h HAVING COUNT(*) <= {_MAX_DF}),
prefr AS (SELECT doc, h FROM pref WHERE h IN (SELECT h FROM rare)),
cands AS (
  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
  FROM prefr x JOIN prefr y ON x.h = y.h AND x.doc < y.doc
),
verified AS ({_VERIFY_SQL})
SELECT * FROM verified WHERE jaccard >= {_JACCARD_THRESHOLD}
"""

_SIG_ENTRIES = ",\n    ".join(
    f"list_aggregate(list_transform(sh, h -> ({a} * h + {b}) % {dedup.MINHASH_P}), 'min')"
    for a, b in zip(dedup.MINHASH_A, dedup.MINHASH_B)
)
_R = dedup.N_HASHES // dedup.N_BANDS

# Composable minhash candidate-pair fragment (assumes `shs` CTE in scope);
# reused by the curated_corpus composite (inventory_corpus.py).
MINHASH_CANDS_SQL = f"""
sigs AS (
  SELECT doc, [
    {_SIG_ENTRIES}
  ] AS sig FROM shs
),
bands AS (
  SELECT doc, band_id,
    CAST(sig[band_id * {_R} + 1] AS VARCHAR) || '_' ||
    CAST(sig[band_id * {_R} + 2] AS VARCHAR) AS band_key
  FROM sigs, (SELECT unnest(range(0, {dedup.N_BANDS})) AS band_id)
),
cands AS (
  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.doc < y.doc
)
"""

_MINHASH_ORACLE = f"""
WITH {_SHINGLE_SETS_SQL},
{MINHASH_CANDS_SQL},
verified AS ({_VERIFY_SQL})
SELECT * FROM verified WHERE jaccard >= {_JACCARD_THRESHOLD}
"""

_BIT_SUMS = ",\n    ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN cnt ELSE -cnt END) AS bit{i}"
    for i in range(dedup.SIMHASH_BITS)
)
_SIMHASH_VAL = " + ".join(
    f"(CASE WHEN bit{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
    for i in range(dedup.SIMHASH_BITS)
)

_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS doc,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
), tok_cnt AS (
  SELECT doc, tok, COUNT(*) AS cnt
  FROM (SELECT doc, unnest(tk) AS tok FROM toks) GROUP BY 1, 2
), th AS (
  SELECT doc, cnt, CAST(('0x' || substring(md5(tok), 1, {dedup.SIMHASH_BITS // 4})) AS BIGINT) AS h
  FROM tok_cnt
), bits AS (
  SELECT doc,
    {_BIT_SUMS}
  FROM th GROUP BY doc
), sh2 AS (
  SELECT doc, {_SIMHASH_VAL} AS simhash FROM bits
), blocks AS (
  SELECT doc, simhash, block_id,
         (simhash >> ({dedup.SIMHASH_BLOCK_BITS} * block_id)) & {(1 << dedup.SIMHASH_BLOCK_BITS) - 1} AS block_val
  FROM sh2, (SELECT unnest(range(0, {dedup.SIMHASH_BLOCKS})) AS block_id)
)
SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b,
  bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM blocks x JOIN blocks y
  ON x.block_id = y.block_id AND x.block_val = y.block_val AND x.doc < y.doc
WHERE bit_count(xor(x.simhash, y.simhash)) <= {_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# Query registrations
# ---------------------------------------------------------------------------

@query(
    "exact_dedup_docs",
    ("DD1",),
    oracle="""
SELECT md5(text) AS text_md5, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
    tags=("dedup",),
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on md5(text) (operators/dedup.py).
    Minimal shuffle — 16-byte digest + id per row."""
    return dedup.exact_dedup(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "ngram_jaccard_dups",
    ("DD2",),
    oracle=_NGRAM_JACCARD_ORACLE,
    tags=("dedup",),
)
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs ≥ 0.8 via df-capped inverted-index
    candidates + exact set verification (operators/dedup.py)."""
    return dedup.ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold_pct=_T_PCT,
        max_df=_MAX_DF,
    )


@query(
    "minhash_lsh_dups",
    ("DD3",),
    oracle=_MINHASH_ORACLE,
    tags=("dedup",),
)
def minhash_lsh_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(16×2) near-dup pairs, exact-Jaccard verified
    (operators/dedup.py; permutation tables shared with this oracle)."""
    return dedup.minhash_lsh_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=_JACCARD_THRESHOLD,
    )


@query(
    "simhash_dups",
    ("DD4",),
    oracle=_SIMHASH_ORACLE,
    tags=("dedup",),
)
def simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-32 near-dup pairs, Hamming ≤ 3, pigeonhole-block candidates
    (operators/dedup.py)."""
    return dedup.simhash_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=_MAX_HAMMING
    )


# ---------------------------------------------------------------------------
# DD11 — asymmetric containment (subset-duplicate) detection
# ---------------------------------------------------------------------------

_CONTAINMENT_ORACLE = f"""
WITH {_SHINGLE_SETS_SQL},
full_idx AS (SELECT doc, unnest(sh) AS h FROM shs),
rare AS (SELECT h FROM full_idx GROUP BY h HAVING COUNT(*) <= {_MAX_DF}),
fullr AS (SELECT doc, h FROM full_idx WHERE h IN (SELECT h FROM rare)),
pref AS (
  SELECT doc, unnest(sh[1:CAST(len(sh) - floor(({_T_PCT} * len(sh) + 99) / 100) + 1 AS INT)]) AS h
  FROM shs
),
prefr AS (SELECT doc, h FROM pref WHERE h IN (SELECT h FROM rare)),
cands AS (
  SELECT DISTINCT least(x.doc, y.doc) AS doc_a, greatest(x.doc, y.doc) AS doc_b
  FROM prefr x JOIN fullr y ON x.h = y.h AND x.doc <> y.doc
),
verified AS (
  SELECT c.doc_a, c.doc_b,
    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE)
      AS containment_a,
    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(b.sh) AS DOUBLE)
      AS containment_b,
    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
  FROM cands c JOIN shs a ON c.doc_a = a.doc JOIN shs b ON c.doc_b = b.doc
)
SELECT * FROM verified
WHERE greatest(containment_a, containment_b) >= {_JACCARD_THRESHOLD}
"""


@query(
    "containment_dups",
    ("DD11",),
    oracle=_CONTAINMENT_ORACLE,
    tags=("dedup",),
)
def containment_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate pairs by asymmetric shingle containment ≥ 0.8 —
    one-sided prefix-filtered inverted index (operators/dedup.py
    containment_pairs); catches quote/excerpt dups Jaccard misses."""
    docs = t(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        docs, "doc_id", "text", threshold_pct=_T_PCT, max_df=_MAX_DF
    )
