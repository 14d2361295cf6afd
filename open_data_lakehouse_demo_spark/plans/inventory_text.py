"""Query inventory — text-analysis suite (beyond-reference operators).

Registers functions/text.py over the ``documents`` testdata table; each
oracle mirrors the Column formula with shared constants (marker/stopword
sets, punct class, token regex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.functions import text as tx
from open_data_lakehouse_demo_spark.plans.inventory import query, t


def _sql_in(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


_TOKS_SQL = """
toks AS (
  SELECT doc_id, text, source,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
)
"""

_STOP_SQL = f"len(list_filter(tk, x -> x IN {_sql_in(tx.EN_STOPWORDS)}))"
_PUNCT_SQL = "length(text) - length(translate(text, '.,!?;:()''\"', ''))"
_ALPHA_SQL = "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"

_QUALITY_ORACLE = f"""
WITH {_TOKS_SQL},
feat AS (
  SELECT doc_id,
    CAST(len(tk) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '{tx.BPE_TOKEN_RE}')) AS BIGINT) AS bpe_tokens,
    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
    CAST({_STOP_SQL} AS BIGINT) AS stop_cnt,
    CAST({_PUNCT_SQL} AS BIGINT) AS punct_cnt,
    CAST({_ALPHA_SQL} AS BIGINT) AS alpha_cnt,
    CAST(length(text) AS BIGINT) AS n_chars_m
  FROM toks
)
SELECT doc_id, ws_tokens, bpe_tokens, est_tokens,
  CAST(stop_cnt AS DOUBLE) / ws_tokens AS stopword_ratio,
  CAST(punct_cnt AS DOUBLE) / n_chars_m AS punct_ratio,
  CAST(alpha_cnt AS DOUBLE) / n_chars_m AS alpha_ratio,
  CASE
    WHEN CAST(stop_cnt AS DOUBLE) / ws_tokens >= 0.05
         AND CAST(alpha_cnt AS DOUBLE) / n_chars_m >= 0.6
         AND ws_tokens >= 20 THEN 'high'
    WHEN CAST(alpha_cnt AS DOUBLE) / n_chars_m >= 0.4 AND ws_tokens >= 5 THEN 'medium'
    ELSE 'low'
  END AS quality_band
FROM feat
"""

_MARKER_SQLS = {
    lang: f"CAST(len(list_filter(tk, x -> x IN {_sql_in(markers)})) AS BIGINT)"
    for lang, markers in tx.LANG_MARKERS.items()
}
_BEST_SQL = "greatest(" + ", ".join(f"score_{lang}" for lang in tx.LANG_ORDER) + ")"
_PRED_SQL = "CASE WHEN " + _BEST_SQL + " = 0 THEN 'und' " + " ".join(
    f"WHEN score_{lang} = {_BEST_SQL} THEN '{lang}'" for lang in tx.LANG_ORDER
) + " END"

_LANG_ID_ORACLE = f"""
WITH {_TOKS_SQL},
scored AS (
  SELECT doc_id,
    {", ".join(f"{sql} AS score_{lang}" for lang, sql in _MARKER_SQLS.items())}
  FROM toks
)
SELECT doc_id, {", ".join(f"score_{lang}" for lang in tx.LANG_ORDER)},
  {_PRED_SQL} AS predicted_lang
FROM scored
"""

_CORPUS_QUALITY_ORACLE = f"""
WITH {_TOKS_SQL},
feat AS (
  SELECT source,
    CAST(len(tk) AS BIGINT) AS ws_tokens,
    CAST({_STOP_SQL} AS BIGINT) AS stop_cnt,
    CAST({_ALPHA_SQL} AS BIGINT) AS alpha_cnt,
    CAST(length(text) AS BIGINT) AS n_chars_m
  FROM toks
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(stop_cnt) AS DOUBLE) / SUM(ws_tokens) AS stopword_ratio,
  CAST(SUM(alpha_cnt) AS DOUBLE) / SUM(n_chars_m) AS alpha_ratio,
  CAST(SUM(ws_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc
FROM feat GROUP BY source
"""

# mirrors shingle/window hashing in operators/dedup.py + functions/text.py
_FP_ORACLE = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), shs AS (
  SELECT doc_id, text,
    list_sort(list_distinct(list_transform(
      list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                     i -> array_to_string(tk[i:i+2], ' ')),
      s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)))) AS sh,
    list_transform(range(1, greatest(len(tk) - 7, 1) + 1),
                   i -> CAST(('0x' || substring(md5(array_to_string(tk[i:i+7], ' ')), 1, 8)) AS BIGINT)) AS wh
  FROM toks
)
SELECT doc_id,
  md5(text) AS content_md5,
  sh[1] AS min_shingle_fp,
  array_to_string(sh[1:4], ',') AS kmin_sketch,
  list_aggregate(wh, 'min') AS rolling_window_fp
FROM shs
"""


@query("text_quality_profile", ("TX1",), oracle=_QUALITY_ORACLE, tags=("text",))
def text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features: token counts (whitespace/BPE-ish/chars-4),
    stopword/punct/alpha ratios, quality band (functions/text.py)."""
    docs = t(spark, sf_dir, "documents")
    text_c = F.col("text")
    ws = tx.ws_token_count(text_c)
    nchars = F.length(text_c).cast("bigint")
    stop_ratio = tx.stopword_count(text_c).cast("double") / ws
    alpha_ratio = tx.alpha_count(text_c).cast("double") / nchars
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        tx.bpe_token_count(text_c).alias("bpe_tokens"),
        tx.est_token_count(text_c).alias("est_tokens"),
        stop_ratio.alias("stopword_ratio"),
        (tx.punct_count(text_c).cast("double") / nchars).alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        tx.quality_band(stop_ratio, alpha_ratio, ws).alias("quality_band"),
    )


@query("language_id", ("TX2",), oracle=_LANG_ID_ORACLE, tags=("text",))
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language classifier with per-language scores.

    One token traversal total (functions/text.py lang_scores): the count
    vector is computed once per row, the per-language score columns are
    element extractions from it, and the argmax is a when-chain over
    those columns — the exact shape of the DuckDB oracle's ``scored``
    CTE. The aggregate stays in its own projection (CollapseProject does
    not duplicate non-cheap expressions), so this is ~4× faster than the
    previous one-filter-pass-per-language plan at sf0.1."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", tx.lang_scores(F.col("text")).alias("_scores")
    ).select(
        "doc_id",
        *[
            F.element_at("_scores", i + 1).cast("bigint").alias(f"score_{lang}")
            for i, lang in enumerate(tx.LANG_ORDER)
        ],
    )
    counts = {lang: F.col(f"score_{lang}") for lang in tx.LANG_ORDER}
    return scored.select(
        "doc_id",
        *[f"score_{lang}" for lang in tx.LANG_ORDER],
        tx.predicted_lang_from_scores(counts).alias("predicted_lang"),
    )


@query("corpus_quality_by_source", ("TX3", "A4"), oracle=_CORPUS_QUALITY_ORACLE, tags=("text",))
def corpus_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level quality rollup per source; ratios from exact integer
    sums so the aggregate is reduction-order-independent."""
    docs = t(spark, sf_dir, "documents")
    text_c = F.col("text")
    feat = docs.select(
        "source",
        tx.ws_token_count(text_c).alias("ws_tokens"),
        tx.stopword_count(text_c).alias("stop_cnt"),
        tx.alpha_count(text_c).alias("alpha_cnt"),
        F.length(text_c).cast("bigint").alias("n_chars_m"),
    )
    return feat.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("total_tokens"),
        (F.sum("stop_cnt").cast("double") / F.sum("ws_tokens")).alias("stopword_ratio"),
        (F.sum("alpha_cnt").cast("double") / F.sum("n_chars_m")).alias("alpha_ratio"),
        (F.sum("ws_tokens").cast("double") / F.count("*")).alias("avg_tokens_per_doc"),
    )


@query("doc_fingerprints", ("TX4",), oracle=_FP_ORACLE, tags=("text",))
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 digest, min-shingle fingerprint, k-min
    sketch, rolling 8-token window hash (functions/text.py).

    The shingle-hash set is materialized ONCE per row in a lower Project,
    then min/kmin derive from it — halves the md5 hashing vs computing
    each fingerprint from raw text (HOF lambdas are interpreted, so Spark
    doesn't CSE them across expressions)."""
    from open_data_lakehouse_demo_spark.operators.dedup import shingle_hash_set
    from open_data_lakehouse_demo_spark.sources.io import spread

    docs = spread(t(spark, sf_dir, "documents"))
    text_c = F.col("text")
    staged = docs.select(
        "doc_id",
        F.md5(text_c).alias("content_md5"),
        shingle_hash_set(text_c, 3).alias("sh"),
        tx.rolling_hash_fingerprint(text_c, window=8).alias("rolling_window_fp"),
    )
    return staged.select(
        "doc_id",
        "content_md5",
        F.element_at("sh", 1).alias("min_shingle_fp"),
        F.array_join(F.slice("sh", 1, 4), ",").alias("kmin_sketch"),
        "rolling_window_fp",
    )


_MIN_DF = 3

_VOCAB_ORACLE = f"""
WITH {_TOKS_SQL},
exploded AS (SELECT doc_id, unnest(tk) AS token FROM toks),
stats AS (
  SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM exploded GROUP BY token
)
SELECT token, tf, df,
  CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df AS inv_doc_freq
FROM stats WHERE df >= {_MIN_DF}
"""


@query("vocab_stats", ("TX5",), oracle=_VOCAB_ORACLE, tags=("text",))
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: per-token term frequency, document
    frequency, and inverse document frequency — the inverted-index /
    tokenizer-prep pass of a training-data pipeline.

    Scale shape: explode is a generator inside the scan stage (no shuffle
    for the fan-out); the single shuffle is the groupBy(token), where
    COUNT(*) partial-aggregates map-side and COUNT(DISTINCT doc_id)
    expands to Spark's standard two-phase distinct aggregate. The corpus
    size is a broadcast scalar, never a driver-side collect. idf is kept
    as an exact single division (n_docs/df) rather than log() — Java and
    C libm may differ in the last ulp, a cross-engine hash hazard."""
    from open_data_lakehouse_demo_spark.operators.dedup import tokenize

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("token"))
    stats = toks.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    n_docs = docs.agg(F.count("*").alias("n"))
    return (
        stats.filter(F.col("df") >= _MIN_DF)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "tf",
            "df",
            (F.col("n").cast("double") / F.col("df")).alias("inv_doc_freq"),
        )
    )


# Gopher-style repetition thresholds (Rae et al. 2112.11446 Table A1 uses
# 0.18-0.20 on web text; tuned here to the synthetic corpus' measured
# quantiles so the flag splits the fixture rather than saturating).
_TOP_BIGRAM_FRAC_MAX = 0.10
_DUP_WORD_FRAC_MAX = 0.6

_REPETITION_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS tk
  FROM documents
),
feat AS (
  SELECT doc_id, n_chars,
         1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS dup_word_frac
  FROM toks
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                               i -> array_to_string(tk[i:i+1], ' '))) AS g
  FROM toks WHERE len(tk) >= 2
),
cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
    MAX(struct_pack(c := c, g := g, chars := c * length(g))) AS top,
    SUM(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup_chars
  FROM cnt GROUP BY 1
)
SELECT f.doc_id, f.dup_word_frac,
  COALESCE(CAST(a.top.chars AS DOUBLE) / f.n_chars, 0.0) AS top_bigram_char_frac,
  LEAST(1.0, COALESCE(CAST(a.dup_chars AS DOUBLE) / f.n_chars, 0.0)) AS dup_bigram_char_frac,
  (COALESCE(CAST(a.top.chars AS DOUBLE) / f.n_chars, 0.0) > {_TOP_BIGRAM_FRAC_MAX}
   OR f.dup_word_frac > {_DUP_WORD_FRAC_MAX}) AS is_repetitive
FROM feat f LEFT JOIN agg a USING (doc_id)
"""


@query("repetition_profile", ("TX7",), oracle=_REPETITION_ORACLE, tags=("text",))
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter metrics per document (Rae et al.
    2021 §A1.1): duplicate-word fraction, characters covered by the most
    frequent word-bigram, characters inside ALL duplicated bigrams, and
    the resulting repetitive-document flag — the repetition-removal gate
    every LLM training-data pipeline runs before quality filtering.

    Scale shape: ONE tokenize scan — the per-doc scalar features ride the
    bigram Generate as carried columns, so there is no separate feature
    branch and no join; two hash aggregates — (doc, bigram) counts then
    the per-doc top/dup rollup (both partial-agg friendly).  All counts
    are integers (exact across engines); divisions happen once at the
    end on identical operands.  Tiebreak for 'most frequent bigram' is
    (count DESC, bigram DESC) via one max(struct) — no window, no sort."""
    from open_data_lakehouse_demo_spark.operators.dedup import tokenize, word_shingles
    from open_data_lakehouse_demo_spark.sources.io import spread

    docs = t(spark, sf_dir, "documents")
    # ONE tokenize scan, no join back: the per-doc scalar features ride
    # the bigram explode as carried columns (constant per doc), and docs
    # with < 2 tokens emit a NULL-sentinel row so they survive to the
    # final rollup (mirroring the oracle's LEFT JOIN) — the same
    # fused-generator discipline as bigram_stats.
    toks = spread(docs.select("doc_id", F.length("text").alias("n_chars"),
                              tokenize(F.col("text")).alias("tk")))
    exploded = toks.select(
        "doc_id",
        "n_chars",
        (
            F.lit(1.0)
            - F.size(F.array_distinct("tk")).cast("double") / F.size("tk")
        ).alias("dup_word_frac"),
        F.explode(
            F.when(F.size("tk") >= 2, word_shingles(F.col("tk"), 2)).otherwise(
                F.array(F.lit(None).cast("string"))
            )
        ).alias("g"),
    )
    cnt = exploded.groupBy("doc_id", "g").agg(
        F.count("*").alias("c"),
        F.max("n_chars").alias("n_chars"),
        F.max("dup_word_frac").alias("dup_word_frac"),
    )
    agg = cnt.groupBy("doc_id").agg(
        F.max("n_chars").alias("n_chars"),
        F.max("dup_word_frac").alias("dup_word_frac"),
        F.max(
            F.when(
                F.col("g").isNotNull(),
                F.struct(
                    F.col("c"), F.col("g"), (F.col("c") * F.length("g")).alias("chars")
                ),
            )
        ).alias("top"),
        F.sum(
            F.when(
                F.col("g").isNotNull() & (F.col("c") >= 2),
                F.col("c") * F.length("g"),
            ).otherwise(F.lit(0))
        ).alias("dup_chars"),
    )
    top_frac = F.coalesce(
        F.col("top.chars").cast("double") / F.col("n_chars"), F.lit(0.0)
    )
    dup_frac = F.least(
        F.lit(1.0), F.col("dup_chars").cast("double") / F.col("n_chars")
    )
    return agg.select(
        "doc_id",
        "dup_word_frac",
        top_frac.alias("top_bigram_char_frac"),
        dup_frac.alias("dup_bigram_char_frac"),
        (
            (top_frac > _TOP_BIGRAM_FRAC_MAX)
            | (F.col("dup_word_frac") > _DUP_WORD_FRAC_MAX)
        ).alias("is_repetitive"),
    )


_RARITY_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS w
  FROM documents
),
ucnt AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
tot AS (SELECT COUNT(*) AS n, (SELECT COUNT(*) FROM ucnt) AS v FROM toks),
per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(u.c) AS sum_cnt,
         SUM(CASE WHEN u.c * (SELECT v FROM tot) < (SELECT n FROM tot) THEN 1 ELSE 0 END) AS rare_cnt
  FROM toks t JOIN ucnt u USING (w) GROUP BY 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  (CAST(sum_cnt AS DOUBLE) / (SELECT n FROM tot)) / n_tokens AS mean_token_prob,
  CAST(rare_cnt AS DOUBLE) / n_tokens AS rare_token_frac
FROM per_doc
"""


@query("token_rarity_profile", ("TX8",), oracle=_RARITY_ORACLE, tags=("text",))
def token_rarity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy per document (the CCNet/Wikipedia-LM
    filter idea with a corpus-internal LM): mean corpus unigram
    probability of the doc's tokens, plus the fraction of tokens rarer
    than the corpus mean token count — low mean-prob / high rare-frac
    docs are the gibberish candidates an LM-perplexity filter would cut.

    Engine-portable by construction: every aggregate is an exact integer
    sum (token counts), the 'rare' predicate is the integer comparison
    c·|V| < N (no division), and the two final divisions run once on
    identical operands in a mirrored order — no log(), whose libm
    rounding differs across engines.

    Scale shape: TWO passes over the token stream by necessity — the
    count-build aggregate must complete before the probability join can
    read it, and the vocabulary table (zipf-bounded; same broadcast
    argument + HONEST LIMIT as bigram_stats) is the only stored
    intermediate; the per-doc rollup shuffles fact rows once on doc_id."""
    from open_data_lakehouse_demo_spark.operators.dedup import tokenize
    from open_data_lakehouse_demo_spark.sources.io import materialize, spread

    docs = t(spark, sf_dir, "documents")
    toks = spread(docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("w")))
    # vocab-sized; three consumers (count table, |V|, N) — materialize per
    # io.materialize's aggregate-reduced contract
    ucnt = materialize(toks.groupBy("w").agg(F.count("*").alias("c")))
    tot = ucnt.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )  # N tokens, |V| vocab
    per_doc = (
        toks.join(F.broadcast(ucnt), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("c").alias("sum_cnt"),
            F.sum(
                F.when(F.col("c") * F.col("v") < F.col("n"), 1).otherwise(0)
            ).alias("rare_cnt"),
            F.first("n").alias("n_total"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (
            (F.col("sum_cnt").cast("double") / F.col("n_total")) / F.col("n_tokens")
        ).alias("mean_token_prob"),
        (F.col("rare_cnt").cast("double") / F.col("n_tokens")).alias("rare_token_frac"),
    )


_MIN_PAIR = 5

_BIGRAM_ORACLE = f"""
WITH {_TOKS_SQL},
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                               i -> array_to_string(tk[i:i+1], ' '))) AS bg
  FROM toks WHERE len(tk) >= 2
),
unigrams AS (
  SELECT unnest(tk) AS w FROM toks
),
ucnt AS (SELECT w, COUNT(*) AS c FROM unigrams GROUP BY w),
tot AS (SELECT COUNT(*) AS n FROM unigrams),
bcnt AS (SELECT bg, COUNT(*) AS pair_cnt FROM bigrams GROUP BY bg)
SELECT b.bg AS bigram, b.pair_cnt, u1.c AS w1_cnt, u2.c AS w2_cnt,
  (CAST(b.pair_cnt AS DOUBLE) * CAST((SELECT n FROM tot) AS DOUBLE))
    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
FROM bcnt b
JOIN ucnt u1 ON u1.w = split_part(b.bg, ' ', 1)
JOIN ucnt u2 ON u2.w = split_part(b.bg, ' ', 2)
WHERE b.pair_cnt >= {_MIN_PAIR}
"""


@query("bigram_stats", ("TX6",), oracle=_BIGRAM_ORACLE, tags=("text",))
def bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram collocation statistics: pair counts + lift
    (observed/expected co-occurrence) — the n-gram LM / collocation-mining
    pass of a text pipeline.

    Scale shape: bigrams and unigrams are generator fan-outs inside the
    scan stage; three hash aggregates (bigram, unigram, total) and two
    shuffled joins on the word key. Lift keeps integer counts exact and
    divides once in double — engine-portable, no log()."""
    from open_data_lakehouse_demo_spark.operators.dedup import tokenize, word_shingles
    from open_data_lakehouse_demo_spark.sources.io import materialize, spread

    docs = t(spark, sf_dir, "documents")
    # Tokenize ONCE without pinning the token arrays: unigrams and bigrams
    # are emitted from a SINGLE generator (one concat of tagged structs per
    # doc), so one scan + one explode feeds ONE (kind, key) aggregate.
    # The former version localCheckpointed the tokenized FULL corpus —
    # a fact-scale intermediate that violates io.materialize's own
    # contract ('never on raw fact-table rows') and would spill the whole
    # input at the 100 TB target (ADVICE r3).  Only the AGGREGATED count
    # table (vocabulary-sized, zipf-bounded) is materialized, because four
    # branches read it below.
    # pre-project tk so tokenize evaluates ONCE per row: the generator
    # below references the attribute, and Generate does not inline its
    # child projection (verified in the plan: tokenize appears once)
    toks = spread(docs.select(tokenize(F.col("text")).alias("tk")))
    tk = F.col("tk")
    units = toks.select(
        F.explode(
            F.concat(
                F.transform(tk, lambda w: F.struct(F.lit("u").alias("t"), w.alias("k"))),
                F.when(
                    F.size(tk) >= 2,
                    F.transform(
                        word_shingles(tk, 2),
                        lambda b: F.struct(F.lit("b").alias("t"), b.alias("k")),
                    ),
                ).otherwise(F.array().cast("array<struct<t:string,k:string>>")),
            )
        ).alias("e")
    ).select(F.col("e.t").alias("t"), F.col("e.k").alias("k"))
    cnt = materialize(units.groupBy("t", "k").agg(F.count("*").alias("c")))
    ucnt = cnt.filter(F.col("t") == "u").select(F.col("k").alias("w"), F.col("c"))
    tot = ucnt.agg(F.sum("c").alias("n"))  # Σ unigram counts ≡ COUNT(*) of tokens
    bcnt = cnt.filter(F.col("t") == "b").select(
        F.col("k").alias("bigram"), F.col("c").alias("pair_cnt")
    )
    # Unigram counts are VOCABULARY-sized (zipf-bounded — typically a few
    # million (word, count) rows even at 100 TB), so both lookups broadcast
    # and the filtered bigram table never shuffles on the word keys.
    # HONEST LIMIT: F.broadcast is a hard override — for a pathological
    # vocabulary (>~10^8 distinct tokens, e.g. no normalization over noisy
    # web text) it would hit the 8 GB broadcast ceiling; drop the hint
    # there and let AQE pick the shuffled join.
    return (
        bcnt.filter(F.col("pair_cnt") >= _MIN_PAIR)
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
        .join(
            F.broadcast(ucnt.select(F.col("w").alias("w1"), F.col("c").alias("w1_cnt"))),
            "w1",
        )
        .join(
            F.broadcast(ucnt.select(F.col("w").alias("w2"), F.col("c").alias("w2_cnt"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            "pair_cnt",
            "w1_cnt",
            "w2_cnt",
            (
                (F.col("pair_cnt").cast("double") * F.col("n").cast("double"))
                / (F.col("w1_cnt").cast("double") * F.col("w2_cnt").cast("double"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# TX9 — PII detection + redaction profile
# ---------------------------------------------------------------------------
#
# The synthetic corpus contains no organic PII, so the query derives a
# deterministic "dirty" text from each document (doc_id-seeded email /
# phone / IP fragments appended to the real text, plus decoys that must
# NOT match) and the operator under test is the scrub itself:
# functions/text.py scrub_pii — pattern set, pass order, and the
# count-what-you-redact contract (each pass counts matches on the text as
# the PREVIOUS pass left it). Oracle replicates construction + scrub in
# RE2; patterns are written in the Java∩RE2 dialect subset.

_DIRTY_SQL = (
    "text || ' contact'"
    " || CASE WHEN doc_id % 2 = 0"
    "         THEN ' user' || doc_id || '@mail' || (doc_id % 7) || '.example.com'"
    "         ELSE ' ref +' || (doc_id % 90000) END"  # decoy: no dashes => not a phone
    " || ' phone +1-555-' || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0')"
    " || CASE WHEN doc_id % 3 = 0"
    "         THEN ' ip 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256)"
    "         ELSE ' ver 9.9' END"  # decoy: two octets => not an IPv4
)

_PII_ORACLE = rf"""
WITH dirty AS (
  SELECT doc_id, {_DIRTY_SQL} AS dt FROM documents
), p1 AS (
  SELECT doc_id, dt,
         len(regexp_extract_all(dt, '{tx.PII_EMAIL_RE}')) AS n_emails,
         regexp_replace(dt, '{tx.PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM dirty
), p2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{tx.PII_PHONE_RE}')) AS n_phones,
         regexp_replace(t1, '{tx.PII_PHONE_RE}', '<PHONE>', 'g') AS t2
  FROM p1
)
SELECT doc_id,
  CAST(n_emails AS BIGINT) AS n_emails,
  CAST(n_phones AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(t2, '{tx.PII_IPV4_RE}')) AS BIGINT) AS n_ips,
  regexp_replace(t2, '{tx.PII_IPV4_RE}', '<IP>', 'g') AS redacted,
  CAST(length(regexp_replace(t2, '{tx.PII_IPV4_RE}', '<IP>', 'g')) AS BIGINT)
    AS redacted_len
FROM p2
"""


@query("pii_scrub_profile", ("TX9",), oracle=_PII_ORACLE, tags=("text",))
def pii_scrub_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus: per-document email /
    phone / IPv4 match counts and the fully-redacted text.

    Scale shape: map-only — every pattern pass is a Column expression
    (regexp_extract_all/regexp_replace) inside one whole-stage-codegen
    scan stage; no shuffle, no Python. At 100 TB this is the ideal
    embarrassingly-parallel operator: throughput scales linearly with
    executors and the regex dialect contract (functions/text.py) keeps
    the scrub portable across engines."""
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" user"), did.cast("string"), F.lit("@mail"),
                (did % 7).cast("string"), F.lit(".example.com"),
            ),
        ).otherwise(F.concat(F.lit(" ref +"), (did % 90000).cast("string"))),
        F.lit(" phone +1-555-"),
        F.lpad(((did * 37) % 10000).cast("string"), 4, "0"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" ip 10."), (did % 256).cast("string"),
                F.lit(".0."), ((did * 3) % 256).cast("string"),
            ),
        ).otherwise(F.lit(" ver 9.9")),
    )
    staged = (
        docs.select("doc_id", dirty.alias("dt"))
        .select(
            "doc_id",
            tx.pii_count(F.col("dt"), tx.PII_EMAIL_RE).alias("n_emails"),
            F.regexp_replace("dt", tx.PII_EMAIL_RE, "<EMAIL>").alias("t1"),
        )
        .select(
            "doc_id",
            "n_emails",
            tx.pii_count(F.col("t1"), tx.PII_PHONE_RE).alias("n_phones"),
            F.regexp_replace("t1", tx.PII_PHONE_RE, "<PHONE>").alias("t2"),
        )
    )
    return staged.select(
        "doc_id",
        "n_emails",
        "n_phones",
        tx.pii_count(F.col("t2"), tx.PII_IPV4_RE).alias("n_ips"),
        F.regexp_replace("t2", tx.PII_IPV4_RE, "<IP>").alias("redacted"),
        F.length(F.regexp_replace("t2", tx.PII_IPV4_RE, "<IP>")).cast("bigint").alias(
            "redacted_len"
        ),
    )


# ---------------------------------------------------------------------------
# TX10 — BPE merge learning (tokenizer training over the corpus)
# ---------------------------------------------------------------------------

@query(
    "bpe_merges",
    ("TX10",),
    tags=("text", "pipeline"),
)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 8 BPE merges over the documents corpus via the
    AT-SCALE mode (operators/bpe.py learn_bpe_local): ONE corpus pass
    builds the word-frequency vocabulary, collected to the driver
    (Heaps-law small), and the greedy loop runs locally with incremental
    pair-statistics updates — 1 Spark job regardless of n_merges, vs the
    distributed loop's job-per-round barrier (~32k jobs at a GPT-2-style
    vocab).

    No SQL oracle: the greedy merge loop (argmax + in-place rewrite,
    8 rounds) is iterative, like dup_clusters' pointer jumping — DuckDB
    would need 8 chained rewrite CTEs with a non-overlapping
    left-to-right replace, which plain SQL can't express. The exact
    merge table (including tie-breaks and pair counts) is cross-checked
    in tests/test_text.py against BOTH the distributed-loop
    implementation (learn_bpe) and an independent pure-Python
    recount-per-round reference over the same corpus."""
    from open_data_lakehouse_demo_spark.operators.bpe import learn_bpe_local

    docs = t(spark, sf_dir, "documents")
    return learn_bpe_local(spark, docs, "text")
