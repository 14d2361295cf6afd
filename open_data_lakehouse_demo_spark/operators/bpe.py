"""Distributed BPE merge learning (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
step of an LLM data pipeline.

Byte-pair encoding learns a merge table greedily: count adjacent symbol
pairs over the corpus, merge the most frequent pair everywhere, repeat.
The classic formulation is single-machine over a word-frequency dict.

TWO equivalent modes, identical output (differential-tested):
  - ``learn_bpe_local`` — the AT-SCALE mode: one corpus-sized Spark job
    builds and collects the (Heaps-law-small) word-frequency vocabulary;
    the greedy loop runs driver-side with incremental pair statistics.
    Job count is 1, independent of n_merges.
  - ``learn_bpe`` — the distributed loop (below): each round is one
    vocab-sized explode→groupBy job; n_merges+1 jobs total. Kept as the
    differential/oracle path and for vocabs that exceed one machine.

The distributed loop keeps the classic structure but distributes the only
data-sized object:

  - ONE corpus pass builds the (word, count) frequency table — after
    that, every round operates on the VOCABULARY (distinct words), which
    is orders of magnitude smaller than the corpus and shrinks none as
    the corpus grows 100×  (Heaps' law: |vocab| ~ O(corpus^0.5));
  - each round is one explode→groupBy over the vocab (pair counts,
    weighted by word frequency, map-side partial aggregation) + a top-1;
  - the winning pair (2 short strings + a count) is collected to the
    driver and folded back in as a LITERAL — the same justified tiny
    driver-side materialization as the k-means codebook
    (operators/similarity.py): collecting 1 row per round replaces a
    per-round join against a 1-row DataFrame and its barrier job;
  - the merge itself is a vectorized higher-order-function fold over
    each word's symbol array (left-to-right, non-overlapping — standard
    BPE semantics), JVM-side, no Python in the loop;
  - per-round localCheckpoint (sources/io.materialize) cuts the
    iterative lineage exactly like connected_components does.

Symbols start as characters (no end-of-word marker — GPT-2-style
within-word merges). Ties on pair count break lexicographically on
(left, right), making the learned table deterministic; the pytest
cross-check (tests/test_text.py) reimplements the algorithm in pure
Python over the same corpus and asserts the exact merge table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_MERGES_DEFAULT = 8


def _char_symbols(word: Column) -> Column:
    """array<string> of single characters (the BPE start state)."""
    return F.filter(F.split(word, ""), lambda c: c != F.lit(""))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<left,right>> of adjacent symbol pairs."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<left:string,right:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, i + 1).alias("right"),
            ),
        )
    )


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Replace adjacent (left, right) with left+right, LEFT-TO-RIGHT and
    non-overlapping ("aaa" with pair (a,a) → ["aa","a"]) — one
    vectorized aggregate fold, no Python."""
    n = F.size(syms)
    merged = F.lit(left + right)

    def step(acc: Column, i: Column) -> Column:
        # F.get is 0-based and returns NULL out of bounds (ANSI-safe,
        # unlike element_at which throws under Spark 4's default ANSI)
        cur = F.get(syms, i)
        nxt = F.get(syms, i + 1)
        take_pair = (
            ~acc["skip"]
            & (cur == F.lit(left))
            & (nxt.isNotNull() & (nxt == F.lit(right)))
        )
        return (
            F.when(acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")))
            .when(
                take_pair,
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )
    return F.aggregate(F.sequence(F.lit(0), n - 1), acc0, step, lambda acc: acc["out"])


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized pass."""
    from open_data_lakehouse_demo_spark.operators.dedup import tokenize
    from open_data_lakehouse_demo_spark.sources.io import spread

    return (
        spread(docs)
        .select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


_MERGE_SCHEMA = "rank int, left string, right string, merged string, pair_count bigint"


def _merge_word_list(syms: list[str], left: str, right: str) -> list[str]:
    """Python twin of ``_merge_pair``: left-to-right, non-overlapping."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _greedy_merges(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Sennrich et al.'s greedy loop with INCREMENTAL pair statistics:
    pair counts and a pair→words inverted index are built once, and each
    merge round touches only the words that actually contain the winning
    pair (subtracting their old adjacent pairs, rewriting, adding the new
    ones) — O(occurrences touched) per round, never an O(|V|) re-scan.
    Tie-break matches the distributed plan exactly: highest weighted
    count, then lexicographically smallest (left, right)."""
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in sorted(word_counts.items())
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, cnt) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            where.setdefault(p, set()).add(idx)

    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        (left, right), cnt = min(live, key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, left, right, left + right, cnt))
        for idx in sorted(where.get((left, right), set())):
            syms, wcnt = words[idx]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= wcnt
                w = where.get(p)
                if w is not None:
                    w.discard(idx)
            new_syms = _merge_word_list(syms, left, right)
            words[idx] = (new_syms, wcnt)
            for p in zip(new_syms, new_syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + wcnt
                where.setdefault(p, set()).add(idx)
    return out


def learn_bpe_local(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES_DEFAULT,
    min_count: int = 1,
) -> DataFrame:
    """AT-SCALE BPE merge learning: ONE distributed job total, regardless
    of vocabulary size — the corpus-sized ``word_frequencies`` aggregate
    collects the (word, cnt) VOCABULARY to the driver, and the greedy
    merge loop runs locally with incremental pair-statistics updates
    (``_greedy_merges``). Returns the same merge table as ``learn_bpe``,
    bit-identical (tests/test_text.py runs all three implementations —
    this, the distributed loop, and an independent recount-per-round
    reference — over the same corpus and asserts exact equality).

    Why this is the 100 TB mode: ``learn_bpe``'s distributed loop costs
    n_merges+1 barrier jobs (a 32k-merge GPT-2-style vocab ⇒ ~32k
    explode→groupBy→top-1 jobs — weeks of scheduler overhead even when
    each job is small). The vocabulary, by Heaps' law (|V| ~ corpus^β,
    β≈0.5), is ~10^7 rows at 100 TB — a few hundred MB collected, the
    same justified driver-side materialization class as the k-means
    codebook, and ``min_count`` (the standard vocab-truncation knob —
    applied INSIDE the aggregate, so only surviving rows move) cuts the
    noise tail (URLs, hashes) that dominates |V| at that scale. The
    distributed loop remains the job-per-round differential/oracle path
    for corpora whose vocab genuinely cannot fit one machine."""
    freq = word_frequencies(docs, text_col)
    if min_count > 1:
        freq = freq.filter(F.col("cnt") >= min_count)
    wc = {r["word"]: int(r["cnt"]) for r in freq.collect()}  # the ONE job
    return spark.createDataFrame(_greedy_merges(wc, n_merges), _MERGE_SCHEMA)


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES_DEFAULT,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge-table DataFrame
    (rank, left, right, merged, pair_count) in learned order.

    JOB-COUNT BOUND: n_merges+1 barrier jobs (one explode→groupBy→top-1
    per round plus the word-frequency pass) — fine for small merge
    tables; for production-sized vocabs (32k+) use ``learn_bpe_local``,
    which learns the identical table in ONE distributed job."""
    from open_data_lakehouse_demo_spark.sources.io import materialize

    words = materialize(
        word_frequencies(docs, text_col).select(
            _char_symbols(F.col("word")).alias("syms"), "cnt"
        )
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            words.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
            .groupBy("p.left", "p.right")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()  # 1 row: the round's winning pair (driver literal)
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rank, left, right, left + right, int(cnt)))
        words = materialize(
            words.select(_merge_pair(F.col("syms"), left, right).alias("syms"), "cnt")
        )
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def bpe_encode_batch(text_col: str, merges: list[tuple[str, str]]) -> "Column":
    """array<string> subword tokens per document for a LEARNED merge table
    — the tokenizer-APPLICATION step that pairs with ``learn_bpe`` (train
    once, encode the whole corpus). Arrow-batched pandas UDF: the merge
    table rides the task closure (a few short strings), each word starts
    as characters and applies every merge in rank order with exactly
    ``_merge_pair``'s left-to-right non-overlapping semantics
    (differential-tested against the JVM fold twin, tests/test_text.py).

    Per-batch word memoization: natural text is Zipfian, so the cache
    collapses the per-word cost to the distinct-word rate — the same
    vocabulary-not-corpus scaling argument ``learn_bpe`` makes. Scale
    shape: map-only (zero shuffles), embarrassingly parallel; whitespace
    splitting matches ``dedup.tokenize`` (\\s+, empties dropped)."""
    import pandas as pd

    mlist = [(str(left), str(right)) for left, right in merges]

    # NB: this module uses `from __future__ import annotations`, which
    # stringifies type hints — pandas_udf's eval-type inference needs the
    # real classes, so they're attached explicitly below.
    def _enc(texts):
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                syms = list(w)
                for left, right in mlist:
                    out: list[str] = []
                    i, n = 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                            out.append(left + right)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                cache[w] = got = syms
            return got

        return pd.Series(
            [[s for w in (t or "").split() for s in enc_word(w)] for t in texts]
        )

    _enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _enc = F.pandas_udf("array<string>")(_enc)
    return _enc(F.col(text_col))


def bpe_encode_symbols(text_col: str, merges: list[tuple[str, str]]) -> "Column":
    """JVM-expression twin of ``bpe_encode_batch`` for ONE or TWO merges
    on small relations (differential tests). DO NOT chain many merges:
    each ``_merge_pair`` references its input symbols several times per
    fold step, so nesting k merges as one expression re-evaluates the
    inner folds multiplicatively — exponential interpreted cost in k.
    ``learn_bpe`` avoids this by materializing between rounds; the Arrow
    kernel (``bpe_encode_batch``) is the corpus-encode path."""
    from open_data_lakehouse_demo_spark.operators.dedup import tokenize

    def enc(word: Column) -> Column:
        syms = _char_symbols(word)
        for left, right in merges:
            syms = _merge_pair(syms, left, right)
        return syms

    return F.flatten(F.transform(tokenize(text_col), enc))
