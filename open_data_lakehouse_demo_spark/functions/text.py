"""Text-analysis functions — language ID, quality scoring, token counts,
document fingerprints.

Beyond-reference training-data-pipeline operators (SURVEY.md §7.6) over the
``documents`` table. Everything is a pure Column expression (whole-stage
codegen, no Python UDFs); each formula is mirrored verbatim in a DuckDB
oracle (plans/inventory_text.py) so results hash-match.

Determinism notes:
  - ratios are single divisions of exact integer counts (IEEE-deterministic);
  - corpus-level averages aggregate the integer numerators/denominators and
    divide once (SUM(int)/SUM(int)) — never SUM(double) whose result depends
    on reduction order across partitions;
  - the language classifier is argmax-with-fixed-tiebreak over marker-token
    counts — a formula, not a model, so both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.operators.dedup import (
    shingle_hash_set,
    token_hash,
    tokenize,
)

# Marker stopwords per language (argmax classifier); ASCII-only so the
# formula is engine-portable. Shared with the SQL oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to", "in"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "les", "des", "et", "est", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3"),  # romanized markers
}
LANG_ORDER = tuple(LANG_MARKERS)  # deterministic tiebreak order

EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "that", "this",
)

PUNCT_CHARS = ".,!?;:()'\""

# GPT-2-style pre-tokenizer classes: letter runs | digit runs | single
# non-alnum-non-space. Same regex text works in Java regex and RE2.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(text)).cast("bigint")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer match count (letters/digits/punct split)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("bigint")


def est_token_count(text: Column) -> Column:
    """chars/4 heuristic (ceil) — the standard quick LLM-token estimate."""
    return F.ceil(F.length(text) / F.lit(4.0)).cast("bigint")


def stopword_count(text: Column) -> Column:
    """Number of tokens that are English stopwords."""
    return F.size(
        F.filter(tokenize(text), lambda t: t.isin(*EN_STOPWORDS))
    ).cast("bigint")


def punct_count(text: Column) -> Column:
    """Punctuation character count (fixed ASCII set, via translate)."""
    return (F.length(text) - F.length(F.translate(text, PUNCT_CHARS, ""))).cast("bigint")


def alpha_count(text: Column) -> Column:
    """Alphabetic character count."""
    return F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("bigint")


def lang_marker_count(text: Column, lang: str) -> Column:
    """Count of the language's marker tokens in the text.

    Reference formula (mirrored verbatim in the SQL oracle). The hot path
    uses :func:`lang_scores` instead — one token traversal for ALL
    languages rather than one filter pass per language.
    """
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(tokenize(text), lambda t: t.isin(*markers))).cast("bigint")


def _marker_vec(tok: Column) -> Column:
    """Per-token membership vector: array<int> of 0/1 in LANG_ORDER."""
    return F.array(
        *[
            F.when(tok.isin(*LANG_MARKERS[lang]), F.lit(1)).otherwise(F.lit(0))
            for lang in LANG_ORDER
        ]
    )


def lang_scores(text: Column) -> Column:
    """All languages' marker counts in ONE token traversal.

    Returns array<int> ordered as LANG_ORDER. Identical counts to
    :func:`lang_marker_count` (same tokenize, same exact-match markers) —
    differential-tested in tests/test_text.py — but a single
    ``aggregate`` pass instead of ``len(LANG_ORDER)`` filter passes, so
    the per-row cost is O(tokens) instead of O(tokens × languages).
    Alias the result ONCE and extract per-language columns from the alias
    (CollapseProject keeps the expensive aggregate un-duplicated)."""
    return F.aggregate(
        tokenize(text),
        F.array(*[F.lit(0) for _ in LANG_ORDER]),
        lambda acc, t: F.zip_with(acc, _marker_vec(t), lambda a, b: a + b),
    )


def predicted_lang_from_scores(counts: dict[str, Column]) -> Column:
    """Argmax language from per-language score columns; earlier LANG_ORDER
    wins ties; 'und' when no marker hits at all."""
    best = F.greatest(*[counts[lang] for lang in LANG_ORDER])
    pred = F.lit("und")
    # reverse order + when-chain ⇒ first language in LANG_ORDER wins ties
    for lang in reversed(LANG_ORDER):
        pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def predicted_lang(text: Column) -> Column:
    """Argmax language by marker count; earlier LANG_ORDER wins ties;
    'und' when no marker hits at all.

    Single expression, single token traversal: the argmax runs inside the
    ``aggregate`` finish lambda over the accumulated count vector, so the
    tokens array is never re-walked per language."""

    def _finish(acc: Column) -> Column:
        counts = {
            lang: F.element_at(acc, i + 1) for i, lang in enumerate(LANG_ORDER)
        }
        return predicted_lang_from_scores(counts)

    return F.aggregate(
        tokenize(text),
        F.array(*[F.lit(0) for _ in LANG_ORDER]),
        lambda acc, t: F.zip_with(acc, _marker_vec(t), lambda a, b: a + b),
        _finish,
    )


def quality_band(stop_ratio: Column, alpha_ratio: Column, n_tokens: Column) -> Column:
    """Heuristic quality band: stopword presence + alphabetic density + length."""
    return (
        F.when(
            (stop_ratio >= 0.05) & (alpha_ratio >= 0.6) & (n_tokens >= 20), "high"
        )
        .when((alpha_ratio >= 0.4) & (n_tokens >= 5), "medium")
        .otherwise("low")
    )


def doc_fingerprint_min(text: Column, n: int = 3) -> Column:
    """Winnowing-style document fingerprint: min 3-gram shingle hash."""
    return F.array_min(shingle_hash_set(text, n))


def doc_fingerprint_kmin(text: Column, k: int = 4, n: int = 3) -> Column:
    """k-min sketch fingerprint: the k smallest shingle hashes as CSV
    (a compact containment-estimate sketch; shingle sets are pre-sorted)."""
    return F.array_join(F.slice(shingle_hash_set(text, n), 1, k), ",")


def rolling_hash_fingerprint(text: Column, window: int = 8) -> Column:
    """Rolling window-hash fingerprint: min hash over ``window``-token
    character windows (token-level Rabin-Karp analogue built from the
    portable md5 token hash; window hop = 1 token)."""
    toks = tokenize(text)
    k = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    window_hashes = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: token_hash(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return F.array_min(window_hashes)


# ---------------------------------------------------------------------------
# PII detection / scrubbing (TX9)
#
# The patterns below are deliberately written in the regex dialect subset
# shared by Java regex (Spark executors) and RE2 (DuckDB oracle): no
# backreferences, no lookaround, ASCII word boundaries only. Scrub order is
# a contract: EMAIL first (emails contain dots that an IP pattern could
# partially match), then PHONE, then IPV4; the replacement tokens contain
# no digits or '@', so later passes can never re-match inside an earlier
# redaction.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_PASSES: tuple[tuple[str, str], ...] = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_PHONE_RE, "<PHONE>"),
    (PII_IPV4_RE, "<IP>"),
)


def pii_count(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of one PII pattern."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("bigint")


def scrub_pii(text: Column) -> Column:
    """Redact emails, then phones, then IPv4s (fixed pass order — see
    module contract above). Pure Column expression: the whole scrub stays
    inside whole-stage codegen, no Python in the hot path."""
    out = text
    for pattern, token in _PII_PASSES:
        out = F.regexp_replace(out, pattern, token)
    return out
