"""Deterministic weighted sampling — the quality-weighted corpus
subsetting step of an LLM data pipeline (PIPE family; beyond the
reference's surface, which has no sampling beyond LIMIT).

Weighted sampling without replacement via Efraimidis-Spirakis (2006)
exponential keys: each row draws key = u^(1/w) for u ~ Uniform(0,1);
the k largest keys are EXACTLY a weighted sample without replacement.
Equivalent (and numerically safer) form used here:

    key = ln(u) / w          (take the k LARGEST; ln(u) < 0)

Determinism contract (same as stratified_sample_docs): u is not a PRNG
draw but a pure function of the row — the first 8 md5 hex chars of
``salt#id`` scaled to (0, 1] — so the sample is reproducible across
engines, retries and repartitioning, re-drawable under a new ``salt``,
and expressible verbatim in an ANSI-SQL oracle.

Scale shape: the key is a map-side projection; global top-k plans as
TakeOrderedAndProject (per-partition heads + one merge — no full sort)
and per-group top-k as one WindowGroupLimit-pruned window on the group
key. No collect, no sampling pass over the data beyond the one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^32: the md5-slice range; +1 shifts the uniform into (0, 1] so ln(u)
# is finite (u = 0 impossible, u = 1 gives key = 0, still valid).
_U_DENOM = float(1 << 32)


def hash_uniform(id_col: Column | str, salt: str) -> Column:
    """Deterministic u ∈ (0, 1]: (md5_32(salt#id) + 1) / 2^32 — the
    portable-hash uniform shared with the stratified sampler."""
    id_col = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.lit(salt), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (h + F.lit(1)).cast("double") / F.lit(_U_DENOM)


def es_key(id_col: Column | str, weight_col: Column | str, salt: str) -> Column:
    """Efraimidis-Spirakis selection key ln(u)/w (higher = selected).

    Rows with weight <= 0 or NULL get NULL keys and can never be
    selected (they order last under DESC with NULLs last)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("double")
    return F.when(w > 0.0, F.log(hash_uniform(id_col, salt)) / w)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
    by: list[str] | None = None,
) -> DataFrame:
    """k-row weighted sample WITHOUT replacement (per group when ``by``
    is given): inclusion probability proportional to weight, exact
    sample-without-replacement semantics by Efraimidis-Spirakis.

    Output = the sampled input rows + their ``es_key`` (descending
    selection order within the sample, useful for truncating further
    downstream without re-sampling). Deterministic in (salt, ids,
    weights); a different ``salt`` is an independent redraw.
    """
    keyed = df.withColumn("es_key", es_key(id_col, weight_col, salt)).filter(
        F.col("es_key").isNotNull()
    )
    if by:
        w = Window.partitionBy(*by).orderBy(F.col("es_key").desc(), F.col(id_col))
        return (
            keyed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
    # global: ORDER BY + LIMIT plans as TakeOrderedAndProject
    return keyed.orderBy(F.col("es_key").desc(), F.col(id_col)).limit(k)
