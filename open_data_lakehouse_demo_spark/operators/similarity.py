"""Vector similarity search — brute-force cosine top-k, IVF-Flat, hyperplane LSH.

Beyond-reference training-data-pipeline operators (SURVEY.md §7.6) over the
``embeddings`` table (vec_id BIGINT, embedding ARRAY<FLOAT> dim=64, label INT).

Portability contract (DuckDB-oracle hash parity): every similarity is a
left-to-right fold of CAST-to-DOUBLE products — ``F.aggregate(F.zip_with(...))``
in Spark, ``list_reduce(list_transform(range ...))`` in DuckDB — so both
engines execute the identical IEEE-754 operation sequence and results are
bit-equal, no tolerance needed. Random hyperplanes are *arithmetic* (an LCG
formula evaluated inside the query), not stored tables, so both engines
derive them from one shared formula.

Scale design (local ≈ 500-5k vectors; target = 10^9+):
  - Brute force is the CORRECTNESS baseline: probe-set × corpus with the
    small probe side broadcast — one pass over the corpus, per-partition
    top-k via window (TakeOrdered shape), no shuffle of the corpus.
  - IVF-Flat is the scale path: corpus partitioned by nearest coarse
    centroid (one O(n·C) assignment pass, C ≪ n), probes search only
    ``nprobe`` inverted lists → candidate join is an equi-join on
    centroid id, i.e. n/C-sized buckets instead of the full corpus.
  - Hyperplane LSH (sign-random-projection) generates near-dup candidate
    pairs via L band-table equi-joins (same shape as MinHash LSH in
    operators/dedup.py); exact cosine verifies candidates.
  - IVF codebook: deterministic sampled (oracle-reproducible) or TRAINED
    via distributed Lloyd's k-means (``kmeans_codebook``).
  - Dot products: the expression fold is the REFERENCE semantics the
    oracles mirror; the hot pair-fan-out stages (bucket bits, candidate
    verify, IVF scoring) run the Arrow-batched numpy variants, each
    PROVEN bit-identical to the fold (exact float32×float32 products +
    identical left-to-right summation — parity tests in
    tests/test_similarity.py), so vectorizing cannot move the hash.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64

# LCG hyperplane coefficients: coef(p, i) for plane p, dimension i.
# Shared single-source formula — mirrored verbatim in the DuckDB oracles.
LCG_MUL = 1103515245
LCG_ADD = 12345
LCG_MOD = 2_000_001
LCG_SHIFT = 1_000_000  # coef range [-1e6, 1e6]

N_TABLES = 4  # L band tables ...
# 16 sign bits per table: random (cos≈0) pairs collide at 0.5^b per table,
# so b=8 made the candidate join quadratic-dense at the 10× scale check
# (N²/256 collisions — measured 14× runtime growth); b=16 drops random
# collisions to 1.5e-5 per table while near-identical pairs (the near-dup
# targets) still collide with probability ≈1 across 4 tables.
BITS_PER_TABLE = 16  # ... of b sign bits each


def _dot_fold(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over double-cast elements (bit-portable).

    Reference semantics: the DuckDB oracles mirror this fold textually.
    Hot paths use ``dot_batch`` below — an Arrow-vectorized variant proven
    bit-identical (tests/test_similarity.py::test_dot_udf_parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_batch(a: Column, b: Column) -> Column:
    """Arrow-batched dot product, bit-identical to the ``_dot_fold``
    expression (and therefore to the oracles' ``list_reduce`` fold).

    Why bit-parity holds (same argument as ``lsh_buckets_batch``):
      * each product is EXACT — a float32 has a 24-bit mantissa, so
        f64(x)·f64(y) carries ≤48 mantissa bits < 53, and Spark's
        ``x.cast(double) * y.cast(double)``, DuckDB's and numpy's
        products are the same bit pattern;
      * ``np.add.accumulate`` sums the identical addends in the identical
        left-to-right order as the fold ⇒ identical rounding at every
        step ⇒ identical final double.

    Measured on the 500k-pair IVF scoring stage at sf0.1 (interleaved
    A/B, same session): batch 1.8s < interpreted fold 2.7s << a fully
    unrolled 64-term codegen expression tree 10.5s (the giant generated
    method exceeds HotSpot's JIT size threshold and runs in the bytecode
    interpreter — unrolling backfires).  Arrow transfer of both vectors
    per pair row is the cost here and it still wins.
    """

    @F.pandas_udf("double")
    def _dots(xa: pd.Series, xb: pd.Series) -> pd.Series:
        out = np.empty(len(xa), dtype=np.float64)
        va, vb = xa.to_numpy(), xb.to_numpy()
        for lo in range(0, len(va), 4096):
            hi = min(lo + 4096, len(va))
            A = np.stack(va[lo:hi]).astype(np.float64)  # f32→f64 exact
            B = np.stack(vb[lo:hi]).astype(np.float64)
            prods = A * B  # exact (see docstring)
            out[lo:hi] = np.add.accumulate(prods, axis=1)[:, -1]
        return pd.Series(out)

    return _dots(a, b)


def norm(v: Column) -> Column:
    """sqrt of the self-dot. Fold-based: norms are computed once per
    VECTOR (not per pair), so the interpreted fold's per-element cost is
    negligible and the value never leaves the JVM."""
    return F.sqrt(_dot_fold(v, v))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Batched dot ÷ JVM-side norm product — every operand and operation
    bit-matches the oracle fold, so the quotient does too.  Pair-stage
    fan-outs (candidate verify / IVF scoring) are where the dot runs per
    PAIR; ``dot_batch`` is the measured winner there (see its docstring)."""
    return dot_batch(a, b) / (norm_a * norm_b)


def hyperplane_coef(p: int, i: int) -> int:
    """coef(p, i) — THE formula; mirrored textually in the SQL oracles.
    (Python int arithmetic is exact, same as the engines' BIGINT path.)"""
    return (LCG_MUL * (p * DIM + i) + LCG_ADD) % LCG_MOD - LCG_SHIFT


def _hyperplane(p: int) -> Column:
    """Plane p's coefficient vector, baked as a literal array<double>.

    Evaluating the LCG inside the plan would re-run an interpreted lambda
    per row (HOF lambdas don't codegen); literals are built once at plan
    time from the identical formula — measured 4.5s → ~2s on the LSH
    near-dup query at sf0.1."""
    return F.array(*[F.lit(float(hyperplane_coef(p, i))) for i in range(DIM)])


def lsh_bucket(v: Column, table: int) -> Column:
    """Sign-random-projection bucket id for one band table (b-bit integer).

    Expression-based reference implementation (the DuckDB oracles mirror
    this fold order textually). The hot path uses ``lsh_buckets_batch``
    below — an Arrow-vectorized variant proven bit-identical to this one
    (tests/test_similarity.py parity test)."""
    bits = [
        F.when(_dot_fold(v, _hyperplane(table * BITS_PER_TABLE + j)) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        for j in range(BITS_PER_TABLE)
    ]
    return reduce(lambda a, b: a + b, bits).cast("bigint")


def _plane_matrix() -> np.ndarray:
    """All L·b hyperplanes as one (n_planes, DIM) float64 matrix (exact ints)."""
    n_planes = N_TABLES * BITS_PER_TABLE
    return np.array(
        [[float(hyperplane_coef(p, i)) for i in range(DIM)] for p in range(n_planes)],
        dtype=np.float64,
    )


def lsh_buckets_batch(vec_col: str = "vec") -> Column:
    """All N_TABLES bucket ids per vector — Arrow-batched, bit-identical
    to the ``lsh_bucket`` fold.

    Why a pandas UDF here when the module rule is "expressions only":
    the bucket stage needs L·b (=64) dot products per vector and HOF fold
    lambdas are interpreted per element — L·b folds × 64 elements dominated
    the near-dup query (measured ~10× DuckDB at sf0.1). This stage is the
    one place the arithmetic is provably portable, so vectorizing it can't
    break oracle parity:

      * products are EXACT: |coef| < 2^21 (integer) × float32 (24-bit
        mantissa) → ≤ 45-bit mantissa, exactly representable in float64,
        so Spark's ``x.cast(double) * lit(coef)``, DuckDB's and numpy's
        products are all the same bit pattern;
      * the fold sum is reproduced by ``np.add.accumulate`` (cumsum),
        which is sequentially rounded like the Spark/DuckDB left fold —
        identical addends + identical order ⇒ identical rounding ⇒
        identical sign bits.

    Verified by tests/test_similarity.py::test_bucket_udf_parity against
    the expression fold on real + adversarial vectors.
    """

    @F.pandas_udf("array<bigint>")
    def _buckets(emb: pd.Series) -> pd.Series:
        m_t = _plane_matrix().T  # (DIM, n_planes)
        weights = (1 << np.arange(BITS_PER_TABLE, dtype=np.int64))
        out = []
        # chunk to bound the (chunk, DIM, n_planes) product tensor
        arr = emb.to_numpy()
        for lo in range(0, len(arr), 2048):
            chunk = arr[lo : lo + 2048]
            v = np.stack(chunk).astype(np.float64)  # (c, DIM); f32→f64 exact
            prods = v[:, :, None] * m_t[None, :, :]  # exact (see docstring)
            dots = np.add.accumulate(prods, axis=1)[:, -1, :]  # sequential fold
            bits = (dots > 0).reshape(-1, N_TABLES, BITS_PER_TABLE)
            buckets = (bits * weights[None, None, :]).sum(axis=2)  # (c, L)
            out.extend(buckets)
        return pd.Series(out)

    return _buckets(F.col(vec_col))


def _with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    from open_data_lakehouse_demo_spark.sources.io import spread

    # fold-based norms/dots are interpreted per element — run them wide
    return spread(df).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
    )


def brute_force_topk(
    df: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors of each probe over the full corpus.

    Probe side is broadcast (probe sets are query batches, small by
    construction); the corpus streams through one codegen stage — no corpus
    shuffle. Output (query_id, neighbor_id, cosine), k rows per probe,
    neighbor_id tiebreak makes the ranking total.
    """
    corpus = _with_norm(df, id_col, vec_col)
    p = _with_norm(probes, id_col, vec_col).select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = corpus.join(F.broadcast(p), F.col("vid") != F.col("query_id")).select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        cosine(F.col("qvec"), F.col("vec"), F.col("qnrm"), F.col("nrm")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def assign_centroids(
    df: DataFrame,
    centroids: DataFrame,
    n_assign: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest coarse centroids.

    Broadcast the (tiny) codebook; one O(n·C) scan, ranked by cosine with
    centroid-id tiebreak. Output (vid, vec, nrm, centroid_id, rank).
    """
    vecs = df
    cents = centroids.select(
        F.col("vid").alias("centroid_id"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    scored = vecs.join(F.broadcast(cents)).select(
        "vid",
        "vec",
        "nrm",
        "centroid_id",
        cosine(F.col("vec"), F.col("cvec"), F.col("nrm"), F.col("cnrm")).alias("ccos"),
    )
    if n_assign == 1:
        # argmax as ONE hash aggregate instead of a window (no sort, pure
        # map-side partial agg): max over struct(ccos, -centroid_id, …)
        # is exactly rank-1 of ORDER BY ccos DESC, centroid_id ASC —
        # including NaN ordering, where both paths treat NaN as greatest.
        best = scored.groupBy("vid").agg(
            F.max(
                F.struct(
                    F.col("ccos"),
                    (-F.col("centroid_id")).alias("neg_cid"),
                    F.col("centroid_id"),
                    F.col("vec"),
                    F.col("nrm"),
                )
            ).alias("b")
        )
        return best.select(
            "vid",
            F.col("b.vec").alias("vec"),
            F.col("b.nrm").alias("nrm"),
            F.col("b.centroid_id").alias("centroid_id"),
            F.lit(1).alias("crank"),
        )
    w = Window.partitionBy("vid").orderBy(F.col("ccos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_assign)
        .drop("ccos")
    )


def kmeans_codebook(
    df: DataFrame,
    n_centroids: int = 16,
    n_iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means: the real IVF codebook-training step
    (replaces the sampled lowest-id codebook where recall matters).

    Deterministic: init = the ``n_centroids`` lowest-id vectors, then
    ``n_iterations`` rounds of
      1. assign every vector to its nearest centroid by cosine
         (broadcast codebook, one O(n·C) codegen scan — no shuffle of
         the corpus beyond the partial aggregate);
      2. new centroid = element-wise mean of the assigned vectors,
         computed as DIM per-element AVG aggregates in ONE groupBy —
         map-side partial aggregation, so the shuffle carries
         C × DIM running sums per partition, never vectors.

    Empty clusters keep their previous centroid. Per-round materialize
    cuts the iterative-lineage blowup (same pattern as
    connected_components). Output (vid = centroid id, vec, nrm) —
    directly pluggable into ``assign_centroids`` / ``ivf_topk``.

    Scale: each round is one broadcast-join scan + one C·DIM-wide
    aggregate — at 10^9 vectors the cost is n_iterations corpus scans,
    the textbook distributed k-means shape.
    """
    from open_data_lakehouse_demo_spark.sources.io import materialize

    base = materialize(_with_norm(df, id_col, vec_col))
    return _kmeans_from_base(base, n_centroids, n_iterations)


def _kmeans_from_base(
    base: DataFrame, n_centroids: int, n_iterations: int
) -> DataFrame:
    """Lloyd iterations over an already-materialized (vid, vec, nrm) base —
    shared by kmeans_codebook and ivf_topk(train_iterations=...) so a
    train-then-search query builds the norm table ONCE."""
    from open_data_lakehouse_demo_spark.sources.io import materialize

    dim = DIM
    centroids = materialize(
        # the n_centroids LOWEST ids (not `vid < n`, which silently yields
        # an empty codebook when the id space doesn't start at 0)
        base.orderBy("vid").limit(n_centroids).select("vid", "vec", "nrm")
    )
    for _ in range(n_iterations):
        assigned = assign_centroids(base, centroids, n_assign=1)
        means = assigned.groupBy("centroid_id").agg(
            *[F.avg(F.col("vec")[i].cast("double")).alias(f"m{i}") for i in range(dim)]
        )
        new_vec = F.array(*[F.col(f"m{i}").cast("float") for i in range(dim)])
        updated = means.select(
            F.col("centroid_id").alias("vid"), new_vec.alias("vec")
        ).select("vid", "vec", norm(F.col("vec")).alias("nrm"))
        # empty clusters keep their previous centroid: ONE broadcast outer
        # join + coalesce (an anti-join + union costs an extra stage/round)
        centroids = materialize(
            centroids.alias("old")
            .join(F.broadcast(updated).alias("new"), "vid", "left")
            .select(
                "vid",
                F.coalesce(F.col("new.vec"), F.col("old.vec")).alias("vec"),
                F.coalesce(F.col("new.nrm"), F.col("old.nrm")).alias("nrm"),
            )
        )
    return centroids


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    probe_filter: Column | None = None,
    codebook: DataFrame | None = None,
    train_iterations: int = 0,
) -> DataFrame:
    """IVF-Flat approximate top-k: coarse-quantize, search nprobe lists.

    Default codebook = the ``n_centroids`` lowest-id vectors (deterministic
    sampled codebook — oracle-reproducible); pass
    ``codebook=kmeans_codebook(df, ...)`` for trained centroids where
    recall matters. Corpus vectors land in exactly one inverted list;
    probes search their ``nprobe`` nearest lists. The candidate join is an
    equi-join on centroid_id — bucket-sized work instead of full-corpus
    work.
    """
    from open_data_lakehouse_demo_spark.sources.io import materialize

    # base feeds codebook extraction, corpus assignment and probe
    # assignment — materialize so the norm folds run once
    base = materialize(_with_norm(df, id_col, vec_col))
    if codebook is not None:
        centroids = codebook
    elif train_iterations > 0:
        # train on THIS base — a separate kmeans_codebook(df) call would
        # scan + norm + checkpoint the identical corpus a second time
        centroids = _kmeans_from_base(base, n_centroids, train_iterations)
    else:
        # lowest-id sample, robust to id spaces that don't start at 0
        centroids = base.orderBy("vid").limit(n_centroids)
    corpus = assign_centroids(base, centroids, n_assign=1).select(
        "centroid_id", "vid", "vec", "nrm"
    )
    probes = base.filter(probe_filter) if probe_filter is not None else base
    probed = assign_centroids(probes, centroids, n_assign=nprobe).select(
        F.col("centroid_id"),
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    cand = corpus.join(F.broadcast(probed), "centroid_id").filter(
        F.col("vid") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        cosine(F.col("qvec"), F.col("vec"), F.col("qnrm"), F.col("nrm")).alias("cosine"),
    ).groupBy("query_id", "neighbor_id").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
) -> DataFrame:
    """Near-duplicate vector pairs: hyperplane-LSH candidates, exact verify.

    Candidates = pairs colliding in ≥1 of the L sign-projection band tables
    (equi-join on (table, bucket) — the only shuffle is constant rows per
    vector); verification = exact cosine ≥ threshold over the pair.
    Output (vec_a, vec_b, cosine), vec_a < vec_b.
    """
    from open_data_lakehouse_demo_spark.sources.io import materialize

    # base (vec + norm) feeds bucket generation and both verify sides —
    # materialize so the norm folds run once (signature-table shape)
    base = materialize(_with_norm(df, id_col, vec_col))
    # bucket stage = Arrow-batched matmul, proven bit-identical to the
    # lsh_bucket fold (see lsh_buckets_batch docstring + parity test);
    # materialized because BOTH sides of the candidate self-join read it —
    # without the reuse point the Python bucket pass runs twice (visible
    # as two ArrowEvalPython subtrees in the plan)
    buckets = materialize(
        base.select(
            "vid", F.posexplode(lsh_buckets_batch("vec")).alias("table_id", "bucket")
        )
    )
    cands = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["table_id", "bucket"])
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("vec_a"), F.col("y.vid").alias("vec_b"))
        .distinct()
    )
    a = base.select(
        F.col("vid").alias("vec_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vid").alias("vec_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cands.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
