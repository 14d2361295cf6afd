"""Overlapping token-window document chunking (PIPE9).

The retrieval-ingestion twin of the training-side concat-and-chunk packer
(operators/sharding.py PIPE6): RAG/embedding pipelines split each document
into fixed-size token windows with overlap so no semantic boundary is lost
at a chunk edge, then embed/store each chunk keyed (doc_id, chunk_id).

Spark-first shape: tokenization, window arithmetic and slicing are pure
Column expressions inside one codegen scan; the only row growth is the
chunk fan-out itself (explode — a generator, not a shuffle). Map-only:
chunking 100 TB is embarrassingly parallel and needs zero shuffles; the
downstream embed step batches per partition.

Window math (the standard recipe, e.g. LangChain/LlamaIndex splitters):
stride = chunk_tokens - overlap; chunk i covers tokens
[i*stride, i*stride + chunk_tokens); the last window is the final partial
slice, and a document shorter than one window yields exactly one chunk.
n_chunks = 1 + ceil(max(0, n - chunk_tokens) / stride) — every token index
is covered, consecutive chunks share exactly `overlap` tokens (except a
shorter final remainder).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text) — one row per overlapping
    token window; see module docstring for the window math."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    from open_data_lakehouse_demo_spark.operators.dedup import tokenize
    from open_data_lakehouse_demo_spark.sources.io import spread

    stride = chunk_tokens - overlap
    toks: Column = tokenize(F.col(text_col))
    n = F.size(toks)
    # ceil over ints: (x + stride - 1) div stride, clamped so empty/short
    # docs still yield exactly one (possibly empty-text) chunk
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("tk"),
        ),
    )
    return (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.tk").alias("n_tokens"),
            F.concat_ws(" ", F.col("c.tk")).alias("chunk_text"),
        )
    )
