"""Document chunking: split long documents into fixed-token windows with
overlap — the standard pre-tokenization step of a training-data pipeline
(context-window packing, embedding-model input limits).

Pure built-in expressions: tokenize once, enumerate chunk starts with
``sequence``, slice per chunk, explode.  One narrow pass, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens) — stride = chunk − overlap.

    Every token lands in ≥1 chunk; the final chunk may be short but is
    never empty; documents shorter than one chunk yield exactly one chunk.
    Scale: output fan-out ≈ tokens/(chunk−overlap) per doc, generated
    inside the scan stage — no shuffle at all until a downstream op needs
    one.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if overlap < 0:
        # a negative overlap makes stride > chunk_tokens, silently leaving
        # tokens between windows in NO chunk — the documented every-token-
        # covered invariant breaks with plausible-looking output
        raise ValueError(f"overlap must be >= 0, got {overlap}")
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks")).filter(
        F.size("__toks") > 0
    )
    # chunk starts: 1, 1+stride, ... while start <= max(size - overlap, 1)
    # (the last window still gains ≥ stride new tokens; short docs → [1])
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__toks") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / stride).cast("int").alias("chunk_idx"),
            F.slice("__toks", s, chunk_tokens).alias("chunk"),
        ),
    )
    exploded = toked.select(F.col(id_col), F.explode(chunks).alias("c"))
    return exploded.select(
        F.col(id_col),
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.concat_ws(" ", F.col("c.chunk")).alias("chunk_text"),
        F.size(F.col("c.chunk")).alias("n_tokens"),
    )
