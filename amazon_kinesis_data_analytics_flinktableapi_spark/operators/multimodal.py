"""Multimodal columns: opaque binary payloads + typed metadata.

Convention (schemas.MEDIA_SCHEMA): image/audio/video travel as ``binary``
payload columns with string metadata; all per-byte work happens in
Arrow-batched Pandas functions over ``mapInPandas`` so 100 TB of payload
bytes stream through executors batch-wise and never concentrate on the
driver.

The decode step itself is STUBBED — image/audio libraries are not in this
container — behind ``set_decoder``: the default ``fake_decode`` derives
deterministic pseudo-metadata from the byte content, and a real decoder
(PIL/ffmpeg) plugs in without touching the Spark plumbing (schema,
partitioning, UDF signature, batch shape are the real, tested parts).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a real media decoder: derives
    (width, height, n_frames) purely from payload length so results are
    reproducible and oracle-checkable.  A real decoder returns the same
    tuple from actual pixels/samples."""
    n = len(payload)
    width = 64 + n % 577
    height = 64 + (n * 31) % 353
    n_frames = 1 if kind == "image" else 1 + n % 24
    return width, height, n_frames


def real_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Placeholder for the PIL/ffmpeg-backed decoder (libs not in this
    container)."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg, not available in this environment; "
        "install and set_decoder(real_decode_impl)"
    )


_DECODER: Callable[[bytes, str], tuple[int, int, int]] = fake_decode


def set_decoder(fn: Callable[[bytes, str], tuple[int, int, int]]) -> None:
    global _DECODER
    _DECODER = fn


def decode_media(df: DataFrame, payload_col: str = "payload", kind_col: str = "kind",
                 id_col: str = "media_id", batch_size_hint: int = 256) -> DataFrame:
    """Decode payload bytes → typed metadata via mapInPandas.

    Scale: Arrow batches flow per partition; only the projected columns
    (id, kind, payload) are read — column pruning keeps sibling metadata
    scans payload-free.  Repartition upstream if payload skew creates
    straggler partitions.
    """
    decoder = _DECODER

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf[id_col], pdf[kind_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, nf = decoder(b, kind)
                out.append((mid, kind, len(b), w, h, nf))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "width", "height", "n_frames"]
            ).astype({"width": "int32", "height": "int32", "n_frames": "int32"})

    return df.select(id_col, kind_col, payload_col).mapInPandas(decode_batches, DECODED_META_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from ``documents`` (the container
    has no real media fixtures): payload = UTF-8 text bytes, kind cycles
    image/audio/video by doc_id.  Gives the multimodal plumbing a real
    binary column with verifiable byte lengths."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
