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


def has_real_decoder() -> bool:
    """Runtime capability probe: True when PIL is importable in this
    environment (the container this engine ships in does not carry it)."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        return False
    return True


def has_ffmpeg() -> bool:
    """Runtime capability probe for audio/video: True when ffprobe (the
    ffmpeg suite's inspector) is on PATH.  Mirrors ``has_real_decoder``:
    the container this engine ships in does not carry ffmpeg, so the
    probe returns False here and the audio/video branch of
    ``real_decode`` upgrades itself automatically in any environment
    that provides it."""
    import shutil

    return shutil.which("ffprobe") is not None


def _ffprobe_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """ffprobe-backed audio/video metadata: (width, height, n_frames);
    audio reports (0, 0, #frames≈#packets? → stream nb_frames or 1)."""
    import json
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=f".{kind}") as tmp:
        tmp.write(payload)
        tmp.flush()
        out = subprocess.run(
            [
                "ffprobe", "-v", "error", "-print_format", "json",
                "-show_streams", tmp.name,
            ],
            capture_output=True,
            text=True,
            check=True,
        )
    streams = json.loads(out.stdout).get("streams", [])
    vstreams = [s for s in streams if s.get("codec_type") == "video"]
    s = vstreams[0] if vstreams else (streams[0] if streams else {})
    width = int(s.get("width", 0) or 0)
    height = int(s.get("height", 0) or 0)
    n_frames = int(s.get("nb_frames", 1) or 1)
    return width, height, n_frames


def real_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Capability-probed real decoder: PIL for images, ffprobe for
    audio/video.

    OPT-IN, not automatic: the default decoder stays ``fake_decode``
    (the registered media queries run over synthetic text-byte payloads
    whose oracles mirror the fake, so silently switching on library
    presence would break them on non-media bytes).  When the probes pass
    (``has_real_decoder()`` / ``has_ffmpeg()``), callers with real
    payloads select this via ``set_decoder(real_decode)``; in an
    environment without the library it raises the documented
    NotImplementedError.  The Spark-side plumbing (schema, Arrow
    batching, pruned projection) is identical for every decoder."""
    if kind == "image":
        if not has_real_decoder():
            raise NotImplementedError(
                "image decoding requires PIL, not available in this environment; "
                "pip install pillow, then set_decoder(real_decode)"
            )
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, int(getattr(im, "n_frames", 1))
    if not has_ffmpeg():
        raise NotImplementedError(
            "audio/video decoding requires ffmpeg (ffprobe), not available in "
            "this environment; install ffmpeg, then set_decoder(real_decode)"
        )
    return _ffprobe_decode(payload, kind)


_DECODER: Callable[[bytes, str], tuple[int, int, int]] = fake_decode


def set_decoder(fn: Callable[[bytes, str], tuple[int, int, int]]) -> None:
    global _DECODER
    _DECODER = fn


def _require_integral_id(df: DataFrame, id_col: str) -> None:
    """Every output schema here types the id as LongType under the FIXED
    name ``media_id`` (``id_col`` selects the INPUT column; it is renamed
    on output).  A non-integral id would die mid-task as an opaque
    ArrowTypeError — validate at call time instead."""
    t = {f.name: f.dataType.typeName() for f in df.schema.fields}.get(id_col)
    if t is None:
        raise ValueError(f"id column {id_col!r} not found in {df.columns}")
    if t not in ("long", "integer", "short", "byte"):
        raise ValueError(
            f"id column {id_col!r} must be integral (the output schemas "
            f"type it as LongType 'media_id'), got {t} — map string/uuid "
            "ids to a surrogate long (e.g. xxhash64) before the media ops"
        )


def decode_media(df: DataFrame, payload_col: str = "payload", kind_col: str = "kind",
                 id_col: str = "media_id", batch_size_hint: int = 256) -> DataFrame:
    """Decode payload bytes → typed metadata via mapInPandas.

    Scale: Arrow batches flow per partition; only the projected columns
    (id, kind, payload) are read — column pruning keeps sibling metadata
    scans payload-free.  Repartition upstream if payload skew creates
    straggler partitions.  ``batch_size_hint`` bounds how many payloads
    are decoded per emitted output frame: incoming Arrow batches (sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k) are
    re-chunked to at most this many rows so peak per-task memory is
    ~hint × payload size even when the session batch size is large.
    """
    if batch_size_hint < 1:
        raise ValueError(f"batch_size_hint must be >= 1, got {batch_size_hint}")
    _require_integral_id(df, id_col)
    decoder = _DECODER

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size_hint):
                chunk = pdf.iloc[lo : lo + batch_size_hint]
                out = []
                for mid, kind, payload in zip(chunk[id_col], chunk[kind_col], chunk[payload_col]):
                    if payload is None:
                        # a MISSING payload is not a 0-byte file: metadata
                        # is NULL, not the dims of an empty decode
                        out.append((mid, kind, None, None, None, None))
                        continue
                    b = bytes(payload)
                    w, h, nf = decoder(b, kind)
                    out.append((mid, kind, len(b), w, h, nf))
                yield pd.DataFrame(
                    out, columns=["media_id", "kind", "n_bytes", "width", "height", "n_frames"]
                ).astype({"n_bytes": "Int64", "width": "Int32", "height": "Int32",
                          "n_frames": "Int32"})

    return df.select(id_col, kind_col, payload_col).mapInPandas(decode_batches, DECODED_META_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_media(df: DataFrame, target_w: int = 224, target_h: int = 224,
                 payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Resize step (stubbed): real impl decodes + resamples pixels; the
    deterministic fake scales byte length by the area ratio against the
    fake-decoded dims.  Plumbing (Arrow batches, schema, pruned projection)
    is the real, tested part."""
    if target_w < 1 or target_h < 1:
        raise ValueError(f"target dims must be >= 1, got {target_w}x{target_h}")
    _require_integral_id(df, id_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    # missing payload: requested dims are still reported,
                    # but there are no bytes to scale — NULL, not 0
                    out.append((mid, target_w, target_h, None))
                    continue
                b = bytes(payload)
                w, h, _ = fake_decode(b, "image")
                ratio = (target_w * target_h) / max(w * h, 1)
                out.append((mid, target_w, target_h, int(len(b) * ratio)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "n_bytes_out"]).astype(
                {"width": "int32", "height": "int32", "n_bytes_out": "Int64"}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset_bytes", LongType()),
    ]
)


def frame_sample(df: DataFrame, every_nth: int = 4, payload_col: str = "payload",
                 kind_col: str = "kind", id_col: str = "media_id") -> DataFrame:
    """Frame sampling (stubbed): emits one row per sampled frame — the
    1→N exploding UDTF shape for video.  Fake frames are byte offsets at
    fixed stride; a real impl seeks keyframes."""
    if every_nth < 1:
        # a negative stride silently emits ZERO frames for every row
        # (plausible empty result); 0 dies mid-task inside range()
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    _require_integral_id(df, id_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, kind, payload in zip(pdf[id_col], pdf[kind_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                _, _, n_frames = fake_decode(b, kind)
                stride = max(len(b) // max(n_frames, 1), 1)
                for i in range(0, n_frames, every_nth):
                    out.append((mid, i, i * stride))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_offset_bytes"]).astype(
                {"frame_idx": "int32"}
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16, payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """Feature extraction (stubbed): payload → dense float vector, the
    embedding column similarity ops consume.  Fake features hash byte
    windows; a real impl runs a vision/audio encoder over the batch."""
    if dim < 1:
        # dim=0 streams plausible empty embeddings for NULL payloads then
        # ZeroDivisionErrors mid-task on the first non-empty one
        raise ValueError(f"dim must be >= 1, got {dim}")
    _require_integral_id(df, id_col)
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                v = np.zeros(dim, dtype=np.float32)
                for i, byte in enumerate(b):
                    v[i % dim] += byte
                n = np.linalg.norm(v)
                ids.append(mid)
                vecs.append((v / n if n > 0 else v).tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [StructField("media_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    return df.select(id_col, payload_col).mapInPandas(batches, schema)


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


#: aHash width — 60 bits keeps the packed hash positive in an int64 and
#: matches the repo's md5_hash60 headroom convention
PHASH_BITS = 60

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("phash", LongType()),
    ]
)


def ahash_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    bits: int = PHASH_BITS,
) -> DataFrame:
    """Average-hash perceptual fingerprint (Krawetz's aHash, the
    classical perceptual-dedup baseline) adapted to the stub-decoder
    frame: the "pixel grid" is ``bits`` payload bytes sampled at offsets
    ``floor(i·n/bits)``, the threshold is the exact integer mean
    (floor), bit i set iff sample ≥ mean.  With a real image decoder the
    same signature hashes an 8×8 grayscale downsample — the Spark-side
    plumbing (Arrow batches over ``mapInPandas``, payload bytes never
    shuffling) is identical.

    Pure integer arithmetic on deterministic byte samples, so a SQL
    oracle replays it via hex-string slicing (``hex(encode(text))``).
    Empty and NULL payloads drop (no bytes → no perceptual content).
    """
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62] (int64 packing), got {bits}")
    _require_integral_id(df, id_col)
    proj = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                b = bytes(payload)
                n = len(b)
                samp = [b[i * n // bits] for i in range(bits)]
                mean = sum(samp) // bits
                h = 0
                for i, s in enumerate(samp):
                    if s >= mean:
                        h |= 1 << i
                ids.append(mid)
                sizes.append(n)
                hashes.append(h)
            yield pd.DataFrame({"media_id": ids, "n_bytes": sizes, "phash": hashes})

    return proj.mapInPandas(hash_batches, PHASH_SCHEMA)
