"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
container — see ``decode_stub``); everything Spark-side is real and
tested: schema, batch iteration, partitioning, and the UDF signatures a
production decode would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, mime string, n_bytes long"
)
FEATURE_SCHEMA = MEDIA_SCHEMA + ", checksum long, feat array<double>"


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fabricate a deterministic opaque binary payload per document (the
    utf-8 bytes of its text) with typed metadata — the multimodal table
    shape a real pipeline would read from a lake of media blobs."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_stub(payload: bytes, modality: str) -> np.ndarray:
    """Where a real decoder (PIL/torchaudio/ffmpeg) would run. The
    deterministic fake: interpret the first 256 bytes as uint8 and
    average over 8 equal strides → an 8-dim 'feature'. Raises for
    unknown modalities like a real decoder would."""
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    head = np.frombuffer(payload[:256], dtype=np.uint8).astype(np.float64)
    if head.size == 0:
        return np.zeros(8)
    pad = np.zeros(256)
    pad[: head.size] = head
    return pad.reshape(8, 32).mean(axis=1)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payloads:
    ``mapInPandas`` keeps whole batches in pandas (vectorized checksum;
    the decode loop is the stub's per-item boundary, exactly where a
    vectorized decoder would slot in)."""

    # bind the decoder into the closure as a LOCAL so the whole thing
    # pickles by value (workers never import this package); the module-
    # level decode_stub stays the documented/testable entry point
    _decode_src = decode_stub.__code__
    import types as _types

    _local_decode = _types.FunctionType(_decode_src, {"np": np, "NotImplementedError": NotImplementedError})

    def _batch_checksums(payloads) -> np.ndarray:
        # sum of the first 64 bytes per payload, mod 2^31 — computed on
        # the whole Arrow batch at once: binary_slice kernel → flat
        # uint8 buffer → prefix-sum differences. No per-row Python.
        import pyarrow as pa
        import pyarrow.compute as pc

        # large_binary: 64-bit offsets, so a >2 GB batch cannot force
        # pandas->arrow auto-chunking (pa.binary's 32-bit offsets would
        # return a ChunkedArray here, which has no .buffers())
        sliced = pc.binary_slice(pa.array(payloads, type=pa.large_binary()), 0, 64)
        offsets = np.frombuffer(sliced.buffers()[1], dtype=np.int64)
        data = np.frombuffer(
            sliced.buffers()[2] or b"", dtype=np.uint8
        )
        csum = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
        return (csum[offsets[1:]] - csum[offsets[:-1]]) % (2**31)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            pdf = pdf.copy()
            pdf["checksum"] = _batch_checksums(payloads)
            # the decode loop is the stub's per-item boundary — exactly
            # where a real (vectorized) decoder would slot in
            pdf["feat"] = [
                _local_decode(p, m).tolist()
                for p, m in zip(payloads, pdf["modality"])
            ]
            yield pdf

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, modality string, payload binary, mime string, n_bytes long"
)


def resize_stub(payload: bytes, target_bytes: int) -> bytes:
    """Where a real resize (PIL thumbnail / audio downsample / video
    transcode) would run. The deterministic fake: stride-sample the
    byte stream down to ``target_bytes`` (every k-th byte) — preserves
    the 'smaller derived artifact of the same payload' contract the
    Spark-side plumbing cares about."""
    if len(payload) <= target_bytes:
        return payload
    stride = len(payload) // target_bytes
    return payload[::stride][:target_bytes]


def resize_media(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Arrow-batched resize over opaque payloads: same schema out as in
    (payload replaced by its downsampled derivative, n_bytes updated) so
    resize composes with extract_features / sample_frames."""
    _resize_src = resize_stub.__code__
    import types as _types

    _local_resize = _types.FunctionType(_resize_src, {"len": len})

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _local_resize(p, target_bytes) for p in pdf["payload"]
            ]
            pdf["n_bytes"] = [len(p) for p in pdf["payload"]]
            yield pdf

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_no int, frame_off long, frame_checksum long"


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_size: int = 32
) -> DataFrame:
    """Frame sampling over opaque video/audio payloads: ``n_frames``
    evenly-strided ``frame_size``-byte windows per payload (fewer when
    the payload is short), emitted as (media_id, frame_no, offset,
    checksum). A real decoder would replace the checksum with decoded
    pixels — the Spark-side plumbing (batch iteration, per-row frame
    fan-out, long-form output schema) is exactly what it would need.
    Deterministic byte arithmetic, so a SQL oracle replays it."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_off": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                k = min(n_frames, max(n // frame_size, 1 if n else 0))
                stride = max((n - frame_size) // max(k - 1, 1), 1) if k > 1 else 0
                for f in range(k):
                    off = f * stride
                    window = payload[off : off + frame_size]
                    s = int(np.frombuffer(window, dtype=np.uint8).sum())
                    out["media_id"].append(int(mid))
                    out["frame_no"].append(f)
                    out["frame_off"].append(off)
                    out["frame_checksum"].append(s)
            yield pd.DataFrame(out)

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)
