"""Image-column operators (prompt: multimodal binary columns —
decode / resize as Pandas UDFs over mapInPandas).

No image codec library ships in this container, so *format* decoding
is pluggable: `RawCodec` (the deterministic fake — payload is raw
row-major grayscale bytes of a declared width×height) is fully real
math, and `PilCodec` is the marked stub where Pillow slots in. The
RESIZE KERNEL ITSELF IS REAL (vectorized nearest-neighbor index
gather) and runs unchanged whichever codec decodes the bytes.

Scale: the operator is mapInPandas over Arrow batches — images never
individually cross a Python call boundary, and per-batch memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch. At 100 TB
the input is a binaryFile/parquet scan partitioned by file; resize is
embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Protocol

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class ImageCodec(Protocol):
    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        """bytes → (height, width) uint8 array."""
        ...

    def encode(self, img: np.ndarray) -> bytes:
        """(h, w) uint8 array → bytes."""
        ...


class RawCodec:
    """Deterministic fake format: payload = raw row-major grayscale
    bytes. Short payloads are zero-padded, long ones truncated, so any
    byte string 'decodes' — the dataflow is testable on the documents
    fixture without a codec library."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        buf = np.frombuffer(payload, dtype=np.uint8)
        need = width * height
        if len(buf) < need:
            buf = np.pad(buf, (0, need - len(buf)))
        return buf[:need].reshape(height, width)

    def encode(self, img: np.ndarray) -> bytes:
        return img.astype(np.uint8).tobytes()


class PilCodec:
    """Real-codec stub: wire Pillow here (not installed in this
    container). The resize kernel and Spark plumbing need no change."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError("install Pillow: Image.open(BytesIO(payload))")

    def encode(self, img: np.ndarray) -> bytes:
        raise NotImplementedError("install Pillow: Image.fromarray(img).save(...)")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize: one index gather, no loops.
    Pixel centers map via floor((i + 0.5) * in/out) — the standard
    half-pixel convention, deterministic for exact tests."""
    in_h, in_w = img.shape
    rows = np.minimum(
        ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64), in_h - 1
    )
    cols = np.minimum(
        ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64), in_w - 1
    )
    return img[np.ix_(rows, cols)]


_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, payload binary, mean_px double"
)


def resize_images(
    images: DataFrame,
    out_w: int,
    out_h: int,
    codec: ImageCodec | None = None,
) -> DataFrame:
    """Resize every image payload to (out_w, out_h).

    Input columns: doc_id long, width int, height int, payload binary.
    Output adds the resized payload plus its mean pixel (a cheap
    content fingerprint for tests/monitoring). Codec defaults to the
    RawCodec fake; swap PilCodec (or any ImageCodec) for real formats.
    """
    cdc = codec or RawCodec()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h, payload in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                img = cdc.decode(bytes(payload), int(w), int(h))
                out = resize_nearest(img, out_w, out_h)
                rows.append(
                    (
                        doc_id,
                        out_w,
                        out_h,
                        cdc.encode(out),
                        round(float(out.mean()), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "payload", "mean_px"],
            )

    return images.mapInPandas(kernel, _RESIZE_SCHEMA)
