"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct — the schema, partitioning, UDF signature and batch
shape are real and tested; the actual media decode is STUBBED because
the runtime image/audio libraries are not available in this
environment. ``decode_image_meta`` documents the seam: swap
``_fake_decode`` for a PIL/libav call and nothing else changes.

Scale notes: payloads stay in executor-side Arrow batches end to end
(never collected); mapInPandas streams record batches so one huge
binary row cannot blow the heap; downstream joins key on doc_id only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, width int, height int, format string"


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the canonical multimodal frame (doc_id, payload binary,
    media_type) — here payload is the utf-8 text bytes standing in for
    image bytes."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder.

    Real implementation (requires PIL/opencv — not in this container):

        from PIL import Image; im = Image.open(io.BytesIO(payload))
        return im.width, im.height, im.format

    The fake derives stable dims from the byte content so the plumbing
    is testable end to end.
    """
    first = payload[0] if payload else 0
    return 16 + first % 64, 16 + len(payload) % 64, "FAKE"


def decode_image_meta(frame: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: (doc_id, payload) →
    (doc_id, n_bytes, width, height, format). Arrow-batched; one
    Python crossing for the whole partition."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "format": [d[2] for d in dims],
                }
            )

    return frame.mapInPandas(op, schema=META_SCHEMA)


def frame_sample(frame: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per byte-window — the
    Spark-side shape of video frame extraction (explode to frames,
    process per frame, re-aggregate). Deterministic on byte length."""
    n_frames = F.greatest(
        (F.length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return frame.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
