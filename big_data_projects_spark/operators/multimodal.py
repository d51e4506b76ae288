"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads ride as a BinaryType column next to
a StructType metadata column (kind, n_bytes, digest). All Spark-side
plumbing — schema, partitioning, Arrow batch shape through mapInPandas
— is real and tested; the actual media *decode* is stubbed because the
container has no image/audio libraries (clearly marked below). At
deployment, `_decode_payload` is the only function to replace.

Feature extraction runs as an Arrow-batched mapInPandas (one Python
round trip per batch, never per row), yielding fixed-width
array<double> features suitable for the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id long, kind string, n_bytes long, decode_status string, "
    "features array<double>"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", kind: str = "text"
) -> DataFrame:
    """Wrap a source column as (payload binary, meta struct) — the
    carrier format for any modality."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("digest"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes, kind: str) -> bytes:
    """STUB: media decode. Real deployments plug in PIL/ffmpeg/etc.

    Raises for true media kinds; passes text/bytes through so the
    surrounding Arrow plumbing is exercised end-to-end.
    """
    if kind in ("image", "audio", "video"):
        raise NotImplementedError(
            f"decode for kind={kind!r} requires media libraries not in this "
            "container; deterministic byte-level features are produced instead"
        )
    return payload


def _byte_features(payload: bytes) -> list[float]:
    """Deterministic byte-level stand-in features (length, endpoints,
    modular byte sums) — a fake featurizer with a real vector shape."""
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    total = sum(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(total % 256),
        float(total % 9973),
        float(payload[n // 2]),
        float(min(payload)),
        float(max(payload)),
    ]


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas featurizer over (doc_id, payload, meta) batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            feats, status = [], []
            for payload, kind in zip(pdf["payload"], kinds):
                raw = bytes(payload)
                try:
                    decoded = _decode_payload(raw, kind)
                    status.append("decoded")
                except NotImplementedError:
                    decoded = raw
                    status.append("stubbed")
                feats.append(_byte_features(decoded))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": kinds,
                    "n_bytes": pdf["meta"].map(lambda m: int(m["n_bytes"])),
                    "decode_status": status,
                    "features": feats,
                }
            )

    return binary_df.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, kind string, n_bytes long, target_w int, target_h int, "
    "resize_status string, payload binary"
)


def resize_payload(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: 1 row in → 1 row out, payload transformed.

    STUB at the pixel level (no image libs in this container): media
    kinds raise inside `_decode_payload` and pass through unchanged with
    resize_status='stubbed'; text/bytes payloads are 'resized' by
    deterministic truncation/padding to width·height bytes so the
    batch shape, schema, and payload round-trip are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            out_payload, status = [], []
            for payload, kind in zip(pdf["payload"], kinds):
                raw = bytes(payload)
                try:
                    decoded = _decode_payload(raw, kind)
                    resized = (decoded + b"\x00" * target)[:target]
                    status.append("resized")
                except NotImplementedError:
                    resized = raw
                    status.append("stubbed")
                out_payload.append(resized)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": kinds,
                    "n_bytes": [len(p) for p in out_payload],
                    "target_w": width,
                    "target_h": height,
                    "resize_status": status,
                    "payload": out_payload,
                }
            )

    return binary_df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id long, kind string, frame_index int, frame_ms long, "
    "n_bytes long, payload binary"
)


def sample_frames(binary_df: DataFrame, n_frames: int = 3, fps: float = 1.0) -> DataFrame:
    """mapInPandas frame sampler: 1 row in → n_frames rows out — the
    fan-out batch shape a video pipeline needs (each emitted row is one
    frame with its timestamp).

    STUB at the codec level: real video kinds would be ffmpeg-decoded;
    here frames are deterministic equal byte-slices of the payload, so
    the 1→N Arrow plumbing, per-frame metadata, and downstream
    partitioning are all real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "kind", "frame_index", "frame_ms", "n_bytes", "payload")}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                raw = bytes(payload)
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    frame = raw[i * step : (i + 1) * step]
                    rows["doc_id"].append(doc_id)
                    rows["kind"].append(meta["kind"])
                    rows["frame_index"].append(i)
                    rows["frame_ms"].append(int(i * 1000 / fps))
                    rows["n_bytes"].append(len(frame))
                    rows["payload"].append(frame)
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(run, schema=FRAMES_SCHEMA)
