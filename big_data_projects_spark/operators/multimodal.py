"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads ride as a BinaryType column next to
a StructType metadata column (kind, n_bytes, digest). All Spark-side
plumbing — schema, partitioning, Arrow batch shape through mapInPandas
— is real and tested. Decode coverage: PPM (P6) images and RIFF/WAVE
PCM audio are decoded FOR REAL by the pure-Python parsers below
(header parse, raster/sample extraction, per-channel features,
nearest-neighbor resize); compressed formats (JPEG/PNG/MP3/MP4-class)
raise NotImplementedError because codec libraries are not in this
container — at deployment `_decode_payload`/`_modality_features` are
the swap points for PIL/ffmpeg.

Feature extraction runs as an Arrow-batched mapInPandas (one Python
round trip per batch, never per row), yielding fixed-width
array<double> features suitable for the similarity operators.
"""

from __future__ import annotations

import struct
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


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python P6 PPM (binary portable pixmap) parser: header
    tokens (magic, width, height, maxval) with whitespace + '#'
    comment handling, then the interleaved RGB raster (1 byte/sample
    for maxval < 256, else 2). Returns (width, height, maxval, raster).
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval and raster
    w, h, maxval = tokens
    n = w * h * 3 * (1 if maxval < 256 else 2)
    raster = payload[pos : pos + n]
    if len(raster) < n:
        raise ValueError("truncated PPM raster")
    return w, h, maxval, raster


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Minimal RIFF/WAVE PCM parser: walks the chunk list for fmt +
    data, decodes 8-bit (unsigned, recentred) or 16-bit LE samples.
    Returns (n_channels, sample_rate, bits_per_sample, samples).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError("only uncompressed PCM 8/16-bit supported")
    if bits == 16:
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    else:
        samples = [b - 128 for b in data]
    return n_ch, rate, bits, samples


def resize_ppm(payload: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor resample of an 8-bit P6 image to tw x th —
    a REAL pixel-level resize, emitting a valid P6 payload."""
    w, h, maxval, raster = decode_ppm(payload)
    if maxval >= 256:
        raise NotImplementedError("16-bit-per-sample PPM resize")
    out = bytearray()
    for ty in range(th):
        sy = ty * h // th
        for tx in range(tw):
            sx = tx * w // tw
            i = (sy * w + sx) * 3
            out += raster[i : i + 3]
    return b"P6\n%d %d\n%d\n" % (tw, th, maxval) + bytes(out)


def _decode_payload(payload: bytes, kind: str) -> bytes:
    """Decode a payload to its raw content bytes: PPM images → RGB
    raster, WAVE audio → PCM data samples, text → the bytes as-is.

    STUB only for compressed formats (JPEG/PNG/MP3/MP4-class): those
    require codec libraries not in this container and raise — callers
    fall back to byte-level passthrough with a 'stubbed' status. At
    deployment this is the swap point for PIL/ffmpeg.
    """
    if kind == "image":
        if payload.startswith(b"P6"):
            return decode_ppm(payload)[3]
        raise NotImplementedError("image decode beyond P6 PPM needs codec libs")
    if kind == "audio":
        if payload[:4] == b"RIFF":
            _, _, bits, samples = decode_wav(payload)
            return struct.pack(f"<{len(samples)}h", *samples)
        raise NotImplementedError("audio decode beyond RIFF/WAVE needs codec libs")
    if kind == "video":
        raise NotImplementedError("video decode needs codec libs (ffmpeg-class)")
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


def _ppm_features(payload: bytes) -> list[float]:
    """Real image features from a decoded 8-bit P6: dimensions,
    per-channel means, global min/max, pixel count."""
    w, h, maxval, raster = decode_ppm(payload)
    if maxval >= 256:
        raise NotImplementedError("16-bit-per-sample PPM features")
    n = w * h
    return [
        float(w),
        float(h),
        sum(raster[0::3]) / n,
        sum(raster[1::3]) / n,
        sum(raster[2::3]) / n,
        float(min(raster)),
        float(max(raster)),
        float(n),
    ]


def _wav_features(payload: bytes) -> list[float]:
    """Real audio features from decoded PCM: sample count, rate, mean/
    min/max amplitude, channel count, bit depth, frame count."""
    n_ch, rate, bits, samples = decode_wav(payload)
    n = len(samples)
    return [
        float(n),
        float(rate),
        (sum(samples) / n) if n else 0.0,
        float(min(samples)) if n else 0.0,
        float(max(samples)) if n else 0.0,
        float(n_ch),
        float(bits),
        float(n // n_ch),
    ]


def _modality_features(payload: bytes, kind: str) -> tuple[str, list[float]]:
    """(decode_status, features): real decoders where the format
    allows, NotImplementedError for codec-class formats (caller falls
    back to byte features with status 'stubbed')."""
    if kind == "image":
        if payload.startswith(b"P6"):
            return "decoded", _ppm_features(payload)
        raise NotImplementedError("image features beyond P6 PPM")
    if kind == "audio":
        if payload[:4] == b"RIFF":
            return "decoded", _wav_features(payload)
        raise NotImplementedError("audio features beyond RIFF/WAVE")
    if kind == "video":
        raise NotImplementedError("video features need codec libs")
    return "decoded", _byte_features(payload)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas featurizer over (doc_id, payload, meta) batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            feats, status = [], []
            for payload, kind in zip(pdf["payload"], kinds):
                raw = bytes(payload)
                try:
                    st, fv = _modality_features(raw, kind)
                except NotImplementedError:
                    st, fv = "stubbed", _byte_features(raw)
                status.append(st)
                feats.append(fv)
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

    P6 PPM images get a REAL nearest-neighbor pixel resample (a valid
    P6 of the target size comes out). Codec-class formats (JPEG/MP4)
    pass through with resize_status='stubbed' — no codec libs in this
    container. Text/bytes payloads are 'resized' by deterministic
    truncation/padding to width·height bytes so the batch shape,
    schema, and payload round-trip are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            out_payload, status = [], []
            for payload, kind in zip(pdf["payload"], kinds):
                raw = bytes(payload)
                try:
                    if kind == "image" and raw.startswith(b"P6"):
                        resized = resize_ppm(raw, width, height)
                    else:
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


def dhash_raster(payload: bytes) -> str:
    """Perceptual difference hash (dHash, Krawetz 2013) of a P6 image:
    nearest-resample to 9x8, integer grayscale (r+g+b)//3 per pixel,
    then 64 bits of gray[r][c] < gray[r][c+1] — returned as a 64-char
    '0'/'1' string. Small photometric noise flips few bits (hamming
    distance stays low), which is what makes it a NEAR-dup signature
    where md5 is an exact one. Python path for decoded rasters; the
    byte-level twin (operators/multimodal.dhash64) runs the identical
    comparison math JVM-side over raw payload bytes."""
    small = resize_ppm(payload, 9, 8)
    _, _, _, raster = decode_ppm(small)
    gray = [
        (raster[i] + raster[i + 1] + raster[i + 2]) // 3
        for i in range(0, len(raster), 3)
    ]
    bits = []
    for r in range(8):
        for c in range(8):
            bits.append("1" if gray[r * 9 + c] < gray[r * 9 + c + 1] else "0")
    return "".join(bits)


def with_dhash64(
    df: DataFrame, payload_col: str = "payload", out: str = "phash"
) -> DataFrame:
    """Byte-level dHash signature over ANY binary payload (JVM
    codegen, zero Python): the first 72 bytes (zero-padded) are read
    as a 9x8 single-channel raster and hashed with the identical
    adjacent-comparison math as dhash_raster — 64 bits of
    byte[r][c] < byte[r][c+1] as a '0'/'1' string. For non-image
    payloads this is a locality-sensitive byte signature (neighbouring
    bytes compare); for pre-rasterized single-channel 9x8 thumbnails
    it IS the perceptual dHash. Hex rendering is uppercase in both
    Spark and DuckDB, so the expression is oracle-portable. Staged as
    real columns so the 72-byte decode runs once per row, not once per
    output bit."""
    hx = F.substring(
        F.concat(F.hex(F.col(payload_col)), F.lit("00" * 72)), 1, 144
    )
    staged = df.withColumn("__dh_hx", hx).withColumn(
        "__dh_g",
        F.transform(
            F.sequence(F.lit(1), F.lit(72)),
            lambda i: F.conv(
                F.col("__dh_hx").substr(
                    (i - F.lit(1)) * F.lit(2) + F.lit(1), F.lit(2)
                ),
                16,
                10,
            ).cast("int"),
        ),
    )
    bit = lambda k: F.when(  # noqa: E731
        F.element_at(F.col("__dh_g"), (k / F.lit(8)).cast("int") * 9
                     + (k % F.lit(8)) + F.lit(1))
        < F.element_at(F.col("__dh_g"), (k / F.lit(8)).cast("int") * 9
                       + (k % F.lit(8)) + F.lit(2)),
        F.lit("1"),
    ).otherwise(F.lit("0"))
    return (
        staged.withColumn(
            out,
            F.array_join(
                F.transform(F.sequence(F.lit(0), F.lit(63)), bit), ""
            ),
        )
        .drop("__dh_hx", "__dh_g")
    )
