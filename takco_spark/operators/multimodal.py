"""Multimodal columns: media as opaque binary + typed metadata.

The interleaved-document model carries media as spans (kind='media',
media_ref). This module provides the Spark-side plumbing for the media
PAYLOADS a production pipeline attaches to those refs:

    media(media_ref: string, kind: string, payload: binary,
          meta: struct<mime:string, width:int, height:int, duration_ms:int>)

Decode / feature-extraction run as ``mapInPandas`` Arrow-batch UDFs. The
codec kernel REALLY decodes 24-bit uncompressed BMP and binary PPM (P6)
payloads in pure numpy and embeds them as a 4×4 block-mean grayscale
thumbnail; formats needing external codec libraries (JPEG/PNG/audio/video —
not shipped in this container) fall back to a deterministic hash embedding
when ``allow_fake=True`` and ``NotImplementedError`` otherwise. The schema,
partitioning, UDF signature and batch shape are identical for both paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<mime:string,width:int,height:int,duration_ms:int>"
)

FEATURE_SCHEMA = "media_ref string, feature array<float>, decode_ok boolean"

#: feature dimensionality of the (stubbed) extractor
FEATURE_DIM = 16


def media_refs(documents: DataFrame) -> DataFrame:
    """Distinct media references from the span stream — the join key between
    the document table and the media payload table."""
    return (
        documents.select(F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "media") & (F.col("s.media_ref") != ""))
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )


def synth_media_table(documents: DataFrame, payload_bytes: int = 64) -> DataFrame:
    """Deterministic fake payload table for every media_ref in the corpus
    (sandbox stand-in for an object-store-backed Iceberg media table).

    Payload = repeated xxhash64-derived bytes; metadata derived from the ref.
    Pure Column algebra — the binary column is real BinaryType.
    """
    refs = media_refs(documents)
    return refs.select(
        "media_ref",
        F.lit("image").alias("kind"),
        F.expr(
            f"cast(repeat(substring(sha2(media_ref, 256), 1, 8), {payload_bytes // 8}) as binary)"
        ).alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.pmod(F.xxhash64("media_ref"), F.lit(640)).cast("int").alias("width"),
            F.pmod(F.xxhash64("media_ref", F.lit(1)), F.lit(480)).cast("int").alias("height"),
            F.lit(0).alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 RGB. Pure numpy: header
    fields are fixed little-endian offsets; rows are 4-byte padded and
    stored bottom-up when height > 0; pixels are BGR."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError("only 24-bit uncompressed BMP is supported")
    bottom_up, h = h > 0, abs(h)
    row = (w * 3 + 3) & ~3
    if len(b) < off + row * h:
        raise ValueError("truncated BMP payload")
    a = (
        np.frombuffer(b, np.uint8, row * h, off)
        .reshape(h, row)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if bottom_up:
        a = a[::-1]
    return a[..., ::-1]  # BGR → RGB


def _decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (H, W, 3) uint8 RGB. Header is three
    whitespace-separated ints with ``#`` comment support."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        vals.append(int(b[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxv = vals
    if maxv != 255 or w <= 0 or h <= 0 or len(b) < pos + w * h * 3:
        raise ValueError("unsupported or truncated PPM payload")
    return np.frombuffer(b, np.uint8, w * h * 3, pos).reshape(h, w, 3)


def _image_features(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 → FEATURE_DIM floats in [0, 1]: mean grayscale over a
    4×4 block grid — a deterministic, resolution-independent thumbnail
    embedding (the 'resize → embed' step of a real codec pipeline)."""
    g = img.astype(np.float32).mean(axis=2)
    hh, ww = g.shape
    gs = 4
    ys = (np.arange(gs + 1) * hh) // gs
    xs = (np.arange(gs + 1) * ww) // gs
    out = np.zeros(FEATURE_DIM, np.float32)
    k = 0
    for i in range(gs):
        for j in range(gs):
            block = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            out[k] = float(block.mean()) / 255.0 if block.size else 0.0
            k += 1
    return out


def _decode_kernel(payload: bytes, allow_fake: bool) -> np.ndarray:
    """The codec boundary. BMP (24-bit uncompressed) and PPM (P6) payloads
    are REALLY decoded — pure numpy, no external codec libs — then embedded
    via :func:`_image_features`. Other formats (JPEG/PNG/audio/video) need
    libraries this container doesn't ship: with ``allow_fake`` a
    deterministic hash embedding stands in, else NotImplementedError."""
    if payload[:2] == b"BM":
        return _image_features(_decode_bmp(payload))
    if payload[:2] == b"P6":
        return _image_features(_decode_ppm(payload))
    if not allow_fake:
        raise NotImplementedError(
            "payload is not BMP/PPM; other codecs need libraries not present "
            "in this environment — run with allow_fake=True for the "
            "deterministic stub"
        )
    h = np.frombuffer(payload[: FEATURE_DIM * 4].ljust(FEATURE_DIM * 4, b"\0"),
                      dtype=np.uint32).astype(np.float32)
    return (h % 1000.0) / 1000.0


def extract_media_features(media: DataFrame, allow_fake: bool = True,
                           batch_partitions: int | None = None) -> DataFrame:
    """payload → fixed-dim feature vector via mapInPandas (Arrow batches).

    The real codec would be dropped into ``_decode_kernel`` unchanged: the
    Spark-side contract (schema in/out, iterator-of-batches, per-batch numpy)
    is what this function owns and what the tests pin down.
    """
    if batch_partitions:
        media = media.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_decode_kernel(bytes(payload), allow_fake).tolist())
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:
                    feats.append([0.0] * FEATURE_DIM)
                    oks.append(False)
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "feature": feats, "decode_ok": oks}
            )

    return media.select("media_ref", "payload").mapInPandas(run, FEATURE_SCHEMA)


def attach_media_features(documents: DataFrame, features: DataFrame) -> DataFrame:
    """Join per-ref media features back onto the span stream: one row per
    (doc_id, media span) with its feature vector — downstream multimodal
    scoring consumes this long format."""
    spans = documents.select("doc_id", F.explode("spans").alias("s")).where(
        F.col("s.kind") == "media"
    )
    return spans.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    ).join(features, "media_ref", "left")
