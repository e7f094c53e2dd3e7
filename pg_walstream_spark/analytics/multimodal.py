"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched feature extraction.

The decode tier is REAL for two container formats — PPM (P6) and 24-bit
uncompressed BMP decode in pure numpy (``decode_ppm``/``decode_bmp``,
dispatched by ``decode_image`` on magic bytes), covering header parsing,
BGR order, bottom-up rows and 4-byte row padding. Other formats (JPEG,
PNG, …) fall back to PIL when importable; this container ships no image
library, so they raise NotImplementedError. ``byte_histogram_features``
remains the deterministic embed stand-in. The Spark-side plumbing — binary
column schema, metadata struct, mapInPandas batch shape, partitioning —
matches what a production decode would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, payload binary, meta struct<mime:string, n_bytes:long, "
    "source:string>"
)

FEATURES_DDL = "media_id long, n_bytes long, features array<double>"
COUNTS_DDL = "media_id long, n_bytes long, counts array<long>"

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    pass


def docs_as_media(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque-binary media table from the documents fixture
    (payload = utf-8 bytes; in production this is the image/audio blob)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias(
                "n_bytes"
            ),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) → binary PPM (P6, maxval 255)."""
    h, w, c = arr.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → RGB uint8 array (H, W, 3). Pure numpy — handles
    header comments and arbitrary header whitespace."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # exactly one whitespace byte separates maxval from the raster
    raster = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def encode_bmp(arr: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) → minimal 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up, BGR, rows padded to 4 bytes)."""
    import struct

    h, w, c = arr.shape
    assert c == 3
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + \
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                    2835, 2835, 0, 0)
    return header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → RGB uint8 array (H, W, 3). Pure numpy —
    handles bottom-up and top-down rows and 4-byte row padding."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img if top_down else img[::-1]


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an RGB uint8 array (H, W, 3).

    PPM (P6) and 24-bit BMP decode natively in pure numpy; other formats
    fall back to PIL when importable, else raise NotImplementedError with
    the format sniffed from the magic bytes."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if _HAVE_PIL:  # pragma: no cover - container lacks PIL
        import io

        import PIL.Image

        return np.asarray(
            PIL.Image.open(io.BytesIO(payload)).convert("RGB")
        )
    raise NotImplementedError(
        f"image decode for magic {payload[:4]!r} requires PIL/opencv; "
        "only PPM (P6) and 24-bit BMP decode natively"
    )


def synth_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image table: per doc a small RGB image whose
    pixel bytes follow the closed form p[i] = (doc_id + i) mod 256 over a
    doc-dependent geometry, containerized alternately as PPM (even ids)
    and BMP (odd ids). The closed form makes decoded-pixel statistics
    SQL-computable, so the REAL decode path (container parse + pixel
    recovery) is oracle-checkable end to end."""
    from .. import ensure_shipped

    ensure_shipped(docs.sparkSession)
    src = docs.select(
        F.col(id_col).alias("media_id"),
        (F.lit(8) + F.col(id_col) % 5).cast("int").alias("width"),
        (F.lit(6) + F.col(id_col) % 4).cast("int").alias("height"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, w, h in zip(pdf["media_id"], pdf["width"],
                                 pdf["height"]):
                px = ((int(mid) + np.arange(w * h * 3)) % 256).astype(
                    np.uint8).reshape(h, w, 3)
                payloads.append(
                    encode_ppm(px) if mid % 2 == 0 else encode_bmp(px)
                )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
            })

    return src.mapInPandas(fn, "media_id long, payload binary")


def image_decode_stats(media: DataFrame) -> DataFrame:
    """Decode each image payload (PPM/BMP sniffed from magic bytes) and
    emit geometry + exact per-channel pixel sums — integer outputs so the
    DuckDB oracle can reproduce them bit-for-bit."""
    from .. import ensure_shipped

    ensure_shipped(media.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        "media_id long, width int, height int, sum_r long, sum_g long, "
        "sum_b long",
    )


def _batch_histograms(payloads, n_bins: int):
    """Whole-batch byte histograms: ONE frombuffer over the concatenated
    payloads + ONE bincount keyed by (row * n_bins + bin) — no per-row
    Python loop in the hot path."""
    shift = 8 - (n_bins.bit_length() - 1)
    raws = [bytes(r) if r is not None else b"" for r in payloads]
    n = len(raws)
    lengths = np.fromiter((len(r) for r in raws), dtype=np.int64, count=n)
    if n == 0 or int(lengths.sum()) == 0:
        return lengths, np.zeros((n, n_bins), dtype=np.int64)
    blob = np.frombuffer(b"".join(raws), dtype=np.uint8)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    hist = np.bincount(
        row_ids * n_bins + (blob >> shift), minlength=n * n_bins
    ).reshape(n, n_bins)
    return lengths, hist


def byte_histogram_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Deterministic feature extraction over binary payloads via
    mapInPandas: per-row byte histogram (normalized), computed with numpy
    over the whole Arrow batch — the stand-in for decode+embed."""

    from .. import ensure_shipped

    ensure_shipped(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lengths, hist = _batch_histograms(pdf["payload"], n_bins)
            feats = (hist / np.maximum(lengths, 1)[:, None]).round(6)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(lengths, dtype="int64"),
                    "features": list(feats),
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, FEATURES_DDL)


def byte_histogram_counts(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Integer bin counts variant (exact — used for oracle comparison)."""
    from .. import ensure_shipped

    ensure_shipped(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lengths, hist = _batch_histograms(pdf["payload"], n_bins)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(lengths, dtype="int64"),
                    "counts": list(hist),
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, COUNTS_DDL)


def frame_sample(df: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """'Frame sampling' stand-in: take every Nth byte of the payload as a
    sample array (JVM-side slicing via transform/sequence — no Python).
    Payloads shorter than the stride yield an EMPTY array — Spark's
    sequence(1, 0) counts DOWN ([1, 0]), so the guard must short-circuit
    instead of clamping the upper bound."""
    n_frames = f"(meta.n_bytes div {every_n_bytes})"
    return df.select(
        "media_id",
        F.expr(
            f"CASE WHEN {n_frames} >= 1 THEN transform(sequence(1, {n_frames}),"
            f" i -> substring(payload, (i - 1) * {every_n_bytes} + 1, 1)) "
            f"ELSE cast(array() as array<binary>) END"
        ).alias("sampled_bytes"),
    )
