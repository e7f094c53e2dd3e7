"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched feature extraction.

Image/audio decode libraries are not available in this container, so the
*decode* step is stubbed (``decode_image`` raises NotImplementedError unless
a library is importable; ``byte_histogram_features`` is the deterministic
fake used by tests/benchmarks). The Spark-side plumbing is real: binary
column schema, metadata struct, mapInPandas batch shape, and partitioning
all match what a production decode would use.
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


def decode_image(payload: bytes):  # pragma: no cover - container lacks PIL
    """Real decode path — guarded stub until an image library is present."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/opencv; not available in this "
            "container — use byte_histogram_features for the plumbing path"
        )
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload))


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
