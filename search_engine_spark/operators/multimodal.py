"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container):
``decode_media`` raises ``NotImplementedError`` unless
``fake_decode=True``, in which case a deterministic byte-level
feature extractor stands in.  Everything Spark-side — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested,
so swapping in PIL/torchaudio on a cluster is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, blob binary, width int, height int, "
    "duration_ms int, codec string"
)
FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, features array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"

N_FEATURES = 16


def make_media_table(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows (opaque byte payloads)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
        rows.append((i, kind, bytearray(blob), 64 + i % 8, 48 + i % 8,
                     1000 * (1 + i % 7), "raw"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _byte_histogram(blob: bytes, bins: int = N_FEATURES) -> np.ndarray:
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    total = max(arr.size, 1)
    return (hist / total).astype(np.float32)


def media_from_docs(docs: DataFrame) -> DataFrame:
    """An opaque-binary media table derived deterministically from a
    documents frame (blob = utf-8 bytes of text): exercises the real
    binary-column plumbing AND gives the decode step an exact DuckDB
    oracle (``encode(text)`` yields the identical bytes there).
    Layout-agnostic — the caller supplies the frame."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-blob").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
    )


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wrapper over :func:`media_from_docs` for the driver
    testdata layout."""
    import os

    return media_from_docs(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    )


def decode_media_counts(media: DataFrame) -> DataFrame:
    """The oracle-exact decode: per-media byte-histogram COUNTS
    (16 bins = the byte's high nibble) as integer columns — no float
    normalization, so the driver's value-hash comparison against the
    DuckDB twin is exact.  Same Arrow plumbing as ``decode_media``."""
    from ..partitioning import balanced

    media = balanced(media)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "n_bytes": []}
            for k in range(N_FEATURES):
                out[f"h{k}"] = []
            for mid, b in zip(pdf["media_id"], pdf["blob"]):
                arr = (np.frombuffer(bytes(b), dtype=np.uint8)
                       if b is not None else np.empty(0, dtype=np.uint8))
                counts = np.bincount(arr >> 4, minlength=N_FEATURES)
                out["media_id"].append(mid)
                out["n_bytes"].append(arr.size)
                for k in range(N_FEATURES):
                    out[f"h{k}"].append(int(counts[k]))
            yield pd.DataFrame(out)

    schema = "media_id long, n_bytes long, " + ", ".join(
        f"h{k} long" for k in range(N_FEATURES)
    )
    return media.select("media_id", "blob").mapInPandas(batch, schema=schema)


def _have_pil() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _pil_histogram(blob: bytes, bins: int = N_FEATURES) -> list | None:
    """Real image decode when PIL exists: grayscale pixel histogram
    over ``bins`` equal-width buckets, L1-normalized — the same
    shape/normalization as the byte-level stand-in, computed from
    DECODED PIXELS.  Returns None for undecodable payloads (an honest
    null beats a crash mid-partition at 10^12 rows)."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(blob)) as im:
            arr = np.asarray(im.convert("L"), dtype=np.uint8)
    except Exception:
        return None
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return (hist / max(arr.size, 1)).astype(np.float32).tolist()


def decode_media(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode + feature-extract each media blob.

    ``fake_decode=True``: a deterministic 16-bin byte histogram (a
    real computation with the same shape a CNN/FFT embedding would
    have) — works everywhere, exact-oracle-checkable.

    ``fake_decode=False``: decode the blob as a REAL image via PIL
    (optional import) and histogram the decoded grayscale pixels;
    rows PIL cannot decode get null features.  Raises
    ``NotImplementedError`` up front when PIL is absent (this
    container ships no codecs) — same kernel shape either way, so a
    cluster with the libs installed changes nothing but the flag."""
    from ..partitioning import balanced

    if not fake_decode and not _have_pil():
        raise NotImplementedError(
            "real media decoding needs PIL (pillow), which is not installed "
            "here; pass fake_decode=True for the byte-level plumbing path"
        )
    media = balanced(media)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake_decode:
                feats = [
                    _byte_histogram(bytes(b)).tolist() if b is not None else None
                    for b in pdf["blob"]
                ]
            else:
                feats = [
                    _pil_histogram(bytes(b)) if b is not None else None
                    for b in pdf["blob"]
                ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(b)) if b is not None else 0 for b in pdf["blob"]],
                "features": feats,
            })

    return media.select("media_id", "kind", "blob").mapInPandas(batch, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, n_bytes_in long, n_bytes_out long, blob_out binary"
)


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize each media payload to a fixed byte budget via
    nearest-neighbor sampling (output byte j = input byte
    floor(j * n / target)).  The real image resize slots into the same
    kernel once codecs exist; the sampling IS the deterministic
    stand-in, so the op carries an exact oracle (DuckDB recomputes the
    sampled bytes from hex(blob)).  Inputs shorter than the budget
    pass through unchanged."""
    from ..partitioning import balanced

    media = balanced(media)
    t = int(target_bytes)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "kind": [], "n_bytes_in": [],
                   "n_bytes_out": [], "blob_out": []}
            for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
                arr = (np.frombuffer(bytes(b), dtype=np.uint8)
                       if b is not None else np.empty(0, dtype=np.uint8))
                n = arr.size
                if n > t:
                    idx = (np.arange(t, dtype=np.int64) * n) // t
                    resized = arr[idx]
                else:
                    resized = arr
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes_in"].append(n)
                out["n_bytes_out"].append(int(resized.size))
                out["blob_out"].append(resized.tobytes())
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "blob").mapInPandas(
        batch, schema=RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 500, fake_decode: bool = True) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    frame.  Stub frame content = deterministic byte slice."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decode:
                raise NotImplementedError("video decode not available; see decode_media")
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, dur, blob in zip(pdf["media_id"], pdf["duration_ms"], pdf["blob"]):
                n_frames = max(int(dur) // every_ms, 1)
                raw = bytes(blob)
                step = max(len(raw) // n_frames, 1)
                for fi in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame"].append(raw[fi * step : (fi + 1) * step])
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms", "blob")
        .mapInPandas(batch, schema=FRAME_SCHEMA)
    )
