"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The image/audio decode libraries are NOT in this container — the decode
step is STUBBED (deterministic fake features derived from the raw bytes,
clearly marked) while everything Spark-side is real and tested: the
schema, the binary column handling, the Arrow batch shape, the UDF
signatures, and the partitioning.  Swap `_fake_decode_*` for
PIL/torchaudio calls in a real deployment — nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("sha256", T.StringType(), False),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


def attach_media(
    docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Build the canonical media table from any table with a payload
    column: binary payload + typed metadata (n_bytes, sha256, source).
    JVM-side encode/sha2 — the metadata never round-trips through Python."""
    payload = F.encode(F.col(payload_col), "UTF-8")
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.col(source_col).cast("string").alias("source"),
        ).alias("meta"),
    )


# ------------------------------------------------------------ decode stubs

FEATURE_DIM = 8

# Real-decode escape hatch: if Pillow is importable (real deployment), the
# image path upgrades itself to decode+resize+histogram over true pixels;
# in this container (no PIL) it falls back to the deterministic byte-level
# stub.  The path is CHOSEN once on the driver; executors re-import this
# module, so _pil_decode_image raises loudly if Pillow is missing there —
# a heterogeneous pool must fail fast, never silently mix stub and real
# features in one column.
try:  # pragma: no cover - exercised only where Pillow is installed
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake for the decode step (no PIL in this
    container).  Real plumbing, fake pixels: an 8-bin byte histogram,
    L1-normalized.  ``decode_features`` swaps in ``_pil_decode_image``
    automatically when Pillow is present."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return hist / max(1, arr.size)


def _pil_decode_image(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Real decode path (used when Pillow is importable): decode → 32×32
    grayscale resize → 8-bin pixel histogram, L1-normalized.  Same output
    schema as the stub, so the operator contract is identical both ways.
    Undecodable PAYLOADS degrade to the stub (never fail the batch), but
    a MISSING Pillow on this executor fails loudly — the driver chose the
    real-decode path, and silently stubbing here would mix two
    incompatible feature spaces in one output column (heterogeneous
    executor images are a config error, not a data error)."""
    import io

    if _PILImage is None:
        raise RuntimeError(
            "decode_features resolved to the Pillow path on the driver, but "
            "Pillow is not importable on this executor — install Pillow on "
            "every executor image, or pass use_pil=False"
        )
    try:
        img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((32, 32))
        arr = np.asarray(img, dtype=np.uint8).ravel()
    except Exception:
        return _fake_decode_image(payload)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return hist / max(1, arr.size)


def decode_features(
    media: DataFrame, batch_hint: int | None = None, use_pil: bool | None = None
) -> DataFrame:
    """(media_id, media_type, n_bytes, features: array<double>) — the
    decode / feature-extract stage as an Arrow-batched mapInPandas
    operator.  Column pruning matters at scale: only (media_id,
    media_type, payload) enter the Python worker; metadata stays JVM-side
    and is re-joined by the caller if needed.

    ``use_pil=None`` (default) auto-detects Pillow: real decode when
    available, deterministic byte-histogram stub otherwise — same schema
    and operator contract either way."""
    decode = _pil_decode_image if (HAS_PIL if use_pil is None else use_pil) else _fake_decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p if isinstance(p, (bytes, bytearray)) else bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    pruned = media.select("media_id", "media_type", "payload")
    return pruned.mapInPandas(
        extract,
        schema="media_id long, media_type string, n_bytes long, features array<double>",
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """(media_id, frame_no, frame_sha256) — video frame-sampling STUB:
    real videos would decode + sample every Nth frame; the fake samples
    every Nth byte-window of the payload and fingerprints it.  The Spark
    plumbing (explode to frame rows, per-frame hash, bounded fan-out) is
    the real part."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, frames, hashes = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                for k in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    chunk = raw[k * every_n_bytes : (k + 1) * every_n_bytes]
                    ids.append(mid)
                    frames.append(k)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frames, "frame_sha256": hashes}
            )

    return media.select("media_id", "payload").mapInPandas(
        sample, schema="media_id long, frame_no int, frame_sha256 string"
    )
