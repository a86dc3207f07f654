"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode reality, by modality:
  image — real via Pillow when importable; WITHOUT Pillow, binary
          netpbm (P5/P6) still decodes for real (header + numpy, no
          imaging library), and only non-netpbm payloads fall to the
          deterministic byte-histogram stub;
  audio — REAL for PCM WAV everywhere (stdlib ``wave`` + numpy, no codec
          libraries needed); compressed codecs decode for real when
          ``soundfile`` is importable (auto-probed, like Pillow), else
          degrade per-payload to a deterministic stub marked
          ``decoded=false``;
  video — REAL frame sampling when PyAV (ffmpeg bindings) is importable
          (auto-probed); without codecs the deterministic byte-window
          stub runs with ``decoded=false``; the Spark plumbing (explode
          to frame rows, bounded fan-out) is identical either way.
Everything Spark-side is real and tested in all cases: the schema, the
binary column handling, the Arrow batch shape, the UDF signatures, and
the partitioning.  Swap the remaining stubs for torchaudio/ffmpeg calls
in a real deployment — nothing else changes.
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


def _netpbm_decode_image(payload: bytes) -> np.ndarray | None:
    """REAL image decode for binary netpbm (P5 grayscale / P6 RGB, 8-bit)
    — header parse + numpy frombuffer, no imaging library needed.
    Returns the same L1-normalized 8-bin grayscale-pixel histogram the
    PIL path produces for these formats, or None for anything else
    (compressed formats need a real codec)."""
    if not payload[:2] in (b"P5", b"P6"):
        return None
    try:
        # header: magic, width, height, maxval — whitespace/comment-separated
        fields: list[bytes] = []
        i = 2
        while len(fields) < 3 and i < len(payload):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to end of line
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(payload[i:j])
            i = j
        i += 1  # single whitespace after maxval, then raster
        w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
        if maxval > 255 or w <= 0 or h <= 0:
            return None
        ch = 3 if payload[:2] == b"P6" else 1
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
        if ch == 3:
            # ITU-R 601 luma, same coefficients PIL's convert("L") uses
            rgb = raster.reshape(-1, 3).astype(np.float64)
            gray = rgb @ np.array([299.0, 587.0, 114.0]) / 1000.0
        else:
            gray = raster.astype(np.float64)
    except Exception:
        return None
    hist, _ = np.histogram(gray, bins=FEATURE_DIM, range=(0, 256))
    return hist / max(1, gray.size)


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


def _nonpil_decode_image(payload: bytes) -> np.ndarray:
    """No-imaging-library decode chain: real netpbm parse (P5/P6) when
    the payload is one, deterministic byte-histogram stub otherwise."""
    out = _netpbm_decode_image(payload)
    return out if out is not None else _fake_decode_image(payload)


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
    decode = (
        _pil_decode_image
        if (HAS_PIL if use_pil is None else use_pil)
        else _nonpil_decode_image
    )

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


# ------------------------------------------------------------ audio decode

AUDIO_FEATURE_BINS = 8

# Compressed-codec escape hatch, same auto-upgrade pattern as Pillow for
# images: when ``soundfile`` (libsndfile) is importable, FLAC/OGG/etc.
# decode for real; the path is chosen ONCE on the driver, and an executor
# missing the library fails loudly (heterogeneous pools must never mix
# real and stub features in one column).
try:  # pragma: no cover - exercised only where soundfile is installed
    import soundfile as _soundfile

    HAS_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAS_SOUNDFILE = False

# Video: real frame decode when PyAV (ffmpeg bindings) is importable.
try:  # pragma: no cover - exercised only where PyAV is installed
    import av as _pyav

    HAS_PYAV = True
except ImportError:
    _pyav = None
    HAS_PYAV = False


def _wav_decode_audio(payload: bytes) -> dict | None:
    """REAL audio decode for PCM WAV — needs only stdlib ``wave`` +
    numpy, both present in any Python image (no codec libraries).
    Returns per-clip stats + an L1-normalized 8-bin |FFT| band profile,
    or None when the payload is not a PCM WAV this parser can read
    (compressed formats need codec libs — those fall back to the stub)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            rate, nch, width, nframes = (
                w.getframerate(), w.getnchannels(), w.getsampwidth(), w.getnframes(),
            )
            raw = w.readframes(nframes)
    except Exception:
        return None
    if width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        x /= 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit et al.: not worth a hand-rolled unpacker here
        return None
    if nch > 1:
        x = x[: (x.size // nch) * nch].reshape(-1, nch).mean(axis=1)
    if x.size == 0:
        return None
    mag = np.abs(np.fft.rfft(x))
    bands = np.array_split(mag, AUDIO_FEATURE_BINS)
    prof = np.array([b.sum() for b in bands])
    tot = prof.sum()
    return {
        "decoded": True,
        "sample_rate": int(rate),
        "n_channels": int(nch),
        "n_samples": int(x.size),
        "duration_secs": float(x.size / rate) if rate else 0.0,
        "rms": float(np.sqrt(np.mean(x * x))),
        "zero_crossing_rate": float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        if x.size > 1
        else 0.0,
        "features": (prof / tot if tot > 0 else prof).tolist(),
    }


def _soundfile_decode_audio(payload: bytes) -> dict | None:  # pragma: no cover
    """Real compressed-codec decode (FLAC/OGG/…) via libsndfile, used only
    when ``soundfile`` was importable on the DRIVER.  Missing library on
    an executor raises (config error, fail fast); an undecodable payload
    returns None (data property — falls through to the stub).  Output
    contract is identical to ``_wav_decode_audio``."""
    import io

    if _soundfile is None:
        raise RuntimeError(
            "decode_audio_features resolved to the soundfile path on the "
            "driver, but soundfile is not importable on this executor — "
            "install it on every executor image, or pass use_soundfile=False"
        )
    try:
        x, rate = _soundfile.read(io.BytesIO(payload), dtype="float64", always_2d=True)
    except Exception:
        return None
    nch = x.shape[1]
    x = x.mean(axis=1)
    if x.size == 0:
        return None
    mag = np.abs(np.fft.rfft(x))
    bands = np.array_split(mag, AUDIO_FEATURE_BINS)
    prof = np.array([b.sum() for b in bands])
    tot = prof.sum()
    return {
        "decoded": True,
        "sample_rate": int(rate),
        "n_channels": int(nch),
        "n_samples": int(x.size),
        "duration_secs": float(x.size / rate) if rate else 0.0,
        "rms": float(np.sqrt(np.mean(x * x))),
        "zero_crossing_rate": float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        if x.size > 1
        else 0.0,
        "features": (prof / tot if tot > 0 else prof).tolist(),
    }


def _fake_decode_audio(payload: bytes) -> dict:
    """STUB fallback for non-WAV payloads (compressed codecs are not in
    this container): deterministic byte-level features, decoded=False so
    consumers can never mistake them for real audio stats."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=AUDIO_FEATURE_BINS, range=(0, 256))
    return {
        "decoded": False,
        "sample_rate": 0,
        "n_channels": 0,
        "n_samples": int(arr.size),
        "duration_secs": 0.0,
        "rms": float(np.sqrt(np.mean((arr / 255.0) ** 2))) if arr.size else 0.0,
        "zero_crossing_rate": 0.0,
        "features": (hist / max(1, arr.size)).tolist(),
    }


def decode_audio_features(
    media: DataFrame, use_soundfile: bool | None = None
) -> DataFrame:
    """(media_id, decoded, sample_rate, n_channels, n_samples,
    duration_secs, rms, zero_crossing_rate, features) — audio decode /
    feature-extract over Arrow batches.  PCM WAV decodes FOR REAL
    (stdlib ``wave``); with ``soundfile`` importable (auto-detected on
    the driver, like the image path's Pillow probe) compressed codecs
    decode for real too; anything still undecodable degrades to the
    deterministic stub with ``decoded=false`` — per-PAYLOAD fallback is
    a data property (format mix in one table is normal), while a MISSING
    library on an executor after the driver chose the codec path fails
    loudly (an executor-image config error)."""
    sf_path = HAS_SOUNDFILE if use_soundfile is None else use_soundfile

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                d = _wav_decode_audio(raw)
                if d is None and sf_path:
                    d = _soundfile_decode_audio(raw)
                d = d or _fake_decode_audio(raw)
                d["media_id"] = mid
                rows.append(d)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, decoded boolean, sample_rate int, n_channels int, "
            "n_samples long, duration_secs double, rms double, "
            "zero_crossing_rate double, features array<double>"
        ),
    )


def _av_frame_hashes(  # pragma: no cover
    payload: bytes, every_n_frames: int, max_frames: int
) -> list[str] | None:
    """Real video frame sampling via PyAV/ffmpeg (used only when ``av``
    was importable on the DRIVER): decode, keep every Nth frame up to
    ``max_frames``, fingerprint each frame's grayscale pixels.  Missing
    library on an executor raises (config error); an undecodable payload
    returns None (data property — stub fallback)."""
    import hashlib
    import io

    if _pyav is None:
        raise RuntimeError(
            "frame_sample resolved to the PyAV path on the driver, but av "
            "is not importable on this executor — install it on every "
            "executor image, or pass use_av=False"
        )
    try:
        out: list[str] = []
        with _pyav.open(io.BytesIO(payload)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % every_n_frames:
                    continue
                arr = frame.to_ndarray(format="gray")
                out.append(hashlib.sha256(arr.tobytes()).hexdigest())
                if len(out) >= max_frames:
                    break
        return out or None
    except Exception:
        return None


def frame_sample(
    media: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    every_n_frames: int = 10,
    use_av: bool | None = None,
) -> DataFrame:
    """(media_id, frame_no, frame_sha256, decoded) — video frame
    sampling.  With PyAV importable (auto-detected on the driver, same
    probe pattern as Pillow/soundfile) frames decode FOR REAL: every
    ``every_n_frames``-th frame up to ``max_frames``, fingerprinted by
    grayscale pixel content (decoded=true).  Without it — this
    container has no codecs — the deterministic STUB fingerprints every
    ``every_n_bytes``-th byte-window instead (decoded=false; the Spark
    plumbing — explode to frame rows, per-frame hash, bounded fan-out —
    is identical either way)."""
    av_path = HAS_PYAV if use_av is None else use_av

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, frames, hashes, decflags = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                real = (
                    _av_frame_hashes(raw, every_n_frames, max_frames)
                    if av_path
                    else None
                )
                if real is not None:
                    for k, h in enumerate(real):
                        ids.append(mid)
                        frames.append(k)
                        hashes.append(h)
                        decflags.append(True)
                    continue
                for k in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    chunk = raw[k * every_n_bytes : (k + 1) * every_n_bytes]
                    ids.append(mid)
                    frames.append(k)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
                    decflags.append(False)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": frames,
                    "frame_sha256": hashes,
                    "decoded": decflags,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        sample,
        schema="media_id long, frame_no int, frame_sha256 string, decoded boolean",
    )
