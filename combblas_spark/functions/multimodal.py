"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode is pluggable (VERDICT r4 #4): when Pillow is importable the
``pil`` decoder does REAL image decode on the executors; otherwise the
deterministic stub (clearly marked below) stands in so the Spark-side
contract — schema, Arrow batch shape, mapInPandas partitioning — stays
real and tested in containers without image libraries (this sandbox).
``decoder="auto"`` resolves ONCE on the driver so a mixed cluster
cannot silently split between paths. Audio/video remain stub-only
(torchaudio/av are heavier optional deps; same gating pattern applies).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("payload", T.BinaryType(), True),    # opaque encoded bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = "media_id long, kind string, width int, height int, n_frames int, feature array<float>"


def _fake_decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: deterministic pseudo-decode from payload bytes.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    raising NotImplementedError would break the plumbing tests, so a
    deterministic fake stands in: dims from the md5 of the payload's
    HEX (hex-keyed so the metadata twin is expressible in ANSI SQL —
    DuckDB's md5 is VARCHAR-only; hex of concatenated bytes is the
    concatenation of hexes, so the oracle never needs blob hashing),
    an 8-dim feature from byte statistics.
    """
    h = hashlib.md5(payload.hex().encode()).digest()
    w, hgt = 16 + h[0] % 64, 16 + h[1] % 64
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if arr.size == 0:
        # zero-byte payload (truncated/placeholder blob): well-defined
        # zero stats instead of numpy reductions raising on empty
        # arrays and NaN means (review r4)
        arr = np.zeros(1, dtype=np.float32)
    feat = np.array([
        arr.mean(), arr.std(), arr.min(), arr.max(),
        float(w), float(hgt), float(len(payload)), float(h[2]),
    ], dtype=np.float32)
    return w, hgt, feat


def pil_available() -> bool:
    """True when Pillow is importable (optional dependency)."""
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _pil_decode_image(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL image decode via Pillow: dims + the same 8-dim byte/pixel
    statistics feature the stub emits (mean/std/min/max over grayscale
    pixels, dims, payload length, band count). Returns None for
    payloads Pillow cannot identify — at corpus scale corrupt blobs
    are data, not exceptions; the caller drops them (the filter rows
    would hit anyway)."""
    import io

    import PIL.Image

    try:
        img = PIL.Image.open(io.BytesIO(payload))
        n_bands = len(img.getbands())
        gray = img.convert("L")
    except Exception:  # UnidentifiedImageError, truncated file OSError, ...
        return None
    w, hgt = gray.size
    arr = np.asarray(gray, dtype=np.float32).reshape(-1)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.float32)
    feat = np.array([
        arr.mean(), arr.std(), arr.min(), arr.max(),
        float(w), float(hgt), float(len(payload)), float(n_bands),
    ], dtype=np.float32)
    return w, hgt, feat


def extract_media_features(media: DataFrame, batch_hint: int = 1024,
                           decoder: str = "auto") -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    The Spark-side contract is production-real: binary column in, fixed
    feature schema out, one Python worker per partition, vectorized over
    Arrow record batches.

    ``decoder``: "pil" = real Pillow decode (raises ImportError up
    front when Pillow is missing; undecodable payloads are dropped),
    "stub" = the deterministic fake (hex-keyed dims, oracle-stable),
    "auto" = "pil" when importable else "stub", resolved ONCE on the
    driver so every executor takes the same path.

    Cluster note: the availability probe runs on the DRIVER; "pil"
    additionally requires Pillow in the EXECUTOR images (a mismatched
    cluster fails loud with per-task ImportError — intentional: a
    driver-side decision can't silently split between decoders, and a
    silent stub fallback on some executors would corrupt the corpus).
    """
    if decoder == "auto":
        decoder = "pil" if pil_available() else "stub"
    if decoder == "pil" and not pil_available():
        raise ImportError(
            "extract_media_features(decoder='pil'): Pillow is not "
            "installed; use decoder='stub' or install pillow")
    if decoder not in ("pil", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    use_pil = decoder == "pil"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    continue
                if use_pil and kind == "image":
                    got = _pil_decode_image(bytes(payload))
                    if got is None:
                        continue  # corrupt/unidentifiable blob: drop
                    w, h, feat = got
                else:
                    w, h, feat = _fake_decode_image(bytes(payload))
                n_frames = 1 if kind == "image" else 1 + len(payload) % 32
                rows.append({
                    "media_id": int(mid), "kind": kind, "width": w, "height": h,
                    "n_frames": n_frames, "feature": feat.tolist(),
                })
            yield pd.DataFrame(rows, columns=["media_id", "kind", "width", "height", "n_frames", "feature"])

    return media.select("media_id", "kind", "payload").mapInPandas(featurize, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload =
    repeatable bytes derived from the id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 4)
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "meta": {"source": f"synthetic:{i}", "codec": "fake"},
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
