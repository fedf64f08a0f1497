"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the
decode kernels are STUBBED (deterministic fakes clearly marked below);
everything Spark-side — schema, Arrow batch shape, mapInPandas
partitioning — is real and tested. Swap `_fake_decode_*` for
PIL/torchaudio/etc. in production.
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


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    The Spark-side contract is production-real: binary column in, fixed
    feature schema out, one Python worker per partition, vectorized over
    Arrow record batches. Only the innermost decode is a stub.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    continue
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
