"""Binary-column operators over ``mapInPandas``.

Schema model: a media table row is
    (media_id long, media_type string, payload binary, meta string-json)
— matching the reference's nested ``event.media`` fields
(``src/spark/mover.py:56-57``) promoted to a first-class typed table.

Execution model (the part that matters at 100 TB):
- payloads never leave the executor: ``mapInPandas`` receives Arrow record
  batches, emits feature rows, and the binary column is dropped before any
  shuffle;
- batch memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set per-job when payloads are large);
- the decode kernel is pluggable; the default here is a deterministic fake
  (hash-derived pixels/samples) because codec libs aren't in this container.
  ``strict=True`` raises ``NotImplementedError`` where a real decoder would
  be linked in.
"""

from __future__ import annotations

import hashlib
import warnings
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 16

#: decoder contract for :func:`extract_features`:
#: payload bytes -> (width, height, float feature vector of FEATURE_DIM).
#: The callable is serialized to executors with the kernel closure, so it
#: must be importable/picklable and must not capture a SparkSession.
Decoder = Callable[[bytes], tuple[int, int, np.ndarray]]

#: resizer contract for :func:`resize_media`:
#: (payload, target_w, target_h) -> resized payload bytes.
Resizer = Callable[[bytes, int, int], bytes]

FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, features array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash string"


def _warn_fake(op: str, kind: str) -> None:
    """One construction-time warning when the built-in deterministic fake
    codec is about to be used (strict=False, nothing injected): its output
    is stable garbage — fine for plumbing tests, silently wrong as real
    features — so the substitution must never be invisible in production."""
    warnings.warn(
        f"{op}: no {kind} injected and strict=False — using the built-in "
        f"deterministic FAKE {kind}; its output is not derived from real "
        f"media content. Pass {kind}= or set strict=True for production.",
        RuntimeWarning,
        stacklevel=3,
    )


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image/audio decoder: derives a fake
    (width, height) and a FEATURE_DIM float vector from the payload bytes.
    Stable across runs/machines (md5-seeded, no RNG state)."""
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    seed = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(FEATURE_DIM / seed.size))
    features = np.tile(seed, reps)[:FEATURE_DIM] / 255.0
    return width, height, features


def extract_features(
    media: DataFrame, strict: bool = False, decode: Decoder | None = None
) -> DataFrame:
    """payload → (dims, feature vector); binary column dropped on output.

    ``decode`` is the production injection point: a :data:`Decoder`
    callable (PIL/ffmpeg/torchvision wrapper on a codec-equipped cluster)
    that replaces the deterministic fake.  Feature vectors longer than
    ``FEATURE_DIM`` are truncated, shorter ones zero-padded, so the output
    schema stays fixed whatever the decoder emits.
    """
    # strict is a CONSTRUCTION-time contract, checked before any kernel is
    # built: a per-batch check would silently succeed on empty input —
    # waiving the "a real decoder must be linked" guarantee exactly when a
    # misconfigured upstream produces no rows
    if strict and decode is None:
        raise NotImplementedError(
            "strict=True requires a real decoder: pass decode= (codec "
            "libraries are not present in this environment, so the "
            "built-in default is a deterministic fake)"
        )
    if decode is None:
        _warn_fake("extract_features", "decode")
        decode = _fake_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "media_type": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "features": [],
            }
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                w, h, feats = decode(data)
                feats = np.asarray(feats, dtype=np.float32).ravel()
                if feats.size != FEATURE_DIM:  # fixed output schema
                    feats = np.pad(feats, (0, max(0, FEATURE_DIM - feats.size)))[
                        :FEATURE_DIM
                    ]
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(data))
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats.tolist())
            yield pd.DataFrame(out)

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-style frame sampling stub: one 'frame' fingerprint per
    ``every_n_bytes`` chunk of payload — exercises the 1→N row fan-out shape
    (a real decoder emits one row per sampled frame)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                for i in range(max(1, len(data) // every_n_bytes)):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return media.select("media_id", "payload").mapInPandas(kernel, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, media_type string, width int, height int, payload binary"
)


def _fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Default byte-arithmetic resizer: payload size proportional to the
    target pixel count via deterministic subsampling/tiling."""
    n_target = max(1, (target_w * target_h) // 64)
    if not payload:
        return b"\x00" * n_target
    if len(payload) >= n_target:
        step = len(payload) // n_target
        return payload[::step][:n_target]
    reps = n_target // len(payload) + 1
    return (payload * reps)[:n_target]


def resize_media(
    media: DataFrame,
    target_w: int,
    target_h: int,
    strict: bool = False,
    resize: Resizer | None = None,
) -> DataFrame:
    """Resize: emits a transformed payload with the typed (width, height)
    metadata updated.  ``resize`` is the production injection point — a
    :data:`Resizer` callable wrapping a real image library; the default is
    deterministic byte subsampling/tiling (codec libs absent here).

    Exercises the binary→binary transform shape — unlike feature
    extraction, the payload column SURVIVES the operator, so batch sizing
    (``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds peak executor
    memory on both sides of the kernel.
    """

    if strict and resize is None:
        # construction-time, not per-batch — see extract_features
        raise NotImplementedError(
            "strict=True requires a real resizer: pass resize= (no image "
            "library is present in this environment, so the built-in "
            "default is byte tiling)"
        )
    if resize is None:
        _warn_fake("resize_media", "resize")
        resize = _fake_resize

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "width": [], "height": [], "payload": []}
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["payload"].append(resize(data, target_w, target_h))
            yield pd.DataFrame(out)

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema=RESIZE_SCHEMA
    )
