"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
metadata struct alongside (mime, width/height or sample rate, duration). The
Ray-side plumbing — schemas, actor-pool signatures, small-batch sizing for
large rows, output layout — is real and tested; the actual byte decoding is
STUBBED behind ``DETERMINISTIC_FAKE`` (the image/audio libraries are not in
this container): feature vectors are derived deterministically from the
payload bytes so pipelines are reproducible end-to-end.

A production deployment replaces ``_fake_decode_*`` with PIL/libav calls in
the same actor ``__init__``/``__call__`` shape — nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DETERMINISTIC_FAKE = True

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("payload", pa.binary(), nullable=False),
        pa.field("mime", pa.string(), nullable=False),
        pa.field("meta_width", pa.int32()),
        pa.field("meta_height", pa.int32()),
    ]
)


def make_fake_media(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic opaque binary fixtures standing in for images."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "meta_width": pa.array(rng.integers(64, 2048, n).astype(np.int32), pa.int32()),
            "meta_height": pa.array(rng.integers(64, 2048, n).astype(np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode → embed: hash-seeded feature vector."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


class ImageFeatureExtractor:
    """Actor-pool stage: binary payload → feature vector (``list<float>``).

    In production ``__init__`` loads the model once per actor; batches must be
    small (large binary rows): pass ``batch_size=32..256`` to ``map_batches``.
    """

    def __init__(self, dim: int = 64):
        if not DETERMINISTIC_FAKE:  # pragma: no cover
            raise NotImplementedError("real image decode needs PIL/torch; not in container")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fake_decode_features(p, self.dim).tolist()
            for p in batch["payload"].to_pylist()
        ]
        out = batch.drop_columns(["payload"])  # features replace heavy bytes
        return out.append_column("features", pa.array(feats, pa.list_(pa.float32())))


class ImageResizer:
    """Actor-pool stage: 'resize' = rewrite payload + metadata (stub decode).

    Demonstrates the binary-in/binary-out layout with updated typed metadata.
    """

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["meta_width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["meta_height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        new_w = np.maximum(1, (w * scale)).astype(np.int32)
        new_h = np.maximum(1, (h * scale)).astype(np.int32)
        if DETERMINISTIC_FAKE:
            # stub: payload truncated proportionally to pixel-count reduction
            ratio = (new_w.astype(np.float64) * new_h) / np.maximum(1.0, w * h)
            payloads = [
                p[: max(1, int(len(p) * r))]
                for p, r in zip(batch["payload"].to_pylist(), ratio)
            ]
        else:  # pragma: no cover
            raise NotImplementedError("real resize needs PIL")
        out = batch.drop_columns(["payload", "meta_width", "meta_height"])
        out = out.append_column("payload", pa.array(payloads, pa.binary()))
        out = out.append_column("meta_width", pa.array(new_w, pa.int32()))
        out = out.append_column("meta_height", pa.array(new_h, pa.int32()))
        return out


class FrameSampler:
    """Actor-pool stage: 'video' payload → k evenly spaced 'frames'.

    Emits one row per sampled frame (flat_map shape done inside map_batches)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            chunk = max(1, len(p) // self.n_frames)
            for i in range(self.n_frames):
                ids.append(mid)
                idxs.append(i)
                frames.append(p[i * chunk : (i + 1) * chunk])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


AUDIO_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("payload", pa.binary(), nullable=False),
        pa.field("mime", pa.string(), nullable=False),
        pa.field("meta_sample_rate", pa.int32()),
        pa.field("meta_duration_ms", pa.int32()),
    ]
)


def make_fake_audio(n: int = 64, seed: int = 43, payload_bytes: int = 8192) -> pa.Table:
    """Deterministic opaque binary fixtures standing in for audio clips."""
    rng = np.random.default_rng(seed)
    payloads = [
        rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/fake"] * n, pa.string()),
            "meta_sample_rate": pa.array(
                rng.choice([16000, 22050, 44100], n).astype(np.int32), pa.int32()
            ),
            "meta_duration_ms": pa.array(
                rng.integers(500, 60_000, n).astype(np.int32), pa.int32()
            ),
        },
        schema=AUDIO_SCHEMA,
    )


class AudioFeatureExtractor:
    """Actor-pool stage: audio payload → fixed-dim feature vector.

    Same shape as :class:`ImageFeatureExtractor` (model load belongs in
    ``__init__``); the byte decode is the deterministic fake — a production
    deployment swaps in libav/torchaudio here."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not DETERMINISTIC_FAKE:  # pragma: no cover
            raise NotImplementedError("real audio decode needs libav/torchaudio")
        feats = [
            _fake_decode_features(p, self.dim).tolist()
            for p in batch["payload"].to_pylist()
        ]
        out = batch.drop_columns(["payload"])
        return out.append_column("features", pa.array(feats, pa.list_(pa.float32())))


class AudioChunker:
    """Actor-pool stage: audio payload → fixed-duration chunks (one row per
    chunk) — the audio analogue of video frame sampling; keeps chunk-level
    metadata so downstream stages can window/transcribe per chunk."""

    def __init__(self, chunk_ms: int = 10_000):
        self.chunk_ms = chunk_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, chunks, starts = [], [], [], []
        payloads = batch["payload"].to_pylist()
        durs = batch["meta_duration_ms"].to_pylist()
        for mid, p, dur in zip(batch["media_id"].to_pylist(), payloads, durs):
            n_chunks = max(1, -(-int(dur) // self.chunk_ms))
            bytes_per = max(1, len(p) // n_chunks)
            for i in range(n_chunks):
                ids.append(mid)
                idxs.append(i)
                starts.append(i * self.chunk_ms)
                chunks.append(p[i * bytes_per : (i + 1) * bytes_per])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int32()),
                "chunk_start_ms": pa.array(starts, pa.int32()),
                "chunk": pa.array(chunks, pa.binary()),
            }
        )
