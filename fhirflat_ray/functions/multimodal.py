"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
metadata struct alongside (mime, width/height or sample rate, duration). The
Ray-side plumbing — schemas, actor-pool signatures, small-batch sizing for
large rows, output layout — is real and tested.

Byte decoding is REAL for the formats the standard library can handle:

- WAV (PCM 8/16/32-bit) via ``wave`` → sample array → spectral features;
- PPM (binary ``P6``) parsed by hand → pixel array → color/histogram
  features and real nearest-neighbour resizing;
- BMP (uncompressed 24-bit) parsed by hand → pixel array;
- PNG (8-bit gray/RGB/palette/RGBA, filters 0-4) via ``zlib`` inflate +
  spec unfiltering — validated against an externally-encoded fixture;
- JPEG (baseline sequential: DHT huffman, 4:4:4/4:2:2/4:2:0, restart
  intervals) via the full stdlib+numpy decoder in ``functions/jpeg.py`` —
  validated against externally-encoded files; progressive (SOF2) falls
  back.

Payloads in any OTHER format (video codecs, progressive JPEG, exotic
variants) fall back to ``_fake_decode_features`` — a deterministic
hash-seeded vector (``DETERMINISTIC_FAKE`` marks that path; PIL/libav are
not in this container). A production deployment swaps the fallback for
PIL/libav calls in the same actor ``__init__``/``__call__`` shape —
nothing else changes.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa

#: non-stdlib formats still decode to a deterministic hash-seeded stub
DETERMINISTIC_FAKE = True


# ------------------------------------------------------- real byte decode


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(mono float64 samples in [-1, 1], sample_rate) from PCM WAV bytes."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, rate


def _decode_ppm(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 pixels from binary PPM (``P6``) bytes."""
    # header = magic, width, height, maxval separated by whitespace/comments
    pos = 0
    fields: list[bytes] = []
    while len(fields) < 4:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    if fields[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(fields[1]), int(fields[2]), int(fields[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def _encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB pixels from an uncompressed 24-bit BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core headers not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    flipped = h > 0  # positive height → rows stored bottom-up
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline PNG filters (types 0-4) → (h, stride) bytes.

    Sub vectorizes as a per-lane prefix sum mod 256; Up is a row add;
    Average/Paeth keep the spec's left-neighbour recurrence (a loop over x
    positions, vectorized across the ``bpp`` lanes at each step)."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: prefix sum per lane
            lanes = line.reshape(-1, bpp)
            rec = (np.cumsum(lanes, axis=0) % 256).reshape(-1)
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int64)
            for x0 in range(0, stride, bpp):
                left = rec[x0 - bpp : x0] if x0 >= bpp else np.zeros(bpp, np.int64)
                up = prev[x0 : x0 + bpp]
                if ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = (
                        prev[x0 - bpp : x0] if x0 >= bpp else np.zeros(bpp, np.int64)
                    )
                    p = left + up - ul
                    pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where(
                        (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul)
                    )
                rec[x0 : x0 + bpp] = (line[x0 : x0 + bpp] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def _decode_png(payload: bytes) -> np.ndarray:
    """(h, w, channels) uint8 pixels from 8-bit PNG bytes (stdlib zlib).

    Supports colour types 0 (gray), 2 (RGB), 3 (palette), 6 (RGBA),
    bit depth 8, no interlace — the overwhelmingly common cases."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    palette = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG colour type {color}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        px = palette[px[:, :, 0]]
    elif color == 0:
        px = np.repeat(px, 3, axis=2)
    elif color == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3] if px.shape[2] >= 3 else px


def _image_pixels(payload: bytes) -> np.ndarray | None:
    """Real pixel decode for stdlib-decodable formats, else None."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:4] == b"GIF8":
        # unsupported GIF variants (interlace) or truncated payloads fall
        # back to the stub path instead of killing the whole map stage on
        # one bad row — the pre-GIF behavior for any b"GIF8" payload
        try:
            return _decode_gif(payload)
        except (ValueError, IndexError, struct.error):
            return None
    if payload[:2] == b"\xff\xd8":
        # baseline JPEG decodes for real (functions/jpeg.py); progressive
        # (SOF2) / truncated payloads fall back to the stub path
        from fhirflat_ray.functions.jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except (ValueError, IndexError, KeyError, struct.error):
            return None
    return None


def _image_features(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature vector from real pixels: per-channel mean/std
    plus a grayscale histogram, padded/truncated to ``dim``."""
    f = pixels.astype(np.float64) / 255.0
    gray = f.mean(axis=2)
    hist, _ = np.histogram(gray, bins=max(1, dim - 6), range=(0.0, 1.0))
    hist = hist.astype(np.float64) / max(1, gray.size)
    stats = np.concatenate([f.mean(axis=(0, 1)), f.std(axis=(0, 1)), hist])
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(stats))] = stats[:dim]
    return out


def _audio_features(x: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """RMS + zero-crossing rate + log band energies from real samples."""
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    n_bands = max(1, dim - 2)
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, n_bands)
    energy = np.log1p(np.array([b.sum() for b in bands], dtype=np.float64))
    out = np.zeros(dim, dtype=np.float32)
    out[0], out[1] = rms, zcr
    out[2 : 2 + len(energy)] = energy[: dim - 2]
    return out


def make_wav_bytes(
    freq_hz: float = 440.0, ms: int = 200, rate: int = 16_000, amplitude: float = 0.5
) -> bytes:
    """Real 16-bit mono PCM WAV bytes of a pure tone (stdlib only)."""
    t = np.arange(int(rate * ms / 1000.0)) / rate
    x = (amplitude * np.sin(2 * np.pi * freq_hz * t) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def make_ppm_bytes(width: int = 32, height: int = 24, seed: int = 42) -> bytes:
    rng = np.random.default_rng(seed)
    return _encode_ppm(rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8))


def make_png_bytes(
    width: int = 20,
    height: int = 14,
    seed: int = 44,
    color_type: int = 2,
    filters: tuple[int, ...] = (0, 1, 2, 3, 4),
) -> bytes:
    """Real 8-bit PNG bytes of random pixels (see :func:`_encode_png`)."""
    rng = np.random.default_rng(seed)
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    px = rng.integers(0, 256, size=(height, width, ch), dtype=np.uint8)
    return _encode_png(px, color_type=color_type, filters=filters)


def _encode_png(
    px: np.ndarray,
    color_type: int = 2,
    filters: tuple[int, ...] = (0, 1, 2, 3, 4),
) -> bytes:
    """Real 8-bit PNG bytes (stdlib zlib + struct) from a (h, w, ch) uint8
    array: RGB (2), gray (0) or RGBA (6), cycling through the given
    scanline filter types so decode exercises every unfilter branch."""
    import zlib

    height, width, ch = px.shape
    assert ch == {0: 1, 2: 3, 6: 4}[color_type]
    bpp = ch
    lines = []
    prev = np.zeros(width * ch, dtype=np.int64)
    for y in range(height):
        cur = px[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            enc = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            enc = (cur - pred) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_bmp_bytes(width: int = 16, height: int = 12, seed: int = 43) -> bytes:
    """Uncompressed 24-bit BMP bytes (bottom-up rows, 4-byte padding)."""
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = rgb[::-1, :, ::-1].reshape(height, width * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + data

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

    PPM/BMP payloads decode to REAL pixels (stdlib parsers above) and yield
    color/histogram features; other formats fall back to the deterministic
    hash-seeded stub. In production ``__init__`` loads the model once per
    actor; batches must be small (large binary rows): pass
    ``batch_size=32..256`` to ``map_batches``.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            pix = _image_pixels(p)
            if pix is not None:
                feats.append(_image_features(pix, self.dim).tolist())
            else:
                feats.append(_fake_decode_features(p, self.dim).tolist())
        out = batch.drop_columns(["payload"])  # features replace heavy bytes
        return out.append_column("features", pa.array(feats, pa.list_(pa.float32())))


class ImageResizer:
    """Actor-pool stage: resize = rewrite payload + metadata.

    PPM/BMP payloads get a REAL nearest-neighbour resample (numpy index
    resampling on the decoded pixels; output re-encoded as binary PPM, the
    canonical internal format). Unknown formats keep the proportional-
    truncation stub. Binary-in/binary-out with updated typed metadata.
    """

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def _resize_real(self, pix: np.ndarray) -> np.ndarray:
        h, w = pix.shape[:2]
        scale = min(1.0, self.max_side / max(w, h))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        yi = np.minimum((np.arange(nh) / scale).astype(np.int64), h - 1)
        xi = np.minimum((np.arange(nw) / scale).astype(np.int64), w - 1)
        return pix[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["meta_width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["meta_height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        new_w = np.maximum(1, (w * scale)).astype(np.int32)
        new_h = np.maximum(1, (h * scale)).astype(np.int32)
        payloads = []
        for i, p in enumerate(batch["payload"].to_pylist()):
            pix = _image_pixels(p)
            if pix is not None:
                resized = self._resize_real(pix)
                new_h[i], new_w[i] = resized.shape[0], resized.shape[1]
                payloads.append(_encode_ppm(resized))
            else:
                # stub: payload truncated proportionally to pixel-count cut
                r = float(new_w[i]) * float(new_h[i]) / max(1.0, w[i] * h[i])
                payloads.append(p[: max(1, int(len(p) * r))])
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

    PCM WAV payloads (RIFF/WAVE magic) decode to REAL samples via the
    stdlib ``wave`` module and yield RMS/zero-crossing/log-band-energy
    features; other formats fall back to the deterministic fake — a
    production deployment swaps in libav/torchaudio in the same actor
    shape."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                x, rate = _decode_wav(p)
                feats.append(_audio_features(x, rate, self.dim).tolist())
            else:
                feats.append(_fake_decode_features(p, self.dim).tolist())
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


# ----------------------------------------------------------------- GIF (LZW)


def _lzw_decode_gif(data: bytes, min_code: int, expected: int) -> np.ndarray:
    """GIF-variant LZW decode (variable width, LSB-first, CLEAR/EOI codes,
    width bumps at 2^width up to 12 bits). Sequential by nature — the
    per-code Python loop is bounded by the image's pixel count, the same
    budget as the PNG per-row unfilter loop."""
    clear = 1 << min_code
    eoi = clear + 1
    buf = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    width = min_code + 1
    roots = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    prev: int = -1
    out = bytearray()
    while pos + width <= nbits and len(out) < expected:
        code = (buf >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = list(roots) + [b"", b""]
            width = min_code + 1
            prev = -1
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("GIF LZW stream missing initial clear code")
        if prev == -1:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(table[prev] + entry[:1])
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        if prev != -1 and len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = code
    if len(out) < expected:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _lzw_encode_literal_gif(indices: np.ndarray, min_code: int) -> bytes:
    """Valid GIF LZW stream emitting only literal codes — it mirrors the
    decoder's dictionary-growth/width schedule exactly (one entry per
    literal after the first, width bump at 2^width, CLEAR before the
    12-bit table fills) without storing any multi-symbol strings."""
    clear = 1 << min_code
    eoi = clear + 1
    buf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width

    width = min_code + 1
    emit(clear, width)
    next_code = eoi + 1
    prev = False
    for ix in indices.astype(np.uint8).tolist():
        emit(int(ix), width)
        if prev:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            if next_code >= 4094:
                emit(clear, width)
                width = min_code + 1
                next_code = eoi + 1
                prev = False
                continue
        prev = True
    emit(eoi, width)
    raw = buf.to_bytes((nbits + 7) // 8, "little")
    out = bytearray()
    for i in range(0, len(raw), 255):
        block = raw[i : i + 255]
        out.append(len(block))
        out.extend(block)
    out.append(0)
    return bytes(out)


def _decode_gif(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 pixels from the FIRST frame of a GIF87a/89a payload
    (global or local color table, no interlace)."""
    if payload[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    w_s, h_s, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data.extend(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode_gif(bytes(data), min_code, iw * ih)
        return table[idx.reshape(ih, iw)]
    raise ValueError("GIF payload has no image block")


def make_gif_bytes(
    width: int = 16, height: int = 12, seed: int = 44, indices: np.ndarray | None = None
) -> bytes:
    """Real single-frame GIF87a with a 256-entry grayscale global table."""
    rng = np.random.default_rng(seed)
    if indices is None:
        indices = rng.integers(0, 256, (height, width)).astype(np.uint8)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x70 | 0x07, 0, 0)
    gray = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out += gray.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    out += _lzw_encode_literal_gif(indices.reshape(-1), 8)
    out.append(0x3B)
    return bytes(out)
