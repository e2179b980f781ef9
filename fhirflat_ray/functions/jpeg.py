"""Baseline JPEG (JFIF) codec — stdlib + numpy only.

The decoder covers baseline sequential DCT (SOF0): multi-component scans,
per-table DQT (8/16-bit), DHT-defined Huffman tables, 4:4:4 / 4:2:2 /
4:2:0 chroma subsampling (nearest-neighbor upsample), restart intervals,
0xFF00 byte unstuffing, BT.601 YCbCr→RGB. Progressive (SOF2) and
arithmetic-coded streams raise ValueError (the multimodal actor's
fallback contract). Entropy decoding walks bits in Python — fine for the
fixture/feature scale this repo exercises; a production path would table-
decode (the per-batch actor amortizes everything else).

The encoder is deliberately minimal: GRAYSCALE baseline with ALL-ONES
quantization tables and fixed-length Huffman tables written into DHT (the
decoder reads tables from the stream, so no Annex K constants are needed).
With quant=1, an image whose 8x8 blocks are CONSTANT is reconstructed
PIXEL-EXACTLY (DC-only blocks: float DCT error ~1e-13 rounds away), which
is what lets ``media_features_jpeg`` keep an exact ord()-mirror SQL oracle
over a lossy format. Smooth non-constant blocks reconstruct within ±1.

Reference scope note: the reference repo has no media path at all — this
closes the one remaining deterministic-fake fallback in the multimodal
suite (functions/multimodal.py) flagged by the round-4 review.
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8-point DCT-II basis: matches JPEG's FDCT/IDCT scaling
# (S = A s A^T, s = A^T S A)
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        a = np.sqrt(1.0 / 8.0) if _k == 0 else 0.5
        _A[_k, _n] = a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


# -------------------------------------------------------------- huffman


class _HuffTable:
    """Canonical JPEG Huffman table: (length, code) → symbol."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec: pad with 1s at end; 0 is fine for trailing EOB
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: magnitude bits → signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _unstuff(scan: bytes) -> list[bytes]:
    """Split the entropy stream at restart markers and drop 0xFF00 stuffing.
    Returns one unstuffed byte segment per restart interval."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b == 0xFF and i + 1 < n:
            m = scan[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker: scan data ends
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB pixels from baseline JFIF bytes."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_data = None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # optional fill bytes before a marker (B.1.1.2)
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        data = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(data):
                prec, tid = data[p] >> 4, data[p] & 0x0F
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(data[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(data[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(data):
                cls, tid = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                values = list(data[p + 17 : p + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _HuffTable(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline (extended) sequential
            prec, h, w, nc = data[0], *struct.unpack(">HH", data[1:5]), data[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan_comps = []
            for c in range(ns):
                cs, td_ta = data[1 + 2 * c], data[2 + 2 * c]
                scan_comps.append({"id": cs, "td": td_ta >> 4, "ta": td_ta & 0x0F})
            scan_data = payload[i + 2 + seglen :]
            i = n  # entropy data runs to EOI; stop the marker walk
            continue
        i += 2 + seglen
    if frame is None or scan_data is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }
    n_mcu = mcux * mcuy
    segments = _unstuff(scan_data)
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in comps}
    per_seg = restart_interval if restart_interval else n_mcu
    for m in range(n_mcu):
        if m and restart_interval and m % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG truncated before all restart intervals")
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for sc in scan_comps:
            comp = by_id[sc["id"]]
            q = qt[comp["tq"]]
            dct = huff_dc[sc["td"]]
            act = huff_ac[sc["ta"]]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    s = reader.read_symbol(dct)
                    diff = _extend(reader.read_bits(s), s)
                    pred[comp["id"]] += diff
                    zz[0] = pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(act)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[_ZIGZAG] = zz * q
                    spat = _A.T @ block.reshape(8, 8) @ _A
                    py = (my * comp["v"] + by) * 8
                    px = (mx * comp["h"] + bx) * 8
                    planes[comp["id"]][py : py + 8, px : px + 8] = spat
    # upsample to full resolution, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        p = np.repeat(np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# fixed-length canonical tables (written into DHT; nothing Annex-K needed):
# DC: 12 categories as 4-bit codes; AC: 162 run/size symbols as 8-bit codes
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _enc_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_AC_CODES = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Baseline grayscale JFIF bytes for (h, w) uint8 pixels with ALL-ONES
    quantization (maximum fidelity: constant 8x8 blocks roundtrip
    pixel-exactly, smooth content within ±1). Edges pad by replication."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("encode_jpeg_gray wants (h, w) grayscale")
    h, w = px.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px, ((0, H - h), (0, W - w)), mode="edge").astype(np.float64)
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)  # DQT all ones
    out += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01" + bytes([1, 0x11, 0])
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00"

    wtr = _BitWriter()
    pred = 0
    for by in range(H // 8):
        for bx in range(W // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(_A @ block @ _A.T).astype(np.int64)  # quant = 1
            zz = coef.reshape(64)[_ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _category(diff)
            ln, code = _DC_CODES[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = _AC_CODES[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                s = _category(v)
                ln, code = _AC_CODES[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                ln, code = _AC_CODES[0x00]  # EOB
                wtr.write(code, ln)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray_blocks(block_vals: np.ndarray, blocks_w: int) -> bytes:
    """JFIF bytes for an image of CONSTANT 8x8 blocks (one uint8 per
    block, raster order, ``blocks_w`` per row) — the pixel-EXACT shape the
    ``media_features_jpeg`` oracle mirrors with ord()."""
    vals = np.asarray(block_vals, dtype=np.uint8).reshape(-1, blocks_w)
    return encode_jpeg_gray(np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1))


__all__ = ["decode_jpeg", "encode_jpeg_gray", "encode_jpeg_gray_blocks"]
