"""Vectorized bit-packing of non-negative int64 values (numpy, no Python loops).

Layout for width ``w = 8*q + s``: ``q`` full byte-planes (plane ``k`` holds
byte ``k`` of every value, ``n`` bytes each) followed by ``s`` bit-planes of
the top partial byte (``ceil(n/8)`` bytes each, ``np.packbits`` little-endian).

This plane layout is chosen deliberately: it needs only contiguous elementwise
signed shifts plus ``packbits``/``unpackbits`` — on this numpy build, unsigned
and strided kernels are an order of magnitude slower, while signed shifts and
(un)packbits run at full C speed. Values must satisfy ``0 <= v < 2**width``
with ``width <= 63``; width 64 cases are the caller's PLAIN fallback.

Both directions run CHUNKED (1M values per step, a multiple of 8 so the
bit-plane packbits boundaries stay byte-aligned): peak temporary memory is
O(chunk), not O(n), and the per-chunk scratch stays in the allocator's warm
arena. That matters twice — on a real cluster the encoder's working set stays
cache-sized instead of streaming n*8-byte temporaries through DRAM per plane,
and packing can FUSE the frame-of-reference / delta residual transform
(``(v - ref) // g``) so the residual array is never materialized at all.
"""

from __future__ import annotations

import numpy as np

#: values per packing step; multiple of 8 keeps np.packbits chunk-composable
_CHUNK = 1 << 20


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (0 → width 0)."""
    return int(max_value).bit_length()


def packed_nbytes(n: int, width: int) -> int:
    q, s = divmod(width, 8)
    return q * n + s * ((n + 7) // 8)


def pack_bits(
    values: np.ndarray,
    width: int,
    ref: int = 0,
    g: int = 1,
    diff: bool = False,
) -> bytes:
    """Pack ``(t - ref) // g`` where ``t`` is ``values`` itself (default) or,
    with ``diff=True``, the consecutive-difference stream
    ``values[1:] - values[:-1]`` (length ``len(values) - 1``) — the
    frame-of-reference / delta residual transform runs FUSED inside the
    chunk loop, so the residual array is never materialized. Residuals must
    satisfy ``0 <= r < 2**width``, ``width <= 63``. ``values`` may be int32
    (e.g. Arrow dictionary indices) — promotion to int64 happens per chunk,
    never as a whole-array copy."""
    v = np.ascontiguousarray(values)
    if v.dtype not in (np.dtype(np.int32), np.dtype(np.int64)):
        v = v.astype(np.int64)
    m = len(v) - 1 if diff else len(v)
    if width == 0 or m <= 0:
        return b""
    q, s = divmod(width, 8)
    per = (m + 7) // 8
    # one preallocated output buffer; planes are views into it, so the
    # final serialization is a single copy (no per-plane tobytes + join)
    out = np.empty(q * m + s * per, np.uint8)
    planes = [out[k * m : (k + 1) * m] for k in range(q)]
    bit_planes = [out[q * m + b * per : q * m + (b + 1) * per] for b in range(s)]

    for i0 in range(0, m, _CHUNK):
        i1 = min(i0 + _CHUNK, m)
        if diff:
            with np.errstate(over="ignore"):
                if v.dtype == np.int64:
                    r = v[i0 + 1 : i1 + 1] - v[i0:i1]
                else:
                    r = v[i0 + 1 : i1 + 1].astype(np.int64) - v[i0:i1]
                r -= np.int64(ref)
        else:
            r = v[i0:i1].astype(np.int64, copy=False) - np.int64(ref)
        if g > 1:
            r //= g
        for k in range(q):
            planes[k][i0:i1] = (r >> (8 * k)).astype(np.uint8)
        if s:
            top = (r >> (8 * q)).astype(np.int32)
            b0 = i0 // 8
            b1 = (i1 + 7) // 8
            for b in range(s):
                bit = ((top >> b) & 1).astype(np.uint8)
                bit_planes[b][b0:b1] = np.packbits(bit, bitorder="little")
    return out.tobytes()


def unpack_bits(
    blob: bytes, width: int, n: int, out: np.ndarray | None = None
) -> np.ndarray:
    """Inverse of :func:`pack_bits`'s plain form; returns int64 of length
    ``n`` (the caller applies ``* g + ref`` / delta reconstruction).
    ``out`` lets the caller decode straight into a preallocated slice."""
    if width == 0 or n == 0:
        if out is not None:
            out[:] = 0
            return out
        return np.zeros(n, dtype=np.int64)
    q, s = divmod(width, 8)
    if out is None:
        out = np.empty(n, dtype=np.int64)
    per = (n + 7) // 8
    plane_views = [
        np.frombuffer(blob, dtype=np.uint8, count=n, offset=k * n) for k in range(q)
    ]
    bit_views = [
        np.frombuffer(blob, dtype=np.uint8, count=per, offset=q * n + b * per)
        for b in range(s)
    ]

    for i0 in range(0, n, _CHUNK):
        i1 = min(i0 + _CHUNK, n)
        m = i1 - i0
        if q:
            acc = plane_views[0][i0:i1].astype(np.int64)
            for k in range(1, q):
                acc |= plane_views[k][i0:i1].astype(np.int64) << (8 * k)
        else:
            acc = np.zeros(m, dtype=np.int64)
        if s:
            b0 = i0 // 8
            b1 = (i1 + 7) // 8
            top = np.zeros(m, dtype=np.int32)
            for b in range(s):
                bits = np.unpackbits(
                    bit_views[b][b0:b1], count=m, bitorder="little"
                )
                top |= bits.astype(np.int32) << b
            acc |= top.astype(np.int64) << (8 * q)
        out[i0:i1] = acc
    return out
