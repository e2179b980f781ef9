"""Vectorized bit-packing of non-negative int64 values (numpy, no Python loops).

Layout for width ``w = 8*q + s``: ``q`` full byte-planes (plane ``k`` holds
byte ``k`` of every value, ``n`` bytes each) followed by ``s`` bit-planes of
the top partial byte (``ceil(n/8)`` bytes each, ``np.packbits`` little-endian).

This plane layout is chosen deliberately: it needs only contiguous elementwise
signed shifts plus ``packbits``/``unpackbits`` — on this numpy build, unsigned
and strided kernels are an order of magnitude slower, while signed shifts and
(un)packbits run at full C speed. Values must satisfy ``0 <= v < 2**width``
with ``width <= 63``; width 64 cases are the caller's PLAIN fallback.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (0 → width 0)."""
    return int(max_value).bit_length()


def packed_nbytes(n: int, width: int) -> int:
    q, s = divmod(width, 8)
    return q * n + s * ((n + 7) // 8)


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative int64 ``values`` (< 2**width, width <= 63)."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.int64)
    q, s = divmod(width, 8)
    parts: list[bytes] = []
    for k in range(q):
        parts.append((v >> (8 * k)).astype(np.uint8).tobytes())
    if s:
        top = (v >> (8 * q)).astype(np.int32)
        for b in range(s):
            bit = ((top >> b) & 1).astype(np.uint8)
            parts.append(np.packbits(bit, bitorder="little").tobytes())
    return b"".join(parts)


def unpack_bits(blob: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns int64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.int64)
    q, s = divmod(width, 8)
    out = np.zeros(n, dtype=np.int64)
    pos = 0
    for k in range(q):
        plane = np.frombuffer(blob, dtype=np.uint8, count=n, offset=pos)
        out |= plane.astype(np.int64) << (8 * k)
        pos += n
    if s:
        per = (n + 7) // 8
        top = np.zeros(n, dtype=np.int32)
        for b in range(s):
            bits = np.unpackbits(
                np.frombuffer(blob, dtype=np.uint8, count=per, offset=pos),
                count=n,
                bitorder="little",
            )
            top |= bits.astype(np.int32) << b
            pos += per
        out |= top.astype(np.int64) << (8 * q)
    return out
