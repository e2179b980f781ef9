"""FSST-style symbol-table string compression (pure Python/numpy variant).

Follows the idea of FSST (Boncz et al., "FSST: Fast Random Access String
Compression", VLDB 2020; see PAPERS.md): learn a table of frequent multi-byte
symbols from a sample and replace each occurrence with a 1-byte code, keeping
per-string random access (we store encoded lengths per string).

Deviation from the paper, chosen for vectorized speed without native code:
instead of a 255-code space plus an escape byte, codes are assigned ONLY from
byte values that do not occur anywhere in the column ("free alphabet"), so no
escaping is needed and both encode and decode are sequences of C-speed
``bytes.replace`` passes over the concatenated payload. A free separator byte
protects string boundaries so symbols never span strings. If the column uses
too much of the byte alphabet the codec reports itself inapplicable and
selection falls back (PLAIN / dict), mirroring the reference's ``_dense``
passthrough fallback (/root/reference/fhirflat/fhir2flat.py:56-61).
"""

from __future__ import annotations

from collections import Counter
from typing import Any

import numpy as np

MAX_SYMBOL_LEN = 8
MAX_SYMBOLS = 96
MIN_FREE_CODES = 4  # separator + at least 3 symbols, else not applicable
SAMPLE_BYTES = 1 << 16


def free_byte_values(data: bytes, sample_cap: int = 1 << 22) -> list[int]:
    """Byte values not present in ``data`` (checked exactly, vectorized)."""
    if not data:
        return list(range(256))
    arr = np.frombuffer(data, dtype=np.uint8)
    present = np.zeros(256, dtype=bool)
    present[np.unique(arr)] = True
    return [b for b in range(256) if not present[b]]


def build_symbols(sample: bytes, max_symbols: int) -> list[bytes]:
    """Pick frequent substrings (len 2..8) by gain = count * (len - 1)."""
    counts: Counter[bytes] = Counter()
    m = len(sample)
    for length in range(2, MAX_SYMBOL_LEN + 1):
        for i in range(0, m - length + 1):
            counts[sample[i : i + length]] += 1
    scored = sorted(
        ((cnt * (len(s) - 1), s) for s, cnt in counts.items() if cnt >= 4),
        key=lambda t: (-t[0], t[1]),
    )
    chosen: list[bytes] = []
    for _gain, sym in scored:
        if len(chosen) >= max_symbols:
            break
        # suppress near-duplicates: a symbol that contains or is contained by
        # an already-chosen one mostly re-covers the same bytes and wastes a
        # code point that a diverse symbol could use
        if any(sym in c or c in sym for c in chosen):
            continue
        chosen.append(sym)
    # longest-first so greedy replacement prefers bigger wins
    chosen.sort(key=lambda s: (-len(s), s))
    return chosen


def _apply_symbols(data: bytes, symbols: list[bytes], codes: list[int]) -> bytes:
    for sym, code in zip(symbols, codes):
        data = data.replace(sym, bytes([code]))
    return data


class FsstTable:
    """A learned symbol table bound to a concrete code assignment."""

    def __init__(self, symbols: list[bytes], codes: list[int], sep: int):
        self.symbols = symbols
        self.codes = codes
        self.sep = sep

    def serialize(self) -> bytes:
        out = bytearray([self.sep, len(self.symbols)])
        for sym, code in zip(self.symbols, self.codes):
            out += bytes([code, len(sym)])
            out += sym
        return bytes(out)

    @classmethod
    def deserialize(cls, blob: bytes) -> "FsstTable":
        sep, n = blob[0], blob[1]
        pos = 2
        symbols, codes = [], []
        for _ in range(n):
            code, length = blob[pos], blob[pos + 1]
            pos += 2
            symbols.append(blob[pos : pos + length])
            codes.append(code)
            pos += length
        return cls(symbols, codes, sep)


def train(data: bytes) -> FsstTable | None:
    """Learn a table for ``data``; None when the codec is not applicable."""
    free = free_byte_values(data)
    if len(free) < MIN_FREE_CODES:
        return None
    sep = free[0]
    code_space = free[1:]
    symbols = build_symbols(data[:SAMPLE_BYTES], min(MAX_SYMBOLS, len(code_space)))
    if not symbols:
        return None
    codes = code_space[: len(symbols)]
    return FsstTable(symbols[: len(codes)], codes, sep)


def encode_parts(parts: list[bytes], table: FsstTable) -> tuple[bytes, np.ndarray]:
    """Encode per-string byte payloads; returns (blob, encoded lengths)."""
    sepb = bytes([table.sep])
    joined = sepb.join(parts)
    packed = _apply_symbols(joined, table.symbols, table.codes)
    enc_parts = packed.split(sepb)
    lengths = np.fromiter((len(p) for p in enc_parts), dtype=np.int64, count=len(enc_parts))
    return packed.replace(sepb, b""), lengths


def decode_blob(blob: bytes, lengths: np.ndarray, table: FsstTable) -> list[bytes]:
    """Inverse of :func:`encode_parts`."""
    sepb = bytes([table.sep])
    offs = np.concatenate([[0], np.cumsum(lengths)])
    joined = sepb.join(blob[offs[i] : offs[i + 1]] for i in range(len(lengths)))
    for sym, code in zip(table.symbols, table.codes):
        joined = joined.replace(bytes([code]), sym)
    return joined.split(sepb)


def estimate_ratio(data: bytes, table: FsstTable) -> float:
    """Compression ratio estimated on a sample (encoded/raw, lower is better)."""
    sample = data[:SAMPLE_BYTES]
    if not sample:
        return 1.0
    packed = _apply_symbols(sample, table.symbols, table.codes)
    return len(packed) / len(sample)


__all__: list[Any] = [
    "FsstTable",
    "train",
    "encode_parts",
    "decode_blob",
    "estimate_ratio",
    "free_byte_values",
    "build_symbols",
]
