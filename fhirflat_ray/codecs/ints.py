"""Integer codec family: frame-of-reference + bit-pack, delta+FOR, RLE, plain.

All arithmetic is signed int64 with C wraparound (numpy semantics), which this
machine executes at full SIMD speed. Frame-of-reference residuals that would
need >= 64 bits (pathological full-range columns) simply fall back to PLAIN —
byte cost is identical there anyway.

Selection computes the *exact* encoded byte count of every candidate from
cheap stats (min/max → bit width, run count) and picks the argmin; the
reference's analogous data-dependent branching is the flatten-vs-``_dense``
choice at /root/reference/fhirflat/fhir2flat.py:56-65.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from fhirflat_ray.codecs.bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits

_HDR_OVERHEAD = 40  # rough per-node JSON header cost, for candidate comparison


def _range_width(vmin: int, vmax: int) -> int:
    """Bit width of ``vmax - vmin`` in EXACT Python-int arithmetic (no
    residual array materialized); width 64 signals "not packable" — the
    range itself needs >= 64 bits. Equivalent to the wraparound check on a
    materialized ``v - vmin`` residual, without the n*8-byte allocation
    (fresh large allocations page-fault at ~15 MB/s on this host, and on a
    real cluster they are pure memory-bandwidth waste for candidate codecs
    that lose the selection)."""
    rng = vmax - vmin
    return 64 if rng >= (1 << 63) else bit_width(rng)


_GCD_SAMPLE = 4096


_STAT_CHUNK = 1 << 20


def _gcd_of_residuals(v: np.ndarray, ref: int, diff: bool = False) -> int:
    """gcd of ``v - ref`` (or of ``(v[1:] - v[:-1]) - ref`` with
    ``diff=True``) with a sampled shortcut: gcd over any SUBSET divides
    into gcd over fewer constraints, so sample_gcd == 1 proves the full gcd
    is 1 (the overwhelmingly common case) with a 4096-element temporary.
    The full fallback accumulates per chunk — O(chunk) peak memory."""
    m = len(v) - 1 if diff else len(v)
    if m <= 0:
        return 1
    with np.errstate(over="ignore"):
        k = min(m, _GCD_SAMPLE)
        sample = (
            (v[1 : k + 1].astype(np.int64) - v[:k]) if diff else v[:k].astype(np.int64)
        )
        g = int(np.gcd.reduce(sample - np.int64(ref)))
        # ONLY g == 1 is a proof (gcd over more elements can only shrink);
        # g == 0 means every sampled residual was zero (ties at the min are
        # common in sorted data) and says NOTHING about the full gcd — fall
        # through to the chunked scan
        if g == 1 or m <= _GCD_SAMPLE:
            return max(g, 1)
        g = 0
        for i0 in range(0, m, _STAT_CHUNK):
            i1 = min(i0 + _STAT_CHUNK, m)
            r = (
                (v[i0 + 1 : i1 + 1].astype(np.int64) - v[i0:i1])
                if diff
                else v[i0:i1].astype(np.int64, copy=False)
            )
            g = int(np.gcd(np.int64(g), np.gcd.reduce(r - np.int64(ref))))
            if g == 1:
                break
        return max(g, 1)


def _delta_run_stats(v: np.ndarray) -> tuple[int, int, int]:
    """One chunked pass over the consecutive-difference stream: returns
    ``(dmin, dmax, n_runs)``. A zero difference is EXACTLY a repeated value
    (int64 subtraction is injective mod 2^64), so the run count falls out
    of the same pass. Peak temporary memory is O(chunk)."""
    n = len(v)
    dmin, dmax, changes = None, None, 0
    with np.errstate(over="ignore"):
        for i0 in range(0, n - 1, _STAT_CHUNK):
            i1 = min(i0 + _STAT_CHUNK, n - 1)
            if v.dtype == np.int64:
                dd = v[i0 + 1 : i1 + 1] - v[i0:i1]
            else:
                dd = v[i0 + 1 : i1 + 1].astype(np.int64) - v[i0:i1]
            cmin, cmax = int(dd.min()), int(dd.max())
            dmin = cmin if dmin is None else min(dmin, cmin)
            dmax = cmax if dmax is None else max(dmax, cmax)
            changes += int(np.count_nonzero(dd))
    return dmin, dmax, changes + 1


def _change_indices(v: np.ndarray) -> np.ndarray:
    """Indices ``i`` with ``v[i+1] != v[i]``, accumulated per chunk (output
    is run-count-sized; temporaries are chunk-sized)."""
    parts = []
    n = len(v)
    for i0 in range(0, n - 1, _STAT_CHUNK):
        i1 = min(i0 + _STAT_CHUNK, n - 1)
        nz = np.nonzero(v[i0 + 1 : i1 + 1] != v[i0:i1])[0]
        if len(nz):
            parts.append(nz + i0)
    if not parts:
        return np.array([], dtype=np.int64)
    return np.concatenate(parts).astype(np.int64)


def encode_ints(v: np.ndarray, _depth: int = 0) -> tuple[dict[str, Any], bytes]:
    """Encode an int64 array, auto-selecting the cheapest codec.

    Candidate costs come from min/max/run-count STATS only — residual
    arrays are materialized solely for the winning codec (losing
    candidates cost zero large allocations). int32 input (Arrow dictionary
    indices) is accepted directly; promotion to int64 happens per chunk
    inside the stats/pack loops, never as a whole-array copy."""
    v = np.ascontiguousarray(v)
    if v.dtype not in (np.dtype(np.int32), np.dtype(np.int64)):
        v = v.astype(np.int64)
    n = len(v)
    if n == 0:
        return {"c": "plain"}, b""

    vmin, vmax = int(v.min()), int(v.max())
    w_for = _range_width(vmin, vmax)
    g_for = 1
    if 0 < w_for < 64:
        # factor out a common divisor (day-granularity timestamps, scaled
        # decimals): residual = g * packed, shrinking the bit width
        g_for = _gcd_of_residuals(v, vmin)
        if g_for > 1:
            w_for = bit_width((vmax - vmin) // g_for)
    candidates: list[tuple[int, str]] = [(8 * n, "plain")]
    if w_for < 64:
        candidates.append((packed_nbytes(n, w_for), "for"))

    w_delta = 64
    dmin = 0
    g_delta = 1
    n_runs = 1
    if n > 1:
        dmin, dmax, n_runs = _delta_run_stats(v)
        w_delta = _range_width(dmin, dmax)
        if 0 < w_delta < 64:
            g_delta = _gcd_of_residuals(v, dmin, diff=True)
            if g_delta > 1:
                w_delta = bit_width((dmax - dmin) // g_delta)
        if w_delta < 64:
            candidates.append((8 + packed_nbytes(n - 1, w_delta) + _HDR_OVERHEAD, "delta"))

    if _depth < 1 and 1 <= n_runs <= n // 3:
        change = _change_indices(v)
        starts = np.concatenate([[0], change + 1]).astype(np.int64)
        run_lens = np.diff(np.concatenate([starts, [n]]))
        run_vals = v[starts].astype(np.int64, copy=False)
        rv_w = _range_width(int(run_vals.min()), int(run_vals.max()))
        rl_w = bit_width(int(run_lens.max()))
        vals_cost = 8 * n_runs if rv_w >= 64 else packed_nbytes(n_runs, rv_w)
        cost_rle = vals_cost + packed_nbytes(n_runs, rl_w) + 2 * _HDR_OVERHEAD
        candidates.append((cost_rle, "rle"))

    choice = min(candidates)[1]

    if choice == "for":
        hdr = {"c": "for", "ref": vmin, "w": w_for}
        if g_for > 1:
            hdr["g"] = g_for
        # residual transform fused into the chunked packer — no n-sized
        # residual array exists at any point
        return hdr, pack_bits(v, w_for, ref=vmin, g=g_for)
    if choice == "delta":
        hdr = {"c": "delta", "first": int(v[0]), "ref": dmin, "w": w_delta}
        if g_delta > 1:
            hdr["g"] = g_delta
        return hdr, pack_bits(v, w_delta, ref=dmin, g=g_delta, diff=True)
    if choice == "rle":
        vh, vb = encode_ints(run_vals, _depth + 1)
        lh, lb = encode_ints(run_lens, _depth + 1)
        hdr = {
            "c": "rle",
            "runs": n_runs,
            "vals": {"h": vh, "len": len(vb)},
            "lens": {"h": lh, "len": len(lb)},
        }
        return hdr, vb + lb
    return {"c": "plain"}, v.astype(np.int64, copy=False).tobytes()


def decode_ints(hdr: dict[str, Any], blob: bytes, n: int) -> np.ndarray:
    """Decode back to int64 (exact)."""
    c = hdr["c"]
    if c == "plain":
        return np.frombuffer(blob, dtype=np.int64, count=n).copy()
    if c == "for":
        resid = unpack_bits(blob, hdr["w"], n)
        with np.errstate(over="ignore"):
            if hdr.get("g", 1) > 1:
                resid *= np.int64(hdr["g"])
            resid += np.int64(hdr["ref"])
        return resid
    if c == "delta":
        out = np.empty(n, dtype=np.int64)
        out[0] = hdr["first"]
        unpack_bits(blob, hdr["w"], n - 1, out=out[1:])
        with np.errstate(over="ignore"):
            if hdr.get("g", 1) > 1:
                out[1:] *= np.int64(hdr["g"])
            out[1:] += np.int64(hdr["ref"])
            np.cumsum(out, out=out)  # int64 wraparound cumsum
        return out
    if c == "rle":
        nb_v = hdr["vals"]["len"]
        run_vals = decode_ints(hdr["vals"]["h"], blob[:nb_v], hdr["runs"])
        run_lens = decode_ints(hdr["lens"]["h"], blob[nb_v:], hdr["runs"])
        return np.repeat(run_vals, run_lens)
    raise ValueError(f"unknown int codec {c!r}")
