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


def _residual_width(v: np.ndarray, ref: int) -> tuple[np.ndarray, int]:
    """(v - ref) with int64 wraparound; width 64 signals "not packable"."""
    with np.errstate(over="ignore"):
        r = v - np.int64(ref)
    if len(r) == 0:
        return r, 0
    rmax = int(r.max())
    if int(r.min()) < 0 or rmax < 0:
        return r, 64  # wrapped: true range needs >= 64 bits
    return r, bit_width(rmax)


def _run_bounds(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(v)
    change = np.nonzero(v[1:] != v[:-1])[0]
    starts = np.concatenate([[0], change + 1]) if n else np.array([], dtype=np.int64)
    lens = np.diff(np.concatenate([starts, [n]]))
    return starts.astype(np.int64), lens.astype(np.int64)


def encode_ints(v: np.ndarray, _depth: int = 0) -> tuple[dict[str, Any], bytes]:
    """Encode an int64 array, auto-selecting the cheapest codec."""
    v = np.ascontiguousarray(v, dtype=np.int64)
    n = len(v)
    if n == 0:
        return {"c": "plain"}, b""

    vmin = int(v.min())
    resid, w_for = _residual_width(v, vmin)
    g_for = 1
    if 0 < w_for < 64:
        # factor out a common divisor (day-granularity timestamps, scaled
        # decimals): residual = g * packed, shrinking the bit width
        g_for = int(np.gcd.reduce(resid))
        if g_for > 1:
            resid = resid // g_for
            w_for = bit_width(int(resid.max()))
    candidates: list[tuple[int, str]] = [(8 * n, "plain")]
    if w_for < 64:
        candidates.append((packed_nbytes(n, w_for), "for"))

    d = np.array([], dtype=np.int64)
    w_delta = 64
    dmin = 0
    g_delta = 1
    dresid = np.array([], dtype=np.int64)
    if n > 1:
        with np.errstate(over="ignore"):
            d = v[1:] - v[:-1]
        dmin = int(d.min())
        dresid, w_delta = _residual_width(d, dmin)
        if 0 < w_delta < 64:
            g_delta = int(np.gcd.reduce(dresid))
            if g_delta > 1:
                dresid = dresid // g_delta
                w_delta = bit_width(int(dresid.max()))
        if w_delta < 64:
            candidates.append((8 + packed_nbytes(n - 1, w_delta) + _HDR_OVERHEAD, "delta"))

    # count runs cheaply first; only materialize bounds when RLE can win
    n_runs = (int((v[1:] != v[:-1]).sum()) + 1) if n > 1 else 1
    if _depth < 1 and 1 <= n_runs <= n // 3:
        starts, run_lens = _run_bounds(v)
        run_vals = v[starts]
        _, rv_w = _residual_width(run_vals, int(run_vals.min()))
        rl_w = bit_width(int(run_lens.max()))
        vals_cost = 8 * n_runs if rv_w >= 64 else packed_nbytes(n_runs, rv_w)
        cost_rle = vals_cost + packed_nbytes(n_runs, rl_w) + 2 * _HDR_OVERHEAD
        candidates.append((cost_rle, "rle"))

    choice = min(candidates)[1]

    if choice == "for":
        hdr = {"c": "for", "ref": vmin, "w": w_for}
        if g_for > 1:
            hdr["g"] = g_for
        return hdr, pack_bits(resid, w_for)
    if choice == "delta":
        hdr = {"c": "delta", "first": int(v[0]), "ref": dmin, "w": w_delta}
        if g_delta > 1:
            hdr["g"] = g_delta
        return hdr, pack_bits(dresid, w_delta)
    if choice == "rle":
        run_vals = v[starts]
        vh, vb = encode_ints(run_vals, _depth + 1)
        lh, lb = encode_ints(run_lens, _depth + 1)
        hdr = {
            "c": "rle",
            "runs": n_runs,
            "vals": {"h": vh, "len": len(vb)},
            "lens": {"h": lh, "len": len(lb)},
        }
        return hdr, vb + lb
    return {"c": "plain"}, v.tobytes()


def decode_ints(hdr: dict[str, Any], blob: bytes, n: int) -> np.ndarray:
    """Decode back to int64 (exact)."""
    c = hdr["c"]
    if c == "plain":
        return np.frombuffer(blob, dtype=np.int64, count=n).copy()
    if c == "for":
        resid = unpack_bits(blob, hdr["w"], n)
        with np.errstate(over="ignore"):
            if hdr.get("g", 1) > 1:
                resid = resid * np.int64(hdr["g"])
            return resid + np.int64(hdr["ref"])
    if c == "delta":
        dresid = unpack_bits(blob, hdr["w"], n - 1)
        with np.errstate(over="ignore"):
            if hdr.get("g", 1) > 1:
                dresid = dresid * np.int64(hdr["g"])
            d = dresid + np.int64(hdr["ref"])
            out = np.concatenate([np.array([hdr["first"]], dtype=np.int64), d])
            np.cumsum(out, out=out)  # int64 wraparound cumsum
        return out
    if c == "rle":
        nb_v = hdr["vals"]["len"]
        run_vals = decode_ints(hdr["vals"]["h"], blob[:nb_v], hdr["runs"])
        run_lens = decode_ints(hdr["lens"]["h"], blob[nb_v:], hdr["runs"])
        return np.repeat(run_vals, run_lens)
    raise ValueError(f"unknown int codec {c!r}")
