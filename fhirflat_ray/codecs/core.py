"""Top-level column encode/decode: type dispatch, null split, passthrough.

``encode_column(arr) -> (header, blob)`` where the header is JSON-safe and the
blob is a single bytes payload; ``decode_column`` reconstructs the Arrow array
bit-identically (type, values, and null/empty distinction all preserved — the
failure class the reference normalizes by hand at
/root/reference/fhirflat/util.py:150-208).

Nested / unknown types go through an Arrow-IPC passthrough, the analogue of
the reference's ``_dense`` keep-it-opaque fallback
(/root/reference/fhirflat/fhir2flat.py:56-61).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fhirflat_ray.codecs import registry
from fhirflat_ray.codecs.ints import decode_ints, encode_ints
from fhirflat_ray.codecs.strings import decode_strings, encode_strings

_TS_RE = re.compile(r"^timestamp\[(s|ms|us|ns)(?:, tz=(.+))?\]$")
_SIMPLE_TYPES = {
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(),
    "date64[ms]": pa.date64(),
    "time32[s]": pa.time32("s"),
    "time32[ms]": pa.time32("ms"),
    "time64[us]": pa.time64("us"),
    "time64[ns]": pa.time64("ns"),
}
_NP_BY_TYPE = {
    "int8": np.int8,
    "int16": np.int16,
    "int32": np.int32,
    "int64": np.int64,
    "uint8": np.uint8,
    "uint16": np.uint16,
    "uint32": np.uint32,
    "uint64": np.uint64,
}


def type_to_str(t: pa.DataType) -> str:
    return str(t)


def str_to_type(s: str) -> pa.DataType:
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    m = _TS_RE.match(s)
    if m:
        return pa.timestamp(m.group(1), tz=m.group(2))
    raise ValueError(f"unsupported type string {s!r}")


def _is_intlike(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
        or pa.types.is_time(t)
    )


def _int64_view(arr: pa.Array) -> np.ndarray:
    """Lossless int64 view of any int-like array (uint64 reinterpreted)."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_time64(t) or pa.types.is_date64(t):
        arr = arr.cast(pa.int64())
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        arr = arr.cast(pa.int32())
    np_arr = arr.to_numpy(zero_copy_only=False)
    if np_arr.dtype == np.uint64:
        return np_arr.view(np.int64)
    return np_arr.astype(np.int64)


def _restore_intlike(values: np.ndarray, t: pa.DataType, validity: bytes | None, n: int) -> pa.Array:
    if pa.types.is_timestamp(t) or pa.types.is_date64(t) or pa.types.is_time64(t):
        buf = values.tobytes()
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        buf = values.astype(np.int32).tobytes()
    else:
        npt = _NP_BY_TYPE[str(t)]
        if npt == np.uint64:
            buf = values.view(np.uint64).tobytes()
        else:
            buf = values.astype(npt).tobytes()
    vbuf = pa.py_buffer(validity) if validity is not None else None
    return pa.Array.from_buffers(t, n, [vbuf, pa.py_buffer(buf)])


def _with_validity(arr: pa.Array, validity: bytes | None, n: int) -> pa.Array:
    """Re-apply a validity bitmap to a null-free decoded array."""
    if validity is None:
        return arr
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = np.unpackbits(
        np.frombuffer(validity, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool)
    return pc.if_else(pa.array(valid), arr, pa.scalar(None, arr.type))


def encode_column(
    arr: pa.Array | pa.ChunkedArray,
    shared_vocab: pa.Array | None = None,
    shared_hash: str | None = None,
) -> tuple[dict[str, Any], bytes]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    t = arr.type
    # plug-in codecs get first refusal on every column (registry consulted
    # before the built-ins so users can override even the fast paths); the
    # common no-plug-ins case is a single O(1) check
    custom = registry.try_custom_encode(arr)
    if custom is not None:
        return custom
    if _is_numeric_list(t) and arr.null_count == 0:
        enc = _encode_numeric_list(arr)
        if enc is not None:
            return enc

    hdr: dict[str, Any] = {"t": type_to_str(t) if _is_codecable(t) else "ipc", "n": n}

    if not _is_codecable(t):
        blob = _ipc_serialize(arr)
        hdr["c"] = "ipc"
        return hdr, blob

    validity_blob: bytes | None = None
    if arr.null_count > 0:
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        validity_blob = np.packbits(valid, bitorder="little").tobytes()
        fill: Any
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            fill = ""
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            fill = b""
        elif pa.types.is_boolean(t):
            fill = False
        else:
            fill = 0
        arr = pc.fill_null(arr, pa.scalar(fill, t))
        hdr["valid_len"] = len(validity_blob)

    if pa.types.is_boolean(t):
        vals = arr.to_numpy(zero_copy_only=False)
        body = np.packbits(vals.astype(np.uint8), bitorder="little").tobytes()
        hdr["c"] = "bools"
    elif _is_intlike(t):
        ih, body = encode_ints(_int64_view(arr))
        hdr["c"] = "ints"
        hdr["h"] = ih
    elif pa.types.is_floating(t):
        dec = _try_decimal_ints(arr) if pa.types.is_float64(t) else None
        if dec is not None:
            k, ints = dec
            ih, body = encode_ints(ints)
            if len(body) < 8 * n:  # only keep when it actually wins
                hdr["c"] = "decfloat"
                hdr["k"] = k
                hdr["h"] = ih
            else:
                dec = None
        if dec is None:
            v = arr.to_numpy(zero_copy_only=False)
            bp = _try_byteplane_float(v)
            if bp is not None:
                ph, body = bp
                hdr["c"] = "bpfloat"
                hdr["h"] = ph
            else:
                body = v.tobytes()
                hdr["c"] = "plain_float"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        sh, body = encode_strings(arr, shared_vocab, shared_hash)
        hdr["c"] = "str"
        hdr["h"] = sh
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        # reuse string codecs on a string view (payload is byte-identical;
        # view() reinterprets without UTF-8 validation)
        view = arr.view(pa.large_string() if pa.types.is_large_binary(t) else pa.string())
        sh, body = encode_strings(view, try_fsst=True)
        hdr["c"] = "bin"
        hdr["h"] = sh
    else:  # pragma: no cover - guarded by _is_codecable
        raise AssertionError

    if validity_blob is not None:
        return hdr, validity_blob + body
    return hdr, body


def _is_codecable(t: pa.DataType) -> bool:
    return (
        pa.types.is_boolean(t)
        or _is_intlike(t)
        or pa.types.is_floating(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def _is_numeric_list(t: pa.DataType) -> bool:
    """list/fixed_size_list of floats or int-likes (embedding columns)."""
    if pa.types.is_list(t) or pa.types.is_fixed_size_list(t):
        vt = t.value_type
        return pa.types.is_floating(vt) or _is_intlike(vt) or pa.types.is_boolean(vt)
    return False


def _encode_numeric_list(arr: pa.Array) -> tuple[dict[str, Any], bytes] | None:
    """Numeric list columns (embeddings): child values through the numeric
    codec path + per-row lengths through the int codec — no IPC framing, and
    integer/decimal element types get the full lightweight treatment."""
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_fixed_size_list(t):
        lengths = np.full(len(arr), t.list_size, dtype=np.int64)
        # flatten() is offset/length-aware; .values returns the FULL backing
        # buffer, silently encoding wrong rows for a sliced FixedSizeListArray
        child = arr.flatten()
    else:
        lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        child = pc.list_flatten(arr)
    if isinstance(child, pa.ChunkedArray):
        child = child.combine_chunks()
    if child.null_count > 0:
        return None  # nested nulls → IPC passthrough keeps exact layout
    ch, cb = encode_column(child)
    lh, lb = encode_ints(lengths)
    hdr = {
        "t": type_to_str(t.value_type),
        "n": len(arr),
        "c": "numlist",
        "fixed": t.list_size if pa.types.is_fixed_size_list(t) else None,
        "vname": t.value_field.name,  # preserve e.g. list<element: float>
        "vnull": t.value_field.nullable,
        "lens": {"h": lh, "len": len(lb)},
        "child": {"h": ch, "n": len(child)},
    }
    return hdr, lb + cb


def _decode_numeric_list(hdr: dict[str, Any], blob: bytes, dict_store=None) -> pa.Array:
    nb = hdr["lens"]["len"]
    lengths = decode_ints(hdr["lens"]["h"], blob[:nb], hdr["n"])
    child = decode_column(hdr["child"]["h"], blob[nb:], dict_store)
    if isinstance(child, pa.ChunkedArray):
        child = child.combine_chunks()
    field = pa.field(hdr.get("vname", "item"), child.type, nullable=hdr.get("vnull", True))
    if hdr.get("fixed"):
        out = pa.FixedSizeListArray.from_arrays(child, hdr["fixed"])
        return out.cast(pa.list_(field, hdr["fixed"]))
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    out = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child)
    return out.cast(pa.list_(field))


def _try_decimal_ints(arr: pa.Array) -> tuple[int, np.ndarray] | None:
    """Decimal-scaled-integer float codec (frame-of-reference for money):
    find the smallest k <= 4 with v == round(v * 10^k) / 10^k BITWISE for
    every element; then the column is stored as integers + scale. The decode
    division reproduces the exact input doubles (verified at encode time), so
    the round trip stays bit-identical; NaN/-0.0/huge values fail the check
    and fall back to plain."""
    v = arr.to_numpy(zero_copy_only=False)
    if len(v) == 0 or not np.all(np.isfinite(v)):
        return None
    vbits = v.view(np.int64)
    for k in range(5):
        scale = 10.0**k
        ints = np.round(v * scale)
        if np.abs(ints).max() >= 2**53:
            return None
        # verify through the ACTUAL stored representation (int64) — e.g.
        # -0.0 survives a float division check but not the integer cast
        stored = ints.astype(np.int64)
        back = stored.astype(np.float64) / scale
        if np.array_equal(back.view(np.int64), vbits):
            return k, stored
    return None


def _try_byteplane_float(v: np.ndarray) -> tuple[dict[str, Any], bytes] | None:
    """Byte-plane split for float payloads that decimal scaling can't touch.

    Embedding-style floats (unit-norm vectors) concentrate the sign+exponent
    byte into a handful of values (measured ~2.7 bits entropy, ~20 distinct,
    on the synthetic embeddings) while mantissa bytes are full-entropy.
    Splitting each value into its little-endian byte planes lets the
    low-cardinality planes be dictionary+bitpacked (vectorized searchsorted
    + pack_bits) while full-entropy planes stay plain — a ~10-15% win on
    the float payload, bit-exact (NaN/-0.0 reassemble byte-identically).
    Returns None unless the split beats plain storage with margin."""
    from fhirflat_ray.codecs.bitpack import bit_width, pack_bits, packed_nbytes

    n = len(v)
    itemsize = v.dtype.itemsize
    if n < 64:
        return None
    raw = np.ascontiguousarray(v).view(np.uint8).reshape(n, itemsize)
    planes = np.ascontiguousarray(raw.T)  # one transpose pass; planes contiguous
    plane_hdrs: list[dict[str, Any]] = []
    parts: list[bytes] = []
    total = 0
    for p in range(itemsize):
        byts = planes[p].astype(np.int64)
        vals = np.unique(byts)
        w = bit_width(len(vals) - 1)
        packed_cost = len(vals) + packed_nbytes(n, w)
        if packed_cost < n:
            codes = np.searchsorted(vals, byts)
            parts.append(vals.astype(np.uint8).tobytes())
            parts.append(pack_bits(codes, w))
            plane_hdrs.append({"m": "d", "w": w, "nv": int(len(vals))})
            total += packed_cost
        else:
            parts.append(planes[p].tobytes())
            plane_hdrs.append({"m": "p"})
            total += n
    if total >= int(0.95 * n * itemsize):
        return None
    return {"planes": plane_hdrs}, b"".join(parts)


def _decode_byteplane_float(
    hdr: dict[str, Any], blob: bytes, n: int, t: pa.DataType
) -> np.ndarray:
    from fhirflat_ray.codecs.bitpack import packed_nbytes, unpack_bits

    itemsize = 4 if pa.types.is_float32(t) else 8
    planes = np.empty((itemsize, n), dtype=np.uint8)
    pos = 0
    for p, ph in enumerate(hdr["h"]["planes"]):
        if ph["m"] == "d":
            nv, w = ph["nv"], ph["w"]
            vals = np.frombuffer(blob, dtype=np.uint8, count=nv, offset=pos)
            pos += nv
            nb = packed_nbytes(n, w)
            codes = unpack_bits(blob[pos : pos + nb], w, n)
            pos += nb
            planes[p] = vals[codes]
        else:
            planes[p] = np.frombuffer(blob, dtype=np.uint8, count=n, offset=pos)
            pos += n
    raw = np.ascontiguousarray(planes.T).reshape(-1)
    return raw.view(np.float32 if itemsize == 4 else np.float64)


def _ipc_serialize(arr: pa.Array) -> bytes:
    table = pa.table({"v": arr})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue().to_pybytes()


def _ipc_deserialize(blob: bytes) -> pa.Array:
    with pa.ipc.open_stream(blob) as reader:
        table = reader.read_all()
    return table.column("v").combine_chunks()


def decode_column(
    hdr: dict[str, Any],
    blob: bytes,
    dict_store: dict[str, pa.Array] | None = None,
) -> pa.Array:
    if hdr.get("c", "").startswith(registry.CUSTOM_PREFIX):
        return registry.custom_decode(hdr, blob)
    if hdr.get("c") == "ipc":
        return _ipc_deserialize(blob)
    if hdr.get("c") == "numlist":
        return _decode_numeric_list(hdr, blob, dict_store)
    n = hdr["n"]
    t = str_to_type(hdr["t"])
    validity: bytes | None = None
    if "valid_len" in hdr:
        validity = blob[: hdr["valid_len"]]
        blob = blob[hdr["valid_len"] :]

    c = hdr["c"]
    if c == "bools":
        bits = np.unpackbits(np.frombuffer(blob, np.uint8), count=n, bitorder="little")
        out = pa.array(bits.astype(bool), pa.bool_())
        return _with_validity(out, validity, n)
    if c == "ints":
        vals = decode_ints(hdr["h"], blob, n)
        return _restore_intlike(vals, t, validity, n)
    if c == "decfloat":
        ints = decode_ints(hdr["h"], blob, n)
        vals = ints.astype(np.float64) / (10.0 ** hdr["k"])
        vbuf = pa.py_buffer(validity) if validity is not None else None
        return pa.Array.from_buffers(t, n, [vbuf, pa.py_buffer(vals.tobytes())])
    if c == "plain_float":
        dtype = np.float32 if pa.types.is_float32(t) else np.float64
        vals = np.frombuffer(blob, dtype=dtype, count=n)
        vbuf = pa.py_buffer(validity) if validity is not None else None
        return pa.Array.from_buffers(t, n, [vbuf, pa.py_buffer(vals.tobytes())])
    if c == "bpfloat":
        vals = _decode_byteplane_float(hdr, blob, n, t)
        vbuf = pa.py_buffer(validity) if validity is not None else None
        return pa.Array.from_buffers(t, n, [vbuf, pa.py_buffer(vals.tobytes())])
    if c == "str":
        out = decode_strings(hdr["h"], blob, n, dict_store)
        if str(out.type) != str(t):
            out = out.cast(t)
        return _with_validity(out, validity, n)
    if c == "bin":
        out = decode_strings(hdr["h"], blob, n, dict_store)
        target_str = pa.large_string() if pa.types.is_large_binary(t) else pa.string()
        if str(out.type) != str(target_str):
            out = out.cast(target_str)
        out = out.view(t)
        return _with_validity(out, validity, n)
    raise ValueError(f"unknown column codec {c!r}")
