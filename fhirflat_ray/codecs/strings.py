"""String codec family: plain, dictionary, word-tokenizing dictionary, FSST.

All codecs take a null-free ``pa.StringArray`` (nulls are split off by
``core.encode_column``) and round-trip bit-identically, including empty
strings, unicode, embedded pipes/newlines and multi-space runs.

- ``dict``: ``pc.dictionary_encode`` codes + vocabulary; the codes go through
  the integer codec family, so sorted low-cardinality columns automatically
  become dict+RLE — the engine form of the reference's ``system|code``
  vocabulary condensing (/root/reference/fhirflat/fhir2flat.py:118-165).
  Supports a shared (cross-partition) vocabulary referenced by hash.
- ``worddict``: split on a single space, dictionary-encode the token stream,
  bit-pack token codes, store per-row token counts. ``" ".join(s.split(" "))
  == s`` for every string, so this is lossless for arbitrary text.
- ``fsst``: see ``codecs/fsst.py`` (FSST, VLDB 2020).
- ``plain``: lengths (int codec) + raw UTF-8 payload.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fhirflat_ray.codecs import fsst as fsst_mod
from fhirflat_ray.codecs.ints import decode_ints, encode_ints

# ---------------------------------------------------------------- helpers


def _string_offsets(arr: pa.Array) -> np.ndarray:
    """The n+1 value-boundary offsets (int64) of a null-free string array,
    straight from the offsets buffer — no payload copy."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype, width = np.int64, 8
    else:
        off_dtype, width = np.int32, 4
    n = len(arr)
    return np.frombuffer(
        arr.buffers()[1], dtype=off_dtype, count=n + 1, offset=arr.offset * width
    ).astype(np.int64)


def _string_payload(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(lengths int64, concatenated utf8 payload) for a null-free string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.array([], dtype=np.int64), b""
    offs = _string_offsets(arr)
    data_buf = arr.buffers()[2]
    data = data_buf[offs[0] : offs[-1]].to_pybytes() if data_buf is not None else b""
    return np.diff(offs), data


def _string_lengths(arr: pa.Array) -> np.ndarray:
    """Per-value byte lengths from the offsets buffer alone — no payload
    copy (``_string_payload`` materializes the concatenated utf8 bytes;
    candidate SIZING must not)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.array([], dtype=np.int64)
    return np.diff(_string_offsets(arr))


def _strings_from_payload(lengths: np.ndarray, data: bytes) -> pa.Array:
    n = len(lengths)
    offs = np.concatenate([[0], np.cumsum(lengths, dtype=np.int64)])
    if offs[-1] <= np.iinfo(np.int32).max:
        return pa.Array.from_buffers(
            pa.string(),
            n,
            [None, pa.py_buffer(offs.astype(np.int32).tobytes()), pa.py_buffer(data)],
        )
    return pa.Array.from_buffers(
        pa.large_string(),
        n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)],
    )


def vocab_hash(vocab: pa.Array) -> str:
    lengths, data = _string_payload(vocab)
    h = hashlib.sha256()
    h.update(lengths.tobytes())
    h.update(data)
    return h.hexdigest()[:16]


# ---------------------------------------------------------------- plain


def encode_plain(arr: pa.Array) -> tuple[dict[str, Any], bytes]:
    lengths, data = _string_payload(arr)
    lh, lb = encode_ints(lengths)
    hdr = {"c": "plain_str", "lens": {"h": lh, "len": len(lb)}}
    return hdr, lb + data


def decode_plain(hdr: dict[str, Any], blob: bytes, n: int) -> pa.Array:
    nb = hdr["lens"]["len"]
    lengths = decode_ints(hdr["lens"]["h"], blob[:nb], n)
    return _strings_from_payload(lengths, blob[nb:])


# ---------------------------------------------------------------- dict


def encode_dict(
    arr: pa.Array, shared_vocab: pa.Array | None = None, shared_hash: str | None = None
) -> tuple[dict[str, Any], bytes] | None:
    """Dictionary codec. With ``shared_vocab`` (and every value present in it)
    the vocabulary is stored by hash only; decode resolves it from the
    manifest-backed dictionary store."""
    if shared_vocab is not None:
        codes_arr = pc.index_in(arr, value_set=shared_vocab)
        if codes_arr.null_count > 0:  # value outside the shared vocab
            return None
        codes = codes_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        ch, cb = encode_ints(codes)
        hdr = {
            "c": "dict",
            "codes": {"h": ch, "len": len(cb)},
            "shared": shared_hash or vocab_hash(shared_vocab),
        }
        return hdr, cb
    denc = arr.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    # int32 indices go to encode_ints as-is (promoted per chunk inside)
    codes = denc.indices.to_numpy(zero_copy_only=False)
    ch, cb = encode_ints(codes)
    vh, vb = encode_plain(denc.dictionary)
    hdr = {
        "c": "dict",
        "codes": {"h": ch, "len": len(cb)},
        "vocab": {"h": vh, "len": len(vb), "n": len(denc.dictionary)},
    }
    return hdr, cb + vb


def decode_dict(
    hdr: dict[str, Any],
    blob: bytes,
    n: int,
    dict_store: dict[str, pa.Array] | None = None,
) -> pa.Array:
    nb = hdr["codes"]["len"]
    codes = decode_ints(hdr["codes"]["h"], blob[:nb], n)
    if "shared" in hdr:
        if not dict_store or hdr["shared"] not in dict_store:
            raise KeyError(
                f"shared dictionary {hdr['shared']} not in decode dictionary store"
            )
        vocab = dict_store[hdr["shared"]]
    else:
        vocab = decode_plain(hdr["vocab"]["h"], blob[nb:], hdr["vocab"]["n"])
    return vocab.take(pa.array(codes))


# ---------------------------------------------------------------- worddict


def encode_worddict(arr: pa.Array) -> tuple[dict[str, Any], bytes]:
    parts = pc.split_pattern(arr, " ")
    # int32 counts/indices go to encode_ints without an int64 whole-array
    # copy (promotion is per-chunk inside the codec)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(parts)
    denc = flat.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    ch, cb = encode_ints(codes)
    th, tb = encode_ints(counts)
    vh, vb = encode_plain(denc.dictionary)
    hdr = {
        "c": "worddict",
        "codes": {"h": ch, "len": len(cb), "n": len(codes)},
        "counts": {"h": th, "len": len(tb)},
        "vocab": {"h": vh, "len": len(vb), "n": len(denc.dictionary)},
    }
    return hdr, cb + tb + vb


def decode_worddict(hdr: dict[str, Any], blob: bytes, n: int) -> pa.Array:
    nc, nt = hdr["codes"]["len"], hdr["counts"]["len"]
    codes = decode_ints(hdr["codes"]["h"], blob[:nc], hdr["codes"]["n"])
    counts = decode_ints(hdr["counts"]["h"], blob[nc : nc + nt], n)
    vocab = decode_plain(hdr["vocab"]["h"], blob[nc + nt :], hdr["vocab"]["n"])
    tokens = vocab.take(pa.array(codes))
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    list_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), tokens)
    return pc.binary_join(list_arr, " ")


# ---------------------------------------------------------------- fsst


def encode_fsst(arr: pa.Array, min_sample_gain: float = 0.0) -> tuple[dict[str, Any], bytes] | None:
    lengths, data = _string_payload(arr)
    table = fsst_mod.train(data)
    if table is None:
        return None
    if min_sample_gain and fsst_mod.estimate_ratio(data, table) > 1.0 - min_sample_gain:
        return None  # the sample says this column won't compress enough
    offs = np.concatenate([[0], np.cumsum(lengths)])
    parts = [data[offs[i] : offs[i + 1]] for i in range(len(lengths))]
    blob, enc_lens = fsst_mod.encode_parts(parts, table)
    lh, lb = encode_ints(enc_lens)
    symtab = table.serialize()
    hdr = {
        "c": "fsst",
        "lens": {"h": lh, "len": len(lb)},
        "symtab_len": len(symtab),
    }
    return hdr, lb + symtab + blob


def decode_fsst(hdr: dict[str, Any], blob: bytes, n: int) -> pa.Array:
    nb = hdr["lens"]["len"]
    enc_lens = decode_ints(hdr["lens"]["h"], blob[:nb], n)
    st = hdr["symtab_len"]
    table = fsst_mod.FsstTable.deserialize(blob[nb : nb + st])
    parts = fsst_mod.decode_blob(blob[nb + st :], enc_lens, table)
    data = b"".join(parts)
    lengths = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
    return _strings_from_payload(lengths, data)


# ---------------------------------------------------------------- selection


def encode_strings(
    arr: pa.Array,
    shared_vocab: pa.Array | None = None,
    shared_hash: str | None = None,
    try_fsst: bool = True,
) -> tuple[dict[str, Any], bytes]:
    """Statistics-driven codec selection with exact final pick.

    Shortlists candidates from cheap stats (cardinality, payload size, space
    density), encodes the shortlist and keeps the smallest actual result.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return encode_plain(arr)

    # candidate sizing from the offsets buffer only — the concatenated
    # payload is materialized ONLY if plain actually wins the selection
    lengths = _string_lengths(arr)
    total = int(lengths.sum())
    lh, lb = encode_ints(lengths)
    candidates: list[tuple[int, dict[str, Any], bytes | None]] = [
        (len(lb) + total, {"c": "plain_str", "lens": {"h": lh, "len": len(lb)}}, None)
    ]

    # cardinality gate from a sample of CONTIGUOUS blocks (exact unique
    # over a long-text column hashes the entire payload just to learn
    # "high-cardinality"). Contiguous blocks — zero-copy slices — preserve
    # run structure, so a sorted/grouped column with moderate cardinality
    # still reads as dict-friendly (a strided sample steps OVER runs and
    # systematically overestimates cardinality). A low-card verdict is
    # confirmed exactly by dictionary_encode; a false high-card verdict is
    # the only risk, and block sampling errs toward attempting dict, whose
    # exact encoded size then decides.
    if n > 65536:
        n_blocks, block = 16, 4096
        stride = n // n_blocks
        sample = pa.concat_arrays(
            [arr.slice(i * stride, block) for i in range(n_blocks)]
        )
    else:
        sample = arr
    sample_card = len(pc.unique(sample))
    if shared_vocab is not None or sample_card <= max(64, len(sample) // 2):
        d = encode_dict(arr, shared_vocab, shared_hash)
        if d is not None:
            candidates.append((len(d[1]), d[0], d[1]))

    # worddict pays off when strings are multi-token with a repetitive vocab.
    # The multi-token gate is a heuristic shortlist (the final pick is by
    # actual encoded size), so estimate avg spaces/row on a bounded sample —
    # full-column count_substring was ~15% of the whole text-encode kernel.
    wd_sample = arr.slice(0, 2048) if n > 2048 else arr
    n_spaces = int(pc.sum(pc.count_substring(wd_sample, " ")).as_py() or 0)
    if sample_card > 64 and total > 0 and n_spaces >= len(wd_sample):
        wh, wb = encode_worddict(arr)
        candidates.append((len(wb), wh, wb))

    best = min(candidates, key=lambda t: t[0])
    if best[2] is None:  # plain won — materialize the payload now
        _, data = _string_payload(arr)
        best = (best[0], best[1], lb + data)

    # FSST only when nothing lightweight compressed well (avg len must merit it)
    if (
        try_fsst
        and total >= 1024
        and total / max(n, 1) >= 8
        and best[0] > 0.8 * total
    ):
        # sampled estimate gates the expensive full encode; keep FSST only on
        # a clear (>=10%) win over the best lightweight candidate
        f = encode_fsst(arr, min_sample_gain=0.15)
        if f is not None and len(f[1]) < 0.9 * best[0]:
            best = (len(f[1]), f[0], f[1])

    return best[1], best[2]


def decode_strings(
    hdr: dict[str, Any],
    blob: bytes,
    n: int,
    dict_store: dict[str, pa.Array] | None = None,
) -> pa.Array:
    c = hdr["c"]
    if c == "plain_str":
        return decode_plain(hdr, blob, n)
    if c == "dict":
        return decode_dict(hdr, blob, n, dict_store)
    if c == "worddict":
        return decode_worddict(hdr, blob, n)
    if c == "fsst":
        return decode_fsst(hdr, blob, n)
    raise ValueError(f"unknown string codec {c!r}")


__all__ = [
    "encode_strings",
    "decode_strings",
    "encode_plain",
    "decode_plain",
    "encode_dict",
    "decode_dict",
    "encode_worddict",
    "decode_worddict",
    "encode_fsst",
    "decode_fsst",
    "vocab_hash",
]
