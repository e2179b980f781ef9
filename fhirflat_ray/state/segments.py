"""Encoded segment file format + atomic writes.

One segment = one encoded partition of the input table:

    MAGIC(8) | header_len:uint32 LE | header JSON (utf-8) | column blobs

The header carries per-column codec trees, byte offsets, SHA-256 checksums and
the partition's lineage record — the engine analogue of the reference's
per-file checksum + TOML metadata (/root/reference/fhirflat/ingest.py:381-432).
Writes are write-to-temp + ``os.replace`` so a retried Ray task is idempotent
and a partially-written file is never observed.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any

import numpy as np
import pyarrow as pa

from fhirflat_ray.codecs import decode_column, encode_column

MAGIC = b"FFRAYSEG"
VERSION = 1


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _zone_of(arr) -> list | None:
    """Per-segment zone map (min/max) for orderable scalar columns —
    the same file-level statistics Parquet/Iceberg keep, attached to the
    segment header (a few bytes) so a predicate scan can skip whole
    segments from the header alone. Timestamps normalize to int64
    microseconds (JSON-safe, comparable on both the prune and residual
    paths); strings/nested types carry no zone (kept conservatively)."""
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_timestamp(t):
        arr = arr.cast(pa.int64())
    elif not (pa.types.is_integer(t) or pa.types.is_floating(t)):
        return None
    mm = pc.min_max(arr)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None or hi is None:
        return None  # all-null: no zone, segment kept conservatively
    if isinstance(lo, float) and (lo != lo or hi != hi):  # NaN bounds
        return None
    return [lo, hi]


#: bloom parameters: 8192 bits (1 KiB) / 4 probes; built only when the
#: segment's distinct count is ≤ _BLOOM_MAX_DISTINCT, keeping the false-
#: positive rate ~1e-4 and the header growth bounded
_BLOOM_BITS = 8192
_BLOOM_K = 4
_BLOOM_MAX_DISTINCT = 4096


def _bloom_hashes(values) -> np.ndarray:
    """(n, k) probe positions via stable double hashing (pandas siphash is
    key-stable across processes — the same property the shingle machinery
    relies on)."""
    import pandas.util as pdu

    h = pdu.hash_array(np.asarray(values, dtype=object)).astype(np.int64)
    h1 = (h >> np.int64(32)) & np.int64(0xFFFFFFFF)
    h2 = (h & np.int64(0xFFFFFFFF)) | np.int64(1)  # odd step
    probes = [(h1 + np.int64(i) * h2) % np.int64(_BLOOM_BITS) for i in range(_BLOOM_K)]
    return np.stack(probes, axis=1)


def _bloom_of(arr) -> str | None:
    """Hex bloom filter over a string column's distinct values (point-lookup
    pushdown: ``==`` predicates skip segments whose bloom provably lacks
    the value). None when the type isn't string-like or the segment's
    distinct count exceeds the cap."""
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_dictionary(t):
        t = t.value_type
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        return None
    vals = pc.unique(pc.drop_null(
        arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    ))
    if len(vals) == 0 or len(vals) > _BLOOM_MAX_DISTINCT:
        return None
    bits = np.zeros(_BLOOM_BITS, dtype=bool)
    bits[_bloom_hashes(vals.to_numpy(zero_copy_only=False)).ravel()] = True
    return np.packbits(bits).tobytes().hex()


def bloom_may_contain(bloom_hex: str, value: str) -> bool:
    bits = np.unpackbits(np.frombuffer(bytes.fromhex(bloom_hex), dtype=np.uint8))
    return bool(bits[_bloom_hashes([value]).ravel()].all())


def blooms_of_header(header: dict[str, Any]) -> dict[str, str]:
    return {
        c["name"]: c["bloom"]
        for c in header.get("columns", [])
        if "bloom" in c
    }


def zones_of_header(header: dict[str, Any]) -> dict[str, tuple]:
    return {
        c["name"]: (c["zone"][0], c["zone"][1])
        for c in header.get("columns", [])
        if "zone" in c
    }


def encode_table(
    table: pa.Table,
    shared_dicts: dict[str, tuple[str, pa.Array]] | None = None,
) -> tuple[dict[str, Any], bytes]:
    """Encode every column; returns (header dict, payload bytes).

    ``shared_dicts`` maps column name → (vocab_hash, vocab array) for columns
    whose dictionary is stored once in the manifest instead of per segment.
    """
    columns = []
    blobs = []
    off = 0
    for name in table.column_names:
        arr = table.column(name)
        sv = shared_dicts.get(name) if shared_dicts else None
        hdr, blob = encode_column(
            arr, shared_vocab=sv[1] if sv else None, shared_hash=sv[0] if sv else None
        )
        col = {
            "name": name,
            "hdr": hdr,
            "off": off,
            "len": len(blob),
            "sha256": sha256_hex(blob),
            "nullable": table.schema.field(name).nullable,
        }
        zone = _zone_of(arr)
        if zone is not None:
            col["zone"] = zone
        bloom = _bloom_of(arr)
        if bloom is not None:
            col["bloom"] = bloom
        columns.append(col)
        blobs.append(blob)
        off += len(blob)
    header = {
        "version": VERSION,
        "n_rows": table.num_rows,
        "columns": columns,
    }
    return header, b"".join(blobs)


def decode_payload(
    header: dict[str, Any],
    payload: bytes,
    dict_store: dict[str, pa.Array] | None = None,
    columns: list[str] | None = None,
    verify_checksums: bool = False,
) -> pa.Table:
    """Rebuild the Arrow table from a segment header + payload.

    ``columns`` prunes decode to the named columns (column-store projection:
    untouched column blobs are never even sliced).
    """
    arrays: list[pa.Array] = []
    fields: list[pa.Field] = []
    for col in header["columns"]:
        if columns is not None and col["name"] not in columns:
            continue
        blob = payload[col["off"] : col["off"] + col["len"]]
        if verify_checksums and sha256_hex(blob) != col["sha256"]:
            raise ValueError(f"checksum mismatch for column {col['name']!r}")
        arr = decode_column(col["hdr"], blob, dict_store)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arrays.append(arr)
        fields.append(pa.field(col["name"], arr.type, nullable=col.get("nullable", True)))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def write_segment(
    path: str, header: dict[str, Any], payload: bytes, lineage: dict[str, Any] | None = None
) -> dict[str, Any]:
    """Atomically write a segment; returns the final header (incl. lineage).

    The lineage record is stamped with the segment's basename so manifests
    can name their files exactly (``committed_segment_paths``) — dataset-
    mode segments are content-addressed (``part-<digest>.seg``), not
    derivable from ``part_id``."""
    if lineage is not None:
        header = {**header, "lineage": {**lineage, "file": os.path.basename(path)}}
    hdr_bytes = json.dumps(header, separators=(",", ":")).encode()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(MAGIC)
            f.write(len(hdr_bytes).to_bytes(4, "little"))
            f.write(hdr_bytes)
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return header


def read_segment_header(blob_or_path: bytes | str) -> tuple[dict[str, Any], int]:
    """Parse header; returns (header, payload offset)."""
    if isinstance(blob_or_path, str):
        with open(blob_or_path, "rb") as f:
            head = f.read(12)
            if head[:8] != MAGIC:
                raise ValueError(f"not a segment file: {blob_or_path!r}")
            hlen = int.from_bytes(head[8:12], "little")
            hdr = json.loads(f.read(hlen))
        return hdr, 12 + hlen
    blob = blob_or_path
    if blob[:8] != MAGIC:
        raise ValueError("not a segment blob")
    hlen = int.from_bytes(blob[8:12], "little")
    return json.loads(blob[12 : 12 + hlen]), 12 + hlen


def read_segment(
    blob_or_path: bytes | str,
    dict_store: dict[str, pa.Array] | None = None,
    columns: list[str] | None = None,
    verify_checksums: bool = False,
) -> pa.Table:
    if isinstance(blob_or_path, str):
        if columns is not None:
            return read_segment_pruned(
                blob_or_path, columns, dict_store, verify_checksums
            )
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    hdr, off = read_segment_header(blob)
    return decode_payload(hdr, blob[off:], dict_store, columns, verify_checksums)


def read_segment_pruned(
    path: str,
    columns: list[str],
    dict_store: dict[str, pa.Array] | None = None,
    verify_checksums: bool = False,
) -> pa.Table:
    """Column-pruned segment read with ranged I/O: only the requested
    columns' byte ranges are read from disk (true column-store projection,
    the point of per-column blobs — a 2-column read of a wide segment never
    touches the text payload)."""
    from fhirflat_ray.codecs import decode_column

    hdr, payload_off = read_segment_header(path)
    arrays: list[pa.Array] = []
    fields: list[pa.Field] = []
    with open(path, "rb") as f:
        for col in hdr["columns"]:
            if col["name"] not in columns:
                continue
            f.seek(payload_off + col["off"])
            blob = f.read(col["len"])
            if verify_checksums and sha256_hex(blob) != col["sha256"]:
                raise ValueError(f"checksum mismatch for column {col['name']!r}")
            arr = decode_column(col["hdr"], blob, dict_store)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arrays.append(arr)
            fields.append(pa.field(col["name"], arr.type, nullable=col.get("nullable", True)))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
