"""Folder-of-tables output: one metadata/checksum file over many tables.

The reference's unit of output is a FOLDER of per-resource parquet tables
plus one metadata file and one checksum file
(/root/reference/fhirflat/ingest.py:397-432 ``generate_metadata`` /
``write_metadata``: per-file sha256s, a checksum-of-the-checksum-text, a
patient count ``N``). ``encode_folder`` mirrors that contract on the
engine's segment format: one encoded segment directory per table (each with
its own manifest + checksum-of-checksums), then ONE folder-level metadata
file whose ``checksum`` is the sha256 of the per-table checksum text —
checksum-of-checksums across tables, so any byte change in any table
changes the folder identity.

Scale shape: each table encodes independently (``encode_files`` — resumable,
streaming); the folder reduce touches only per-table manifests (O(tables)
driver work). ``N`` (the reference's patient count) is a distributed
distinct count over the primary table's id column, never a driver
materialization.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from fhirflat_ray import __version__
from fhirflat_ray.state import lineage as lin

FOLDER_META = "folder_metadata.json"
CHECKSUMS_FILE = "sha256sums.txt"


def _checksum_text(checksums: dict[str, str]) -> str:
    """The reference's sha256sums layout: ``<digest>  <name>`` per line,
    name-sorted (ingest.py:407-419 hashes exactly this text)."""
    return "".join(f"{v}  {k}\n" for k, v in sorted(checksums.items()))


def _atomic_write_text(path: str, text: str) -> None:
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write(text)
    os.replace(tmp, path)


def encode_folder(
    inputs: dict[str, Any],
    out_dir: str,
    *,
    primary: str | None = None,
    id_column: str = "conv_id",
    resume: bool = False,
    table_options: dict[str, dict[str, Any]] | None = None,
    **encode_kwargs: Any,
) -> dict[str, Any]:
    """Encode ``inputs`` (table name → parquet path/dir OR Ray Dataset)
    into ``out_dir/<name>/`` segment dirs and write the folder-level
    metadata + checksum files. ``primary``/``id_column`` mirror the
    reference's ``N`` = distinct patient ids (distributed distinct count).
    ``resume=True`` passes through to each table's ``encode_files`` (path
    inputs only), so a crashed folder encode re-runs only missing
    partitions. Per-table overrides go in ``table_options[name]``."""
    from fhirflat_ray.pipelines.encode import encode_dataset, encode_files

    os.makedirs(out_dir, exist_ok=True)
    tables_meta: dict[str, Any] = {}
    checks: dict[str, str] = {}
    for name in sorted(inputs):
        if os.sep in name or not name or name in (".", ".."):
            raise ValueError(f"unsafe table name {name!r}")
        src = inputs[name]
        tdir = os.path.join(out_dir, name)
        opts = dict(encode_kwargs)
        opts.update((table_options or {}).get(name, {}))
        if isinstance(src, str):
            man = encode_files(src, tdir, resume=resume, **opts)
        else:
            man = encode_dataset(src, tdir, **opts)
        tables_meta[name] = {
            "n_rows": man["n_rows"],
            "n_partitions": man["n_partitions"],
            "encoded_bytes": man["encoded_bytes"],
            "checksum": man["checksum_of_checksums"],
        }
        checks[name] = man["checksum_of_checksums"]

    n: Any = "NA"
    if primary is not None:
        if primary not in inputs:
            raise KeyError(f"primary table {primary!r} not in inputs")
        from fhirflat_ray.functions.util import distinct_rows
        from fhirflat_ray.pipelines.decode import decode_dataset

        n = int(
            distinct_rows(
                decode_dataset(os.path.join(out_dir, primary), columns=[id_column]),
                [id_column],
            ).count()
        )

    meta = {
        "version": 1,
        "N": n,
        "generator": f"fhirflat_ray/{__version__}",
        "checksum": hashlib.sha256(_checksum_text(checks).encode()).hexdigest(),
        "checksum_file": CHECKSUMS_FILE,
        "tables": tables_meta,
    }
    # checksums first, metadata last: the metadata file is the folder's
    # commit point (same discipline as the per-table manifest)
    _atomic_write_text(os.path.join(out_dir, CHECKSUMS_FILE), _checksum_text(checks))
    _atomic_write_text(os.path.join(out_dir, FOLDER_META), json.dumps(meta, indent=1))
    return meta


def read_folder_metadata(out_dir: str) -> dict[str, Any]:
    path = os.path.join(out_dir, FOLDER_META)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no folder metadata under {out_dir!r}")
    with open(path) as fh:
        return json.load(fh)


def decode_folder(out_dir: str, columns: dict[str, list[str]] | None = None):
    """table name → lazy decoded Dataset for every table in the folder
    metadata (``columns[name]`` prunes per table)."""
    from fhirflat_ray.pipelines.decode import decode_dataset

    meta = read_folder_metadata(out_dir)
    return {
        name: decode_dataset(
            os.path.join(out_dir, name), columns=(columns or {}).get(name)
        )
        for name in meta["tables"]
    }


def validate_folder(out_dir: str, deep: bool = False) -> dict[str, Any]:
    """Folder integrity check against the recorded metadata.

    Shallow: re-derive every table's checksum-of-checksums from its
    on-disk segment HEADERS (lineage payload digests — catches missing /
    swapped / extra segments and any manifest drift) and re-hash the
    folder checksum text. ``deep=True`` additionally re-reads every
    column payload with per-column sha256 verification (the
    ``verify_checksums`` decode path — catches bit rot inside segment
    bodies). Returns a report dict; ``ok`` is the conjunction."""
    meta = read_folder_metadata(out_dir)
    report: dict[str, Any] = {"ok": True, "tables": {}}
    checks: dict[str, str] = {}
    for name, rec in meta["tables"].items():
        tdir = os.path.join(out_dir, name)
        entry: dict[str, Any] = {"ok": True}
        try:
            records = sorted(lin.collect_lineage(tdir), key=lambda r: r["part_id"])
            combined = hashlib.sha256(
                "".join(r["payload_sha256"] for r in records).encode()
            ).hexdigest()
            entry["checksum"] = combined
            entry["n_partitions"] = len(records)
            if combined != rec["checksum"]:
                entry["ok"] = False
                entry["error"] = "checksum mismatch vs folder metadata"
            manifest = lin.read_manifest(tdir)
            if manifest is None or manifest["checksum_of_checksums"] != combined:
                entry["ok"] = False
                entry["error"] = "table manifest missing or drifted"
            if deep and entry["ok"]:
                from fhirflat_ray.pipelines.decode import decode_dataset

                n = decode_dataset(tdir, verify_checksums=True).count()
                entry["rows_verified"] = int(n)
                if n != rec["n_rows"]:
                    entry["ok"] = False
                    entry["error"] = f"row count {n} != recorded {rec['n_rows']}"
        except Exception as exc:  # missing dir, unreadable segment, ...
            entry["ok"] = False
            entry["error"] = f"{type(exc).__name__}: {exc}"
        checks[name] = entry.get("checksum", "")
        report["tables"][name] = entry
        report["ok"] = report["ok"] and entry["ok"]
    folder_sum = hashlib.sha256(_checksum_text(checks).encode()).hexdigest()
    report["checksum"] = folder_sum
    if folder_sum != meta["checksum"]:
        report["ok"] = False
        report["error"] = "folder checksum-of-checksums mismatch"
    return report


__all__ = [
    "encode_folder",
    "decode_folder",
    "read_folder_metadata",
    "validate_folder",
    "FOLDER_META",
    "CHECKSUMS_FILE",
]
