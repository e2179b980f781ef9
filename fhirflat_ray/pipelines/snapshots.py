"""Zero-copy snapshots (time travel) for the encoded segment format.

``create_snapshot`` hardlinks every segment and shared-dictionary file plus
the manifest into ``<seg_dir>/snapshots/v{N}/`` — O(files) metadata work,
zero data bytes copied. Snapshots compose with the in-place mutation
primitives because those replace atomically: ``os.replace`` (merge/upsert)
and ``os.remove`` (delete) detach the DIRECTORY ENTRY while the snapshot's
hardlink keeps the old inode alive — classic copy-on-write without a write
amplification step. A snapshot dir is a fully self-contained segment dir:
``decode_dataset(snapshot_path(...))`` reads it with the ordinary reader,
zone pruning, evolution log and all.

The reference has no notion of table versions — re-running its ingest
overwrites every output parquet in place
(/root/reference/fhirflat/ingest.py:543-575).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Any

SNAP_DIR = "snapshots"


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:  # cross-device / FS without hardlinks
        shutil.copy2(src, dst)


def snapshot_path(seg_dir: str, version: int) -> str:
    return os.path.join(seg_dir, SNAP_DIR, f"v{version:06d}")


def list_snapshots(seg_dir: str) -> list[dict[str, Any]]:
    out = []
    for d in sorted(glob.glob(os.path.join(seg_dir, SNAP_DIR, "v*"))):
        meta = os.path.join(d, "snapshot.json")
        if os.path.exists(meta):
            with open(meta) as f:
                out.append(json.load(f))
    return out


def create_snapshot(seg_dir: str, note: str | None = None) -> dict[str, Any]:
    """Freeze the current table state; returns the snapshot record."""
    from fhirflat_ray.state import lineage as lin

    manifest = lin.read_manifest(seg_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {seg_dir!r}")
    prior = list_snapshots(seg_dir)
    version = (prior[-1]["version"] + 1) if prior else 1
    dst = snapshot_path(seg_dir, version)
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, lin.DICT_DIR), exist_ok=True)

    # snapshot exactly the COMMITTED set (the manifest's files) — a stray
    # segment from a crashed writer must not be frozen into a snapshot
    segs = lin.committed_segment_paths(seg_dir)
    for p in segs:
        _link_or_copy(p, os.path.join(tmp, os.path.basename(p)))
    for p in glob.glob(os.path.join(seg_dir, lin.DICT_DIR, "*.arrow")):
        _link_or_copy(p, os.path.join(tmp, lin.DICT_DIR, os.path.basename(p)))
    shutil.copy2(os.path.join(seg_dir, lin.MANIFEST_NAME), tmp)

    record = {
        "version": version,
        "n_segments": len(segs),
        "n_rows": manifest["n_rows"],
        "checksum_of_checksums": manifest["checksum_of_checksums"],
        "note": note,
    }
    with open(os.path.join(tmp, "snapshot.json"), "w") as f:
        json.dump(record, f)
    if os.path.exists(dst):  # lost a race to a concurrent snapshotter
        shutil.rmtree(tmp)
        raise FileExistsError(f"snapshot v{version} already exists")
    os.rename(tmp, dst)  # atomic publish: readers never see a partial dir
    return record


def drop_snapshot(seg_dir: str, version: int) -> None:
    """Release a snapshot (inodes of since-rewritten segments free here)."""
    d = snapshot_path(seg_dir, version)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no snapshot v{version} under {seg_dir!r}")
    shutil.rmtree(d)


__all__ = ["create_snapshot", "list_snapshots", "snapshot_path", "drop_snapshot"]
