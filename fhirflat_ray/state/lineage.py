"""Per-partition lineage records, manifest, and resume logic.

Each encoded partition writes one lineage record *atomically with its
segment* (embedded in the segment header) and the driver folds all records
into ``manifest.json`` — the engine analogue of the reference's
``generate_metadata``/``write_metadata`` checksum folder
(/root/reference/fhirflat/ingest.py:381-432), except written per-partition so
an interrupted job resumes by skipping fragments already present.

Shared dictionaries are stored in ``dicts/<hash>.arrow`` next to the
segments; the manifest lists their hashes so decode can load them once per
worker.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Any

import pyarrow as pa

MANIFEST_NAME = "manifest.json"
DICT_DIR = "dicts"


def lineage_record(
    part_id: int,
    input_fragment: str,
    row_range: tuple[int, int],
    n_rows: int,
    raw_bytes: int,
    encoded_bytes: int,
    columns: list[dict[str, Any]],
    payload_sha256: str,
    metrics: dict[str, float] | None = None,
) -> dict[str, Any]:
    """One record per encoded partition (codec choice, sizes, checksums,
    per-stage timing metrics)."""
    return {
        **({"metrics": metrics} if metrics else {}),
        "part_id": part_id,
        "input_fragment": input_fragment,
        "row_range": list(row_range),
        "n_rows": n_rows,
        "raw_bytes": raw_bytes,
        "encoded_bytes": encoded_bytes,
        "codecs": {
            c["name"]: _codec_label(c["hdr"]) for c in columns
        },
        # zone maps surface in the manifest too: a catalog-level reader can
        # plan a pruned scan without touching any segment header
        "zones": {c["name"]: c["zone"] for c in columns if "zone" in c},
        "column_sha256": {c["name"]: c["sha256"] for c in columns},
        "payload_sha256": payload_sha256,
    }


def _codec_label(hdr: dict[str, Any]) -> str:
    inner = hdr.get("h")
    if isinstance(inner, dict) and "c" in inner:
        return str(inner["c"])
    return str(hdr.get("c"))


def segment_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part-{part_id:06d}.seg")


def _atomic_write_json(path: str, obj: Any) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def write_manifest(out_dir: str, records: list[dict[str, Any]], extra: dict[str, Any] | None = None) -> dict[str, Any]:
    """Deterministic reduce of per-partition records → manifest.json.

    The manifest checksum-of-checksums mirrors the reference's
    ``checksum of checksums`` (/root/reference/fhirflat/ingest.py:407-419):
    records sorted by part_id, concatenated payload digests re-hashed.
    """
    import hashlib

    records = sorted(records, key=lambda r: r["part_id"])
    combined = hashlib.sha256(
        "".join(r["payload_sha256"] for r in records).encode()
    ).hexdigest()
    manifest = {
        "version": 1,
        "n_partitions": len(records),
        "n_rows": sum(r["n_rows"] for r in records),
        "raw_bytes": sum(r["raw_bytes"] for r in records),
        "encoded_bytes": sum(r["encoded_bytes"] for r in records),
        "checksum_of_checksums": combined,
        "partitions": records,
    }
    if extra:
        manifest.update(extra)
    _atomic_write_json(os.path.join(out_dir, MANIFEST_NAME), manifest)
    return manifest


def read_manifest(out_dir: str) -> dict[str, Any] | None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


#: header scans stay a serial driver loop at or below this many segments
#: (each read is a small open+seek; the Ray task constant would dominate);
#: above it they fan out as Ray tasks in chunks of this size
HEADER_FANOUT_THRESHOLD = 256


def committed_segment_paths(seg_dir: str) -> list[str]:
    """The COMMITTED segment files of ``seg_dir``, sorted.

    When a manifest exists it is the source of truth: exactly its
    partitions' paths are returned, so stray ``part-*.seg`` files — a
    SIGKILLed writer's orphaned Ray workers finishing their in-flight
    segment after a re-run recreated the directory, a concurrent job's
    leftovers — are invisible to every reader. A manifest-less directory
    (an encode still in progress, resume's completed-partition scan, an
    ad-hoc folder of segments) falls back to the glob."""
    m = read_manifest(seg_dir)
    if m is not None:
        return sorted(
            os.path.join(seg_dir, r["file"])
            if "file" in r
            else segment_path(seg_dir, r["part_id"])
            for r in m["partitions"]
        )
    return sorted(glob.glob(os.path.join(seg_dir, "part-*.seg")))


def map_segment_headers(seg_dir: str, fn, on_error: str = "raise") -> list:
    """``fn(path, header)`` over every COMMITTED segment header under
    ``seg_dir`` (:func:`committed_segment_paths` — the manifest's partition
    list when one exists, a ``part-*.seg`` glob otherwise), results in
    file-name order with ``None`` results dropped.

    At or below :data:`HEADER_FANOUT_THRESHOLD` segments the headers read in
    a serial driver loop; above it the reads fan out as Ray tasks in
    threshold-sized chunks — a million-segment table's planner must not
    serialize a million open/read calls on the driver. Only ``fn``'s return
    values travel back, so keep them record-sized (the O(partitions)
    driver-fold contract). ``on_error="skip"`` drops unreadable or partially
    written files — resume's trust-only-complete-segments rule; the default
    propagates the exception."""
    from fhirflat_ray.state.segments import read_segment_header

    paths = committed_segment_paths(seg_dir)

    def apply(chunk: list[str]) -> list:
        out = []
        for p in chunk:
            try:
                hdr, _ = read_segment_header(p)
            except (ValueError, json.JSONDecodeError, OSError):
                if on_error == "skip":
                    continue
                raise
            r = fn(p, hdr)
            if r is not None:
                out.append(r)
        return out

    if len(paths) <= HEADER_FANOUT_THRESHOLD:
        return apply(paths)

    import ray

    task = ray.remote(num_cpus=0.25)(apply)  # I/O-bound: oversubscribe cores
    chunks = [
        paths[i : i + HEADER_FANOUT_THRESHOLD]
        for i in range(0, len(paths), HEADER_FANOUT_THRESHOLD)
    ]
    out: list = []
    for part in ray.get([task.remote(c) for c in chunks]):
        out.extend(part)
    return out


def completed_partitions(out_dir: str) -> dict[int, str]:
    """part_id → input_fragment for segments already durably on disk.

    Trusts only fully-written segments (atomic rename guarantees integrity);
    the manifest is advisory — segments written after the last manifest fold
    still count, so a crash between segment write and manifest write never
    re-encodes work. The fragment string lets resume verify *identity*, not
    just ordinal id: if the input file set changed and ids shifted, stale
    segments are re-encoded instead of wrongly skipped.
    """

    def entry(path: str, hdr: dict):
        lin = hdr.get("lineage")
        if lin is None:
            return None
        return int(lin["part_id"]), str(lin.get("input_fragment", ""))

    return dict(map_segment_headers(out_dir, entry, on_error="skip"))


def completed_part_ids(out_dir: str) -> set[int]:
    return set(completed_partitions(out_dir))


def uncommit_manifest(out_dir: str) -> None:
    """Delete ``manifest.json`` at the START of a mutation (encode into an
    existing dir, compact re-run, merge/delete/append): while a rewrite is
    in flight the directory is UNCOMMITTED — readers and header scans fall
    back to the glob, which is the only truthful view (the old manifest
    would hide crash-appended segments and point at rewritten/removed
    files). The mutation's final ``write_manifest`` is the new commit
    point."""
    try:
        os.remove(os.path.join(out_dir, MANIFEST_NAME))
    except FileNotFoundError:
        pass


def gc_orphan_segments(seg_dir: str) -> list[str]:
    """Remove ``part-*.seg`` files NOT referenced by the COMMITTED
    manifest. Safe under the single-writer contract: the committed
    manifest is the table's truth and no reader ever resolves an
    unreferenced file; a no-op on uncommitted dirs (there the glob IS the
    truth, so nothing may be deleted). Used by ``compact_small_segments``
    — post-commit GC of the swapped-out small segments, and entry cleanup
    after a run that crashed between its manifest commit and its GC."""
    m = read_manifest(seg_dir)
    if m is None:
        return []
    live = set(committed_segment_paths(seg_dir))
    removed = []
    for p in sorted(glob.glob(os.path.join(seg_dir, "part-*.seg"))):
        if p not in live:
            os.remove(p)
            removed.append(p)
    return removed


def collect_lineage(out_dir: str, part_ids=None) -> list[dict[str, Any]]:
    """Re-fold lineage records from the segment files themselves.

    ``part_ids`` (a set) restricts the fold to THIS RUN's planned
    partitions, so a stray segment written into the directory by an
    orphaned worker of a killed previous run cannot enter the manifest."""
    recs = map_segment_headers(out_dir, lambda _p, hdr: hdr.get("lineage"))
    if part_ids is not None:
        recs = [r for r in recs if r and r.get("part_id") in part_ids]
    return recs


# ----------------------------------------------------------- shared dicts


def write_shared_dict(out_dir: str, vocab_hash: str, vocab: pa.Array) -> str:
    d = os.path.join(out_dir, DICT_DIR)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{vocab_hash}.arrow")
    if os.path.exists(path):
        return path
    table = pa.table({"v": vocab})
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        with pa.OSFile(tmp, "wb") as sink, pa.ipc.new_file(sink, table.schema) as w:
            w.write_table(table)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def load_dict_store(out_dir: str) -> dict[str, pa.Array]:
    store: dict[str, pa.Array] = {}
    for path in glob.glob(os.path.join(out_dir, DICT_DIR, "*.arrow")):
        h = os.path.splitext(os.path.basename(path))[0]
        with pa.OSFile(path, "rb") as f, pa.ipc.open_file(f) as r:
            store[h] = r.read_all().column("v").combine_chunks()
    return store


def vacuum_dict_store(out_dir: str) -> dict[str, Any]:
    """Garbage-collect shared-dictionary files no live segment references.

    Mutations can orphan store entries (a merge/compact/delete rewrites the
    last segment using some vocabulary; the ``dicts/*.arrow`` file stays).
    References are found by walking every segment header for ``shared``
    markers — header-only reads, no payload bytes. Snapshot directories are
    unaffected: they hardlink the dict files, so removing the live entry
    only drops one name on the inode. Returns {"kept": n, "removed": [...]}.
    """
    from fhirflat_ray.state import segments as seg

    def walk(node, out: set) -> None:
        if isinstance(node, dict):
            h = node.get("shared")
            if isinstance(h, str):
                out.add(h)
            for v in node.values():
                walk(v, out)
        elif isinstance(node, list):
            for v in node:
                walk(v, out)

    def refs_of(_p: str, hdr: dict) -> frozenset | None:
        out: set[str] = set()
        walk(hdr.get("columns", []), out)
        return frozenset(out) if out else None

    referenced: set[str] = set()
    for part in map_segment_headers(out_dir, refs_of):
        referenced |= part
    # the manifest's shared-dict registry counts as a reference too: a
    # future append re-encodes against it
    manifest = read_manifest(out_dir)
    for h in ((manifest or {}).get("shared_dicts") or {}).values():
        referenced.add(h)

    removed = []
    for path in sorted(glob.glob(os.path.join(out_dir, DICT_DIR, "*.arrow"))):
        h = os.path.splitext(os.path.basename(path))[0]
        if h not in referenced:
            os.remove(path)
            removed.append(h)
    return {"kept": len(referenced), "removed": removed}
