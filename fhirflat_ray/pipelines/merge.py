"""MERGE INTO (upsert) on the encoded segment format.

``merge_upsert(seg_dir, updates, key)`` applies a Dataset of update rows to
an encoded segment set in place: rows whose ``key`` exists in the base
replace the stored row; keys present nowhere append as new segments. The
lakehouse mutation primitive the reference's rewrite-the-whole-folder model
lacks (fhirflat regenerates every parquet on each ingest,
/root/reference/fhirflat/ingest.py:543-575) — at 100 TB only the touched
partitions may move.

Scale shape:

1. **Routing is catalog-only.** Each segment's lineage record already
   carries the key column's zone (min/max). Update rows route to candidate
   segments by interval lookup against those zones — a broadcast of two
   int64s per segment, no segment header or payload read. Disjoint zones
   (sorted base) take a vectorized searchsorted fast path; overlapping
   zones fall back to chunked interval checks (still vectorized).
2. **Only candidate segments rewrite.** One task per affected segment:
   decode, swap matched rows for their update versions, re-sort, re-encode,
   atomic ``os.replace`` — a retried task is idempotent, and untouched
   segments are never opened.
3. **Leftovers append.** Update keys no segment actually contained become
   new content-addressed segments (same writer as ``encode_dataset``,
   without clearing existing segments). Appended segments carry zones too,
   so a re-run routes those keys as updates — the merge is idempotent.
4. The manifest refolds from segment headers at the end (crash between
   segment writes and the manifest leaves a refoldable, never a corrupt,
   state).

Requirements (documented, not checked row-by-row): ``key`` is unique in the
base and in ``updates``, is an integer/timestamp column (zone-mapped), and
``updates`` matches the base schema.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from fhirflat_ray.state import lineage as lin
from fhirflat_ray.state import segments as seg

#: broadcast budget for the applied-key reconciliation (8 bytes/key). Above
#: this the anti-join goes distributed (hash_anti_join) instead.
_APPLIED_KEYS_BUDGET = 20_000_000


def _evolution_plan(manifest):
    """(evolution ops, evolve_fn) for keyed mutations: update/delete rows
    arrive in the EVOLVED schema, so every candidate segment's base rows
    are brought into that schema inside the rewrite (the segment is being
    re-encoded anyway — the op-log remap rides along for free) and the
    rewritten segment MATERIALIZES the evolution. Untouched segments keep
    the op-log pending; decode's application is idempotent over the mixed
    set (see pipelines/evolve.py)."""
    from fhirflat_ray.pipelines.evolve import apply_evolution

    evolution = list((manifest or {}).get("schema_evolution") or [])
    return evolution, (apply_evolution(evolution, None) if evolution else None)


def _zone_key_names(evolution, key: str) -> list[str]:
    """Zone-map lookup names for the (evolved-schema) merge key: rewritten
    segments key zones by the evolved name, untouched ones by the stored
    name — try the whole rename chain."""
    from fhirflat_ray.pipelines.evolve import rename_chain

    return rename_chain(evolution, key) if evolution else [key]


def _zone_router(records: list[dict[str, Any]], key: str | list[str]):
    """(los, his, part_ids, zoneless_parts) for interval routing.
    ``key`` may be a list of candidate zone names (evolved + stored names
    of a renamed merge key — each segment has exactly one of them)."""
    key_names = [key] if isinstance(key, str) else list(key)
    los, his, pids, zoneless = [], [], [], []
    for r in records:
        zones = r.get("zones") or {}
        z = next((zones[k] for k in key_names if k in zones), None)
        if z is None:
            zoneless.append(int(r["part_id"]))
        else:
            los.append(z[0])
            his.append(z[1])
            pids.append(int(r["part_id"]))
    order = np.argsort(np.asarray(los, dtype=np.int64), kind="stable") if los else []
    los = np.asarray(los, dtype=np.int64)[order] if len(los) else np.empty(0, np.int64)
    his = np.asarray(his, dtype=np.int64)[order] if len(his) else np.empty(0, np.int64)
    pids = np.asarray(pids, dtype=np.int64)[order] if len(pids) else np.empty(0, np.int64)
    return los, his, pids, zoneless


def _route_keys(keys: np.ndarray, los, his, pids, zoneless) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, part_id) candidate pairs for every key. Disjoint zones:
    one searchsorted; overlapping zones: chunked interval membership."""
    out_rows: list[np.ndarray] = []
    out_parts: list[np.ndarray] = []
    n = len(keys)
    if len(los):
        disjoint = bool(np.all(los[1:] > his[:-1])) if len(los) > 1 else True
        if disjoint:
            j = np.searchsorted(los, keys, side="right") - 1
            ok = (j >= 0) & (keys <= his[np.clip(j, 0, len(his) - 1)])
            rows = np.nonzero(ok)[0]
            out_rows.append(rows)
            out_parts.append(pids[j[rows]])
        else:
            # overlap fallback: membership against interval chunks keeps the
            # temporary at n × chunk booleans
            chunk = max(1, min(len(los), 4_000_000 // max(n, 1) + 1))
            for i0 in range(0, len(los), chunk):
                i1 = min(i0 + chunk, len(los))
                m = (keys[:, None] >= los[None, i0:i1]) & (
                    keys[:, None] <= his[None, i0:i1]
                )
                rows, cols = np.nonzero(m)
                out_rows.append(rows)
                out_parts.append(pids[i0:i1][cols])
    for pid in zoneless:  # conservative: every key is a candidate
        out_rows.append(np.arange(n, dtype=np.int64))
        out_parts.append(np.full(n, pid, dtype=np.int64))
    if not out_rows:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_rows), np.concatenate(out_parts)


def _scan_segments(seg_dir: str):
    """ONE header pass over the on-disk segments → (lineage records for
    zone routing, part_id → (segment file, prior fragment id)).

    Routing must derive from DISK, not the manifest: after a crashed merge
    the manifest is stale — it does not cover crash-appended insert
    segments, so a manifest-routed re-run would miss their zones, classify
    their keys as "not applied anywhere", and append them AGAIN (duplicate
    rows). File names are either the planner's ordinal form
    (part-000007.seg) or content hashes (appended / dataset-encoded
    segments), so identities resolve from the headers, not the names.

    Header reads fan out as Ray tasks above
    :data:`~fhirflat_ray.state.lineage.HEADER_FANOUT_THRESHOLD` segments."""

    def entry(p: str, hdr: dict):
        rec = hdr.get("lineage")
        if rec is None:
            return None
        return os.path.basename(p), rec

    records: list[dict[str, Any]] = []
    part_meta: dict[int, tuple[str, str]] = {}
    for base, rec in lin.map_segment_headers(seg_dir, entry):
        records.append(rec)
        part_meta[int(rec["part_id"])] = (
            base,
            str(rec.get("input_fragment", "")),
        )
    return records, part_meta


def _shared_for_encode(seg_dir: str, manifest: dict[str, Any] | None):
    """col → (hash, vocab) for re-encoding, from the manifest's shared-dict
    registry (the same vocabularies the untouched segments reference)."""
    shared_cols = (manifest or {}).get("shared_dicts") or {}
    if not shared_cols:
        return {}
    store = lin.load_dict_store(seg_dir)
    return {
        col: (h, store[h]) for col, h in shared_cols.items() if h in store
    }


def _evolved_shared(evolution, shared):
    """Walk shared-dict column names forward through the op-log so a
    materializing rewrite still re-encodes renamed columns against the
    shared vocabularies (dropped columns fall away)."""
    if not evolution:
        return shared
    out = {}
    for c, hv in shared.items():
        cur: str | None = c
        for op in evolution:
            if op["op"] == "rename" and op["name"] == cur:
                cur = op["new_name"]
            elif op["op"] == "drop" and op["name"] == cur:
                cur = None
                break
        if cur is not None:
            out[cur] = hv
    return out


def merge_upsert(
    seg_dir: str,
    updates,
    key: str,
    *,
    insert_target_rows: int | None = None,
) -> dict[str, Any]:
    """Apply ``updates`` (a Ray Dataset, base-schema rows) to the encoded
    set at ``seg_dir`` by unique ``key``; returns the refolded manifest
    (with ``upserted`` / ``inserted`` counts)."""
    import ray
    import ray.data as rd

    from fhirflat_ray.functions.util import collect_small_table
    from fhirflat_ray.pipelines.encode import DEFAULT_TARGET_ROWS

    from fhirflat_ray.pipelines.evolve import evolved_sort_keys

    manifest = lin.read_manifest(seg_dir)
    evolution, evolve_fn = _evolution_plan(manifest)
    # routing records and part metadata come from the SAME on-disk header
    # scan, so a re-run after a mid-merge crash sees crash-appended insert
    # segments and routes their keys as updates instead of re-inserting
    # (a crashed merge leaves NO manifest — see uncommit below — so the
    # scan's glob fallback is exactly that truthful view)
    records, part_meta = _scan_segments(seg_dir)
    if not records:
        raise FileNotFoundError(f"no encoded segments under {seg_dir!r}")
    sort_keys = tuple((manifest or {}).get("sort_keys") or ()) or None
    if evolution:
        sort_keys = evolved_sort_keys(evolution, sort_keys)
    shared = _evolved_shared(evolution, _shared_for_encode(seg_dir, manifest))
    # uncommitted while segments rewrite in place / inserts append; the
    # refolded write_manifest below is the new commit point
    lin.uncommit_manifest(seg_dir)

    los, his, pids, zoneless = _zone_router(records, _zone_key_names(evolution, key))
    router_ref = ray.put({"los": los, "his": his, "pids": pids, "zoneless": zoneless})
    meta_ref = ray.put(part_meta)

    def route(batch: pa.Table) -> pa.Table:
        r = ray.get(router_ref) if not isinstance(router_ref, dict) else router_ref
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        rows, parts = _route_keys(keys, r["los"], r["his"], r["pids"], r["zoneless"])
        routed = batch.take(pa.array(rows))
        return routed.append_column("__part", pa.array(parts, pa.int64()))

    routed = updates.map_batches(route, batch_format="pyarrow")

    def apply_to_segment(g: pd.DataFrame) -> pd.DataFrame:
        part_id = int(g["__part"].iloc[0])
        g = g.drop(columns="__part")
        meta = ray.get(meta_ref) if not isinstance(meta_ref, dict) else meta_ref
        fname, old_fragment = meta[part_id]
        path = os.path.join(seg_dir, fname)
        store = lin.load_dict_store(seg_dir)
        base = seg.read_segment(path, store)
        if evolve_fn is not None:
            # bring the stored rows into the evolved schema; the rewrite
            # below then MATERIALIZES the op-log for this segment
            base = evolve_fn(base)
        base_keys = base.column(key).to_numpy(zero_copy_only=False)
        upd = pa.Table.from_pandas(g, schema=base.schema, preserve_index=False)
        upd_keys = upd.column(key).to_numpy(zero_copy_only=False)
        present = np.isin(upd_keys, base_keys)
        if not present.any():
            return pd.DataFrame({key: np.empty(0, np.int64)})
        applied = upd.filter(pa.array(present))
        keep = ~np.isin(base_keys, upd_keys[present])
        merged = pa.concat_tables([base.filter(pa.array(keep)), applied])
        if sort_keys:
            ks = [k for k in sort_keys if k in merged.column_names]
            if ks:
                merged = merged.sort_by([(k, "ascending") for k in ks])
        header, payload = seg.encode_table(merged, shared)
        record = lin.lineage_record(
            part_id=part_id,
            input_fragment=f"upsert:{old_fragment}",
            row_range=(0, merged.num_rows),
            n_rows=merged.num_rows,
            raw_bytes=merged.nbytes,
            encoded_bytes=len(payload),
            columns=header["columns"],
            payload_sha256=seg.sha256_hex(payload),
        )
        seg.write_segment(path, header, payload, record)
        return pd.DataFrame({key: applied.column(key).to_numpy(zero_copy_only=False)})

    applied_tbl = collect_small_table(
        routed.groupby("__part").map_groups(apply_to_segment, batch_format="pandas")
    )
    applied_keys = (
        applied_tbl.column(key).to_numpy(zero_copy_only=False)
        if applied_tbl.num_rows
        else np.empty(0, np.int64)
    )
    n_applied = len(applied_keys)

    # leftovers = update keys no segment contained → inserts
    if n_applied <= _APPLIED_KEYS_BUDGET:
        keys_ref = ray.put(np.sort(applied_keys.astype(np.int64)))

        def anti(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref) if not isinstance(keys_ref, np.ndarray) else keys_ref
            if len(ks) == 0:
                return batch
            v = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(ks, v), 0, len(ks) - 1)
            return batch.filter(pa.array(ks[pos] != v))

        inserts = updates.map_batches(anti, batch_format="pyarrow")
    else:  # distributed reconciliation for huge update sets
        from fhirflat_ray.functions.joins import hash_anti_join

        inserts = hash_anti_join(updates, rd.from_arrow(applied_tbl), key, key)

    n_inserted = sum(
        r["n_rows"]
        for r in _append_segments(
            inserts, seg_dir, sort_keys, shared,
            target_rows=insert_target_rows or DEFAULT_TARGET_ROWS,
        )
    )

    refolded = lin.write_manifest(
        seg_dir,
        lin.collect_lineage(seg_dir),
        extra={
            "source": (manifest or {}).get("source", "files"),
            "sort_keys": list(sort_keys) if sort_keys else None,
            "shared_dicts": {c: h for c, (h, _v) in shared.items()},
            "upserted": int(n_applied),
            "inserted": int(n_inserted),
            # untouched segments still need the op-log; rewritten ones
            # materialized it and decode's application is idempotent
            **({"schema_evolution": evolution} if evolution else {}),
        },
    )
    return refolded


def append_dataset(
    seg_dir: str, ds, *, target_rows: int | None = None
) -> dict[str, Any]:
    """Append ``ds`` (base-schema rows) to an existing encoded set as NEW
    content-addressed segments — the streaming-ingest primitive: no existing
    segment is opened, the manifest refolds from headers, and appended
    segments carry zone maps like any other. Returns the refolded manifest
    with an ``appended`` row count."""
    manifest = lin.read_manifest(seg_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {seg_dir!r}")
    from fhirflat_ray.pipelines.encode import DEFAULT_TARGET_ROWS

    sort_keys = tuple(manifest.get("sort_keys") or ()) or None
    shared = _shared_for_encode(seg_dir, manifest)
    # uncommitted while the append is in flight; refold below re-commits
    lin.uncommit_manifest(seg_dir)
    n = sum(
        r["n_rows"]
        for r in _append_segments(
            ds, seg_dir, sort_keys, shared,
            target_rows=target_rows or DEFAULT_TARGET_ROWS,
        )
    )
    carried = {
        k: manifest[k]
        for k in ("source", "sort_keys", "shared_dicts", "schema_evolution")
        if k in manifest
    }
    carried["shared_dicts"] = {c: h for c, (h, _v) in shared.items()}
    carried["appended"] = int(n)
    return lin.write_manifest(seg_dir, lin.collect_lineage(seg_dir), extra=carried)


def merge_delete(seg_dir: str, keys_ds, key: str) -> dict[str, Any]:
    """Delete rows whose ``key`` appears in ``keys_ds`` (a Dataset with at
    least the ``key`` column) from the encoded set at ``seg_dir``. Same
    scale shape as :func:`merge_upsert`: zone-map routing means only
    candidate segments are ever opened; each rewrites (or is removed when
    it empties) in one idempotent task; the manifest refolds from headers.
    Returns the refolded manifest with a ``deleted`` count."""
    import ray

    from fhirflat_ray.functions.util import collect_small_table

    from fhirflat_ray.pipelines.evolve import evolved_sort_keys

    manifest = lin.read_manifest(seg_dir)
    evolution, evolve_fn = _evolution_plan(manifest)
    # disk-scan routing (same crash-consistency rationale as merge_upsert)
    records, part_meta = _scan_segments(seg_dir)
    if not records:
        raise FileNotFoundError(f"no encoded segments under {seg_dir!r}")
    sort_keys = tuple((manifest or {}).get("sort_keys") or ()) or None
    if evolution:
        sort_keys = evolved_sort_keys(evolution, sort_keys)
    shared = _evolved_shared(evolution, _shared_for_encode(seg_dir, manifest))
    # uncommitted while segments rewrite/drop in place (the stale manifest
    # would point at removed files); refold below is the new commit point
    lin.uncommit_manifest(seg_dir)

    los, his, pids, zoneless = _zone_router(records, _zone_key_names(evolution, key))
    router_ref = ray.put({"los": los, "his": his, "pids": pids, "zoneless": zoneless})
    meta_ref = ray.put(part_meta)

    def route(batch: pa.Table) -> pa.Table:
        r = ray.get(router_ref) if not isinstance(router_ref, dict) else router_ref
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        rows, parts = _route_keys(keys, r["los"], r["his"], r["pids"], r["zoneless"])
        return pa.table(
            {key: pa.array(keys[rows], pa.int64()), "__part": pa.array(parts, pa.int64())}
        )

    routed = keys_ds.map_batches(route, batch_format="pyarrow")

    def apply_to_segment(g: pd.DataFrame) -> pd.DataFrame:
        part_id = int(g["__part"].iloc[0])
        del_keys = g[key].to_numpy().astype(np.int64)
        meta = ray.get(meta_ref) if not isinstance(meta_ref, dict) else meta_ref
        fname, old_fragment = meta[part_id]
        path = os.path.join(seg_dir, fname)
        store = lin.load_dict_store(seg_dir)
        base = seg.read_segment(path, store)
        if evolve_fn is not None:
            # materialize pending evolution in the rewrite (see merge_upsert)
            base = evolve_fn(base)
        base_keys = base.column(key).to_numpy(zero_copy_only=False)
        hit = np.isin(base_keys, del_keys)
        n_hit = int(hit.sum())
        if n_hit == 0:
            return pd.DataFrame({"deleted": np.empty(0, np.int64)})
        kept = base.filter(pa.array(~hit))
        if kept.num_rows == 0:
            os.remove(path)  # segment emptied: drop it entirely
        else:
            header, payload = seg.encode_table(kept, shared)
            record = lin.lineage_record(
                part_id=part_id,
                input_fragment=f"delete:{old_fragment}",
                row_range=(0, kept.num_rows),
                n_rows=kept.num_rows,
                raw_bytes=kept.nbytes,
                encoded_bytes=len(payload),
                columns=header["columns"],
                payload_sha256=seg.sha256_hex(payload),
            )
            seg.write_segment(path, header, payload, record)
        return pd.DataFrame({"deleted": np.asarray([n_hit], np.int64)})

    out = collect_small_table(
        routed.groupby("__part").map_groups(apply_to_segment, batch_format="pandas")
    )
    import pyarrow.compute as pc

    n_deleted = int(pc.sum(out.column("deleted")).as_py() or 0) if out.num_rows else 0

    refolded = lin.write_manifest(
        seg_dir,
        lin.collect_lineage(seg_dir),
        extra={
            "source": (manifest or {}).get("source", "files"),
            "sort_keys": list(sort_keys) if sort_keys else None,
            "shared_dicts": {c: h for c, (h, _v) in shared.items()},
            "deleted": int(n_deleted),
            **({"schema_evolution": evolution} if evolution else {}),
        },
    )
    return refolded


def _append_segments(
    ds, seg_dir: str, sort_keys, shared, target_rows: int, tag: str = "upsert-insert"
) -> list[dict[str, Any]]:
    """Write ``ds`` as NEW content-addressed segments next to the existing
    ones (``encode_dataset``'s block writer without the clear-and-own-the-
    directory semantics). Returns the new segments' FULL lineage records
    (incl. the file stamp), so callers can either refold the whole dir or
    splice the records into a manifest they are about to commit."""
    import json as _json

    import ray

    from fhirflat_ray.functions.util import collect_small_table
    from fhirflat_ray.pipelines.encode import (
        _block_salt,
        _resolve_shared,
        _tune_worker_memory,
    )

    shared_ref = ray.put(shared) if shared else None
    _summary = pa.schema([("record", pa.string())])

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _summary.empty_table()
        _tune_worker_memory()
        sh = _resolve_shared(shared_ref)
        table = batch
        if sort_keys:
            ks = [k for k in sort_keys if k in table.column_names]
            if ks:
                table = table.sort_by([(k, "ascending") for k in ks])
        header, payload = seg.encode_table(table, sh)
        salt = _block_salt()
        uniq = seg.sha256_hex(payload + salt)
        record = lin.lineage_record(
            part_id=int(uniq[:15], 16),
            input_fragment=f"{tag}:{uniq}",
            row_range=(0, table.num_rows),
            n_rows=table.num_rows,
            raw_bytes=table.nbytes,
            encoded_bytes=len(payload),
            columns=header["columns"],
            payload_sha256=seg.sha256_hex(payload),
        )
        final_hdr = seg.write_segment(
            os.path.join(seg_dir, f"part-{uniq}.seg"), header, payload, record
        )
        return pa.table(
            {"record": pa.array([_json.dumps(final_hdr["lineage"])], pa.string())}
        )

    out = collect_small_table(
        ds.map_batches(write_block, batch_size=target_rows, batch_format="pyarrow", num_cpus=1)
    )
    import json as _json2

    if not out.num_rows:
        return []
    return [_json2.loads(s) for s in out.column("record").to_pylist()]


__all__ = ["merge_upsert", "merge_delete", "append_dataset"]
