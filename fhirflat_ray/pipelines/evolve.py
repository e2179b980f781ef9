"""Catalog-only schema evolution on the encoded segment format.

``add_column`` / ``drop_column`` / ``rename_column`` are METADATA
operations: they append an op to the manifest's ``schema_evolution`` list
and never open a segment — constant-time ALTER TABLE regardless of data
size (the lakehouse discipline of Iceberg/Delta; the reference can only
re-run its whole ingest to change a output schema,
/root/reference/fhirflat/ingest.py:543-575). ``decode_dataset`` applies
the ops vectorized after segment decode, so readers always see the evolved
schema; ``compact_segments`` (which re-encodes through decode) materializes
the evolution physically, and its output manifest carries no pending ops.

Interactions, by design:

- column pruning (``decode_dataset(columns=...)``) maps requested names
  back through renames and strips added names before the segment-level
  ranged read, then applies the ops — pruned reads stay pruned.
- zone/bloom predicate pruning consults STORED column names; a predicate
  on a renamed or added column simply finds no zone and keeps segments
  (conservative, never wrong).
- keyed mutations (``merge_upsert`` / ``merge_delete``) MATERIALIZE the
  pending ops inside every candidate-segment rewrite (the segment is being
  re-encoded anyway, so the evolution rides along for free); untouched
  segments keep the op-log pending. The decode-time application is
  IDEMPOTENT over such mixed sets: drops/renames no-op when already
  applied, adds skip when the column (under its current OR final name) is
  present — so a segment set where some segments materialized the ops and
  others did not reads back identically either way.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from fhirflat_ray.state import lineage as lin

#: manifest keys carried forward verbatim by evolution rewrites
_CARRY = ("source", "sort_keys", "shared_dicts", "upserted", "inserted", "deleted")


def _rewrite_manifest(seg_dir: str, evolution: list[dict[str, Any]]) -> dict[str, Any]:
    manifest = lin.read_manifest(seg_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {seg_dir!r}")
    extra = {k: manifest[k] for k in _CARRY if k in manifest}
    extra["schema_evolution"] = evolution
    return lin.write_manifest(seg_dir, manifest["partitions"], extra=extra)


def _current_names(seg_dir: str, manifest: dict[str, Any]) -> set[str]:
    """User-visible column names: stored schema + applied evolution."""
    from fhirflat_ray.state import segments as seg
    from fhirflat_ray.pipelines.decode import segment_paths

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")
    hdr, _ = seg.read_segment_header(paths[0])
    names = [c["name"] for c in hdr["columns"]]
    for op in manifest.get("schema_evolution") or []:
        if op["op"] == "add" and op["name"] not in names:
            names.append(op["name"])
        elif op["op"] == "drop" and op["name"] in names:
            names.remove(op["name"])
        elif op["op"] == "rename" and op["name"] in names:
            names[names.index(op["name"])] = op["new_name"]
    return set(names)


def add_column(
    seg_dir: str, name: str, dtype: str, default: Any | None = None
) -> dict[str, Any]:
    """ALTER TABLE ADD COLUMN ``name dtype DEFAULT default`` — catalog only.

    ``dtype`` is a pyarrow type alias (``string``, ``int64``, ``float64``,
    ``timestamp[us]``, ...); ``default=None`` fills typed nulls."""
    pa.type_for_alias(dtype)  # validate eagerly
    manifest = lin.read_manifest(seg_dir) or {}
    if name in _current_names(seg_dir, manifest):
        raise ValueError(f"column {name!r} already exists")
    evo = list(manifest.get("schema_evolution") or [])
    evo.append({"op": "add", "name": name, "dtype": dtype, "default": default})
    return _rewrite_manifest(seg_dir, evo)


def drop_column(seg_dir: str, name: str) -> dict[str, Any]:
    """ALTER TABLE DROP COLUMN — catalog only; segment bytes are reclaimed
    at the next compaction, not before (drop is O(1) at any data size)."""
    manifest = lin.read_manifest(seg_dir) or {}
    if name not in _current_names(seg_dir, manifest):
        raise KeyError(f"no column {name!r}")
    evo = list(manifest.get("schema_evolution") or [])
    evo.append({"op": "drop", "name": name})
    return _rewrite_manifest(seg_dir, evo)


def rename_column(seg_dir: str, name: str, new_name: str) -> dict[str, Any]:
    """ALTER TABLE RENAME COLUMN — catalog only."""
    manifest = lin.read_manifest(seg_dir) or {}
    names = _current_names(seg_dir, manifest)
    if name not in names:
        raise KeyError(f"no column {name!r}")
    if new_name in names:
        raise ValueError(f"column {new_name!r} already exists")
    evo = list(manifest.get("schema_evolution") or [])
    evo.append({"op": "rename", "name": name, "new_name": new_name})
    return _rewrite_manifest(seg_dir, evo)


def pending_evolution(seg_dir: str) -> list[dict[str, Any]]:
    manifest = lin.read_manifest(seg_dir)
    return list((manifest or {}).get("schema_evolution") or [])


def rename_chain(evolution: list[dict[str, Any]], name: str) -> list[str]:
    """Every name a user-visible column may be STORED under across a mixed
    segment set: the requested name itself plus all prior names reached by
    walking renames backwards. A merge-materialized segment stores the
    final name; an untouched one stores the original — a pruned read must
    request the whole chain (requesting an absent name is harmless)."""
    rename_back = {
        op["new_name"]: op["name"] for op in evolution if op["op"] == "rename"
    }
    chain = [name]
    seen = {name}
    while chain[-1] in rename_back:
        prev = rename_back[chain[-1]]
        if prev in seen:  # defensive: cyclic renames cannot normally occur
            break
        chain.append(prev)
        seen.add(prev)
    return chain


def stored_columns_for(
    evolution: list[dict[str, Any]], requested: list[str]
) -> list[str]:
    """Map a user-visible column request to the STORED segment column
    names the pruned read must cover. Renamed columns request their whole
    name chain (mixed materialization: some segments store the old name,
    merge-rewritten ones the new). ADDED columns stay in the request too —
    a merge may have materialized real values for them; segments without
    the column simply don't return it and the decode-time synthesizer
    fills the default. Raises on dropped columns — they no longer exist
    for readers."""
    dropped = {op["name"] for op in evolution if op["op"] == "drop"}
    out: list[str] = []
    for name in requested:
        if name in dropped:
            raise KeyError(f"column {name!r} was dropped")
        for n in rename_chain(evolution, name):
            if n not in out:
                out.append(n)
    return out


def apply_evolution(evolution: list[dict[str, Any]], requested: list[str] | None):
    """Vectorized per-batch application of the evolution ops, in order.
    ``requested`` limits which added columns are synthesized (pruned
    reads)."""

    def _final_name(i: int, name: str) -> str | None:
        """Name this column ends up under after ops AFTER position ``i``
        (None if a later op drops it) — the mixed-set idempotency key: a
        merge-materialized segment stores the FINAL name, so earlier ops
        must recognize it as already applied."""
        cur = name
        for later in evolution[i + 1 :]:
            if later["op"] == "rename" and later["name"] == cur:
                cur = later["new_name"]
            elif later["op"] == "drop" and later["name"] == cur:
                return None
        return cur

    def f(batch: pa.Table) -> pa.Table:
        for i, op in enumerate(evolution):
            kind = op["op"]
            if kind == "drop":
                if op["name"] in batch.column_names:
                    batch = batch.drop_columns([op["name"]])
            elif kind == "rename":
                # no-op when already materialized (target present)
                if (
                    op["name"] in batch.column_names
                    and op["new_name"] not in batch.column_names
                ):
                    batch = batch.rename_columns(
                        [
                            op["new_name"] if c == op["name"] else c
                            for c in batch.column_names
                        ]
                    )
            elif kind == "add":
                name = op["name"]
                final = _final_name(i, name)
                if final is None:
                    continue  # dropped again later: never synthesize
                if name in batch.column_names or final in batch.column_names:
                    continue  # already materialized (mixed old/new segments)
                if (
                    requested is not None
                    and name not in requested
                    and final not in requested
                ):
                    continue
                typ = pa.type_for_alias(op["dtype"])
                default = op.get("default")
                if default is None:
                    col = pa.nulls(batch.num_rows, typ)
                else:
                    col = pa.repeat(pa.scalar(default, typ), batch.num_rows)
                batch = batch.append_column(name, col)
        if requested is not None:
            batch = batch.select([c for c in requested if c in batch.column_names])
        return batch

    return f


def evolved_sort_keys(
    evolution: list[dict[str, Any]], sort_keys: tuple[str, ...] | None
) -> tuple[str, ...] | None:
    """Map stored-schema sort keys forward through the op-log (renames
    followed, dropped keys removed) so a materializing rewrite re-sorts by
    the evolved names."""
    if not sort_keys:
        return sort_keys
    out = []
    for k in sort_keys:
        cur: str | None = k
        for op in evolution:
            if op["op"] == "rename" and op["name"] == cur:
                cur = op["new_name"]
            elif op["op"] == "drop" and op["name"] == cur:
                cur = None
                break
        if cur is not None:
            out.append(cur)
    return tuple(out) or None


__all__ = [
    "add_column",
    "rename_chain",
    "evolved_sort_keys",
    "drop_column",
    "rename_column",
    "pending_evolution",
    "stored_columns_for",
    "apply_evolution",
]
