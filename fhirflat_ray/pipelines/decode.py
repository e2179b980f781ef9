"""The decode pipeline: encoded segments → ``ray.data.Dataset`` of rows.

Segments are consumed with ``ray.data.read_binary_files`` (streaming source)
and decoded by an actor pool that loads the shared-dictionary store once per
worker — the decoder mirror of the reference's per-process class cache
(/root/reference/fhirflat/resources/extension_validators.py:81-87).
Column pruning happens at the segment layer: blobs of unrequested columns are
never decoded (true column-store projection).
"""

from __future__ import annotations

import glob
import os
from typing import Any

import pyarrow as pa

from fhirflat_ray.state import lineage as lin
from fhirflat_ray.state import segments as seg


def _decode_blobs(
    blobs,
    dict_store: dict[str, pa.Array],
    columns: list[str] | None,
    verify_checksums: bool,
) -> pa.Table:
    tables = [
        seg.read_segment(
            bytes(blob),
            dict_store=dict_store,
            columns=columns,
            verify_checksums=verify_checksums,
        )
        for blob in blobs
    ]
    return pa.concat_tables(tables)


#: worker-local dictionary-store cache for the stateless-task path (one load
#: per long-lived worker process per segment dir — see encode.py on why task
#: workers beat fresh actor processes on this VM)
_WORKER_DICTS: dict[str, dict[str, pa.Array]] = {}


def _worker_dict_store(seg_dir: str) -> dict[str, pa.Array]:
    if seg_dir not in _WORKER_DICTS:
        from fhirflat_ray.pipelines.encode import _tune_worker_memory

        _tune_worker_memory()
        if len(_WORKER_DICTS) > 4:
            _WORKER_DICTS.clear()
        _WORKER_DICTS[seg_dir] = lin.load_dict_store(seg_dir)
    return _WORKER_DICTS[seg_dir]


def _decode_task(
    batch: dict[str, Any],
    seg_dir: str,
    columns: list[str] | None,
    verify_checksums: bool,
) -> pa.Table:
    return _decode_blobs(
        batch["bytes"], _worker_dict_store(seg_dir), columns, verify_checksums
    )


class DecodeSegment:
    """Actor-pool stage: one encoded segment blob → decoded Arrow rows."""

    def __init__(self, seg_dir: str, columns: list[str] | None = None, verify_checksums: bool = False):
        from fhirflat_ray.pipelines.encode import _tune_worker_memory

        _tune_worker_memory()
        self.dict_store = lin.load_dict_store(seg_dir)
        self.columns = columns
        self.verify_checksums = verify_checksums

    def __call__(self, batch: dict[str, Any]) -> pa.Table:
        return _decode_blobs(
            batch["bytes"], self.dict_store, self.columns, self.verify_checksums
        )


def segment_paths(seg_dir: str) -> list[str]:
    """Committed segments of ``seg_dir`` — the manifest's partition list
    when one exists (stray files from crashed/concurrent writers are
    invisible), a ``part-*.seg`` glob for manifest-less dirs."""
    from fhirflat_ray.state.lineage import committed_segment_paths

    return committed_segment_paths(seg_dir)


#: predicate ops supported by zone pruning + residual filtering
_PRED_OPS = {"==", "<", "<=", ">", ">="}


def _zone_may_match(zone: tuple, op: str, val) -> bool:
    lo, hi = zone
    if op == "==":
        return lo <= val <= hi
    if op == ">=":
        return hi >= val
    if op == ">":
        return hi > val
    if op == "<=":
        return lo <= val
    return lo < val  # "<"


def _norm_pred(predicate) -> list[tuple[str, str, object]]:
    import datetime as _dt

    out = []
    for col, op, val in predicate:
        if op not in _PRED_OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
        if isinstance(val, _dt.datetime):
            val = int(val.timestamp() * 1_000_000)
        out.append((col, op, val))
    return out


def prune_segments(seg_dir: str, predicate) -> list[str]:
    """Paths of segments whose ZONE MAPS may satisfy every conjunct.

    Each segment header (a few hundred bytes at a fixed offset) carries
    min/max per orderable column; a segment is skipped only when some
    conjunct PROVABLY cannot hold — columns without zones keep the segment.
    The header scan is a tiny read per segment; above
    :data:`~fhirflat_ray.state.lineage.HEADER_FANOUT_THRESHOLD` segments it
    runs as a Ray task fan-out (at 100k+ segments the manifest's ``zones``
    records are the catalog-level plan path)."""
    from fhirflat_ray.state import lineage as lin

    preds = _norm_pred(predicate)

    def keep(path: str, hdr: dict) -> str | None:
        zones = seg.zones_of_header(hdr)
        blooms = seg.blooms_of_header(hdr)
        for col, op, val in preds:
            z = zones.get(col)
            if z is not None and not _zone_may_match(z, op, val):
                return None
            # string point lookups: the per-segment bloom can prove absence
            if op == "==" and isinstance(val, str):
                b = blooms.get(col)
                if b is not None and not seg.bloom_may_contain(b, val):
                    return None
        return path

    return lin.map_segment_headers(seg_dir, keep)


def _residual_filter(preds: list[tuple[str, str, object]]):
    """Exact vectorized post-decode filter for the pruned scan."""
    import pyarrow.compute as pc

    ops = {
        "==": pc.equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
    }

    def f(batch: pa.Table) -> pa.Table:
        mask = None
        for col, op, val in preds:
            c = batch[col]
            if pa.types.is_timestamp(c.type) and isinstance(val, int):
                c = c.cast(pa.int64())
            m = ops[op](c, val)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch

    return f


def decode_dataset(
    seg_dir: str,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    verify_checksums: bool = False,
    compute: str = "tasks",
    predicate: list[tuple[str, str, object]] | None = None,
):
    """Lazy Dataset over all segments in ``seg_dir``.

    ``compute="tasks"`` (default) decodes in stateless tasks with a
    worker-local dictionary-store cache; ``"actors"`` uses the
    ``DecodeSegment`` pool. Identical output either way.

    ``predicate`` is a conjunction of ``(column, op, value)`` with op in
    ``== < <= > >=``: zone maps skip whole segments that provably cannot
    match (header-only reads — see :func:`prune_segments`), and the exact
    vectorized residual filter runs after decode, so the result equals a
    full decode + filter while reading only the surviving segments."""
    import ray
    import ray.data as rd

    from fhirflat_ray.pipelines.evolve import (
        apply_evolution,
        pending_evolution,
        stored_columns_for,
    )

    # catalog-only schema evolution: read once on the driver, map the column
    # request back to stored names, apply the ops vectorized after decode.
    # With a predicate, the segment-level read must ALSO cover the predicate
    # columns (the residual filter needs them even when the caller did not
    # request them); they are dropped again after filtering.
    evolution = pending_evolution(seg_dir)
    read_cols = columns
    if columns is not None and predicate is not None:
        read_cols = list(
            dict.fromkeys(list(columns) + [c for c, _, _ in predicate])
        )
    stored_columns = read_cols
    if evolution and read_cols is not None:
        stored_columns = stored_columns_for(evolution, read_cols)
        if not stored_columns:
            # request is added-columns-only: still read one stored column so
            # each decoded batch carries its row count for the synthesizer
            first = segment_paths(seg_dir)
            if not first:
                raise FileNotFoundError(f"no segments under {seg_dir!r}")
            hdr, _ = seg.read_segment_header(first[0])
            stored_columns = [hdr["columns"][0]["name"]]

    def _evolved(ds):
        if not evolution:
            return ds
        return ds.map_batches(
            apply_evolution(evolution, read_cols), batch_format="pyarrow"
        )

    if predicate is not None:
        preds = _norm_pred(predicate)
        # zone maps are keyed by STORED column names: translate renamed
        # predicate columns back so pruning still fires after an ALTER
        # RENAME (the residual filter below runs on the evolved schema)
        rename_back = {
            op["new_name"]: op["name"]
            for op in evolution
            if op["op"] == "rename"
        }
        zone_preds = [(rename_back.get(c, c), o, v) for c, o, v in preds]
        kept = prune_segments(seg_dir, zone_preds)
        if not kept:
            # nothing can match: decode ONE segment and let the residual
            # filter empty it — preserves the output schema (an empty
            # from_arrow Dataset loses its columns through to_pandas)
            all_paths = segment_paths(seg_dir)
            if not all_paths:
                raise FileNotFoundError(f"no segments under {seg_dir!r}")
            kept = all_paths[:1]
        inner = _evolved(
            _decode_paths(
                seg_dir, kept, stored_columns, concurrency, verify_checksums, compute
            )
        )
        filtered = inner.map_batches(_residual_filter(preds), batch_format="pyarrow")
        if columns is not None and read_cols != columns:
            filtered = filtered.select_columns(list(columns))
        return filtered

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")
    return _evolved(
        _decode_paths(seg_dir, paths, stored_columns, concurrency, verify_checksums, compute)
    )


def _decode_paths(
    seg_dir: str,
    paths: list[str],
    columns: list[str] | None,
    concurrency,
    verify_checksums: bool,
    compute: str,
):
    import ray
    import ray.data as rd

    if columns is not None:
        # ranged pruned reads: only the requested columns' byte ranges leave
        # disk — don't ship whole segment blobs through the object store
        def pruned(batch: dict[str, Any]) -> pa.Table:
            store = _worker_dict_store(seg_dir)
            tables = [
                seg.read_segment_pruned(str(p), columns, store, verify_checksums)
                for p in batch["item"]
            ]
            return pa.concat_tables(tables)

        return rd.from_items(paths).map_batches(
            pruned, batch_size=1, batch_format="numpy", num_cpus=1
        )

    ds = rd.read_binary_files(paths)
    if compute == "tasks":
        return ds.map_batches(
            _decode_task,
            fn_kwargs={
                "seg_dir": seg_dir,
                "columns": columns,
                "verify_checksums": verify_checksums,
            },
            batch_size=1,
            batch_format="numpy",
            num_cpus=1,
        )
    if concurrency is None:
        # fixed pool: see encode.py — autoscaling serializes worker cold start
        concurrency = max(1, min(len(paths), int(ray.cluster_resources().get("CPU", 4))))
    return ds.map_batches(
        DecodeSegment,
        fn_constructor_kwargs={
            "seg_dir": seg_dir,
            "columns": columns,
            "verify_checksums": verify_checksums,
        },
        batch_size=1,
        batch_format="numpy",
        concurrency=concurrency,
        num_cpus=1,
    )


def parse_predicate(spec: str) -> list[tuple[str, str, object]]:
    """Parse a CLI predicate string ``"col>=123,col2==abc"`` into the
    conjunct list :func:`decode_dataset` takes. Numeric literals become
    int/float; ISO timestamps (``2024-01-22`` / ``2024-01-22T06:00:00``)
    become int64 microseconds; everything else stays a string."""
    import datetime as _dt
    import re

    out: list[tuple[str, str, object]] = []
    for part in spec.split(","):
        m = re.match(r"^\s*(\w+)\s*(==|<=|>=|<|>)\s*(.+?)\s*$", part)
        if not m:
            raise ValueError(f"bad predicate conjunct {part!r}")
        col, op, raw = m.groups()
        val: object
        try:
            val = int(raw)
        except ValueError:
            try:
                val = float(raw)
            except ValueError:
                try:
                    val = _dt.datetime.fromisoformat(raw)
                except ValueError:
                    val = raw
        out.append((col, op, val))
    return out


def decode_to_parquet(
    seg_dir: str,
    dest_dir: str,
    columns: list[str] | None = None,
    predicate: list[tuple[str, str, object]] | None = None,
) -> None:
    """Stream segments back out as a partitioned parquet directory."""
    decode_dataset(seg_dir, columns, predicate=predicate).write_parquet(dest_dir)
