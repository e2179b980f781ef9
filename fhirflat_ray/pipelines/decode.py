"""The decode pipeline: encoded segments → ``ray.data.Dataset`` of rows.

Segment paths fan out as one fused task stage (``from_items`` → per-segment
ranged file reads inside the task — shared storage on a multi-node cluster);
workers load the shared-dictionary store once per process — the decoder
mirror of the reference's per-process class cache
(/root/reference/fhirflat/resources/extension_validators.py:81-87).
Column pruning happens at the segment layer: blobs of unrequested columns are
never read (true column-store projection).
"""

from __future__ import annotations

import glob
import os
from typing import Any

import numpy as np
import pyarrow as pa

from fhirflat_ray.state import lineage as lin
from fhirflat_ray.state import segments as seg


def _decode_paths_to_table(
    paths,
    dict_store: dict[str, pa.Array],
    columns: list[str] | None,
    verify_checksums: bool,
) -> pa.Table:
    tables = [
        seg.read_segment(
            str(p),
            dict_store=dict_store,
            columns=columns,
            verify_checksums=verify_checksums,
        )
        for p in paths
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
    post=None,
) -> pa.Table:
    t = _decode_paths_to_table(
        batch["item"], _worker_dict_store(seg_dir), columns, verify_checksums
    )
    # ``post`` (e.g. schema-evolution application) runs PER SEGMENT so every
    # block leaves the decode stage with one uniform schema — a later map
    # stage would let Ray coalesce mixed-schema blocks (materialized vs
    # pending-evolution segments) into one batch, null-padding missing
    # columns BEFORE the ops run and silently corrupting added defaults
    return post(t) if post is not None else t


class DecodeSegment:
    """Actor-pool stage: one encoded segment blob → decoded Arrow rows."""

    def __init__(self, seg_dir: str, columns: list[str] | None = None, verify_checksums: bool = False, post=None):
        from fhirflat_ray.pipelines.encode import _tune_worker_memory

        _tune_worker_memory()
        self.dict_store = lin.load_dict_store(seg_dir)
        self.columns = columns
        self.verify_checksums = verify_checksums
        self.post = post

    def __call__(self, batch: dict[str, Any]) -> pa.Table:
        t = _decode_paths_to_table(
            batch["item"], self.dict_store, self.columns, self.verify_checksums
        )
        return self.post(t) if self.post is not None else t


def segment_paths(seg_dir: str) -> list[str]:
    """Committed segments of ``seg_dir`` — the manifest's partition list
    when one exists (stray files from crashed/concurrent writers are
    invisible), a ``part-*.seg`` glob for manifest-less dirs."""
    from fhirflat_ray.state.lineage import committed_segment_paths

    return committed_segment_paths(seg_dir)


#: predicate ops supported by zone pruning + residual filtering
_PRED_OPS = {"==", "<", "<=", ">", ">=", "is_in"}


def read_segment_filtered(
    path: str,
    columns: list[str] | None,
    preds: list[tuple[str, str, object]],
    dict_store: dict[str, pa.Array] | None,
    verify_checksums: bool = False,
) -> pa.Table:
    """Segment read that evaluates string ``==`` / ``is_in`` conjuncts in
    the ENCODED domain: for a null-free dict-coded column, the predicate
    value(s) look up the (tiny) vocabulary, the match becomes an integer
    compare over the code stream, and the string column itself materializes
    only the SURVIVING rows (``vocab.take`` on the filtered codes) — the
    full string payload is never decoded. Per-column, per-segment fallback:
    a segment where the codec auto-selection chose a non-dict codec simply
    skips the fast path (the dataset-level residual filter keeps exactness
    either way). Non-string conjuncts are left to the residual filter."""
    import pyarrow.compute as pc

    from fhirflat_ray.codecs import decode_column
    from fhirflat_ray.pipelines.encoded_agg import _dict_codes_and_vocab

    hdr, payload_off = seg.read_segment_header(path)
    colmap = {c["name"]: c for c in hdr["columns"]}
    mask: np.ndarray | None = None
    deferred: dict[str, tuple[np.ndarray, pa.Array]] = {}
    for cname, op, val in preds:
        centry = colmap.get(cname)
        if centry is None or op not in ("==", "is_in"):
            continue
        vals = [val] if op == "==" else list(val)
        if not vals or not all(isinstance(v, str) for v in vals):
            continue
        cv = _dict_codes_and_vocab(path, payload_off, centry, dict_store)
        if cv is None:
            continue
        codes, vocab = cv
        match = pc.is_in(vocab, value_set=pa.array(vals, type=vocab.type))
        mcodes = np.flatnonzero(np.asarray(match))
        if len(mcodes) == 0:
            m = np.zeros(len(codes), dtype=bool)
        elif len(mcodes) == 1:
            m = codes == mcodes[0]
        else:
            m = np.isin(codes, mcodes)
        mask = m if mask is None else (mask & m)
        deferred[cname] = (codes, vocab)
    sel = None if mask is None else np.flatnonzero(mask)
    arrays: list[pa.Array] = []
    fields: list[pa.Field] = []
    with open(path, "rb") as f:
        for col in hdr["columns"]:
            if columns is not None and col["name"] not in columns:
                continue
            if col["name"] in deferred:
                codes, vocab = deferred[col["name"]]
                take = codes if sel is None else codes[sel]
                arr = vocab.take(pa.array(take, pa.int64()))
            else:
                f.seek(payload_off + col["off"])
                blob = f.read(col["len"])
                if verify_checksums and seg.sha256_hex(blob) != col["sha256"]:
                    raise ValueError(
                        f"checksum mismatch for column {col['name']!r}"
                    )
                arr = decode_column(col["hdr"], blob, dict_store)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if sel is not None:
                    arr = arr.take(pa.array(sel, pa.int64()))
            arrays.append(arr)
            fields.append(
                pa.field(col["name"], arr.type, nullable=col.get("nullable", True))
            )
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _decode_paths_filtered(
    seg_dir: str,
    paths: list[str],
    columns: list[str] | None,
    preds: list[tuple[str, str, object]],
    verify_checksums: bool,
):
    """Task fan-out over segment paths with the encoded-domain predicate
    read (see :func:`read_segment_filtered`); ranged I/O per column, one
    segment per task."""
    import ray.data as rd

    def task(batch: dict[str, Any]) -> pa.Table:
        store = _worker_dict_store(seg_dir)
        tables = [
            read_segment_filtered(str(p), columns, preds, store, verify_checksums)
            for p in batch["item"]
        ]
        return pa.concat_tables(tables)

    return rd.from_items(paths).map_batches(
        task, batch_size=1, batch_format="numpy", num_cpus=1
    )


def _zone_may_match(zone: tuple, op: str, val) -> bool:
    lo, hi = zone
    if op == "==":
        return lo <= val <= hi
    if op == "is_in":
        return any(lo <= v <= hi for v in val)
    if op == ">=":
        return hi >= val
    if op == ">":
        return hi > val
    if op == "<=":
        return lo <= val
    return lo < val  # "<"


def _norm_pred(predicate) -> list[tuple[str, str, object]]:
    import datetime as _dt

    def norm_val(v):
        return int(v.timestamp() * 1_000_000) if isinstance(v, _dt.datetime) else v

    out = []
    for col, op, val in predicate:
        if op not in _PRED_OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
        if op == "is_in":
            if not isinstance(val, (list, tuple, set, frozenset)):
                raise ValueError("is_in predicate value must be a list/tuple/set")
            val = sorted(norm_val(v) for v in val)
        else:
            val = norm_val(val)
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
            if op == "is_in" and val and all(isinstance(v, str) for v in val):
                b = blooms.get(col)
                if b is not None and not any(
                    seg.bloom_may_contain(b, v) for v in val
                ):
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
            if pa.types.is_timestamp(c.type) and (
                isinstance(val, int)
                or (op == "is_in" and any(isinstance(v, int) for v in val))
            ):
                c = c.cast(pa.int64())
            if op == "is_in":
                m = pc.is_in(c, value_set=pa.array(list(val)))
            else:
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
        from fhirflat_ray.pipelines.evolve import rename_chain

        stored_columns = stored_columns_for(evolution, read_cols)
        added = {op["name"] for op in evolution if op["op"] == "add"}
        if all(rename_chain(evolution, c)[-1] in added for c in read_cols):
            # request is added-columns-only: no column is guaranteed present
            # in every segment (merge-materialized ones carry real values,
            # untouched ones nothing), so decode full segments and let the
            # synthesizer + final select produce the request — correct for
            # mixed sets, and this query shape is rare
            stored_columns = None

    # evolution runs PER SEGMENT inside the decode task (the ``post`` hook)
    # — a separate map stage would let Ray coalesce mixed-schema blocks
    # (merge-materialized vs pending segments) into one null-padded batch
    # BEFORE the ops run, silently replacing added-column defaults with
    # nulls for the rows of unmaterialized segments
    post = apply_evolution(evolution, read_cols) if evolution else None

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
        if not evolution:
            # encoded-domain string predicates: dict-coded ==/is_in
            # conjuncts evaluate on the code stream inside the segment read
            # (string payloads materialize only surviving rows); the
            # residual filter below keeps exactness for segments whose
            # codec auto-selection went non-dict. Disabled under pending
            # evolution, where predicates reference the EVOLVED schema.
            inner = _decode_paths_filtered(
                seg_dir, kept, stored_columns, preds, verify_checksums
            )
        else:
            inner = _decode_paths(
                seg_dir, kept, stored_columns, concurrency, verify_checksums,
                compute, post=post,
            )
        filtered = inner.map_batches(_residual_filter(preds), batch_format="pyarrow")
        if columns is not None and read_cols != columns:
            filtered = filtered.select_columns(list(columns))
        return filtered

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")
    return _decode_paths(
        seg_dir, paths, stored_columns, concurrency, verify_checksums, compute,
        post=post,
    )


def _decode_paths(
    seg_dir: str,
    paths: list[str],
    columns: list[str] | None,
    concurrency,
    verify_checksums: bool,
    compute: str,
    post=None,
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
            t = pa.concat_tables(tables)
            return post(t) if post is not None else t

        return rd.from_items(paths).map_batches(
            pruned, batch_size=1, batch_format="numpy", num_cpus=1
        )

    # one fused operator: tasks read segment files themselves (shared
    # storage on a multi-node cluster — the pruned path's contract already)
    # instead of a separate read_binary_files stage shipping whole blobs
    # through the object store. Measured at the bench shape (16 segments,
    # 32 CPUs): 0.145 s -> 0.067 s per decode lap.
    ds = rd.from_items(paths)
    if compute == "tasks":
        return ds.map_batches(
            _decode_task,
            fn_kwargs={
                "seg_dir": seg_dir,
                "columns": columns,
                "verify_checksums": verify_checksums,
                "post": post,
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
            "post": post,
        },
        batch_size=1,
        batch_format="numpy",
        concurrency=concurrency,
        num_cpus=1,
    )


def parse_predicate(spec: str) -> list[tuple[str, str, object]]:
    """Parse a CLI predicate string ``"col>=123,col2==abc,tag in a|b"``
    into the conjunct list :func:`decode_dataset` takes. Numeric literals
    become int/float; ISO timestamps (``2024-01-22`` /
    ``2024-01-22T06:00:00``) become int64 microseconds; everything else
    stays a string. ``col in v1|v2|...`` maps to the ``is_in`` op
    (dict-coded string columns evaluate it on the encoded code stream)."""
    import datetime as _dt
    import re

    def coerce(raw: str) -> object:
        try:
            return int(raw)
        except ValueError:
            try:
                return float(raw)
            except ValueError:
                try:
                    return _dt.datetime.fromisoformat(raw)
                except ValueError:
                    return raw

    out: list[tuple[str, str, object]] = []
    for part in spec.split(","):
        m_in = re.match(r"^\s*(\w+)\s+in\s+(.+?)\s*$", part)
        if m_in:
            col, raw = m_in.groups()
            out.append((col, "is_in", [coerce(v.strip()) for v in raw.split("|")]))
            continue
        m = re.match(r"^\s*(\w+)\s*(==|<=|>=|<|>)\s*(.+?)\s*$", part)
        if not m:
            raise ValueError(f"bad predicate conjunct {part!r}")
        col, op, raw = m.groups()
        out.append((col, op, coerce(raw)))
    return out


def decode_to_parquet(
    seg_dir: str,
    dest_dir: str,
    columns: list[str] | None = None,
    predicate: list[tuple[str, str, object]] | None = None,
) -> None:
    """Stream segments back out as a partitioned parquet directory."""
    decode_dataset(seg_dir, columns, predicate=predicate).write_parquet(dest_dir)
