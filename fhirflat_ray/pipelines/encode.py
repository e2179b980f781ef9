"""The encode pipeline: parquet fragments → encoded segments + lineage.

Ray-Data-first design:

- the *unit of parallelism* is an input fragment chunk (file × row-group
  range), planned deterministically up front so partition ids are stable
  across runs — that is what makes resume and idempotent retries possible
  (content lands at ``part-<id>.seg`` via write-temp-then-rename);
- the fragment work-list is itself a ``ray.data.Dataset``; encoding runs as
  an actor-pool ``map_batches`` stage (``EncodePartition``) whose actors hold
  the codec registry and broadcast shared dictionaries once per worker
  (the reference's per-process mapping-table/class-cache state,
  /root/reference/fhirflat/ingest.py:358-366 and
  /root/reference/fhirflat/resources/extension_validators.py:81-87, done the
  Ray way: ``ray.put`` once, ``ray.get`` in ``__init__``);
- rows are sorted per partition by ``(conv_id, turn_idx)`` before encoding to
  maximize run lengths (SURVEY.md §2.6) — no global sort is needed because
  the round-trip invariant only requires stable order under that key;
- at 100 TB the work-list is millions of small rows streaming through the
  actor pool with backpressure; no stage materializes the data itself.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from fhirflat_ray.schema import ORDER_KEY
from fhirflat_ray.state import lineage as lin
from fhirflat_ray.state import segments as seg
from fhirflat_ray.codecs.strings import vocab_hash

DEFAULT_TARGET_ROWS = 512 * 1024
#: adaptive-plan floor: below this, per-segment overhead (headers, symbol
#: tables, task dispatch) dominates the payload
MIN_TARGET_ROWS = 16 * 1024
SHARED_DICT_MAX_CARD = 4096


def _tune_worker_memory() -> None:
    """Keep allocator arenas resident in long-lived workers.

    This sandbox's VM provisions anonymous pages at ~90 MB/s aggregate on
    first touch; any allocator that returns pages to the OS between batches
    re-pays that tax every batch. Disabling jemalloc decay makes each worker
    pay it once and reuse the arena for its whole lifetime. (glibc-malloc
    retention for numpy buffers needs MALLOC_MMAP_THRESHOLD_/
    MALLOC_TRIM_THRESHOLD_ set BEFORE the worker process starts — see
    :func:`tune_session_memory_env`.)"""
    try:
        import pyarrow as _pa

        _pa.jemalloc_set_decay_ms(-1)
    except (ImportError, NotImplementedError, OSError):
        pass


def tune_session_memory_env() -> None:
    """Set glibc malloc retention env vars. MUST run before ``ray.init`` so
    raylet-spawned workers inherit them: large numpy buffers then stay in the
    worker heap instead of being munmap'd and re-faulted every batch (one
    measured wave of 32×150MB allocations drops from ~2.4s/task to
    ~0.13s/task on warm workers)."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))


def plan_partitions(
    input_paths: list[str],
    target_rows: int = DEFAULT_TARGET_ROWS,
    metas: dict[str, Any] | None = None,
) -> list[dict[str, Any]]:
    """Deterministic fragment plan: one item per (file, row-group span).

    Row groups are grouped greedily up to ``target_rows`` rows per partition;
    a conversation larger than a partition simply spans partitions (symbol
    tables and dictionaries are partition-scoped, so skewed conversations
    cannot pin state — SURVEY.md §7 "Hard parts").
    """
    items: list[dict[str, Any]] = []
    part_id = 0
    for path in sorted(input_paths):
        st = os.stat(path)
        src_sig = f"{st.st_size}:{st.st_mtime_ns}"
        md = metas[path] if metas is not None else pq.ParquetFile(path).metadata
        groups: list[int] = []
        rows = 0
        row_start = 0
        row_cursor = 0
        for rg in range(md.num_row_groups):
            nr = md.row_group(rg).num_rows
            if groups and rows + nr > target_rows:
                items.append(
                    {
                        "part_id": part_id,
                        "path": path,
                        "row_groups": groups,
                        "row_start": row_start,
                        "row_end": row_cursor,
                        "src_sig": src_sig,
                    }
                )
                part_id += 1
                groups, rows, row_start = [], 0, row_cursor
            groups.append(rg)
            rows += nr
            row_cursor += nr
        if groups:
            items.append(
                {
                    "part_id": part_id,
                    "path": path,
                    "row_groups": groups,
                    "row_start": row_start,
                    "row_end": row_cursor,
                    "src_sig": src_sig,
                }
            )
            part_id += 1
    return items


def fragment_id(item: dict[str, Any]) -> str:
    """Identity string for one planned fragment, embedded in its lineage
    record and compared by resume. Includes the source file's size+mtime so
    an input rewritten IN PLACE (same name, same row-group layout) is not
    wrongly skipped, leaving stale encoded data."""
    base = f"{item['path']}#rg{item['row_groups'][0]}-{item['row_groups'][-1]}"
    sig = item.get("src_sig")
    return f"{base}@{sig}" if sig else base


def build_shared_dicts(
    input_paths: list[str],
    columns: list[str],
    out_dir: str,
    max_card: int = SHARED_DICT_MAX_CARD,
    sample_fragments: int | None = 16,
) -> dict[str, tuple[str, pa.Array]]:
    """Union per-fragment vocabularies of low-cardinality columns.

    Partial-aggregate pattern (SURVEY.md §2.5 A5): each batch emits its tiny
    distinct set; the driver merges (the reduce side is bounded by
    ``max_card`` per column, so no shuffle is needed). Columns that overflow
    the cap keep per-partition dictionaries instead.

    The vocabulary is built from a SAMPLE (first row group of up to
    ``sample_fragments`` evenly spaced fragments; ``None`` → full scan): a
    value missing from the sampled vocab simply makes that partition fall
    back to its local dictionary (``encode_dict`` returns None on
    out-of-vocab), so sampling trades a little compression for skipping a
    full input pass — the right trade at 100 TB.
    """
    import pyarrow.compute as pc

    if not columns:
        return {}

    # tolerate requested columns absent from this table's schema (the CLI
    # defaults to role,tool; arbitrary tables just skip them)
    if input_paths:
        schema_names = set(pq.read_schema(input_paths[0]).names)
        columns = [c for c in columns if c in schema_names]
    if not columns:
        return {}

    merged: dict[str, set] = {c: set() for c in columns}

    if sample_fragments is not None and len(input_paths) >= 1:
        step = max(1, len(input_paths) // sample_fragments)
        paths = input_paths[::step][:sample_fragments]

        def sample_one(path: str) -> dict[str, list]:
            pf = pq.ParquetFile(path)
            t = pf.read_row_group(0, columns=columns)
            return {
                name: pc.unique(t.column(name).combine_chunks())
                .slice(0, max_card + 1)
                .to_pylist()
                for name in columns
            }

        if len(paths) <= 4:
            results = [sample_one(p) for p in paths]
        else:
            # many fragments: fan the row-group-0 reads out as Ray tasks
            # (the round-2 version read them serially on the driver — fine
            # at 16 files, a stall at 100k fragments)
            import ray

            sample_task = ray.remote(num_cpus=1)(sample_one)
            results = ray.get([sample_task.remote(p) for p in paths])
        for r in results:
            for name, vals in r.items():
                merged[name] |= set(vals)
    else:
        import ray.data as rd

        def distinct_batch(batch: pa.Table) -> pa.Table:
            cols, vals = [], []
            for name in batch.column_names:
                uniq = pc.unique(batch.column(name).combine_chunks())
                uniq = uniq.slice(0, max_card + 1)
                cols.extend([name] * len(uniq))
                vals.extend(uniq.to_pylist())
            return pa.table(
                {"col": pa.array(cols, pa.string()), "val": pa.array(vals, pa.string())}
            )

        ds = rd.read_parquet(input_paths, columns=columns)
        for row in ds.map_batches(distinct_batch, batch_format="pyarrow").take_all():
            merged[row["col"]].add(row["val"])

    out: dict[str, tuple[str, pa.Array]] = {}
    for name, values in merged.items():
        if not values or len(values) > max_card:
            continue
        vocab = pa.array(sorted(v for v in values if v is not None), pa.string())
        h = vocab_hash(vocab)
        lin.write_shared_dict(out_dir, h, vocab)
        out[name] = (h, vocab)
    return out


def _already_sorted(table: pa.Table, keys: list[str]) -> bool:
    """Vectorized lexicographic sortedness check for 1-2 keys — bulk inputs
    are usually already (conv, turn)-ordered, and skipping the sort avoids a
    full table copy per partition."""
    import pyarrow.compute as pc

    n = table.num_rows
    if n < 2 or not keys:
        return True
    a = table.column(keys[0]).combine_chunks()
    # pc.all skips nulls by default, so a nullable key could be reported
    # sorted and silently skip the sort (degrading run lengths); treat any
    # null in a key column as not-sorted and let sort_by place them
    if a.null_count:
        return False
    lo, hi = a.slice(0, n - 1), a.slice(1)
    le = pc.less_equal(lo, hi)
    if not pc.all(le).as_py():
        return False
    if len(keys) == 1:
        return True
    b = table.column(keys[1]).combine_chunks()
    if b.null_count:
        return False
    eq = pc.equal(lo, hi)
    b_ok = pc.less_equal(b.slice(0, n - 1), b.slice(1))
    return pc.all(pc.if_else(eq, b_ok, pa.scalar(True))).as_py()


def encode_partition_item(
    item: dict[str, Any],
    out_dir: str,
    sort_keys: tuple[str, ...] | None,
    shared: dict[str, tuple[str, pa.Array]],
    columns: list[str] | None,
) -> dict[str, Any]:
    """Encode one fragment chunk to a durable segment; returns a summary row."""
    import time

    t0 = time.monotonic()
    pf = pq.ParquetFile(item["path"])
    table = pf.read_row_groups(item["row_groups"], columns=columns)
    t1 = time.monotonic()
    if sort_keys:
        keys = [k for k in sort_keys if k in table.column_names]
        if keys and not (len(keys) <= 2 and _already_sorted(table, keys)):
            table = table.sort_by([(k, "ascending") for k in keys])
    t2 = time.monotonic()
    header, payload = seg.encode_table(table, shared)
    t3 = time.monotonic()
    metrics = {
        "read_sec": round(t1 - t0, 3),
        "sort_sec": round(t2 - t1, 3),
        "encode_sec": round(t3 - t2, 3),
    }
    record = lin.lineage_record(
        metrics=metrics,
        part_id=item["part_id"],
        input_fragment=fragment_id(item),
        row_range=(item["row_start"], item["row_end"]),
        n_rows=table.num_rows,
        raw_bytes=table.nbytes,
        encoded_bytes=len(payload),
        columns=header["columns"],
        payload_sha256=seg.sha256_hex(payload),
    )
    seg.write_segment(lin.segment_path(out_dir, item["part_id"]), header, payload, record)
    return {
        "part_id": record["part_id"],
        "n_rows": record["n_rows"],
        "raw_bytes": record["raw_bytes"],
        "encoded_bytes": record["encoded_bytes"],
    }


#: worker-local broadcast cache for the stateless-task path: ``ray.get`` of
#: the shared-dict ref happens once per (long-lived) worker process, the
#: same amortization an actor gets from ``__init__`` — but task workers are
#: REUSED across dataset executions, so repeated jobs skip this VM's
#: per-process memory-provisioning cold tax entirely.
_WORKER_CACHE: dict[str, Any] = {}

import uuid as _uuid


def _block_salt() -> bytes:
    """CALL-TIME random component of a streamed block's segment identity.

    Salting makes (a) two byte-IDENTICAL blocks land in distinct segments
    (multiset semantics hold — no whole-block dedup footgun) and (b) two
    DIFFERENT blocks never collide on a digest and overwrite each other via
    ``os.replace``. The randomness MUST be drawn per call, in the worker:
    the earlier (per-process uuid, per-process ordinal) module state looked
    unique but was captured BY VALUE when cloudpickle serialized the nested
    ``encode_block`` closure — every task received the driver's uuid and a
    COPY of the ordinal counter at its pickled state, so identical payloads
    processed by different tasks produced the same salted name and silently
    collapsed to one segment (caught by the z-order grid test, whose
    self-similar tiles encode byte-identically). Determinism across runs is
    not required here — ``encode_dataset`` is documented as non-resumable
    and clears ``out_dir`` up front."""
    return f":{_uuid.uuid4().hex}".encode()


def _resolve_shared(shared_ref: Any) -> dict[str, tuple[str, pa.Array]]:
    if shared_ref is None:
        return {}
    import ray

    key = shared_ref.hex() if hasattr(shared_ref, "hex") else str(id(shared_ref))
    if key not in _WORKER_CACHE:
        _tune_worker_memory()
        _WORKER_CACHE.clear()  # at most one broadcast generation per worker
        _WORKER_CACHE[key] = ray.get(shared_ref)
    return _WORKER_CACHE[key]


def _encode_task(
    batch: pa.Table,
    out_dir: str,
    sort_keys: tuple[str, ...] | None,
    shared_ref: Any,
    columns: list[str] | None,
) -> pa.Table:
    _tune_worker_memory()
    shared = _resolve_shared(shared_ref)
    records = [
        encode_partition_item(item, out_dir, sort_keys, shared, columns)
        for item in batch.to_pylist()
    ]
    return pa.Table.from_pylist(records)


class EncodePartition:
    """Actor-pool stage: reads one fragment chunk, sorts, encodes, writes.

    Stateful setup (shared dictionaries fetched from the object store, sort
    key resolution) happens once per actor in ``__init__``; each ``__call__``
    handles a batch of work items and returns their lineage records.
    """

    def __init__(
        self,
        out_dir: str,
        sort_keys: tuple[str, ...] | None = ORDER_KEY,
        shared_ref: Any = None,
        columns: list[str] | None = None,
    ):
        import ray

        self.out_dir = out_dir
        self.sort_keys = sort_keys
        self.columns = columns
        self.shared: dict[str, tuple[str, pa.Array]] = (
            ray.get(shared_ref) if shared_ref is not None else {}
        )
        _tune_worker_memory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        records = [
            encode_partition_item(item, self.out_dir, self.sort_keys, self.shared, self.columns)
            for item in batch.to_pylist()
        ]
        return pa.Table.from_pylist(records)


def encode_dataset(
    ds,
    out_dir: str,
    *,
    sort_keys: tuple[str, ...] | None = ORDER_KEY,
    shared: dict[str, tuple[str, pa.Array]] | None = None,
    target_rows: int = DEFAULT_TARGET_ROWS,
) -> dict[str, Any]:
    """Streaming encode of an in-memory/lazy ``ray.data.Dataset``.

    For pipelines whose input is already a Dataset (e.g. after
    ``stages.layout.hash_partition_sort`` or any upstream transform): each
    batch becomes one content-addressed segment written by the map task
    itself, so the whole pipeline streams with backpressure and nothing
    materializes on the driver. Segment identity is the payload digest plus
    call-time randomness (``_block_salt``), so byte-identical blocks keep
    distinct segments — multiset semantics hold; resume-by-skipping needs
    the deterministic file-driven planner (``encode_files``) — use that for
    restartable bulk jobs. Returns the manifest.
    """
    import glob as _glob

    import ray

    os.makedirs(out_dir, exist_ok=True)
    # uncommit FIRST so no reader ever holds a manifest pointing at files
    # the clear below is deleting; not resumable: a previous run's segments
    # must not leak into this manifest
    lin.uncommit_manifest(out_dir)
    for stale in _glob.glob(os.path.join(out_dir, "part-*.seg")):
        os.unlink(stale)
    shared = shared or {}
    shared_ref = ray.put(shared) if shared else None

    _summary_schema = pa.schema(
        [
            ("record", pa.string()),
        ]
    )

    def encode_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _summary_schema.empty_table()
        _tune_worker_memory()
        sh = _resolve_shared(shared_ref)
        table = batch
        if sort_keys:
            keys = [k for k in sort_keys if k in table.column_names]
            if keys:
                table = table.sort_by([(k, "ascending") for k in keys])
        header, payload = seg.encode_table(table, sh)
        digest = seg.sha256_hex(payload)
        # segment identity = payload digest + call-time randomness (see
        # _block_salt for why module-state salts silently collide here)
        salt = _block_salt()
        uniq = seg.sha256_hex(payload + salt)
        record = lin.lineage_record(
            part_id=int(uniq[:15], 16),
            input_fragment=f"dataset-block:{uniq}",
            row_range=(0, table.num_rows),
            n_rows=table.num_rows,
            raw_bytes=table.nbytes,
            encoded_bytes=len(payload),
            columns=header["columns"],
            payload_sha256=digest,
        )
        path = os.path.join(out_dir, f"part-{uniq}.seg")
        final_hdr = seg.write_segment(path, header, payload, record)
        # the FULL lineage record (incl. the file stamp write_segment adds)
        # travels back in the summary stream so the manifest is built from
        # exactly this run's blocks — never a dir re-scan, which could pick
        # up a stray segment written by an orphaned worker of a killed
        # previous run
        return pa.table(
            {"record": pa.array([json.dumps(final_hdr["lineage"])], pa.string())}
        )

    from fhirflat_ray.functions.util import collect_small_table

    # consume the summary stream columnar (one tiny row per block; row-wise
    # take_all converts through Python dicts at ~1k rows/s, which matters
    # at 100k+ partitions)
    summary = collect_small_table(
        ds.map_batches(
            encode_block, batch_size=target_rows, batch_format="pyarrow", num_cpus=1
        )
    )
    records = (
        [json.loads(s) for s in summary["record"].to_pylist()]
        if summary.num_rows
        else []
    )
    return lin.write_manifest(
        out_dir,
        records,
        extra={"source": "dataset", "sort_keys": list(sort_keys) if sort_keys else None},
    )


def compact_segments(
    seg_dir: str,
    out_dir: str,
    *,
    target_rows: int = DEFAULT_TARGET_ROWS,
    sort_keys: tuple[str, ...] | None = ORDER_KEY,
) -> dict[str, Any]:
    """Merge many small segments into target-sized ones (the small-file
    compaction a long-running ingest needs): streaming decode → re-sort →
    streaming re-encode. Compression usually improves because larger
    partitions give the dictionaries and run-length codecs more context."""
    from fhirflat_ray.pipelines.decode import decode_dataset

    if os.path.abspath(seg_dir) == os.path.abspath(out_dir):
        raise ValueError(
            "compact_segments cannot write into its own source dir: "
            "encode_dataset clears part-*.seg in out_dir before the lazy "
            "decode executes"
        )
    return encode_dataset(
        decode_dataset(seg_dir), out_dir, sort_keys=sort_keys, target_rows=target_rows
    )


def compact_small_segments(
    seg_dir: str,
    *,
    min_rows: int | None = None,
    target_rows: int | None = None,
) -> dict[str, Any]:
    """Size-tiered IN-PLACE compaction — the lakehouse small-file pass:
    rewrite ONLY the undersized segments (``n_rows < min_rows``; default
    half the target) into target-sized content-addressed ones, leaving
    every healthy segment untouched. A long-running ingest's appends
    accumulate small segments; ``compact_segments`` rewrites the whole
    table, this pays only for the fragmentation.

    Commit model — unlike the other mutations this NEVER uncommits: new
    segments land first (content-addressed names, invisible to committed
    readers — the manifest is the truth), ONE atomic manifest write swaps
    small partitions out and new ones in, then the old files are GC'd
    (:func:`~fhirflat_ray.state.lineage.gc_orphan_segments`). A crash at
    any point leaves a committed, consistent table plus unreferenced
    files; the entry sweep of the next run removes them. Readers stay
    consistent for the entire compaction.

    Rows re-encode in their STORED form — pending schema evolution is
    neither applied nor disturbed (the op-log carries forward; the new
    segments are as unmaterialized as the ones they replace)."""
    from fhirflat_ray.pipelines.decode import _decode_paths
    from fhirflat_ray.pipelines.merge import _append_segments, _shared_for_encode
    from fhirflat_ray.state.lineage import gc_orphan_segments

    manifest = lin.read_manifest(seg_dir)
    if manifest is None:
        raise FileNotFoundError(
            f"no committed manifest under {seg_dir!r} — compact_small_segments "
            "requires a committed table (the manifest is its commit model)"
        )
    gc_orphan_segments(seg_dir)  # finish a crashed prior run's GC first
    target = target_rows or DEFAULT_TARGET_ROWS
    if min_rows is None:
        min_rows = target // 2

    parts = manifest["partitions"]
    small = [r for r in parts if r["n_rows"] < min_rows]
    if len(small) < 2:
        return manifest  # nothing to merge — zero bytes moved

    def path_of(r: dict[str, Any]) -> str:
        return (
            os.path.join(seg_dir, r["file"])
            if "file" in r
            else lin.segment_path(seg_dir, r["part_id"])
        )

    keep = [r for r in parts if r["n_rows"] >= min_rows]
    sort_keys = tuple(manifest.get("sort_keys") or ()) or None
    shared = _shared_for_encode(seg_dir, manifest)
    # decode ONLY the small segments, raw stored rows (post=None: pending
    # evolution stays pending), re-encode as target-sized blocks
    ds = _decode_paths(seg_dir, [path_of(r) for r in small], None, None, False, "tasks")
    new_records = _append_segments(
        ds, seg_dir, sort_keys, shared, target_rows=target, tag="compact-small"
    )
    carried = {
        k: manifest[k]
        for k in ("source", "sort_keys", "shared_dicts", "schema_evolution")
        if k in manifest
    }
    carried["compacted_small"] = len(small)
    refolded = lin.write_manifest(seg_dir, keep + new_records, extra=carried)
    gc_orphan_segments(seg_dir)  # the swapped-out small files
    return refolded


def encode_files(
    input_paths: list[str] | str,
    out_dir: str,
    *,
    resume: bool = False,
    sort_keys: tuple[str, ...] | None = ORDER_KEY,
    shared_dict_columns: list[str] | None = None,
    target_rows: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    columns: list[str] | None = None,
    compute: str = "tasks",
) -> dict[str, Any]:
    """Run the encode job; returns the manifest.

    ``resume=True`` consults existing durable segments and skips their
    partitions (FIXTURES.md F5 semantics).

    ``target_rows=None`` (default) adapts the partition size to the input:
    ``DEFAULT_TARGET_ROWS`` normally, smaller when the whole input would
    otherwise yield fewer than ~2 partitions per cluster CPU (a small job
    on a wide cluster must still fan out — the same size-by-data,
    floor-by-cluster rule as ``queries._join_partitions``; partitions are
    also the DECODE parallelism unit, so an 8-partition segment set caps
    every later scan at 8 tasks). The adaptive plan depends on the cluster
    CPU count — pass an explicit ``target_rows`` for resumable jobs that
    must produce identical partition ids across differently-sized
    clusters.

    ``compute``: "tasks" (default) runs the encode as stateless map tasks
    with a worker-local broadcast cache — Ray reuses task worker processes
    across dataset executions, so repeated jobs hit warm workers;
    "actors" uses the ``EncodePartition`` actor pool (state in ``__init__``),
    the right shape when per-worker state is heavy (giant symbol tables).
    Both paths share ``encode_partition_item`` and are byte-identical.
    """
    import ray
    import ray.data as rd

    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            input_paths = sorted(
                os.path.join(input_paths, f)
                for f in os.listdir(input_paths)
                if f.endswith(".parquet")
            )
        else:
            input_paths = [input_paths]

    os.makedirs(out_dir, exist_ok=True)
    metas = None
    if target_rows is None:
        # resume must replan with the SAME target the interrupted run used —
        # an adaptively re-derived target (different cluster width, Ray not
        # yet initialized) would shift every partition id and the stray-
        # segment cleanup below would discard all completed durable work
        prior = lin.read_manifest(out_dir) if resume else None
        if prior and prior.get("target_rows"):
            target_rows = int(prior["target_rows"])
        else:
            metas = {p: pq.ParquetFile(p).metadata for p in input_paths}
            total_rows = sum(m.num_rows for m in metas.values())
            ncpu = (
                max(1, int(ray.cluster_resources().get("CPU", 8)))
                if ray.is_initialized()
                else 8
            )
            target_rows = min(
                DEFAULT_TARGET_ROWS, max(MIN_TARGET_ROWS, total_rows // (2 * ncpu))
            )
    items = plan_partitions(input_paths, target_rows, metas=metas)

    # the directory is uncommitted for the duration of the rewrite: the old
    # manifest (already consumed above for target_rows) would hide this
    # run's new segments from every header scan and point readers at a
    # half-rewritten set. write_manifest below is the new commit point.
    # An EMPTY plan (typo'd/missing input) keeps the committed manifest —
    # same never-destroy-durable-work rule as the stray cleanup below.
    if items:
        lin.uncommit_manifest(out_dir)

    done_map = lin.completed_partitions(out_dir) if resume else {}
    # skip only when BOTH the id and the input fragment (path + row-group
    # span + file size/mtime) match — an input set that changed since the
    # interrupted run re-encodes shifted or rewritten partitions
    done = {
        it["part_id"]
        for it in items
        if done_map.get(it["part_id"]) == fragment_id(it)
    }
    todo = [it for it in items if it["part_id"] not in done]

    # remove stray segments from a previous plan (shrunken/changed input) so
    # decode never reads rows that are no longer part of this job; an EMPTY
    # plan (typo'd/missing input) deletes nothing — never destroy durable
    # work on a bad invocation
    if items:
        planned_paths = {lin.segment_path(out_dir, it["part_id"]) for it in items}
        import glob as _glob

        for stray in _glob.glob(os.path.join(out_dir, "part-*.seg")):
            if stray not in planned_paths:
                os.unlink(stray)

    shared = (
        build_shared_dicts(input_paths, shared_dict_columns, out_dir)
        if shared_dict_columns
        else {}
    )
    shared_ref = ray.put(shared) if shared else None

    if todo:
        work = rd.from_items(todo)
        if compute == "tasks":
            result = work.map_batches(
                _encode_task,
                fn_kwargs={
                    "out_dir": out_dir,
                    "sort_keys": sort_keys,
                    "shared_ref": shared_ref,
                    "columns": columns,
                },
                batch_size=1,
                batch_format="pyarrow",
                num_cpus=1,
            )
        else:
            if concurrency is None:
                # FIXED pool size (not autoscaling): with a short work-list
                # the autoscaler never scales past 1-2 actors and serializes
                # the per-worker cold start; a fixed pool spawns up front
                concurrency = max(
                    1, min(len(todo), int(ray.cluster_resources().get("CPU", 4)))
                )
            result = work.map_batches(
                EncodePartition,
                fn_constructor_kwargs={
                    "out_dir": out_dir,
                    "sort_keys": sort_keys,
                    "shared_ref": shared_ref,
                    "columns": columns,
                },
                batch_size=1,
                batch_format="pyarrow",
                concurrency=concurrency,
                num_cpus=1,
            )
        # the reduce side is one tiny row per partition — collect columnar
        from fhirflat_ray.functions.util import collect_small_table

        collect_small_table(result)

    # restrict the fold to the plan's ids so a stray segment written by an
    # orphaned worker of a killed previous run cannot enter the manifest
    # (an empty plan refolds every durable segment instead — see above)
    records = lin.collect_lineage(
        out_dir, part_ids={it["part_id"] for it in items} if items else None
    )
    manifest = lin.write_manifest(
        out_dir,
        records,
        extra={
            "input_paths": list(input_paths),
            "sort_keys": list(sort_keys) if sort_keys else None,
            "shared_dicts": {k: v[0] for k, v in shared.items()},
            "resumed": bool(resume and done),
            "skipped_partitions": sorted(done),
            # resume replans with this exact target (see planning above)
            "target_rows": int(target_rows),
        },
    )
    return manifest
