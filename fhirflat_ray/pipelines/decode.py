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
    return sorted(glob.glob(os.path.join(seg_dir, "part-*.seg")))


def decode_dataset(
    seg_dir: str,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    verify_checksums: bool = False,
    compute: str = "tasks",
):
    """Lazy Dataset over all segments in ``seg_dir``.

    ``compute="tasks"`` (default) decodes in stateless tasks with a
    worker-local dictionary-store cache; ``"actors"`` uses the
    ``DecodeSegment`` pool. Identical output either way."""
    import ray
    import ray.data as rd

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")

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


def decode_to_parquet(seg_dir: str, dest_dir: str, columns: list[str] | None = None) -> None:
    """Stream segments back out as a partitioned parquet directory."""
    decode_dataset(seg_dir, columns).write_parquet(dest_dir)
