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


class DecodeSegment:
    """Actor-pool stage: one encoded segment blob → decoded Arrow rows."""

    def __init__(self, seg_dir: str, columns: list[str] | None = None, verify_checksums: bool = False):
        self.dict_store = lin.load_dict_store(seg_dir)
        self.columns = columns
        self.verify_checksums = verify_checksums

    def __call__(self, batch: dict[str, Any]) -> pa.Table:
        tables = []
        for blob in batch["bytes"]:
            tables.append(
                seg.read_segment(
                    bytes(blob),
                    dict_store=self.dict_store,
                    columns=self.columns,
                    verify_checksums=self.verify_checksums,
                )
            )
        return pa.concat_tables(tables)


def segment_paths(seg_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(seg_dir, "part-*.seg")))


def decode_dataset(
    seg_dir: str,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    verify_checksums: bool = False,
):
    """Lazy Dataset over all segments in ``seg_dir``."""
    import ray
    import ray.data as rd

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")
    if concurrency is None:
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4))))
    ds = rd.read_binary_files(paths)
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
