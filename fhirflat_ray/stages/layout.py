"""Explicit layout control: hash-partition by conversation + in-partition sort.

The file-driven encode pipeline usually gets conversation locality for free
(conversations are contiguous in the input); this stage is the explicit
repartitioning path for inputs that aren't laid out that way (the north-rule
"explicit repartitioning to break conversation-level skew"):

- ``hash_partition_sort``: bucket = hash(conv_id) % n_buckets, one shuffle on
  the bucket key, each bucket sorted by ``(conv_id, turn_idx)`` — restoring
  the run-maximizing order RLE/dictionary need (SURVEY.md §2.6).
- Skew: a conversation bigger than a bucket is the *input planner's* problem
  (turn-range chunking in ``plan_partitions``); buckets only need conv-level
  balance, which the hash provides. Outlier conversations can be salted by
  raising ``salt_turns`` — the bucket key then includes ``turn_idx //
  salt_turns`` so one giant conversation spreads over several buckets while
  keeping turn ranges contiguous (ordering invariant preserved per chunk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket_of(conv_ids: pa.Array, n_buckets: int, turn_idx=None, salt_turns: int | None = None) -> np.ndarray:
    import pandas.util as pdu

    h = pdu.hash_array(conv_ids.to_numpy(zero_copy_only=False).astype(object))
    if salt_turns and turn_idx is not None:
        chunk = (turn_idx.to_numpy(zero_copy_only=False) // salt_turns).astype(np.uint64)
        h = h ^ (chunk * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(n_buckets)).astype(np.int32)


def hash_partition_sort(
    ds,
    n_buckets: int = 64,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    salt_turns: int | None = None,
):
    """Shuffle rows so each output group holds whole (or salted-chunked)
    conversations, sorted by (conv, turn). One all-to-all on the bucket key."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = _bucket_of(
            batch[conv_col].combine_chunks(),
            n_buckets,
            batch[turn_col].combine_chunks() if salt_turns else None,
            salt_turns,
        )
        return batch.append_column("_bucket", pa.array(b, pa.int32()))

    def sort_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, turn_col], kind="mergesort")
        return g.drop(columns="_bucket")

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(sort_group, batch_format="pandas")
    )
