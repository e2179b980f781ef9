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


# ------------------------------------------------------- z-order clustering


def _column_ranges(ds, cols: list[str]) -> dict[str, tuple[int, int]]:
    """Global (min, max) per cluster column — one columns-pruned pass of
    per-batch partials merged on the driver (bytes moved: 2 int64 per
    column per block)."""
    from fhirflat_ray.functions.util import collect_small_table

    def partial(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {}
        for c in cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            v = v.view(np.int64) if v.dtype.kind == "M" else v.astype(np.int64)
            out[f"{c}__min"] = [int(v.min())] if len(v) else [np.iinfo(np.int64).max]
            out[f"{c}__max"] = [int(v.max())] if len(v) else [np.iinfo(np.int64).min]
        return pa.table(out)

    import pyarrow.compute as pc

    t = collect_small_table(ds.map_batches(partial, batch_format="pyarrow"))
    return {
        c: (
            int(pc.min(t[f"{c}__min"]).as_py()),
            int(pc.max(t[f"{c}__max"]).as_py()),
        )
        for c in cols
    }


def zorder_key(
    arrays: list[np.ndarray], ranges: list[tuple[int, int]], bits: int | None = None
) -> np.ndarray:
    """Interleaved-bit (Morton) key over up to 4 int64 columns.

    Each column is affinely scaled to ``bits``-bit resolution over its
    global range, then bits interleave round-robin — so the sorted key
    visits the k-dimensional grid in Z curve order and range-partitioned
    segments get TIGHT zone rectangles on EVERY cluster column, not just
    the first sort key (the multi-dimensional analogue of sorting;
    cf. Morton 1966, and the CLUSTER BY of modern lakehouse engines)."""
    k = len(arrays)
    if not 1 <= k <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    if bits is None:
        bits = 63 // k
    out = np.zeros(len(arrays[0]), dtype=np.int64)
    scaled = []
    for a, (lo, hi) in zip(arrays, ranges):
        a = a.view(np.int64) if a.dtype.kind == "M" else a.astype(np.int64)
        span = max(1, hi - lo)
        # int64-safe affine scale to [0, 2^bits): (a-lo) ≤ span ≤ 2^63-1,
        # so scale via float128-free integer math on the shifted value
        q = ((a - lo).astype(np.float64) / span * ((1 << bits) - 1)).astype(np.int64)
        scaled.append(np.clip(q, 0, (1 << bits) - 1))
    for b in range(bits):
        for j, q in enumerate(scaled):
            out |= ((q >> b) & 1) << (b * k + j)
    return out


def cluster_zorder(
    ds,
    out_dir: str,
    cols: list[str],
    *,
    target_rows: int = 64 * 1024,
    shared: dict | None = None,
    num_partitions: int | None = None,
):
    """CLUSTER BY z-order: re-layout ``ds`` so segment zone maps prune on
    ANY of ``cols``, then encode. One global all-to-all sort on the Morton
    key — the explicit one-time layout cost every warehouse CLUSTER BY
    pays; afterwards every zone-pruned read amortizes it. Returns the
    manifest from :func:`fhirflat_ray.pipelines.encode.encode_dataset`."""
    from fhirflat_ray.pipelines.encode import encode_dataset

    ranges = _column_ranges(ds, cols)
    rng = [ranges[c] for c in cols]

    def add_key(batch: pa.Table) -> pa.Table:
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in cols]
        return batch.append_column("__zkey", pa.array(zorder_key(arrs, rng)))

    clustered = ds.map_batches(add_key, batch_format="pyarrow").sort("__zkey")
    if num_partitions is not None:
        # order-preserving rebalance: sort's sampled range boundaries give
        # ragged blocks, and every block tail becomes a short segment; an
        # explicit even split makes segment boundaries deterministic
        clustered = clustered.repartition(num_partitions)
    clustered = clustered.drop_columns(["__zkey"])
    return encode_dataset(
        clustered, out_dir, sort_keys=None, shared=shared, target_rows=target_rows
    )
