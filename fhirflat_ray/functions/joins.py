"""Join operators the Dataset API lacks, composed Ray-Data-first.

- ``broadcast_asof_join``: as-of (latest right row with right_ts <= left_ts
  per key) with the right side broadcast once via ``ray.put`` and a
  ``pd.merge_asof`` per batch — no shuffle. Partitioning assumption: the
  right side fits in worker memory (dimension-table scale). For two large
  sides, bucket both by ``hash(key) % B``, sort within buckets, and run the
  same merge per bucket pair (documented scale path, see ray guide "As-of /
  range join").
- ``broadcast_semi_join`` / ``broadcast_anti_join``: key-set broadcast +
  vectorized membership filter per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_asof_join(
    ds,
    right: pd.DataFrame,
    left_on: str,
    right_on: str,
    by_left: str,
    by_right: str,
    right_value_cols: list[str],
):
    """Left as-of join; adds ``right_value_cols`` from the matched row."""
    import ray

    right = right.sort_values(right_on, kind="mergesort").reset_index(drop=True)
    right_ref = ray.put(right)

    class AsofJoin:
        def __init__(self, ref):
            self.right = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            left = batch.to_pandas()
            order = np.argsort(left[left_on].to_numpy(), kind="stable")
            left_sorted = left.iloc[order]
            right = self.right[[by_right, right_on] + right_value_cols]
            # unify datetime resolutions (merge_asof requires identical dtypes)
            ldt, rdt = left_sorted[left_on].dtype, right[right_on].dtype
            if ldt != rdt:
                right = right.assign(**{right_on: right[right_on].astype(ldt)})
                right = right.sort_values(right_on, kind="mergesort")
            merged = pd.merge_asof(
                left_sorted,
                right,
                left_on=left_on,
                right_on=right_on,
                left_by=by_left,
                right_by=by_right,
                direction="backward",
            )
            # restore input order so downstream ordering is untouched
            merged = merged.iloc[np.argsort(order, kind="stable")]
            return pa.Table.from_pandas(merged, preserve_index=False)

    return ds.map_batches(
        AsofJoin,
        fn_constructor_kwargs={"ref": right_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def broadcast_semi_join(ds, keys, column: str, anti: bool = False):
    """Keep rows whose ``column`` is (not, for anti) in the broadcast key set."""
    import ray

    arr = np.sort(np.asarray(list(keys), dtype=np.int64))
    ref = ray.put(arr)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        vals = batch[column].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, vals), 0, len(ks) - 1)
        hit = ks[pos] == vals
        mask = ~hit if anti else hit
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")
