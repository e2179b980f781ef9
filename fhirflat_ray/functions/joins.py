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


def _dataset_fields(ds) -> list[pa.Field]:
    sch = ds.schema()
    fields = []
    for n, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            t = pa.from_numpy_dtype(t)
        fields.append(pa.field(n, t))
    return fields


def hash_anti_join(ds, keys_ds, on: str, right_on: str, num_partitions: int = 16):
    """Distributed anti join: rows of ``ds`` whose ``on`` key does NOT appear
    in ``keys_ds[right_on]``.

    Built on ``Dataset.join`` (hash-partitioned left-outer) + a match-marker
    filter, so neither side materializes on the driver — the scale path when
    the key set is too large to broadcast (contrast
    :func:`broadcast_semi_join`)."""
    import pyarrow.compute as pc

    def mark(batch: pa.Table) -> pa.Table:
        out = pa.table({right_on: pc.unique(batch[right_on])})
        return out.append_column(
            "__match", pa.array(np.ones(out.num_rows, dtype=np.int8))
        )

    marked = keys_ds.map_batches(mark, batch_format="pyarrow")
    # pre-dedupe keys so the left-outer join cannot fan out left rows
    def first_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    marked = marked.groupby(right_on).map_groups(first_key, batch_format="pandas")

    # groupby can emit schema-less empty blocks (e.g. when the key set is
    # empty or a partition holds no groups); the hash join requires every
    # right-side block to carry the key column, so pin the schema
    key_field = next(
        f for f in _dataset_fields(keys_ds) if f.name == right_on
    )
    target = pa.schema([key_field, pa.field("__match", pa.int8())])

    def coerce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or right_on not in batch.column_names:
            return target.empty_table()
        return pa.table(
            {
                right_on: batch[right_on].cast(key_field.type),
                "__match": batch["__match"].cast(pa.int8()),
            }
        )

    marked = marked.map_batches(coerce, batch_format="pyarrow")
    # groupby pipelines can leave SCHEMA-LESS empty blocks in the stream
    # (they bypass map stages untouched); a right-side join partition built
    # only from those blocks makes acero fail with "no match for FieldRef".
    # repartition() concatenates blocks and drops the degenerate empties —
    # cheap here, the marked set is keys-only.
    marked = marked.repartition(max(2, num_partitions // 2))
    joined = ds.join(
        marked,
        "left_outer",
        num_partitions,
        on=(on,),
        right_on=(right_on,),
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        mask = pc.is_null(batch["__match"])
        drop = [c for c in ("__match", right_on) if c in batch.column_names and c != on]
        return batch.filter(mask).drop_columns(drop)

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")


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
