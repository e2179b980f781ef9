"""Join operators the Dataset API lacks, composed Ray-Data-first.

- ``broadcast_asof_join``: as-of (latest right row with right_ts <= left_ts
  per key) with the right side broadcast once via ``ray.put`` and a
  ``pd.merge_asof`` per batch — no shuffle. Partitioning assumption: the
  right side fits in worker memory (dimension-table scale).
- ``bucketed_asof_join``: the TWO-LARGE-SIDES path — both sides hash-bucket
  on the join key (one narrow shuffle each), one vectorized ``merge_asof``
  per bucket; nothing broadcasts or materializes.
- ``broadcast_semi_join``: key-set broadcast + vectorized membership filter
  per batch (``anti=True`` for the anti form).
- ``hash_anti_join``: distributed anti join on ``Dataset.join`` left-outer +
  match marker, for key sets too large to broadcast.
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
    direction: str = "backward",
):
    """Left as-of join; adds ``right_value_cols`` from the matched row.
    ``direction``: "backward" (latest right at or before left, the default)
    or "forward" (earliest right at or after left)."""
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
                direction=direction,
            )
            # restore input order so downstream ordering is untouched
            merged = merged.iloc[np.argsort(order, kind="stable")]
            return pa.Table.from_pandas(merged, preserve_index=False)

    from fhirflat_ray.functions.util import worker_cached_stage

    return ds.map_batches(
        worker_cached_stage(AsofJoin, ref=right_ref), batch_format="pyarrow"
    )


def _dataset_fields(ds) -> list[pa.Field]:
    sch = ds.schema()
    fields = []
    for n, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            # pandas-block datasets report numpy dtypes; object dtype is
            # how pandas stores strings (from_numpy_dtype rejects it)
            t = pa.string() if np.dtype(t) == np.dtype(object) else pa.from_numpy_dtype(t)
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

    from fhirflat_ray.functions.util import distinct_rows

    marked = keys_ds.map_batches(mark, batch_format="pyarrow")
    # pre-dedupe keys so the left-outer join cannot fan out left rows
    # (bucketed distinct: Python per bucket, not per key)
    marked = distinct_rows(marked, [right_on])

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


def bucketed_asof_join(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    by_left: str,
    by_right: str,
    right_value_cols: list[str],
    n_buckets: int | None = None,
    dedupe_right: bool = False,
):
    """As-of join for TWO LARGE SIDES (the scale path broadcast_asof_join
    documents): hash-bucket both sides on the join key — one narrow shuffle
    each, no side ever materializes — then run ONE vectorized
    ``pd.merge_asof(by=key)`` per bucket, which handles every key in the
    bucket in a single C pass.

    ``dedupe_right=True`` drops duplicate ``(by_right, right_on)`` rows on
    the right side INSIDE the bucket kernel. Because hash co-partitioning
    already lands every row of a key in one bucket, this is exactly
    equivalent to a global distinct over those two columns — but it costs
    zero extra shuffles, where a ``distinct_rows`` pre-pass would exchange
    the whole right table a second time.

    Partitioning assumption: all rows of one key land in one bucket (hash
    co-partitioning), so a single key's rows must fit in a worker — the
    same assumption any keyed as-of join makes. Bucket count defaults to
    4x CPUs; raise it for skewed key distributions.

    Left and right column names must be disjoint apart from the join
    semantics (standard as-of layout)."""
    import pandas.util as pdu

    if n_buckets is None:
        import ray

        n_buckets = max(4, min(512, int(ray.cluster_resources().get("CPU", 4)) * 4))

    left_fields = _dataset_fields(left_ds)
    left_cols = [f.name for f in left_fields]
    right_cols = [by_right, right_on] + list(right_value_cols)
    right_fields_all = {f.name: f for f in _dataset_fields(right_ds)}
    right_fields = [right_fields_all[c] for c in right_cols]
    union_fields = (
        [pa.field("__bucket", pa.int64()), pa.field("__side", pa.int8())]
        + left_fields
        + [f for f in right_fields if f.name not in left_cols]
    )
    union_schema = pa.schema(union_fields)

    def _tag(side: int, key_col: str, present: list[str]):
        def tag(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].to_numpy(zero_copy_only=False)
            if np.issubdtype(keys.dtype, np.number):
                keys = keys.astype(np.int64)
            else:
                keys = np.asarray(keys, dtype=object)
            bucket = (pdu.hash_array(keys) % np.uint64(n_buckets)).astype(np.int64)
            cols = {
                "__bucket": pa.array(bucket, pa.int64()),
                "__side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
            }
            for f in union_fields[2:]:
                if f.name in present and f.name in batch.column_names:
                    cols[f.name] = batch[f.name].cast(f.type)
                else:
                    cols[f.name] = pa.nulls(batch.num_rows, f.type)
            return pa.table(cols).cast(union_schema)

        return tag

    tagged = left_ds.map_batches(
        _tag(0, by_left, left_cols), batch_format="pyarrow"
    ).union(right_ds.map_batches(_tag(1, by_right, right_cols), batch_format="pyarrow"))

    out_value_cols = [c for c in [right_on] + list(right_value_cols) if c not in left_cols]

    out_schema = pa.schema(
        left_fields + [right_fields_all[c] for c in out_value_cols]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split sides while still Arrow: the union's null padding would
        # otherwise degrade int columns to float64 in pandas
        lmask = pc.equal(t["__side"], 0)
        left = t.filter(lmask).select(left_cols).to_pandas()
        right = t.filter(pc.invert(lmask)).select(right_cols).to_pandas()
        if len(left) == 0:
            return out_schema.empty_table()
        if len(right) == 0:
            out = pa.Table.from_pandas(left, preserve_index=False)
            for c in out_value_cols:
                out = out.append_column(
                    c, pa.nulls(out.num_rows, right_fields_all[c].type)
                )
            return out.cast(out_schema)
        left = left.sort_values(left_on, kind="mergesort")
        ldt = left[left_on].dtype
        if right[right_on].dtype != ldt:
            right = right.assign(**{right_on: right[right_on].astype(ldt)})
        if dedupe_right:
            right = right.drop_duplicates([by_right, right_on])
        right = right.sort_values(right_on, kind="mergesort")
        merged = pd.merge_asof(
            left,
            right,
            left_on=left_on,
            right_on=right_on,
            left_by=by_left,
            right_by=by_right,
            direction="backward",
        )
        return pa.Table.from_pandas(
            merged[left_cols + out_value_cols], preserve_index=False
        ).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def broadcast_semi_join(ds, keys, column: str, anti: bool = False):
    """Keep rows whose ``column`` is (not, for anti) in the broadcast key set."""
    import ray

    arr = np.sort(np.asarray(list(keys), dtype=np.int64))
    if len(arr) == 0:
        # empty key set: semi join keeps nothing, anti join keeps everything
        # (searchsorted against an empty array would index out of bounds)
        return ds if anti else ds.filter(lambda row: False)
    ref = ray.put(arr)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        vals = batch[column].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, vals), 0, len(ks) - 1)
        hit = ks[pos] == vals
        mask = ~hit if anti else hit
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_range_join(
    ds,
    intervals: pa.Table,
    ts_col: str,
    interval_id_col: str = "interval_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    max_intervals: int = 4096,
):
    """Interval (range) join of a large Dataset against a SMALL broadcast
    interval table: emit one output row per (row, interval) pair with
    ``start <= ts < end``. Intervals MAY overlap — a row matching ``d``
    intervals is emitted ``d`` times (this is what distinguishes a range
    join from an as-of join, which picks exactly one match).

    Scale shape: the interval table ships once via ``ray.put`` (no shuffle;
    map-only plan); each batch evaluates one vectorized mask per interval,
    so per-batch cost is O(n_intervals x batch_rows) vectorized — the right
    trade below ``max_intervals`` intervals. For genuinely large interval
    sets, bucket both sides on a time-range key and join per bucket (the
    ``bucketed_asof_join`` pattern); the hard cap raises loudly instead of
    silently degrading.

    ``ts_col`` must be timestamp[us] or int64 microseconds; interval bounds
    are int64 microseconds (``start_us`` inclusive, ``end_us`` exclusive).
    """
    import ray

    if intervals.num_rows > max_intervals:
        raise ValueError(
            f"broadcast_range_join: {intervals.num_rows} intervals > cap "
            f"{max_intervals}; use a bucketed time-range join instead"
        )
    ref = ray.put(
        {
            "id": intervals[interval_id_col].to_numpy(zero_copy_only=False),
            "start": intervals[start_col].to_numpy(zero_copy_only=False).astype(np.int64),
            "end": intervals[end_col].to_numpy(zero_copy_only=False).astype(np.int64),
        }
    )
    id_type = intervals.schema.field(interval_id_col).type

    def f(batch: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        ts_us = ts.to_numpy(zero_copy_only=False)
        take_idx: list[np.ndarray] = []
        out_ids: list[np.ndarray] = []
        for i in range(len(iv["id"])):
            hit = np.nonzero((ts_us >= iv["start"][i]) & (ts_us < iv["end"][i]))[0]
            if len(hit):
                take_idx.append(hit)
                out_ids.append(np.full(len(hit), i, dtype=np.int64))
        if not take_idx:
            return batch.slice(0, 0).append_column(
                interval_id_col, pa.array([], id_type)
            )
        idx = np.concatenate(take_idx)
        ids = iv["id"][np.concatenate(out_ids)]
        return batch.take(pa.array(idx)).append_column(
            interval_id_col, pa.array(ids, id_type)
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------- bloom semi join

#: distinct odd multipliers for the bloom probe family (splitmix-style
#: mixing, signed-int64 arithmetic only — unsigned numpy ops are
#: pathologically slow on some hosts)
_BLOOM_SALTS = (
    -7046029254386353131,
    -4417276706812531889,
    2545012342345697057,
    6238072747940578789,
)


def _bloom_positions(vals: np.ndarray, n_bits: int, k: int) -> list[np.ndarray]:
    """k independent bit positions per value (n_bits must be a power of 2)."""
    mask = np.int64(n_bits - 1)
    x = vals.astype(np.int64)
    out = []
    with np.errstate(over="ignore"):
        for salt in _BLOOM_SALTS[:k]:
            h = x * np.int64(salt)
            h ^= h >> np.int64(29)
            h *= np.int64(-49064778989728563)
            h ^= h >> np.int64(32)
            out.append((h & mask).astype(np.int64))
    return out


def bloom_semi_join(
    ds,
    keys_ds,
    on: str,
    right_on: str,
    n_bits: int = 1 << 20,
    k_hashes: int = 3,
    num_partitions: int = 16,
    keys_distinct: bool = False,
):
    """Semi join of a LARGE corpus against a LARGE key set via a Bloom
    pre-filter: keep rows of ``ds`` whose ``on`` appears in
    ``keys_ds[right_on]``.

    Scale shape: the key set folds to a CONSTANT-size bitmap (one packed
    per-batch partial bitmap per map task, OR-merged — here on the driver;
    on a real cluster the OR is an associative tree reduce), which ships
    once via ``ray.put``. The corpus pass is then MAP-ONLY: rows failing
    any probe bit are definite non-members and drop immediately, so the
    exact-verification hash join (Bloom false positives only) exchanges
    just the surviving candidates + the distinct keys — never the corpus.
    This is the semi-join analogue of the segment-level bloom pushdown in
    ``state/segments.py``. Integer keys only (int64-safe mixing shared
    with the probe stage)."""
    import ray

    from fhirflat_ray.functions.util import distinct_rows

    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of 2"
    assert 1 <= k_hashes <= len(_BLOOM_SALTS)

    def to_bitmap(batch: pa.Table) -> pa.Table:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        vals = batch[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        for pos in _bloom_positions(vals, n_bits, k_hashes):
            byte = (pos >> 3).astype(np.int64)
            np.bitwise_or.at(bits, byte, np.left_shift(1, (pos & 7)).astype(np.uint8))
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    from fhirflat_ray.functions.util import collect_small_table

    parts = collect_small_table(keys_ds.map_batches(to_bitmap, batch_format="pyarrow"))
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    for buf in parts["bitmap"].to_pylist():
        bitmap |= np.frombuffer(buf, dtype=np.uint8)
    ref = ray.put(bitmap)

    def prefilter(batch: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        vals = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.ones(len(vals), dtype=bool)
        for pos in _bloom_positions(vals, n_bits, k_hashes):
            bit = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & np.uint8(1)
            keep &= bit.astype(bool)
        return batch.filter(pa.array(keep))

    candidates = ds.map_batches(prefilter, batch_format="pyarrow")

    # exact verification: false positives drop in a distributed hash join
    # over the (small) candidate set and the pre-deduped key set.
    # keys_distinct=True (caller guarantees the key column is unique, e.g.
    # a primary key) skips the distinct shuffle entirely — the key set
    # feeds the join straight from the pruned read.
    keys = keys_ds.select_columns([right_on])
    if not keys_distinct:
        keys = distinct_rows(keys, [right_on])
    key_field = next(f for f in _dataset_fields(keys_ds) if f.name == right_on)
    target = pa.schema([key_field])

    def coerce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or right_on not in batch.column_names:
            return target.empty_table()
        return pa.table({right_on: batch[right_on].cast(key_field.type)})

    keys = keys.map_batches(coerce, batch_format="pyarrow").repartition(
        max(2, num_partitions // 2)
    )
    joined = candidates.join(
        keys, "inner", num_partitions, on=(on,), right_on=(right_on,)
    )
    drop = [right_on] if right_on != on else []

    def clean(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([c for c in drop if c in batch.column_names])

    return joined.map_batches(clean, batch_format="pyarrow")


# ------------------------------------------------- bucketed range join


def bucketed_range_join(
    ds,
    intervals_ds,
    ts_col: str,
    bucket_width_us: int,
    interval_id_col: str = "interval_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    n_buckets_cap: int = 1 << 20,
    chunk_rows: int = 4096,
):
    """Interval (range) join for TWO LARGE SIDES: emit one row per
    (event, interval) pair with ``start <= ts < end``, co-partitioning
    both sides on a TIME bucket (``us // bucket_width_us``) instead of
    broadcasting the interval table (:func:`broadcast_range_join`'s cap).

    Scale shape: events take one narrow shuffle on their own time bucket;
    each interval replicates only to the buckets its span covers (fan-out
    = span / bucket_width — pick the width near the typical interval
    length so replication stays O(1) per interval). Every pair meets in
    exactly one bucket (the event's), so no post-dedup is needed. The
    per-bucket kernel is a chunked vectorized mask (chunk_rows x
    intervals-in-bucket boolean block), never a Python loop over rows.

    Partitioning assumption: one time bucket's events + overlapping
    intervals fit in a worker — the same assumption any time-sliced join
    makes; widen or narrow ``bucket_width_us`` to rebalance."""
    import pandas as pd

    ev_fields = _dataset_fields(ds)
    ev_names = [f.name for f in ev_fields]
    id_field = next(
        f for f in _dataset_fields(intervals_ds) if f.name == interval_id_col
    )
    union_fields = (
        [pa.field("__bucket", pa.int64()), pa.field("__side", pa.int8())]
        + ev_fields
        + [id_field, pa.field("__start", pa.int64()), pa.field("__end", pa.int64())]
    )
    union_schema = pa.schema(union_fields)
    w = np.int64(bucket_width_us)

    def tag_events(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        ts_us = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "__bucket": pa.array(ts_us // w, pa.int64()),
            "__side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
        }
        for f in union_fields[2:]:
            if f.name in ev_names:
                cols[f.name] = batch[f.name].cast(f.type) if f.name != ts_col else batch[f.name]
            else:
                cols[f.name] = pa.nulls(batch.num_rows, f.type)
        return pa.table(cols, schema=union_schema)

    def tag_intervals(batch: pa.Table) -> pa.Table:
        start = batch[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        end = batch[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        first = start // w
        last = np.maximum(first, (end - 1) // w)
        counts = (last - first + 1).astype(np.int64)
        total = int(counts.sum())
        if total > n_buckets_cap * 64:
            raise ValueError(
                "bucketed_range_join: interval replication blow-up "
                f"({total} tagged rows from {len(start)} intervals); "
                "increase bucket_width_us"
            )
        row_idx = np.repeat(np.arange(len(start), dtype=np.int64), counts)
        # within-interval bucket ordinal: arange per group via cumsum reset
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        bucket = first[row_idx] + offs
        ids = batch[interval_id_col].take(pa.array(row_idx))
        cols = {
            "__bucket": pa.array(bucket, pa.int64()),
            "__side": pa.array(np.ones(total, dtype=np.int8)),
        }
        for f in union_fields[2:]:
            if f.name == interval_id_col:
                cols[f.name] = ids.cast(f.type)
            elif f.name == "__start":
                cols[f.name] = pa.array(start[row_idx], pa.int64())
            elif f.name == "__end":
                cols[f.name] = pa.array(end[row_idx], pa.int64())
            else:
                cols[f.name] = pa.nulls(total, f.type)
        return pa.table(cols, schema=union_schema)

    tagged = ds.map_batches(tag_events, batch_format="pyarrow").union(
        intervals_ds.map_batches(tag_intervals, batch_format="pyarrow")
    )

    out_schema = pa.schema(ev_fields + [id_field])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side"].to_numpy()
        ev = g[side == 0]
        iv = g[side == 1]
        if len(ev) == 0 or len(iv) == 0:
            return out_schema.empty_table().to_pandas()
        ts = ev[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            ts_us = ts.astype("datetime64[us]").astype(np.int64)
        else:
            ts_us = ts.astype(np.int64)
        starts = iv["__start"].to_numpy().astype(np.int64)
        ends = iv["__end"].to_numpy().astype(np.int64)
        ev_take: list[np.ndarray] = []
        iv_take: list[np.ndarray] = []
        for lo in range(0, len(ev), chunk_rows):
            t = ts_us[lo : lo + chunk_rows]
            m = (t[:, None] >= starts[None, :]) & (t[:, None] < ends[None, :])
            e_i, i_i = np.nonzero(m)
            if len(e_i):
                ev_take.append(e_i + lo)
                iv_take.append(i_i)
        if not ev_take:
            return out_schema.empty_table().to_pandas()
        e_idx = np.concatenate(ev_take)
        i_idx = np.concatenate(iv_take)
        out = ev.iloc[e_idx][ev_names].reset_index(drop=True)
        # the union carries nulls on the event side, so pandas widened the
        # id column to float64 — restore the declared arrow type
        ids = iv.iloc[i_idx][interval_id_col].to_numpy()
        out[interval_id_col] = ids.astype(id_field.type.to_pandas_dtype())
        return out

    return tagged.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


# ------------------------------------------------- salted skew-robust join


def salted_hash_join(
    fact_ds,
    dim_ds,
    on: str,
    right_on: str,
    salt_source: str,
    num_partitions: int,
    n_salts: int = 16,
    hot_k: int = 64,
):
    """Distributed inner hash join that survives HOT KEYS on the fact side.

    A plain hash join routes every row of a key to one partition; a zipf
    key owning 20% of the corpus turns one aggregator into the whole job's
    critical path. The classic mitigation (public Spark/Flink lore): find
    the heaviest keys with a narrow count pre-pass, then split each hot
    key's fact rows across ``n_salts`` sub-partitions (salt = deterministic
    hash of ``salt_source``, so reruns route identically) while the DIM row
    for that key replicates ``n_salts`` ways — cold keys pay nothing
    (salt 0, one dim copy). The join key becomes ``(key, salt)``, so hot
    keys spread over ``n_salts`` aggregators and the result is row-for-row
    identical to the unsalted join.

    Scale notes: the hot-key probe is a per-batch count partial +
    ``streaming_topk`` (bounded at ``hot_k`` keys broadcast); dim-side
    amplification is ``hot_k * (n_salts - 1)`` extra rows total. Inner
    join only (outer variants would need null-salt care)."""
    import ray

    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.util import agg_select, streaming_topk

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.select([on]).group_by([on]).aggregate([([], "count_all")])
        return agg_select(g, {on: "k", "count_all": "n"})

    # topk over partials overcounts nothing: a key's total is split across
    # partial rows, but any key hot enough to matter dominates single
    # partials too; correctness never depends on WHICH keys get salted
    top = streaming_topk(
        fact_ds.map_batches(count_partial, batch_format="pyarrow"),
        ["n", "k"],
        hot_k,
        descending=[True, False],
    )
    hot = np.sort(top["k"].to_numpy(zero_copy_only=False).astype(np.int64))
    hot_ref = ray.put(hot)

    def salt_fact(b: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        keys = b[on].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(hk) == 0:  # empty fact side -> empty probe -> nothing is hot
            return b.append_column(
                "__salt", pa.array(np.zeros(len(keys), dtype=np.int64), pa.int64())
            )
        pos = np.searchsorted(hk, keys)
        is_hot = (pos < len(hk)) & (hk[np.clip(pos, 0, max(len(hk) - 1, 0))] == keys)
        src = b[salt_source].to_numpy(zero_copy_only=False).astype(np.int64)
        salt = np.where(is_hot, hash32(src) % n_salts, 0).astype(np.int64)
        return b.append_column("__salt", pa.array(salt, pa.int64()))

    def replicate_dim(b: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        keys = b[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(hk) == 0:
            return b.append_column(
                "__salt", pa.array(np.zeros(len(keys), dtype=np.int64), pa.int64())
            )
        pos = np.searchsorted(hk, keys)
        is_hot = (pos < len(hk)) & (hk[np.clip(pos, 0, max(len(hk) - 1, 0))] == keys)
        reps = np.where(is_hot, n_salts, 1).astype(np.int64)
        idx = np.repeat(np.arange(len(keys), dtype=np.int64), reps)
        out = b.take(pa.array(idx, pa.int64()))
        # salt runs 0..reps-1 within each replicated row
        starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
        salt = np.arange(len(idx), dtype=np.int64) - starts[idx]
        return out.append_column("__salt", pa.array(salt, pa.int64()))

    fact = fact_ds.map_batches(salt_fact, batch_format="pyarrow")
    dim = dim_ds.map_batches(replicate_dim, batch_format="pyarrow")
    joined = fact.join(
        dim,
        "inner",
        num_partitions,
        on=(on, "__salt"),
        right_on=(right_on, "__salt"),
    )
    return joined.map_batches(
        lambda b: b.drop_columns(
            [c for c in ("__salt", "__salt_1") if c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def hybrid_semi_join(
    ds,
    keys_ds,
    on: str,
    right_on: str,
    num_partitions: int,
    broadcast_key_budget: int = 2_000_000,
):
    """Semi join that picks its physical plan by KEY-SET size (the
    near_dedup hybrid discipline): a bounded key set collects once and
    filters map-only (broadcast + searchsorted — zero exchanges); past the
    budget the Bloom-prefiltered distributed path runs (constant-size
    bitmap broadcast + exact-verify hash join over survivors). Both plans
    return exactly the rows of ``ds`` whose ``on`` appears in
    ``keys_ds[right_on]``."""
    import numpy as np

    from fhirflat_ray.functions.util import collect_small_table

    # pin the key pipeline once: count() then collect/bitmap would
    # otherwise re-execute the upstream read+filter per pass
    keys_ds = keys_ds.materialize()
    n_keys = keys_ds.count()
    if n_keys <= broadcast_key_budget:
        t = collect_small_table(keys_ds.select_columns([right_on]))
        keys = np.unique(t[right_on].to_numpy(zero_copy_only=False).astype(np.int64))
        return broadcast_semi_join(ds, keys, on)
    return bloom_semi_join(
        ds, keys_ds, on=on, right_on=right_on, num_partitions=num_partitions
    )
