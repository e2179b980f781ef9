"""Windowed aggregates over ordered event streams (SURVEY.md §2.9).

Ray Data has no event-time windows; the engine expresses them as
(a) tumbling windows = a computed window key + Arrow partial aggregate per
batch + bucketed vectorized combine, and (b) session windows = coarse-bucket
shuffle on the key with ONE vectorized sessionization pass per bucket
(boundary = gap exceeded OR key change under (key, ts, ...) order) — Python
cost is per bucket in both, never per key or per row. The oracle SQL uses
the equivalent window functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_aggregate(ds, ts_col: str, width_us: int, by: str | None = None):
    """Tumbling-window count/sum: window id = floor(epoch_us / width).

    Partial per-batch combine before the groupby shuffle (A5 pattern)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        epoch = batch[ts_col].cast(pa.int64())
        win = pc.divide(epoch, pa.scalar(width_us, pa.int64()))
        t = pa.table(
            {
                "window": win,
                **({"by": batch[by]} if by else {}),
            }
        )
        keys = ["window"] + (["by"] if by else [])
        g = t.group_by(keys).aggregate([([], "count_all")])
        from fhirflat_ray.functions.util import agg_select

        return agg_select(g, {**{k: k for k in keys}, "count_all": "n"})

    keys = ["window"] + (["by"] if by else [])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket combine: window count can be huge at scale
        # (windows x key cardinality), so Python must stay per-bucket
        return g.groupby(keys, sort=False).agg(n=("n", "sum")).reset_index()

    out = bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), keys, combine
    )
    if by:
        out = out.map_batches(
            lambda t: t.rename_columns(
                [by if c == "by" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return out


def sessionize(ds, key: str, ts_col: str, gap_us: int, order_cols: list[str] | None = None):
    """Gap-based session windows per key → (key, n_sessions, max_session_len).

    One coarse-bucket shuffle on ``key``; inside each bucket ALL keys are
    sessionized in one vectorized pass (session boundary = gap exceeded OR
    key change under (key, ts, ...) order), so Python cost is per bucket,
    not per key."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = [key, ts_col] + [c for c in (order_cols or []) if c in g.columns]
        g = g.sort_values(order, kind="mergesort")
        ts_raw = g[ts_col].to_numpy()
        if np.issubdtype(ts_raw.dtype, np.datetime64):
            # normalize to microseconds explicitly: a pandas/pyarrow combo
            # that coerces timestamps to datetime64[ns] would otherwise make
            # the gap comparison 1000x too tight
            ts = ts_raw.astype("datetime64[us]").astype("int64")
        else:
            ts = ts_raw.astype("int64")
        keys = g[key].to_numpy()
        if len(keys) == 0:
            return pd.DataFrame({key: [], "n_sessions": [], "max_session_len": []})
        new_session = np.concatenate(
            [[True], (np.diff(ts) > gap_us) | (keys[1:] != keys[:-1])]
        )
        sess_id = np.cumsum(new_session)
        per_sess = pd.DataFrame({key: keys, "sid": sess_id})
        lens = per_sess.groupby([key, "sid"], sort=False).size().reset_index(name="len")
        out = (
            lens.groupby(key, sort=False)
            .agg(n_sessions=("sid", "size"), max_session_len=("len", "max"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        out["max_session_len"] = out["max_session_len"].astype(np.int64)
        return out

    return bucketed_map_groups(ds, [key], per_bucket)


def keyed_window(ds, key: str, order_cols: list[str], specs: list[tuple]):
    """Per-key ordered window calculations — the SQL
    ``fn(x) OVER (PARTITION BY key ORDER BY ...)`` family — in ONE
    coarse-bucket shuffle plus one vectorized pandas pass per bucket.

    ``specs`` is a list of ``(op, value_col, param, out_col)`` with op in
    ``{'lag','lead','cumsum','row_number','rolling_mean','dense_rank',
    'percent_rank','ntile'}`` (``param`` = shift periods / rolling width /
    ntile tile count; ignored for cumsum/row_number/ranks, pass
    ``value_col=None`` for row_number and ntile — they follow the sort
    order, while the rank ops order by their own value column, SQL
    semantics). All ops for all keys in a bucket run
    through pandas' C groupby engine at once — Python cost is per bucket,
    never per key or row. Deterministic output requires ``order_cols`` to be
    a total order within each key (include a unique id column).

    Scale shape: per-row window output necessarily ships every row through
    the key shuffle exactly once; nothing is amplified and no side
    materializes. Hash co-partitioning assumption: one key's rows fit in a
    worker (any keyed window makes this assumption)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order_cols, kind="mergesort").reset_index(drop=True)
        gb = g.groupby(key, sort=False)
        out = {}
        for op, col, param, out_col in specs:
            if op == "lag":
                out[out_col] = gb[col].shift(param)
            elif op == "lead":
                out[out_col] = gb[col].shift(-param)
            elif op == "cumsum":
                out[out_col] = gb[col].cumsum()
            elif op == "row_number":
                out[out_col] = (gb.cumcount() + 1).astype(np.int64)
            elif op == "rolling_mean":
                out[out_col] = (
                    gb[col]
                    .rolling(param, min_periods=1)
                    .mean()
                    .reset_index(level=0, drop=True)
                )
            elif op == "dense_rank":
                out[out_col] = gb[col].rank(method="dense").astype(np.int64)
            elif op == "percent_rank":
                r = gb[col].rank(method="min").to_numpy(np.float64)
                n = gb[col].transform("count").to_numpy(np.float64)
                out[out_col] = np.round(
                    np.where(n > 1, (r - 1) / np.maximum(n - 1, 1), 0.0), 9
                )
            elif op == "ntile":
                # SQL NTILE(k): the first n%k tiles get ceil(n/k) rows —
                # follows the SORT order (include a unique tiebreak column
                # in order_cols for determinism)
                rn = gb.cumcount().to_numpy(np.int64)  # 0-based within key
                n = g.groupby(key, sort=False)[key].transform("size").to_numpy(np.int64)
                k = int(param)
                q, r_ = n // k, n % k
                big = r_ * (q + 1)  # rows covered by the (q+1)-sized tiles
                out[out_col] = np.where(
                    rn < big,
                    rn // np.maximum(q + 1, 1) + 1,
                    r_ + (rn - big) // np.maximum(q, 1) + 1,
                ).astype(np.int64)
            else:
                raise ValueError(f"unknown window op {op!r}")
        for c, v in out.items():
            g[c] = v
        return g

    return bucketed_map_groups(ds, [key], per_bucket)


def rolling_time_sum(ds, key: str, ts_col: str, value_col: str, window_us: int, out_col: str = "roll_sum"):
    """Trailing time-RANGE window sum per key — the SQL
    ``sum(v) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN <w> PRECEDING
    AND CURRENT ROW)`` analogue, including the RANGE peer rule (rows with
    equal ts share one frame).

    One coarse-bucket key shuffle; inside each bucket EVERY key's windows
    resolve in one vectorized pass: per-key timestamps shift into disjoint
    numeric ranges (gap > window), making the bucket's ts array globally
    monotonic so a single ``searchsorted`` pair finds every row's frame
    bounds, and frame sums are prefix-sum differences. No Python per key
    or per row."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        ts_raw = g[ts_col].to_numpy()
        if np.issubdtype(ts_raw.dtype, np.datetime64):
            ts = ts_raw.astype("datetime64[us]").astype(np.int64)
        else:
            ts = ts_raw.astype(np.int64)
        if len(ts) == 0:
            g[out_col] = np.array([], dtype=np.float64)
            return g
        gb = g.groupby(key, sort=False)
        kmin = gb[ts_col].transform("min").to_numpy()
        kmax = gb[ts_col].transform("max").to_numpy()
        if np.issubdtype(kmin.dtype, np.datetime64):
            kmin = kmin.astype("datetime64[us]").astype(np.int64)
            kmax = kmax.astype("datetime64[us]").astype(np.int64)
        # one row per key segment, in encounter order
        seg_first = np.concatenate(
            [[True], g[key].to_numpy()[1:] != g[key].to_numpy()[:-1]]
        )
        spans = (kmax - kmin)[seg_first]
        base = np.concatenate([[0], np.cumsum(spans + window_us + 1)[:-1]])
        # broadcast each segment's base back to its rows
        seg_id = np.cumsum(seg_first) - 1
        shifted = ts - kmin + base[seg_id]
        v = g[value_col].to_numpy().astype(np.float64)
        cum = np.cumsum(v)
        lo = np.searchsorted(shifted, shifted - window_us, side="left")
        hi = np.searchsorted(shifted, shifted, side="right") - 1  # last peer
        roll = cum[hi] - np.where(lo > 0, cum[lo - 1], 0.0)
        g[out_col] = roll
        return g

    return bucketed_map_groups(ds, [key], per_bucket)


def hopping_aggregate(ds, ts_col: str, width_us: int, hop_us: int, value_col: str | None = None):
    """Hopping (sliding) window count/sum: windows of ``width_us`` starting
    every ``hop_us`` (``width_us`` must be a multiple of ``hop_us``); an
    event at time t lands in ``width/hop`` consecutive windows.

    Scale shape mirrors :func:`tumbling_aggregate`: each batch EXPANDS its
    rows into one (window_start, partial) row per hop — the expansion is a
    vectorized repeat, and a per-batch Arrow partial aggregate collapses it
    back to one row per (batch, window) BEFORE the shuffle, so the
    all-to-all moves window partials, never event rows x hops.
    """
    if width_us % hop_us != 0:
        raise ValueError("width_us must be a multiple of hop_us")
    fan = width_us // hop_us
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        epoch = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (epoch // hop_us) * hop_us
        starts = np.concatenate([base - j * hop_us for j in range(fan)])
        cols = {"ws": pa.array(starts, pa.int64())}
        aggs = [([], "count_all")]
        names = {"ws": "ws", "count_all": "n"}
        if value_col is not None:
            v = batch[value_col].to_numpy(zero_copy_only=False)
            cols["v"] = pa.array(np.tile(v, fan))
            aggs.append(("v", "sum"))
            names["v_sum"] = "sum_v"
        g = pa.table(cols).group_by(["ws"]).aggregate(aggs)
        return agg_select(g, names)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        spec = {"n": ("n", "sum")}
        if value_col is not None:
            spec["sum_v"] = ("sum_v", "sum")
        return g.groupby(["ws"], sort=False).agg(**spec).reset_index()

    return bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), ["ws"], combine
    )


def global_running(
    ds,
    ts_col: str,
    tiebreak_col: str,
    sum_cols: list[str],
    max_cols: list[str],
    bucket_width_us: int,
):
    """GLOBAL running aggregates — SQL ``OVER (ORDER BY ts, tiebreak ROWS
    UNBOUNDED PRECEDING)`` with NO partition key — as a two-pass
    distributed prefix scan.

    Pass 1 (map-only): every batch folds to one partial row per TIME
    bucket (``ts // width``): bucket sums / maxima / counts. The bounded
    bucket table prefix-combines on the driver (exclusive prefix per
    bucket — O(buckets), the Blelloch scan shape).
    Pass 2 (one narrow bucket shuffle): each bucket sorts locally by
    (ts, tiebreak) and adds its exclusive prefix offset — every row gets
    its exact global running value without any global sort.

    Exactness: callers pass integer columns for ``sum_cols`` (e.g. cents)
    so prefix sums are combine-order-free; running max/count are exact by
    construction. Output = input rows + ``run_<col>`` columns + ``rn``
    (global row number)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fhirflat_ray.functions.util import bucketed_map_groups, collect_small_table

    w = np.int64(bucket_width_us)

    # NOTE: the scan reads its input twice (bucket partials, then the
    # bucket shuffle); callers whose upstream carries a shuffle should
    # .materialize() it first (user_ltv_deciles does) — map-only upstreams
    # are cheaper to re-read than to cache in the object store.
    def add_bucket(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__gb", pa.array(tsv // w, pa.int64()))

    with_bucket = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_partial(b: pa.Table) -> pa.Table:
        cols = {"__gb": b["__gb"]}
        for c in sum_cols:
            cols[f"s_{c}"] = b[c]
        for c in max_cols:
            cols[f"m_{c}"] = b[c]
        t = pa.table(cols)
        aggs = [([], "count_all")]
        aggs += [(f"s_{c}", "sum") for c in sum_cols]
        aggs += [(f"m_{c}", "max") for c in max_cols]
        return t.group_by(["__gb"]).aggregate(aggs)

    parts = collect_small_table(
        with_bucket.map_batches(bucket_partial, batch_format="pyarrow")
    ).to_pandas()
    agg_spec = {"count_all": "sum"}
    agg_spec.update({f"s_{c}_sum": "sum" for c in sum_cols})
    agg_spec.update({f"m_{c}_max": "max" for c in max_cols})
    per_bucket = parts.groupby("__gb", sort=True).agg(agg_spec)

    # exclusive prefix per bucket (driver-side Blelloch up-sweep over the
    # bounded table) — arrays keyed by the SORTED bucket ids so pass 2 can
    # look offsets up with one vectorized searchsorted
    gb_sorted = per_bucket.index.to_numpy().astype(np.int64)
    cnts = per_bucket["count_all"].to_numpy().astype(np.int64)
    off_cnt = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    off_sum = {
        c: np.concatenate(
            [[0], np.cumsum(per_bucket[f"s_{c}_sum"].to_numpy().astype(np.int64))[:-1]]
        )
        for c in sum_cols
    }
    off_max = {}
    for c in max_cols:
        mx = per_bucket[f"m_{c}_max"].to_numpy().astype(np.float64)
        off_max[c] = np.concatenate(
            [[-np.inf], np.maximum.accumulate(mx)[:-1]]
        )

    def per_bucket_scan(g: pd.DataFrame) -> pd.DataFrame:
        # a coarse bucket holds SEVERAL time buckets — scan them all in one
        # vectorized pass (sort by (gb, ts, tiebreak), per-gb cumulatives,
        # searchsorted offset lookup)
        g = g.sort_values(["__gb", ts_col, tiebreak_col], kind="mergesort").reset_index(
            drop=True
        )
        gb = g["__gb"].to_numpy().astype(np.int64)
        pos = np.searchsorted(gb_sorted, gb)
        grp = g.groupby("__gb", sort=False)
        g["rn"] = grp.cumcount().to_numpy().astype(np.int64) + 1 + off_cnt[pos]
        for c in sum_cols:
            g[f"run_{c}"] = grp[c].cumsum().to_numpy().astype(np.int64) + off_sum[c][pos]
        for c in max_cols:
            g[f"run_{c}"] = np.maximum(grp[c].cummax().to_numpy(), off_max[c][pos])
        return g.drop(columns=["__gb"])

    return bucketed_map_groups(with_bucket, ["__gb"], per_bucket_scan)
