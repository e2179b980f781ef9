"""Exact discrete quantiles via distributed value counts.

The reference computes column statistics only as whole-frame pandas
``describe``-style passes (single process, whole table in RAM); this is the
distributed form for the common case of BOUNDED-CARDINALITY numeric columns
(codes, quantities, ratings, prices at fixed precision): each batch reduces
to one row per distinct value it contains, the shuffle moves one tiny
(value, count) row per (block, distinct value), and the final merge is
O(distinct values) on the driver.

Scale assumption — documented, not silent: the number of DISTINCT values
must be modest (≤ ~1e6). For genuinely continuous unbounded domains use a
two-pass histogram refinement or a mergeable sketch instead; no reference
workload needs one.

``quantile_disc`` reproduces DuckDB/Postgres discrete-quantile semantics
exactly (smallest value whose cumulative count ≥ ceil(q*n), verified
empirically against DuckDB), so results are fully oracle-checkable.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def grouped_quantile_disc(ds, key: str, column: str, qs: list[float]):
    """Exact discrete quantiles of ``column`` PER ``key`` group.

    Same scale shape as :func:`quantile_disc` plus one coarse-bucket key
    shuffle: each batch reduces to (key, value, count) partials, buckets
    co-partition keys, and ONE vectorized pandas pass per bucket computes
    every key's quantiles at once (cumsum + first-over-threshold per key —
    no Python per key). Returns rows ``(key, q, value)``."""
    import pandas as pd

    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([key, column])
            .group_by([key, column])
            .aggregate([([], "count_all")])
        )
        return agg_select(g, {key: key, column: "value", "count_all": "cnt"})

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = (
            g.groupby([key, "value"], as_index=False, sort=False)["cnt"]
            .sum()
            .sort_values([key, "value"], kind="mergesort")
            .reset_index(drop=True)
        )
        cum = g.groupby(key, sort=False)["cnt"].cumsum().to_numpy()
        tot = g.groupby(key, sort=False)["cnt"].transform("sum").to_numpy()
        outs = []
        for q in qs:
            rank = np.minimum(tot, np.maximum(1, np.ceil(q * tot.astype(np.float64))))
            sel = g.loc[cum >= rank, [key, "value"]]
            first = sel.groupby(key, as_index=False, sort=False).first()
            first.insert(1, "q", float(q))
            outs.append(first)
        return pd.concat(outs, ignore_index=True)

    return bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), [key], per_bucket
    )


def quantile_cont(ds, column: str, qs: list[float]):
    """Exact INTERPOLATED quantiles (SQL ``quantile_cont`` semantics:
    position ``q*(n-1)`` in the sorted multiset, linear interpolation
    between the two straddling values). Same distributed value-count scale
    shape as :func:`quantile_disc`; the straddling values resolve from the
    merged count table via two searchsorteds — never by expanding rows."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([column]).group_by([column]).aggregate([([], "count_all")])
        from fhirflat_ray.functions.util import agg_select

        return agg_select(g, {column: "value", "count_all": "cnt"})

    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import collect_small_table

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    t = collect_small_table(counts)
    vals = np.asarray(t["value"].to_numpy(zero_copy_only=False), dtype=np.float64)
    cnts = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        out_q.append(float(q))
        if n == 0:
            out_v.append(None)
            continue
        pos = q * (n - 1)  # zero-based fractional position
        lo = int(math.floor(pos))
        frac = pos - lo
        # value at zero-based rank r = smallest value with cum > r
        v_lo = float(vals[np.searchsorted(cum, lo, side="right")])
        if frac == 0.0:
            out_v.append(v_lo)
            continue
        v_hi = float(vals[np.searchsorted(cum, lo + 1, side="right")])
        out_v.append(v_lo + frac * (v_hi - v_lo))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def quantile_disc(ds, column: str, qs: list[float]):
    """Exact discrete quantiles of ``column`` at fractions ``qs``.

    Returns a pyarrow Table ``(q: double, value: double)`` with one row per
    requested quantile, in the order given.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([column]).group_by([column]).aggregate([([], "count_all")])
        from fhirflat_ray.functions.util import agg_select

        return agg_select(g, {column: "value", "count_all": "cnt"})

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    from fhirflat_ray.functions.util import collect_small_table

    t = collect_small_table(counts)
    vals = np.asarray(t["value"].to_numpy(zero_copy_only=False), dtype=np.float64)
    cnts = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            out_q.append(float(q))
            out_v.append(None)
            continue
        # DuckDB quantile_disc: smallest value with cumulative count >=
        # ceil(q*n); the double multiply mirrors the oracle's arithmetic
        rank = max(1, min(n, math.ceil(q * n)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(float(vals[idx]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )
