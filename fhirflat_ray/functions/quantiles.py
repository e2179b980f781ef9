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
