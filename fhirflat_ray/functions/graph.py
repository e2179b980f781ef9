"""Distributed PageRank over an edge Dataset (fixed iteration count).

Scale shape: the rank vector is NEVER driver-materialized — each
iteration is one distributed hash join (edges x ranks on the source
node) followed by a per-batch partial sum of contributions and a
coarse-bucket final combine per destination node, i.e. exactly the
groupby-only message-passing shape ``functions/components.py`` uses for
connected components. Per-iteration state = one node-sized Dataset
(node, pr); edges stream through the join. Ranks are materialized once
per iteration so iteration i+1's join does not re-execute iteration i's
plan (the alternative — a lazy chain — re-runs every prior iteration
per consumer and makes the plan depth O(iters^2)).

Undirected treatment: callers pass directed edges; ``pagerank`` mirrors
them so every node has out-degree >= 1 and no dangling-mass correction
is needed (the SQL oracle mirrors identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pagerank"]


def pagerank(
    edges,
    iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
    round_digits: int = 9,
):
    """PageRank over DIRECTED edge Dataset (u, v), mirrored to undirected.

    Returns a Dataset (node, pr) covering every node, ``pr`` rounded to
    ``round_digits`` so the float is stable under any combine order."""
    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        default_num_buckets,
    )

    n_parts = num_partitions or default_num_buckets()

    def mirror(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v]), pa.int64()),
                "v": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    bi = edges.map_batches(mirror, batch_format="pyarrow").materialize()

    # degree per source node: Arrow partial per batch + coarse-bucket final
    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["u"]).aggregate([([], "count_all")])
        return agg_select(g, {"u": "node", "count_all": "deg"})

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False, as_index=False).agg(deg=("deg", "sum"))

    deg = (
        bucketed_map_groups(
            bi.map_batches(deg_partial, batch_format="pyarrow"), ["node"], deg_final
        )
        .repartition(max(4, n_parts))
        .materialize()
    )
    n_nodes = deg.count()
    teleport = (1.0 - damping) / n_nodes

    # ranks: (node, pr); initial pr = 1/N
    ranks = deg.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "pr": pa.array(
                    np.full(b.num_rows, 1.0 / n_nodes), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # contribution pass: edges join (ranks ⋈ deg) on the source node
        src = ranks.join(deg, "inner", n_parts, on=("node",))
        j = bi.join(src, "inner", n_parts, on=("u",), right_on=("node",))

        def contrib_partial(b: pa.Table) -> pa.Table:
            c = b["pr"].to_numpy(zero_copy_only=False) / b["deg"].to_numpy(
                zero_copy_only=False
            )
            t = pa.table({"v": b["v"], "c": pa.array(c, pa.float64())})
            g = t.group_by(["v"]).aggregate([("c", "sum")])
            return agg_select(g, {"v": "node", "c_sum": "s"})

        def contrib_final(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", sort=False, as_index=False).agg(s=("s", "sum"))
            out["pr"] = teleport + damping * out["s"]
            return out[["node", "pr"]]

        ranks = (
            bucketed_map_groups(
                j.map_batches(contrib_partial, batch_format="pyarrow"),
                ["node"],
                contrib_final,
            )
            .repartition(max(4, n_parts))
            .materialize()
        )

    def round_pr(b: pa.Table) -> pa.Table:
        pr = np.round(b["pr"].to_numpy(zero_copy_only=False), round_digits)
        return pa.table({"node": b["node"], "pr": pa.array(pr, pa.float64())})

    return ranks.map_batches(round_pr, batch_format="pyarrow")
