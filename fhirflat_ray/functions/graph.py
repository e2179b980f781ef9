"""PageRank over an edge Dataset (fixed iteration count), hybrid scale.

Two execution paths behind one entry point (the broadcast-vs-distributed
hybrid discipline of ``dedup._verify_edges_*``):

- **broadcast** (node count <= ``BROADCAST_NODE_BUDGET``): the rank vector
  lives on the driver as one numpy array per iteration; each iteration is
  ONE map-only pass over the (pre-degree-attached) edge Dataset — every
  batch folds its contributions to a per-batch (v, s) partial, merged by
  ``np.add.at`` on the driver. No join, no shuffle, per-iteration cost =
  one corpus stream. Exactly the ``ray.put``-model-down / fold-partials-up
  shape ``clustering.kmeans_fit_assign`` uses.
- **distributed** (above the budget): the rank vector is NEVER
  driver-materialized — each iteration is one distributed hash join
  (edges x ranks on the source node) followed by a per-batch partial sum
  and a coarse-bucket final combine per destination node (the
  groupby-only message-passing shape of ``functions/components.py``).
  Source degrees are attached to the mirrored edges ONCE, so iterations
  need a single join each. Ranks materialize once per iteration so
  iteration i+1's join does not re-execute iteration i's plan.

Both paths compute bit-comparable contributions (pr/deg per edge, summed
per destination, teleport + damping outside); results are rounded to
``round_digits`` so combine-order float noise cannot leak into oracle
hashes. Undirected treatment: callers pass directed edges; ``pagerank``
mirrors them so every node has out-degree >= 1 and no dangling-mass
correction is needed (the SQL oracle mirrors identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "pagerank",
    "triangle_count",
    "group_pairs",
    "group_pairs_idx",
    "degree_fold",
    "node_degrees",
    "attach_degrees",
    "peel_low_degree",
    "NodeBudgetExceeded",
    "BROADCAST_NODE_BUDGET",
]


class NodeBudgetExceeded(ValueError):
    """Raised by :func:`degree_fold` when the distinct node count exceeds
    the broadcast budget. Callers with a distributed path (triangle_count)
    catch this and switch to join-attached degrees; callers that are
    inherently broadcast-shaped let it propagate as the honest guard."""

#: broadcast-path cap: 2M nodes x (8B id + 8B rank + 8B degree) = 48 MB of
#: driver/broadcast state — past this the distributed join path runs
BROADCAST_NODE_BUDGET = 2_000_000

#: fused triangle counting: edge-key sets at or below this broadcast once
#: and wedges are counted inside their bucket task (16 MB of int64 keys)
_TRI_BROADCAST_EDGE_BUDGET = 2_000_000


def pagerank(
    edges,
    iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
    round_digits: int = 9,
    mode: str = "auto",
):
    """PageRank over DIRECTED edge Dataset (u, v), mirrored to undirected.

    Returns a Dataset (node, pr) covering every node, ``pr`` rounded to
    ``round_digits`` so the float is stable under any combine order.
    ``mode``: "auto" (node-count dispatch), "broadcast", "distributed"."""
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

    if mode == "broadcast" or (mode == "auto" and n_nodes <= BROADCAST_NODE_BUDGET):
        return _pagerank_broadcast(
            bi, deg, n_nodes, iters, damping, teleport, round_digits
        )

    # pre-attach the SOURCE degree to each mirrored edge ONCE, so every
    # iteration needs a single hash join (edges x ranks) instead of two
    # (ranks x deg, then edges x that): (u, v, du)
    bi_d = (
        bi.join(deg, "inner", n_parts, on=("u",), right_on=("node",))
        .map_batches(
            lambda b: pa.table({"u": b["u"], "v": b["v"], "du": b["deg"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

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
        j = bi_d.join(ranks, "inner", n_parts, on=("u",), right_on=("node",))

        def contrib_partial(b: pa.Table) -> pa.Table:
            c = b["pr"].to_numpy(zero_copy_only=False) / b["du"].to_numpy(
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


def _pagerank_broadcast(
    bi,
    deg,
    n_nodes: int,
    iters: int,
    damping: float,
    teleport: float,
    round_digits: int,
):
    """Broadcast-path iterations: rank vector down via ``ray.put``, one
    map-only edge pass per iteration, per-batch (v, s) partials folded on
    the driver. State is O(nodes) and the caller guaranteed it fits
    ``BROADCAST_NODE_BUDGET``."""
    import ray
    import ray.data as rd

    from fhirflat_ray.functions.util import collect_small_table, worker_cached_stage

    deg_t = collect_small_table(deg)
    nodes = deg_t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes)
    nodes = nodes[order]
    degs = deg_t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    nodes_ref = ray.put(nodes)

    class Contrib:
        """Per-batch contribution partial against the broadcast rank/deg.

        ``ray.get`` of the shared refs is zero-copy from plasma; the
        per-worker cache keys on (nodes_ref, ratio_ref), so each iteration
        builds one instance per worker."""

        def __init__(self, nodes_ref, ratio_ref):
            self.nodes = ray.get(nodes_ref)
            self.ratio = ray.get(ratio_ref)  # pr/deg per node position

        def __call__(self, b: pa.Table) -> pa.Table:
            ratio = self.ratio
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            c = ratio[np.searchsorted(self.nodes, u)]
            vp = np.searchsorted(self.nodes, v)
            s = np.zeros(len(self.nodes), dtype=np.float64)
            np.add.at(s, vp, c)
            nz = np.nonzero(s)[0]
            return pa.table(
                {
                    "p": pa.array(nz.astype(np.int64), pa.int64()),
                    "s": pa.array(s[nz], pa.float64()),
                }
            )

    pr = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(iters):
        ratio_ref = ray.put(pr / degs)
        parts = collect_small_table(
            bi.map_batches(
                worker_cached_stage(Contrib, nodes_ref=nodes_ref, ratio_ref=ratio_ref),
                batch_format="pyarrow",
            )
        )
        s = np.zeros(n_nodes, dtype=np.float64)
        np.add.at(
            s,
            parts["p"].to_numpy(zero_copy_only=False),
            parts["s"].to_numpy(zero_copy_only=False),
        )
        pr = teleport + damping * s

    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "pr": pa.array(np.round(pr, round_digits), pa.float64()),
            }
        )
    )


def _triangle_count_distributed(edges, n_parts: int, return_triangles: bool):
    """Above-node-budget triangle counting — NO driver-resident node state.

    Same rank-orientation algorithm as the broadcast path, re-expressed so
    every node-scale structure stays a Dataset:

    - degrees fold as per-batch ``np.unique`` partials into a bucketed
      groupby (a (node, deg) Dataset — never collected);
    - each edge picks up (du, dv) via two distributed hash joins against
      that Dataset;
    - orientation compares (deg, id) LEXICOGRAPHICALLY per batch — exactly
      the total order the broadcast path's dense rank encodes
      (``np.lexsort((un, deg))``), so both paths orient every edge
      identically and count the identical exact triangle set;
    - wedges sort by (db, b) within each source bucket (again the same
      order) and close via ``hybrid_semi_join``, whose Bloom-prefiltered
      distributed plan handles an over-budget edge-key set.

    Driver state is O(partition partials) for the id-bounds fold only."""
    from fhirflat_ray.functions.joins import hybrid_semi_join
    from fhirflat_ray.functions.util import (
        bucketed_map_groups,
        collect_small_table,
        default_num_buckets,
    )

    # degrees once (one edge scan + one coarse-bucket exchange), PINNED in
    # the object store: three consumers follow (the id-bounds fold plus the
    # two degree joins) and a lazy Dataset would re-run the whole degree
    # aggregation per consumer. O(nodes) rows — the distributed tier's
    # working set by design; blocks spill rather than touch the driver.
    deg = node_degrees(edges, n_parts).materialize()

    def bounds(b: pa.Table) -> pa.Table:
        ids = b["node"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())})
        return pa.table(
            {
                "lo": pa.array([int(ids.min())], pa.int64()),
                "hi": pa.array([int(ids.max())], pa.int64()),
            }
        )

    bt = collect_small_table(deg.map_batches(bounds, batch_format="pyarrow"))
    if bt.num_rows == 0:
        if return_triangles:
            import ray.data as rd

            return rd.from_arrow(
                pa.schema(
                    [("n1", pa.int64()), ("n2", pa.int64()), ("n3", pa.int64())]
                ).empty_table()
            )
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    lo_id = int(bt["lo"].to_numpy(zero_copy_only=False).min())
    if lo_id < 0:
        raise ValueError("graph node ids must be non-negative (packed int64 pair keys)")
    off = int(bt["hi"].to_numpy(zero_copy_only=False).max()) + 1
    if off * off >= 2**63:
        raise ValueError("triangle_count: node-id range too wide for int64 pair keys")

    with_both = attach_degrees(
        edges, edges, [("u", "du"), ("v", "dv")], num_partitions=n_parts,
        mode="distributed", deg_ds=deg,
    )

    def orient(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        du = b["du"].to_numpy(zero_copy_only=False)
        dv = b["dv"].to_numpy(zero_copy_only=False)
        swap = (du > dv) | ((du == dv) & (u > v))
        a = np.where(swap, v, u)
        bb = np.where(swap, u, v)
        db = np.where(swap, du, dv)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(bb, pa.int64()),
                "db": pa.array(db.astype(np.int64), pa.int64()),
                "ek": pa.array(a * off + bb, pa.int64()),
            }
        )

    oriented = with_both.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # (db, b) is the (degree, id) total order — the rank order the
        # broadcast path sorts by — so pairs emit low-rank-first and the
        # closing edge, if present, is stored in exactly that orientation
        g = g.sort_values(["a", "db", "b"], kind="mergesort")
        i, j = group_pairs_idx(g["a"].to_numpy())
        b = g["b"].to_numpy()
        lo, hi = b[i], b[j]
        out = {"wk": lo * off + hi}
        if return_triangles:
            out.update({"n1": g["a"].to_numpy()[i], "n2": lo, "n3": hi})
        return pd.DataFrame(out)

    wds = bucketed_map_groups(
        oriented, ["a"], wedges, num_buckets=max(n_parts, default_num_buckets())
    )
    closed = hybrid_semi_join(
        wds,
        oriented.select_columns(["ek"]),
        on="wk",
        right_on="ek",
        num_partitions=n_parts,
    )
    if return_triangles:
        return closed.select_columns(["n1", "n2", "n3"])
    return pa.table({"n_triangles": pa.array([closed.count()], pa.int64())})


def group_pairs_idx(gid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row-index pairs (i, j) with i < j for every within-group pair, rows
    SORTED by group — output-linear (one ``np.repeat`` index build, no
    Python per group). ``gid`` must be constant within each group and
    change between groups."""
    n = len(gid)
    e = np.empty(0, np.int64)
    if n == 0:
        return e, e
    new = np.ones(n, bool)
    new[1:] = gid[1:] != gid[:-1]
    g = np.cumsum(new) - 1
    cnt = np.bincount(g)
    pos = np.arange(n) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    rem = cnt[g] - 1 - pos  # pairs this row starts (with each later row)
    tot = int(rem.sum())
    if tot == 0:
        return e, e
    starts = np.repeat(np.arange(n), rem)
    k = np.arange(tot) - np.repeat(np.cumsum(rem) - rem, rem)
    return starts, starts + k + 1


def group_pairs(vals: np.ndarray, gid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered within-group pairs (vals[i], vals[j]) with i < j — the
    value view over :func:`group_pairs_idx`."""
    i, j = group_pairs_idx(gid)
    if len(i) == 0:
        e = np.empty(0, vals.dtype)
        return e, e
    return vals[i], vals[j]


def _deg_partial(b: pa.Table) -> pa.Table:
    """Per-batch endpoint-degree partial: ``(node, deg)`` over both edge
    endpoints — the ONE degree definition shared by :func:`degree_fold`
    (broadcast tier) and :func:`node_degrees` (distributed tier), so the
    two tiers cannot drift apart."""
    nodes = np.concatenate(
        [
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False),
        ]
    )
    un, cnt = np.unique(nodes, return_counts=True)
    return pa.table(
        {"node": pa.array(un, pa.int64()), "deg": pa.array(cnt, pa.int64())}
    )


def degree_fold(edges, node_budget: int = BROADCAST_NODE_BUDGET):
    """Node-bounded degree fold over a distinct undirected edge Dataset
    (int64 columns ``u < v``): per-batch ``np.unique`` partials streamed to
    the driver and folded INCREMENTALLY — the broadcast-state assumption
    shared by the graph analytics (triangle counting, k-core,
    coefficients). Driver memory stays O(node_budget + batch): partial
    batches buffer up to ~budget rows, fold, and the fold ABORTS the
    stream the moment the distinct-node count exceeds ``node_budget`` —
    an over-budget graph (the regime the distributed tier exists for)
    raises after holding at most ~2x budget rows, never the full node
    set. Returns ``(nodes_sorted, degrees)``; raises NodeBudgetExceeded
    past the budget and ValueError on NEGATIVE node ids (the packed pair
    keys downstream require a non-negative id space)."""

    def _raise(n: int):
        raise NodeBudgetExceeded(
            f"degree fold of {n}+ nodes exceeds the broadcast budget "
            f"({node_budget}); attach degrees via a distributed hash join "
            "(triangle_count's above-budget path)"
        )

    un = np.empty(0, np.int64)
    deg = np.empty(0, np.int64)
    buf_n: list[np.ndarray] = [un]
    buf_d: list[np.ndarray] = [deg]
    buffered = 0

    def fold():
        nonlocal un, deg, buf_n, buf_d, buffered
        alln = np.concatenate(buf_n)
        un2, inv = np.unique(alln, return_inverse=True)
        d2 = np.zeros(len(un2), np.int64)
        np.add.at(d2, inv, np.concatenate(buf_d))
        un, deg = un2, d2
        buf_n, buf_d, buffered = [un], [deg], 0

    parts = edges.map_batches(_deg_partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        buf_n.append(b["node"].to_numpy(zero_copy_only=False))
        buf_d.append(b["deg"].to_numpy(zero_copy_only=False))
        buffered += b.num_rows
        if buffered >= max(node_budget, 1 << 18):
            fold()
            if len(un) > node_budget:
                _raise(len(un))
    fold()
    if len(un) and int(un.min()) < 0:
        raise ValueError(
            "graph node ids must be non-negative (packed int64 pair keys)"
        )
    if len(un) > node_budget:
        _raise(len(un))
    return un, deg


def node_degrees(edges, num_partitions: int | None = None):
    """Endpoint-degree Dataset ``(node, deg)`` over a distinct undirected
    edge Dataset (int64 columns ``u < v``) — the distributed-scale sibling
    of :func:`degree_fold`: per-batch ``np.unique`` partials into ONE
    coarse-bucket groupby; the node state never touches the driver.
    Returned materialized so downstream joins/collects do not re-execute
    the edge build."""
    from fhirflat_ray.functions.util import bucketed_map_groups, default_num_buckets

    n_parts = num_partitions or default_num_buckets()

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False, as_index=False).agg(deg=("deg", "sum"))

    return bucketed_map_groups(
        edges.map_batches(_deg_partial, batch_format="pyarrow"),
        ["node"],
        deg_final,
        num_buckets=n_parts,
    ).materialize()


def attach_degrees(
    ds,
    edges,
    cols,
    num_partitions: int | None = None,
    node_budget: int = BROADCAST_NODE_BUDGET,
    mode: str = "auto",
    deg_ds=None,
):
    """Attach per-node endpoint degrees of ``edges`` to node columns of
    ``ds`` — hybrid scale.

    ``cols`` maps int64 node columns to appended degree columns, e.g.
    ``[("u", "du"), ("v", "dv")]``. Below ``node_budget`` distinct nodes
    the degrees fold on the driver ONCE (:func:`degree_fold`) and attach
    map-only (broadcast + per-batch ``searchsorted`` — ZERO exchanges);
    above it (``NodeBudgetExceeded``) degrees stay a Dataset
    (:func:`node_degrees`, one coarse-bucket exchange) and attach via one
    distributed hash join per column — the node state never touches the
    driver. INNER semantics either way: a row whose node-column value is
    not an ``edges`` endpoint is dropped (both tiers agree). ``mode``:
    "auto" | "broadcast" | "distributed". ``deg_ds``: a precomputed
    :func:`node_degrees`
    Dataset to reuse on the distributed path (skips one edge scan when
    the caller already materialized the degrees)."""
    import ray

    from fhirflat_ray.functions.util import default_num_buckets, worker_cached_stage

    n_parts = num_partitions or default_num_buckets()
    if mode != "distributed":
        try:
            nodes, degs = degree_fold(edges, node_budget)
        except NodeBudgetExceeded:
            if mode == "broadcast":
                raise
        else:
            ref = ray.put((nodes, degs))

            class AttachDeg:
                def __init__(self, ref, cols):
                    self.nodes, self.deg = ray.get(ref)
                    self.cols = cols

                def __call__(self, b: pa.Table) -> pa.Table:
                    # INNER semantics, same as the distributed tier's hash
                    # join: rows whose node value is not an edge endpoint
                    # are DROPPED (clip + equality check — a bare
                    # searchsorted would index out of range past max(nodes)
                    # or silently attach a neighbor's degree in-range)
                    n = len(self.nodes)
                    keep = np.ones(len(b), bool)
                    pos_by_col: dict[str, np.ndarray] = {}
                    for src, _ in self.cols:
                        vals = b[src].to_numpy(zero_copy_only=False)
                        if n == 0:
                            keep[:] = False
                            pos_by_col[src] = np.zeros(len(vals), np.int64)
                            continue
                        pos = np.minimum(
                            np.searchsorted(self.nodes, vals), n - 1
                        )
                        keep &= self.nodes[pos] == vals
                        pos_by_col[src] = pos
                    if not keep.all():
                        idx = np.flatnonzero(keep)
                        b = b.take(pa.array(idx, pa.int64()))
                        pos_by_col = {
                            s: p[idx] for s, p in pos_by_col.items()
                        }
                    for src, out in self.cols:
                        b = b.append_column(
                            out,
                            pa.array(self.deg[pos_by_col[src]], pa.int64()),
                        )
                    return b

            return ds.map_batches(
                worker_cached_stage(AttachDeg, ref=ref, cols=tuple(cols)),
                batch_format="pyarrow",
            )

    deg = deg_ds if deg_ds is not None else node_degrees(edges, n_parts)
    # join under RESERVED right-side names: a source column named "node"
    # or "deg" (clustering_coeff attaches [("node", "deg")]) must survive
    # the key coalesce and the degree rename
    deg = deg.map_batches(
        lambda b: pa.table({"__dg_node": b["node"], "__dg_deg": b["deg"]}),
        batch_format="pyarrow",
    )
    if len(cols) > 1:
        # each join re-executes a lazy right side; pin the (O(nodes)-row)
        # degree table once so N column attaches cost one degree pass
        deg = deg.materialize()
    out = ds
    for src, outc in cols:
        out = out.join(deg, "inner", n_parts, on=(src,), right_on=("__dg_node",))

        def rename(b: pa.Table, _out=outc) -> pa.Table:
            if "__dg_node" in b.column_names:
                b = b.drop_columns(["__dg_node"])
            return b.set_column(
                b.column_names.index("__dg_deg"), _out, b["__dg_deg"]
            )

        out = out.map_batches(rename, batch_format="pyarrow")
    return out


def peel_low_degree(
    edges,
    k: int,
    num_partitions: int | None = None,
    node_budget: int = BROADCAST_NODE_BUDGET,
    mode: str = "auto",
):
    """ONE k-core peel round: drop every edge touching a node of degree
    < ``k``. Returns ``(survivors, n_dropped_nodes, n_nodes)`` with
    ``survivors`` materialized.

    Hybrid scale like :func:`attach_degrees`: below the node budget
    degrees fold on the driver and the sub-``k`` DROP set broadcasts and
    peels map-only (``np.isin`` — ZERO exchanges); above it
    (``NodeBudgetExceeded``) the KEEP side stays a Dataset and survivors
    resolve via two ``hybrid_semi_join`` passes (Bloom-prefiltered above
    ITS key budget), so no node-scale state ever touches the driver."""
    import pyarrow.compute as pc
    import ray

    from fhirflat_ray.functions.joins import hybrid_semi_join
    from fhirflat_ray.functions.util import default_num_buckets

    n_parts = num_partitions or default_num_buckets()
    if mode != "distributed":
        try:
            nodes, degs = degree_fold(edges, node_budget)
        except NodeBudgetExceeded:
            if mode == "broadcast":
                raise
        else:
            n_nodes = len(nodes)
            if n_nodes == 0:
                return edges, 0, 0
            drop = nodes[degs < k]
            n_drop = len(drop)
            if n_drop == 0:
                return edges, 0, n_nodes
            dref = ray.put(drop)

            def peel(b: pa.Table) -> pa.Table:
                d = ray.get(dref)
                u = b["u"].to_numpy(zero_copy_only=False)
                v = b["v"].to_numpy(zero_copy_only=False)
                bad = np.isin(u, d) | np.isin(v, d)
                return b.filter(pa.array(~bad))

            return (
                edges.map_batches(peel, batch_format="pyarrow").materialize(),
                n_drop,
                n_nodes,
            )

    # pin the degree table once: count(), the drop filter and the keep
    # filter are three consumers, and a lazy Dataset would re-run the
    # degree aggregation (a full edge scan + exchange) for each
    deg = node_degrees(edges, n_parts).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return edges, 0, 0
    drop_ds = deg.map_batches(
        lambda b: b.filter(pc.less(b["deg"], pa.scalar(k, pa.int64()))),
        batch_format="pyarrow",
    ).materialize()
    n_drop = drop_ds.count()
    if n_drop == 0:
        return edges, 0, n_nodes

    keep = deg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["deg"], pa.scalar(k, pa.int64()))),
        batch_format="pyarrow",
    ).select_columns(["node"])
    survivors = hybrid_semi_join(
        hybrid_semi_join(edges, keep, on="u", right_on="node", num_partitions=n_parts),
        keep,
        on="v",
        right_on="node",
        num_partitions=n_parts,
    )
    return survivors.materialize(), n_drop, n_nodes


def triangle_count(edges, num_partitions: int | None = None,
                   node_budget: int = BROADCAST_NODE_BUDGET,
                   return_triangles: bool = False):
    """EXACT distributed triangle count over an undirected edge Dataset
    (distinct rows, int64 columns ``u < v``) — the rank-orientation
    node-iterator (Cohen, "Graph Twiddling in a MapReduce World", CiSE'09 /
    Suri & Vassilvitskii WWW'11 shape):

    1. degrees fold node-bounded (per-batch ``np.unique`` partials, driver
       fold ≤ ``node_budget`` nodes — the ``pagerank`` broadcast-state
       assumption, guarded);
    2. every edge orients from lower to higher (degree, id) rank — a total
       order, so Σ out-degree² (the wedge count) is bounded by O(m^1.5)
       regardless of skew: a hot celebrity node RECEIVES its edges instead
       of fanning wedges out;
    3. wedges enumerate per source inside ONE coarse-bucket shuffle
       (output-linear ``group_pairs``, pairs emitted in rank order so the
       closing edge, if present, is stored in exactly that orientation);
    4. the closing-edge check is a semi join of wedge keys against the
       oriented edge keys (``hybrid_semi_join``: broadcast under budget,
       Bloom-prefiltered distributed above).

    Returns a one-row Arrow table ``n_triangles``; with
    ``return_triangles=True`` instead returns the triangle Dataset
    (n1, n2, n3) — the wedge shuffle then carries three extra int64
    columns, so keep the default for pure counting."""
    import ray

    from fhirflat_ray.functions.joins import hybrid_semi_join
    from fhirflat_ray.functions.util import (
        bucketed_map_groups,
        collect_small_table,
        default_num_buckets,
        worker_cached_stage,
    )

    n_parts = num_partitions or default_num_buckets()
    # the wedge kernel is a sort-exchange + CPU-bound bucket map, not a
    # hash-join aggregator pool — bucket it to the cluster's cores even
    # when the byte-sized join partition count is tiny (n_parts=4 at
    # sf0.1 serialized ~70M wedges onto 4 tasks; 4x measured)
    wedge_buckets = max(n_parts, default_num_buckets())
    # cost model: this pins the WHOLE edge list in the (spillable) object
    # store for multi-consumer reuse (degree fold + wedge pass + closing
    # check would otherwise re-execute the upstream plan 3x). Edge lists
    # are metadata-scale relative to a corpus (int64 pairs), but the
    # measured single-node boundary applies: past ~0.5x object store the
    # pin forces spill; on a cluster the store aggregates. For edge lists
    # beyond that, drop the materialize and accept the re-execution.
    edges = edges.materialize()
    try:
        un, deg = degree_fold(edges, node_budget)
    except NodeBudgetExceeded:
        # above the broadcast budget the node state never touches the
        # driver: degrees stay a Dataset and attach via hash joins
        return _triangle_count_distributed(edges, n_parts, return_triangles)
    if len(un) == 0:
        if return_triangles:
            import ray.data as rd

            return rd.from_arrow(
                pa.schema(
                    [("n1", pa.int64()), ("n2", pa.int64()), ("n3", pa.int64())]
                ).empty_table()
            )
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    order = np.lexsort((un, deg))
    rank = np.empty(len(un), np.int64)
    rank[order] = np.arange(len(un), dtype=np.int64)
    off = int(un.max()) + 1
    if off * off >= 2**63:
        raise ValueError("triangle_count: node-id range too wide for int64 pair keys")
    ref = ray.put((un, rank))

    class Orient:
        def __init__(self, ref, off):
            self.nodes, self.rank = ray.get(ref)
            self.off = off

        def __call__(self, b: pa.Table) -> pa.Table:
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            ru = self.rank[np.searchsorted(self.nodes, u)]
            rv = self.rank[np.searchsorted(self.nodes, v)]
            swap = ru > rv
            a = np.where(swap, v, u)
            bb = np.where(swap, u, v)
            rb = np.where(swap, ru, rv)
            return pa.table(
                {
                    "a": pa.array(a, pa.int64()),
                    "b": pa.array(bb, pa.int64()),
                    "rb": pa.array(rb, pa.int64()),
                    "ek": pa.array(a * self.off + bb, pa.int64()),
                }
            )

    oriented = edges.map_batches(
        worker_cached_stage(Orient, ref=ref, off=off), batch_format="pyarrow"
    ).materialize()

    n_edges = edges.count()  # metadata on the materialized set — free

    if not return_triangles and n_edges <= _TRI_BROADCAST_EDGE_BUDGET:
        # fused counting path: the wedge set is O(m^1.5) — MUCH bigger
        # than the edge set — so when the edge keys fit the broadcast
        # budget, check closure INSIDE the wedge kernel and emit one
        # count per bucket instead of materializing the whole wedge
        # stream into object-store blocks for a downstream semi join.
        # Local wall time is within noise of the semi-join path on this
        # bandwidth-bound host (9.5 vs 10.0 s on the dense sf0.1
        # co-order graph), but the ~70M wedge rows never leave their
        # bucket task — at cluster scale that is the difference between
        # an O(m^1.5) object-store spill and none
        from fhirflat_ray.functions.util import collect_small_table as _collect

        ek = np.sort(
            _collect(oriented.select_columns(["ek"]))["ek"].to_numpy(
                zero_copy_only=False
            )
        )
        ekref = ray.put(ek)

        def count_closed(g: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(ekref)
            g = g.sort_values(["a", "rb"], kind="mergesort")
            i, j = group_pairs_idx(g["a"].to_numpy())
            b = g["b"].to_numpy()
            wk = b[i] * off + b[j]
            if len(keys) == 0 or len(wk) == 0:
                n = 0
            else:
                pos = np.clip(np.searchsorted(keys, wk), 0, len(keys) - 1)
                n = int((keys[pos] == wk).sum())
            return pd.DataFrame({"n": np.array([n], np.int64)})

        parts = _collect(
            bucketed_map_groups(
                oriented, ["a"], count_closed, num_buckets=wedge_buckets
            )
        )
        total = int(parts["n"].to_numpy(zero_copy_only=False).sum())
        return pa.table({"n_triangles": pa.array([total], pa.int64())})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["a", "rb"], kind="mergesort")
        i, j = group_pairs_idx(g["a"].to_numpy())
        b = g["b"].to_numpy()
        lo, hi = b[i], b[j]
        out = {"wk": lo * off + hi}
        if return_triangles:
            out.update({"n1": g["a"].to_numpy()[i], "n2": lo, "n3": hi})
        return pd.DataFrame(out)

    wds = bucketed_map_groups(oriented, ["a"], wedges, num_buckets=wedge_buckets)
    closed = hybrid_semi_join(
        wds,
        oriented.select_columns(["ek"]),
        on="wk",
        right_on="ek",
        num_partitions=n_parts,
    )
    if return_triangles:
        return closed.select_columns(["n1", "n2", "n3"])
    return pa.table({"n_triangles": pa.array([closed.count()], pa.int64())})
