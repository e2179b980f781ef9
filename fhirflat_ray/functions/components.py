"""Distributed connected components over an edge Dataset.

Used by the near-dedup pipelines to turn verified duplicate pairs into
survivor sets: every document in a duplicate component keeps only the
minimum id. The algorithm is the alternating large-star/small-star method
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public literature): each round is ONE ``groupby(node)`` over the edge list,
no joins, and it converges in O(log^2 n) rounds to a star forest where every
node points at its component minimum.

Scale notes: the edge list is the only thing shuffled — for dedup workloads
it is proportional to the number of duplicate candidates, not the corpus.
The driver only orchestrates rounds and compares O(1) round fingerprints
for convergence; edges never materialize on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: at or below this edge count components are solved on the driver in one
#: vectorized pass (and, in the distributed loop, the convergence check
#: compares driver-side arrays instead of distributed fingerprints) — two
#: int64 columns at 1M rows is 16 MB, far cheaper than extra Ray executions
SMALL_EDGES = 1_000_000


def _star_round(edges, large: bool):
    """One large-star (connect bigger neighbors to the min) or small-star
    (connect smaller neighbors + self to the min) round.

    Vectorized across EVERY node in a coarse hash bucket (nodes are
    co-partitioned by ``hash(u)``, so each node's full neighborhood is in
    one group): neighborhoods are ``np.unique`` segments of the
    (u-sorted) edge list, per-node minima come from
    ``np.minimum.reduceat`` — Python is paid per BUCKET, not per node
    (a 160k-node round was 100x slower with per-node ``map_groups``)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def bidir(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        return pd.DataFrame(
            {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])}
        )

    def star_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        if len(u) == 0:
            return pd.DataFrame({"u": u, "v": v})
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        uniq, first, counts = np.unique(u, return_index=True, return_counts=True)
        nb_min = np.minimum.reduceat(v, first)
        m_seg = np.minimum(uniq, nb_min)
        m = np.repeat(m_seg, counts)
        if large:
            mask = v > u
            out_u, out_v = v[mask], m[mask]
        else:
            mask = (v <= u) & (v != m)
            out_u, out_v = v[mask], m[mask]
            self_mask = uniq != m_seg
            out_u = np.concatenate([out_u, uniq[self_mask]])
            out_v = np.concatenate([out_v, m_seg[self_mask]])
        keep = out_u != out_v
        return pd.DataFrame({"u": out_u[keep], "v": out_v[keep]})

    return bucketed_map_groups(
        edges.map_batches(bidir, batch_format="pandas"), ["u"], star_bucket
    )


def _dedupe_edges(edges):
    from fhirflat_ray.functions.util import distinct_rows

    return distinct_rows(edges, ["u", "v"])


def _fingerprint(edges) -> tuple[int, int]:
    """Order-insensitive O(1) summary of the edge multiset (count, hash-sum)."""

    def part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch, index=False).to_numpy()
        # int64 wraparound sum (zero-copy view of the uint64 hashes) —
        # bit-identical mod 2^64, sidesteps this host's slow unsigned-64
        # numpy path. Explicit fixed dtype: a Python-int list infers int64
        # vs uint64 per block and Ray's mixed-schema unification goes
        # through float64, shearing low bits (the verify.py false-alarm
        # bug) — here a sheared fingerprint could fake CONVERGENCE and
        # stop the star rounds early with wrong components.
        return pd.DataFrame(
            {
                "s": np.array(
                    [h.view(np.int64).sum(dtype=np.int64)], dtype=np.int64
                ),
                "n": np.array([len(batch)], dtype=np.int64),
            }
        )

    rows = edges.map_batches(part, batch_format="pandas").take_all()
    total = 0
    n = 0
    for r in rows:
        total = (total + int(r["s"])) & ((1 << 64) - 1)
        n += int(r["n"])
    return n, total


def _label_propagation(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized in-memory connected components (min-label propagation with
    pointer jumping): O(E) numpy work per round, O(log n) rounds. Node ids
    map to compact indices via ``np.unique`` (sorted, so the minimum index
    IS the minimum id) and labels propagate as indices."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u) :]
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = labels.copy()
        m = np.minimum(labels[ui], labels[vi])
        np.minimum.at(labels, ui, m)
        np.minimum.at(labels, vi, m)
        while True:  # pointer jumping: label chains collapse to roots
            nxt = labels[labels]
            if np.array_equal(nxt, labels):
                break
            labels = nxt
        if np.array_equal(labels, old):
            break
    return nodes, nodes[labels]


def connected_components(
    edges_ds,
    src: str = "left_id",
    dst: str = "right_id",
    max_iters: int = 32,
    small_edges: int | None = None,
):
    """(node, component) Dataset from an undirected edge Dataset.

    ``component`` is the minimum node id in the node's connected component.
    Only nodes that appear in at least one edge are returned — isolated
    nodes are their own components by definition and need no work.

    Tiered execution: at or below ``small_edges`` edges (default
    ``SMALL_EDGES`` = 1M, 16 MB of int64 pairs) the edge set is collected
    columnar and solved with ONE vectorized driver pass
    (:func:`_label_propagation`) — for dedup workloads the edge list is
    proportional to duplicates, not the corpus, so this path covers all but
    the most duplicate-saturated jobs and skips the ~1 s/round Ray execution
    constant entirely. Above it, the alternating-star distributed loop runs
    (the 100 TB path; pass ``small_edges=0`` to force it).
    """

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[src].to_numpy(dtype=np.int64)
        b = batch[dst].to_numpy(dtype=np.int64)
        u, v = np.maximum(a, b), np.minimum(a, b)
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]})

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": batch["u"].to_numpy(dtype=np.int64),
                "component": batch["v"].to_numpy(dtype=np.int64),
            }
        )

    def _edge_array(mat) -> np.ndarray:
        from fhirflat_ray.functions.util import collect_small_table

        t = collect_small_table(mat)
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, u))
        return np.stack([u[order], v[order]], axis=1)

    if small_edges is None:
        small_edges = SMALL_EDGES

    edges = edges_ds.map_batches(canon, batch_format="pandas")

    edges = edges.materialize()
    n_edges = edges.count()  # block metadata on the materialized set — free
    if 0 < n_edges <= small_edges:
        from fhirflat_ray.functions.util import collect_small_table

        import pyarrow as pa
        import ray.data as rd

        t = collect_small_table(edges)
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes, comp = _label_propagation(u, v)
        keep = nodes != comp  # minima are implicit, matching the star forest
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes[keep], pa.int64()),
                    "component": pa.array(comp[keep], pa.int64()),
                }
            )
        )

    prev_n: int | None = None
    prev_mat = None
    prev_arr: np.ndarray | None = None
    for _ in range(max_iters):
        # star() dedupes within each group, so no dedupe pass is needed
        # between the two star rounds — one per full round keeps edge
        # counts canonical for the convergence check
        edges = _star_round(edges, large=True)
        edges = _dedupe_edges(_star_round(edges, large=False))
        # materialize once per round (an iterative pipeline cannot stay
        # lazy: lineage would grow unboundedly); the edge list is the small
        # derived set, never the corpus
        edges = edges.materialize()
        # each Ray execution costs ~1s of framework constant at small scale,
        # so the convergence test is tiered: edge COUNT from materialized
        # block metadata (free); then exact set equality driver-side when
        # the edge set is small, distributed fingerprint otherwise
        n = edges.count()
        if prev_n is not None and n == prev_n:
            if n == 0:
                break
            if n <= SMALL_EDGES:
                cur_arr = _edge_array(edges)
                if prev_arr is None:
                    prev_arr = _edge_array(prev_mat)
                if np.array_equal(prev_arr, cur_arr):
                    break
                prev_arr = cur_arr
            else:
                prev_arr = None
                if _fingerprint(prev_mat) == _fingerprint(edges):
                    break
        else:
            prev_arr = None
        prev_n, prev_mat = n, edges

    return edges.map_batches(label, batch_format="pandas")
