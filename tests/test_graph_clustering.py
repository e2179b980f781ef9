"""Unit tests for the iterative operators (k-means, PageRank)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _vec_ds(mat: np.ndarray):
    import ray.data as rd

    n, dim = mat.shape
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float64()), dim
            ),
        }
    )
    return rd.from_arrow(t).repartition(4)


def test_kmeans_planted_clusters(ray_session):
    """Three tight planted blobs must resolve to three clusters holding
    exactly their members (k=3, well-separated centers)."""
    from fhirflat_ray.functions.clustering import kmeans_fit_assign

    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    # interleave blob membership (point i belongs to blob i%3) so the
    # id-ordered init seeds one centroid inside each blob
    mat = np.empty((150, 2))
    for b, c in enumerate(centers):
        mat[b::3] = c + 0.1 * rng.standard_normal((50, 2))
    out = (
        kmeans_fit_assign(_vec_ds(mat), k=3, iters=5)
        .to_pandas()
        .sort_values("cluster_id")
    )
    assert sorted(out["n_members"].tolist()) == [50, 50, 50]
    blob_sums = {sum(range(b, 150, 3)) for b in range(3)}
    assert set(out["id_sum"].tolist()) == blob_sums


def test_kmeans_empty_cluster_keeps_previous_centroid(ray_session):
    """If every point collapses onto two seeds, the starved cluster keeps
    its previous centroid instead of dividing by zero."""
    from fhirflat_ray.functions.clustering import kmeans_fit_assign

    # seeds are ids 0,1,2; all later points sit exactly on seed 0 or 1,
    # and seed 2's point itself moves into blob 1's basin after round 1
    mat = np.array(
        [[0.0, 0.0], [10.0, 0.0], [9.0, 0.0]] + [[0.0, 0.0]] * 20 + [[10.0, 0.0]] * 20
    )
    out = kmeans_fit_assign(_vec_ds(mat), k=3, iters=4).to_pandas()
    # no NaN blowup: total membership conserved
    assert out["n_members"].sum() == len(mat)


def test_pagerank_path_graph_analytic(ray_session):
    """PageRank on the 3-node path a-b-c (undirected): b has twice the
    degree; symmetric ends must tie exactly, and the distribution sums
    to 1 (teleport + conserved mass)."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import pagerank

    edges = rd.from_arrow(
        pa.table({"u": pa.array([1, 2], pa.int64()), "v": pa.array([2, 3], pa.int64())})
    )
    out = pagerank(edges, iters=10, num_partitions=4).to_pandas()
    pr = dict(zip(out["node"], out["pr"]))
    assert pr[1] == pr[3]
    assert pr[2] > pr[1]
    assert abs(sum(pr.values()) - 1.0) < 1e-6


def test_pagerank_matches_dense_reference(ray_session):
    """Distributed PageRank equals the dense matrix-power reference on a
    random graph (same teleport/damping/iterations)."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import pagerank

    rng = np.random.default_rng(3)
    n = 40
    u = rng.integers(0, n, 150)
    v = rng.integers(0, n, 150)
    keep = u != v
    u, v = u[keep], v[keep]
    pairs = np.unique(np.stack([u, v], axis=1), axis=0)
    edges = rd.from_arrow(
        pa.table(
            {"u": pa.array(pairs[:, 0], pa.int64()), "v": pa.array(pairs[:, 1], pa.int64())}
        )
    ).repartition(4)

    out = pagerank(edges, iters=4, num_partitions=4).to_pandas()

    # dense reference over the mirrored graph
    bu = np.concatenate([pairs[:, 0], pairs[:, 1]])
    bv = np.concatenate([pairs[:, 1], pairs[:, 0]])
    nodes = np.unique(bu)
    idx = {int(x): i for i, x in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    np.add.at(deg, [idx[int(x)] for x in bu], 1.0)
    pr = np.full(N, 1.0 / N)
    for _ in range(4):
        s = np.zeros(N)
        contrib = pr[[idx[int(x)] for x in bu]] / deg[[idx[int(x)] for x in bu]]
        np.add.at(s, [idx[int(x)] for x in bv], contrib)
        pr = 0.15 / N + 0.85 * s

    got = dict(zip(out["node"], out["pr"]))
    for x, i in idx.items():
        assert got[x] == pytest.approx(pr[i], abs=1e-9)


def test_pagerank_distributed_equals_broadcast(ray_session):
    """The distributed join path and the broadcast map-only path must agree
    exactly (both round to the same digits)."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import pagerank

    rng = np.random.default_rng(9)
    pairs = np.unique(
        np.stack([rng.integers(0, 60, 200), rng.integers(60, 90, 200)], axis=1), axis=0
    )
    edges = rd.from_arrow(
        pa.table(
            {"u": pa.array(pairs[:, 0], pa.int64()), "v": pa.array(pairs[:, 1], pa.int64())}
        )
    ).repartition(4)
    a = pagerank(edges, iters=3, num_partitions=4, mode="broadcast").to_pandas()
    b = pagerank(edges, iters=3, num_partitions=4, mode="distributed").to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert (a["node"] == b["node"]).all()
    assert (a["pr"] == b["pr"]).all()


def test_pca_project_matches_numpy(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.clustering import pca_components, pca_project

    rng = np.random.default_rng(7)
    # anisotropic cloud: variance concentrated along two known directions
    base = rng.normal(size=(400, 6))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(400), pa.int64()),
            "embedding": pa.array(list(base.astype(np.float32))),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)

    mean, comps, ev = pca_components(ds, k=2)
    # reference: direct numpy PCA over the full matrix
    x = base.astype(np.float32).astype(np.float64)
    c = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1][:2]
    ref = v[:, order].T
    sign = np.sign(ref[np.arange(2), np.abs(ref).argmax(axis=1)])
    ref = ref * sign[:, None]

    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    assert np.allclose(ev, w[order], atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-9)
    # orthonormal components
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)

    out = pca_project(ds, k=2).to_pandas().sort_values("vec_id")
    ref_proj = np.round((x - x.mean(axis=0)) @ ref.T, 6)
    assert np.allclose(out[["pc1", "pc2"]].to_numpy(), ref_proj, atol=1e-6)
    # pc1 captures the dominant (x5) axis: its variance must exceed pc2's
    assert out.pc1.var() > out.pc2.var() > 0


def test_hard_negatives_planted(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.similarity import hard_negatives

    # label 0 along +x, label 1 fanned away from +x by increasing angle:
    # the hardest negative for the +x query is the label-1 vector with the
    # smallest angle (vec 10), never any same-label vector.
    vecs = [np.array([1.0, 0.0, 0.0]), np.array([0.99, 0.1, 0.0])]
    labels = [0, 0]
    ids = [0, 1]
    for i, ang in enumerate(np.linspace(0.3, 1.5, 5)):
        vecs.append(np.array([np.cos(ang), np.sin(ang), 0.0]))
        labels.append(1)
        ids.append(10 + i)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs]),
            "label": pa.array(labels, pa.int32()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    out = (
        hard_negatives(ds, [0], np.array([vecs[0]]), [0], k=3)
        .to_pandas()
        .sort_values("rank")
    )
    assert out.vec_id.tolist() == [10, 11, 12]  # nearest wrong-label first
    assert 1 not in set(out.vec_id)  # same-label near-twin never appears


def test_mmr_select_prefers_diversity(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.similarity import mmr_select

    # candidates: 1 and 2 are near-twins hugging the query; 3 is less
    # relevant but diverse. Pure relevance ranks [1, 2, 3]; MMR must
    # penalize 2 for its similarity to the already-picked 1 -> [1, 3, 2].
    q = np.array([1.0, 0.0, 0.0])
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [
                    np.array([0.999, 0.045, 0.0], dtype=np.float32),
                    np.array([0.999, 0.046, 0.001], dtype=np.float32),
                    np.array([0.80, 0.0, 0.60], dtype=np.float32),
                ]
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(2)
    out = mmr_select(ds, q, k=3, lam=0.5)
    assert out["sel_rank"].to_pylist() == [1, 2, 3]
    assert out["vec_id"].to_pylist() == [1, 3, 2]


def test_semantic_dedup_planted_families(ray_session):
    """SemDeDup: four tight duplicate families along tetrahedral directions
    (pairwise cosine -1/3, far below the 0.45 threshold). Ids interleave
    (point i belongs to family i%4) so the smallest-id k-means init seeds
    one centroid inside each family; each family must collapse to exactly
    its min id."""
    from fhirflat_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    dirs = np.array(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], dtype=np.float64
    ) / np.sqrt(3.0)
    mat = np.empty((40, 3))
    for f in range(4):
        mat[f::4] = dirs[f] + 0.01 * rng.standard_normal((10, 3))
    out = semantic_dedup(_vec_ds(mat), k=4, iters=4, threshold=0.45).to_pandas()
    assert sorted(out["vec_id"].tolist()) == [0, 1, 2, 3]


def test_group_pairs_output_linear_enumeration():
    from fhirflat_ray.functions.graph import group_pairs

    vals = np.array([10, 11, 12, 20, 30, 31], dtype=np.int64)
    gid = np.array([1, 1, 1, 2, 3, 3], dtype=np.int64)
    lo, hi = group_pairs(vals, gid)
    got = sorted(zip(lo.tolist(), hi.tolist()))
    assert got == [(10, 11), (10, 12), (11, 12), (30, 31)]
    e1, e2 = group_pairs(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(e1) == 0 and len(e2) == 0


def test_triangle_count_planted_graph(ray_session):
    """K4 on {0..3} (4 triangles) + triangle {10,11,12} (1) + a dangling
    path 20-21-22 (0) must count exactly 5."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(10, 11), (10, 12), (11, 12), (20, 21), (21, 22)]
    t = pa.table(
        {
            "u": pa.array([e[0] for e in edges], pa.int64()),
            "v": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    out = triangle_count(rd.from_arrow(t).repartition(3), num_partitions=4)
    assert out["n_triangles"].to_pylist() == [5]


def test_triangle_count_distributed_above_node_budget(ray_session):
    """With node_budget smaller than the node count, triangle_count must
    switch to the join-attached-degree distributed path and still return
    the EXACT count and the identical triangle set — no driver-resident
    node state, no raise."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import triangle_count

    rng = np.random.default_rng(7)
    n_nodes = 120
    u = rng.integers(0, n_nodes, 900)
    v = rng.integers(0, n_nodes, 900)
    m = u != v
    lo = np.minimum(u[m], v[m]).astype(np.int64)
    hi = np.maximum(u[m], v[m]).astype(np.int64)
    keys = np.unique(lo * n_nodes + hi)
    lo, hi = keys // n_nodes, keys % n_nodes
    t = pa.table({"u": pa.array(lo, pa.int64()), "v": pa.array(hi, pa.int64())})

    adj = np.zeros((n_nodes, n_nodes), np.int64)
    adj[lo, hi] = 1
    adj[hi, lo] = 1
    brute = int(np.einsum("ij,jk,ki->", adj, adj, adj)) // 6

    got = triangle_count(
        rd.from_arrow(t).repartition(4), num_partitions=4, node_budget=8
    )
    assert got["n_triangles"].to_pylist() == [brute]

    tri_b = triangle_count(
        rd.from_arrow(t).repartition(4), num_partitions=4, return_triangles=True
    ).to_pandas()
    tri_d = triangle_count(
        rd.from_arrow(t).repartition(4),
        num_partitions=4,
        node_budget=8,
        return_triangles=True,
    ).to_pandas()
    set_b = set(map(tuple, np.sort(tri_b.to_numpy(), axis=1)))
    set_d = set(map(tuple, np.sort(tri_d.to_numpy(), axis=1)))
    assert set_b == set_d and len(set_d) == brute


def test_logreg_gd_matches_numpy_reference(ray_session):
    """Distributed full-batch GD must match a single-process numpy run of
    the identical recurrence to float precision."""
    import ray.data as rd

    from fhirflat_ray.functions.clustering import logreg_train_gd

    rng = np.random.default_rng(3)
    X = rng.standard_normal((400, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.float64)
    t = pa.table(
        {
            "x1": pa.array(X[:, 0], pa.float64()),
            "x2": pa.array(X[:, 1], pa.float64()),
            "y": pa.array(y, pa.float64()),
        }
    )
    got = logreg_train_gd(
        rd.from_arrow(t).repartition(5), ["x1", "x2"], "y", iters=4, lr=0.5
    )
    Xb = np.column_stack([np.ones(len(X)), X])
    w = np.zeros(3)
    for _ in range(4):
        s = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w = w - 0.5 * ((s - y) @ Xb) / len(X)
    assert np.allclose(got, w, atol=1e-12)
    # it actually learned the separator: both feature weights positive
    assert got[1] > 0 and got[2] > 0


def test_pq_encode_subspace_locality(ray_session):
    """Product-quantization codes: duplicate vectors get identical codes,
    and perturbing ONLY subspace 2 changes ONLY c2."""
    import os
    import tempfile

    from fhirflat_ray.pipelines.queries import _PQ_SUBDIM, _PQ_SUBS, pq_encode

    rng = np.random.default_rng(2)
    dim = _PQ_SUBS * _PQ_SUBDIM
    # 4 well-separated base patterns, interleaved so the smallest-id init
    # seeds each subspace codebook with distinct rows
    base = rng.standard_normal((4, dim)) * 5
    mat = np.empty((40, dim))
    for i in range(40):
        mat[i] = base[i % 4] + 0.01 * rng.standard_normal(dim)
    # rows 36..39: copy of row 0..3 but subspace 2 swapped to another basin
    for j in range(4):
        mat[36 + j] = mat[j]
        mat[36 + j, 2 * _PQ_SUBDIM : 3 * _PQ_SUBDIM] = base[
            (j + 1) % 4, 2 * _PQ_SUBDIM : 3 * _PQ_SUBDIM
        ]
    df = pd.DataFrame(
        {
            "vec_id": np.arange(40, dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in mat],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "embeddings.parquet"))
        got = pq_encode(d).to_pandas().set_index("vec_id")
    for j in range(4):
        orig, pert = got.loc[j], got.loc[36 + j]
        for s in range(_PQ_SUBS):
            if s == 2:
                assert orig[f"c{s}"] != pert[f"c{s}"]
            else:
                assert orig[f"c{s}"] == pert[f"c{s}"]


def test_semantic_dedup_keeps_zero_norm_vectors(ray_session):
    """A zero-norm embedding is nobody's near-duplicate — it must survive
    as its own singleton, not vanish (regression: the similarity diagonal
    was False for zero vectors under the norm guard)."""
    from fhirflat_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    mat = np.empty((9, 3))
    for i in range(4):
        mat[i * 2] = [5.0, 0, 0] + 0.01 * rng.standard_normal(3)
    for i in range(4):
        mat[i * 2 + 1] = [0, 5.0, 0] + 0.01 * rng.standard_normal(3)
    mat[8] = 0.0  # zero vector
    out = semantic_dedup(_vec_ds(mat), k=2, iters=3, threshold=0.45).to_pandas()
    survivors = set(out["vec_id"].tolist())
    assert 8 in survivors
    assert 0 in survivors and 1 in survivors
    assert len(survivors) == 3


def _random_edges(seed: int, n_nodes: int, n_draws: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_draws)
    v = rng.integers(0, n_nodes, n_draws)
    m = u != v
    lo = np.minimum(u[m], v[m]).astype(np.int64)
    hi = np.maximum(u[m], v[m]).astype(np.int64)
    keys = np.unique(lo * n_nodes + hi)
    return pa.table(
        {
            "u": pa.array(keys // n_nodes, pa.int64()),
            "v": pa.array(keys % n_nodes, pa.int64()),
        }
    )


def test_attach_degrees_broadcast_distributed_parity(ray_session):
    """attach_degrees must append identical degree columns in broadcast
    and distributed modes, and both must match a numpy bincount."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import attach_degrees

    t = _random_edges(11, 90, 600)
    edges = rd.from_arrow(t).repartition(4).materialize()

    nodes = np.concatenate([t["u"].to_numpy(), t["v"].to_numpy()])
    ref = np.bincount(nodes, minlength=90)

    outs = {}
    # auto with a tiny budget must silently fall through to the join path
    for label, mode, budget in (
        ("broadcast", "broadcast", 1_000_000),
        ("distributed", "distributed", 1_000_000),
        ("auto_tiny", "auto", 8),
    ):
        df = (
            attach_degrees(
                edges, edges, [("u", "du"), ("v", "dv")],
                num_partitions=4, node_budget=budget, mode=mode,
            )
            .to_pandas()
            .sort_values(["u", "v"])
            .reset_index(drop=True)
        )
        assert (df["du"].to_numpy() == ref[df["u"].to_numpy()]).all()
        assert (df["dv"].to_numpy() == ref[df["v"].to_numpy()]).all()
        outs[label] = df[["u", "v", "du", "dv"]]
    pd.testing.assert_frame_equal(outs["broadcast"], outs["distributed"])
    pd.testing.assert_frame_equal(outs["broadcast"], outs["auto_tiny"])


def test_attach_degrees_distributed_node_named_source(ray_session):
    """The distributed join path must survive a source column literally
    named "node" (clustering_coeff attaches [("node", "deg")]) — the
    right side joins under reserved names so the key column is kept."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import attach_degrees

    t = _random_edges(17, 50, 300)
    edges = rd.from_arrow(t).repartition(4).materialize()
    nodes = np.concatenate([t["u"].to_numpy(), t["v"].to_numpy()])
    ref = np.bincount(nodes, minlength=50)
    present = np.unique(nodes)

    per_node = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(present, pa.int64()),
                "tri": pa.array(np.arange(len(present)), pa.int64()),
            }
        )
    ).repartition(3)
    df = (
        attach_degrees(
            per_node, edges, [("node", "deg")],
            num_partitions=4, mode="distributed",
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(df.columns) == ["node", "tri", "deg"] or set(df.columns) == {
        "node", "tri", "deg"
    }
    assert (df["node"].to_numpy() == present).all()
    assert (df["deg"].to_numpy() == ref[present]).all()
    # tri column rides through the join untouched
    assert (df["tri"].to_numpy() == np.arange(len(present))).all()


def test_peel_low_degree_parity_and_reference(ray_session):
    """One peel round must drop exactly the edges touching a degree<k node,
    identically in broadcast and distributed modes (no driver node state
    in the latter)."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import peel_low_degree

    t = _random_edges(13, 70, 800)
    lo, hi = t["u"].to_numpy(), t["v"].to_numpy()
    deg = np.bincount(np.concatenate([lo, hi]), minlength=70)
    k = int(np.median(deg[deg > 0])) + 1
    keep_mask = (deg[lo] >= k) & (deg[hi] >= k)
    expect = set(zip(lo[keep_mask].tolist(), hi[keep_mask].tolist()))
    n_drop_expect = int((deg < k)[np.unique(np.concatenate([lo, hi]))].sum())

    for mode, budget in (
        ("broadcast", 1_000_000),
        ("distributed", 1_000_000),
        ("auto", 8),  # tiny budget: auto must fall through to distributed
    ):
        edges = rd.from_arrow(t).repartition(4).materialize()
        surv, n_drop, n_nodes = peel_low_degree(
            edges, k, num_partitions=4, node_budget=budget, mode=mode
        )
        df = surv.to_pandas()
        got = set(zip(df["u"].tolist(), df["v"].tolist()))
        assert got == expect, mode
        assert n_nodes == int((deg > 0).sum())
        assert n_drop == n_drop_expect


def test_attach_degrees_drops_non_endpoint_nodes_in_both_tiers(ray_session):
    """A row whose node value is not an edges endpoint must be DROPPED by
    both tiers (inner semantics). Regression: the broadcast tier's bare
    searchsorted crashed on values past max(nodes) and silently attached a
    neighbor's degree for absent in-range values."""
    import ray.data as rd

    from fhirflat_ray.functions.graph import attach_degrees

    edges = (
        rd.from_arrow(
            pa.table(
                {
                    "u": pa.array([0, 0, 2], pa.int64()),
                    "v": pa.array([2, 4, 4], pa.int64()),
                }
            )
        )
        .repartition(2)
        .materialize()
    )
    # 3 is absent-in-range (old bug: got node 4's degree), 9 is past
    # max(nodes) (old bug: IndexError), 0/2/4 are real endpoints
    ds = rd.from_arrow(
        pa.table({"n": pa.array([0, 2, 3, 4, 9], pa.int64())})
    ).materialize()

    expected = {0: 2, 2: 2, 4: 2}
    for mode in ("broadcast", "distributed"):
        df = (
            attach_degrees(ds, edges, [("n", "dn")], num_partitions=2, mode=mode)
            .to_pandas()
            .sort_values("n")
            .reset_index(drop=True)
        )
        assert df["n"].tolist() == sorted(expected)
        assert df["dn"].tolist() == [expected[n] for n in sorted(expected)]
