"""Distributed k-means (Lloyd's algorithm) over an embedding column.

Scale shape: every corpus pass is MAP-ONLY — centroids are broadcast once
per iteration (``ray.put``: K x dim floats, constant-size state) and each
batch computes its assignments against the zero-copy (n, dim) float block
in one vectorized distance evaluation. The only data that ever leaves a
map task is K rows of per-cluster partial sums (count + sum-vector), so
the per-iteration "shuffle" is K x num_batches tiny rows folded on the
driver — no all-to-all of the corpus, ever. This is the canonical
Ray-Data-first iterative-ML shape: broadcast model state down, fold
constant-size partials up.

The reference has no clustering; this extends the training-data operator
surface (embedding bucketing for dedup/curation). Deterministic by
construction: init = the K vectors with the smallest ids, distance
evaluated as the same elementwise (x - c)^2 sum the SQL oracle's
``list_distance`` computes, ties broken toward the smallest cluster id
(argmin takes the first minimum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "kmeans_centroids",
    "kmeans_fit_assign",
    "embedding_covariance",
    "pca_components",
    "pca_project",
    "logreg_train_gd",
]


def _matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(col), -1)


def _assign(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    # elementwise (x - c)^2, NOT the |x|^2 - 2xc + |c|^2 expansion: the
    # expansion rounds differently and can flip near-tie assignments vs
    # the SQL oracle's list_distance
    d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_centroids(
    ds,
    k: int = 4,
    iters: int = 3,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
) -> np.ndarray:
    """Fit Lloyd centroids (``iters - 1`` update rounds after the
    deterministic smallest-id init — the final iteration is the caller's
    assignment pass) and return the (k, dim) float64 centroid matrix.

    Every corpus pass is map-only; see the module docstring for the
    broadcast-down / fold-partials-up shape."""
    import ray

    from fhirflat_ray.functions.util import (
        collect_small_table,
        streaming_topk,
        worker_cached_stage,
    )

    vecs = ds.select_columns([id_column, vec_column])

    # deterministic init: the K vectors with the smallest ids (streaming
    # per-block top-k — no global sort; returns a driver-side Arrow table)
    seed_t = streaming_topk(vecs, [id_column], k)
    cent = _matrix(seed_t.sort_by(id_column)[vec_column])

    class PartialSums:
        """One (cl, n, sum-vector) row per cluster per batch."""

        def __init__(self, ref):
            self.cent = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _matrix(batch[vec_column])
            cl = _assign(mat, self.cent)
            kk, dim = self.cent.shape
            n = np.bincount(cl, minlength=kk).astype(np.int64)
            s = np.zeros((kk, dim), dtype=np.float64)
            np.add.at(s, cl, mat)
            return pa.table(
                {
                    "cl": pa.array(np.arange(kk), pa.int64()),
                    "n": pa.array(n, pa.int64()),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(s.reshape(-1), pa.float64()), dim
                    ),
                }
            )

    for _ in range(iters - 1):
        ref = ray.put(cent)
        parts = collect_small_table(
            vecs.map_batches(
                worker_cached_stage(PartialSums, ref=ref), batch_format="pyarrow"
            )
        )
        cl = parts["cl"].to_numpy(zero_copy_only=False)
        n = parts["n"].to_numpy(zero_copy_only=False)
        s = _matrix(parts["s"])
        kk, dim = cent.shape
        tot_n = np.zeros(kk, dtype=np.int64)
        tot_s = np.zeros((kk, dim), dtype=np.float64)
        np.add.at(tot_n, cl, n)
        np.add.at(tot_s, cl, s)
        nonzero = tot_n > 0
        cent = cent.copy()
        cent[nonzero] = tot_s[nonzero] / tot_n[nonzero, None]

    return cent


def kmeans_fit_assign(
    ds,
    k: int = 4,
    iters: int = 3,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
):
    """Run ``iters`` Lloyd iterations; return a per-cluster summary Dataset
    with columns (cluster_id, n_members, id_sum) — integer outputs, so the
    result is hash-comparable across engines with no float tolerance."""
    import ray

    from fhirflat_ray.functions.util import worker_cached_stage

    vecs = ds.select_columns([id_column, vec_column])
    cent = kmeans_centroids(
        ds, k=k, iters=iters, vec_column=vec_column, id_column=id_column
    )

    class FinalSummary:
        def __init__(self, ref):
            self.cent = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _matrix(batch[vec_column])
            cl = _assign(mat, self.cent)
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            kk = self.cent.shape[0]
            n = np.bincount(cl, minlength=kk).astype(np.int64)
            id_sum = np.zeros(kk, dtype=np.int64)
            np.add.at(id_sum, cl, ids)
            keep = n > 0
            return pa.table(
                {
                    "cluster_id": pa.array(np.arange(kk)[keep], pa.int64()),
                    "n_members": pa.array(n[keep], pa.int64()),
                    "id_sum": pa.array(id_sum[keep], pa.int64()),
                }
            )

    from ray.data.aggregate import Sum

    ref = ray.put(cent)
    return (
        vecs.map_batches(
            worker_cached_stage(FinalSummary, ref=ref), batch_format="pyarrow"
        )
        .groupby("cluster_id")
        .aggregate(
            Sum("n_members", alias_name="n_members"),
            Sum("id_sum", alias_name="id_sum"),
        )
    )


def embedding_covariance(ds, column: str = "embedding"):
    """Population covariance matrix of an embedding column, distributed.

    Map-only over the corpus: each batch folds its zero-copy (n, d) float
    block into d*d partial rows ``(i, j, sum(x_i*x_j), sum(x_i), sum(x_j),
    n)`` via one ``X.T @ X`` matmul, so the only shuffle is a tiny
    d^2-key aggregate (constant-size state, independent of corpus rows —
    the same fold-partials-up shape as k-means above). Returns a Dataset
    of ``(i, j, cov)`` with 1-based dims and exact float64 population
    covariance ``E[xy] - E[x]E[y]``.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        mat = _matrix(b[column]).astype(np.float64)
        n, d = mat.shape
        sxy = mat.T @ mat
        sx = mat.sum(axis=0)
        dims = np.arange(1, d + 1, dtype=np.int64)
        return pa.table(
            {
                "i": pa.array(np.repeat(dims, d), pa.int64()),
                "j": pa.array(np.tile(dims, d), pa.int64()),
                "sxy": pa.array(sxy.ravel(), pa.float64()),
                "sx_i": pa.array(np.repeat(sx, d), pa.float64()),
                "sx_j": pa.array(np.tile(sx, d), pa.float64()),
                "n": pa.array(np.full(d * d, n, dtype=np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(
            Sum("sxy", alias_name="sxy"),
            Sum("sx_i", alias_name="sx_i"),
            Sum("sx_j", alias_name="sx_j"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cov = (
            b["sxy"].to_numpy(zero_copy_only=False) / n
            - (b["sx_i"].to_numpy(zero_copy_only=False) / n)
            * (b["sx_j"].to_numpy(zero_copy_only=False) / n)
        )
        return pa.table(
            {"i": b["i"], "j": b["j"], "cov": pa.array(cov, pa.float64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def pca_components(ds, k: int = 2, column: str = "embedding"):
    """Top-``k`` principal components from the distributed covariance.

    The corpus-scale work is :func:`embedding_covariance` (map-only +
    d^2-key aggregate); the eigendecomposition runs on the driver over the
    tiny d x d matrix (``np.linalg.eigh`` — deterministic), with each
    eigenvector sign-canonicalized so its largest-|.| coordinate is
    positive. Returns ``(mean, components[k, d], explained_var[k])``.
    """
    cov_tbl = embedding_covariance(ds, column=column).to_pandas()
    d = int(cov_tbl["i"].max())
    cov = np.zeros((d, d))
    cov[cov_tbl["i"].to_numpy() - 1, cov_tbl["j"].to_numpy() - 1] = cov_tbl[
        "cov"
    ].to_numpy()

    # mean via one more map-only fold (d + 1 values per batch)
    def msum(b: pa.Table) -> pa.Table:
        mat = _matrix(b[column]).astype(np.float64)
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "s": pa.array(mat.sum(axis=0), pa.float64()),
                "n": pa.array(np.full(d, mat.shape[0], dtype=np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    ms = (
        ds.map_batches(msum, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("dim")
    )
    mean = ms["s"].to_numpy() / ms["n"].to_numpy()

    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    sign = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    sign[sign == 0] = 1.0
    comps = comps * sign[:, None]
    return mean, comps, w[order]


def pca_project(
    ds,
    k: int = 2,
    id_column: str = "vec_id",
    column: str = "embedding",
    round_dp: int = 6,
):
    """Project every embedding onto the top-``k`` principal components.

    Two corpus passes, both map-only: the covariance/mean fold (inside
    :func:`pca_components`) and the projection matmul — the (k, d)
    component matrix rides in the task closure (constant-size broadcast),
    vectors never shuffle. Output ``(id_column, pc1..pck)`` rounded to
    ``round_dp`` for cross-backend comparability.
    """
    mean, comps, _ = pca_components(ds, k=k, column=column)

    def project(b: pa.Table) -> pa.Table:
        mat = _matrix(b[column]).astype(np.float64)
        proj = (mat - mean) @ comps.T
        cols = {id_column: b[id_column]}
        for c in range(comps.shape[0]):
            cols[f"pc{c + 1}"] = pa.array(np.round(proj[:, c], round_dp), pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def logreg_train_gd(
    ds,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 3,
    lr: float = 0.5,
) -> np.ndarray:
    """Distributed full-batch logistic-regression gradient descent.

    The second iterative-ML operator after :func:`kmeans_centroids`, same
    scale shape: the weight vector broadcasts down (``ray.put`` once per
    iteration), each corpus pass is MAP-ONLY — every batch emits one row of
    partial gradient sums Σ(σ(Xw) − y)·X plus its row count — and the
    driver folds the bounded (d+1)-float partials and steps
    ``w ← w − lr · g/n``. No shuffle anywhere; per-iteration cost is one
    stream over the feature columns (materialized once, not re-read from
    storage per pass).

    Deterministic under any batch/combine order up to float-sum noise
    (~1e-15 relative), so callers can round outputs to 6dp for
    cross-engine comparison. Returns the (d+1,) float64 weight vector,
    bias first."""
    import ray

    from fhirflat_ray.functions.util import collect_small_table, worker_cached_stage

    cols = list(feature_cols)
    feats = ds.select_columns(cols + [label_col]).materialize()
    d = len(cols) + 1
    w = np.zeros(d, np.float64)

    class GradPartial:
        def __init__(self, ref, cols, label):
            self.w = ray.get(ref)
            self.cols = cols
            self.label = label

        def __call__(self, b: pa.Table) -> pa.Table:
            X = np.column_stack(
                [np.ones(b.num_rows, np.float64)]
                + [
                    b[c].to_numpy(zero_copy_only=False).astype(np.float64)
                    for c in self.cols
                ]
            )
            y = b[self.label].to_numpy(zero_copy_only=False).astype(np.float64)
            s = 1.0 / (1.0 + np.exp(-(X @ self.w)))
            g = (s - y) @ X
            out = {f"g{i}": pa.array([g[i]], pa.float64()) for i in range(len(g))}
            out["n"] = pa.array([b.num_rows], pa.int64())
            return pa.table(out)

    for _ in range(iters):
        ref = ray.put(w)
        parts = collect_small_table(
            feats.map_batches(
                worker_cached_stage(
                    GradPartial, ref=ref, cols=tuple(cols), label=label_col
                ),
                batch_format="pyarrow",
            )
        )
        n = int(parts["n"].to_numpy().sum())
        if n == 0:
            break
        g = np.array(
            [parts[f"g{i}"].to_numpy(zero_copy_only=False).sum() for i in range(d)],
            np.float64,
        )
        w = w - lr * (g / n)
    return w
