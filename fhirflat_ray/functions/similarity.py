"""Similarity search over embedding columns (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k — the query matrix is broadcast once
  (``ray.put``), each batch does one numpy matmul against it, and per-batch
  local top-k rows are reduced to global top-k with a single small sort on
  the driver side of a tiny dataset (k × queries × #batches rows).
- ``build_ivf`` / ``knn_ivf``: IVF-style scale path — k-means-ish centroids
  from a sample; each batch probes only the closest ``nprobe`` partitions.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(batch_col) -> np.ndarray:
    """(n, d) float32 matrix from a list<float> column, zero-ish copy."""
    arr = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) else batch_col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """Actor-pool stage: cosine scores of every row against broadcast queries."""

    def __init__(self, queries_ref: Any, id_column: str = "vec_id", vec_column: str = "embedding", k: int = 10):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.qmat = _normalize(np.asarray(q["vectors"], dtype=np.float32))
        self.id_column = id_column
        self.vec_column = vec_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_matrix(batch[self.vec_column]))
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        sims = mat @ self.qmat.T  # (n, q)
        k = min(self.k, len(ids))
        out: dict[str, list] = {"query_id": [], "vec_id": [], "cosine": []}
        # local top-k per query within this batch (global reduce happens later)
        top = np.argpartition(-sims, kth=k - 1, axis=0)[:k]  # (k, q)
        for qi, qid in enumerate(self.query_ids):
            rows = top[:, qi]
            out["query_id"].extend([int(qid)] * len(rows))
            out["vec_id"].extend(ids[rows].tolist())
            out["cosine"].extend(sims[rows, qi].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )


def knn_bruteforce(ds, query_ids: list[int], query_vectors: np.ndarray, k: int = 10,
                   id_column: str = "vec_id", vec_column: str = "embedding"):
    """Exact top-k cosine neighbours for each query; returns a small Dataset
    of (query_id, vec_id, cosine, rank) with rank 1..k (ties broken by id)."""
    import ray

    ref = ray.put({"ids": query_ids, "vectors": np.asarray(query_vectors)})
    from fhirflat_ray.functions.util import worker_cached_stage

    scored = ds.map_batches(
        worker_cached_stage(
            BruteForceScorer,
            queries_ref=ref,
            id_column=id_column,
            vec_column=vec_column,
            k=k,
        ),
        batch_format="pyarrow",
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(global_topk, batch_format="pandas")


# ------------------------------------------------------------------- IVF


def build_ivf_centroids(ds, vec_column: str = "embedding", n_centroids: int = 16,
                        sample_limit: int = 10_000, iters: int = 5, seed: int = 42) -> np.ndarray:
    """Lloyd iterations on a driver-side sample (the index build is the
    small side; assignment stays distributed)."""
    sample = ds.limit(sample_limit).to_pandas()
    mat = _normalize(np.stack(sample[vec_column].to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfAssigner:
    """Adds the IVF partition id to every row (broadcast centroids)."""

    def __init__(self, centroids_ref: Any, vec_column: str = "embedding"):
        import ray

        self.centroids = (
            ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        )
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_matrix(batch[self.vec_column]))
        assign = (mat @ self.centroids.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(assign, pa.int32()))


def knn_ivf(ds, query_ids: list[int], query_vectors: np.ndarray, k: int = 10,
            n_centroids: int = 16, nprobe: int = 4,
            id_column: str = "vec_id", vec_column: str = "embedding"):
    """IVF-bucketed ANN: probe only the ``nprobe`` closest cells per query.

    Scale path: the filter prunes (1 - nprobe/n_centroids) of the data before
    the brute-force scorer runs. The centroid build + full-corpus assignment
    re-run on every call — for repeated queries build the index ONCE with
    :func:`build_ivf_index` and query through :func:`knn_ivf_persisted`."""
    import ray

    cent = build_ivf_centroids(ds, vec_column, n_centroids)
    cent_ref = ray.put(cent)
    from fhirflat_ray.functions.util import worker_cached_stage

    assigned = ds.map_batches(
        worker_cached_stage(IvfAssigner, centroids_ref=cent_ref, vec_column=vec_column),
        batch_format="pyarrow",
    )
    qmat = _normalize(np.asarray(query_vectors, dtype=np.float32))
    probe_cells = set(
        int(c) for c in np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe].ravel()
    )
    pruned = assigned.filter(
        expr=f"ivf_cell in {sorted(probe_cells)}"
    )
    return knn_bruteforce(pruned, query_ids, query_vectors, k, id_column, vec_column)


# --------------------------------------------------------- persisted IVF


def build_ivf_index(
    ds,
    index_dir: str,
    n_centroids: int = 16,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    sample_limit: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Build AND PERSIST an IVF index: centroids as one tiny parquet file,
    the corpus written cell-partitioned (``corpus/ivf_cell=<c>/``) so a
    query reads ONLY its probed cells' files — pruning at the read, the
    reusable form of the index (the in-memory path re-assigns the whole
    corpus per call). Assignment streams through the actor pool once;
    nothing materializes on the driver. Returns the centroid matrix."""
    import os

    import ray

    os.makedirs(index_dir, exist_ok=True)
    cent = build_ivf_centroids(ds, vec_column, n_centroids, sample_limit, seed=seed)
    pa_cent = pa.table(
        {
            "cell": pa.array(range(len(cent)), pa.int32()),
            "centroid": pa.array(cent.tolist(), pa.list_(pa.float32())),
        }
    )
    import pyarrow.parquet as pq

    cent_ref = ray.put(cent)
    from fhirflat_ray.functions.util import worker_cached_stage

    assigned = ds.map_batches(
        worker_cached_stage(IvfAssigner, centroids_ref=cent_ref, vec_column=vec_column),
        batch_format="pyarrow",
    )
    assigned.write_parquet(
        os.path.join(index_dir, "corpus"), partition_cols=["ivf_cell"]
    )
    # centroids.parquet is the COMMIT MARKER — written only after the
    # cell-partitioned corpus is durable, so a killed build leaves an index
    # probes refuse (load_ivf_centroids raises) instead of one that
    # silently searches a partial corpus
    pq.write_table(pa_cent, os.path.join(index_dir, "centroids.parquet"))
    return cent


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "centroids.parquet")).sort_by("cell")
    return np.stack(
        [np.asarray(c, dtype=np.float32) for c in t["centroid"].to_pylist()]
    )


def knn_ivf_persisted(
    index_dir: str,
    query_ids: list[int],
    query_vectors: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Query a persisted IVF index (:func:`build_ivf_index`): centroids load
    from one tiny file, and ONLY the probed cells' partition directories are
    read — no full-corpus scan, no assignment pass. ``nprobe`` = number of
    centroids probed per query (set it to ``n_centroids`` for exact
    results)."""
    import os

    import ray.data as rd

    cent = load_ivf_centroids(index_dir)
    qmat = _normalize(np.asarray(query_vectors, dtype=np.float32))
    probe_cells = sorted(
        set(
            int(c)
            for c in np.argsort(-(qmat @ cent.T), axis=1)[
                :, : min(nprobe, len(cent))
            ].ravel()
        )
    )
    import glob as _glob

    paths = [
        f
        for c in probe_cells
        for f in sorted(
            _glob.glob(os.path.join(index_dir, "corpus", f"ivf_cell={c}", "*.parquet"))
        )
    ]  # empty cells write no dir; explicit files keep the read list exact
    if not paths:
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    pruned = rd.read_parquet(paths, columns=[id_column, vec_column])
    return knn_bruteforce(pruned, query_ids, query_vectors, k, id_column, vec_column)


# ------------------------------------------------- nearest-neighbour join


class _NearestJoin:
    """Actor-pool stage: per batch, one float64 matmul against the
    broadcast reference matrix; argmax picks the nearest reference row
    (reference sorted by id, so numpy's first-max rule breaks ties toward
    the smallest id — same order the SQL oracle uses)."""

    def __init__(self, ref, id_column: str, vec_column: str):
        import ray

        d = ray.get(ref)
        self.ids = d["ids"]
        self.mat = d["mat"]  # already L2-normalized, sorted by id
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    self.id_column: pa.array([], pa.int64()),
                    "nn_vec_id": pa.array([], pa.int64()),
                    "nn_cosine": pa.array([], pa.float64()),
                }
            )
        emb = batch[self.vec_column].combine_chunks()
        dim = self.mat.shape[1]
        vecs = np.asarray(
            emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(-1, dim)
        vecs = _normalize(vecs)
        scores = vecs @ self.mat.T
        j = np.argmax(scores, axis=1)
        sims = scores[np.arange(len(j)), j]
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "nn_vec_id": pa.array(self.ids[j], pa.int64()),
                "nn_cosine": pa.array(np.round(sims, 6), pa.float64()),
            }
        )


def nearest_neighbor_join(ds, ref_ids: np.ndarray, ref_vectors: np.ndarray,
                          id_column: str = "vec_id", vec_column: str = "embedding"):
    """Cross-corpus 1-nearest-neighbour join: for every row of ``ds``, the
    id + cosine of its nearest vector in a BOUNDED reference set (eval set,
    centroid table, ...). The reference matrix normalizes and broadcasts
    once via ``ray.put``; the corpus pass is MAP-ONLY (one matmul per
    batch) — 100 TB of corpus streams through with no shuffle. For
    unbounded reference sets use the IVF path instead (prune at the read
    via the persisted cell index)."""
    import ray

    order = np.argsort(np.asarray(ref_ids), kind="stable")
    ids = np.asarray(ref_ids, dtype=np.int64)[order]
    mat = _normalize(np.asarray(ref_vectors, dtype=np.float64)[order])
    ref = ray.put({"ids": ids, "mat": mat})
    from fhirflat_ray.functions.util import worker_cached_stage

    return ds.map_batches(
        worker_cached_stage(
            _NearestJoin, ref=ref, id_column=id_column, vec_column=vec_column
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------- int8 quantization


def quantize_matrix(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-vector int8 quantization of a (n, d) float matrix.

    ``scale = max(|v|) / 127``; ``code = floor(v / scale + 0.5)`` — the
    half-up rule is spelled as floor(+0.5) rather than round() so a SQL
    oracle can mirror it EXACTLY (numpy's round() is half-to-even, DuckDB's
    half-away; floor(x + 0.5) is the same IEEE expression in both). All
    arithmetic is float64 on exactly-widened float32 inputs, so engine and
    oracle produce bit-identical codes. All-zero vectors get scale 0 and
    all-zero codes. Codes return as int64 (the exact-integer domain the
    scoring matmul and the SQL checksums both use); storage-minded callers
    can downcast to int8 losslessly."""
    mat = mat.astype(np.float64, copy=False)
    scales = np.abs(mat).max(axis=1) / 127.0
    safe = np.where(scales == 0.0, 1.0, scales)
    codes = np.floor(mat / safe[:, None] + 0.5)
    codes[scales == 0.0] = 0.0
    return codes, scales


def quantize_stats_batch(
    batch: pa.Table, id_column: str = "vec_id", vec_column: str = "embedding"
) -> pa.Table:
    """Per-vector quantization checksums (map-only): code sum, squared-code
    sum (both exact BIGINT) and the scale. Integer checksums make the
    driver's value-hash float-proof while still pinning every code."""
    mat = _matrix(batch[vec_column]).astype(np.float64)
    codes, scales = quantize_matrix(mat)
    return pa.table(
        {
            id_column: batch[id_column],
            "qsum": pa.array(codes.sum(axis=1).astype(np.int64)),
            "qnorm2": pa.array((codes * codes).sum(axis=1).astype(np.int64)),
            "scale": pa.array(np.round(scales, 9), pa.float64()),
        }
    )


class QuantizedScorer:
    """Actor-pool stage: int8-quantized dot-product scores against broadcast
    quantized queries. The integer dot runs as a float64 BLAS matmul —
    exact while ``d * 127^2 < 2^53`` (any realistic dimension) — and the
    only float in the ranking is ``int_dot * corpus_scale`` (the query's
    scale is a positive per-query constant, so dropping it preserves each
    query's order). Same deterministic expression on the SQL side ⇒ the
    approximate top-k itself is fully oracle-checkable."""

    def __init__(self, queries_ref: Any, id_column: str = "vec_id",
                 vec_column: str = "embedding", k: int = 10):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.qcodes = np.asarray(q["codes"], dtype=np.float64)  # (q, d)
        self.id_column = id_column
        self.vec_column = vec_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _matrix(batch[self.vec_column]).astype(np.float64)
        codes, scales = quantize_matrix(mat)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        sims = (codes @ self.qcodes.T) * scales[:, None]  # (n, q)
        k = min(self.k, len(ids))
        out: dict[str, list] = {"query_id": [], "vec_id": [], "qsim": []}
        top = np.argpartition(-sims, kth=k - 1, axis=0)[:k]
        for qi, qid in enumerate(self.query_ids):
            rows = top[:, qi]
            out["query_id"].extend([int(qid)] * len(rows))
            out["vec_id"].extend(ids[rows].tolist())
            out["qsim"].extend(sims[rows, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "qsim": pa.array(out["qsim"], pa.float64()),
            }
        )


def knn_quantized(ds, query_ids: list[int], query_vectors: np.ndarray, k: int = 10,
                  id_column: str = "vec_id", vec_column: str = "embedding"):
    """Top-k neighbours under int8 quantized dot-product similarity:
    map-only scoring (corpus quantized per batch, queries quantized once
    and broadcast), local top-k per batch, tiny global reduce — the
    storage/bandwidth-reduction scale path next to exact
    :func:`knn_bruteforce` (codes are 4x smaller than float32 vectors and
    the scoring is integer math)."""
    import ray

    qmat = np.asarray(query_vectors, dtype=np.float64)
    qcodes, _qscales = quantize_matrix(qmat)
    ref = ray.put({"ids": query_ids, "codes": qcodes})
    from fhirflat_ray.functions.util import worker_cached_stage

    scored = ds.map_batches(
        worker_cached_stage(
            QuantizedScorer, queries_ref=ref, id_column=id_column,
            vec_column=vec_column, k=k,
        ),
        batch_format="pyarrow",
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["qsim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(global_topk, batch_format="pandas")


# ------------------------------------------------- hard-negative mining


class HardNegativeScorer(BruteForceScorer):
    """BruteForceScorer variant for contrastive-training data mining: a
    corpus row only competes for a query's top-k if its label DIFFERS from
    the query's label (a "hard negative" — high cosine, wrong class).
    Labels ride with the broadcast query pack; the per-batch mask is one
    vectorized outer comparison ORed into the score matrix as -inf."""

    def __init__(self, queries_ref, id_column="vec_id", vec_column="embedding",
                 label_column="label", k=10):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        super().__init__(
            {"ids": q["ids"], "vectors": q["vectors"]},
            id_column=id_column, vec_column=vec_column, k=k,
        )
        self.query_labels = np.asarray(q["labels"])
        self.label_column = label_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels = batch[self.label_column].to_numpy(zero_copy_only=False)
        mat = _normalize(_matrix(batch[self.vec_column]))
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        sims = mat @ self.qmat.T  # (n, q)
        sims = np.where(labels[:, None] == self.query_labels[None, :], -np.inf, sims)
        k = min(self.k, len(ids))
        out: dict[str, list] = {"query_id": [], "vec_id": [], "cosine": []}
        top = np.argpartition(-sims, kth=k - 1, axis=0)[:k]
        for qi, qid in enumerate(self.query_ids):
            rows = top[:, qi]
            keep = np.isfinite(sims[rows, qi])  # drop masked same-label fill
            rows = rows[keep]
            out["query_id"].extend([int(qid)] * len(rows))
            out["vec_id"].extend(ids[rows].tolist())
            out["cosine"].extend(sims[rows, qi].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )


def hard_negatives(ds, query_ids, query_vectors, query_labels, k: int = 5,
                   id_column: str = "vec_id", vec_column: str = "embedding",
                   label_column: str = "label"):
    """Top-k highest-cosine DIFFERENT-label neighbours per query — the
    hard-negative mining pass of a contrastive-embedding training pipeline.
    Same shape as :func:`knn_bruteforce` (queries broadcast once, per-batch
    matmul + local top-k, tiny per-query global reduce); the label
    constraint is a vectorized mask inside the scorer, not a post-filter,
    so each batch still contributes exactly k candidates per query."""
    import ray

    from fhirflat_ray.functions.util import worker_cached_stage

    ref = ray.put(
        {
            "ids": query_ids,
            "vectors": np.asarray(query_vectors),
            "labels": np.asarray(query_labels),
        }
    )
    scored = ds.map_batches(
        worker_cached_stage(
            HardNegativeScorer,
            queries_ref=ref,
            id_column=id_column,
            vec_column=vec_column,
            label_column=label_column,
            k=k,
        ),
        batch_format="pyarrow",
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(global_topk, batch_format="pandas")


# ------------------------------------------------- MMR diverse selection


class _MmrScorer:
    """Per-batch MMR scoring for one selection round: score = lam * cos(q, d)
    - (1 - lam) * max cos(d, s) over the already-selected set (broadcast —
    at most k-1 vectors). Emits the batch-local best row only (id, score,
    vector), so the global reduce sees one row per block."""

    def __init__(self, state_ref, id_column="vec_id", vec_column="embedding"):
        import ray

        st = ray.get(state_ref) if not isinstance(state_ref, dict) else state_ref
        # float64 throughout: the oracle casts to DOUBLE[] (see the
        # nearest_eval_vec note — float32 cosine error ~1e-6 can flip an
        # argmax between near-tied candidates)
        self.q = _normalize(np.asarray(st["query"], dtype=np.float64)[None, :])[0]
        sel = st["selected"]
        self.sel = _normalize(np.asarray(sel, dtype=np.float64)) if len(sel) else None
        self.sel_ids = np.asarray(st["selected_ids"], dtype=np.int64)
        self.lam = float(st["lam"])
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = _matrix(batch[self.vec_column])
        mat = _normalize(raw.astype(np.float64))
        rel = mat @ self.q
        pen = (mat @ self.sel.T).max(axis=1) if self.sel is not None else 0.0
        score = self.lam * rel - (1.0 - self.lam) * pen
        mask = ~np.isin(ids, self.sel_ids)
        if not mask.any():
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "vec": pa.array([], pa.list_(pa.float32())),
                }
            )
        # batch-local argmax with min-id tie-break (stable under masking)
        s = np.where(mask, score, -np.inf)
        best = np.lexsort((ids, -s))[0]
        # carry the ORIGINAL float32 vector (== the stored column value the
        # oracle reads), not the normalized copy — the next round's penalty
        # must start from identical bytes on both sides
        return pa.table(
            {
                "vec_id": pa.array([int(ids[best])], pa.int64()),
                "score": pa.array([float(score[best])], pa.float64()),
                "vec": pa.array([raw[best].astype(np.float32)]),
            }
        )


def mmr_select(ds, query_vector, k: int = 3, lam: float = 0.7,
               id_column: str = "vec_id", vec_column: str = "embedding") -> pa.Table:
    """Maximal-marginal-relevance selection of ``k`` diverse, relevant
    vectors (Carbonell & Goldstein 1998) — the diverse-example curation
    primitive. Each round is ONE map-only corpus pass: the query and the
    (at most k-1) already-selected vectors broadcast down, every batch
    emits its single best candidate, the driver reduces blocks-many rows.
    No shuffle of vector data, ever; k passes total.

    Returns ``(sel_rank, vec_id)`` — ints only, so comparisons are
    float-rounding-proof.
    """
    import ray

    from fhirflat_ray.functions.util import collect_small_table, worker_cached_stage

    selected: list[np.ndarray] = []
    selected_ids: list[int] = []
    for _ in range(k):
        ref = ray.put(
            {
                "query": np.asarray(query_vector, dtype=np.float64),
                "selected": np.stack(selected) if selected else np.zeros((0, len(query_vector))),
                "selected_ids": np.asarray(selected_ids, dtype=np.int64),
                "lam": lam,
            }
        )
        cands = collect_small_table(
            ds.map_batches(
                worker_cached_stage(
                    _MmrScorer, state_ref=ref, id_column=id_column, vec_column=vec_column
                ),
                batch_format="pyarrow",
            )
        )
        if cands.num_rows == 0:
            break
        cid = cands["vec_id"].to_numpy(zero_copy_only=False)
        cs = cands["score"].to_numpy(zero_copy_only=False)
        best = np.lexsort((cid, -cs))[0]
        selected_ids.append(int(cid[best]))
        selected.append(np.asarray(cands["vec"][best].as_py(), dtype=np.float64))
    return pa.table(
        {
            "sel_rank": pa.array(np.arange(1, len(selected_ids) + 1), pa.int64()),
            "vec_id": pa.array(selected_ids, pa.int64()),
        }
    )
