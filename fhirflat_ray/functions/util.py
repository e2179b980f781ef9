"""Small shared Dataset helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd


def distinct_rows(ds, keys: list[str], num_buckets: int | None = None):
    """Distributed DISTINCT over ``keys`` that stays vectorized at millions
    of distinct values.

    Neither Ray Data built-in scales here: ``groupby(keys).map_groups`` and
    ``groupby(keys).aggregate`` both pay Python per GROUP, which collapses
    when every row is its own group (measured: 400k-group Count aggregate =
    392 s on 4 CPUs). Instead:

    1. per-batch ``drop_duplicates`` (vectorized) shrinks the stream early;
    2. rows are hash-bucketed on the key tuple (deterministic pandas
       siphash) — one narrow shuffle with ``num_buckets`` groups total;
    3. per-bucket ``drop_duplicates`` (vectorized) finishes the job —
       Python is paid per BUCKET, not per distinct value.
    """
    import pandas.util as pdu

    if num_buckets is None:
        import ray

        num_buckets = max(4, min(256, int(ray.cluster_resources().get("CPU", 4)) * 4))
    nb = np.int64(num_buckets)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.drop_duplicates(subset=keys)
        h = pdu.hash_pandas_object(batch[keys], index=False).to_numpy()
        out = batch.copy()
        out["__bucket"] = (h % np.uint64(nb)).astype(np.int64)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=keys).drop(columns="__bucket")

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
