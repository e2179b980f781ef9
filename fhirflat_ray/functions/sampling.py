"""Deterministic hash-based sampling and train/val/test splitting.

The reference engine has no sampling machinery; these are the corpus ops a
large-scale training-data pipeline needs: a stable, engine-independent
assignment of every record to a split (or into/out of a sample) that is
reproducible across runs, cluster sizes and languages. Reproducibility
comes from hashing a record id rather than from RNG state, so re-running
the pipeline — or running it on a differently-partitioned copy of the data
— assigns every record identically.

The hash is a 32-bit multiplicative (Knuth) hash written entirely in
int64-safe arithmetic::

    h(id) = ((id % 2^31) * 2654435761) % 2^32

so the SAME expression evaluates vectorized in numpy (no uint64 ops — they
are pathologically slow on some hosts) and in ANSI SQL (no int64 overflow:
2^31 * 2654435761 < 2^63), which makes every sampling query fully
oracle-checkable against DuckDB. Split thresholds are integer fractions of
2^32 (``percent * 2^32 // 100``) so both sides compute them exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761
MOD31 = 1 << 31
MOD32 = 1 << 32


def hash32(ids: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit multiplicative hash of an int64 id array."""
    ids = np.asarray(ids, dtype=np.int64)
    return ((ids % MOD31) * KNUTH) % MOD32


def hash32_sql(id_expr: str) -> str:
    """The identical hash as an ANSI-SQL expression over ``id_expr``."""
    return f"(({id_expr} % {MOD31}) * {KNUTH}) % {MOD32}"


def split_thresholds(ratios: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """Cumulative integer thresholds on the 2^32 hash space.

    ``ratios`` are ``(label, percent)`` pairs summing to 100; thresholds are
    exact integers (``cum_percent * 2^32 // 100``) so numpy and SQL agree
    bit-for-bit.
    """
    total = sum(p for _, p in ratios)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    out, cum = [], 0
    for label, pct in ratios:
        cum += pct
        out.append((label, cum * MOD32 // 100))
    return out


def split_indices(ids: np.ndarray, ratios: list[tuple[str, int]]) -> np.ndarray:
    """Vectorized split index per id (position into the ratio labels)."""
    th = split_thresholds(ratios)
    bounds = np.array([b for _, b in th[:-1]], dtype=np.int64)
    return np.searchsorted(bounds, hash32(ids), side="right")


def assign_split(ids: np.ndarray, ratios: list[tuple[str, int]]) -> np.ndarray:
    """Vectorized split label per id (object array of the ratio labels)."""
    labels = np.array([l for l, _ in ratios], dtype=object)
    return labels[split_indices(ids, ratios)]


def hash_split(ds, id_column: str, ratios: list[tuple[str, int]],
               split_column: str = "split"):
    """Add a deterministic ``split`` column to a Dataset.

    Map-only (no shuffle): each batch hashes its own ids, so the assignment
    is independent of partitioning and cluster size — the property that
    makes the split stable on a 256-node run of the same corpus. The label
    column is built as one Arrow ``take`` over the tiny label vector — no
    per-row Python string materialization.
    """
    import pyarrow.compute as pc

    labels_pa = pa.array([l for l, _ in ratios], pa.string())

    def add(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        idx = split_indices(ids, ratios)
        col = pc.take(labels_pa, pa.array(idx, pa.int64()))
        return batch.append_column(split_column, col)

    return ds.map_batches(add, batch_format="pyarrow")


def hash_sample(ds, id_column: str, percent: int):
    """Keep a deterministic ``percent``-of-corpus sample (map-only filter)."""
    bound = percent * MOD32 // 100

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        mask = hash32(ids) < bound
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
