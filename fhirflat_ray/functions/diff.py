"""Keyed table reconciliation (diff) with a digest-narrowed shuffle.

``table_diff`` compares two keyed datasets (a snapshot vs the live table,
yesterday's export vs today's, two replicas) and reports, per key, whether
the row was ``added``, ``removed``, or ``changed``. The reference's only
integrity machinery is folder-level SHA-256 checksums computed AFTER a full
rewrite (/root/reference/fhirflat/ingest.py:381-432) — it can say *that*
two folders differ, never *which rows*; this operator is the row-granular
form a lakehouse needs to audit a merge or replicate incrementally.

Scale shape: each side maps to ``(key, digest)`` where the digest is a
64-bit siphash of the payload columns (``pandas.util.hash_pandas_object``,
C-vectorized, deterministic across processes — the same primitive
``bucketed_map_groups`` keys on). The all-to-all exchange therefore ships
16 bytes per row regardless of payload width; full rows never shuffle. The
combine co-partitions both sides by key hash (coarse buckets, Python per
bucket) and resolves statuses with one vectorized outer merge per bucket.
Unchanged keys — the overwhelming majority in any incremental scenario —
are dropped inside the bucket, so the result is change-proportional.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from fhirflat_ray.functions.util import bucketed_map_groups

#: side markers — int8 through the shuffle, never strings
_OLD, _NEW = np.int8(0), np.int8(1)


def _digest_side(payload_cols: list[str], key: str, side: np.int8):
    """Per-batch (key, digest, side) projection — the only bytes that
    shuffle."""
    import pandas.util as pdu

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        dig = pdu.hash_pandas_object(batch[payload_cols], index=False).to_numpy()
        return pd.DataFrame(
            {
                key: batch[key].to_numpy(),
                "__digest": dig.view(np.int64),
                "__side": np.full(len(batch), side, dtype=np.int8),
            }
        )

    return fn


def table_diff(old_ds, new_ds, key: str, payload_cols: list[str]):
    """Diff two datasets sharing ``key`` (unique per side) and
    ``payload_cols``; returns a Dataset of ``(key, status)`` rows where
    status is ``'added'`` (key only in new), ``'removed'`` (key only in
    old) or ``'changed'`` (both sides, payload digests differ). Equal rows
    produce no output."""
    old_d = old_ds.map_batches(
        _digest_side(payload_cols, key, _OLD), batch_format="pandas"
    )
    new_d = new_ds.map_batches(
        _digest_side(payload_cols, key, _NEW), batch_format="pandas"
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["__side"] == _OLD]
        n = g[g["__side"] == _NEW]
        m = o.merge(n, on=key, how="outer", suffixes=("_o", "_n"))
        status = np.select(
            [
                m["__side_o"].isna().to_numpy(),
                m["__side_n"].isna().to_numpy(),
                (m["__digest_o"] != m["__digest_n"]).to_numpy(),
            ],
            ["added", "removed", "changed"],
            default="",
        )
        keep = status != ""
        return pd.DataFrame(
            {
                key: m[key].to_numpy()[keep],
                "status": status[keep],
            }
        )

    return bucketed_map_groups(old_d.union(new_d), [key], resolve)
