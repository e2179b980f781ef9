"""Wave-sharded bucket exchanges: groupby and hash join for data LARGER
than the cluster's aggregate object store.

``range_partition_sort_to_parquet`` (functions/sort.py) solved the
one-shot-shuffle boundary for SORT: a single all-to-all must hold the whole
corpus in the object store at the barrier (measured single-node boundary:
data ≈ 0.5-0.8× store capacity grows plasma fallback past 200 GB and
aborts — BASELINE.md). This module generalizes that escape hatch to the
other two all-to-all families — bucketed groupbys
(:func:`fhirflat_ray.functions.util.bucketed_map_groups`) and distributed
hash joins — with the same discipline:

- rows get a DETERMINISTIC bucket id (pandas siphash of the key, stable
  across processes / block layouts — no sampling pass needed, unlike sort);
- the bucket-id space is cut into ``n_waves`` contiguous slices; each wave
  filters to its slice map-side and shuffles ONLY ~data/n_waves rows;
- every bucket's result lands as ONE atomic parquet file
  (``part-{bucket:06d}.parquet``, tmp + rename) before the next wave
  starts, so a crashed run leaves only complete buckets;
- a plan manifest (``_exchange_plan.json``) records the bucket count and
  operator parameters; ``resume=True`` verifies it (error on mismatch —
  a changed ``num_buckets`` would silently re-route keys) and drops
  completed buckets from the wave BEFORE the exchange.

Cost model: each wave re-executes the INPUT plan (map-side pass over
everything, exchange over 1/n_waves) — the classic multi-pass external
algorithm trade. Measured at 128M docs / ~22.6 GB raw (BASELINE.md):
one-shot 63.9 s (heavy spill), 2 waves 40.4 s (in-flight fits the
store, no spill), 4 waves 70.8 s, 8 waves 130.3 s — so pick the
SMALLEST ``n_waves`` whose slice fits the aggregate object store;
more waves only add read passes. Inputs must therefore be deterministic, re-executable
plans (storage-backed reads; the ``pin_input=False`` contract of
functions/sort.py), and ``out_dir`` must be shared storage on a multi-node
cluster (bucket tasks write from workers, the driver checks existence —
the encoded-segment-store contract).

Reference scope note: the reference engine (globaldothealth/fhirflat)
processes per-resource pandas frames in one process and has no exchange at
all (/root/reference/fhirflat/ingest.py:385-447 loops dictionaries); these
operators exist for the 100 TB target the graft is designed for.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _part_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"part-{bucket:06d}.parquet")


def _atomic_write(tbl: pa.Table, path: str) -> None:
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic: retries/crashes never leave partials


def _load_or_record_plan(out_dir: str, params: dict, resume: bool) -> dict:
    """First run records ``params`` as ``_exchange_plan.json`` (atomic);
    ``resume=True`` loads and VERIFIES them — resuming under a changed
    bucket count or operator parameters would silently mis-route keys, so
    mismatch is an error, not a re-plan."""
    import glob as _glob

    os.makedirs(out_dir, exist_ok=True)
    plan_path = os.path.join(out_dir, "_exchange_plan.json")
    if resume and os.path.exists(plan_path):
        with open(plan_path) as fh:
            recorded = json.load(fh)
        mismatched = [k for k, v in params.items() if recorded.get(k) != v]
        if mismatched:
            raise ValueError(
                f"wave exchange resume: {plan_path} was written with "
                f"different parameters ({mismatched}): recorded {recorded}, "
                f"got {params} — use a fresh out_dir or matching parameters"
            )
        return recorded
    # FRESH run: own the directory — stale bucket files from a previous
    # (possibly different-plan) run must not pollute read_exchange_output,
    # and per_bucket_write would only overwrite buckets that receive rows
    # this time (the encode_dataset clear-before-write discipline)
    for stale in _glob.glob(os.path.join(out_dir, "part-*.parquet")):
        os.unlink(stale)
    for marker in (os.path.join(out_dir, DONE_MARKER), plan_path):
        try:
            os.unlink(marker)
        except FileNotFoundError:
            pass
    tmp = f"{plan_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(params, fh)
    os.replace(tmp, plan_path)
    return params


def _done_buckets(out_dir: str, lo: int, hi: int, resume: bool) -> np.ndarray:
    if not resume:
        return np.empty(0, dtype=np.int64)
    return np.asarray(
        [b for b in range(lo, hi) if os.path.exists(_part_path(out_dir, b))],
        dtype=np.int64,
    )


def _wave_mask(bucket: np.ndarray, lo: int, hi: int, done: np.ndarray) -> np.ndarray:
    m = (bucket >= lo) & (bucket < hi)
    if len(done):
        pos = np.searchsorted(done, bucket)
        is_done = (pos < len(done)) & (done[np.clip(pos, 0, len(done) - 1)] == bucket)
        m &= ~is_done
    return m


DONE_MARKER = "_exchange_done.json"


def _run_waves(
    make_bucketed_ds,
    per_bucket_write,
    out_dir: str,
    num_buckets: int,
    n_waves: int,
    resume: bool,
) -> dict:
    """Shared wave loop. ``make_bucketed_ds(lo, hi, done)`` returns the
    lazy Dataset of this wave's rows carrying ``__bucket``;
    ``per_bucket_write(group)`` is the map_groups callback that writes one
    bucket file and returns its record row. ``collect_small_table`` is the
    wave BARRIER: one tiny record per bucket returns, and the next wave's
    shuffle starts only after this one's files are durable.

    The exchange's COMMIT POINT is ``_exchange_done.json``, written
    atomically after the last wave (bucket files alone cannot distinguish
    a finished exchange from a crashed one — empty buckets write no
    file). Consumers gate on it via
    :func:`read_exchange_output` ``require_complete=True``; a resumed run
    that finds it (with a matching plan) returns immediately."""
    from fhirflat_ray.functions.util import collect_small_table

    if n_waves < 1:
        raise ValueError("n_waves must be >= 1")
    done_path = os.path.join(out_dir, DONE_MARKER)
    if resume and os.path.exists(done_path):
        with open(done_path) as fh:
            prior = json.load(fh)  # plan already verified against the manifest
        if all(
            os.path.exists(p)
            for p in prior["files_written"] + prior["files_skipped"]
        ):
            return prior
        # a recorded bucket file is missing (damage/partial restore): drop
        # the marker and repair through the normal wave loop
        os.remove(done_path)
    written: list[str] = []
    skipped: list[str] = []
    per_wave = (num_buckets + n_waves - 1) // n_waves
    for w in range(n_waves):
        lo, hi = w * per_wave, min((w + 1) * per_wave, num_buckets)
        if lo >= hi:
            break
        done = _done_buckets(out_dir, lo, hi, resume)
        skipped.extend(_part_path(out_dir, int(b)) for b in done)
        if len(done) == hi - lo:
            continue  # whole wave already durable
        rec = collect_small_table(
            make_bucketed_ds(lo, hi, done)
            .groupby("__bucket")
            .map_groups(per_bucket_write, batch_format="pyarrow")
        )
        for row in rec.to_pylist() if rec.num_rows else []:
            (skipped if row["skipped"] else written).append(
                _part_path(out_dir, row["bucket"])
            )
    manifest = {
        "num_buckets": num_buckets,
        "n_waves": n_waves,
        "files_written": sorted(written),
        "files_skipped": sorted(skipped),
        "complete": True,
    }
    tmp = f"{done_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, done_path)
    return manifest


def _bucket_record(bucket: int, rows: int, was_skipped: bool) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "rows": pa.array([rows], pa.int64()),
            "skipped": pa.array([was_skipped]),
        }
    )


def read_exchange_output(out_dir: str, require_complete: bool = False):
    """The exchange output as a Dataset: only the ``part-*.parquet`` bucket
    files (the plan manifest and any stray tmp files are excluded by
    explicit listing, not reader convention). ``require_complete=True``
    additionally gates on the atomic ``_exchange_done.json`` commit marker
    — a consumer must not read a crashed half-finished exchange as if it
    were the full result."""
    import ray.data as rd

    if require_complete and not os.path.exists(os.path.join(out_dir, DONE_MARKER)):
        raise FileNotFoundError(
            f"exchange at {out_dir!r} has no completion marker "
            f"({DONE_MARKER}) — it never finished; re-run with resume=True"
        )
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    return rd.read_parquet(files)


# ------------------------------------------------------------- groupby


def bucketed_map_groups_to_parquet(
    ds,
    key_cols: list[str],
    fn,
    out_dir: str,
    num_buckets: int | None = None,
    n_waves: int = 1,
    resume: bool = False,
) -> dict:
    """Wave-sharded analogue of
    :func:`fhirflat_ray.functions.util.bucketed_map_groups`: same
    co-partitioning guarantee (``fn`` sees ALL rows of every key hashed
    into its bucket, as one pandas DataFrame), but each wave shuffles only
    ~1/n_waves of the data and every bucket's result is durable parquet —
    the shape for grouped aggregation over data past the object store.
    Returns the manifest dict; read results with
    :func:`read_exchange_output`."""
    import pandas.util as pdu

    from fhirflat_ray.functions.util import default_num_buckets

    nb = int(num_buckets or default_num_buckets())
    _load_or_record_plan(
        out_dir,
        {"kind": "bucketed_map_groups", "num_buckets": nb, "key_cols": list(key_cols)},
        resume,
    )

    def make_bucketed_ds(lo: int, hi: int, done: np.ndarray):
        def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
            h = pdu.hash_pandas_object(batch[key_cols], index=False).to_numpy()
            # sign-bit mask keeps the modulo in signed int64 (unsigned numpy
            # ops are pathologically slow on some hosts — codec discipline)
            bucket = (h.view(np.int64) & np.int64(2**63 - 1)) % np.int64(nb)
            m = _wave_mask(bucket, lo, hi, done)
            out = batch[m].copy()
            out["__bucket"] = bucket[m]
            return out

        return ds.map_batches(add_bucket, batch_format="pandas")

    def per_bucket_write(g: pa.Table) -> pa.Table:
        bucket = int(g["__bucket"][0].as_py())
        path = _part_path(out_dir, bucket)
        if resume and os.path.exists(path):
            return _bucket_record(bucket, g.num_rows, True)
        res = fn(g.to_pandas().drop(columns="__bucket"))
        tbl = pa.Table.from_pandas(res, preserve_index=False)
        _atomic_write(tbl, path)
        return _bucket_record(bucket, tbl.num_rows, False)

    return _run_waves(make_bucketed_ds, per_bucket_write, out_dir, nb, n_waves, resume)


# ------------------------------------------------------------- exact dedup


def exact_dedup_to_parquet(
    ds,
    out_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
    num_buckets: int | None = None,
    n_waves: int = 1,
    resume: bool = False,
) -> dict:
    """Wave-sharded :func:`fhirflat_ray.functions.dedup.exact_dedup`: keep
    the min-``id_column`` representative of every distinct ``column`` value,
    with the exchange sharded so at most ~1/n_waves of the (already
    per-batch pre-reduced) rows are in flight. The shuffle key is the
    64-bit content hash — the exchange never ships more than one row per
    in-batch distinct value. Output rows = the one-shot operator's rows
    exactly (survivor choice is min-id: deterministic)."""
    from fhirflat_ray.functions.dedup import add_content_hash
    from fhirflat_ray.functions.util import default_num_buckets

    nb = int(num_buckets or default_num_buckets())
    _load_or_record_plan(
        out_dir,
        {
            "kind": "exact_dedup",
            "num_buckets": nb,
            "column": column,
            "id_column": id_column,
        },
        resume,
    )

    def make_bucketed_ds(lo: int, hi: int, done: np.ndarray):
        def prepare(batch: pa.Table) -> pa.Table:
            t = add_content_hash(batch, column)
            # per-batch pre-reduce: one row per in-batch distinct hash
            # (vectorized pandas idxmin — shrinks the exchange before it)
            df = t.to_pandas()
            df = df.loc[df.groupby("content_hash", sort=False)[id_column].idxmin()]
            # content_hash is already non-negative (add_content_hash shifts
            # the siphash right by one), so int64 modulo stays in range
            bucket = df["content_hash"].to_numpy() % np.int64(nb)
            m = _wave_mask(bucket, lo, hi, done)
            out = pa.Table.from_pandas(df[m], preserve_index=False)
            return out.append_column("__bucket", pa.array(bucket[m], pa.int64()))

        return ds.map_batches(prepare, batch_format="pyarrow")

    def per_bucket_write(g: pa.Table) -> pa.Table:
        bucket = int(g["__bucket"][0].as_py())
        path = _part_path(out_dir, bucket)
        if resume and os.path.exists(path):
            return _bucket_record(bucket, g.num_rows, True)
        df = g.to_pandas()
        df = df.loc[df.groupby("content_hash", sort=False)[id_column].idxmin()]
        tbl = pa.Table.from_pandas(
            df.drop(columns=["content_hash", "__bucket"]), preserve_index=False
        )
        _atomic_write(tbl, path)
        return _bucket_record(bucket, tbl.num_rows, False)

    return _run_waves(make_bucketed_ds, per_bucket_write, out_dir, nb, n_waves, resume)


# ------------------------------------------------------------- hash join


def hash_join_to_parquet(
    left,
    right,
    out_dir: str,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int | None = None,
    n_waves: int = 1,
    resume: bool = False,
    suffix: str = "_r",
) -> dict:
    """Wave-sharded distributed hash join (``inner`` / ``left_outer``).

    Both sides bucket on a deterministic siphash of the key value
    (name-independent: ``left[on]`` and ``right[right_on]`` hash
    identically when values are equal), union into ONE null-padded common
    schema, and each wave exchanges only its bucket slice; one
    ``pyarrow.Table.join`` (vectorized acero) runs per bucket and lands as
    an atomic parquet file. Right-side non-key columns colliding with left
    names get ``suffix``. Equal-key co-location holds per wave because the
    slice filter is a pure function of the bucket id on BOTH sides.

    This is the escape hatch for ``Dataset.join`` aborting past ~0.5×
    object store (BASELINE.md 128M-row finding) — same result rows, 1/n_waves
    peak exchange footprint. Skew note: a single hot key still lands in one
    bucket; for zipf fact×dim shapes use
    :func:`fhirflat_ray.functions.joins.salted_hash_join` semantics first
    (salt, then wave-join on the salted key)."""
    import pandas.util as pdu

    from fhirflat_ray.functions.util import default_num_buckets

    if how not in ("inner", "left_outer"):
        raise ValueError(f"hash_join_to_parquet: unsupported how={how!r}")
    right_on = right_on or on
    nb = int(num_buckets or default_num_buckets())
    _load_or_record_plan(
        out_dir,
        {
            "kind": "hash_join",
            "num_buckets": nb,
            "on": on,
            "right_on": right_on,
            "how": how,
            "suffix": suffix,
        },
        resume,
    )

    from fhirflat_ray.functions.joins import _dataset_fields

    lfields = _dataset_fields(left)
    rfields = _dataset_fields(right)
    lnames = [f.name for f in lfields]
    key_type = next(f.type for f in lfields if f.name == on)

    # unified schema: left columns + right columns (key cast to the left
    # key's type; non-key collisions renamed with suffix). Each side fills
    # its own columns; the other side's are typed nulls.
    rmap: dict[str, str] = {}  # right source name -> unified name
    ufields = list(lfields)
    for f in rfields:
        if f.name == right_on:
            continue
        uname = f.name + suffix if f.name in lnames else f.name
        rmap[f.name] = uname
        ufields.append(pa.field(uname, f.type))
    if right_on not in lnames:
        ufields.append(pa.field(right_on, key_type))
    unified = pa.schema(
        list(ufields) + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int64())]
    )
    lset = set(lnames)
    # per-bucket right side selects its key under the LEFT key's column when
    # names collide (values land in the same unified column either way)
    r_key_unified = on if right_on == on else right_on

    def _hash_key(vals: np.ndarray) -> np.ndarray:
        if vals.dtype.kind in "iu":
            vals = vals.astype(np.int64)  # dtype-stable across int widths
        return pdu.hash_array(vals)

    def _pad(t: pa.Table, side: int, lo: int, hi: int, done: np.ndarray) -> pa.Table:
        kcol = on if side == 0 else right_on
        keys = t[kcol].combine_chunks() if isinstance(t[kcol], pa.ChunkedArray) else t[kcol]
        kv = keys.to_numpy(zero_copy_only=False)
        h = _hash_key(kv)
        bucket = (h.view(np.int64) & np.int64(2**63 - 1)) % np.int64(nb)
        m = _wave_mask(bucket, lo, hi, done)
        t = t.filter(pa.array(m))
        bucket = bucket[m]
        n = t.num_rows
        cols = []
        for f in unified:
            if f.name == "__side":
                cols.append(pa.array(np.full(n, side, dtype=np.int8), pa.int8()))
            elif f.name == "__bucket":
                cols.append(pa.array(bucket, pa.int64()))
            elif side == 0 and f.name in lset:
                cols.append(t[f.name].cast(f.type))
            elif side == 1 and f.name == r_key_unified:
                cols.append(t[right_on].cast(f.type))
            elif side == 1 and f.name in rmap.values():
                src = next(s for s, u in rmap.items() if u == f.name)
                cols.append(t[src].cast(f.type))
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(cols, schema=unified)

    def make_bucketed_ds(lo: int, hi: int, done: np.ndarray):
        lmapped = left.map_batches(
            lambda b: _pad(b, 0, lo, hi, done), batch_format="pyarrow"
        )
        rmapped = right.map_batches(
            lambda b: _pad(b, 1, lo, hi, done), batch_format="pyarrow"
        )
        return lmapped.union(rmapped)

    out_left = [f for f in lfields]
    out_right = [pa.field(rmap[f.name], f.type) for f in rfields if f.name != right_on]
    join_type = "inner" if how == "inner" else "left outer"

    def per_bucket_write(g: pa.Table) -> pa.Table:
        bucket = int(g["__bucket"][0].as_py())
        path = _part_path(out_dir, bucket)
        if resume and os.path.exists(path):
            return _bucket_record(bucket, g.num_rows, True)
        side = g["__side"]
        lt = g.filter(pc.equal(side, 0)).select([f.name for f in out_left])
        rt = g.filter(pc.equal(side, 1)).select(
            [r_key_unified] + [f.name for f in out_right]
        )
        joined = lt.join(
            rt,
            keys=[on],
            right_keys=[right_on if right_on != on else on],
            join_type=join_type,
        )
        # pin output column ORDER (acero's is join-plan-dependent)
        joined = joined.select([f.name for f in out_left] + [f.name for f in out_right])
        _atomic_write(joined, path)
        return _bucket_record(bucket, joined.num_rows, False)

    return _run_waves(make_bucketed_ds, per_bucket_write, out_dir, nb, n_waves, resume)
