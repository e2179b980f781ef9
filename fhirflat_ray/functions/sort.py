"""Range-partitioned global sort (the terasort shape).

The engine's other ordered operators deliberately avoid a global sort
(``streaming_topk``, hash-rank prefix scans); this module is for when the
ORDER ITSELF is the product — curriculum-ordered training shards, sorted
exports, merge-ready runs. The classic distributed recipe (public since
TeraSort / Dewitt et al.):

1. **Sample** the key column at a fixed hash-derived rate (block-invariant,
   so the same rows are sampled on any partitioning) — one narrow map pass.
2. **Split points** = quantiles of the sorted sample on the driver. Sampled
   splits keep ranges balanced under SKEWED key distributions, where the
   fixed-width buckets of ``global_running`` would collapse into one hot
   bucket.
3. **Count pass** (map-only, key column only): exact per-range row counts;
   the driver folds them into exclusive prefix offsets (bounded: one row
   per range).
4. **One range shuffle**: each range sorts locally by ``(key, *tiebreak)``
   and adds its offset — every row gets its exact global rank with ONE
   all-to-all over the data, and the output ranges are contiguous key
   intervals, so concatenating them in range order IS the sorted table.

Exactness: ranks do not depend on where the splits landed (splits only
balance work); ties of the key sort within one range because assignment is
by key value. Rows with equal ``(key, *tiebreak)`` would be orderable
either way — callers pass a unique tiebreak for full determinism.

Scale note: at 100 TB the sample pass reads only the key column
(``columns=`` pruned reads upstream) and the collected sample is
``rate x n`` keys — tune ``sample_rate`` so that stays driver-bounded
(a 2^-16 rate over 10^12 rows is ~15M keys); the count table is one row
per range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MIX = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as signed int64


def _key_bits(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """int64 bit-pattern view of a numeric/timestamp key column (for the
    deterministic sample hash; signed int64 math only — unsigned numpy ops
    are pathologically slow on this host, see the codec modules)."""
    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        vals = arr.to_numpy(zero_copy_only=False)
    else:
        vals = np.asarray(arr)
    if vals.dtype == np.float64:
        return vals.view(np.int64)
    return vals.astype(np.int64)


def _is_string_key(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def _string_key_hash(vocab: pa.Array) -> np.ndarray:
    """Deterministic int64 siphash of distinct string/binary key values
    (``pandas.util.hash_array``: C-vectorized, process-stable — the same
    primitive the dedup family uses for content hashing)."""
    return pd.util.hash_array(
        np.asarray(vocab.to_pylist(), dtype=object)
    ).view(np.int64)


def _sort_plan(
    ds,
    key_col: str,
    n_ranges: int,
    sample_rate_log2: int,
    splits: np.ndarray | None = None,
) -> dict:
    """Shared planning passes for the range sorts: sampled split points plus
    exact per-range counts → exclusive prefix offsets. Both passes read ONLY
    the key column (``select_columns`` pushes into storage-backed scans).
    Returns ``assign`` (batch → batch + ``__range``), ``splits``,
    ``range_ids``/``counts``/``offsets`` (parallel, sorted by range id) and
    ``total``. Deterministic for identical input (hash-rate sampling).

    ``splits``: precomputed split points (a resumed run reuses the boundaries
    recorded in its plan manifest instead of resampling) — skips the sample
    pass; the count pass still runs (counts are a pure function of input +
    splits)."""
    from fhirflat_ray.functions.util import collect_small_table

    mask = np.int64((1 << sample_rate_log2) - 1)

    sch = ds.schema()  # Ray Data schema wrapper: parallel .names / .types
    key_type = dict(zip(sch.names, sch.types))[key_col]
    if not isinstance(key_type, pa.DataType) or not (
        _is_string_key(key_type)
        or pa.types.is_integer(key_type)
        or pa.types.is_floating(key_type)
        or pa.types.is_timestamp(key_type)
        or pa.types.is_date(key_type)
    ):
        # fail up front with the type named — a non-Arrow schema (e.g. a
        # pandas-block dataset) or an unsupported Arrow type would otherwise
        # fall through to the numeric path and die deep in _key_bits with an
        # opaque astype error
        raise ValueError(
            f"range_partition_sort: unsupported key type {key_type!r} for "
            f"column {key_col!r} — numeric, timestamp/date, or string/binary "
            "Arrow types are supported"
        )
    string_key = _is_string_key(key_type)

    def sample(b: pa.Table) -> pa.Table:
        # per-batch distinct: sampling is all-or-nothing per key VALUE, so
        # a heavily duplicated key would otherwise ship one sample row per
        # duplicate and could flood the driver collect — deduped, a hot
        # value contributes at most one row per block
        if string_key:
            vocab = pc.unique(pc.drop_null(b[key_col].combine_chunks()))
            h = _string_key_hash(vocab) * _MIX
            return pa.table(
                {key_col: vocab.filter(pa.array(((h >> np.int64(17)) & mask) == 0))}
            )
        bits = _key_bits(b[key_col])
        h = bits * _MIX  # wraps mod 2^64: deterministic mix
        keep = ((h >> np.int64(17)) & mask) == 0
        kept = b[key_col].filter(pa.array(keep))
        return pa.table({key_col: pc.unique(kept)})

    if splits is None:
        sampled = collect_small_table(
            ds.select_columns([key_col]).map_batches(sample, batch_format="pyarrow")
        )
        if sampled.num_rows > 50_000_000:
            raise ValueError(
                f"split sample of {sampled.num_rows} keys exceeds the driver "
                "budget — raise sample_rate_log2 (each +1 halves the sample)"
            )
        # layout-independence is load-bearing: sample dedup is per-BATCH only,
        # so a key sampled in k blocks appears k times here — np.unique makes
        # the split points a function of the sampled value SET alone, identical
        # under any block layout / parallelism. The parquet sink's resume
        # contract (skip ranges whose file exists) depends on this: a resumed
        # run on a differently-sized cluster must compute the same boundaries.
        # (The sink additionally RECORDS the splits in its plan manifest and
        # reuses them on resume, so even a changed sample_rate or input would
        # be caught rather than silently re-planned.)
        # Trade: splits balance by distinct keys, not row counts; a hot key
        # lands in one range either way (assignment is by value) and the count
        # pass reports exact per-range sizes.
        keys = np.unique(sampled[key_col].to_numpy(zero_copy_only=False))
        if len(keys) == 0:
            splits = keys[:0]
        else:
            idx = (np.arange(1, n_ranges) * len(keys)) // n_ranges
            splits = np.unique(keys[idx])

    def assign(b: pa.Table) -> pa.Table:
        if string_key:
            # binary-search the per-batch VOCAB, not the rows: transcripts
            # repeat conv_id ~turns-per-conversation times, so the Python
            # string comparisons inside object-dtype searchsorted run once
            # per distinct value; rows get their range via one int take
            col = b[key_col].combine_chunks()
            if col.null_count:
                raise ValueError(
                    f"range_partition_sort: string key {key_col!r} contains "
                    "nulls — a null has no place in the key order; filter or "
                    "fill first"
                )
            enc = col.dictionary_encode()
            vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            rngv = np.searchsorted(splits, vocab, side="right").astype(np.int64)
            rng = rngv[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            kv = b[key_col].to_numpy(zero_copy_only=False)
            rng = np.searchsorted(splits, kv, side="right").astype(np.int64)
        return b.append_column("__range", pa.array(rng, pa.int64()))

    # exact per-range counts (narrow pass) -> exclusive prefix offsets
    def count_partial(b: pa.Table) -> pa.Table:
        return (
            assign(b.select([key_col]))
            .select(["__range"])
            .group_by(["__range"])
            .aggregate([([], "count_all")])
        )

    cnt = (
        collect_small_table(
            ds.select_columns([key_col]).map_batches(
                count_partial, batch_format="pyarrow"
            )
        )
        .to_pandas()
        .groupby("__range", sort=True)["count_all"]
        .sum()
    )
    range_ids = cnt.index.to_numpy().astype(np.int64)
    counts = cnt.to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return {
        "assign": assign,
        "splits": splits,
        "range_ids": range_ids,
        "counts": counts,
        "offsets": offsets,
        "total": int(counts.sum()),
        "string_key": string_key,
    }


def range_partition_sort(
    ds,
    key_col: str,
    tiebreak_cols: list[str],
    n_ranges: int | None = None,
    sample_rate_log2: int = 6,
    n_shards: int | None = None,
    pin_input: bool = True,
):
    """Globally sort ``ds`` by ``(key_col, *tiebreak_cols)`` ascending via
    sampled range partitioning. Returns the input rows plus ``pos`` (exact
    0-based global rank) and, when ``n_shards`` is given, ``shard`` —
    contiguous balanced shards ``pos * n_shards // total`` (SQL-mirrorable
    integer math).

    ``tiebreak_cols`` must make ``(key_col, *tiebreak_cols)`` UNIQUE for a
    deterministic output: rows that compare equal on the full sort key are
    ordered arbitrarily — the shuffle assembles each range group in
    nondeterministic order and the per-range Arrow sort is not stability-
    guaranteed, so no sort stability could restore determinism for exact
    ties. (Ranks of non-tied rows are exact either way.)

    ``sample_rate_log2``: sample ~1/2^k of distinct key values (hash of the
    key's bit pattern — siphash for string/binary keys — so the sample is
    block- and duplicate-invariant).

    Key types: numeric, timestamp, and string/binary (non-null; string
    order is codepoint order, which matches UTF-8 byte order and DuckDB's
    binary collation).

    ``pin_input``: three passes read the input (sample, exact counts, the
    shuffle). ``True`` materializes the input once so a lazy upstream
    pipeline — e.g. a dedup shuffle — does not re-execute per pass
    (measured: curriculum_export paid its dedup 3x); the corpus then sits
    in the (spillable) object store for the sort's duration, so the store
    holds ~2x the data at the shuffle barrier. ``False`` re-executes the
    input plan per pass — the right shape when the input is a
    storage-backed read: the sample and count passes re-read ONLY the key
    column (``select_columns`` pushes into the parquet scan) and the store
    never holds more than the shuffle itself, which is how a 100 TB sort
    must run (measured here: a 128M-row/29 GB sort overflowed the object
    store AND local disk when pinned, and streamed when not). Requires a
    deterministic, re-executable input plan."""
    from fhirflat_ray.functions.util import default_num_buckets

    if n_ranges is None:
        n_ranges = default_num_buckets()

    if pin_input:
        ds = ds.materialize()

    plan = _sort_plan(ds, key_col, n_ranges, sample_rate_log2)
    assign = plan["assign"]
    range_ids, offsets, total = plan["range_ids"], plan["offsets"], plan["total"]

    sort_cols = [key_col] + list(tiebreak_cols)

    def per_range(g: pa.Table) -> pa.Table:
        return _finish_range(g, sort_cols, range_ids, offsets, total, n_shards)

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__range")
        .map_groups(per_range, batch_format="pyarrow")
    )


def _finish_range(
    g: pa.Table,
    sort_cols: list[str],
    range_ids: np.ndarray,
    offsets: np.ndarray,
    total: int,
    n_shards: int | None,
) -> pa.Table:
    """Finish one range group: local sort + exact global rank (+ shard).

    Pure Arrow: a pandas round-trip here turns every string payload into
    Python objects (3-5x memory on text-heavy tables — measured tipping a
    128M-row/29 GB sort into fallback allocations that filled the disk).
    Arrow's multi-key sort needs no stability because callers pass a unique
    tiebreak (see ``range_partition_sort``). Shared by the in-memory sort
    and the parquet sink so the rank/shard math lives in ONE place."""
    idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in sort_cols])
    g = g.take(idx)
    rid = g["__range"][0].as_py()
    off = int(offsets[np.searchsorted(range_ids, rid)])
    pos = off + np.arange(g.num_rows, dtype=np.int64)
    g = g.append_column("pos", pa.array(pos, pa.int64()))
    if n_shards is not None:
        g = g.append_column("shard", pa.array((pos * n_shards) // total, pa.int64()))
    return g.drop_columns(["__range"])


def range_partition_sort_to_parquet(
    ds,
    out_dir: str,
    key_col: str,
    tiebreak_cols: list[str],
    n_ranges: int | None = None,
    sample_rate_log2: int = 6,
    n_shards: int | None = None,
    n_waves: int = 1,
    resume: bool = False,
) -> dict:
    """External (wave-sharded) global sort with a parquet sink — the shape
    for sorting data LARGER than the cluster's aggregate object store.

    ``range_partition_sort`` runs ONE all-to-all, so the store must hold
    the whole corpus at the shuffle barrier (measured boundary: a
    29 GB sort against a 37.6 GB single-node store grows plasma fallback
    past 200 GB and aborts — see BASELINE.md). Here the range-id space is
    cut into ``n_waves`` contiguous slices and each wave shuffles ONLY its
    slice (~data/n_waves in flight), then writes every range as one
    parquet file before the next wave starts — the classic multi-pass
    external sort, with the extra passes reading from storage (assign is
    recomputed per wave; the planning passes read only the key column).

    Output contract: ``part-{range:06d}.parquet`` files whose LEXICOGRAPHIC
    name order is the global key order; rows carry exact global ``pos``
    (and ``shard`` when ``n_shards`` is given). Files land atomically
    (tmp + rename, the segment-write discipline), so a crashed run leaves
    only complete files. The first run records its plan in
    ``_sort_plan.json`` + ``_sort_splits.parquet`` inside ``out_dir``;
    ``resume=True`` loads that manifest, verifies the sort parameters
    (key/tiebreak/n_shards/sample_rate/n_ranges — error on mismatch) and
    REUSES the recorded split points instead of resampling, so a resumed
    run on a differently-sized cluster (where the ``n_ranges`` default is
    CPU-count-dependent) cannot silently compute different boundaries.
    Completed ranges are then dropped from the wave BEFORE the exchange
    (they pay only the map-side assign).
    Requires a deterministic, re-executable input plan (storage-backed
    reads; same contract as ``pin_input=False``), and ``out_dir`` must
    be SHARED storage on a multi-node cluster (range tasks write from
    workers, the driver checks existence — the same contract as the
    encoded segment store).

    Returns a manifest dict: total rows, written/skipped file lists, and
    the per-range row counts."""
    import json
    import os

    import pyarrow.parquet as pq

    from fhirflat_ray.functions.util import collect_small_table, default_num_buckets

    if n_waves < 1:
        raise ValueError("n_waves must be >= 1")

    os.makedirs(out_dir, exist_ok=True)
    plan_path = os.path.join(out_dir, "_sort_plan.json")
    splits_path = os.path.join(out_dir, "_sort_splits.parquet")

    params = {
        "key_col": key_col,
        "tiebreak_cols": list(tiebreak_cols),
        "n_shards": n_shards,
        "sample_rate_log2": sample_rate_log2,
    }
    recorded_splits = None
    if resume and os.path.exists(plan_path):
        with open(plan_path) as fh:
            recorded = json.load(fh)
        rec_params = {k: recorded.get(k) for k in params}
        mismatched = [k for k, v in params.items() if rec_params[k] != v]
        if n_ranges is not None and recorded.get("n_ranges") != n_ranges:
            mismatched.append("n_ranges")  # None = "use the recorded plan"
        if mismatched:
            raise ValueError(
                f"range_partition_sort_to_parquet resume: {plan_path} was "
                f"written with different parameters ({mismatched}): recorded "
                f"{recorded}, got {dict(params, n_ranges=n_ranges)} — resuming "
                "under a changed plan would produce overlapping/missing key "
                "ranges; use a fresh out_dir or matching parameters"
            )
        n_ranges = int(recorded["n_ranges"])
        sample_rate_log2 = int(recorded["sample_rate_log2"])
        recorded_splits = (
            pq.read_table(splits_path)["splits"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
    elif n_ranges is None:
        n_ranges = max(default_num_buckets(), n_waves)

    plan = _sort_plan(ds, key_col, n_ranges, sample_rate_log2, splits=recorded_splits)
    assign = plan["assign"]
    range_ids, offsets, total = plan["range_ids"], plan["offsets"], plan["total"]
    sort_cols = [key_col] + list(tiebreak_cols)
    n_rng = len(plan["splits"]) + 1

    if recorded_splits is None:
        # record the plan BEFORE any range file lands (atomic, splits first):
        # a crash between here and the first part file still resumes against
        # the recorded boundaries, never against a re-sampled plan
        tmp = f"{splits_path}.tmp-{os.getpid()}"
        pq.write_table(pa.table({"splits": pa.array(plan["splits"])}), tmp)
        os.replace(tmp, splits_path)
        tmp = f"{plan_path}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(
                dict(params, n_ranges=n_ranges, n_splits=len(plan["splits"])), fh
            )
        os.replace(tmp, plan_path)

    def part_path(rid: int) -> str:
        return os.path.join(out_dir, f"part-{rid:06d}.parquet")

    written: list[str] = []
    skipped: list[str] = []
    per_wave = (n_rng + n_waves - 1) // n_waves
    for w in range(n_waves):
        lo, hi = w * per_wave, min((w + 1) * per_wave, n_rng)
        if lo >= hi:
            break

        # resume skips completed ranges BEFORE the shuffle (driver-side
        # existence check): their rows are filtered out of the wave, so a
        # resumed run pays only the map-side assign for them, not the
        # exchange. The worker-side check below stays as a race guard.
        done = (
            np.asarray(
                [r for r in range(lo, hi) if os.path.exists(part_path(r))],
                dtype=np.int64,
            )
            if resume
            else np.empty(0, dtype=np.int64)
        )
        skipped.extend(part_path(int(r)) for r in done)
        if len(done) == hi - lo:
            continue  # whole wave already durable

        def wave_assign(b: pa.Table, lo=lo, hi=hi, done=done) -> pa.Table:
            t = assign(b)
            rng = t["__range"]
            m = pc.and_(pc.greater_equal(rng, lo), pc.less(rng, hi))
            if len(done):
                vals = rng.to_numpy(zero_copy_only=False)
                pos = np.searchsorted(done, vals)
                is_done = (pos < len(done)) & (done[np.clip(pos, 0, len(done) - 1)] == vals)
                m = pc.and_(m, pa.array(~is_done))
            return t.filter(m)

        def write_range(g: pa.Table) -> pa.Table:
            rid = int(g["__range"][0].as_py())
            path = part_path(rid)
            if resume and os.path.exists(path):
                return pa.table(
                    {"rid": pa.array([rid], pa.int64()),
                     "rows": pa.array([g.num_rows], pa.int64()),
                     "skipped": pa.array([True])}
                )
            idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in sort_cols])
            g = g.take(idx)
            off = int(offsets[np.searchsorted(range_ids, rid)])
            pos = off + np.arange(g.num_rows, dtype=np.int64)
            g = g.append_column("pos", pa.array(pos, pa.int64()))
            if n_shards is not None:
                g = g.append_column(
                    "shard", pa.array((pos * n_shards) // total, pa.int64())
                )
            g = g.drop_columns(["__range"])
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(g, tmp)
            os.replace(tmp, path)  # atomic: retries/crashes never leave partials
            return pa.table(
                {"rid": pa.array([rid], pa.int64()),
                 "rows": pa.array([g.num_rows], pa.int64()),
                 "skipped": pa.array([False])}
            )

        # collect_small_table is the wave BARRIER: one tiny record per range
        # returns; the next wave's shuffle starts only after this one's
        # files are durable
        rec = collect_small_table(
            ds.map_batches(wave_assign, batch_format="pyarrow")
            .groupby("__range")
            .map_groups(write_range, batch_format="pyarrow")
        )
        if rec.num_rows:
            for row in rec.to_pylist():
                (skipped if row["skipped"] else written).append(part_path(row["rid"]))

    return {
        "total_rows": total,
        "n_ranges": n_rng,
        "n_waves": n_waves,
        "files_written": sorted(written),
        "files_skipped": sorted(skipped),
        "range_counts": dict(zip(range_ids.tolist(), plan["counts"].tolist())),
    }
