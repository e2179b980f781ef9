"""Aggregate pushdown into the encoded segment format.

Three aggregates run directly over encoded segments, skipping decode work in
proportion to how well the column compressed — the payoff of owning the
format (the reference computes its folder-level stats by re-reading the
written parquet, /root/reference/fhirflat/ingest.py:397-432; here the encode
pass already left behind everything these aggregates need):

- ``encoded_value_counts``: GROUP BY col → COUNT(*) for a string column.
  Dictionary-coded segments never materialize a single string: the counts
  come from the *code stream*, and when the codes themselves are RLE
  (sorted/grouped data — the common case after the encode pass's
  per-partition sort) the kernel is ``bincount(run_values, run_lengths)``
  over O(runs) integers for an n-row segment. Other codecs fall back to a
  pruned single-column decode + ``pc.value_counts`` — same answer, just no
  shortcut.
- ``encoded_min_max``: MIN/MAX of an orderable column from the per-segment
  zone maps alone — O(segments) header reads, zero payload bytes touched
  (the same trick ``decode.prune_segments`` uses to skip segments, used
  here to *answer* the query).
- ``encoded_distinct``: DISTINCT values of a dict-coded string column from
  the vocabularies alone (shared-dict vocab read once from the manifest
  store; per-segment vocabs are a ranged read of the vocab bytes, skipping
  the much larger code stream).

Each per-segment partial is tiny (vocab-bounded), so the distributed shape
is: ``from_items(segment paths) → map_batches(per-segment partial)`` — one
task per segment, embarrassingly parallel — then a vocab-bounded combine.
At 100 TB the segment count is the parallelism and nothing rescans row data
that the header/codes already answer.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fhirflat_ray.codecs.ints import decode_ints
from fhirflat_ray.codecs.strings import decode_plain
from fhirflat_ray.state import segments as seg


def _code_counts(hdr: dict[str, Any], blob: bytes, n: int) -> np.ndarray:
    """Per-code occurrence counts from an encoded int (code) stream.

    RLE codes are counted from (run_value, run_length) pairs without ever
    expanding to n values — the encoded-domain shortcut. Everything else
    decodes the int64 codes (still far cheaper than string materialization)
    and bincounts.
    """
    if hdr["c"] == "rle":
        nb_v = hdr["vals"]["len"]
        run_vals = decode_ints(hdr["vals"]["h"], blob[:nb_v], hdr["runs"])
        run_lens = decode_ints(hdr["lens"]["h"], blob[nb_v:], hdr["runs"])
        if len(run_vals) == 0:
            return np.zeros(0, dtype=np.int64)
        return np.bincount(
            run_vals, weights=run_lens.astype(np.float64), minlength=int(run_vals.max()) + 1
        ).astype(np.int64)
    codes = decode_ints(hdr, blob, n)
    if len(codes) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.bincount(codes).astype(np.int64)


def _find_column(header: dict[str, Any], column: str) -> dict[str, Any]:
    for col in header["columns"]:
        if col["name"] == column:
            return col
    raise KeyError(f"column {column!r} not in segment header")


def _read_col_blob(path: str, payload_off: int, col: dict[str, Any]) -> bytes:
    with open(path, "rb") as f:
        f.seek(payload_off + col["off"])
        return f.read(col["len"])


def segment_value_counts(
    path: str, column: str, dict_store: dict[str, pa.Array] | None = None
) -> pa.Table:
    """One segment's (value, n) partial for ``GROUP BY column``.

    Fast path: null-free dict-coded string column — counts from the code
    stream + vocab, no string decode. Fallback: pruned one-column decode +
    ``pc.value_counts`` (nulls grouped as NULL, matching SQL GROUP BY).
    """
    header, payload_off = seg.read_segment_header(path)
    col = _find_column(header, column)
    hdr = col["hdr"]
    sh = hdr.get("h")
    if (
        hdr.get("c") == "str"
        and "valid_len" not in hdr
        and isinstance(sh, dict)
        and sh.get("c") == "dict"
    ):
        blob = _read_col_blob(path, payload_off, col)
        nb = sh["codes"]["len"]
        counts = _code_counts(sh["codes"]["h"], blob[:nb], hdr["n"])
        if "shared" in sh:
            if not dict_store or sh["shared"] not in dict_store:
                raise KeyError(f"shared dictionary {sh['shared']} not in store")
            vocab = dict_store[sh["shared"]]
        else:
            vocab = decode_plain(sh["vocab"]["h"], blob[nb:], sh["vocab"]["n"])
        # counts is indexed by code; pad to the vocab (shared vocabs can have
        # values this segment never uses) and keep only present values so the
        # partial mirrors GROUP BY (groups exist only for observed values)
        if len(counts) < len(vocab):
            counts = np.pad(counts, (0, len(vocab) - len(counts)))
        mask = counts > 0
        return pa.table(
            {
                column: pa.array(vocab.to_pylist(), pa.string())
                if not mask.all()
                else vocab.cast(pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        ).filter(pa.array(mask))
    # generic path — one-column pruned decode (never touches other columns)
    tbl = seg.read_segment(path, dict_store, columns=[column])
    vc = pc.value_counts(tbl.column(column))
    return pa.table(
        {
            column: vc.field("values").cast(pa.string()),
            "n": vc.field("counts").cast(pa.int64()),
        }
    )


def segment_distinct(
    path: str, column: str, dict_store: dict[str, pa.Array] | None = None
) -> pa.Table:
    """One segment's distinct string values. Dict-coded: the vocabulary IS
    the answer for a LOCAL vocab (dictionary_encode emits exactly the
    observed values); a SHARED vocab may be a superset, so that path (and
    every non-dict codec) falls back to counting first."""
    header, payload_off = seg.read_segment_header(path)
    col = _find_column(header, column)
    hdr = col["hdr"]
    sh = hdr.get("h")
    if (
        hdr.get("c") == "str"
        and "valid_len" not in hdr
        and isinstance(sh, dict)
        and sh.get("c") == "dict"
        and "vocab" in sh
    ):
        blob = _read_col_blob(path, payload_off, col)
        nb = sh["codes"]["len"]
        vocab = decode_plain(sh["vocab"]["h"], blob[nb:], sh["vocab"]["n"])
        return pa.table({column: vocab.cast(pa.string())})
    return segment_value_counts(path, column, dict_store).select([column])


def segment_zone(path: str, column: str) -> tuple[int | float, int | float] | None:
    """(min, max) for one segment from the header zone map — no payload
    bytes read. None when the segment carries no zone for the column."""
    header, _ = seg.read_segment_header(path)
    return seg.zones_of_header(header).get(column)


def encoded_value_counts(seg_dir: str, column: str):
    """Distributed ``GROUP BY column → COUNT(*)`` over encoded segments.

    One task per segment produces a vocab-bounded partial; the combine is a
    single bucketed sum over (value) — the A5 partial/final shape with the
    partial computed from encoded bytes.
    """
    import ray.data as rd

    from fhirflat_ray.functions.util import bucketed_map_groups
    from fhirflat_ray.pipelines.decode import _worker_dict_store, segment_paths

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")

    def partial(batch: dict[str, Any]) -> pa.Table:
        store = _worker_dict_store(seg_dir)
        return pa.concat_tables(
            [segment_value_counts(str(p), column, store) for p in batch["item"]]
        )

    partials = rd.from_items(paths).map_batches(
        partial, batch_size=1, batch_format="numpy", num_cpus=1
    )

    def combine(g):
        out = g.groupby(column, sort=False, dropna=False)["n"].sum().reset_index()
        return out

    return bucketed_map_groups(partials, [column], combine)


def encoded_distinct(seg_dir: str, column: str):
    """Distributed DISTINCT over encoded segments (vocab-only reads on the
    dict fast path)."""
    import ray.data as rd

    from fhirflat_ray.functions.util import bucketed_map_groups
    from fhirflat_ray.pipelines.decode import _worker_dict_store, segment_paths

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")

    def partial(batch: dict[str, Any]) -> pa.Table:
        store = _worker_dict_store(seg_dir)
        return pa.concat_tables(
            [segment_distinct(str(p), column, store) for p in batch["item"]]
        )

    partials = rd.from_items(paths).map_batches(
        partial, batch_size=1, batch_format="numpy", num_cpus=1
    )
    return bucketed_map_groups(
        partials, [column], lambda g: g.drop_duplicates([column])
    )


def encoded_min_max(seg_dir: str, column: str) -> tuple[Any, Any]:
    """Global (min, max) of an orderable column from segment zone maps —
    header-only reads, driver-side merge of two numbers per segment.

    Segments without a zone (all-null, or a type zone maps skip) fall back
    to a pruned one-column decode of JUST those segments. Timestamp columns
    return int64 microseconds (the zone normalization); callers rebuild the
    timestamp type.
    """
    from fhirflat_ray.pipelines.decode import _worker_dict_store
    from fhirflat_ray.state import lineage as lin

    def zone_entry(p: str, hdr: dict):
        return p, seg.zones_of_header(hdr).get(column)

    lo: Any = None
    hi: Any = None
    missing: list[str] = []
    # header reads fan out above the lineage threshold; the driver folds
    # two numbers per segment
    for p, z in lin.map_segment_headers(seg_dir, zone_entry):
        if z is None:
            missing.append(p)
            continue
        lo = z[0] if lo is None else min(lo, z[0])
        hi = z[1] if hi is None else max(hi, z[1])
    for p in missing:
        tbl = seg.read_segment(p, _worker_dict_store(seg_dir), columns=[column])
        arr = tbl.column(column)
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        mm = pc.min_max(arr)
        mlo, mhi = mm["min"].as_py(), mm["max"].as_py()
        if mlo is None:
            continue
        lo = mlo if lo is None else min(lo, mlo)
        hi = mhi if hi is None else max(hi, mhi)
    return lo, hi


__all__ = [
    "segment_value_counts",
    "segment_distinct",
    "segment_zone",
    "encoded_value_counts",
    "encoded_distinct",
    "encoded_min_max",
]


# -------------------------------------------------- encoded-domain SUM


def _int_stream_sum(hdr: dict[str, Any], blob: bytes, n: int) -> int:
    """SUM of an encoded int64 stream without materializing the values.

    Per-codec closed forms (int64 wraparound semantics, matching
    decode-then-sum exactly):

    - rle:   dot(run_values, run_lengths) — O(runs), nothing expands
    - for:   n*ref + g * sum(packed residuals)
    - delta: n*first + g * dot(p, [n-1..1]) + ref * n(n-1)/2
             (each delta d_j contributes to the n-j suffix elements)
    - plain: direct sum of the raw buffer
    """
    from fhirflat_ray.codecs.bitpack import unpack_bits

    if n == 0:
        return 0
    c = hdr["c"]
    with np.errstate(over="ignore"):
        if c == "rle":
            nb_v = hdr["vals"]["len"]
            run_vals = decode_ints(hdr["vals"]["h"], blob[:nb_v], hdr["runs"])
            run_lens = decode_ints(hdr["lens"]["h"], blob[nb_v:], hdr["runs"])
            return int(np.dot(run_vals, run_lens))
        if c == "for":
            resid = unpack_bits(blob, hdr["w"], n)
            g = np.int64(hdr.get("g", 1))
            return int(
                np.int64(n) * np.int64(hdr["ref"]) + g * np.int64(resid.sum())
            )
        if c == "delta":
            p = unpack_bits(blob, hdr["w"], n - 1)
            g = np.int64(hdr.get("g", 1))
            w = np.arange(n - 1, 0, -1, dtype=np.int64)
            tri = np.int64(n * (n - 1) // 2)
            return int(
                np.int64(n) * np.int64(hdr["first"])
                + g * np.int64(np.dot(p, w))
                + np.int64(hdr["ref"]) * tri
            )
        if c == "plain":
            return int(np.frombuffer(blob, dtype=np.int64, count=n).sum())
    raise ValueError(f"unknown int codec {c!r}")


def _int_stream_sumsq(hdr: dict[str, Any], blob: bytes, n: int) -> int:
    """SUM of squares of an encoded int64 stream (int64 wraparound
    semantics, matching decode-then-sum exactly).

    - rle:   dot(run_values^2, run_lengths) — O(runs), nothing expands
    - for:   values are ref + g*r, so Σv² = n·ref² + 2·ref·g·Σr + g²·Σr²
    - delta/plain: the second moment of a prefix-sum stream has no
      runs/residual closed form, so reconstruct the value stream in one
      vectorized pass (same O(n) the unpack already paid) and square it
    """
    from fhirflat_ray.codecs.bitpack import unpack_bits

    if n == 0:
        return 0
    c = hdr["c"]
    with np.errstate(over="ignore"):
        if c == "rle":
            nb_v = hdr["vals"]["len"]
            run_vals = decode_ints(hdr["vals"]["h"], blob[:nb_v], hdr["runs"])
            run_lens = decode_ints(hdr["lens"]["h"], blob[nb_v:], hdr["runs"])
            return int(np.dot(run_vals * run_vals, run_lens))
        if c == "for":
            resid = unpack_bits(blob, hdr["w"], n)
            g = np.int64(hdr.get("g", 1))
            ref = np.int64(hdr["ref"])
            sr = np.int64(resid.sum())
            sr2 = np.int64(np.dot(resid, resid))
            return int(np.int64(n) * ref * ref + 2 * ref * g * sr + g * g * sr2)
        if c == "delta":
            p = unpack_bits(blob, hdr["w"], n - 1)
            g = np.int64(hdr.get("g", 1))
            deltas = np.int64(hdr["ref"]) + g * p
            vals = np.empty(n, dtype=np.int64)
            vals[0] = hdr["first"]
            np.cumsum(deltas, out=vals[1:])
            vals[1:] += np.int64(hdr["first"])
            return int(np.dot(vals, vals))
        if c == "plain":
            v = np.frombuffer(blob, dtype=np.int64, count=n)
            return int(np.dot(v, v))
    raise ValueError(f"unknown int codec {c!r}")


def segment_int_moments(
    path: str, column: str, dict_store: dict[str, pa.Array] | None = None
) -> tuple[int, int, int]:
    """One segment's (sum, sum-of-squares, row_count) for an int column —
    the closed-form fast path for null-free ``ints`` columns, pruned
    one-column decode otherwise (SQL aggregate semantics skip nulls)."""
    header, payload_off = seg.read_segment_header(path)
    col = _find_column(header, column)
    hdr = col["hdr"]
    if hdr.get("c") == "ints" and "valid_len" not in hdr:
        blob = _read_col_blob(path, payload_off, col)
        return (
            _int_stream_sum(hdr["h"], blob, hdr["n"]),
            _int_stream_sumsq(hdr["h"], blob, hdr["n"]),
            hdr["n"],
        )
    tbl = seg.read_segment(path, dict_store, columns=[column])
    arr = tbl.column(column)
    s = int(pc.sum(arr).as_py() or 0)
    s2 = int(pc.sum(pc.multiply(arr, arr)).as_py() or 0)
    return s, s2, tbl.num_rows


def encoded_moments(seg_dir: str, column: str) -> tuple[int, int, int]:
    """Distributed SUM, SUM(x*x), COUNT(*) off encoded segments — one task
    per segment, three ints back from each; driver folds O(segments)."""
    import ray.data as rd

    from fhirflat_ray.functions.util import collect_small_table
    from fhirflat_ray.pipelines.decode import _worker_dict_store, segment_paths

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")

    def partial(batch: dict[str, Any]) -> pa.Table:
        store = _worker_dict_store(seg_dir)
        rows = [segment_int_moments(str(p), column, store) for p in batch["item"]]
        return pa.table(
            {
                "s": pa.array([r[0] for r in rows], pa.int64()),
                "s2": pa.array([r[1] for r in rows], pa.int64()),
                "n": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    t = collect_small_table(
        rd.from_items(paths).map_batches(
            partial, batch_size=1, batch_format="numpy", num_cpus=1
        )
    )
    return (
        int(pc.sum(t["s"]).as_py() or 0),
        int(pc.sum(t["s2"]).as_py() or 0),
        int(pc.sum(t["n"]).as_py() or 0),
    )


def segment_int_sum(
    path: str, column: str, dict_store: dict[str, pa.Array] | None = None
) -> tuple[int, int]:
    """One segment's (sum, row_count) for an integer column.

    Fast path: null-free ``ints`` column — the per-codec closed form above
    reads ONLY that column's blob. Columns with validity bitmaps or other
    codecs fall back to a pruned one-column decode + ``pc.sum`` (SQL SUM
    skips nulls)."""
    header, payload_off = seg.read_segment_header(path)
    col = _find_column(header, column)
    hdr = col["hdr"]
    if hdr.get("c") == "ints" and "valid_len" not in hdr:
        blob = _read_col_blob(path, payload_off, col)
        return _int_stream_sum(hdr["h"], blob, hdr["n"]), hdr["n"]
    tbl = seg.read_segment(path, dict_store, columns=[column])
    s = pc.sum(tbl.column(column))
    return int(s.as_py() or 0), tbl.num_rows


def encoded_sum(seg_dir: str, column: str) -> tuple[int, int]:
    """Distributed SUM(column), COUNT(*) straight off encoded segments —
    one task per segment, two ints back from each; the combine is a
    driver-side fold of O(segments) pairs."""
    import ray.data as rd

    from fhirflat_ray.functions.util import collect_small_table
    from fhirflat_ray.pipelines.decode import _worker_dict_store, segment_paths

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")

    def partial(batch: dict[str, Any]) -> pa.Table:
        store = _worker_dict_store(seg_dir)
        sums, cnts = [], []
        for p in batch["item"]:
            s, c = segment_int_sum(str(p), column, store)
            sums.append(s)
            cnts.append(c)
        return pa.table(
            {"s": pa.array(sums, pa.int64()), "n": pa.array(cnts, pa.int64())}
        )

    t = collect_small_table(
        rd.from_items(paths).map_batches(
            partial, batch_size=1, batch_format="numpy", num_cpus=1
        )
    )
    return (
        int(pc.sum(t["s"]).as_py() or 0),
        int(pc.sum(t["n"]).as_py() or 0),
    )


def segment_grouped_sum(
    path: str,
    key_column: str,
    value_column: str,
    dict_store: dict[str, pa.Array] | None = None,
) -> pa.Table:
    """One segment's (key, sum, n) partial for ``GROUP BY key → SUM(value)``.

    Fast path: null-free dict-coded string key + null-free int value — the
    group sums are one ``np.bincount(codes, weights=values)`` over the
    decoded code/int streams; strings never materialize (the vocab maps
    code → key at the very end, vocab-bounded). Falls back to a two-column
    pruned decode + Arrow group_by otherwise."""
    header, payload_off = seg.read_segment_header(path)
    kcol = _find_column(header, key_column)
    vcol = _find_column(header, value_column)
    khdr, vhdr = kcol["hdr"], vcol["hdr"]
    sh = khdr.get("h")
    if (
        khdr.get("c") == "str"
        and "valid_len" not in khdr
        and isinstance(sh, dict)
        and sh.get("c") == "dict"
        and vhdr.get("c") == "ints"
        and "valid_len" not in vhdr
    ):
        kblob = _read_col_blob(path, payload_off, kcol)
        nb = sh["codes"]["len"]
        codes = decode_ints(sh["codes"]["h"], kblob[:nb], khdr["n"])
        vals = decode_ints(
            vhdr["h"], _read_col_blob(path, payload_off, vcol), vhdr["n"]
        )
        if "shared" in sh:
            if not dict_store or sh["shared"] not in dict_store:
                raise KeyError(f"shared dictionary {sh['shared']} not in store")
            vocab = dict_store[sh["shared"]]
        else:
            vocab = decode_plain(sh["vocab"]["h"], kblob[nb:], sh["vocab"]["n"])
        m = len(vocab)
        # int64 scatter-add, not bincount(weights=float): float weights lose
        # exactness past 2^53 — group sums at 10^12-turn scale exceed that
        sums = np.zeros(m, dtype=np.int64)
        np.add.at(sums, codes, vals)
        cnts = np.bincount(codes, minlength=m)
        mask = cnts > 0
        return pa.table(
            {
                key_column: vocab.cast(pa.string()).filter(pa.array(mask)),
                "s": pa.array(sums[mask], pa.int64()),
                "n": pa.array(cnts[mask].astype(np.int64), pa.int64()),
            }
        )
    tbl = seg.read_segment(path, dict_store, columns=[key_column, value_column])
    g = tbl.group_by([key_column]).aggregate([(value_column, "sum"), ([], "count_all")])
    names = {key_column: key_column, f"{value_column}_sum": "s", "count_all": "n"}
    out = {}
    for src, dst in names.items():
        out[dst] = g[src]
    return pa.table(
        {
            key_column: out[key_column],
            "s": out["s"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
        }
    )


def encoded_grouped_sum(seg_dir: str, key_column: str, value_column: str):
    """Distributed ``GROUP BY key → SUM(value), COUNT(*)`` over encoded
    segments — vocab-bounded partials, one task per segment, bucketed
    combine."""
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.functions.util import bucketed_map_groups
    from fhirflat_ray.pipelines.decode import _worker_dict_store, segment_paths

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")

    def partial(batch: dict[str, Any]) -> pa.Table:
        store = _worker_dict_store(seg_dir)
        return pa.concat_tables(
            [
                segment_grouped_sum(str(p), key_column, value_column, store)
                for p in batch["item"]
            ]
        )

    partials = rd.from_items(paths).map_batches(
        partial, batch_size=1, batch_format="numpy", num_cpus=1
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(key_column, sort=False, dropna=False)
            .agg(s=("s", "sum"), n=("n", "sum"))
            .reset_index()
        )

    return bucketed_map_groups(partials, [key_column], combine)


# ------------------------------------------------- two-column GROUP BY


def _dict_codes_and_vocab(
    path: str,
    payload_off: int,
    col: dict[str, Any],
    dict_store: dict[str, pa.Array] | None,
) -> tuple[np.ndarray, pa.Array] | None:
    """(codes, vocab) for a null-free dict-coded string column, or None if
    the column doesn't qualify for the encoded-domain fast path."""
    hdr = col["hdr"]
    sh = hdr.get("h")
    if not (
        hdr.get("c") == "str"
        and "valid_len" not in hdr
        and isinstance(sh, dict)
        and sh.get("c") == "dict"
    ):
        return None
    blob = _read_col_blob(path, payload_off, col)
    nb = sh["codes"]["len"]
    codes = decode_ints(sh["codes"]["h"], blob[:nb], hdr["n"])
    if "shared" in sh:
        if not dict_store or sh["shared"] not in dict_store:
            raise KeyError(f"shared dictionary {sh['shared']} not in store")
        vocab = dict_store[sh["shared"]]
    else:
        vocab = decode_plain(sh["vocab"]["h"], blob[nb:], sh["vocab"]["n"])
    return np.asarray(codes, dtype=np.int64), vocab


def segment_pair_counts(
    path: str,
    col_a: str,
    col_b: str,
    dict_store: dict[str, pa.Array] | None = None,
) -> pa.Table:
    """One segment's ``(a, b, n)`` partial for ``GROUP BY a, b → COUNT(*)``.

    Fast path: both columns null-free dict-coded — the cross-tab is one
    ``bincount`` over the fused code ``code_a * |vocab_b| + code_b``; the
    int code streams decode (cheap) but no string value of either column
    ever materializes until the vocab-bounded result rows. Fallback: pruned
    two-column decode + Arrow ``group_by`` (same answer)."""
    header, payload_off = seg.read_segment_header(path)
    ca, cb = _find_column(header, col_a), _find_column(header, col_b)
    fa = _dict_codes_and_vocab(path, payload_off, ca, dict_store)
    fb = _dict_codes_and_vocab(path, payload_off, cb, dict_store)
    if fa is not None and fb is not None:
        codes_a, vocab_a = fa
        codes_b, vocab_b = fb
        mb = len(vocab_b)
        fused = codes_a * np.int64(mb) + codes_b
        counts = np.bincount(fused, minlength=len(vocab_a) * mb)
        idx = np.nonzero(counts)[0]
        return pa.table(
            {
                col_a: vocab_a.cast(pa.string()).take(pa.array(idx // mb)),
                col_b: vocab_b.cast(pa.string()).take(pa.array(idx % mb)),
                "n": pa.array(counts[idx], pa.int64()),
            }
        )
    tbl = seg.read_segment(path, dict_store, columns=[col_a, col_b])
    g = tbl.group_by([col_a, col_b]).aggregate([([], "count_all")])
    return pa.table(
        {
            col_a: g[col_a].cast(pa.string()),
            col_b: g[col_b].cast(pa.string()),
            "n": g["count_all"].cast(pa.int64()),
        }
    )


def encoded_pair_counts(seg_dir: str, col_a: str, col_b: str):
    """Distributed ``GROUP BY col_a, col_b → COUNT(*)`` over encoded
    segments — the two-column cross-tab (role × tool matrix of a transcript
    corpus) answered from fused dictionary code streams; one task per
    segment, vocab²-bounded partials, bucketed sum combine."""
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.functions.util import bucketed_map_groups
    from fhirflat_ray.pipelines.decode import _worker_dict_store, segment_paths

    paths = segment_paths(seg_dir)
    if not paths:
        raise FileNotFoundError(f"no segments under {seg_dir!r}")

    def partial(batch: dict[str, Any]) -> pa.Table:
        store = _worker_dict_store(seg_dir)
        return pa.concat_tables(
            [segment_pair_counts(str(p), col_a, col_b, store) for p in batch["item"]]
        )

    partials = rd.from_items(paths).map_batches(
        partial, batch_size=1, batch_format="numpy", num_cpus=1
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby([col_a, col_b], sort=False, dropna=False)["n"]
            .sum()
            .reset_index()
        )

    return bucketed_map_groups(partials, [col_a, col_b], combine)
