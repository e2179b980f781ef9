"""Round-trip verification + valid/error row routing.

``verify_roundtrip`` proves decoded == source without materializing either
side: each batch contributes an order-insensitive multiset fingerprint (sum of
per-row hashes mod 2**64 + row count + per-column null counts); the driver
compares two O(1) summaries. This is the scalable form of the reference's
flat-parquet round-trip assertions
(/root/reference/tests/test_encounter_resource.py:359-379) — per-turn ``text``
equality under stable ``(conv_id, turn_idx)`` ordering is implied because the
hash covers the ordering key and text together per row.

``validate_transcripts`` is the valid/error split
(/root/reference/fhirflat/resources/base.py:89-149): rows that violate the
transcript contract (null key fields, negative turn_idx, duplicate
``(conv_id, turn_idx)``) are routed to an errors dataset instead of failing
the job.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

MASK64 = (1 << 64) - 1


_MIX = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as signed int64
_NULL_SENTINEL = np.int64(-4417276706812531889)  # distinct from any mixed value class


def _mix64(h: np.ndarray) -> np.ndarray:
    """Cheap avalanche over int64 (wraparound multiply + xor-shift); all
    SIGNED ops — unsigned-64 numpy is pathologically slow on this host."""
    h = h * _MIX
    return h ^ (h >> np.int64(29))


def _column_row_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Per-row int64 hash of one Arrow column, Arrow-native: numerics hash
    their bit patterns; strings/binary hash DISTINCT values only (pandas
    siphash over the dictionary, one Python-object conversion per distinct —
    the transcripts' low-cardinality role/tool columns pay near nothing) and
    fan out via the code vector. Nulls get a sentinel (kept distinct from
    "" and from 0 — the M23 null-vs-empty contract)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        # adaptive: a cheap cardinality probe picks dictionary hashing
        # (siphash DISTINCT values only — role/tool-like columns pay near
        # nothing) vs direct per-row hashing (unique-text columns, where
        # the dictionary build is pure overhead — measured 1.46 s vs
        # 0.78 s per 1M rows). Both paths siphash the same value bytes,
        # so blocks of one dataset may take different paths and still
        # fingerprint identically.
        import pyarrow.compute as _pc

        probe = col.slice(0, 4096)
        repetitive = len(probe) > 0 and (
            _pc.count_distinct(probe).as_py() <= 0.5 * len(probe)
        )
        valid = ~np.asarray(col.is_null())
        if repetitive:
            enc = col.dictionary_encode()
            vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            vh = (
                pd.util.hash_array(vocab).view(np.int64)
                if len(vocab)
                else np.empty(0, dtype=np.int64)
            )
            codes = enc.indices.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            h = vh[codes] if len(vocab) else np.zeros(len(col), dtype=np.int64)
        else:
            vals = col.to_pandas().to_numpy()
            h = pd.util.hash_array(vals).view(np.int64)
            h = np.where(valid, h, 0)  # normalize before mixing
    elif pa.types.is_boolean(t):
        valid = ~np.asarray(col.is_null())
        h = col.fill_null(False).cast(pa.int64()).to_numpy(zero_copy_only=False)
    elif pa.types.is_floating(t):
        valid = ~np.asarray(col.is_null())
        h = (
            col.fill_null(0.0)
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
    elif (
        pa.types.is_integer(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
        or pa.types.is_time(t)
        or pa.types.is_duration(t)
    ):
        valid = ~np.asarray(col.is_null())
        h = col.fill_null(0).cast(pa.int64()).to_numpy(zero_copy_only=False)
    elif pa.types.is_null(t):
        return np.full(len(col), _NULL_SENTINEL, dtype=np.int64)
    else:
        # nested types (struct/list/map): pandas fallback for this column
        # only — flat transcript/event tables never take this path
        h = pd.util.hash_pandas_object(
            col.to_pandas(), index=False
        ).to_numpy().view(np.int64)
        return h
    h = _mix64(h)
    if not valid.all():
        h = np.where(valid, h, _NULL_SENTINEL)
    return h


def _batch_fingerprint(batch: pa.Table) -> pa.Table:
    # per-row hash = iterative nonlinear combine across columns (a linear /
    # additive combine would cancel under cross-row value swaps within a
    # column); multiset fingerprint = int64 WRAPAROUND sum of row hashes —
    # bit-identical to the uint64 sum mod 2^64 without this host's
    # pathologically slow unsigned-64 numpy path. The partial MUST be an
    # explicit fixed int64 column: a plain Python-int list makes schema
    # inference vary per block and Ray's cross-block unification of that mix
    # goes through float64 — shearing low bits (a session-dependent "verify
    # failed" false alarm observed at 16M rows).
    n = batch.num_rows
    row_h = np.full(n, _MIX, dtype=np.int64)
    for i, name in enumerate(batch.column_names):
        ch = _column_row_hashes(batch[name])
        # per-column salt in Python ints (scalar numpy multiply warns on
        # the intended wraparound), then back to signed int64
        salt = (int(_MIX) * (i + 1)) & MASK64
        if salt >= 1 << 63:
            salt -= 1 << 64
        row_h = _mix64(row_h ^ (ch + np.int64(salt)))
    return pa.table(
        {
            "hash_sum": pa.array([int(row_h.sum(dtype=np.int64))], pa.int64()),
            "n": pa.array([n], pa.int64()),
        }
    )


def dataset_fingerprint(ds, columns: list[str] | None = None) -> dict[str, int]:
    """Order-insensitive multiset fingerprint of a Dataset (O(1) result).

    Arrow-native (``batch_format="pyarrow"``): no whole-batch pandas
    conversion — string payloads hash via their dictionary (distinct values
    only), numerics via bit patterns, so the hottest verification primitive
    never materializes Python objects per row."""
    if columns:
        ds = ds.select_columns(columns)
    parts = ds.map_batches(_batch_fingerprint, batch_format="pyarrow").take_all()
    total_h = 0
    total_n = 0
    for p in parts:
        total_h = (total_h + int(p["hash_sum"])) & MASK64
        total_n += int(p["n"])
    return {"hash_sum": total_h, "n": total_n}


def verify_roundtrip(source_ds, decoded_ds, columns: list[str] | None = None) -> dict[str, Any]:
    """Compare two datasets as multisets of rows; returns a verdict dict."""
    a = dataset_fingerprint(source_ds, columns)
    b = dataset_fingerprint(decoded_ds, columns)
    return {
        "equal": a == b,
        "source": a,
        "decoded": b,
    }


# ------------------------------------------------------------ error routing


def _mark_errors(group: pd.DataFrame) -> pd.DataFrame:
    """Key-contract validation, vectorized across EVERY conversation in a
    co-partitioned bucket (duplicate detection keys on (conv_id, turn_idx),
    so it needs no per-conversation loop)."""
    if "_error" in group.columns:
        # compose with an upstream pass (e.g. validate_schema): first error wins
        err = group["_error"].fillna("").to_numpy(dtype=object)
    else:
        err = np.full(len(group), "", dtype=object)
    if "turn_idx" in group:
        tidx = group["turn_idx"]
        err[tidx.isna().to_numpy() & (err == "")] = "null turn_idx"
        err[(tidx.fillna(0) < 0).to_numpy() & (err == "")] = "negative turn_idx"
        dup = group.duplicated(subset=["conv_id", "turn_idx"], keep="first").to_numpy()
        err[dup & (err == "")] = "duplicate (conv_id, turn_idx)"
    group = group.copy()
    group["_error"] = err
    return group


def validate_transcripts(ds):
    """Mark invalid rows; returns a Dataset with an ``_error`` column.

    Shuffles by ``conv_id`` only (duplicate detection is conversation-local).
    Rows with a null conv_id can't be grouped — they are marked in a
    stateless pre-pass.
    """
    import pyarrow.compute as pc

    def null_conv(batch: pa.Table) -> pa.Table:
        mask = pc.is_null(batch["conv_id"])
        err = pc.if_else(mask, pa.scalar("null conv_id"), pa.scalar(""))
        if "_error" in batch.column_names:
            # compose with an upstream pass: first error wins
            prev = pc.fill_null(batch["_error"], "")
            err = pc.if_else(pc.not_equal(prev, pa.scalar("")), prev, err)
            batch = batch.drop_columns(["_error"])
        return batch.append_column("_error", pc.cast(err, pa.string()))

    from fhirflat_ray.functions.util import bucketed_map_groups

    marked = ds.map_batches(null_conv, batch_format="pyarrow")
    good = marked.filter(expr="_error == ''")
    bad = marked.filter(expr="_error != ''")
    # coarse-bucket shuffle on conv_id (whole conversations co-partitioned);
    # one vectorized validation pass per bucket, Python per bucket not per conv
    validated = bucketed_map_groups(good, ["conv_id"], _mark_errors)
    return validated.union(bad)


#: A schema spec is ``{column: rules}`` with any of:
#:   type: expected arrow type string (e.g. "int64", "string", "timestamp[us]")
#:   nullable: False → nulls are errors (default True)
#:   min / max: inclusive numeric bounds
#:   regex: full-match pattern the (string) value must satisfy
#:   enum: allowed value list
#:   required: False → column may be absent entirely (default True)
#: This is the engine's analogue of the reference's per-row typed-schema
#: validation (/root/reference/fhirflat/resources/base.py:89-149, pydantic),
#: done as vectorized Arrow kernels per batch instead of Python per row.


def validate_schema(ds, spec: dict[str, dict[str, Any]]):
    """Mark rows violating a typed column spec; returns ds + ``_error``.

    Stateless per-batch transform — no shuffle; compose with
    :func:`split_valid` to route valid/error rows like the reference's
    ingest split (/root/reference/fhirflat/ingest.py:541-575)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def check(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        err = np.full(n, "", dtype=object)

        def mark(mask, msg: str) -> None:
            m = mask.to_numpy(zero_copy_only=False) if hasattr(mask, "to_numpy") else mask
            m = np.asarray(m)
            m = np.where(np.equal(m, None), False, m).astype(bool)
            err[m & (err == "")] = msg

        for col, rules in spec.items():
            if col not in batch.column_names:
                if rules.get("required", True):
                    err[err == ""] = f"missing column {col!r}"
                continue
            arr = batch[col]
            want_type = rules.get("type")
            if want_type is not None and str(arr.type) != want_type:
                err[err == ""] = f"column {col!r} has type {arr.type}, want {want_type}"
                continue
            nulls = pc.is_null(arr)
            if not rules.get("nullable", True):
                mark(nulls, f"null {col}")
            not_null = pc.invert(nulls)
            if "min" in rules:
                mark(
                    pc.and_(not_null, pc.less(arr, pa.scalar(rules["min"], arr.type))),
                    f"{col} below min {rules['min']}",
                )
            if "max" in rules:
                mark(
                    pc.and_(not_null, pc.greater(arr, pa.scalar(rules["max"], arr.type))),
                    f"{col} above max {rules['max']}",
                )
            if "regex" in rules:
                ok = pc.match_substring_regex(
                    arr.cast(pa.string()), f"^(?:{rules['regex']})$"
                )
                mark(pc.and_(not_null, pc.invert(ok)), f"{col} fails pattern")
            if "enum" in rules:
                ok = pc.is_in(arr, value_set=pa.array(rules["enum"], arr.type))
                mark(pc.and_(not_null, pc.invert(ok)), f"{col} not in enum")

        if "_error" in batch.column_names:
            prev = batch["_error"].to_numpy(zero_copy_only=False)
            keep = np.asarray(prev, dtype=object)
            err = np.where(keep != "", keep, err)
            batch = batch.drop_columns(["_error"])
        return batch.append_column("_error", pa.array(err, pa.string()))

    return ds.map_batches(check, batch_format="pyarrow")


def validate_cross_fields(ds, rules: list[dict[str, Any]]):
    """Row-local CROSS-FIELD rules — the engine's analogue of the
    reference's pydantic ``root_validator`` family
    (/root/reference/fhirflat/resources/extensions.py:163-201
    ``validate_one_of_many``: a choice-of-type element may hold at most —
    required: exactly — one of its variant fields; the FHIR ext-1
    invariant: extensions and value are mutually exclusive), vectorized
    per batch instead of Python per row. Rule shapes:

    - ``{"rule": "one_of", "columns": [...], "required": bool}`` — at
      most one of the columns non-null; ``required`` → exactly one
      (value[x] choice-of-type cardinality).
    - ``{"rule": "exclusive", "columns": [...]}`` — the columns may not
      ALL be non-null together (ext-1 shape for two columns).
    - ``{"rule": "requires", "column": c, "needs": d}`` — a non-null
      ``c`` needs a non-null ``d`` (coding-implies-system shape).

    First-error-wins per row, in rule order; composes with
    :func:`validate_schema` / :func:`validate_transcripts` (an existing
    ``_error`` column takes precedence). Stateless map — no shuffle."""
    import pyarrow.compute as pc

    for r in rules:  # fail fast on the driver, not inside a Ray task
        if r.get("rule") not in ("one_of", "exclusive", "requires"):
            raise ValueError(f"unknown cross-field rule {r.get('rule')!r}")

    def nn(batch: pa.Table, col: str) -> np.ndarray:
        if col not in batch.column_names:
            return np.zeros(batch.num_rows, dtype=bool)
        return np.asarray(pc.is_valid(batch[col]))

    def check(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        err = np.full(n, "", dtype=object)

        def mark(m: np.ndarray, msg: str) -> None:
            err[m & (err == "")] = msg

        for r in rules:
            kind = r["rule"]
            if kind == "one_of":
                cols = r["columns"]
                count = np.zeros(n, dtype=np.int64)
                for c in cols:
                    count += nn(batch, c)
                mark(count > 1, f"multiple of {cols} present")
                if r.get("required"):
                    mark(count == 0, f"one of {cols} required")
            elif kind == "exclusive":
                cols = r["columns"]
                both = np.ones(n, dtype=bool)
                for c in cols:
                    both &= nn(batch, c)
                mark(both, f"{cols} are mutually exclusive")
            elif kind == "requires":
                c, d = r["column"], r["needs"]
                mark(nn(batch, c) & ~nn(batch, d), f"{c} requires {d}")
            else:
                raise ValueError(f"unknown cross-field rule {kind!r}")

        if "_error" in batch.column_names:
            prev = np.asarray(
                batch["_error"].to_numpy(zero_copy_only=False), dtype=object
            )
            err = np.where(prev != "", prev, err)
            batch = batch.drop_columns(["_error"])
        return batch.append_column("_error", pa.array(err, pa.string()))

    return ds.map_batches(check, batch_format="pyarrow")


def validate_max_per_key(
    ds, key_cols: list[str], column: str, max_n: int, num_buckets: int | None = None
):
    """Per-GROUP cardinality rule — the reference's
    ``validate_extension_contents`` shape
    (/root/reference/fhirflat/resources/extensions.py:230-238: a category
    may appear at most once inside one extension list): within each
    ``key_cols`` group, every distinct ``column`` value may appear at most
    ``max_n`` times; all rows of a violating (key, value) combination are
    marked. Needs co-location, so it runs as ONE coarse hash-bucket
    shuffle (``bucketed_map_groups``: Python per bucket, vectorized pandas
    transform inside); first-error-wins against an existing ``_error``."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby(key_cols + [column], sort=False, dropna=False)[
            column
        ].transform("size")
        bad = (counts > max_n).to_numpy()
        msg = f"{column} appears more than {max_n}x per {key_cols}"
        if "_error" in g.columns:
            prev = g["_error"].to_numpy()
            g = g.drop(columns="_error")
            new = np.where((prev == "") & bad, msg, prev)
        else:
            new = np.where(bad, msg, "")
        out = g.copy()
        out["_error"] = new
        return out

    return bucketed_map_groups(ds, key_cols, per_bucket, num_buckets=num_buckets)


#: The transcript contract as a schema spec (used by the CLI and tests).
TRANSCRIPT_SCHEMA_SPEC: dict[str, dict[str, Any]] = {
    "conv_id": {"type": "string", "nullable": False},
    "turn_idx": {"type": "int32", "nullable": False, "min": 0},
    "role": {"enum": ["user", "assistant", "system", "tool"]},
    "text": {"nullable": True},
    "ts": {"nullable": False},
}


def condense_one_to_one(ds, key: str, columns: list[str] | None = None):
    """A2 one-row-per-subject condense with conflict routing.

    The reference's 1:1 mapping condense errors when a subject has
    conflicting non-null values for the same column
    (/root/reference/fhirflat/ingest.py:319-348); here conflicting subjects
    are routed to the errors side (``_error`` column) instead of failing the
    job. One coarse-bucket shuffle on ``key``; inside each bucket EVERY
    subject condenses in one vectorized pandas groupby (first-non-null +
    nunique conflict scan), Python per bucket not per subject."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def condense(g: pd.DataFrame) -> pd.DataFrame:
        cols = [
            c for c in g.columns if c != key and (not columns or c in columns)
        ]
        grouped = g.groupby(key, sort=False)
        out = grouped[cols].first().reset_index()  # first non-null per column
        nun = grouped[cols].nunique(dropna=True)
        err = np.full(len(out), "", dtype=object)
        # scan columns in order: the LAST conflicting column wins the message
        # (matches round-1 per-group loop semantics)
        for col in cols:
            conflict = (nun[col] > 1).to_numpy()
            err[conflict] = f"conflicting values for {col!r}"
        out["_error"] = err
        return out

    return bucketed_map_groups(ds, [key], condense)


def split_valid(marked_ds):
    """(valid_ds, errors_ds) from a dataset with an ``_error`` column."""
    valid = marked_ds.filter(expr="_error == ''").drop_columns(["_error"])
    errors = marked_ds.filter(expr="_error != ''")
    return valid, errors
