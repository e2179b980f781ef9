"""Struct flatten / unflatten stages — the reference's core transform pair
(fhir2flat / flat2fhir) re-expressed as vectorized Arrow batch functions.

- ``flatten_batch``: nested struct columns → dotted leaf columns
  (``admission.dischargeDisposition.code`` style,
  /root/reference/fhirflat/fhir2flat.py:15-43); length-1 list wrappers are
  unwrapped; lists with >1 elements stay nested under a ``*_dense`` name
  (/root/reference/fhirflat/fhir2flat.py:46-86) and ride the IPC passthrough
  codec.
- ``unflatten_batch``: dotted columns → nested structs (the
  ``expand_concepts`` inverse, /root/reference/fhirflat/flat2fhir.py:387-462),
  restoring ``_dense`` columns to their original name.
- ``condense_system_code``: ``x.system`` + ``x.code`` → ``x.code =
  "system|code"`` (/root/reference/fhirflat/fhir2flat.py:191-199) and its
  inverse ``expand_system_code`` (/root/reference/fhirflat/flat2fhir.py:102).
- ``zip_backbone``: parallel list columns → one list-of-struct column
  (/root/reference/fhirflat/resources/base.py:200-244).

All are per-batch (no shuffle) and usable directly in
``ds.map_batches(fn, batch_format="pyarrow")``.

Per-table config (``TableConfig``) mirrors the reference's subclass hooks:
``flat_exclusions`` / ``flat_defaults`` / ``cleanup``
(/root/reference/fhirflat/resources/base.py:23-57).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

DENSE_SUFFIX = "_dense"


@dataclass
class TableConfig:
    """Reference's per-resource customization surface, engine-side."""

    exclude: tuple[str, ...] = ()  # flat_exclusions analogue (dropped on flatten)
    defaults: dict[str, Any] = field(default_factory=dict)  # flat_defaults (re-added on unflatten)
    finalizer: Callable[[pa.Table], pa.Table] | None = None  # cleanup() hook


def _flatten_one(name: str, arr: pa.Array) -> list[tuple[str, pa.Array]]:
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    t = arr.type
    if pa.types.is_struct(t):
        out: list[tuple[str, pa.Array]] = []
        for i in range(t.num_fields):
            child_name = f"{name}.{t.field(i).name}"
            child = pc.struct_field(arr, [i])
            out.extend(_flatten_one(child_name, child))
        return out
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        lengths = pc.list_value_length(arr)
        max_len = pc.max(pc.fill_null(lengths, 0)).as_py() or 0
        if max_len <= 1:
            # unwrap single-element lists (explode-without-multiplying,
            # fhir2flat.py:46-55): null list and empty list both → null
            flat = pc.list_flatten(arr)
            idx_valid = pc.and_(pc.is_valid(arr), pc.greater(pc.fill_null(lengths, 0), 0))
            # rebuild with nulls where the list was null/empty
            positions = pc.cumulative_sum(pc.cast(pc.fill_null(lengths, 0), pa.int64()))
            take_idx = pc.subtract(positions, pa.scalar(1, pa.int64()))
            taken = flat.take(pc.if_else(idx_valid, take_idx, pa.scalar(None, pa.int64())))
            return _flatten_one(name, taken)
        return [(f"{name}{DENSE_SUFFIX}", arr)]  # too nested → keep opaque
    return [(name, arr)]


def _is_excluded(flat_name: str, exclude: tuple[str, ...]) -> bool:
    """Exclusions are ATTRIBUTE paths: excluding ``note`` drops ``note``,
    every ``note.*`` leaf and the opaque ``note_dense`` form — mirroring the
    reference nulling the whole attribute before flattening
    (/root/reference/fhirflat/resources/base.py:346-348)."""
    for e in exclude:
        if (
            flat_name == e
            or flat_name.startswith(e + ".")
            or flat_name == e + DENSE_SUFFIX
        ):
            return True
    return False


def flatten_batch(batch: pa.Table, config: TableConfig | None = None) -> pa.Table:
    """Nested → flat with dotted names; drops ``config.exclude`` attributes
    (prefix semantics, see :func:`_is_excluded`)."""
    config = config or TableConfig()
    cols: list[tuple[str, pa.Array]] = []
    for name in batch.column_names:
        if _is_excluded(name, config.exclude):
            continue
        for flat_name, arr in _flatten_one(name, batch.column(name)):
            if _is_excluded(flat_name, config.exclude):
                continue
            cols.append((flat_name, arr))
    return pa.table(dict(cols))


def _insert(tree: dict, parts: list[str], arr: pa.Array) -> None:
    if len(parts) == 1:
        tree[parts[0]] = arr
    else:
        sub = tree.setdefault(parts[0], {})
        if not isinstance(sub, dict):  # pragma: no cover - name collision guard
            raise ValueError(f"column name collision at {parts[0]!r}")
        _insert(sub, parts[1:], arr)


def _build_struct(tree: dict, n: int) -> pa.Array:
    names, children = [], []
    for key, val in tree.items():
        child = _build_struct(val, n) if isinstance(val, dict) else val
        names.append(key)
        children.append(child.combine_chunks() if isinstance(child, pa.ChunkedArray) else child)
    return pa.StructArray.from_arrays(children, names)


def unflatten_batch(batch: pa.Table, config: TableConfig | None = None) -> pa.Table:
    """Flat dotted columns → nested structs (``expand_concepts`` analogue).

    ``*_dense`` columns revert to their original names; ``config.defaults``
    columns are re-added when absent (the reference re-adds stripped default
    values on expansion, /root/reference/fhirflat/resources/encounter.py:106).
    """
    config = config or TableConfig()
    n = batch.num_rows
    tree: dict = {}
    for name in batch.column_names:
        arr = batch.column(name)
        if name.endswith(DENSE_SUFFIX):
            name = name[: -len(DENSE_SUFFIX)]
        _insert(tree, name.split("."), arr)
    for name, default in config.defaults.items():
        if name not in tree:
            tree[name] = pa.array([default] * n)
    out_cols = {}
    for key, val in tree.items():
        out_cols[key] = _build_struct(val, n) if isinstance(val, dict) else val
    out = pa.table(out_cols)
    if config.finalizer:
        out = config.finalizer(out)
    return out


# ------------------------------------------------------- system|code pair


def flatten_extensions_batch(
    batch: pa.Table, column: str = "extension", _depth: int = 0
) -> pa.Table:
    """URL-keyed extension flatten (M7 complete form).

    A ``list<struct{url, value*}>`` column becomes one dotted column group
    per DISTINCT url: ``[{"url": "relativeDay", "valueInteger": 2}]`` →
    ``extension.relativeDay.valueInteger = 2`` — the engine's vectorized
    analogue of the reference's per-row rename
    (/root/reference/fhirflat/fhir2flat.py:202-246). Nested complex
    extensions (an inner ``extension`` list) recurse one url level per pass.
    First occurrence wins when a url repeats within a row; all-null value
    leaves are dropped (an extension sets exactly one ``value[x]``)."""
    import numpy as np

    if column not in batch.column_names:
        return batch
    arr = batch[column]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)) or not pa.types.is_struct(
        t.value_type
    ):
        return batch
    n = batch.num_rows
    child = pc.list_flatten(arr)
    lengths = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False)
    own = np.repeat(np.arange(n, dtype=np.int64), lengths)
    urls = pc.struct_field(child, "url").to_numpy(zero_copy_only=False)

    out = batch.drop_columns([column])
    value_fields = [
        f.name for f in t.value_type if f.name not in ("url",)
    ]
    for u in pd_unique_str(urls):
        mask = urls == u
        child_idx = np.nonzero(mask)[0]
        rows = own[child_idx]
        uniq_rows, first_pos = np.unique(rows, return_index=True)
        take = np.full(n, -1, dtype=np.int64)
        take[uniq_rows] = child_idx[first_pos]
        idx_arr = pa.array(
            np.where(take >= 0, take, 0), pa.int64(), mask=take < 0
        )
        taken = child.take(idx_arr)
        for f in value_fields:
            val = pc.struct_field(taken, f)
            if val.null_count == len(val):
                continue  # this url never sets this value[x]
            name = f"{column}.{u}.{f}" if f != "extension" else f"{column}.{u}"
            if f == "extension" and _depth < 4:
                out = out.append_column(name, val)
                out = flatten_extensions_batch(out, name, _depth + 1)
            else:
                for leaf, leaf_arr in _flatten_one(name, val):
                    out = out.append_column(leaf, leaf_arr)
    return out


def pd_unique_str(values) -> list[str]:
    """Distinct non-null strings in first-appearance order (tiny url vocab)."""
    seen: list[str] = []
    seen_set: set[str] = set()
    for v in values:
        if v is not None and v not in seen_set:
            seen_set.add(v)
            seen.append(v)
    return seen


def condense_system_code(batch: pa.Table, prefix: str) -> pa.Table:
    """``prefix.system`` + ``prefix.code`` → ``prefix.code = system|code``."""
    sys_col, code_col = f"{prefix}.system", f"{prefix}.code"
    joined = pc.binary_join_element_wise(
        pc.cast(batch[sys_col], pa.string()), pc.cast(batch[code_col], pa.string()), "|"
    )
    out = batch.drop_columns([sys_col])
    return out.set_column(out.column_names.index(code_col), code_col, joined)


def expand_system_code(batch: pa.Table, prefix: str) -> pa.Table:
    """Inverse: split ``system|code`` on the first pipe."""
    code_col = f"{prefix}.code"
    parts = pc.split_pattern(batch[code_col], "|", max_splits=1)
    sys_part = pc.list_element(parts, 0)
    code_part = pc.list_element(parts, 1)
    out = batch.set_column(batch.column_names.index(code_col), code_col, code_part)
    return out.append_column(f"{prefix}.system", sys_part)


# ------------------------------------------------------- backbone zip


def zip_backbone(batch: pa.Table, columns: list[str], out_name: str) -> pa.Table:
    """Parallel equal-length list columns → one list-of-struct column.

    Mirrors ``ingest_backbone_elements``'s index-aligned zip; raises when the
    lists disagree in length (the reference asserts the same,
    /root/reference/fhirflat/resources/base.py:228-236)."""
    first = batch[columns[0]].combine_chunks()
    lengths = pc.list_value_length(first)
    for c in columns[1:]:
        if not pc.all(
            pc.equal(pc.list_value_length(batch[c].combine_chunks()), lengths)
        ).as_py():
            raise ValueError(f"backbone lists are not index-aligned across {columns}")
    children = [batch[c].combine_chunks().flatten() for c in columns]
    struct_flat = pa.StructArray.from_arrays(children, [c.split(".")[-1] for c in columns])
    offsets = first.offsets
    zipped = pa.ListArray.from_arrays(offsets, struct_flat)
    out = batch.drop_columns(columns)
    return out.append_column(out_name, zipped)
