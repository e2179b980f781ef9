"""Mapping-DSL evaluator + rule application — the reference's user-authored
transform surface (mapping tables keyed by (raw_variable, raw_response), see
/root/reference/fhirflat/ingest.py:49-131 and docs/spec/mapping.md)
re-expressed as vectorized per-batch transforms over a broadcast rule table.

DSL semantics preserved (ingest.py:49-95):

- ``<FIELD>``        → the melted response value itself
- ``<col>``          → another column of the same row
- ``a+b``            → evaluate parts, drop NaNs, join with " " unless the
                       first part contains "/" (then join with "")
- ``x if not y``     → x when y is null/empty, else None
- anything else      → literal constant
- date-typed targets → ISO-8601 normalization (``format_dates``,
                       ingest.py:98-131): parse with the given format,
                       attach the timezone, date-only when no time part.

``apply_mapping_long`` is the engine form of ``create_dict_long``
(ingest.py:229-270): melt wide rows to (row, variable, response), look up
rules in the broadcast mapping table, evaluate each target expression, and
emit (row_id, target_column, value) assignment rows.
"""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

import numpy as np
import pandas as pd
import pyarrow as pa


def format_date_value(value, date_format: str, timezone: str):
    """ISO-8601 normalization of one date string (None passes through,
    unparseable values pass through with a warning — the reference routes
    those to validation errors downstream)."""
    import warnings

    if value is None or (isinstance(value, float) and np.isnan(value)):
        return None
    tz = ZoneInfo(timezone)
    s = str(value)
    try:
        dt = datetime.strptime(s, date_format).replace(tzinfo=tz)
        if "%H" not in date_format:
            return dt.date().isoformat()
        return dt.isoformat()
    except ValueError:
        try:
            date_part, time_part = s.split(" ", 1)
            d = datetime.strptime(date_part, date_format)
            import dateutil.parser

            t = dateutil.parser.parse(time_part).time()
            return datetime.combine(d, t).replace(tzinfo=tz).isoformat()
        except (ValueError, ImportError):
            warnings.warn(
                f"Date {s!r} could not be converted using format {date_format!r}",
                UserWarning,
                stacklevel=2,
            )
            return s


def eval_field_expr(
    expr,
    row_columns: dict[str, pd.Series],
    field: pd.Series,
    target_attr: str = "",
    date_format: str = "%Y-%m-%d",
    timezone: str = "UTC",
) -> pd.Series:
    """Vectorized DSL evaluation: one value per row of the batch."""
    n = len(field)
    idx = field.index

    def resolve(m) -> pd.Series:
        if m is None or (isinstance(m, float) and np.isnan(m)):
            return pd.Series([None] * n, index=idx, dtype=object)
        m = str(m).strip()
        if m == "<FIELD>":
            return field.astype(object)
        if "+" in m:
            # vectorized concat with the reference's rules (ingest.py:59-66):
            # drop null parts, join with " " unless the FIRST KEPT part
            # contains "/" (then join with ""). pyarrow's null_handling=
            # "skip" drops nulls per row; pc.coalesce finds the first kept
            # part; a per-row separator array carries the slash rule.
            import pyarrow as _pa
            import pyarrow.compute as _pc

            parts = [resolve(p.strip()) for p in m.split("+")]
            arrs = []
            for p in parts:
                mask = p.isna().to_numpy()
                vals = p.astype(str).to_numpy(dtype=object)
                vals[mask] = None
                arrs.append(_pa.array(vals, _pa.string()))
            first_kept = _pc.coalesce(*arrs)
            sep = _pc.if_else(
                _pc.match_substring(first_kept, "/"),
                _pa.scalar("", _pa.string()),
                _pa.scalar(" ", _pa.string()),
            )  # null first_kept (all parts null) → null sep → null result
            joined = _pc.binary_join_element_wise(*arrs, sep, null_handling="skip")
            return pd.Series(joined.to_pylist(), index=idx, dtype=object)
        if "if not" in m:
            x_m, y_m = (p.strip() for p in m.replace(" ", "").split("ifnot"))
            x, y = resolve(x_m), resolve(y_m)
            y_empty = y.isna() | (y.astype(object) == "") | (y.astype(object) == 0)
            return x.where(y_empty, other=None).astype(object)
        if m.startswith("<") and m.endswith(">"):
            col = m[1:-1]
            if col not in row_columns:
                raise KeyError(f"Column {col!r} not found in the batch")
            return row_columns[col].astype(object)
        return pd.Series([m] * n, index=idx, dtype=object)

    out = resolve(expr)
    attr = target_attr.lower()
    if "date" in attr or "period" in attr:
        # date values repeat heavily; format each DISTINCT value once and
        # map back (identical semantics, per-unique instead of per-row cost)
        def _is_null(v) -> bool:
            return v is None or (isinstance(v, float) and np.isnan(v))

        cache = {
            v: format_date_value(v, date_format, timezone)
            for v in pd.unique(out)
            if not _is_null(v)
        }
        out = out.map(lambda v: None if _is_null(v) else cache[v])
    return out


def melt_batch(batch: pa.Table, id_column: str, value_columns: list[str]) -> pd.DataFrame:
    """Wide → long (one row per (id, variable, response)); drops nulls —
    the reference's ``melt`` + ``dropna`` (ingest.py:350-353).

    ALL original columns ride along as id_vars so ``<col>`` expressions can
    reference sibling fields — the melt-context back-join the reference does
    via ``raw_data.loc[row["index"], col]`` (ingest.py:84-87, SURVEY §2.4
    J2), done shuffle-free by projecting before the unpivot."""
    import numpy as np

    df = batch.to_pandas()
    df = df.assign(__row__=np.arange(len(df)))
    vcols = [c for c in value_columns if c != id_column]
    long = df[["__row__"] + vcols].melt(
        id_vars="__row__", var_name="raw_variable", value_name="raw_response"
    )
    long = long.dropna(subset=["raw_response"])
    # re-attach the FULL original row (value columns included) as context
    long = long.merge(df, on="__row__", how="left")
    return long.drop(columns="__row__").reset_index(drop=True)


def apply_mapping_long(
    ds,
    mapping: pd.DataFrame,
    id_column: str,
    value_columns: list[str],
    date_format: str = "%Y-%m-%d",
    timezone: str = "UTC",
):
    """Melt → broadcast rule lookup → DSL eval → assignment rows.

    ``mapping`` columns: raw_variable, raw_response (NaN = wildcard),
    target_column, expr. Returns a Dataset of
    (``id_column``, target_column, value) rows. Unmapped (variable,
    response) pairs are skipped with the reference's warn-don't-fail
    behavior (ingest.py:164-172).
    """
    import ray

    map_ref = ray.put(mapping)

    class ApplyRules:
        def __init__(self, ref):
            m = ray.get(ref).copy()
            m["raw_variable"] = m["raw_variable"].astype(str)
            self.by_var: dict[str, pd.DataFrame] = dict(iter(m.groupby("raw_variable")))

        def __call__(self, batch: pa.Table) -> pa.Table:
            long = melt_batch(batch, id_column, value_columns)
            ids, cols, vals, snips = [], [], [], []
            snippet_no = 0  # one snippet per (variable, raw_response) pair —
            # all target columns a response maps to form ONE snippet, so
            # pivot_assignments(duplicates="list_merge") can reconstruct the
            # reference's snippet grouping (ingest.py:150-181). groupby
            # sort=False keeps melt (value_columns) order, like the
            # reference's per-row column order.
            for var, g in long.groupby("raw_variable", sort=False):
                rules = self.by_var.get(str(var))
                if rules is None:
                    continue  # unmapped variable: warn-level skip
                field = g["raw_response"]
                row_cols = {c: g[c] for c in g.columns}
                snippet_of: dict[str, int] = {}
                for _, rule in rules.iterrows():
                    want = rule.get("raw_response")
                    want_key = str(want)
                    if want_key not in snippet_of:
                        snippet_of[want_key] = snippet_no
                        snippet_no += 1
                    if want is not None and not (isinstance(want, float) and np.isnan(want)):
                        sel = g[field.astype(str) == str(want)]
                    else:
                        sel = g
                    if sel.empty:
                        continue
                    out = eval_field_expr(
                        rule["expr"],
                        {k: v.loc[sel.index] for k, v in row_cols.items()},
                        sel["raw_response"],
                        target_attr=str(rule["target_column"]),
                        date_format=date_format,
                        timezone=timezone,
                    )
                    ids.extend(sel[id_column].tolist())
                    cols.extend([rule["target_column"]] * len(sel))
                    vals.extend(str(v) if v is not None else None for v in out.tolist())
                    snips.extend([snippet_of[want_key]] * len(sel))
            return pa.table(
                {
                    id_column: pa.array(ids),
                    "target_column": pa.array(cols, pa.string()),
                    "value": pa.array(vals, pa.string()),
                    "snippet_idx": pa.array(snips, pa.int32()),
                }
            )

    from fhirflat_ray.functions.util import worker_cached_stage

    return ds.map_batches(
        worker_cached_stage(ApplyRules, ref=map_ref), batch_format="pyarrow"
    )


def group_keys(data_keys) -> dict[str, list[str]]:
    """Dotted flat columns grouped by their first segment (the reference's
    ``group_keys``, /root/reference/fhirflat/util.py:22-34)."""
    from itertools import groupby as _groupby

    ks = sorted(k for k in data_keys if "." in k)
    return {k: list(g) for k, g in _groupby(ks, lambda x: x.split(".")[0])}


def merge_snippets(snippets: list[dict]) -> dict:
    """The reference's duplicate-key snippet merge (ingest.py:181-226),
    applied snippet-by-snippet in order:

    - no key overlap → union;
    - overlapping keys all (stringified-)equal → the whole snippet is
      skipped;
    - overlapping keys all ``None`` in the accumulated result → replaced;
    - otherwise conflicting keys grow into LISTS (append), keys new in this
      snippet are front-padded with ``None`` to the list length, and any
      dotted-prefix group containing every snippet key is end-padded so its
      members stay index-aligned.
    """
    result: dict = {}
    for snippet in snippets:
        dup = set(result) & set(snippet)
        if not dup:
            result.update(snippet)
            continue
        if all(str(result[k]) == str(snippet[k]) for k in dup):
            continue
        if all(result[k] is None for k in dup):
            result.update(snippet)
            continue
        for k in dup:
            if isinstance(result[k], list):
                result[k] = result[k] + [snippet[k]]
            else:
                result[k] = [result[k], snippet[k]]
        remaining = set(snippet) - dup
        if remaining:
            key_length = max(
                len(result[k]) for k in dup if isinstance(result[k], list)
            )
            for k in remaining:
                result[k] = [None] * (key_length - 1) + [snippet[k]]
        sk = set(snippet)
        for k_list in group_keys(result).values():
            if sk <= set(k_list):
                rel = {
                    k: result[k] if isinstance(result[k], list) else [result[k]]
                    for k in k_list
                }
                lens = set(map(len, rel.values()))
                if len(lens) > 1:
                    target = max(lens)
                    for k, v in rel.items():
                        if len(v) < target:
                            result[k] = v + [None] * (target - len(v))
    return result


def pivot_assignments(assign_ds, id_column: str, duplicates: str = "first"):
    """Assignment rows → one wide row per id (the reference's snippet-merge,
    ingest.py:181-226).

    ``duplicates="first"`` (default): one vectorized pivot per BUCKET,
    first value wins on duplicate keys — the fast path when rules don't
    collide. ``duplicates="list_merge"``: full reference semantics via
    :func:`merge_snippets` — rows sharing a ``snippet_idx`` form one
    snippet, conflicting values grow into None-padded, group-aligned lists
    (serialized as JSON strings in the Arrow output, since a column cannot
    mix scalars and lists). The merge is per id (the reference pays the
    same row-structured cost); the shuffle stays one coarse bucket pass."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    if duplicates == "first":

        def widen(g: pd.DataFrame) -> pd.DataFrame:
            # one vectorized pivot per BUCKET (first-wins on duplicate keys),
            # not Python per id — ids in the bucket share the unioned column set
            p = g.pivot_table(
                index=id_column, columns="target_column", values="value", aggfunc="first"
            ).reset_index()
            p.columns = [str(c) for c in p.columns]
            return p

        return bucketed_map_groups(assign_ds, [id_column], widen)

    if duplicates != "list_merge":
        raise ValueError(f"duplicates must be 'first' or 'list_merge', got {duplicates!r}")

    def widen_merge(g: pd.DataFrame) -> pd.DataFrame:
        import json

        has_idx = "snippet_idx" in g.columns
        order = ["snippet_idx"] if has_idx else []
        rows: list[dict] = []
        for rid, rg in g.groupby(id_column, sort=False):
            if order:
                rg = rg.sort_values(order, kind="mergesort")
            snippets = []
            if has_idx:
                for _, sg in rg.groupby("snippet_idx", sort=True):
                    snippets.append(
                        dict(zip(sg["target_column"], sg["value"]))
                    )
            else:  # every row its own snippet, arrival order
                snippets = [
                    {c: v} for c, v in zip(rg["target_column"], rg["value"])
                ]
            merged = merge_snippets(snippets)
            out = {id_column: rid}
            for k, v in merged.items():
                out[k] = json.dumps(v) if isinstance(v, list) else v
            rows.append(out)
        return pd.DataFrame(rows)

    return bucketed_map_groups(assign_ds, [id_column], widen_merge)
