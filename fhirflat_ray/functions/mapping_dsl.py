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
            ids, cols, vals = [], [], []
            for var, g in long.groupby("raw_variable"):
                rules = self.by_var.get(str(var))
                if rules is None:
                    continue  # unmapped variable: warn-level skip
                field = g["raw_response"]
                row_cols = {c: g[c] for c in g.columns}
                for _, rule in rules.iterrows():
                    want = rule.get("raw_response")
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
            return pa.table(
                {
                    id_column: pa.array(ids),
                    "target_column": pa.array(cols, pa.string()),
                    "value": pa.array(vals, pa.string()),
                }
            )

    return ds.map_batches(
        ApplyRules,
        fn_constructor_kwargs={"ref": map_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def pivot_assignments(assign_ds, id_column: str):
    """Assignment rows → one wide row per id (``groupby(id).agg`` — the
    reference's snippet-merge, ingest.py:181-226). Conflicting duplicate
    assignments keep the first value, mirroring duplicate-key merge."""

    from fhirflat_ray.functions.util import bucketed_map_groups

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pivot per BUCKET (first-wins on duplicate keys),
        # not Python per id — ids in the bucket share the unioned column set
        p = g.pivot_table(
            index=id_column, columns="target_column", values="value", aggfunc="first"
        ).reset_index()
        p.columns = [str(c) for c in p.columns]
        return p

    return bucketed_map_groups(assign_ds, [id_column], widen)
