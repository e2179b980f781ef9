"""Mapping-DSL tests, mirroring /root/reference/tests/test_ingest.py:63-215
(find_field_value expressions, format_dates, warn/skip paths)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fhirflat_ray.functions import mapping_dsl as dsl


def batch_field(vals):
    return pd.Series(vals, dtype=object)


def test_field_and_literal_and_column():
    field = batch_field(["a", "b"])
    cols = {"city": pd.Series(["Paris", "Oslo"], dtype=object)}
    assert dsl.eval_field_expr("<FIELD>", cols, field).tolist() == ["a", "b"]
    assert dsl.eval_field_expr("fixed", cols, field).tolist() == ["fixed", "fixed"]
    assert dsl.eval_field_expr("<city>", cols, field).tolist() == ["Paris", "Oslo"]
    with pytest.raises(KeyError, match="nope"):
        dsl.eval_field_expr("<nope>", cols, field)


def test_plus_concat_space_and_slash_rules():
    field = batch_field(["x"])
    cols = {"a": pd.Series(["Hospital"], dtype=object), "b": pd.Series(["Ward 2"], dtype=object)}
    assert dsl.eval_field_expr("<a>+<b>", cols, field).tolist() == ["Hospital Ward 2"]
    # first part containing "/" joins without a space (system/code URLs)
    cols2 = {"a": pd.Series(["http://sys/"], dtype=object), "b": pd.Series(["code1"], dtype=object)}
    assert dsl.eval_field_expr("<a>+<b>", cols2, field).tolist() == ["http://sys/code1"]
    # NaN parts are dropped
    cols3 = {"a": pd.Series([np.nan], dtype=object), "b": pd.Series(["only"], dtype=object)}
    assert dsl.eval_field_expr("<a>+<b>", cols3, field).tolist() == ["only"]


def test_if_not_conditional():
    field = batch_field(["v1", "v2"])
    cols = {
        "x": pd.Series(["keep", "keep"], dtype=object),
        "y": pd.Series([None, "present"], dtype=object),
    }
    out = dsl.eval_field_expr("<x> if not <y>", cols, field)
    assert out.tolist() == ["keep", None]


def test_date_normalization_applied_to_date_targets():
    field = batch_field(["2021-04-02", "02/05/2021"])
    out = dsl.eval_field_expr(
        "<FIELD>", {}, field, target_attr="encounter.actualPeriod.start",
        date_format="%Y-%m-%d", timezone="UTC",
    )
    assert out.tolist()[0] == "2021-04-02"
    # second value doesn't match the format → warned + passed through
    with pytest.warns(UserWarning):
        out2 = dsl.eval_field_expr(
            "<FIELD>", {}, batch_field(["02/05/2021"]),
            target_attr="birthDate", date_format="%Y-%m-%d", timezone="UTC",
        )
    assert out2.tolist() == ["02/05/2021"]


def test_date_with_time_and_timezone():
    out = dsl.format_date_value("2021-04-02 14:30", "%Y-%m-%d", "Europe/Oslo")
    assert out.startswith("2021-04-02T14:30:00+02:00")


def test_melt_batch_drops_nulls():
    t = pa.table({"rid": [1, 2], "q1": ["yes", None], "q2": ["no", "maybe"]})
    long = dsl.melt_batch(t, "rid", ["q1", "q2"])
    assert len(long) == 3
    assert set(long["raw_variable"]) == {"q1", "q2"}


def test_apply_mapping_long_end_to_end(ray_session):
    import ray.data as rd

    raw = pa.table(
        {
            "rid": pa.array([1, 2, 3], pa.int64()),
            "sex": ["female", "male", None],
            "adm_date": ["2021-01-05", "2021-02-06", "2021-03-07"],
        }
    )
    mapping = pd.DataFrame(
        [
            {"raw_variable": "sex", "raw_response": "female", "target_column": "gender", "expr": "f"},
            {"raw_variable": "sex", "raw_response": "male", "target_column": "gender", "expr": "m"},
            {"raw_variable": "adm_date", "raw_response": None, "target_column": "period.start.date", "expr": "<FIELD>"},
        ]
    )
    assigns = dsl.apply_mapping_long(
        rd.from_arrow(raw), mapping, "rid", ["sex", "adm_date"]
    )
    wide = dsl.pivot_assignments(assigns, "rid").to_pandas().sort_values("rid")
    assert wide["gender"].tolist()[:2] == ["f", "m"]
    assert wide["period.start.date"].tolist() == ["2021-01-05", "2021-02-06", "2021-03-07"]
    # rid 3 has null sex → no gender assignment
    assert wide[wide["rid"] == 3]["gender"].isna().all()
