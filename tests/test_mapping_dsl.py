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


def test_merge_snippets_reference_semantics():
    """The four duplicate-key branches of the reference merge
    (/root/reference/fhirflat/ingest.py:181-226)."""
    # equal values → snippet skipped entirely (its new keys too)
    assert dsl.merge_snippets([{"a": "x"}, {"a": "x", "b": "new"}]) == {"a": "x"}
    # existing None → replaced
    assert dsl.merge_snippets([{"a": None}, {"a": "x"}]) == {"a": "x"}
    # conflict → list append
    assert dsl.merge_snippets([{"a": "x"}, {"a": "y"}, {"a": "z"}]) == {
        "a": ["x", "y", "z"]
    }
    # new key arriving WITH a conflict → front-padded with None
    assert dsl.merge_snippets([{"c.code": "x"}, {"c.code": "y", "c.text": "t"}]) == {
        "c.code": ["x", "y"],
        "c.text": [None, "t"],
    }
    # dotted-prefix group alignment: a later single-key snippet extends
    # c.code, so c.text (same group) is end-padded to stay index-aligned
    assert dsl.merge_snippets(
        [{"c.code": "x", "c.text": "t"}, {"c.code": "y"}]
    ) == {"c.code": ["x", "y"], "c.text": ["t", None]}


def test_pivot_assignments_list_merge(ray_session):
    """End-to-end: two rules mapping the same response to the same target
    with different values → JSON list in the wide row; first-wins mode keeps
    the first value only."""
    import json

    import ray.data as rd

    raw = pa.table(
        {
            "rid": pa.array([1, 2], pa.int64()),
            "dx": ["cough", "fever"],
        }
    )
    mapping = pd.DataFrame(
        [
            {"raw_variable": "dx", "raw_response": "cough", "target_column": "code.code", "expr": "R05"},
            {"raw_variable": "dx", "raw_response": "cough", "target_column": "code.text", "expr": "Cough"},
            # a second snippet for the same response, conflicting code
            {"raw_variable": "dx", "raw_response": None, "target_column": "code.code", "expr": "<FIELD>"},
            {"raw_variable": "dx", "raw_response": "fever", "target_column": "code.code", "expr": "R50"},
        ]
    )
    assigns = dsl.apply_mapping_long(rd.from_arrow(raw), mapping, "rid", ["dx"])
    merged = (
        dsl.pivot_assignments(assigns, "rid", duplicates="list_merge")
        .to_pandas()
        .sort_values("rid")
        .set_index("rid")
    )
    # rid 1: snippet {code.code: R05, code.text: Cough} then {code.code: cough}
    # → code.code becomes a list, code.text end-padded (group alignment)
    assert json.loads(merged.loc[1, "code.code"]) == ["R05", "cough"]
    assert json.loads(merged.loc[1, "code.text"]) == ["Cough", None]
    # rid 2: snippets merge in RULE order — the wildcard <FIELD> rule
    # precedes the fever rule in the mapping, so "fever" lands first
    assert json.loads(merged.loc[2, "code.code"]) == ["fever", "R50"]

    first = (
        dsl.pivot_assignments(assigns, "rid", duplicates="first")
        .to_pandas()
        .sort_values("rid")
        .set_index("rid")
    )
    assert first.loc[1, "code.code"] == "R05"
