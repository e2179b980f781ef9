"""Unit tests for flatten/unflatten — parametrized literal frames, mirroring
/root/reference/tests/test_fhir2flat_units.py and test_flat2fhir_units.py."""

from __future__ import annotations

import pyarrow as pa
import pytest

from fhirflat_ray.stages.flatten import (
    TableConfig,
    condense_system_code,
    expand_system_code,
    flatten_batch,
    unflatten_batch,
    zip_backbone,
)


def nested_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "admission": pa.array(
                [
                    {"disposition": {"code": "home", "system": "sys1"}},
                    {"disposition": {"code": "other", "system": "sys2"}},
                ],
                pa.struct(
                    [("disposition", pa.struct([("code", pa.string()), ("system", pa.string())]))]
                ),
            ),
            "tags": pa.array([["a"], None], pa.list_(pa.string())),  # len<=1 → unwrap
            "codes": pa.array([["x", "y"], ["z"]], pa.list_(pa.string())),  # len>1 → dense
        }
    )


def test_flatten_dotted_names_and_dense():
    flat = flatten_batch(nested_table())
    assert flat.column_names == [
        "id",
        "admission.disposition.code",
        "admission.disposition.system",
        "tags",
        "codes_dense",
    ]
    assert flat["admission.disposition.code"].to_pylist() == ["home", "other"]
    assert flat["tags"].to_pylist() == ["a", None]
    assert flat["codes_dense"].to_pylist() == [["x", "y"], ["z"]]


def test_flatten_exclusions():
    cfg = TableConfig(exclude=("admission.disposition.system",))
    flat = flatten_batch(nested_table(), cfg)
    assert "admission.disposition.system" not in flat.column_names


def test_unflatten_restores_structs():
    flat = pa.table(
        {
            "id": pa.array([1, 2]),
            "a.b.c": pa.array(["x", "y"]),
            "a.b.d": pa.array([10, 20]),
            "a.e": pa.array([True, False]),
        }
    )
    out = unflatten_batch(flat)
    assert out.column_names == ["id", "a"]
    assert out["a"].to_pylist() == [
        {"b": {"c": "x", "d": 10}, "e": True},
        {"b": {"c": "y", "d": 20}, "e": False},
    ]


def test_flatten_unflatten_roundtrip_structs():
    t = nested_table().select(["id", "admission"])
    back = unflatten_batch(flatten_batch(t))
    assert back["admission"].to_pylist() == t["admission"].to_pylist()


def test_unflatten_dense_and_defaults():
    flat = pa.table({"codes_dense": pa.array([["x", "y"]], pa.list_(pa.string()))})
    out = unflatten_batch(flat, TableConfig(defaults={"status": "planned"}))
    assert out["codes"].to_pylist() == [["x", "y"]]
    assert out["status"].to_pylist() == ["planned"]


def test_condense_and_expand_system_code():
    t = pa.table(
        {
            "c.system": pa.array(["http://loinc", "s2"]),
            "c.code": pa.array(["1234", "ab"]),
        }
    )
    condensed = condense_system_code(t, "c")
    assert condensed.column_names == ["c.code"]
    assert condensed["c.code"].to_pylist() == ["http://loinc|1234", "s2|ab"]
    back = expand_system_code(condensed, "c")
    assert back["c.system"].to_pylist() == ["http://loinc", "s2"]
    assert back["c.code"].to_pylist() == ["1234", "ab"]


def test_zip_backbone_aligned():
    t = pa.table(
        {
            "id": pa.array([1, 2]),
            "obs.name": pa.array([["hr", "bp"], ["temp"]], pa.list_(pa.string())),
            "obs.value": pa.array([["60", "120"], ["37"]], pa.list_(pa.string())),
        }
    )
    out = zip_backbone(t, ["obs.name", "obs.value"], "obs_dense")
    assert out["obs_dense"].to_pylist() == [
        [{"name": "hr", "value": "60"}, {"name": "bp", "value": "120"}],
        [{"name": "temp", "value": "37"}],
    ]


def test_zip_backbone_misaligned_raises():
    t = pa.table(
        {
            "a.x": pa.array([["1", "2"]], pa.list_(pa.string())),
            "a.y": pa.array([["1"]], pa.list_(pa.string())),
        }
    )
    with pytest.raises(ValueError, match="index-aligned"):
        zip_backbone(t, ["a.x", "a.y"], "a_dense")


def test_finalizer_hook():
    def add_kind(t: pa.Table) -> pa.Table:
        return t.append_column("kind", pa.array(["patient"] * t.num_rows))

    out = unflatten_batch(pa.table({"id": pa.array([1])}), TableConfig(finalizer=add_kind))
    assert out["kind"].to_pylist() == ["patient"]


def test_flatten_extensions_url_keyed():
    """M7 complete form: list<struct{url, value*}> → one dotted column group
    per distinct url; first occurrence wins; missing urls are null."""
    import pyarrow as pa

    from fhirflat_ray.stages.flatten import flatten_extensions_batch

    ext_type = pa.list_(
        pa.struct(
            [
                ("url", pa.string()),
                ("valueInteger", pa.int64()),
                ("valueDate", pa.string()),
            ]
        )
    )
    rows = [
        [
            {"url": "relativeDay", "valueInteger": 2, "valueDate": None},
            {"url": "approximateDate", "valueInteger": None, "valueDate": "2012-09"},
        ],
        [{"url": "relativeDay", "valueInteger": 5, "valueDate": None}],
        None,
    ]
    batch = pa.table(
        {"id": pa.array([1, 2, 3], pa.int64()), "extension": pa.array(rows, ext_type)}
    )
    out = flatten_extensions_batch(batch)
    assert "extension" not in out.column_names
    assert out["extension.relativeDay.valueInteger"].to_pylist() == [2, 5, None]
    assert out["extension.approximateDate.valueDate"].to_pylist() == ["2012-09", None, None]
    # valueDate never set for relativeDay → leaf dropped entirely
    assert "extension.relativeDay.valueDate" not in out.column_names


def test_flatten_extensions_nested_complex():
    import pyarrow as pa

    from fhirflat_ray.stages.flatten import flatten_extensions_batch

    inner = pa.struct([("url", pa.string()), ("valueInteger", pa.int64())])
    outer = pa.list_(
        pa.struct([("url", pa.string()), ("extension", pa.list_(inner))])
    )
    rows = [
        [{"url": "timingPhase", "extension": [{"url": "days", "valueInteger": 3}]}],
        [],
    ]
    batch = pa.table({"id": pa.array([1, 2]), "extension": pa.array(rows, outer)})
    out = flatten_extensions_batch(batch)
    assert out["extension.timingPhase.days.valueInteger"].to_pylist() == [3, None]
