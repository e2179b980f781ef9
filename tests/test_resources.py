"""Golden tests for the 13-resource ``TableConfig`` catalog: every config's
exclusions, reference wraps, casts, truncations and defaults are exercised
through the real flatten → cleanup → unflatten path (the reference's
fhir2flat / cleanup / expand_concepts discipline, resources/*.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from fhirflat_ray.stages.resources import (
    BASE_EXCLUSIONS,
    RESOURCE_CONFIGS,
    cleanup_flat_batch,
    expand_resource_batch,
    flatten_resource_batch,
)

N = 3


def _get_path(tbl: pa.Table, path: str) -> pa.Array:
    parts = path.split(".")
    arr = tbl[parts[0]]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    for p in parts[1:]:
        arr = pc.struct_field(arr, p)
    return arr


def test_catalog_covers_thirteen_resources():
    assert len(RESOURCE_CONFIGS) == 13
    for cfg in RESOURCE_CONFIGS.values():
        assert set(BASE_EXCLUSIONS) <= set(cfg.exclude)


@pytest.mark.parametrize("resource", sorted(RESOURCE_CONFIGS))
def test_flatten_drops_excluded_attributes(resource):
    cfg = RESOURCE_CONFIGS[resource]
    own = [e for e in cfg.exclude if e not in BASE_EXCLUSIONS]
    excl = own[0] if own else cfg.exclude[0]
    nested = pa.table(
        {
            "subject_ref": pa.array(["p1", "p2", "p3"]),
            excl: pa.array(["drop-me"] * N),
            "meta": pa.array(["base-drop"] * N),  # base exclusion
            "code": pa.StructArray.from_arrays(
                [pa.array(["sys"] * N), pa.array(["c"] * N)], ["system", "code"]
            ),
        }
    )
    flat = flatten_resource_batch(nested, resource)
    assert excl not in flat.column_names
    assert "meta" not in flat.column_names
    assert "code.system" in flat.column_names and "code.code" in flat.column_names


@pytest.mark.parametrize("resource", sorted(RESOURCE_CONFIGS))
def test_expand_applies_cleanup_and_defaults(resource):
    cfg = RESOURCE_CONFIGS[resource]
    cols: dict[str, pa.Array] = {"rownum": pa.array(range(N), pa.int64())}
    for f in cfg.reference_fields[:3]:
        cols[f] = pa.array([f"{f}-val-{i}" for i in range(N)])
    for f in cfg.string_cast_fields:
        if f not in cols:
            cols[f] = pa.array(range(N), pa.int64())  # numeric → must become string
    for f in cfg.date_truncate_fields:
        cols[f] = pa.array(["2021-03-04T12:30:00"] * N)
    flat = pa.table(cols)
    out = expand_resource_batch(flat, resource)

    for f in cfg.reference_fields[:3]:
        wrapped = _get_path(out, f + ".reference")
        assert wrapped.to_pylist() == [f"{f}-val-{i}" for i in range(N)], f
    for f in cfg.string_cast_fields:
        if f in cfg.reference_fields:
            arr = _get_path(out, f + ".reference")
        else:
            arr = _get_path(out, f)
        assert pa.types.is_string(arr.type), f
    for f in cfg.date_truncate_fields:
        assert _get_path(out, f).to_pylist() == ["2021-03-04"] * N, f
    for name, default in cfg.flat_defaults.items():
        got = _get_path(out, name).to_pylist()
        assert got == [default] * N, name


def test_cleanup_respects_existing_values_and_missing_columns():
    """Defaults only fill ABSENT columns; cleanup skips fields not in the
    batch (the reference's .intersection(data.keys()))."""
    cfg = RESOURCE_CONFIGS["encounter"]
    flat = pa.table({"status": pa.array(["planned"] * N)})
    out = cleanup_flat_batch(flat, cfg)
    assert out["status"].to_pylist() == ["planned"] * N  # not overwritten

    # a field already in .reference form is left alone (no double wrap)
    flat2 = pa.table({"subject.reference": pa.array(["p1"] * N)})
    out2 = cleanup_flat_batch(flat2, cfg)
    assert "subject.reference" in out2.column_names
    assert "subject.reference.reference" not in out2.column_names


def test_patient_roundtrip_shape():
    """Patient end-to-end: id stringified, birthDate truncated, exclusions
    dropped (patient.py:41-82)."""
    nested = pa.table(
        {
            "id": pa.array([10, 11, 12], pa.int64()),
            "birthDate": pa.array(["1990-01-02T08:00:00"] * N),
            "name": pa.array(["secret"] * N),  # excluded (PII)
            "gender": pa.array(["female", "male", "other"]),
        }
    )
    flat = flatten_resource_batch(nested, "patient")
    assert "name" not in flat.column_names
    out = expand_resource_batch(flat, "patient")
    assert out["id"].to_pylist() == ["10", "11", "12"]
    assert out["birthDate"].to_pylist() == ["1990-01-02"] * N
    assert out["gender"].to_pylist() == ["female", "male", "other"]
