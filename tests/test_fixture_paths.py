"""F3 (unsorted→layout), F4 (vocab drift), A2 condense, and property-based
codec robustness (hypothesis)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fhirflat_ray import fixtures
from fhirflat_ray.codecs import decode_column, encode_column
from fhirflat_ray.codecs.ints import decode_ints, encode_ints
from fhirflat_ray.pipelines import verify as ver
from fhirflat_ray.state import segments as seg


# ------------------------------------------------------------- F3 layout


def test_unsorted_layout_restores_compression():
    """Sort-within-partition must recover the sorted table's run lengths
    (FIXTURES.md F3): encoding the permuted table after sort_by produces the
    same bytes as encoding the sorted original."""
    sorted_t = fixtures.make_transcripts(5_000, seed=5)
    unsorted_t = fixtures.make_unsorted_transcripts(5_000, seed=5)
    assert not unsorted_t.equals(sorted_t)

    restored = unsorted_t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    h1, p1 = seg.encode_table(sorted_t)
    h2, p2 = seg.encode_table(restored)
    assert len(p2) == len(p1)

    # encoding WITHOUT the sort must cost strictly more (runs destroyed)
    _, p3 = seg.encode_table(unsorted_t)
    assert len(p3) > len(p1)


# ------------------------------------------------------------- F4 vocab drift


def test_vocab_drift_shared_dict_fallback(ray_session, tmp_path):
    """Fragments with disjoint tool vocabularies: the sampled shared
    dictionary may miss fragment-2 values; those partitions must fall back
    to local dictionaries and still round-trip (FIXTURES.md F4)."""
    import pyarrow.parquet as pq

    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc

    base = fixtures.make_transcripts(4_000, seed=6)
    half = base.num_rows // 2
    frag1 = base.slice(0, half).set_column(
        4, "tool", pa.array(["bash", "read"] * (half // 2), pa.string())
    )
    frag2 = base.slice(half).set_column(
        4, "tool", pa.array(["edit", "write", "search", "edit"] * (half // 4), pa.string())
    )
    d = tmp_path / "drift"
    d.mkdir()
    pq.write_table(frag1, str(d / "a.parquet"))
    pq.write_table(frag2, str(d / "b.parquet"))

    out = str(tmp_path / "enc")
    # sample only the FIRST fragment's vocab → frag2 values are out-of-vocab
    manifest = enc.encode_files(
        str(d), out, shared_dict_columns=["tool"], target_rows=2_000,
    )
    verdict = ver.verify_roundtrip(
        __import__("ray.data", fromlist=["x"]).read_parquet(str(d)),
        dec.decode_dataset(out),
    )
    assert verdict["equal"], verdict
    assert manifest["n_rows"] == 4_000


# ------------------------------------------------------------- A2 condense


def test_condense_one_to_one_conflict_routing(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "subject": ["s1", "s1", "s2", "s2", "s3"],
            "sex": ["f", None, "m", "m", None],
            "site": ["a", "a", "b", "c", None],
        }
    )
    out = ver.condense_one_to_one(rd.from_arrow(t), "subject")
    valid, errors = ver.split_valid(out)
    v = {r["subject"]: r for r in valid.take_all()}
    assert v["s1"]["sex"] == "f" and v["s1"]["site"] == "a"
    assert v["s3"]["sex"] is None
    errs = errors.take_all()
    assert len(errs) == 1 and errs[0]["subject"] == "s2"
    assert "site" in errs[0]["_error"]


# ------------------------------------------------------------- hypothesis


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300))
def test_int_codec_roundtrip_property(vals):
    v = np.array(vals, dtype=np.int64)
    hdr, blob = encode_ints(v)
    assert decode_ints(hdr, blob, len(v)).tolist() == v.tolist()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=100))
def test_string_column_roundtrip_property(vals):
    arr = pa.array(vals, pa.string())
    hdr, blob = encode_column(arr)
    assert decode_column(hdr, blob).equals(arr)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)), max_size=100),
)
def test_int32_column_roundtrip_property(vals):
    arr = pa.array(vals, pa.int32())
    hdr, blob = encode_column(arr)
    assert decode_column(hdr, blob).equals(arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=60))
def test_binary_column_roundtrip_property(vals):
    arr = pa.array(vals, pa.binary())
    hdr, blob = encode_column(arr)
    assert decode_column(hdr, blob).equals(arr)
