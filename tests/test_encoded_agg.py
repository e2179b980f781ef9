"""Encoded-domain aggregates: counts/distinct/min-max straight from segment
bytes (codes, vocabs, zone maps) must equal the decoded-table answers."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fhirflat_ray.codecs.ints import decode_ints, encode_ints
from fhirflat_ray.pipelines import encoded_agg as ea
from fhirflat_ray.state import segments as segmod

WORK = "/tmp/fhirflat_ray_test_ea"


def _fixture_df(n: int = 20000) -> pd.DataFrame:
    rng = np.random.default_rng(11)
    return pd.DataFrame(
        {
            "conv_id": [f"conv-{i % 499}" for i in range(n)],
            "turn_idx": (np.arange(n) % 17).astype(np.int32),
            "role": np.where(rng.random(n) < 0.3, "user", "assistant"),
            "tool": rng.choice(["click", "view", "purchase"], n),
            "text": ["text %d body" % (i % 53) for i in range(n)],
            "ts": pd.to_datetime("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 10**8, n), unit="us"),
        }
    )


@pytest.fixture(scope="module")
def seg_dir(ray_session):
    from fhirflat_ray.pipelines import encode as enc

    shutil.rmtree(WORK, ignore_errors=True)
    src = os.path.join(WORK, "src")
    os.makedirs(src)
    df = _fixture_df()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(src, "t.parquet"))
    out = os.path.join(WORK, "enc")
    enc.encode_files(
        src, out, shared_dict_columns=["role"], sort_keys=("conv_id", "turn_idx"), target_rows=4000
    )
    return out, df


def test_code_counts_rle_matches_expansion():
    # sorted codes → RLE; counting runs must equal counting expanded values
    codes = np.repeat(
        np.arange(37, dtype=np.int64), 500 + np.arange(1, 38, dtype=np.int64)
    )
    hdr, blob = encode_ints(codes)
    assert hdr["c"] == "rle"
    counts = ea._code_counts(hdr, blob, len(codes))
    expanded = np.bincount(decode_ints(hdr, blob, len(codes)))
    assert np.array_equal(counts, expanded)


def test_value_counts_shared_and_local_dict(seg_dir):
    out, df = seg_dir
    for col in ("role", "tool", "conv_id"):
        got = (
            ea.encoded_value_counts(out, col)
            .to_pandas()
            .sort_values(col)
            .reset_index(drop=True)
        )
        exp = (
            df.groupby(col).size().reset_index(name="n").sort_values(col).reset_index(drop=True)
        )
        assert got[col].tolist() == exp[col].tolist()
        assert got["n"].tolist() == exp["n"].tolist()


def test_value_counts_null_fallback(ray_session):
    # nulls force the generic decode path; the NULL group must match SQL
    work = os.path.join(WORK, "nulls")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    os.makedirs(src)
    vals = ["a", None, "b", "a", None, "a", "c", None] * 100
    pq.write_table(pa.table({"v": pa.array(vals, pa.string())}), os.path.join(src, "t.parquet"))
    from fhirflat_ray.pipelines import encode as enc

    out = os.path.join(work, "enc")
    enc.encode_files(src, out, sort_keys=None, target_rows=200)
    got = ea.encoded_value_counts(out, "v").to_pandas()
    by = {(None if pd.isna(k) else k): int(v) for k, v in zip(got["v"], got["n"])}
    assert by == {"a": 300, "b": 100, "c": 100, None: 300}


def test_distinct_from_vocab(seg_dir):
    out, df = seg_dir
    got = sorted(ea.encoded_distinct(out, "tool").to_pandas()["tool"])
    assert got == sorted(df["tool"].unique())


def test_min_max_zones_and_fallback(seg_dir):
    out, df = seg_dir
    lo, hi = ea.encoded_min_max(out, "turn_idx")
    assert (lo, hi) == (0, 16)
    lo, hi = ea.encoded_min_max(out, "ts")
    assert lo == int(df["ts"].min().value) and hi == int(df["ts"].max().value)
    # strings carry no zone → per-segment decode fallback
    lo, hi = ea.encoded_min_max(out, "role")
    assert (lo, hi) == ("assistant", "user")


def test_counts_never_decode_strings(seg_dir, monkeypatch):
    # the dict fast path must not call the string decoders at all
    out, _ = seg_dir
    import fhirflat_ray.codecs.strings as strs

    def boom(*a, **k):  # pragma: no cover - tripwire
        raise AssertionError("string decode invoked on the encoded-counts fast path")

    monkeypatch.setattr(strs, "decode_worddict", boom)
    monkeypatch.setattr(strs, "decode_fsst", boom)
    paths = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".seg")
    )
    from fhirflat_ray.state.lineage import load_dict_store

    store = load_dict_store(out)
    t = ea.segment_value_counts(paths[0], "role", store)
    hdr, _off = segmod.read_segment_header(paths[0])
    col = next(c for c in hdr["columns"] if c["name"] == "role")
    assert col["hdr"]["h"]["c"] == "dict" and "shared" in col["hdr"]["h"]
    assert int(pa.compute.sum(t.column("n")).as_py()) == hdr["n_rows"]


def test_int_stream_sum_matches_decode_all_codecs():
    """Encoded-domain SUM closed forms equal decode-then-sum for every int
    codec, including int64 wraparound and RLE's recursive run streams."""
    import numpy as np

    from fhirflat_ray.codecs.ints import decode_ints, encode_ints
    from fhirflat_ray.pipelines.encoded_agg import _int_stream_sum

    rng = np.random.default_rng(2)
    cases = [
        np.repeat(rng.integers(-5, 5, 50), rng.integers(1, 40, 50)),  # rle
        rng.integers(1000, 1100, 5000),  # for
        np.cumsum(rng.integers(0, 3, 5000)) + 10**12,  # delta
        rng.integers(-(2**62), 2**62, 300),  # wide range, wraparound
        np.array([], dtype=np.int64),
        rng.integers(0, 50, 4000) * 3600 + 7,  # gcd-factored for
        np.array([7], dtype=np.int64),
    ]
    for v in cases:
        v = v.astype(np.int64)
        hdr, blob = encode_ints(v)
        got = _int_stream_sum(hdr, blob, len(v))
        with np.errstate(over="ignore"):
            want = int(decode_ints(hdr, blob, len(v)).sum()) if len(v) else 0
        assert got == want, (hdr["c"], got, want)


def test_segment_int_sum_null_fallback(ray_session, tmp_path):
    """Columns with validity bitmaps fall back to the pruned decode and
    skip nulls like SQL SUM."""
    import numpy as np
    import pyarrow as pa

    from fhirflat_ray.pipelines.encoded_agg import segment_int_sum
    from fhirflat_ray.state import segments as seg

    t = pa.table(
        {
            "k": pa.array([1, None, 3, None, 5], pa.int64()),
            "x": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    hdr, payload = seg.encode_table(t, {})
    p = tmp_path / "s.seg"
    seg.write_segment(str(p), hdr, payload)
    s, n = segment_int_sum(str(p), "k")
    assert (s, n) == (9, 5)
    s2, n2 = segment_int_sum(str(p), "x")
    assert (s2, n2) == (15, 5)


def test_segment_grouped_sum_fast_and_fallback(ray_session, tmp_path):
    """Grouped encoded SUM: dict-code fast path equals Arrow group_by, and
    the null-carrying fallback path agrees."""
    import numpy as np
    import pyarrow as pa

    from fhirflat_ray.pipelines.encoded_agg import segment_grouped_sum
    from fhirflat_ray.state import segments as seg

    rng = np.random.default_rng(4)
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, 400)]
    vals = rng.integers(-100, 100, 400)
    t = pa.table(
        {"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())}
    )
    hdr, payload = seg.encode_table(t, {})
    p = tmp_path / "g.seg"
    seg.write_segment(str(p), hdr, payload)
    got = segment_grouped_sum(str(p), "k", "v").to_pandas().set_index("k")
    for k in "abc":
        m = keys == k
        assert got.loc[k, "s"] == vals[m].sum()
        assert got.loc[k, "n"] == m.sum()

    # fallback: value column with nulls (validity bitmap present)
    t2 = pa.table(
        {
            "k": pa.array(keys, pa.string()),
            "v": pa.array(
                [None if i % 7 == 0 else int(x) for i, x in enumerate(vals)],
                pa.int64(),
            ),
        }
    )
    hdr2, payload2 = seg.encode_table(t2, {})
    p2 = tmp_path / "g2.seg"
    seg.write_segment(str(p2), hdr2, payload2)
    got2 = segment_grouped_sum(str(p2), "k", "v").to_pandas().set_index("k")
    vv = np.array([0 if i % 7 == 0 else int(x) for i, x in enumerate(vals)])
    for k in "abc":
        m = keys == k
        assert got2.loc[k, "s"] == vv[m].sum()


def test_pair_counts_fast_path_and_fallback(seg_dir):
    out, df = seg_dir
    # role is shared-dict, tool local-dict: fused-code fast path on both
    got = (
        ea.encoded_pair_counts(out, "role", "tool")
        .to_pandas()
        .sort_values(["role", "tool"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["role", "tool"]).size().reset_index(name="n")
        .sort_values(["role", "tool"]).reset_index(drop=True)
    )
    assert got["role"].tolist() == exp["role"].tolist()
    assert got["tool"].tolist() == exp["tool"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    # text is FSST/plain-coded -> generic two-column decode path, same shape
    got2 = ea.encoded_pair_counts(out, "role", "text").to_pandas()
    exp2 = df.groupby(["role", "text"]).size().reset_index(name="n")
    assert int(got2["n"].sum()) == len(df) and len(got2) == len(exp2)


def test_pair_counts_null_fallback(ray_session):
    work = os.path.join(WORK, "pair_nulls")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    os.makedirs(src)
    a = ["x", "x", None, "y"] * 50
    b = ["p", None, "q", "q"] * 50
    pq.write_table(
        pa.table({"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())}),
        os.path.join(src, "t.parquet"),
    )
    from fhirflat_ray.pipelines import encode as enc

    out = os.path.join(work, "enc")
    enc.encode_files(src, out, sort_keys=None, target_rows=64)
    got = ea.encoded_pair_counts(out, "a", "b").to_pandas()
    by = {
        (None if pd.isna(x) else x, None if pd.isna(y) else y): int(n)
        for x, y, n in zip(got["a"], got["b"], got["n"])
    }
    assert by == {("x", "p"): 50, ("x", None): 50, (None, "q"): 50, ("y", "q"): 50}


def test_int_stream_sumsq_matches_decode_all_codecs():
    """Encoded-domain SUM-of-squares equals decode-then-square-then-sum for
    every int codec under int64 wraparound semantics."""
    import numpy as np

    from fhirflat_ray.codecs.ints import decode_ints, encode_ints
    from fhirflat_ray.pipelines.encoded_agg import _int_stream_sumsq

    rng = np.random.default_rng(4)
    cases = [
        np.repeat(rng.integers(-5, 5, 50), rng.integers(1, 40, 50)),  # rle
        rng.integers(1000, 1100, 5000),  # for
        np.cumsum(rng.integers(0, 3, 5000)) + 10**6,  # delta
        rng.integers(-(2**40), 2**40, 300),  # wide range, wraparound in sq
        np.array([], dtype=np.int64),
        rng.integers(0, 50, 4000) * 3600 + 7,  # gcd-factored for
        np.array([7], dtype=np.int64),
    ]
    for v in cases:
        v = v.astype(np.int64)
        hdr, blob = encode_ints(v)
        got = _int_stream_sumsq(hdr, blob, len(v))
        with np.errstate(over="ignore"):
            dec = decode_ints(hdr, blob, len(v)) if len(v) else np.array([], np.int64)
            want = int(np.dot(dec, dec)) if len(v) else 0
        assert got == want, (hdr["c"], got, want)
