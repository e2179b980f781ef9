"""Codec unit tests: encode→decode identity per Arrow array, incl. nulls,
empty arrays, unicode, and degenerate distributions — mirroring the
reference's per-operator unit tests
(/root/reference/tests/test_fhir2flat_units.py) translated to codec land."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fhirflat_ray.codecs import decode_column, encode_column
from fhirflat_ray.codecs.bitpack import pack_bits, unpack_bits
from fhirflat_ray.codecs.ints import decode_ints, encode_ints
from fhirflat_ray.codecs.strings import (
    decode_fsst,
    decode_worddict,
    encode_fsst,
    encode_worddict,
)
from fhirflat_ray.fixtures import make_edgecase_transcripts, make_transcripts


def roundtrip(arr: pa.Array) -> pa.Array:
    hdr, blob = encode_column(arr)
    return decode_column(hdr, blob)


def arrays_equal(a: pa.Array, b: pa.Array) -> bool:
    """Structural equality that treats NaN bitwise (Arrow equals() uses
    value semantics, so any NaN makes an array unequal to its own copy)."""
    if a.type != b.type or len(a) != len(b):
        return False
    if pa.types.is_floating(a.type):
        import pyarrow.compute as pc

        if not pc.is_valid(a).equals(pc.is_valid(b)):
            return False
        width = np.float32 if pa.types.is_float32(a.type) else np.float64
        av = np.nan_to_num(a.to_numpy(zero_copy_only=False).astype(width), nan=np.inf)
        bv = np.nan_to_num(b.to_numpy(zero_copy_only=False).astype(width), nan=np.inf)
        valid = pc.is_valid(a).to_numpy(zero_copy_only=False)
        return bool(
            np.array_equal(av[valid], bv[valid])
            and np.array_equal(np.signbit(av[valid]), np.signbit(bv[valid]))
        )
    return a.equals(b)


# ------------------------------------------------------------------ bitpack


@pytest.mark.parametrize("width", [1, 2, 3, 7, 8, 9, 13, 16, 23, 31, 33, 48, 63])
def test_bitpack_roundtrip(width):
    rng = np.random.default_rng(width)
    vals = rng.integers(0, 2 ** min(width, 62), size=1000).astype(np.int64)
    vals[0] = 2**width - 1 if width < 63 else 2**62
    blob = pack_bits(vals, width)
    back = unpack_bits(blob, width, len(vals))
    assert (back == vals).all()


def test_bitpack_zero_width_and_empty():
    assert pack_bits(np.array([], dtype=np.int64), 5) == b""
    assert unpack_bits(b"", 0, 3).tolist() == [0, 0, 0]


# ------------------------------------------------------------------ ints


@pytest.mark.parametrize(
    "vals",
    [
        [0, 1, 2, 3, 4, 5],
        [7, 7, 7, 7],
        [-5, -4, 100, 2**62, -(2**62)],
        [2**63 - 1, -(2**63), 0],  # full int64 range → plain fallback
        [1_700_000_000_000_000 + i * 1000 for i in range(100)],
        [1],
        [],
        [0] * 50 + [1] * 50 + [0] * 50,  # RLE shape
    ],
)
def test_int_codec_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    hdr, blob = encode_ints(v)
    back = decode_ints(hdr, blob, len(v))
    assert back.tolist() == v.tolist()


def test_int_codec_picks_delta_for_monotone():
    v = np.cumsum(np.random.default_rng(0).integers(1, 1000, 10_000)).astype(np.int64)
    hdr, blob = encode_ints(v)
    assert hdr["c"] == "delta"
    assert len(blob) < 10_000 * 8 // 4


def test_int_codec_picks_rle_for_runs():
    v = np.repeat(np.arange(50, dtype=np.int64), 200)
    hdr, blob = encode_ints(v)
    assert hdr["c"] == "rle"
    assert len(blob) < 1000


# ------------------------------------------------------------------ strings


@pytest.mark.parametrize(
    "vals",
    [
        ["a", "b", "a", "a", "b"],
        ["", "", ""],
        ["héllo 👋", "世界", "á", "x|y\nz\t"],
        ["  padded  ", "", " ", "a  b"],
        ["solo"],
        [],
        ["same"] * 100,
        [f"uniq-{i}" for i in range(100)],
    ],
)
def test_string_column_roundtrip(vals):
    arr = pa.array(vals, pa.string())
    assert roundtrip(arr).equals(arr)


def test_worddict_lossless_arbitrary_spacing():
    vals = ["", " ", "  ", "a b", "a  b", " a", "a ", "x " * 500]
    arr = pa.array(vals, pa.string())
    hdr, blob = encode_worddict(arr)
    assert decode_worddict(hdr, blob, len(arr)).equals(arr)


def test_fsst_roundtrip():
    vals = [f"the quick brown fox {i} jumps over the lazy dog" for i in range(500)]
    arr = pa.array(vals, pa.string())
    enc = encode_fsst(arr)
    assert enc is not None
    hdr, blob = enc
    assert decode_fsst(hdr, blob, len(arr)).equals(arr)
    raw = sum(len(v) for v in vals)
    assert len(blob) < raw  # actually compresses repetitive text


def test_fsst_unicode_and_binaryish():
    vals = ["héllo 👋 世界"] * 50 + ["abc\x01\x02"] * 50
    arr = pa.array(vals, pa.string())
    enc = encode_fsst(arr)
    if enc is not None:
        hdr, blob = enc
        assert decode_fsst(hdr, blob, len(arr)).equals(arr)


# ------------------------------------------------------------------ columns


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([1, 2, None, 4], pa.int32()),
        pa.array([None, None], pa.int64()),
        pa.array(["a", None, "", "b"], pa.string()),
        pa.array([True, False, None], pa.bool_()),
        pa.array([1.5, float("nan"), None, -0.0], pa.float64()),
        pa.array([1.5, 2.5], pa.float32()),
        pa.array([b"\x00\xff", None, b""], pa.binary()),
        pa.array([1, None, 3], pa.timestamp("us")),
        pa.array([[1, 2], None, [3]], pa.list_(pa.int64())),  # ipc passthrough
        pa.array([{"a": 1}, {"a": None}], pa.struct([("a", pa.int64())])),
    ],
)
def test_column_roundtrip_with_nulls(arr):
    back = roundtrip(arr)
    assert arrays_equal(back, arr), f"{arr.type}: {back.to_pylist()} != {arr.to_pylist()}"


def test_null_vs_empty_string_distinct():
    arr = pa.array([None, "", "x"], pa.string())
    back = roundtrip(arr)
    assert back.to_pylist() == [None, "", "x"]
    assert back.null_count == 1


def test_transcript_columns_roundtrip_and_compress():
    t = make_transcripts(5_000, seed=7)
    total = 0
    for name in t.column_names:
        arr = t.column(name)
        hdr, blob = encode_column(arr)
        total += len(blob)
        assert decode_column(hdr, blob).equals(arr.combine_chunks()), name
    assert total < t.nbytes / 3  # beats raw by a wide margin


def test_edgecase_table_roundtrip():
    t = make_edgecase_transcripts()
    for name in t.column_names:
        arr = t.column(name)
        hdr, blob = encode_column(arr)
        assert decode_column(hdr, blob).equals(arr.combine_chunks()), name


def test_timestamp_with_tz_roundtrip():
    arr = pa.array([1, 2, 3], pa.timestamp("us", tz="UTC"))
    assert roundtrip(arr).equals(arr)


# ------------------------------------------------------------ numeric lists


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([[1.0, 2.5], [3.25], []], pa.list_(pa.float32())),
        pa.array([[1, 2, 3], [4], [5, 6]], pa.list_(pa.int64())),
        pa.array([[0.25, 1.5], [2.75, -0.5]], pa.list_(pa.float64())),
        pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32(), 2)),  # fixed size
        pa.array([[True, False], [True]], pa.list_(pa.bool_())),
    ],
)
def test_numeric_list_roundtrip(arr):
    hdr, blob = encode_column(arr)
    assert hdr["c"] == "numlist"
    assert decode_column(hdr, blob).equals(arr)


def test_numeric_list_with_inner_nulls_falls_back_to_ipc():
    arr = pa.array([[1, None], [3]], pa.list_(pa.int64()))
    hdr, blob = encode_column(arr)
    assert hdr["c"] == "ipc"
    assert decode_column(hdr, blob).equals(arr)


def test_numeric_list_preserves_value_field_name():
    t = pa.list_(pa.field("element", pa.float32()))
    arr = pa.array([[1.0], [2.0]], t)
    hdr, blob = encode_column(arr)
    back = decode_column(hdr, blob)
    assert str(back.type) == str(t)
    assert back.equals(arr)


# ------------------------------------------------------------ decfloat/gcd


def test_decimal_float_codec_for_money():
    vals = [round(x * 0.01, 2) for x in range(0, 5000, 7)]
    arr = pa.array(vals, pa.float64())
    hdr, blob = encode_column(arr)
    assert hdr["c"] == "decfloat" and hdr["k"] == 2
    assert len(blob) < len(vals) * 8 / 3
    assert arrays_equal(roundtrip(arr), arr)


def test_decimal_float_rejects_non_decimals():
    for vals in ([1 / 3, 2 / 3], [float("nan"), 1.0], [1e308, -1e308], [-0.0, 1.5]):
        arr = pa.array(vals, pa.float64())
        hdr, blob = encode_column(arr)
        assert hdr["c"] == "plain_float", vals
        assert arrays_equal(decode_column(hdr, blob), arr)


def test_gcd_factoring_for_strided_ints():
    import numpy as np

    day = 86_400_000_000
    arr = pa.array(
        (np.arange(200) * day + 1_700_000_000_000_000), pa.timestamp("us")
    )
    hdr, blob = encode_column(arr)
    inner = hdr["h"]
    assert inner.get("g", 1) == day or inner["c"] == "delta" and inner.get("g", inner["ref"]) >= day
    assert len(blob) <= 8  # constant stride → (near-)zero payload
    assert roundtrip(arr).equals(arr)


def test_gcd_factoring_random_multiples():
    import numpy as np

    rng = np.random.default_rng(3)
    arr = pa.array(rng.integers(0, 1000, 500) * 2500, pa.int64())
    hdr, blob = encode_column(arr)
    assert roundtrip(arr).equals(arr)
    assert len(blob) < 500 * 3  # ~10 bits/value after factoring 2500 out


def test_sliced_fixed_size_list_roundtrip():
    """A sliced FixedSizeListArray must encode only its window, not the full
    backing buffer (ADVICE round 1: .values ignores slice offset/length)."""
    full = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], pa.list_(pa.float32(), 2))
    sl = full.slice(1, 2)
    hdr, blob = encode_column(sl)
    back = decode_column(hdr, blob)
    assert len(back) == 2
    assert back.equals(pa.array([[3.0, 4.0], [5.0, 6.0]], sl.type))


def test_sliced_variable_list_roundtrip():
    full = pa.array([[1.0], [2.0, 3.0], [4.0], [5.0, 6.0, 7.0]], pa.list_(pa.float64()))
    sl = full.slice(1, 2)
    hdr, blob = encode_column(sl)
    back = decode_column(hdr, blob)
    assert back.equals(pa.array([[2.0, 3.0], [4.0]], sl.type))


def test_byteplane_float_roundtrip_bit_exact():
    """Embedding-style floats take the byte-plane path and round-trip
    bit-exactly, including NaN and -0.0 payloads."""
    rng = np.random.default_rng(3)
    v = (rng.standard_normal(10_000) / 8).astype(np.float32)
    v[17] = np.nan
    v[99] = -0.0
    arr = pa.array(v, pa.float32())
    hdr, blob = encode_column(arr)
    assert hdr["c"] == "bpfloat"
    assert len(blob) < v.nbytes  # must actually win
    back = decode_column(hdr, blob)
    assert back.to_numpy(zero_copy_only=False).view(np.int32).tolist() == v.view(np.int32).tolist()


def test_byteplane_rejected_when_no_win():
    # full-entropy bytes in every plane: stays plain
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 2**31, 5_000, dtype=np.int64)
    v = raw.view(np.float64)[: 2_000]
    v = v[np.isfinite(v)]
    if len(v) >= 64:
        hdr, _ = encode_column(pa.array(v, pa.float64()))
        assert hdr["c"] in {"plain_float", "bpfloat", "decfloat"}  # never corrupt


# ------------------------------------------------ int codec properties


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def int_arrays(draw):
    """Arrays engineered to hit every codec branch: constant runs, affine
    sequences (delta+gcd), random within a width, extreme int64 values."""
    kind = draw(st.sampled_from(["runs", "affine", "random", "extreme", "int32"]))
    n = draw(st.integers(0, 5000))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "runs":
        k = max(1, n // draw(st.integers(1, 50)))
        vals = rng.integers(-5, 5, k)
        reps = rng.multinomial(n, np.ones(k) / k) if k else []
        return np.repeat(vals, reps).astype(np.int64)
    if kind == "affine":
        start = draw(st.integers(-(2**40), 2**40))
        step = draw(st.integers(-(2**20), 2**20))
        g = draw(st.sampled_from([1, 1, 7, 86400]))
        return (start + step * np.arange(n, dtype=np.int64)) * g
    if kind == "random":
        w = draw(st.integers(1, 63))
        return rng.integers(0, min(2**w, 2**62), n).astype(np.int64)
    if kind == "int32":
        return rng.integers(-(2**31), 2**31, n).astype(np.int32)
    lo, hi = -(2**63), 2**63 - 1
    return rng.integers(lo, hi, n, dtype=np.int64)


@settings(max_examples=200, deadline=None)
@given(int_arrays())
def test_int_codec_roundtrip_property(v):
    from fhirflat_ray.codecs.ints import decode_ints, encode_ints

    h, b = encode_ints(v)
    out = decode_ints(h, b, len(v))
    assert out.dtype == np.int64
    assert np.array_equal(out, v.astype(np.int64))
    # encoded size never exceeds plain + bounded header overhead
    assert len(b) <= 8 * len(v) + 16


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 63), st.integers(0, 3))
def test_pack_bits_fused_transforms_match_plain(w, mode):
    """pack_bits(v, w, ref, g) == pack_bits of the materialized residual;
    diff=True == pack_bits of the materialized difference stream."""
    from fhirflat_ray.codecs.bitpack import pack_bits

    rng = np.random.default_rng(w * 7 + mode)
    n = (1 << 20) + 13 if mode == 3 else 4097  # mode 3 crosses the chunk edge
    r = rng.integers(0, min(2**w, 2**62), n).astype(np.int64)
    if mode == 0:
        ref, g = -17, 1
        v = r + ref
        assert pack_bits(v, w, ref=ref, g=g) == pack_bits(r, w)
    elif mode == 1:
        ref, g = 3, 5
        r = rng.integers(0, min(2**w, 2**60 // g), n).astype(np.int64)  # v fits int64
        v = r * g + ref
        assert pack_bits(v, w, ref=ref, g=g) == pack_bits(r, w)
    else:
        ref = int(r.min()) if len(r) else 0
        base = np.concatenate([[0], np.cumsum(r)])  # diffs == r
        assert pack_bits(base, w, ref=0, diff=True) == pack_bits(r, w)


def test_gcd_found_despite_allzero_sample_prefix():
    """Sorted columns often start with thousands of ties at the min; a
    zero sample-gcd proves nothing and must fall through to the full
    scan (regression: g==0 was treated as 'gcd is 1')."""
    from fhirflat_ray.codecs.ints import decode_ints, encode_ints

    v = np.concatenate(
        [np.zeros(5000, np.int64), np.arange(1, 20000, dtype=np.int64) * 86400]
    )
    h, b = encode_ints(v)
    flat = [h] + [h.get(k, {}).get("h") for k in ("vals", "lens") if k in h]
    assert any(isinstance(x, dict) and x.get("g") == 86400 for x in flat), h
    assert np.array_equal(decode_ints(h, b, len(v)), v)


def test_dict_gate_survives_run_structured_columns():
    """A sorted id column (runs of 8, 25k distinct of 200k) must still
    attempt the dict codec — a strided cardinality sample steps over runs
    and misreads such columns as high-cardinality (regression)."""
    from fhirflat_ray.codecs import strings as st

    ids = np.repeat(np.arange(25_000), 8)
    arr = pa.array([f"conv-{i:08d}" for i in ids], pa.string())
    h, b = st.encode_strings(arr, try_fsst=False)
    assert h["c"] == "dict"
    assert st.decode_strings(h, b, len(arr)).equals(arr)


# --------------------------------------------------- plug-in codec registry


def _xordelta_fns():
    """Toy xor-delta codec for non-null int64 columns (closure-defined so
    cloudpickle ships them BY VALUE to Ray workers in the pipeline test)."""

    def xd_estimate(arr):
        ok = pa.types.is_int64(arr.type) or pa.types.is_int32(arr.type)
        if not ok or arr.null_count > 0 or len(arr) == 0:
            return None
        return 8 * len(arr)

    def xd_encode(arr):
        if xd_estimate(arr) is None:
            return None
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.empty_like(v)
        d[0] = v[0]
        np.bitwise_xor(v[1:], v[:-1], out=d[1:])
        return {"k": "xd1", "t": str(arr.type)}, d.tobytes()

    def xd_decode(hdr, blob, n):
        assert hdr["k"] == "xd1"
        d = np.frombuffer(blob, np.int64, count=n)
        v = np.bitwise_xor.accumulate(d)
        if hdr["t"] == "int32":
            return pa.array(v.astype(np.int32), pa.int32())
        return pa.array(v, pa.int64())

    return xd_encode, xd_decode, xd_estimate


def test_register_codec_roundtrip_and_dispatch():
    """A registered plug-in codec wins dispatch for the columns it accepts,
    round-trips bit-identically, declines out-of-scope columns (falling
    through to built-ins), and errors actionably when missing at decode —
    all WITHOUT editing codecs/core.py (the open-registry contract,
    reference analogue: extension_validators.py:55-87)."""
    from fhirflat_ray.codecs import register_codec, unregister_codec

    enc_fn, dec_fn, est_fn = _xordelta_fns()
    register_codec("xordelta", enc_fn, dec_fn, est_fn)
    try:
        v = pa.array(np.arange(10_000, dtype=np.int64) * 7919, pa.int64())
        hdr, blob = encode_column(v)
        assert hdr["c"] == "x:xordelta"
        assert decode_column(hdr, blob).equals(v)

        # declined column (nulls) falls through to the built-in int path
        with_nulls = pa.array([1, None, 3], pa.int64())
        hdr2, blob2 = encode_column(with_nulls)
        assert hdr2["c"] == "ints"
        assert decode_column(hdr2, blob2).equals(with_nulls)

        # declined type (string) falls through too
        s = pa.array(["a", "b"], pa.string())
        hdr3, _ = encode_column(s)
        assert hdr3["c"] == "str"
    finally:
        unregister_codec("xordelta")

    # decoding a plug-in-coded blob without the registration is an
    # actionable error, not silent corruption
    with pytest.raises(ValueError, match="register_codec"):
        decode_column(hdr, blob)

    # built-ins take over again once unregistered
    hdr4, _ = encode_column(pa.array([1, 2, 3], pa.int64()))
    assert hdr4["c"] == "ints"


def test_register_codec_name_validation():
    from fhirflat_ray.codecs import register_codec

    with pytest.raises(ValueError):
        register_codec("bad:name", lambda a: None, lambda h, b, n: None)
    with pytest.raises(ValueError):
        register_codec("", lambda a: None, lambda h, b, n: None)


# ----------------------------------------- column-dispatch fuzz properties


@st.composite
def string_columns(draw):
    """Optional-text columns engineered across the selection space: tiny
    vocab (dict wins), spacey multi-token rows (worddict wins), unique
    unicode (plain wins), byte-identical repeats, embedded controls."""
    kind = draw(st.sampled_from(["vocab", "tokens", "unicode", "mixed"]))
    n = draw(st.integers(0, 400))
    if kind == "vocab":
        vocab = draw(
            st.lists(st.text(max_size=8), min_size=1, max_size=5, unique=True)
        )
        vals = draw(
            st.lists(st.one_of(st.none(), st.sampled_from(vocab)), min_size=n, max_size=n)
        )
    elif kind == "tokens":
        word = st.text(
            alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
            max_size=6,
        )
        row = st.lists(word, max_size=8).map(" ".join)
        vals = draw(st.lists(st.one_of(st.none(), row), min_size=n, max_size=n))
    elif kind == "unicode":
        txt = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=64
        )
        vals = draw(st.lists(st.one_of(st.none(), txt), min_size=n, max_size=n))
    else:
        piece = st.one_of(
            st.none(),
            st.just(""),
            st.just(" "),
            st.just("  a  b  "),
            st.just("\n\t\r"),
            st.text(max_size=32),
        )
        vals = draw(st.lists(piece, min_size=n, max_size=n))
    return pa.array(vals, pa.string())


@settings(max_examples=150, deadline=None)
@given(string_columns())
def test_string_column_roundtrip_property(arr):
    """encode_column→decode_column is the identity for ANY optional-text
    column — nulls stay nulls, empty stays empty, every byte survives —
    regardless of which codec the statistics select."""
    back = roundtrip(arr)
    assert back.to_pylist() == arr.to_pylist()
    assert back.null_count == arr.null_count


@st.composite
def float_columns(draw):
    n = draw(st.integers(0, 300))
    special = st.sampled_from([0.0, -0.0, float("inf"), float("-inf"), float("nan")])
    val = st.one_of(
        st.none(),
        special,
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        # decimal-like values exercise the scaled-decimal codec path
        st.integers(-10**6, 10**6).map(lambda c: c / 100.0),
    )
    return pa.array(draw(st.lists(val, min_size=n, max_size=n)), pa.float64())


@settings(max_examples=100, deadline=None)
@given(float_columns())
def test_float_column_roundtrip_property(arr):
    """Bit-exact float round-trip under the dispatch: NaN payloads, signed
    zeros, infinities and null positions all survive every float codec.
    Compared as raw int64 bit patterns (arrays_equal's NaN normalization
    would conflate NaN with inf), masking nulls to zero on both sides."""
    import pyarrow.compute as pc

    back = roundtrip(arr)
    assert back.type == arr.type and len(back) == len(arr)
    assert pc.is_valid(back).equals(pc.is_valid(arr))
    a = pc.fill_null(arr, 0.0).to_numpy(zero_copy_only=False).view(np.int64)
    b = pc.fill_null(back, 0.0).to_numpy(zero_copy_only=False).view(np.int64)
    assert np.array_equal(a, b)


@st.composite
def small_tables(draw):
    """1-4 column tables across the segment format's type surface."""
    n = draw(st.integers(0, 120))
    cols: dict[str, pa.Array] = {}
    picks = draw(
        st.lists(
            st.sampled_from(["ints", "floats", "text", "ts"]),
            min_size=1,
            max_size=4,
            unique=True,
        )
    )
    if "ints" in picks:
        iv = st.one_of(st.none(), st.integers(-(2**62), 2**62))
        cols["iv"] = pa.array(draw(st.lists(iv, min_size=n, max_size=n)), pa.int64())
    if "floats" in picks:
        fv = st.one_of(
            st.none(),
            st.sampled_from([0.0, -0.0, float("inf"), float("-inf"), float("nan")]),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        )
        cols["fv"] = pa.array(draw(st.lists(fv, min_size=n, max_size=n)), pa.float64())
    if "text" in picks:
        tv = st.one_of(
            st.none(),
            st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24),
        )
        cols["tv"] = pa.array(draw(st.lists(tv, min_size=n, max_size=n)), pa.string())
    if "ts" in picks:
        sv = st.one_of(st.none(), st.integers(0, 2**44))
        cols["sv"] = pa.array(
            draw(st.lists(sv, min_size=n, max_size=n)), pa.timestamp("us")
        )
    return pa.table(cols)


@settings(max_examples=60, deadline=None)
@given(small_tables())
def test_segment_format_roundtrip_property(table):
    """encode_table → write_segment → read_segment (checksums verified) is
    the identity for any mixed-type table — the header survives its JSON
    trip (unicode zone-free strings, +/-Infinity float zones, null-only
    columns) and column pruning returns exactly the asked-for columns."""
    import tempfile

    from fhirflat_ray.state import segments as seg

    hdr, payload = seg.encode_table(table)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/part-x.seg"
        seg.write_segment(path, hdr, payload)
        back = seg.read_segment(path, verify_checksums=True)
        assert back.column_names == table.column_names
        for name in table.column_names:
            assert arrays_equal(
                back.column(name).combine_chunks(),
                table.column(name).combine_chunks(),
            ), name
        if table.num_columns > 1:
            first = table.column_names[0]
            pruned = seg.read_segment(path, columns=[first])
            assert pruned.column_names == [first]
            assert arrays_equal(
                pruned.column(first).combine_chunks(),
                table.column(first).combine_chunks(),
            )


def test_registry_subscriber_clears_on_contextless_task():
    """A reused worker (a SUBSCRIBER — codecs installed only via context
    sync) must drop its plug-ins when it runs a task whose DataContext
    carries no registry entry, or its blocks would mix plug-in-coded
    columns other workers can't produce. An OWNER process (one that called
    register_codec itself) keeps its local registrations."""
    from ray import cloudpickle
    from ray.data import DataContext

    from fhirflat_ray.codecs import registry as reg

    ident = lambda h, b, n: None  # noqa: E731
    saved = (dict(reg._CODECS), reg._installed_blob, reg._owns_registry)
    try:
        # simulate a fresh worker: subscriber state, codec arrives via blob
        reg._CODECS.clear()
        reg._installed_blob = None
        reg._owns_registry = False
        blob = cloudpickle.dumps({"toy": reg.CodecSpec(ident, ident, None)})
        DataContext.get_current().set_config(reg._CONFIG_KEY, blob)
        reg._sync_from_context()
        assert "toy" in reg._CODECS

        # a task of a dataset created before ANY registration: no entry
        DataContext.get_current().set_config(reg._CONFIG_KEY, None)
        reg._sync_from_context()
        assert "toy" not in reg._CODECS  # subscriber cleared

        # owner path: local registration survives a missing context entry
        reg.register_codec("mine", ident, ident)
        DataContext.get_current().set_config(reg._CONFIG_KEY, None)
        reg._sync_from_context()
        assert "mine" in reg._CODECS
        reg.unregister_codec("mine")
    finally:
        DataContext.get_current().set_config(reg._CONFIG_KEY, None)
        reg._CODECS.clear()
        reg._CODECS.update(saved[0])
        reg._installed_blob = saved[1]
        reg._owns_registry = saved[2]
