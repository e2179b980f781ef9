"""Tests for deterministic sampling/splitting, exact per-key top-k,
broadcast range join and distributed discrete quantiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fhirflat_ray.functions import sampling as sp


# ------------------------------------------------------------- sampling


def test_hash32_int64_safe_and_stable():
    ids = np.array([0, 1, 7, 2**31 - 1, 2**31, 2**40], dtype=np.int64)
    h = sp.hash32(ids)
    assert h.dtype == np.int64  # never uint64 (pathologically slow on some hosts)
    assert ((h >= 0) & (h < sp.MOD32)).all()
    # wraparound ids reduce mod 2^31 first, matching the SQL expression
    assert h[3] == ((2**31 - 1) * sp.KNUTH) % sp.MOD32
    assert h[4] == 0
    # stable across calls (pure function of id)
    assert (sp.hash32(ids) == h).all()


def test_split_thresholds_exact_integers():
    th = sp.split_thresholds([("train", 80), ("val", 10), ("test", 10)])
    assert th == [
        ("train", 80 * sp.MOD32 // 100),
        ("val", 90 * sp.MOD32 // 100),
        ("test", sp.MOD32),
    ]
    with pytest.raises(ValueError):
        sp.split_thresholds([("a", 50), ("b", 49)])


def test_assign_split_ratios_and_determinism():
    ids = np.arange(200_000, dtype=np.int64)
    lab = sp.assign_split(ids, [("train", 80), ("val", 10), ("test", 10)])
    frac = pd.Series(lab).value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.01
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # partition-independence: assignment of an id does not depend on the
    # batch it arrives in
    lab2 = sp.assign_split(ids[::-1], [("train", 80), ("val", 10), ("test", 10)])
    assert (lab2[::-1] == lab).all()


def test_hash_split_and_sample_datasets(ray_session):
    import ray.data as rd

    t = pa.table({"id": pa.array(np.arange(10_000, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(8)
    out = sp.hash_split(ds, "id", [("train", 80), ("val", 10), ("test", 10)])
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    want = sp.assign_split(np.arange(10_000, dtype=np.int64), [("train", 80), ("val", 10), ("test", 10)])
    assert (df["split"].to_numpy() == want).all()

    samp = sp.hash_sample(rd.from_arrow(t).repartition(8), "id", 10)
    got = set(samp.to_pandas()["id"])
    bound = 10 * sp.MOD32 // 100
    want_ids = {int(i) for i in np.arange(10_000)[sp.hash32(np.arange(10_000)) < bound]}
    assert got == want_ids


# ------------------------------------------------------------ per-key topk


def test_topk_per_key_exact(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.util import topk_per_key

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n), pa.int64()),
            "score": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = (
        topk_per_key(rd.from_arrow(t).repartition(8), ["k"], 3, ["score", "id"],
                     descending=[True, False])
        .to_pandas()
        .sort_values(["k", "score", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        t.to_pandas()
        .sort_values(["score", "id"], ascending=[False, True], kind="mergesort")
        .groupby("k", sort=False)
        .head(3)
        .sort_values(["k", "score", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "score", "id"]], want[["k", "score", "id"]])


# ------------------------------------------------------------ range join


def test_broadcast_range_join_overlaps_and_cap(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.joins import broadcast_range_join

    ts = pa.array(np.array([5, 15, 25, 35, 95], dtype=np.int64))
    t = pa.table({"ts": ts, "row": pa.array(range(5), pa.int64())})
    iv = pa.table(
        {
            "interval_id": pa.array([0, 1, 2], pa.int64()),
            "start_us": pa.array([0, 10, 20], pa.int64()),
            "end_us": pa.array([20, 30, 40], pa.int64()),  # overlapping
        }
    )
    out = (
        broadcast_range_join(rd.from_arrow(t).repartition(2), iv, "ts")
        .to_pandas()
        .sort_values(["row", "interval_id"])
        .reset_index(drop=True)
    )
    got = list(zip(out["row"], out["interval_id"]))
    # ts=15 matches [0,20) and [10,30); ts=25 matches [10,30) and [20,40);
    # ts=95 matches nothing
    assert got == [(0, 0), (1, 0), (1, 1), (2, 1), (2, 2), (3, 2)]

    with pytest.raises(ValueError, match="cap"):
        big = pa.table(
            {
                "interval_id": pa.array(np.arange(5000, dtype=np.int64)),
                "start_us": pa.array(np.zeros(5000, dtype=np.int64)),
                "end_us": pa.array(np.ones(5000, dtype=np.int64)),
            }
        )
        broadcast_range_join(rd.from_arrow(t), big, "ts")


# ------------------------------------------------------------- quantiles


def test_quantile_disc_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from fhirflat_ray.functions.quantiles import quantile_disc

    rng = np.random.default_rng(11)
    vals = rng.integers(1, 51, 4000).astype(np.float64)
    t = pa.table({"x": pa.array(vals)})
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    out = quantile_disc(rd.from_arrow(t).repartition(8), "x", qs)
    con = duckdb.connect()
    con.register("t", t)
    for q, v in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        want = con.sql(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert v == float(want), (q, v, want)


# ------------------------------------------------------------- windows/sets


def test_hopping_aggregate_exact(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.windows import hopping_aggregate

    ts = np.array([0, 5, 10, 15, 25], dtype=np.int64)  # int64-us timeline
    t = pa.table({"ts": ts, "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])})
    # windows width=20, hop=10: event at t lands in windows (t//10)*10 and -10
    out = (
        hopping_aggregate(rd.from_arrow(t).repartition(2), "ts", 20, 10, value_col="v")
        .to_pandas()
        .sort_values("ws")
        .reset_index(drop=True)
    )
    want = {}
    for tt, v in zip(ts, [1.0, 2.0, 3.0, 4.0, 5.0]):
        for ws in ((tt // 10) * 10, (tt // 10) * 10 - 10):
            n, s = want.get(ws, (0, 0.0))
            want[ws] = (n + 1, s + v)
    assert dict(zip(out["ws"], zip(out["n"], out["sum_v"]))) == want

    with pytest.raises(ValueError):
        hopping_aggregate(rd.from_arrow(t), "ts", 25, 10)


def test_intersect_keys(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.util import intersect_keys

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 4, 2], pa.int64())})).repartition(2)
    b = rd.from_arrow(pa.table({"k": pa.array([3, 4, 5, 4], pa.int64())})).repartition(2)
    got = sorted(intersect_keys(a, b, "k").to_pandas()["k"])
    assert got == [3, 4]
