"""Unit tests for windowed aggregates and broadcast joins."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from fhirflat_ray.functions.joins import broadcast_asof_join, broadcast_semi_join
from fhirflat_ray.functions.windows import sessionize, tumbling_aggregate

US = 1_000_000


def events_table() -> pa.Table:
    # user 1: 3 events, gap between #2 and #3 > 10s → two sessions
    rows = [
        (1, 1, 0 * US),
        (2, 1, 5 * US),
        (3, 1, 100 * US),
        (4, 2, 50 * US),
    ]
    eid, uid, ts = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def test_tumbling_aggregate(ray_session):
    import ray.data as rd

    out = tumbling_aggregate(rd.from_arrow(events_table()), "ts", width_us=60 * US)
    got = {int(r["window"]): int(r["n"]) for r in out.take_all()}
    assert got == {0: 3, 1: 1}


def test_sessionize(ray_session):
    import ray.data as rd

    out = sessionize(rd.from_arrow(events_table()), "user_id", "ts", gap_us=10 * US)
    got = {r["user_id"]: (r["n_sessions"], r["max_session_len"]) for r in out.take_all()}
    assert got == {1: (2, 2), 2: (1, 1)}


def test_broadcast_asof_join(ray_session):
    import ray.data as rd

    right = pd.DataFrame(
        {
            "key": [1, 1, 2],
            "rts": pd.to_datetime([2 * US * 1000, 90 * US * 1000, 500 * US * 1000], unit="ns"),
            "val": ["a", "b", "c"],
        }
    )
    out = broadcast_asof_join(
        rd.from_arrow(events_table()),
        right,
        left_on="ts",
        right_on="rts",
        by_left="user_id",
        by_right="key",
        right_value_cols=["val"],
    ).take_all()
    by_eid = {r["event_id"]: r["val"] for r in out}
    assert by_eid[1] is None  # before any right row
    assert by_eid[2] == "a"
    assert by_eid[3] == "b"
    assert by_eid[4] is None  # user 2's right row is later


def test_broadcast_semi_and_anti(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(events_table())
    semi = broadcast_semi_join(ds, {1}, "user_id").take_all()
    assert sorted(r["event_id"] for r in semi) == [1, 2, 3]
    anti = broadcast_semi_join(ds, {1}, "user_id", anti=True).take_all()
    assert [r["event_id"] for r in anti] == [4]


def test_bucketed_asof_join_matches_broadcast(ray_session):
    """The two-large-sides bucketed path must be indistinguishable from the
    broadcast path on the same input."""
    import numpy as np
    import ray.data as rd

    from fhirflat_ray.functions.joins import bucketed_asof_join

    rng = np.random.default_rng(7)
    n_l, n_r = 2_000, 500
    left = pa.table(
        {
            "event_id": pa.array(range(n_l), pa.int64()),
            "user_id": pa.array(rng.integers(0, 50, n_l), pa.int64()),
            "ts": pa.array(rng.integers(0, 10_000, n_l), pa.int64()),
        }
    )
    right = pa.table(
        {
            "key": pa.array(rng.integers(0, 60, n_r), pa.int64()),
            "rts": pa.array(rng.integers(0, 10_000, n_r), pa.int64()),
            "val": pa.array(rng.standard_normal(n_r)),
        }
    )
    # dedupe (key, rts) so the matched val is deterministic on both paths
    rdf = (
        right.to_pandas()
        .groupby(["key", "rts"], as_index=False)
        .first()
    )
    bcast = broadcast_asof_join(
        rd.from_arrow(left), rdf, left_on="ts", right_on="rts",
        by_left="user_id", by_right="key", right_value_cols=["val"],
    ).select_columns(["event_id", "rts", "val"]).take_all()
    buck = bucketed_asof_join(
        rd.from_arrow(left).repartition(4),
        rd.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False)).repartition(3),
        left_on="ts", right_on="rts",
        by_left="user_id", by_right="key", right_value_cols=["val"],
        n_buckets=8,
    ).select_columns(["event_id", "rts", "val"]).take_all()
    key = lambda r: r["event_id"]
    a = sorted(bcast, key=key)
    b = sorted(buck, key=key)
    assert len(a) == len(b) == n_l
    for x, y in zip(a, b):
        assert x == y, (x, y)


def test_keyed_window_ops(ray_session):
    import numpy as np
    import ray.data as rd

    from fhirflat_ray.functions.windows import keyed_window

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "o": [3, 1, 2, 10, 11],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = (
        keyed_window(
            rd.from_pandas(df).repartition(3),
            "k",
            ["o"],
            [
                ("lead", "v", 1, "nxt"),
                ("lag", "v", 1, "prev"),
                ("cumsum", "v", None, "cs"),
                ("row_number", None, None, "rn"),
                ("rolling_mean", "v", 2, "rm"),
            ],
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    # k=1 under o-order has v = 2, 3, 1; k=2 has v = 4, 5
    assert out["nxt"].tolist()[:3] == [3.0, 1.0] + [None] or np.isnan(out["nxt"][2])
    assert out["nxt"].tolist()[:2] == [3.0, 1.0]
    assert np.isnan(out["prev"][0]) and out["prev"].tolist()[1:3] == [2.0, 3.0]
    assert out["cs"].tolist() == [2.0, 5.0, 6.0, 4.0, 9.0]
    assert out["rn"].tolist() == [1, 2, 3, 1, 2]
    assert out["rm"].tolist() == [2.0, 2.5, 2.0, 4.0, 4.5]


def test_hll_estimate_accuracy_and_merge_invariance():
    import numpy as np

    from fhirflat_ray.functions.sketches import (
        M,
        _estimate_from_registers,
        hll_partial,
    )

    ids = np.arange(100_000, dtype=np.int64) * 7919 + 13
    reg, mx = hll_partial(ids)
    dense = np.zeros(M, dtype=np.int64)
    dense[reg] = mx
    est = _estimate_from_registers(dense)
    assert abs(est - 100_000) / 100_000 < 0.05
    # partial merge must be invariant to how the corpus is partitioned
    dense2 = np.zeros(M, dtype=np.int64)
    for chunk in np.array_split(ids, 7):
        r, m_ = hll_partial(chunk)
        np.maximum.at(dense2, r, m_)
    assert np.array_equal(dense, dense2)


def test_rolling_time_sum_peer_rule(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from fhirflat_ray.functions.windows import rolling_time_sum

    # tied timestamps within a key: the SQL RANGE frame includes ALL peers
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "ts": [0, 100, 100, 250, 0, 90],  # int64 "microseconds"
            "v": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
        }
    )
    got = (
        rolling_time_sum(rd.from_pandas(df).repartition(3), "k", "ts", "v", 100)
        .to_pandas()
        .sort_values(["k", "ts", "v"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        """
        SELECT k, ts, v,
               sum(v) OVER (PARTITION BY k ORDER BY ts
                            RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS roll_sum
        FROM t ORDER BY k, ts, v
        """
    ).df()
    assert np.allclose(got["roll_sum"].to_numpy(), want["roll_sum"].to_numpy())
    # row at ts=100 (either peer) must include both peers + ts=0 row
    assert got.loc[(got.k == 1) & (got.ts == 100), "roll_sum"].tolist() == [7.0, 7.0]


def test_cms_estimate_accuracy_and_merge_invariance(ray_session):
    import numpy as np
    import ray.data as rd

    from fhirflat_ray.functions.sketches import (
        CMS_D,
        CMS_W,
        cms_buckets,
        cms_counters,
        cms_estimates,
    )

    # zipf-ish planted frequencies: id i appears (1000 // (i+1)) times
    ids = np.repeat(np.arange(200, dtype=np.int64), 1000 // (np.arange(200) + 1))
    true = np.bincount(ids, minlength=200)

    import pandas as pd

    ds = rd.from_pandas(pd.DataFrame({"user_id": ids})).repartition(5)
    counters = cms_counters(ds, "user_id")
    assert counters.shape == (CMS_D, CMS_W)
    # every row of the sketch holds the full stream count
    assert (counters.sum(axis=1) == len(ids)).all()

    q = np.arange(200, dtype=np.int64)
    est = cms_estimates(counters, q)
    # CMS never under-counts …
    assert (est >= true[q]).all()
    # … and with n=20k, W=2048, D=4 the heavy hitters are near-exact
    heavy = q[true[q] >= 50]
    assert (est[heavy] - true[heavy] <= 2).all()

    # merge invariance: counters from one partition == from five
    counters1 = cms_counters(rd.from_pandas(pd.DataFrame({"user_id": ids})), "user_id")
    assert np.array_equal(counters, counters1)

    # buckets stay in range for the whole int64-positive domain
    big = np.array([0, 1, 2**31 - 1, 2**40, 2**62], dtype=np.int64)
    for d in range(CMS_D):
        b = cms_buckets(big, d)
        assert ((b >= 0) & (b < CMS_W)).all()


def test_bloom_semi_join_exact_vs_reference(ray_session):
    """Bloom semi join must equal the exact set-membership filter even
    with a tiny bitmap that guarantees false positives reach the
    verification join."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.joins import bloom_semi_join

    rng = np.random.default_rng(11)
    corpus_keys = rng.integers(0, 10_000, 5_000)
    member = rng.choice(np.unique(corpus_keys), 300, replace=False)
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(corpus_keys, pa.int64()),
                "payload": pa.array(np.arange(5_000), pa.int64()),
            }
        )
    ).repartition(4)
    keys = rd.from_arrow(pa.table({"kk": pa.array(member, pa.int64())})).repartition(3)

    # 256-bit bloom: heavy false-positive rate, so correctness must come
    # from the exact verification join
    out = bloom_semi_join(ds, keys, on="k", right_on="kk", n_bits=256, k_hashes=2)
    got = out.to_pandas().sort_values("payload").reset_index(drop=True)
    want_mask = np.isin(corpus_keys, member)
    assert got["payload"].tolist() == np.arange(5_000)[want_mask].tolist()
    assert set(got.columns) == {"k", "payload"}


def test_bucketed_range_join_matches_broadcast(ray_session):
    """Two-large-sides range join emits exactly the broadcast path's pairs
    on overlapping intervals that straddle bucket boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.joins import (
        broadcast_range_join,
        bucketed_range_join,
    )

    rng = np.random.default_rng(5)
    ts = np.sort(rng.integers(0, 100_000, 2_000)).astype(np.int64)
    ev = pa.table(
        {"ts": pa.array(ts, pa.int64()), "eid": pa.array(np.arange(2_000), pa.int64())}
    )
    starts = np.arange(0, 100_000, 4_000, dtype=np.int64)
    iv = pa.table(
        {
            "interval_id": pa.array(np.arange(len(starts)), pa.int64()),
            "start_us": pa.array(starts),
            "end_us": pa.array(starts + 6_000),  # overlaps its successor
        }
    )
    ev_ds = rd.from_arrow(ev).repartition(4)

    want = (
        broadcast_range_join(ev_ds, iv, "ts")
        .to_pandas()
        .sort_values(["eid", "interval_id"])
        .reset_index(drop=True)
    )
    got = (
        bucketed_range_join(
            ev_ds, rd.from_arrow(iv).repartition(2), "ts", bucket_width_us=3_000
        )
        .to_pandas()
        .sort_values(["eid", "interval_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 2_000  # overlaps fan out
    assert (got[["eid", "interval_id"]].to_numpy() == want[["eid", "interval_id"]].to_numpy()).all()


def test_bucketed_range_join_replication_guard():
    """An interval spanning vastly more buckets than the cap raises
    instead of silently exploding the tagged side."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhirflat_ray.functions.joins import bucketed_range_join

    ev = rd.from_arrow(pa.table({"ts": pa.array([5], pa.int64())}))
    iv = rd.from_arrow(
        pa.table(
            {
                "interval_id": pa.array([0], pa.int64()),
                "start_us": pa.array([0], pa.int64()),
                "end_us": pa.array([10**15], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="replication blow-up"):
        bucketed_range_join(ev, iv, "ts", bucket_width_us=1, n_buckets_cap=4).take_all()


def test_range_partition_sort_exact_ranks_under_skew():
    """Zipf-skewed keys: global ranks must equal the reference argsort, and
    the sampled splits must keep ranges balanced (no range swallows the
    corpus the way fixed-width buckets would under this skew)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.sort import range_partition_sort

    rng = np.random.default_rng(7)
    n = 50_000
    vals = rng.zipf(1.3, size=n).astype(np.float64) + rng.random(n)  # heavy tail
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"id": ids, "v": vals})
    ds = rd.from_arrow(t).repartition(8)

    out = (
        range_partition_sort(ds, key_col="v", tiebreak_cols=["id"], n_ranges=16, n_shards=4)
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    order = np.lexsort((ids, vals))
    assert (out["pos"].to_numpy() == np.arange(n)).all()
    assert (out["id"].to_numpy() == ids[order]).all()
    # contiguous balanced shards from integer math
    assert (out["shard"].to_numpy() == (np.arange(n) * 4) // n).all()
    # sorted-by-pos implies sorted by (v, id)
    v_sorted = out["v"].to_numpy()
    assert (np.diff(v_sorted) >= 0).all()


def test_range_partition_sort_duplicate_heavy_keys():
    """Massive key duplication (one value = 40% of rows): assignment by
    value keeps ties in ONE range so ranks stay exact; degenerate splits
    dedupe instead of creating empty ranges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.sort import range_partition_sort

    rng = np.random.default_rng(11)
    n = 20_000
    vals = np.where(rng.random(n) < 0.4, 5.0, rng.integers(0, 50, n).astype(np.float64))
    ids = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"id": ids, "v": vals})).repartition(6)

    out = (
        range_partition_sort(ds, key_col="v", tiebreak_cols=["id"], n_ranges=8)
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    order = np.lexsort((ids, vals))
    assert (out["id"].to_numpy() == ids[order]).all()
    assert (out["v"].to_numpy() == vals[order]).all()


def test_salted_hash_join_planted_skew(ray_session):
    """One key owns 40% of the fact side: the salted join must (a) return
    row-for-row what the unsalted join returns and (b) actually split the
    hot key's rows across multiple salts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.joins import salted_hash_join

    rng = np.random.default_rng(5)
    n = 30_000
    keys = np.where(rng.random(n) < 0.4, 7, rng.integers(0, 200, n)).astype(np.int64)
    fact = pa.table(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": keys,
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    dim = pa.table(
        {
            "dk": np.arange(200, dtype=np.int64),
            "label": pa.array([f"g{i % 7}" for i in range(200)]),
        }
    )
    fds = rd.from_arrow(fact).repartition(6)
    dds = rd.from_arrow(dim).repartition(2)

    got = (
        salted_hash_join(
            fds, dds, on="k", right_on="dk", salt_source="rid",
            num_partitions=8, n_salts=8, hot_k=4,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        fact.to_pandas()
        .merge(dim.to_pandas(), left_on="k", right_on="dk", how="inner")
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == n
    assert (got["rid"].to_numpy() == want["rid"].to_numpy()).all()
    assert (got["label"].to_numpy() == want["label"].to_numpy()).all()

    # the point of salting: the hottest hash partition (a cluster's
    # critical path) must shrink by ~n_salts for the hot key
    import pandas.util as pdu

    from fhirflat_ray.functions.sampling import hash32

    P = 16
    plain = np.bincount(
        (pdu.hash_array(keys) % np.uint64(P)).astype(np.int64), minlength=P
    )
    salt = np.where(keys == 7, hash32(fact["rid"].to_numpy()) % 16, 0)
    salted = np.bincount(
        (pdu.hash_array(keys * 32 + salt) % np.uint64(P)).astype(np.int64),
        minlength=P,
    )
    assert plain.max() > 3 * salted.max()


def test_range_partition_sort_property(ray_session):
    """Property: for arbitrary float keys (ties, negatives, skew) and any
    range count, the output ranks equal the lexsort reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.sort import range_partition_sort

    @settings(max_examples=5, deadline=None)
    @given(
        seed=st.integers(0, 2**16),
        n=st.integers(10, 3000),
        n_ranges=st.integers(2, 20),
        dup_rate=st.floats(0.0, 0.9),
    )
    def check(seed, n, n_ranges, dup_rate):
        rng = np.random.default_rng(seed)
        vals = rng.normal(0, 100, n)
        dup_mask = rng.random(n) < dup_rate
        vals[dup_mask] = np.round(vals[dup_mask] / 50) * 50  # heavy ties
        ids = rng.permutation(n).astype(np.int64)
        ds = rd.from_arrow(
            pa.table({"id": ids, "v": vals})
        ).repartition(4)
        out = (
            range_partition_sort(ds, "v", ["id"], n_ranges=n_ranges)
            .to_pandas()
            .sort_values("pos")
        )
        order = np.lexsort((ids, vals))
        assert (out["pos"].to_numpy() == np.arange(n)).all()
        assert (out["id"].to_numpy() == ids[order]).all()

    check()


def test_range_partition_sort_string_key(ray_session):
    """String keys (the engine's PRIMARY key shape — conv_id): exact global
    ranks under duplication and block skew; the vocab-level binary search
    must agree with a full pandas reference sort; null keys raise."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.sort import range_partition_sort

    rng = np.random.default_rng(3)
    n = 30_000
    convs = [f"c{int(i):07d}" for i in rng.integers(0, 2_000, n)]
    t = pa.table({"conv_id": convs, "turn_idx": np.arange(n, dtype=np.int64)})
    ds = rd.from_arrow(t).repartition(16)

    out = (
        range_partition_sort(ds, key_col="conv_id", tiebreak_cols=["turn_idx"], n_shards=4)
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert (out["pos"].to_numpy() == np.arange(n)).all()
    assert out["conv_id"].tolist() == exp["conv_id"].tolist()
    assert out["turn_idx"].tolist() == exp["turn_idx"].tolist()
    assert (out["shard"].to_numpy() == (np.arange(n) * 4) // n).all()

    t2 = pa.table({"k": ["a", None, "b"], "i": [1, 2, 3]})
    with pytest.raises(Exception, match="nulls"):
        range_partition_sort(
            rd.from_arrow(t2), key_col="k", tiebreak_cols=["i"]
        ).materialize()


def test_range_partition_sort_to_parquet_waves(ray_session, tmp_path):
    """The wave-sharded parquet sink must produce EXACTLY the one-shot
    sort's rows (pos, shard included), with lexicographic file order being
    the global key order, regardless of n_waves; resume=True skips
    already-written ranges."""
    import glob as _glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray.data as rd

    from fhirflat_ray.functions.sort import (
        range_partition_sort,
        range_partition_sort_to_parquet,
    )

    rng = np.random.default_rng(9)
    n = 20_000
    convs = [f"c{int(i):06d}" for i in rng.integers(0, 1_500, n)]
    t = pa.table({"conv_id": convs, "turn_idx": np.arange(n, dtype=np.int64)})
    ds = rd.from_arrow(t).repartition(8)

    ref = (
        range_partition_sort(ds, "conv_id", ["turn_idx"], n_shards=4, pin_input=False)
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )

    for waves in (1, 3):
        out = str(tmp_path / f"w{waves}")
        man = range_partition_sort_to_parquet(
            ds, out, "conv_id", ["turn_idx"], n_shards=4, n_waves=waves
        )
        assert man["total_rows"] == n and not man["files_skipped"]
        files = sorted(_glob.glob(out + "/part-*.parquet"))
        assert files == man["files_written"]
        got = pa.concat_tables([_pq.read_table(f) for f in files]).to_pandas()
        # file-name order IS key order: pos must already be monotone
        assert (np.diff(got["pos"].to_numpy()) == 1).all() and got["pos"].iloc[0] == 0
        for col in ("conv_id", "turn_idx", "pos", "shard"):
            assert got[col].tolist() == ref[col].tolist(), (waves, col)

    # resume: drop two files, re-run — only the missing ranges rewrite
    out = str(tmp_path / "w3")
    files = sorted(_glob.glob(out + "/part-*.parquet"))
    removed = files[1:3]
    for f in removed:
        os.remove(f)
    man2 = range_partition_sort_to_parquet(
        ds, out, "conv_id", ["turn_idx"], n_shards=4, n_waves=3, resume=True
    )
    assert sorted(man2["files_written"]) == sorted(removed)
    got = pa.concat_tables(
        [_pq.read_table(f) for f in sorted(_glob.glob(out + "/part-*.parquet"))]
    ).to_pandas()
    assert got["conv_id"].tolist() == ref["conv_id"].tolist()
    assert got["pos"].tolist() == ref["pos"].tolist()


def test_sort_sink_plan_manifest_resume(ray_session, tmp_path):
    """The sink records its plan (splits + params) in out_dir; resume must
    REUSE the recorded boundaries when n_ranges is defaulted (the default is
    CPU-count-dependent, so recomputing on a different cluster would silently
    misalign ranges) and must ERROR on a genuine parameter mismatch."""
    import glob as _glob
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq
    import pytest
    import ray.data as rd

    from fhirflat_ray.functions.sort import range_partition_sort_to_parquet

    rng = np.random.default_rng(33)
    n = 8_000
    t = pa.table(
        {
            "k": rng.integers(0, 900, n).astype(np.int64),
            "i": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_arrow(t).repartition(6)

    # first run with an n_ranges NO default would pick (default is >= 16 here)
    out = str(tmp_path / "s")
    man = range_partition_sort_to_parquet(ds, out, "k", ["i"], n_ranges=5)
    plan = json.load(open(os.path.join(out, "_sort_plan.json")))
    assert plan["n_ranges"] == 5 and plan["key_col"] == "k"
    assert os.path.exists(os.path.join(out, "_sort_splits.parquet"))

    # drop one part file; resume with n_ranges DEFAULTED → must reuse the
    # recorded 5-range plan, rewrite only the missing range, and the result
    # must equal the original byte-for-byte
    files = sorted(_glob.glob(out + "/part-*.parquet"))
    orig = pa.concat_tables([_pq.read_table(f) for f in files]).to_pandas()
    os.remove(files[1])
    man2 = range_partition_sort_to_parquet(ds, out, "k", ["i"], resume=True)
    assert man2["files_written"] == [files[1]]
    assert len(man2["files_skipped"]) == len(files) - 1
    got = pa.concat_tables(
        [_pq.read_table(f) for f in sorted(_glob.glob(out + "/part-*.parquet"))]
    ).to_pandas()
    assert got["k"].tolist() == orig["k"].tolist()
    assert got["pos"].tolist() == orig["pos"].tolist()

    # parameter mismatch on resume is an error, not a silent re-plan
    with pytest.raises(ValueError, match="different parameters"):
        range_partition_sort_to_parquet(ds, out, "k", [], resume=True)
    with pytest.raises(ValueError, match="different parameters"):
        range_partition_sort_to_parquet(ds, out, "k", ["i"], n_ranges=9, resume=True)
    with pytest.raises(ValueError, match="different parameters"):
        range_partition_sort_to_parquet(
            ds, out, "k", ["i"], sample_rate_log2=3, resume=True
        )
    assert man["total_rows"] == n


def test_range_sort_unsupported_key_type_raises(ray_session):
    """An unsupported key type (list, bool, …) must fail up front with the
    type named — not deep in _key_bits with an opaque astype error."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhirflat_ray.functions.sort import range_partition_sort

    t = pa.table({"k": [[1], [2]], "i": [1, 2]})
    with pytest.raises(ValueError, match="unsupported key type"):
        range_partition_sort(
            rd.from_arrow(t), key_col="k", tiebreak_cols=["i"]
        ).materialize()


def test_sort_split_points_are_layout_independent(ray_session):
    """The wave sink's resume contract requires split points to be a
    function of the sampled key-value SET alone: the same data under
    different block layouts (a crashed run vs a resume on a different
    cluster size) must produce identical range boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.sort import _sort_plan

    rng = np.random.default_rng(21)
    # heavy duplication ensures keys span many blocks (the case where
    # per-batch-only sample dedup used to make splits layout-dependent)
    vals = rng.integers(0, 500, 40_000).astype(np.float64)
    t = pa.table({"v": vals, "id": np.arange(40_000, dtype=np.int64)})
    plans = [
        _sort_plan(rd.from_arrow(t).repartition(parts), "v", 16, 6)
        for parts in (2, 7, 31)
    ]
    for p in plans[1:]:
        assert np.array_equal(p["splits"], plans[0]["splits"])
        assert np.array_equal(p["counts"], plans[0]["counts"])
