"""Wave-sharded bucket exchange (functions/exchange.py): groupby / exact
dedup / hash join sinks must produce EXACTLY the one-shot operators' rows
for any n_waves, land buckets atomically, and resume by skipping durable
buckets under a verified plan manifest."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from fhirflat_ray.functions.exchange import (
    bucketed_map_groups_to_parquet,
    exact_dedup_to_parquet,
    hash_join_to_parquet,
    read_exchange_output,
)


def _read_all(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(out_dir + "/part-*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


def test_bucketed_map_groups_waves_equal_oneshot(ray_session, tmp_path):
    from fhirflat_ray.functions.util import bucketed_map_groups

    rng = np.random.default_rng(5)
    n = 30_000
    df = pd.DataFrame(
        {
            "k": [f"k{int(i):04d}" for i in rng.integers(0, 2_000, n)],
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(8)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False)["v"].sum().reset_index(name="s")

    ref = (
        bucketed_map_groups(ds, ["k"], agg)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for waves in (1, 3):
        out = str(tmp_path / f"g{waves}")
        man = bucketed_map_groups_to_parquet(ds, ["k"], agg, out, n_waves=waves)
        assert not man["files_skipped"]
        got = _read_all(out).sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        # reader helper excludes the manifest
        assert read_exchange_output(out).count() == len(ref)


def test_bucketed_map_groups_resume(ray_session, tmp_path):
    df = pd.DataFrame({"k": list(range(500)) * 4, "v": np.arange(2000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(4)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False)["v"].max().reset_index(name="m")

    out = str(tmp_path / "r")
    bucketed_map_groups_to_parquet(ds, ["k"], agg, out, num_buckets=12, n_waves=2)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    orig = _read_all(out).sort_values("k").reset_index(drop=True)
    os.remove(files[2])
    os.remove(files[-1])
    man = bucketed_map_groups_to_parquet(
        ds, ["k"], agg, out, num_buckets=12, n_waves=2, resume=True
    )
    assert sorted(man["files_written"]) == sorted([files[2], files[-1]])
    assert len(man["files_skipped"]) == len(files) - 2
    got = _read_all(out).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, orig)

    # mismatched plan (different bucket count / keys) must refuse, not re-plan
    with pytest.raises(ValueError, match="different parameters"):
        bucketed_map_groups_to_parquet(
            ds, ["k"], agg, out, num_buckets=24, resume=True
        )
    with pytest.raises(ValueError, match="different parameters"):
        bucketed_map_groups_to_parquet(
            ds, ["v"], agg, out, num_buckets=12, resume=True
        )
    plan = json.load(open(os.path.join(out, "_exchange_plan.json")))
    assert plan["kind"] == "bucketed_map_groups" and plan["num_buckets"] == 12


def test_exact_dedup_waves_equal_oneshot(ray_session, tmp_path):
    from fhirflat_ray.functions.dedup import exact_dedup

    rng = np.random.default_rng(11)
    texts = [f"document body {int(i)}" for i in rng.integers(0, 700, 5_000)]
    df = pd.DataFrame({"doc_id": np.arange(5_000, dtype=np.int64), "text": texts})
    ds = rd.from_pandas(df).repartition(6)

    ref = (
        exact_dedup(ds, column="text", id_column="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out = str(tmp_path / "d")
    man = exact_dedup_to_parquet(ds, out, n_waves=3, num_buckets=16)
    got = _read_all(out).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], ref[["doc_id", "text"]])
    assert man["num_buckets"] == 16

    # resume: remove one bucket, only it rewrites, rows identical
    files = sorted(glob.glob(out + "/part-*.parquet"))
    os.remove(files[3])
    man2 = exact_dedup_to_parquet(ds, out, n_waves=3, num_buckets=16, resume=True)
    assert man2["files_written"] == [files[3]]
    got2 = _read_all(out).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, got)


def _join_frames():
    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {
            "custkey": rng.integers(0, 400, 3_000).astype(np.int64),
            "total": rng.integers(0, 10_000, 3_000).astype(np.int64),
            "name": [f"o{i}" for i in range(3_000)],
        }
    )
    right = pd.DataFrame(
        {
            "c_custkey": np.arange(0, 350, dtype=np.int64),
            "name": [f"c{i}" for i in range(350)],  # collides with left.name
            "nation": np.arange(0, 350, dtype=np.int64) % 25,
        }
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_hash_join_waves_vs_pandas(ray_session, tmp_path, how):
    left, right = _join_frames()
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)

    out = str(tmp_path / how)
    hash_join_to_parquet(
        lds, rds, out, on="custkey", right_on="c_custkey", how=how, n_waves=2
    )
    got = (
        _read_all(out)
        .sort_values(["custkey", "name", "total"])
        .reset_index(drop=True)
    )
    ref = left.merge(
        right.rename(columns={"c_custkey": "custkey", "name": "name_r"}),
        on="custkey",
        how="inner" if how == "inner" else "left",
    ).sort_values(["custkey", "name", "total"]).reset_index(drop=True)
    assert list(got.columns) == ["custkey", "total", "name", "name_r", "nation"]
    assert len(got) == len(ref)
    for col in ("custkey", "total", "name", "name_r"):
        assert got[col].fillna("~").tolist() == ref[col].fillna("~").tolist(), col
    # nation is nullable under left_outer
    assert got["nation"].fillna(-1).tolist() == ref["nation"].fillna(-1).tolist()


def test_hash_join_same_key_name_and_resume(ray_session, tmp_path):
    left, right = _join_frames()
    right = right.rename(columns={"c_custkey": "custkey"})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)

    out = str(tmp_path / "same")
    man = hash_join_to_parquet(
        lds, rds, out, on="custkey", how="inner", n_waves=3, num_buckets=10
    )
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert files  # buckets written
    orig = _read_all(out).sort_values(["custkey", "name"]).reset_index(drop=True)
    ref = left.merge(right.rename(columns={"name": "name_r"}), on="custkey")
    assert len(orig) == len(ref)

    os.remove(files[0])
    man2 = hash_join_to_parquet(
        lds, rds, out, on="custkey", how="inner", n_waves=3, num_buckets=10,
        resume=True,
    )
    assert man2["files_written"] == [files[0]]
    got = _read_all(out).sort_values(["custkey", "name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, orig)

    with pytest.raises(ValueError, match="different parameters"):
        hash_join_to_parquet(
            lds, rds, out, on="custkey", how="left_outer", num_buckets=10, resume=True
        )
    assert man["num_buckets"] == 10


def test_hash_join_unsupported_how(ray_session, tmp_path):
    left, right = _join_frames()
    with pytest.raises(ValueError, match="unsupported how"):
        hash_join_to_parquet(
            rd.from_pandas(left), rd.from_pandas(right),
            str(tmp_path / "x"), on="custkey", right_on="c_custkey", how="full",
        )


def test_hash_join_wave_salted_hot_key(ray_session, tmp_path):
    """The docstring's skew mitigation, composed and verified: a 40%-hot
    key is salted (fact rows spread over n_salts deterministic sub-keys,
    dim rows replicated per salt), then the WAVE join runs on the salted
    key — row-for-row identical to the unsalted pandas join, with no
    single bucket owning the hot key."""
    import json

    n, hot, n_salts = 20_000, 7, 8
    rng = np.random.default_rng(23)
    ck = rng.integers(0, 100, n).astype(np.int64)
    ck[: int(n * 0.4)] = hot  # 40% of the fact on one key
    fact = pd.DataFrame(
        {
            "okey": np.arange(n, dtype=np.int64),
            "custkey": ck,
            "total": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    dim = pd.DataFrame(
        {
            "custkey": np.arange(100, dtype=np.int64),
            "nation": np.arange(100, dtype=np.int64) % 25,
        }
    )

    # salt: hot fact rows spread by okey; dim replicates hot key n_salts ways
    fsalt = np.where(fact["custkey"] == hot, fact["okey"] % n_salts, 0)
    fact2 = fact.assign(k2=fact["custkey"] * n_salts + fsalt)
    reps = np.where(dim["custkey"] == hot, n_salts, 1)
    dim2 = dim.loc[dim.index.repeat(reps)].reset_index(drop=True)
    salt = dim2.groupby("custkey").cumcount()
    dim2 = dim2.assign(k2=dim2["custkey"] * n_salts + salt).drop(columns=["custkey"])

    out = str(tmp_path / "salted")
    hash_join_to_parquet(
        rd.from_pandas(fact2).repartition(6),
        rd.from_pandas(dim2).repartition(2),
        out,
        on="k2",
        how="inner",
        num_buckets=16,
        n_waves=2,
    )
    got = (
        _read_all(out)
        .drop(columns=["k2"])
        .sort_values(["okey"])
        .reset_index(drop=True)
    )
    ref = (
        fact.merge(dim, on="custkey")
        .sort_values(["okey"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, ref)

    # the hot key's rows actually spread: its salted sub-keys land in >1 bucket
    plan = json.load(open(os.path.join(out, "_exchange_plan.json")))
    assert plan["num_buckets"] == 16
    import pandas.util as pdu

    k2_hot = (np.arange(n_salts, dtype=np.int64) + hot * n_salts)
    h = pdu.hash_array(k2_hot).view(np.int64) & np.int64(2**63 - 1)
    assert len(set((h % 16).tolist())) > 1


def test_exchange_completion_marker(ray_session, tmp_path):
    """_exchange_done.json is the exchange's commit point: written after
    the last wave; require_complete gates consumers on it; a resume of a
    COMPLETED run is a no-op fast path, while a resume after file damage
    drops the marker and repairs."""
    df = pd.DataFrame({"k": list(range(300)) * 3, "v": np.arange(900, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(3)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False)["v"].sum().reset_index(name="s")

    out = str(tmp_path / "c")
    man = bucketed_map_groups_to_parquet(ds, ["k"], agg, out, num_buckets=8, n_waves=2)
    assert man["complete"] and os.path.exists(os.path.join(out, "_exchange_done.json"))
    assert read_exchange_output(out, require_complete=True).count() == 300

    # completed resume: instant no-op, nothing rewritten
    before = {p: os.path.getmtime(p) for p in glob.glob(out + "/part-*.parquet")}
    man2 = bucketed_map_groups_to_parquet(
        ds, ["k"], agg, out, num_buckets=8, n_waves=2, resume=True
    )
    assert man2 == man
    assert {p: os.path.getmtime(p) for p in glob.glob(out + "/part-*.parquet")} == before

    # damage -> marker dropped -> repair rewrites only the missing bucket
    victim = sorted(before)[1]
    os.remove(victim)
    man3 = bucketed_map_groups_to_parquet(
        ds, ["k"], agg, out, num_buckets=8, n_waves=2, resume=True
    )
    assert man3["files_written"] == [victim] and man3["complete"]
    assert read_exchange_output(out, require_complete=True).count() == 300

    # an unfinished exchange (no marker) must refuse require_complete
    os.remove(os.path.join(out, "_exchange_done.json"))
    with pytest.raises(FileNotFoundError, match="completion marker"):
        read_exchange_output(out, require_complete=True)


def test_fresh_run_owns_dirty_out_dir(ray_session, tmp_path):
    """A NON-resume run into a dir holding a previous (different-plan)
    run's bucket files must clear them: stale buckets would otherwise
    pollute read_exchange_output with rows this plan never routed."""
    df = pd.DataFrame({"k": list(range(100)) * 2, "v": np.arange(200, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(2)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False)["v"].sum().reset_index(name="s")

    out = str(tmp_path / "dirty")
    bucketed_map_groups_to_parquet(ds, ["k"], agg, out, num_buckets=32)
    n_before = len(glob.glob(out + "/part-*.parquet"))
    assert n_before > 4
    # fresh run with FEWER buckets: every stale wide-plan file must go
    man = bucketed_map_groups_to_parquet(ds, ["k"], agg, out, num_buckets=4)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) <= 4 and files == man["files_written"]
    got = _read_all(out).sort_values("k").reset_index(drop=True)
    want = df.groupby("k", sort=True)["v"].sum().reset_index(name="s")
    pd.testing.assert_frame_equal(got, want)
    assert read_exchange_output(out, require_complete=True).count() == 100


def test_exchange_property_random_frames(ray_session, tmp_path):
    """Property check over adversarial shapes (hypothesis): for random
    frames — unicode/empty-string keys, all-one-key skew, singleton rows —
    the wave groupby equals pandas groupby and the wave join equals pandas
    merge, for random bucket counts and wave counts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.lists(
        st.sampled_from(["a", "b", "", "κλειδί", "k-0", "K"]), min_size=1, max_size=60
    )

    counter = {"i": 0}

    @settings(max_examples=8, deadline=None)
    @given(keys, st.integers(1, 9), st.integers(1, 4), st.randoms())
    def check(ks, nb, waves, rnd):
        counter["i"] += 1
        df = pd.DataFrame(
            {"k": ks, "v": np.arange(len(ks), dtype=np.int64)}
        )
        ds = rd.from_pandas(df).repartition(min(3, len(ks)))

        def agg(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("k", sort=False)["v"].sum().reset_index(name="s")

        out = str(tmp_path / f"p{counter['i']}")
        bucketed_map_groups_to_parquet(ds, ["k"], agg, out, num_buckets=nb, n_waves=waves)
        got = _read_all(out).sort_values("k").reset_index(drop=True)
        want = df.groupby("k", sort=True)["v"].sum().reset_index(name="s")
        pd.testing.assert_frame_equal(got, want)

        # join the frame against a key->tag dim through the wave join
        dim = pd.DataFrame({"kk": sorted(set(ks))})
        dim["tag"] = ["t%d" % i for i in range(len(dim))]
        outj = str(tmp_path / f"j{counter['i']}")
        hash_join_to_parquet(
            ds, rd.from_pandas(dim), outj, on="k", right_on="kk",
            how="inner", num_buckets=nb, n_waves=waves,
        )
        gotj = _read_all(outj).sort_values(["k", "v"]).reset_index(drop=True)
        wantj = df.merge(dim.rename(columns={"kk": "k"}), on="k").sort_values(
            ["k", "v"]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(gotj, wantj)

    check()
