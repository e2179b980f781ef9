"""Property-based checks for the window/quantile operators against
brute-force references — boundary cases (tied timestamps, gaps exactly at
the window edge, negative values, single-row keys) that fixed fixtures and
the synthetic driver tables rarely produce."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _frames(draw, n_max=40):
    n = draw(st.integers(1, n_max))
    keys = draw(
        st.lists(st.integers(0, 3), min_size=n, max_size=n)
    )
    ts = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame({"k": keys, "ts": ts, "v": np.asarray(vals, dtype=np.float64)})


@st.composite
def frames(draw):
    return _frames(draw)


def _brute_rolling(df: pd.DataFrame, window: int) -> pd.DataFrame:
    """O(n^2) RANGE-frame reference incl. the SQL peer rule."""
    out = []
    for _, g in df.groupby("k"):
        g = g.sort_values(["ts", "v"], kind="mergesort")
        ts = g["ts"].to_numpy()
        v = g["v"].to_numpy()
        roll = [
            v[(ts >= t - window) & (ts <= t)].sum()  # peers of t included
            for t in ts
        ]
        out.append(g.assign(roll_ref=roll))
    return pd.concat(out)


@settings(max_examples=25, deadline=None)
@given(frames(), st.integers(0, 20))
def test_rolling_time_sum_matches_bruteforce(ray_session, df, window):
    import ray.data as rd

    from fhirflat_ray.functions.windows import rolling_time_sum

    got = (
        rolling_time_sum(rd.from_pandas(df).repartition(2), "k", "ts", "v", window)
        .to_pandas()
        .sort_values(["k", "ts", "v"], kind="mergesort")
        .reset_index(drop=True)
    )
    ref = (
        _brute_rolling(df, window)
        .sort_values(["k", "ts", "v"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert np.allclose(got["roll_sum"].to_numpy(), ref["roll_ref"].to_numpy())


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.floats(-1000, 1000, allow_nan=False, width=32), min_size=1, max_size=60),
    st.floats(0, 1),
)
def test_quantile_cont_matches_numpy(ray_session, vals, q):
    import ray.data as rd

    from fhirflat_ray.functions.quantiles import quantile_cont

    df = pd.DataFrame({"x": np.asarray(vals, dtype=np.float64)})
    got = quantile_cont(rd.from_pandas(df).repartition(2), "x", [q]).to_pandas()
    # numpy's 'linear' interpolation == SQL quantile_cont semantics
    want = float(np.quantile(np.asarray(vals, dtype=np.float64), q))
    assert math.isclose(got["value"][0], want, rel_tol=1e-9, abs_tol=1e-9)


@given(frames())
@settings(max_examples=15, deadline=None)
def test_rank_windows_match_duckdb(ray_session, df):
    """dense_rank / percent_rank / ntile vs DuckDB window functions —
    random keys, tied values, single-row keys."""
    import duckdb
    import ray.data as rd

    from fhirflat_ray.functions.windows import keyed_window

    df = df.copy().reset_index(drop=True)
    df["rid"] = np.arange(len(df), dtype=np.int64)  # unique tiebreak

    got = (
        keyed_window(
            rd.from_pandas(df).repartition(3),
            "k",
            ["v", "rid"],
            [
                ("dense_rank", "v", None, "dr"),
                ("percent_rank", "v", None, "pr"),
                ("ntile", None, 3, "tile"),
            ],
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)[["rid", "dr", "pr", "tile"]]
    )

    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        """
        SELECT rid,
               CAST(DENSE_RANK() OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS dr,
               ROUND(PERCENT_RANK() OVER (PARTITION BY k ORDER BY v), 9) AS pr,
               CAST(NTILE(3) OVER (PARTITION BY k ORDER BY v, rid) AS BIGINT) AS tile
        FROM t ORDER BY rid
        """
    ).fetchdf()
    assert got["dr"].tolist() == exp["dr"].tolist()
    assert got["tile"].tolist() == exp["tile"].tolist()
    assert np.allclose(got["pr"].to_numpy(), exp["pr"].to_numpy(), atol=1e-9)


def test_global_running_prefix_scan(ray_session):
    """Two-pass distributed prefix scan equals the sequential reference,
    including ties on the order column at bucket boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.windows import global_running

    rng = np.random.default_rng(13)
    n = 5_000
    # coarse ts: heavy ties, several per bucket boundary (width 100)
    ts = np.sort(rng.integers(0, 1_000, n)).astype(np.int64)
    tie = rng.permutation(n).astype(np.int64)
    cents = rng.integers(-500, 500, n).astype(np.int64)
    val = rng.standard_normal(n)
    ds = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.int64()),
                "eid": pa.array(tie, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "v": pa.array(val, pa.float64()),
            }
        )
    ).repartition(8)
    out = (
        global_running(
            ds, ts_col="ts", tiebreak_col="eid", sum_cols=["cents"],
            max_cols=["v"], bucket_width_us=100,
        )
        .to_pandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )
    order = np.lexsort((tie, ts))
    assert out["rn"].tolist() == list(range(1, n + 1))
    assert (out["eid"].to_numpy() == tie[order]).all()
    assert (out["run_cents"].to_numpy() == np.cumsum(cents[order])).all()
    assert (out["run_v"].to_numpy() == np.maximum.accumulate(val[order])).all()


def test_global_running_rank_only(ray_session):
    """Prefix scan with no sum/max columns still yields exact global row
    numbers (the seeded-shuffle/export path)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.windows import global_running

    rng = np.random.default_rng(21)
    h = rng.permutation(1000).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"h": pa.array(h, pa.int64()), "id": pa.array(np.arange(1000), pa.int64())})
    ).repartition(5)
    out = (
        global_running(ds, ts_col="h", tiebreak_col="id", sum_cols=[], max_cols=[],
                       bucket_width_us=100)
        .to_pandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    assert out["rn"].tolist() == list(range(1, 1001))


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=120,
    ),
    st.integers(2, 5),
)
@settings(max_examples=20, deadline=None)
def test_triangle_count_matches_brute_force(ray_session, raw_edges, n_parts):
    """Degree-ordered distributed triangle count == O(n^3) brute force on
    random small graphs (duplicates and both orientations in the input)."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.graph import triangle_count

    canon = {(min(a, b), max(a, b)) for a, b in raw_edges}
    if not canon:
        return
    u = np.array([e[0] for e in canon], np.int64)
    v = np.array([e[1] for e in canon], np.int64)
    ds = rd.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v)})).repartition(3)
    got = triangle_count(ds, num_partitions=n_parts)["n_triangles"][0].as_py()

    nodes = sorted({n for e in canon for n in e})
    want = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in canon and (x, z) in canon and (y, z) in canon
    )
    assert got == want
