"""table_diff: digest-narrowed keyed reconciliation must classify planted
added / removed / changed rows exactly and drop unchanged ones."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fhirflat_ray.functions.diff import table_diff


def _mk(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))


def test_table_diff_planted(ray_session):
    old = _mk(
        {
            "k": np.array([1, 2, 3, 4, 5], np.int64),
            "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0]),
            "s": ["a", "b", "c", "d", "e"],
        }
    )
    # 2 changed (v), 4 changed (s), 3 removed, 6 added, 1/5 unchanged
    new = _mk(
        {
            "k": np.array([1, 2, 4, 5, 6], np.int64),
            "v": np.array([10.0, 21.0, 40.0, 50.0, 60.0]),
            "s": ["a", "b", "D", "e", "f"],
        }
    )
    got = table_diff(old, new, "k", ["v", "s"]).to_pandas()
    by = dict(zip(got["k"], got["status"]))
    assert by == {2: "changed", 3: "removed", 4: "changed", 6: "added"}


def test_table_diff_identical_is_empty(ray_session):
    rows = {
        "k": np.arange(1000, dtype=np.int64),
        "v": np.arange(1000, dtype=np.float64) * 1.5,
        "s": [f"s{i % 7}" for i in range(1000)],
    }
    assert table_diff(_mk(rows), _mk(rows), "k", ["v", "s"]).count() == 0


def test_table_diff_null_payloads(ray_session):
    # null vs value is a change; null vs null is not
    old = _mk({"k": np.array([1, 2], np.int64), "s": pd.array(["x", None], dtype=object)})
    new = _mk({"k": np.array([1, 2], np.int64), "s": pd.array([None, None], dtype=object)})
    got = table_diff(old, new, "k", ["s"]).to_pandas()
    assert dict(zip(got["k"], got["status"])) == {1: "changed"}


def test_mode_event_type_tie_break(ray_session, tmp_path):
    # user 1: tie a/b 2-2 -> 'a' (lexicographic); user 2: clear winner 'z'
    import duckdb
    import pyarrow.parquet as pq

    from fhirflat_ray.pipelines.queries import MODE_EVENT_TYPE_SQL, mode_event_type

    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 1, 2, 2, 2], np.int64),
            "event_type": ["b", "a", "b", "a", "z", "z", "y"],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet"
    )
    got = (
        mode_event_type(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(MODE_EVENT_TYPE_SQL).df().sort_values("user_id").reset_index(drop=True)
    assert got["mode_type"].tolist() == want["mode_type"].tolist() == ["a", "z"]
    assert got["n"].tolist() == want["n"].tolist()
