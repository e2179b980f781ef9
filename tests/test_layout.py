"""Layout stage tests: hash partition + sort, conversation co-location."""

from __future__ import annotations

import pyarrow as pa

from fhirflat_ray import fixtures
from fhirflat_ray.stages.layout import hash_partition_sort


def test_hash_partition_restores_order_and_colocates(ray_session):
    import ray.data as rd

    t = fixtures.make_unsorted_transcripts(3_000, seed=4)
    out = hash_partition_sort(rd.from_arrow(t), n_buckets=8)
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    got = pa.concat_tables(batches)
    assert got.num_rows == 3_000
    # within every output block, each conversation is contiguous and its
    # turns ascend (blocks may concatenate several sorted groups)
    for b in batches:
        df = b.select(["conv_id", "turn_idx"]).to_pandas()
        for _, g in df.groupby("conv_id"):
            idx = g.index.to_numpy()
            assert (idx[1:] - idx[:-1] == 1).all(), "conversation split inside block"
            ti = g["turn_idx"].to_numpy()
            assert (ti[1:] > ti[:-1]).all(), "turns out of order"
    # full multiset preserved (cast: pandas round-trip relaxes nullability)
    got_sorted = (
        got.select(t.column_names)
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        .combine_chunks()
        .cast(t.schema)
    )
    want = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).combine_chunks()
    assert got_sorted.equals(want)


def test_salted_outlier_spreads_but_keeps_chunk_order(ray_session):
    import numpy as np
    import ray.data as rd

    n = 4_000
    t = pa.table(
        {
            "conv_id": pa.array(["giant"] * n, pa.string()),
            "turn_idx": pa.array(np.random.default_rng(0).permutation(n).astype(np.int32)),
        }
    )
    from fhirflat_ray.stages.layout import _bucket_of

    # salted bucket assignment spreads the giant conversation
    buckets = _bucket_of(
        t["conv_id"].combine_chunks(), 8, t["turn_idx"].combine_chunks(), salt_turns=512
    )
    assert len(set(buckets.tolist())) > 1

    out = hash_partition_sort(rd.from_arrow(t), n_buckets=8, salt_turns=512)
    got = pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    assert got.num_rows == n
    # every 512-turn chunk stays contiguous and ascending in the output
    df = got.select(["turn_idx"]).to_pandas()
    df["chunk"] = df["turn_idx"] // 512
    for _, g in df.groupby("chunk"):
        idx = g.index.to_numpy()
        assert (idx[1:] - idx[:-1] == 1).all()
        ti = g["turn_idx"].to_numpy()
        assert (ti[1:] > ti[:-1]).all()


def test_zorder_prunes_both_dimensions(ray_session, tmp_path):
    import glob
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.stages.layout import cluster_zorder, zorder_key

    # full 64x64 grid: a single-key sort could only ever prune one axis
    xs, ys = np.meshgrid(np.arange(64), np.arange(64))
    df = pd.DataFrame(
        {
            "x": xs.ravel().astype(np.int64),
            "y": ys.ravel().astype(np.int64),
            "v": np.arange(4096, dtype=np.float64),
        }
    )
    segd = str(tmp_path / "z")
    cluster_zorder(
        rd.from_pandas(df).repartition(8),
        segd,
        ["x", "y"],
        target_rows=256,
        num_partitions=16,  # deterministic 256-row Z-range segments
    )
    total = len(glob.glob(os.path.join(segd, "part-*.seg")))
    assert total == 16

    for col in ("x", "y"):
        pred = [(col, ">=", 0), (col, "<=", 15)]
        kept = dec.prune_segments(segd, pred)
        # a quarter-range filter on EITHER dimension skips >= half the segments
        assert len(kept) <= total // 2, (col, len(kept), total)
        got = (
            dec.decode_dataset(segd, predicate=pred)
            .to_pandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        exp = df[df[col] <= 15].sort_values(["x", "y"]).reset_index(drop=True)
        assert got.equals(exp)

    # Morton key is deterministic and interleaves as documented
    k = zorder_key(
        [np.array([0, 1, 0, 3], dtype=np.int64), np.array([0, 0, 1, 3], dtype=np.int64)],
        [(0, 3), (0, 3)],
        bits=2,
    )
    assert k.tolist() == [0, 1, 2, 15]
