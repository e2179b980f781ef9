"""End-to-end encode→decode→verify pipeline tests + resume semantics.

Mirrors the reference's end-to-end ingestion tests against golden outputs and
pinned metadata checksums (/root/reference/tests/test_ingest.py:1001-1060)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fhirflat_ray import fixtures
from fhirflat_ray.pipelines import decode as dec
from fhirflat_ray.pipelines import encode as enc
from fhirflat_ray.pipelines import verify as ver
from fhirflat_ray.state import lineage as lin
from fhirflat_ray.state import segments as seg


@pytest.fixture(scope="module")
def frag_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("frags"))
    fixtures.write_transcript_fragments(d, rows=20_000, n_fragments=8, seed=42)
    return d


def sorted_table(t: pa.Table) -> pa.Table:
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


# ----------------------------------------------------------- segment layer


def test_segment_roundtrip_and_checksums(tmp_path):
    t = fixtures.make_transcripts(2_000, seed=1)
    header, payload = seg.encode_table(t)
    path = str(tmp_path / "part-000000.seg")
    seg.write_segment(path, header, payload, {"part_id": 0})
    back = seg.read_segment(path, verify_checksums=True)
    assert back.equals(t)


def test_segment_column_pruning(tmp_path):
    t = fixtures.make_transcripts(500, seed=2)
    header, payload = seg.encode_table(t)
    path = str(tmp_path / "part-000000.seg")
    seg.write_segment(path, header, payload, {"part_id": 0})
    pruned = seg.read_segment(path, columns=["conv_id", "text"])
    assert pruned.column_names == ["conv_id", "text"]
    assert pruned.column("text").combine_chunks().equals(t.column("text").combine_chunks())


def test_segment_corruption_detected(tmp_path):
    t = fixtures.make_transcripts(100, seed=3)
    header, payload = seg.encode_table(t)
    path = str(tmp_path / "part-000000.seg")
    seg.write_segment(path, header, payload, {"part_id": 0})
    blob = bytearray(open(path, "rb").read())
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        seg.read_segment(bytes(blob), verify_checksums=True)


def test_header_scan_fanout_matches_serial(ray_session, tmp_path, monkeypatch):
    """map_segment_headers' Ray-fanned tier (threshold forced to 1) must
    return exactly the serial tier's results, in the same file-name order,
    for every consumer shape: lineage fold, completed-partition map, and
    zone-pruned paths."""
    for i in range(5):
        t = fixtures.make_transcripts(50, seed=i)
        header, payload = seg.encode_table(t)
        seg.write_segment(
            str(tmp_path / f"part-{i:06d}.seg"), header, payload,
            {"part_id": i, "input_fragment": f"frag-{i}", "n_rows": 50,
             "raw_bytes": 1, "encoded_bytes": 1},
        )
    d = str(tmp_path)
    serial_lineage = lin.collect_lineage(d)
    serial_done = lin.completed_partitions(d)
    serial_pruned = dec.prune_segments(d, [])
    monkeypatch.setattr(lin, "HEADER_FANOUT_THRESHOLD", 1)
    assert lin.collect_lineage(d) == serial_lineage
    assert lin.completed_partitions(d) == serial_done
    assert dec.prune_segments(d, []) == serial_pruned
    assert [r["part_id"] for r in serial_lineage] == list(range(5))


# ----------------------------------------------------------- full pipeline


def test_encode_decode_roundtrip(ray_session, frag_dir, tmp_path):
    out = str(tmp_path / "enc")
    manifest = enc.encode_files(
        frag_dir, out, target_rows=4_000, shared_dict_columns=["role", "tool"]
    )
    assert manifest["n_rows"] == 20_000
    assert manifest["n_partitions"] >= 5
    assert manifest["encoded_bytes"] < manifest["raw_bytes"] / 3
    assert set(manifest["shared_dicts"]) == {"role", "tool"}

    batches = list(
        dec.decode_dataset(out).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    src = pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(os.path.join(frag_dir, "*.parquet")))
    )
    got = sorted_table(pa.concat_tables(batches).select(src.column_names))
    assert got.combine_chunks().equals(sorted_table(src).combine_chunks())


def test_distributed_verify(ray_session, frag_dir, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "enc")
    enc.encode_files(frag_dir, out, target_rows=8_000)
    src_ds = rd.read_parquet(frag_dir)
    verdict = ver.verify_roundtrip(src_ds, dec.decode_dataset(out))
    assert verdict["equal"], verdict
    # negative control: drop a row → fingerprints must differ
    trunc = dec.decode_dataset(out).limit(19_999)
    verdict2 = ver.verify_roundtrip(src_ds, trunc)
    assert not verdict2["equal"]


def test_resume_skips_completed_and_is_deterministic(ray_session, frag_dir, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    full = enc.encode_files(frag_dir, out_a, target_rows=4_000)

    # simulate a crash: encode only some partitions, delete the rest
    enc.encode_files(frag_dir, out_b, target_rows=4_000)
    for p in dec.segment_paths(out_b)[2:]:
        os.unlink(p)
    os.unlink(os.path.join(out_b, "manifest.json"))
    kept = lin.completed_part_ids(out_b)
    assert len(kept) == 2

    resumed = enc.encode_files(frag_dir, out_b, target_rows=4_000, resume=True)
    assert resumed["resumed"] is True
    assert sorted(resumed["skipped_partitions"]) == sorted(kept)
    # byte-identical outcome vs the uninterrupted run (pinned-checksum analogue)
    assert resumed["checksum_of_checksums"] == full["checksum_of_checksums"]
    assert resumed["n_rows"] == full["n_rows"]


def test_resume_reencodes_when_input_set_changed(ray_session, tmp_path):
    """If new fragments shift partition ids, stale segments must be
    re-encoded, not wrongly skipped (resume verifies fragment identity)."""
    d = tmp_path / "frags"
    d.mkdir()
    t = fixtures.make_transcripts(4_000, seed=11)
    pq.write_table(t.slice(0, 2_000), str(d / "b.parquet"))
    out = str(tmp_path / "enc")
    enc.encode_files(str(d), out, target_rows=1_000)

    # add a file that sorts BEFORE the existing one → all part ids shift
    pq.write_table(t.slice(2_000), str(d / "a.parquet"))
    manifest = enc.encode_files(str(d), out, target_rows=1_000, resume=True)
    assert manifest["n_rows"] == 4_000
    assert manifest["skipped_partitions"] == []  # nothing matched → full redo

    import ray.data as rd

    verdict = ver.verify_roundtrip(rd.read_parquet(str(d)), dec.decode_dataset(out))
    assert verdict["equal"], verdict


def test_manifest_lineage_fields(ray_session, frag_dir, tmp_path):
    out = str(tmp_path / "enc")
    manifest = enc.encode_files(frag_dir, out, target_rows=8_000)
    rec = manifest["partitions"][0]
    for key in ("part_id", "input_fragment", "codecs", "payload_sha256", "row_range"):
        assert key in rec
    assert rec["codecs"]["ts"] in {"delta", "for", "rle", "plain"}
    with open(os.path.join(out, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["checksum_of_checksums"] == manifest["checksum_of_checksums"]


def test_streaming_encode_dataset(ray_session, tmp_path):
    """Dataset-native streaming encode: layout → encode_dataset → decode ==
    source (the pure-Dataset pipeline path, no input files required)."""
    import ray.data as rd

    from fhirflat_ray import fixtures
    from fhirflat_ray.stages.layout import hash_partition_sort

    t = fixtures.make_unsorted_transcripts(6_000, seed=8)
    laid = hash_partition_sort(rd.from_arrow(t), n_buckets=4)
    out = str(tmp_path / "stream_enc")
    manifest = enc.encode_dataset(laid, out, target_rows=2_000)
    assert manifest["n_rows"] == 6_000
    assert manifest["encoded_bytes"] < manifest["raw_bytes"] / 3

    got = pa.concat_tables(
        dec.decode_dataset(out).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert (
        got.select(t.column_names).sort_by(key).combine_chunks().cast(t.schema)
        .equals(t.sort_by(key).combine_chunks())
    )


def test_streaming_encode_clears_stale_and_skips_empty(ray_session, tmp_path):
    import ray.data as rd

    t = fixtures.make_transcripts(2_000, seed=14)
    out = str(tmp_path / "se")
    enc.encode_dataset(rd.from_arrow(t), out, target_rows=500)
    first = set(os.listdir(out))

    # re-encode different data into the same dir: old hash-named segments
    # must not survive into the new manifest
    t2 = fixtures.make_transcripts(1_000, seed=15)
    m2 = enc.encode_dataset(rd.from_arrow(t2), out, target_rows=500)
    assert m2["n_rows"] == 1_000
    total = sum(
        seg.read_segment(os.path.join(out, f)).num_rows
        for f in os.listdir(out)
        if f.endswith(".seg")
    )
    assert total == 1_000
    assert first != set(os.listdir(out))


def test_empty_plan_preserves_durable_segments(ray_session, tmp_path, frag_dir):
    out = str(tmp_path / "enc")
    enc.encode_files(frag_dir, out, target_rows=8_000)
    n_before = len(dec.segment_paths(out))
    empty_in = tmp_path / "emptyin"
    empty_in.mkdir()
    manifest = enc.encode_files(str(empty_in), out, resume=True)
    assert len(dec.segment_paths(out)) == n_before  # nothing deleted


def test_compact_refuses_self_target(ray_session, tmp_path):
    with pytest.raises(ValueError, match="own source dir"):
        enc.compact_segments(str(tmp_path), str(tmp_path))


def test_encode_empty_input(ray_session, tmp_path):
    src = str(tmp_path / "empty")
    os.makedirs(src)
    pq.write_table(fixtures.make_transcripts(10, seed=1).slice(0, 0), os.path.join(src, "e.parquet"))
    out = str(tmp_path / "enc")
    manifest = enc.encode_files(src, out)
    assert manifest["n_rows"] == 0
    if manifest["n_partitions"]:
        # an empty row group yields one empty segment — decodes to 0 rows
        assert dec.decode_dataset(out).count() == 0


def test_pruned_decode_ranged_io(ray_session, frag_dir, tmp_path):
    out = str(tmp_path / "enc")
    enc.encode_files(frag_dir, out, target_rows=8_000)
    pruned = dec.decode_dataset(out, columns=["conv_id", "turn_idx"])
    batches = list(pruned.iter_batches(batch_size=None, batch_format="pyarrow"))
    got = pa.concat_tables(batches)
    assert got.column_names == ["conv_id", "turn_idx"]
    assert got.num_rows == 20_000


def test_giant_conversation_spans_partitions(ray_session, tmp_path):
    """One conversation larger than a partition must round-trip exactly
    (FIXTURES.md F2 'conversation longer than one batch'; SURVEY §7 skew)."""
    import numpy as np

    n = 30_000
    t = pa.table(
        {
            "conv_id": pa.array(["conv-giant"] * n, pa.string()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
            "role": pa.array(["user", "assistant"] * (n // 2), pa.string()),
            "text": pa.array([f"turn {i}" for i in range(n)], pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1000, pa.timestamp("us")),
        }
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(t, os.path.join(src, "giant.parquet"), row_group_size=4096)
    out = str(tmp_path / "enc")
    manifest = enc.encode_files(src, out, target_rows=8_192)
    assert manifest["n_partitions"] >= 3  # the conversation spans partitions
    got = pa.concat_tables(
        dec.decode_dataset(out).iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("turn_idx", "ascending")])
    assert got.combine_chunks().equals(t)


# ----------------------------------------------------------- error routing


def test_validate_transcripts_routes_errors(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "conv_id": ["a", "a", "a", None, "b"],
            "turn_idx": pa.array([0, 1, 1, 2, -1], pa.int32()),
            "text": ["w", "x", "y", "z", "q"],
        }
    )
    marked = ver.validate_transcripts(rd.from_arrow(t))
    valid, errors = ver.split_valid(marked)
    verrs = sorted(r["_error"] for r in errors.take_all())
    assert verrs == ["duplicate (conv_id, turn_idx)", "negative turn_idx", "null conv_id"]
    assert valid.count() == 2


def test_streaming_encode_keeps_identical_blocks(ray_session, tmp_path):
    """Two byte-identical input blocks must round-trip to 2x rows — segment
    identity is salted per block, so whole-block content-addressing can no
    longer collapse a duplicated run (multiset semantics)."""
    import ray.data as rd

    t = fixtures.make_transcripts(1_000, seed=21)
    doubled = pa.concat_tables([t, t])
    out = str(tmp_path / "dupe")
    manifest = enc.encode_dataset(rd.from_arrow(doubled), out, target_rows=1_000)
    assert manifest["n_rows"] == 2_000
    assert manifest["n_partitions"] >= 2
    assert dec.decode_dataset(out).count() == 2_000


def test_resume_reencodes_in_place_rewrite(ray_session, tmp_path):
    """An input file rewritten IN PLACE (same name, same row-group layout,
    different content) must invalidate its cached segments on resume."""
    d = tmp_path / "frags"
    d.mkdir()
    path = str(d / "a.parquet")
    pq.write_table(fixtures.make_transcripts(2_000, seed=31), path)
    out = str(tmp_path / "enc")
    enc.encode_files(str(d), out, target_rows=1_000)

    t2 = fixtures.make_transcripts(2_000, seed=32)
    pq.write_table(t2, path)
    os.utime(path, ns=(1, 1))  # even a backdated mtime must not match (size may tie)
    manifest = enc.encode_files(str(d), out, target_rows=1_000, resume=True)
    assert manifest["skipped_partitions"] == []

    import ray.data as rd

    verdict = ver.verify_roundtrip(rd.read_parquet(path), dec.decode_dataset(out))
    assert verdict["equal"], verdict


def test_zone_map_predicate_pushdown(ray_session, tmp_path):
    """Zone maps skip whole segments from header-only reads, and the pruned
    scan's result equals a full decode + filter exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fhirflat_ray.pipelines.decode import decode_dataset, prune_segments
    from fhirflat_ray.pipelines.encode import encode_files
    from fhirflat_ray.state.lineage import read_manifest

    src = tmp_path / "src"
    src.mkdir()
    # 4 fragments with DISJOINT ts ranges -> each segment gets a tight zone
    for f in range(4):
        n = 500
        ts = np.arange(n, dtype=np.int64) + f * 10_000
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array(ts, pa.int64()),
                    "v": pa.array(np.arange(n, dtype=np.float64) + f),
                }
            ),
            str(src / f"frag{f}.parquet"),
        )
    seg_dir = str(tmp_path / "segs")
    encode_files(str(src), seg_dir, sort_keys=("ts",), target_rows=1_000)

    # manifest carries zones for catalog-level planning
    man = read_manifest(seg_dir)
    assert all("ts" in p["zones"] for p in man["partitions"])

    pred = [("ts", ">=", 25_000)]
    kept = prune_segments(seg_dir, pred)
    all_paths = prune_segments(seg_dir, [("ts", ">=", -1)])
    assert 0 < len(kept) < len(all_paths)  # real segments skipped

    got = (
        decode_dataset(seg_dir, predicate=pred)
        .to_pandas()
        .sort_values(["ts"])
        .reset_index(drop=True)
    )
    full = decode_dataset(seg_dir).to_pandas()
    want = (
        full[full["ts"] >= 25_000].sort_values(["ts"]).reset_index(drop=True)
    )
    assert got.equals(want)

    # predicate selecting nothing: empty result, Dataset schema intact
    # (an all-rows-filtered Dataset's to_pandas drops columns — a generic
    # Ray quirk for ANY empty filter result, so assert on Dataset.schema())
    empty_ds = decode_dataset(seg_dir, predicate=[("ts", ">", 10**9)])
    assert empty_ds.count() == 0
    assert set(empty_ds.schema().names) == set(full.columns)


def test_bloom_point_lookup_prunes_segments(ray_session, tmp_path):
    """String == predicates skip segments via the per-segment bloom."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fhirflat_ray.pipelines.decode import decode_dataset, prune_segments
    from fhirflat_ray.pipelines.encode import encode_files

    src = tmp_path / "src"
    src.mkdir()
    # 4 fragments, DISJOINT conv-id universes
    for f in range(4):
        convs = [f"conv-{f}-{i}" for i in range(20) for _ in range(25)]
        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array(convs, pa.string()),
                    "v": pa.array(np.arange(len(convs), dtype=np.int64)),
                }
            ),
            str(src / f"frag{f}.parquet"),
        )
    seg_dir = str(tmp_path / "segs")
    encode_files(str(src), seg_dir, sort_keys=None, target_rows=1_000)

    kept = prune_segments(seg_dir, [("conv_id", "==", "conv-2-7")])
    allp = prune_segments(seg_dir, [("v", ">=", -1)])
    assert 0 < len(kept) < len(allp)

    got = decode_dataset(
        seg_dir, predicate=[("conv_id", "==", "conv-2-7")]
    ).to_pandas()
    assert len(got) == 25 and set(got["conv_id"]) == {"conv-2-7"}

    # absent value: bloom proves absence everywhere
    assert (
        decode_dataset(seg_dir, predicate=[("conv_id", "==", "nope")]).count() == 0
    )


def _string_pred_fixture(tmp_path, shared: bool):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fhirflat_ray.pipelines.encode import encode_files

    src = tmp_path / ("src_sh" if shared else "src")
    src.mkdir()
    rng = np.random.default_rng(7)
    frames = []
    for f in range(3):
        n = 800
        tags = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])[
            rng.integers(0, 5, n)
        ]
        t = pa.table(
            {
                "tag": pa.array(tags.tolist(), pa.string()),
                "k": pa.array(np.arange(n, dtype=np.int64) + f * 10_000),
            }
        )
        pq.write_table(t, str(src / f"frag{f}.parquet"))
        frames.append(t)
    seg_dir = str(tmp_path / ("segs_sh" if shared else "segs"))
    encode_files(
        str(src),
        seg_dir,
        sort_keys=("k",),
        target_rows=500,
        shared_dict_columns=["tag"] if shared else None,
    )
    full = pa.concat_tables(frames).to_pandas()
    return seg_dir, full


@pytest.mark.parametrize("shared", [False, True])
def test_encoded_string_predicates_code_stream(ray_session, tmp_path, monkeypatch, shared):
    """Dict-coded string ==/is_in conjuncts evaluate on the integer code
    stream: results equal full decode + filter exactly, and on the direct
    per-segment path the string column is NEVER decoded (tripwire on
    decode_column for c=="str") — surviving strings come from vocab.take
    alone. Covers per-segment vocabs AND the shared-dictionary store."""
    import fhirflat_ray.codecs as codecs_pkg
    from fhirflat_ray.pipelines.decode import (
        decode_dataset,
        read_segment_filtered,
        segment_paths,
    )
    from fhirflat_ray.state.lineage import load_dict_store

    seg_dir, full = _string_pred_fixture(tmp_path, shared)

    # end-to-end through Ray: == and is_in, alone and mixed with a range
    got = (
        decode_dataset(seg_dir, predicate=[("tag", "==", "beta")])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = full[full["tag"] == "beta"].sort_values("k").reset_index(drop=True)
    assert got.equals(want)

    got = (
        decode_dataset(
            seg_dir,
            predicate=[("tag", "is_in", ["alpha", "delta"]), ("k", ">=", 10_000)],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        full[full["tag"].isin(["alpha", "delta"]) & (full["k"] >= 10_000)]
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.equals(want)

    # is_in selecting nothing
    assert (
        decode_dataset(seg_dir, predicate=[("tag", "is_in", ["nope"])]).count() == 0
    )

    # tripwire (driver-side direct read): the string column must go through
    # the code stream + vocab.take, never through a string-column decode
    orig = codecs_pkg.decode_column

    def guard(hdr, blob, dict_store=None):
        if hdr.get("c") == "str":
            raise AssertionError(
                "string column decoded on the encoded-predicate fast path"
            )
        return orig(hdr, blob, dict_store)

    monkeypatch.setattr(codecs_pkg, "decode_column", guard)
    store = load_dict_store(seg_dir)
    preds = [("tag", "is_in", ["beta", "gamma"])]
    tables = [
        read_segment_filtered(p, None, preds, store) for p in segment_paths(seg_dir)
    ]
    got = (
        pa.concat_tables(tables).to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        full[full["tag"].isin(["beta", "gamma"])]
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_adaptive_target_rows_fans_out_small_inputs(ray_session, tmp_path):
    """Default (target_rows=None) must split a small input into enough
    partitions to occupy the cluster — partitions are also the decode
    parallelism unit."""
    t = fixtures.make_transcripts(64_000)
    src = tmp_path / "frags"
    src.mkdir()
    pq.write_table(t, str(src / "a.parquet"), row_group_size=8_000)
    out = str(tmp_path / "enc")
    manifest = enc.encode_files(str(src), out)
    # 4-CPU test session: total/(2*4)=8k -> floored to the 16k minimum ->
    # two 8k row groups per partition
    assert manifest["n_partitions"] == 4
    got = dec.decode_dataset(out).to_pandas().sort_values(["conv_id", "turn_idx"])
    want = t.to_pandas().sort_values(["conv_id", "turn_idx"])
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_adaptive_resume_reuses_recorded_target(ray_session, tmp_path, monkeypatch):
    """A resumed adaptive-plan job must replan with the target recorded in
    the manifest, even when the apparent cluster width changed — otherwise
    every partition id shifts and completed segments are discarded."""
    import ray

    t = fixtures.make_transcripts(64_000)
    src = tmp_path / "frags"
    src.mkdir()
    pq.write_table(t, str(src / "a.parquet"), row_group_size=8_000)
    out = str(tmp_path / "enc")
    m1 = enc.encode_files(str(src), out)
    assert m1["target_rows"] >= 16_000 and m1["n_partitions"] == 4

    real = ray.cluster_resources
    monkeypatch.setattr(ray, "cluster_resources", lambda: {**real(), "CPU": 64})
    m2 = enc.encode_files(str(src), out, resume=True)
    assert m2["resumed"] is True
    assert m2["skipped_partitions"] == list(range(4))  # nothing re-encoded
    assert m2["target_rows"] == m1["target_rows"]


def test_merge_upsert_planted(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import merge_upsert

    src = tmp_path / "src"
    src.mkdir()
    n = 10_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "val": np.arange(n, dtype=np.float64) * 0.5,
            "tag": ["t%d" % (i % 5) for i in range(n)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=1000,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("event_id",), target_rows=2000)
    before = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(segd, "part-*.seg"))}
    assert len(before) == 5

    # updates hit keys < 4000 (2 of 5 segments); 50 brand-new keys append
    upd = pd.DataFrame(
        {"event_id": np.concatenate([np.arange(0, 4000, 7), np.arange(n, n + 50)]).astype(np.int64)}
    )
    upd["val"] = upd["event_id"] * -1.0
    upd["tag"] = "updated"
    m = merge_upsert(segd, rd.from_pandas(upd), "event_id")
    assert m["upserted"] == len(np.arange(0, 4000, 7)) and m["inserted"] == 50

    got = dec.decode_dataset(segd).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = df.copy()
    mask = (exp.event_id % 7 == 0) & (exp.event_id < 4000)
    exp.loc[mask, "val"] = exp.loc[mask, "event_id"] * -1.0
    exp.loc[mask, "tag"] = "updated"
    new = pd.DataFrame({"event_id": np.arange(n, n + 50, dtype=np.int64)})
    new["val"] = new["event_id"] * -1.0
    new["tag"] = "updated"
    exp = pd.concat([exp, new]).sort_values("event_id").reset_index(drop=True)
    assert got.equals(exp)

    # only the 2 candidate segments were rewritten; the other 3 never opened
    after = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(segd, "part-*.seg"))}
    assert sum(1 for p in before if before[p] == after.get(p)) == 3

    # idempotent re-run: inserted keys now live in zone-mapped segments, so
    # they route as updates — no duplicate inserts, same final table
    m2 = merge_upsert(segd, rd.from_pandas(upd), "event_id")
    assert m2["inserted"] == 0 and m2["upserted"] == len(upd)
    got2 = dec.decode_dataset(segd).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got2.equals(exp)

    # manifest refolded from headers: counts cover base + inserts
    man = lin.read_manifest(segd)
    assert man["n_rows"] == n + 50 and man["upserted"] == len(upd)


def test_merge_upsert_overlapping_zones(ray_session, tmp_path):
    # UNSORTED base: segment key ranges overlap, so routing takes the
    # chunked interval fallback and updates fan to multiple candidates;
    # only the segment actually holding the key applies it
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import merge_upsert

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(9)
    ids = rng.permutation(3000).astype(np.int64)
    df = pd.DataFrame({"k": ids, "v": ids * 2.0})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=500,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=None, target_rows=500)

    upd = pd.DataFrame({"k": np.arange(0, 3000, 11, dtype=np.int64)})
    upd["v"] = -1.0
    m = merge_upsert(segd, rd.from_pandas(upd), "k")
    assert m["upserted"] == len(upd) and m["inserted"] == 0
    got = dec.decode_dataset(segd).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(got) == 3000  # no duplicates from multi-candidate routing
    assert (got.loc[got.k % 11 == 0, "v"] == -1.0).all()
    assert (got.loc[got.k % 11 != 0, "v"] == got.loc[got.k % 11 != 0, "k"] * 2.0).all()


def test_merge_delete_planted(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import merge_delete

    src = tmp_path / "src"
    src.mkdir()
    n = 10_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "val": np.arange(n, dtype=np.float64) * 0.5,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=1000,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("event_id",), target_rows=2000)
    before = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(segd, "part-*.seg"))}
    assert len(before) == 5

    # deletes hit keys < 4000 only (2 of 5 segments); segment [0,2000) is
    # wiped entirely and its file must disappear
    dels = pd.DataFrame(
        {
            "event_id": np.concatenate(
                [np.arange(0, 2000), np.arange(2000, 4000, 3)]
            ).astype(np.int64)
        }
    )
    m = merge_delete(segd, rd.from_pandas(dels), "event_id")
    assert m["deleted"] == len(dels)

    after_paths = glob.glob(os.path.join(segd, "part-*.seg"))
    assert len(after_paths) == 4  # emptied segment removed

    got = dec.decode_dataset(segd).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = df[~df.event_id.isin(dels.event_id)].reset_index(drop=True)
    assert got.equals(exp)
    assert m["n_rows"] == len(exp)

    # untouched segments (keys >= 4000) were never rewritten
    untouched = [p for p in after_paths if p in before and before[p] == os.path.getmtime(p)]
    assert len(untouched) == 3

    # idempotent: deleting the same keys again is a no-op
    m2 = merge_delete(segd, rd.from_pandas(dels), "event_id")
    assert m2["deleted"] == 0 and m2["n_rows"] == len(exp)
    got2 = dec.decode_dataset(segd).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got2.equals(exp)


def test_schema_evolution_catalog_only(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines import evolve as evo
    from fhirflat_ray.pipelines.merge import merge_upsert

    src = tmp_path / "src"
    src.mkdir()
    df = pd.DataFrame(
        {
            "k": np.arange(3000, dtype=np.int64),
            "v": np.arange(3000, dtype=np.float64),
            "tag": ["t%d" % (i % 3) for i in range(3000)],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(src / "t.parquet"))
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",), target_rows=1000)
    before = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(segd, "part-*.seg"))}

    evo.add_column(segd, "source_tag", "string", "batch-a")
    evo.rename_column(segd, "tag", "label")
    evo.drop_column(segd, "v")
    evo.add_column(segd, "score", "float64")  # null default

    # catalog-only: not a single segment byte moved
    after = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(segd, "part-*.seg"))}
    assert before == after

    got = dec.decode_dataset(segd).to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.rename(columns={"tag": "label"}).drop(columns="v")
    exp["source_tag"] = "batch-a"
    exp["score"] = np.nan
    assert sorted(got.columns) == sorted(exp.columns)
    assert got[["k", "label", "source_tag"]].equals(exp[["k", "label", "source_tag"]])
    assert got["score"].isna().all()

    # pruned read through renames + added columns
    got2 = (
        dec.decode_dataset(segd, columns=["k", "label", "source_tag"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got2.columns) == ["k", "label", "source_tag"]
    assert got2["label"].equals(exp["label"])

    # added-columns-only request still yields one row per stored row
    got3 = dec.decode_dataset(segd, columns=["source_tag"]).to_pandas()
    assert len(got3) == 3000 and (got3["source_tag"] == "batch-a").all()

    # dropped column is gone for readers
    with pytest.raises(KeyError):
        dec.decode_dataset(segd, columns=["v"]).to_pandas()

    # predicate + evolution compose
    got4 = dec.decode_dataset(segd, predicate=[("k", "<", 10)]).to_pandas()
    assert len(got4) == 10 and "source_tag" in got4.columns

    # keyed mutations MATERIALIZE pending evolution inside the candidate
    # segment rewrite — no compact required; untouched segments keep the
    # op-log pending and the mixed set reads back consistently
    pending = evo.pending_evolution(segd)
    upd = pd.DataFrame({"k": [1], "label": ["x"], "source_tag": ["b"], "score": [1.0]})
    m = merge_upsert(segd, rd.from_pandas(upd), "k")
    assert m["upserted"] == 1 and m["inserted"] == 0
    assert evo.pending_evolution(segd) == pending
    exp_m = exp.copy()
    exp_m.loc[exp_m["k"] == 1, ["label", "source_tag", "score"]] = ["x", "b", 1.0]
    got_m = dec.decode_dataset(segd).to_pandas().sort_values("k").reset_index(drop=True)
    assert sorted(got_m.columns) == sorted(exp_m.columns)
    for c in ("k", "label", "source_tag"):
        assert got_m[c].tolist() == exp_m[c].tolist(), c
    assert got_m["score"].fillna(-1).tolist() == exp_m["score"].fillna(-1).tolist()
    # pruned read over the MIXED set: the materialized segment returns the
    # real upserted score, unmaterialized ones synthesize the null default
    got_p = (
        dec.decode_dataset(segd, columns=["k", "score"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got_p.loc[got_p["k"] == 1, "score"].iloc[0] == 1.0
    assert got_p["score"].fillna(-1).tolist() == exp_m["score"].fillna(-1).tolist()

    # compaction still materializes everything (fresh manifest, no pending
    # ops) — including the upserted values
    exp = exp_m
    segd2 = str(tmp_path / "enc2")
    enc.compact_segments(segd, segd2, sort_keys=("k",), target_rows=2000)
    assert evo.pending_evolution(segd2) == []
    got5 = dec.decode_dataset(segd2).to_pandas().sort_values("k").reset_index(drop=True)
    assert sorted(got5.columns) == sorted(exp.columns)
    assert got5[["k", "label", "source_tag"]].equals(exp[["k", "label", "source_tag"]])


def test_snapshots_time_travel(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines import snapshots as snap
    from fhirflat_ray.pipelines.merge import merge_delete, merge_upsert

    src = tmp_path / "src"
    src.mkdir()
    df = pd.DataFrame(
        {"k": np.arange(4000, dtype=np.int64), "v": np.arange(4000, dtype=np.float64)}
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(src / "t.parquet"))
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",), target_rows=1000)

    s1 = snap.create_snapshot(segd, note="pre-mutation")
    assert s1["version"] == 1 and s1["n_rows"] == 4000

    # mutate the live table: update k%5==0, delete k>=3000
    upd = pd.DataFrame({"k": np.arange(0, 4000, 5, dtype=np.int64)})
    upd["v"] = -9.0
    merge_upsert(segd, rd.from_pandas(upd), "k")
    merge_delete(
        segd, rd.from_pandas(pd.DataFrame({"k": np.arange(3000, 4000, dtype=np.int64)})), "k"
    )
    s2 = snap.create_snapshot(segd)
    assert s2["version"] == 2 and s2["n_rows"] == 3000

    # live table reflects the mutations …
    live = dec.decode_dataset(segd).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(live) == 3000 and (live.loc[live.k % 5 == 0, "v"] == -9.0).all()

    # … while snapshot v1 still reads the pre-mutation state, byte-exact
    old = (
        dec.decode_dataset(snap.snapshot_path(segd, 1))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert old.equals(df)

    # snapshot listing and release
    assert [s["version"] for s in snap.list_snapshots(segd)] == [1, 2]
    snap.drop_snapshot(segd, 1)
    assert [s["version"] for s in snap.list_snapshots(segd)] == [2]
    # v2 equals the live table
    got2 = (
        dec.decode_dataset(snap.snapshot_path(segd, 2))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got2.equals(live)


def test_incremental_view_append_and_rewrite(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.incremental import refresh_value_counts
    from fhirflat_ray.pipelines.merge import append_dataset, merge_delete

    src = tmp_path / "src"
    src.mkdir()
    df1 = pd.DataFrame(
        {
            "k": np.arange(3000, dtype=np.int64),
            "tag": ["abc"[i % 3] for i in range(3000)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df1, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=1000,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",), target_rows=1000)
    state = str(tmp_path / "view.json")

    view1, info1 = refresh_value_counts(segd, state, "tag")
    assert info1["mode"] == "full" and info1["segments_processed"] == 3
    assert dict(zip(view1["tag"].to_pylist(), view1["n"].to_pylist())) == {
        "a": 1000, "b": 1000, "c": 1000
    }

    # append-only delta: second refresh touches ONLY the new segments
    df2 = pd.DataFrame(
        {"k": np.arange(3000, 5000, dtype=np.int64), "tag": ["c", "d"] * 1000}
    )
    m = append_dataset(segd, rd.from_pandas(df2), target_rows=1000)
    assert m["appended"] == 2000 and m["n_rows"] == 5000
    view2, info2 = refresh_value_counts(segd, state, "tag")
    assert info2["mode"] == "incremental"
    assert info2["segments_processed"] == info2["segments_live"] - 3
    assert dict(zip(view2["tag"].to_pylist(), view2["n"].to_pylist())) == {
        "a": 1000, "b": 1000, "c": 2000, "d": 1000
    }

    # history rewrite (delete) invalidates increments → honest full rebuild
    merge_delete(
        segd, rd.from_pandas(pd.DataFrame({"k": np.arange(0, 3000, 3, dtype=np.int64)})), "k"
    )
    view3, info3 = refresh_value_counts(segd, state, "tag")
    assert info3["mode"] == "full"
    got = dict(zip(view3["tag"].to_pylist(), view3["n"].to_pylist()))
    exp = df1[df1.k % 3 != 0]["tag"].value_counts().to_dict()
    for t, n in df2["tag"].value_counts().items():
        exp[t] = exp.get(t, 0) + int(n)
    assert got == {k: int(v) for k, v in exp.items()}


def test_encode_dataset_identical_blocks_keep_multiset(ray_session, tmp_path):
    # regression: nested-closure pickling used to capture the driver's salt
    # and a stateful ordinal COPY, so byte-identical blocks in different
    # tasks collided to one segment file (multiset loss). Self-similar data
    # (here: the same 256 rows x 16 blocks) must survive exactly.
    import numpy as np
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({"a": np.tile(np.arange(256, dtype=np.int64), 16)})
    segd = str(tmp_path / "enc")
    m = enc.encode_dataset(
        rd.from_pandas(df).repartition(16), segd, sort_keys=None, target_rows=256
    )
    assert m["n_rows"] == 4096
    assert len(glob.glob(os.path.join(segd, "part-*.seg"))) == 16
    back = dec.decode_dataset(segd).to_pandas()
    assert len(back) == 4096 and (np.sort(back["a"].to_numpy()) ==
                                  np.sort(df["a"].to_numpy())).all()


def test_vacuum_dict_store(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import merge_delete

    src = tmp_path / "src"
    src.mkdir()
    # two shared-dict columns; "tool" values live ONLY in rows we delete
    n = 4000
    df = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "role": ["user", "assistant"] * (n // 2),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=1000,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",), shared_dict_columns=["role"], target_rows=1000)
    dicts_before = glob.glob(os.path.join(segd, "dicts", "*.arrow"))
    assert dicts_before  # the role vocab is in the store

    # nothing orphaned yet: vacuum keeps everything
    out = lin.vacuum_dict_store(segd)
    assert out["removed"] == []
    assert glob.glob(os.path.join(segd, "dicts", "*.arrow")) == dicts_before

    # delete ALL rows → no segment references any dict; the manifest
    # registry still pins the vocab for future appends, so simulate a
    # registry-less dir by dropping that entry
    merge_delete(segd, rd.from_pandas(pd.DataFrame({"k": np.arange(n, dtype=np.int64)})), "k")
    man = lin.read_manifest(segd)
    assert man["n_rows"] == 0
    man.pop("shared_dicts", None)
    lin.write_manifest(segd, man["partitions"], extra={k: man[k] for k in ("source", "sort_keys") if k in man})
    out2 = lin.vacuum_dict_store(segd)
    assert len(out2["removed"]) == len(dicts_before)
    assert glob.glob(os.path.join(segd, "dicts", "*.arrow")) == []


def test_lakehouse_lifecycle(ray_session, tmp_path):
    """The whole mutation/metadata surface in one lifecycle, checking the
    interactions: snapshot isolation across merge+delete, evolution
    gating keyed mutations, compaction materializing evolution, vacuum
    after dict-orphaning, and the incremental view detecting rewrites."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines import evolve as evo
    from fhirflat_ray.pipelines import snapshots as snap
    from fhirflat_ray.pipelines.incremental import refresh_value_counts
    from fhirflat_ray.pipelines.merge import append_dataset, merge_upsert

    src = tmp_path / "src"
    src.mkdir()
    n = 6000
    df = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "v": np.arange(n, dtype=np.float64),
            "role": [["user", "assistant", "tool"][i % 3] for i in range(n)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=1000,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",),
                     shared_dict_columns=["role"], target_rows=1000)

    # 1. view build + snapshot
    state = str(tmp_path / "view.json")
    view1, info1 = refresh_value_counts(segd, state, "role")
    assert info1["mode"] == "full"
    s1 = snap.create_snapshot(segd, note="v1")

    # 2. append → incremental refresh touches only the new segments
    extra = pd.DataFrame(
        {"k": np.arange(n, n + 1200, dtype=np.int64)}
    )
    extra["v"] = 0.0
    extra["role"] = "tool"
    append_dataset(segd, rd.from_pandas(extra), target_rows=600)
    view2, info2 = refresh_value_counts(segd, state, "role")
    assert info2["mode"] == "incremental" and info2["segments_processed"] == 2
    got2 = dict(zip(view2["role"].to_pylist(), view2["n"].to_pylist()))
    assert got2["tool"] == 2000 + 1200

    # 3. keyed mutation → the view detects the rewrite and full-rebuilds
    upd = pd.DataFrame({"k": [0, 1], "v": [-1.0, -1.0], "role": ["user", "user"]})
    merge_upsert(segd, rd.from_pandas(upd), "k")
    view3, info3 = refresh_value_counts(segd, state, "role")
    assert info3["mode"] == "full"

    # 4. keyed mutations under pending evolution materialize it in the
    # touched segments (updates arrive in the EVOLVED schema); compaction
    # afterwards clears the op-log with the upserts intact
    evo.add_column(segd, "split", "string", "train")
    evo.drop_column(segd, "v")
    upd_e = pd.DataFrame({"k": [0, 1], "role": ["user", "user"], "split": ["test", "test"]})
    m4 = merge_upsert(segd, rd.from_pandas(upd_e), "k")
    assert m4["upserted"] == 2 and m4["inserted"] == 0
    live0 = dec.decode_dataset(segd).to_pandas().sort_values("k").reset_index(drop=True)
    assert "v" not in live0.columns
    assert live0.loc[live0["k"] <= 1, "split"].tolist() == ["test", "test"]
    assert (live0.loc[live0["k"] > 1, "split"] == "train").all()
    segd2 = str(tmp_path / "enc2")
    enc.compact_segments(segd, segd2, sort_keys=("k",), target_rows=4000)
    assert evo.pending_evolution(segd2) == []
    live = dec.decode_dataset(segd2).to_pandas().sort_values("k").reset_index(drop=True)
    assert "split" in live.columns and "v" not in live.columns
    assert len(live) == n + 1200
    assert live.loc[live["k"] <= 1, "split"].tolist() == ["test", "test"]
    assert (live.loc[live["k"] > 1, "split"] == "train").all()

    # 5. snapshot v1 still reads the ORIGINAL table (pre-append, pre-merge,
    # pre-evolution) even though live segments were rewritten since
    old = (
        dec.decode_dataset(snap.snapshot_path(segd, 1))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(old.columns) == ["k", "v", "role"] and len(old) == n
    assert old.equals(df)

    # 6. vacuum: the compacted dir re-encoded with NO shared dicts pinned
    # in its manifest registry keeps only referenced vocabularies
    out = lin.vacuum_dict_store(segd2)
    assert isinstance(out["removed"], list)  # runs clean end to end


def test_zone_pruning_sees_through_renames(ray_session, tmp_path):
    import numpy as np
    import pandas as pd

    from fhirflat_ray.pipelines import evolve as evo

    src = tmp_path / "src"
    src.mkdir()
    df = pd.DataFrame({"k": np.arange(4000, dtype=np.int64), "v": np.arange(4000) * 1.0})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=1000,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",), target_rows=1000)
    evo.rename_column(segd, "k", "key_id")

    # pruning on the NEW name must still skip zones keyed by the stored name
    kept = dec.prune_segments(segd, [("k", "<", 1000)])  # stored-name check
    assert len(kept) == 1
    got = dec.decode_dataset(segd, predicate=[("key_id", "<", 1000)]).to_pandas()
    assert len(got) == 1000 and list(got.columns) == ["key_id", "v"]
    # and the plan only opened the matching segment's share of rows — prune
    # behaviour equals the stored-name prune above by construction


def test_decode_columns_plus_predicate(ray_session, tmp_path):
    # a pruned column read whose predicate column is NOT requested must
    # still filter (the segment read covers it, the output drops it)
    import numpy as np
    import pandas as pd

    from fhirflat_ray.pipelines import evolve as evo

    src = tmp_path / "src"
    src.mkdir()
    df = pd.DataFrame(
        {"k": np.arange(2000, dtype=np.int64), "v": np.arange(2000) * 1.0,
         "s": ["x", "y"] * 1000}
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=500,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",), target_rows=500)

    out = dec.decode_dataset(segd, columns=["s"], predicate=[("k", "<", 100)]).to_pandas()
    assert len(out) == 100 and list(out.columns) == ["s"]

    # … and the same composition through a rename
    evo.rename_column(segd, "k", "key_id")
    out2 = dec.decode_dataset(
        segd, columns=["s"], predicate=[("key_id", "<", 100)]
    ).to_pandas()
    assert len(out2) == 100 and list(out2.columns) == ["s"]


def test_fingerprint_invariant_under_partitioning(ray_session):
    """Partial hash sums straddle 2^63 across blocks; with a Python-int
    column pandas infers int64 vs uint64 per block and Ray's mixed-schema
    unification went through float64, shearing low bits (the 16M-row
    verify false alarm). The fingerprint must equal the locally-computed
    truth under ANY partitioning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.pipelines.verify import dataset_fingerprint

    from fhirflat_ray.pipelines.verify import MASK64, _batch_fingerprint

    rng = np.random.default_rng(123)
    df = pd.DataFrame(
        {
            "conv_id": [f"conv-{i%977}" for i in range(60_000)],
            "text": [f"t{i}" for i in range(60_000)],
            "v": rng.integers(0, 1 << 40, 60_000),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    want = int(_batch_fingerprint(t)["hash_sum"][0].as_py()) & MASK64
    for nparts in (3, 17, 64):
        got = dataset_fingerprint(rd.from_arrow(t).repartition(nparts))
        assert got["n"] == len(df)
        assert got["hash_sum"] == want, f"nparts={nparts}"


def test_fingerprint_distinguishes_value_classes():
    """The Arrow-native row hash must keep apart the classes a weaker
    combine would collide: null vs "" vs 0 (the M23 contract), and
    cross-row value swaps within a column (an additive cross-column
    combine cancels those)."""
    import pyarrow as pa

    from fhirflat_ray.pipelines.verify import _batch_fingerprint

    def fp(tbl: pa.Table) -> int:
        return int(_batch_fingerprint(tbl)["hash_sum"][0].as_py())

    base = pa.table({"a": ["x", None], "b": [1, 2]})
    assert fp(base) != fp(pa.table({"a": ["x", ""], "b": [1, 2]}))
    assert fp(pa.table({"a": [None], "b": [0]})) != fp(pa.table({"a": [""], "b": [0]}))
    # swap values across rows within column b: multiset of rows differs
    assert fp(pa.table({"a": ["x", "y"], "b": [1, 2]})) != fp(
        pa.table({"a": ["x", "y"], "b": [2, 1]})
    )
    # true row permutation: multiset equal -> fingerprint equal
    assert fp(pa.table({"a": ["y", "x"], "b": [2, 1]})) == fp(
        pa.table({"a": ["x", "y"], "b": [1, 2]})
    )
    # int null vs 0
    assert fp(pa.table({"b": pa.array([None], pa.int64())})) != fp(
        pa.table({"b": pa.array([0], pa.int64())})
    )
    # float NaN vs null vs 0.0
    vals = [
        fp(pa.table({"f": pa.array([v], pa.float64())}))
        for v in (None, float("nan"), 0.0)
    ]
    assert len(set(vals)) == 3


def test_plugin_codec_through_segment_pipeline(ray_session, frag_dir, tmp_path):
    """register_codec → encode_files (Ray workers pick the plug-in up via
    the DataContext mirror) → segment headers carry the "x:" tag →
    decode_dataset reproduces the source bit-identically — the full
    open-registry loop without touching codecs/core.py."""
    import ray.data as rd

    from fhirflat_ray.codecs import register_codec, unregister_codec
    from tests.test_codecs import _xordelta_fns

    enc_fn, dec_fn, est_fn = _xordelta_fns()
    register_codec("xordelta", enc_fn, dec_fn, est_fn)
    out = str(tmp_path / "enc_plugin")
    try:
        enc.encode_files(frag_dir, out, target_rows=4_000)
        headers = [seg.read_segment_header(p)[0] for p in dec.segment_paths(out)]
        tags = {c["hdr"]["c"] for h in headers for c in h["columns"]}
        assert "x:xordelta" in tags, tags

        verdict = ver.verify_roundtrip(
            rd.read_parquet(frag_dir), dec.decode_dataset(out)
        )
        assert verdict["equal"], verdict
    finally:
        unregister_codec("xordelta")

    # after driver-side unregister, decode of plug-in-coded segments must
    # fail actionably in the workers (replace-semantics sync), not corrupt
    with pytest.raises(Exception, match="register_codec"):
        dec.decode_dataset(out).materialize()


# ------------------------------------------------- crash + resume semantics


def _events_frame(n: int) -> "pd.DataFrame":
    import numpy as np
    import pandas as pd

    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "val": np.arange(n, dtype=np.float64) * 0.5,
            "tag": ["t%d" % (i % 5) for i in range(n)],
        }
    )


def _run_and_kill(code: str, progressed) -> bool:
    """Start ``code`` in a fresh python (own Ray session), SIGKILL it the
    moment ``progressed()`` first returns True. Returns True if the kill
    landed mid-run (False = the job finished first, which still exercises
    the re-run path)."""
    import signal
    import subprocess
    import sys
    import time

    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        env=env,
        cwd="/root/repo",
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if progressed():
                if proc.poll() is None:
                    proc.send_signal(signal.SIGKILL)
                    proc.wait(timeout=30)
                    return True
                return False
            if proc.poll() is not None:
                return False
            time.sleep(0.02)
        raise TimeoutError("job made no observable progress in 120s")
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_compact_killed_midrun_source_intact_and_rerunnable(ray_session, tmp_path):
    """SIGKILL during compact_segments must leave the SOURCE segment set
    fully intact (compaction writes elsewhere); a plain re-run then
    produces a decode-equal compacted set."""
    import numpy as np
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    df = _events_frame(40_000)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=500,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("event_id",), target_rows=500)
    n_src_segs = len(glob.glob(os.path.join(segd, "part-*.seg")))
    assert n_src_segs == 80
    src_bytes = {
        p: open(p, "rb").read() for p in glob.glob(os.path.join(segd, "part-*.seg"))
    }

    outd = str(tmp_path / "compacted")
    code = (
        "import ray; ray.init(address='local', num_cpus=4, include_dashboard=False, logging_level='ERROR')\n"
        "from fhirflat_ray.pipelines.encode import compact_segments\n"
        f"compact_segments({segd!r}, {outd!r}, target_rows=2000, sort_keys=('event_id',))\n"
    )
    killed = _run_and_kill(
        code, lambda: len(glob.glob(os.path.join(outd, "part-*.seg"))) >= 2
    )

    # source untouched byte-for-byte regardless of where the kill landed
    for p, blob in src_bytes.items():
        assert open(p, "rb").read() == blob, f"source segment changed: {p}"

    # re-run to completion (encode_dataset owns+clears out_dir) → equality
    enc.compact_segments(segd, outd, target_rows=2000, sort_keys=("event_id",))
    got = dec.decode_dataset(outd).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got.equals(df)
    assert len(glob.glob(os.path.join(outd, "part-*.seg"))) < n_src_segs
    assert killed in (True, False)  # informational; both paths verified


def test_merge_upsert_killed_midrun_no_loss_no_dups(ray_session, tmp_path):
    """SIGKILL during merge_upsert: every segment stays readable (atomic
    per-segment replace), no row is lost, no key duplicates; re-running the
    SAME upsert converges to the exact expected table (crash-appended
    insert segments are seen by the disk-scan router, not re-inserted)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import merge_upsert

    src = tmp_path / "src"
    src.mkdir()
    n = 20_000
    df = _events_frame(n)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=400,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("event_id",), target_rows=400)
    before = {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(segd, "part-*.seg"))
    }
    assert len(before) == 50

    upd_path = str(tmp_path / "upd.parquet")
    upd = pd.DataFrame(
        {
            "event_id": np.concatenate(
                [np.arange(0, n, 3), np.arange(n, n + 500)]
            ).astype(np.int64)
        }
    )
    upd["val"] = upd["event_id"] * -1.0
    upd["tag"] = "updated"
    pq.write_table(pa.Table.from_pandas(upd, preserve_index=False), upd_path)

    def progressed() -> bool:
        paths = glob.glob(os.path.join(segd, "part-*.seg"))
        if len(paths) != len(before):
            return True
        changed = sum(1 for p in paths if os.path.getmtime(p) != before.get(p))
        return changed >= 2

    code = (
        "import ray; ray.init(address='local', num_cpus=4, include_dashboard=False, logging_level='ERROR')\n"
        "import ray.data as rd\n"
        "from fhirflat_ray.pipelines.merge import merge_upsert\n"
        f"merge_upsert({segd!r}, rd.read_parquet({upd_path!r}), 'event_id')\n"
    )
    _run_and_kill(code, progressed)

    # post-kill invariants: every segment readable, zero lost keys, zero
    # duplicate keys, every row either its old or its new value
    mid = dec.decode_dataset(segd).to_pandas().sort_values("event_id").reset_index(drop=True)
    base_ids = mid[mid.event_id < n]
    assert len(base_ids) == n and base_ids.event_id.is_unique
    assert mid.event_id.is_unique  # crash-appended inserts never duplicate
    old_val = base_ids.event_id.to_numpy() * 0.5
    new_val = base_ids.event_id.to_numpy() * -1.0
    v = base_ids.val.to_numpy()
    assert np.all((v == old_val) | (v == new_val))

    # re-run the SAME upsert → exact expected final state
    merge_upsert(segd, rd.read_parquet(upd_path), "event_id")
    got = dec.decode_dataset(segd).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = df.copy()
    mask = exp.event_id % 3 == 0
    exp.loc[mask, "val"] = exp.loc[mask, "event_id"] * -1.0
    exp.loc[mask, "tag"] = "updated"
    new = pd.DataFrame({"event_id": np.arange(n, n + 500, dtype=np.int64)})
    new["val"] = new["event_id"] * -1.0
    new["tag"] = "updated"
    exp = pd.concat([exp, new]).sort_values("event_id").reset_index(drop=True)
    assert got.equals(exp)


def test_stray_segment_invisible_to_committed_readers(ray_session, tmp_path):
    """A valid part-*.seg file dropped into a COMMITTED directory by an
    orphaned worker of a killed run must be invisible everywhere: the
    manifest's partition list is the source of truth for decode, stats,
    zone-pruned scans and snapshots. Manifest-less dirs keep glob
    semantics (resume's trust-only-durable-segments rule)."""
    import shutil

    from fhirflat_ray.state import lineage as lin

    d = tmp_path / "frags"
    d.mkdir()
    t = fixtures.make_transcripts(2_000, seed=3)
    pq.write_table(t, str(d / "a.parquet"), row_group_size=1_000)
    out = str(tmp_path / "enc")
    enc.encode_files(str(d), out, target_rows=1_000)
    committed = dec.segment_paths(out)
    assert len(committed) == 2

    # plant a stray: a byte-identical copy of a real segment under a name
    # the manifest does not list (what a zombie writer leaves behind)
    stray = os.path.join(out, "part-deadbeef.seg")
    shutil.copyfile(committed[0], stray)

    assert dec.segment_paths(out) == committed  # stray not listed
    assert dec.decode_dataset(out).count() == 2_000  # not decoded
    # header scans (merge routing, lineage refold, zone pruning) skip it too
    assert len(lin.collect_lineage(out)) == 2
    # glob fallback still sees everything once the dir is uncommitted
    lin.uncommit_manifest(out)
    assert len(dec.segment_paths(out)) == 3
    os.remove(stray)
    # re-commit by refolding the durable segments
    lin.write_manifest(out, lin.collect_lineage(out))
    assert dec.decode_dataset(out).count() == 2_000


def test_mutator_sequence_matches_pandas_model(ray_session, tmp_path):
    """Randomized upsert/delete/append/compact sequence against a pandas
    reference model: after EVERY mutation the decoded table must equal the
    model exactly and the manifest row count must agree — the
    crash-consistency commit model may never lose or duplicate a row
    across chained mutations."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import append_dataset, merge_delete, merge_upsert

    rng = np.random.default_rng(20260820)

    def frame(keys, salt):
        return pd.DataFrame(
            {
                "event_id": np.asarray(sorted(keys), np.int64),
                "val": np.asarray(sorted(keys), np.float64) * 0.5 + salt,
                "tag": ["m%d" % ((k + salt) % 7) for k in sorted(keys)],
            }
        )

    src = tmp_path / "src"
    src.mkdir()
    model = frame(range(3_000), 0)
    pq.write_table(
        pa.Table.from_pandas(model, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=500,
    )
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("event_id",), target_rows=500)

    def check(step):
        got = (
            dec.decode_dataset(segd)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[["event_id", "val", "tag"]]
        )
        want = model.sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, obj=step)
        from fhirflat_ray.state.lineage import read_manifest

        assert read_manifest(segd)["n_rows"] == len(model), step

    next_key = 3_000
    for step in range(6):
        live = model["event_id"].to_numpy()
        op = ("upsert", "delete", "append")[step % 3]
        if op == "upsert" and len(live):
            hit = rng.choice(live, size=min(400, len(live)), replace=False)
            fresh = np.arange(next_key, next_key + 120, dtype=np.int64)
            next_key += 120
            upd = frame(np.concatenate([hit, fresh]), salt=step + 1)
            merge_upsert(segd, rd.from_arrow(pa.Table.from_pandas(upd, preserve_index=False)), "event_id")
            model = pd.concat(
                [model[~model["event_id"].isin(upd["event_id"])], upd]
            )
        elif op == "delete" and len(live):
            drop = rng.choice(live, size=min(300, len(live)), replace=False)
            merge_delete(
                segd,
                rd.from_arrow(pa.table({"event_id": pa.array(sorted(drop), pa.int64())})),
                "event_id",
            )
            model = model[~model["event_id"].isin(drop)]
        else:
            fresh = np.arange(next_key, next_key + 250, dtype=np.int64)
            next_key += 250
            add = frame(fresh, salt=step + 1)
            append_dataset(segd, rd.from_arrow(pa.Table.from_pandas(add, preserve_index=False)))
            model = pd.concat([model, add])
        check(f"step {step} after {op}")

    # compact the mutated set into a fresh dir and re-check equality there
    outd = str(tmp_path / "compacted")
    enc.compact_segments(segd, outd, target_rows=1_000, sort_keys=("event_id",))
    got = (
        dec.decode_dataset(outd)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "val", "tag"]]
    )
    pd.testing.assert_frame_equal(
        got, model.sort_values("event_id").reset_index(drop=True), obj="post-compact"
    )


def _kill_one_worker(pattern: str, deadline_s: float, proc) -> bool:
    """SIGKILL the first live Ray worker whose process TITLE starts with
    ``pattern`` (a node-failure analogue: the task dies mid-flight, the
    driver survives). Prefix-matching the title is load-bearing: a substring
    match can hit unrelated processes that merely carry the pattern inside
    their argv (e.g. a shell whose -c string quotes this very test).
    Returns True once a worker was killed; False if ``proc`` finished first."""
    import signal
    import subprocess as sp
    import time

    end = time.time() + deadline_s
    while time.time() < end:
        if proc.poll() is not None:
            return False
        out = sp.run(["ps", "-eo", "pid,args"], capture_output=True, text=True).stdout
        for line in out.splitlines():
            parts = line.split(None, 1)
            if len(parts) == 2 and parts[1].startswith(pattern):
                try:
                    os.kill(int(parts[0]), signal.SIGKILL)
                except (ProcessLookupError, ValueError):
                    continue
                return True
        time.sleep(0.02)
    return False


def test_encode_worker_killed_midrun_retries_idempotently(ray_session, tmp_path):
    """A WORKER process dying mid-encode (the multi-node failure mode: a
    task's node goes away while the driver survives) must be retried by
    Ray and converge to the exact same output — the atomic tmp+rename
    segment write plus deterministic per-partition content make the retry
    idempotent, so the job ends with exactly one segment per partition and
    decode equality. Complements the driver-SIGKILL tests (those exercise
    --resume; this exercises in-job retry with no resume involved)."""
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    df = _events_frame(40_000)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "t.parquet"),
        row_group_size=250,
    )
    segd = str(tmp_path / "enc")
    code = (
        "import ray; ray.init(address='local', num_cpus=4, include_dashboard=False, logging_level='ERROR')\n"
        "print('READY', flush=True)\n"
        "from fhirflat_ray.pipelines.encode import encode_files\n"
        f"m = encode_files({str(src)!r}, {segd!r}, sort_keys=('event_id',), target_rows=250)\n"
        "print('PARTS', len(m['partitions']), flush=True)\n"
        "ray.shutdown()\n"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        env=env,
        cwd="/root/repo",
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        assert proc.stdout.readline().strip() == "READY"
        # the session-scoped test Ray cluster is idle here, so any live
        # _encode_task worker belongs to the subprocess's own session
        killed = _kill_one_worker("ray::MapBatches(_encode_task)", 120.0, proc)
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)

    assert proc.returncode == 0, "encode job must survive a worker death"
    assert "PARTS 160" in out
    # exactly one durable segment per partition — the retried task's
    # rewrite replaced, never duplicated (atomic rename idempotence)
    segs = glob.glob(os.path.join(segd, "part-*.seg"))
    assert len(segs) == 160
    got = (
        dec.decode_dataset(segd)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got.equals(df)
    # the kill must actually land: the watcher starts at READY (before the
    # Dataset executes), so a live _encode_task worker is always observable
    assert killed, "worker kill did not land — the test exercised nothing"


def test_wave_dedup_killed_midrun_resumes_exact(ray_session, tmp_path):
    """SIGKILL mid wave-sharded exact dedup: completed bucket files are
    atomic+durable; resume=True loads the recorded plan manifest, keeps
    the survivors' files byte-identical (only missing buckets rewrite) and
    the final output equals the planted truth exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.functions.exchange import exact_dedup_to_parquet

    src = tmp_path / "src"
    src.mkdir()
    n, half = 40_000, 20_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"doc body number {i % half} with some filler text" for i in range(n)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(src / "d.parquet"),
        row_group_size=1_000,
    )
    out = str(tmp_path / "dedup_out")
    code = (
        "import ray; ray.init(address='local', num_cpus=4, include_dashboard=False, logging_level='ERROR')\n"
        "import ray.data as rd\n"
        "from fhirflat_ray.functions.exchange import exact_dedup_to_parquet\n"
        f"ds = rd.read_parquet({str(src)!r})\n"
        f"exact_dedup_to_parquet(ds, {out!r}, num_buckets=24, n_waves=3)\n"
    )
    from tests.test_pipeline import _run_and_kill  # self-import: module path stable

    killed = _run_and_kill(
        code, lambda: len(glob.glob(os.path.join(out, "part-*.parquet"))) >= 3
    )
    durable = {
        p: open(p, "rb").read()
        for p in glob.glob(os.path.join(out, "part-*.parquet"))
    }
    assert os.path.exists(os.path.join(out, "_exchange_plan.json"))

    man = exact_dedup_to_parquet(
        rd.read_parquet(str(src)), out, num_buckets=24, n_waves=3, resume=True
    )
    # pre-kill durable buckets were reused byte-for-byte, not rewritten
    for p, blob in durable.items():
        assert p in man["files_skipped"], p
        assert open(p, "rb").read() == blob, f"durable bucket rewritten: {p}"
    got = (
        pa.concat_tables(
            [pq.read_table(p) for p in sorted(glob.glob(os.path.join(out, "part-*.parquet")))]
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == list(range(half))
    assert killed in (True, False)  # both paths verified either way


def test_validate_cross_fields_rules(ray_session):
    """Row-local cross-field rules (the reference's root_validator family):
    one_of (choice-of-type cardinality, required variant), exclusive
    (ext-1), requires — first-error-wins in rule order, and an existing
    _error (e.g. from validate_schema) takes precedence."""
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.verify import validate_cross_fields, validate_schema

    df = pd.DataFrame(
        {
            "id": [0, 1, 2, 3, 4],
            "v_str": ["a", None, "c", None, "e"],
            "v_num": [1.0, 2.0, None, None, 5.0],
            "unit": [None, "kg", None, None, "kg"],
        }
    )
    rules = [
        {"rule": "one_of", "columns": ["v_str", "v_num"], "required": True},
        {"rule": "requires", "column": "unit", "needs": "v_num"},
    ]
    got = (
        validate_cross_fields(rd.from_pandas(df).repartition(2), rules)
        .to_pandas()
        .sort_values("id")["_error"]
        .tolist()
    )
    assert got == [
        "multiple of ['v_str', 'v_num'] present",
        "",
        "",
        "one of ['v_str', 'v_num'] required",
        "multiple of ['v_str', 'v_num'] present",  # one_of fires before requires
    ]

    # exclusive + schema-error precedence
    marked = validate_schema(
        rd.from_pandas(df), {"id": {"type": "int64", "min": 1}}
    )
    got2 = (
        validate_cross_fields(marked, [{"rule": "exclusive", "columns": ["v_str", "unit"]}])
        .to_pandas()
        .sort_values("id")["_error"]
        .tolist()
    )
    assert got2[0] == "id below min 1"  # schema error wins over cross rule
    assert got2[4] == "['v_str', 'unit'] are mutually exclusive"
    assert got2[1] == got2[2] == got2[3] == ""

    with pytest.raises(ValueError, match="unknown cross-field rule"):
        validate_cross_fields(rd.from_pandas(df), [{"rule": "nope"}]).to_pandas()


def test_validate_max_per_key(ray_session):
    """Per-group cardinality (validate_extension_contents shape): every row
    of a (key, value) combination past max_n is marked, across blocks; an
    existing _error wins."""
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines.verify import validate_max_per_key

    df = pd.DataFrame(
        {
            "rid": list(range(10)),
            "key": ["k1"] * 5 + ["k2"] * 5,
            "cat": ["t", "t", "t", "d", "d", "t", "d", "d", "x", "y"],
        }
    )
    got = (
        validate_max_per_key(
            rd.from_pandas(df).repartition(4), ["key"], "cat", 2, num_buckets=3
        )
        .to_pandas()
        .sort_values("rid")
    )
    msg = "cat appears more than 2x per ['key']"
    # k1 has three 't' rows -> all three marked; everything else fine
    assert got["_error"].tolist() == [msg, msg, msg, "", "", "", "", "", "", ""]


def test_compact_small_segments_size_tiered(ray_session, tmp_path):
    """Size-tiered compaction touches ONLY undersized segments: healthy
    ones keep their bytes (mtime + content), small ones merge into
    target-sized content-addressed segments, the manifest stays COMMITTED
    throughout (never uncommitted), decode is unchanged, and the
    swapped-out files are GC'd. Pending schema evolution is carried, not
    materialized. gc_orphan_segments removes planted strays on entry."""
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.pipelines import evolve as evo
    from fhirflat_ray.pipelines.encode import compact_small_segments
    from fhirflat_ray.pipelines.merge import append_dataset
    from fhirflat_ray.state.lineage import gc_orphan_segments, read_manifest

    src = tmp_path / "src"
    src.mkdir()
    n = 4_000
    df = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "role": ["u", "a"] * (n // 2),
            "v": np.arange(n, dtype=np.float64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(src / "t.parquet"))
    segd = str(tmp_path / "enc")
    enc.encode_files(str(src), segd, sort_keys=("k",), shared_dict_columns=["role"],
                     target_rows=1000)
    # fragmentation: 6 tiny appends of 100 rows each
    extras = []
    for i in range(6):
        e = pd.DataFrame(
            {
                "k": np.arange(n + i * 100, n + (i + 1) * 100, dtype=np.int64),
                "role": ["u"] * 100,
                "v": 0.0,
            }
        )
        extras.append(e)
        append_dataset(segd, rd.from_pandas(e), target_rows=100)
    full = pd.concat([df] + extras, ignore_index=True)
    evo.add_column(segd, "split", "string", "train")  # pending op-log rides along

    from fhirflat_ray.state.lineage import segment_path

    def p_of(r):
        return (
            os.path.join(segd, r["file"])
            if "file" in r
            else segment_path(segd, r["part_id"])
        )

    man0 = read_manifest(segd)
    healthy = {
        p_of(r): os.path.getmtime(p_of(r))
        for r in man0["partitions"]
        if r["n_rows"] >= 500
    }
    n_small = sum(1 for r in man0["partitions"] if r["n_rows"] < 500)
    assert n_small == 6 and len(healthy) >= 1

    # a planted stray (unreferenced copy) must be swept on entry
    some_seg = sorted(glob.glob(os.path.join(segd, "part-*.seg")))[0]
    stray = os.path.join(segd, "part-" + "f" * 16 + ".seg")
    shutil.copy(some_seg, stray)
    removed = gc_orphan_segments(segd)
    assert removed == [stray]

    man1 = compact_small_segments(segd, min_rows=500, target_rows=1000)
    assert man1["compacted_small"] == 6
    assert man1["n_rows"] == len(full)
    # healthy segments untouched byte-for-byte
    for p, mt in healthy.items():
        assert os.path.getmtime(p) == mt, p
    # small files gone; fewer partitions; dir committed; op-log intact
    assert len(glob.glob(os.path.join(segd, "part-*.seg"))) == man1["n_partitions"]
    assert man1["n_partitions"] == len(healthy) + 1  # 600 small rows -> one block
    assert read_manifest(segd) is not None
    assert evo.pending_evolution(segd) == [
        {"op": "add", "name": "split", "dtype": "string", "default": "train"}
    ]
    got = dec.decode_dataset(segd).to_pandas().sort_values("k").reset_index(drop=True)
    exp = full.sort_values("k").reset_index(drop=True)
    exp["split"] = "train"
    assert got[["k", "role", "v"]].equals(exp[["k", "role", "v"]])
    assert (got["split"] == "train").all()

    # idempotent: nothing small remains -> zero bytes moved
    man2 = compact_small_segments(segd, min_rows=500, target_rows=1000)
    assert "compacted_small" not in man2 or man2 is man1 or man2["n_partitions"] == man1["n_partitions"]
