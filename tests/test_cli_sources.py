"""CLI subcommand + source reader tests."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fhirflat_ray import fixtures
from fhirflat_ray.__main__ import main as cli_main
from fhirflat_ray.sources import readers


@pytest.fixture(scope="module")
def frag_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clifrags"))
    fixtures.write_transcript_fragments(d, rows=5_000, n_fragments=2, seed=9)
    return d


def test_cli_encode_verify_decode(ray_session, frag_dir, tmp_path, capsys):
    seg = str(tmp_path / "seg")
    out = str(tmp_path / "out")

    assert cli_main(["encode", frag_dir, seg]) == 0
    enc_stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert enc_stats["rows"] == 5_000 and enc_stats["ratio"] > 3

    assert cli_main(["verify", frag_dir, seg]) == 0
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert verdict["equal"]

    assert cli_main(["decode", seg, out]) == 0
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 5_000


def test_ndjson_reader_roundtrip(ray_session, tmp_path):
    t = fixtures.make_transcripts(500, seed=3)
    path = str(tmp_path / "t.ndjson")
    df = t.to_pandas()
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    df.to_json(path, orient="records", lines=True)
    ds = readers.read_ndjson_transcripts(path)
    got = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    got = got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.num_rows == 500
    assert got.schema.names == list(t.schema.names)
    assert got["ts"].to_pylist() == t["ts"].to_pylist()
    assert got["text"].to_pylist() == t["text"].to_pylist()


def test_csv_reader_and_error_writer(ray_session, tmp_path):
    import pandas as pd

    csv = str(tmp_path / "m.csv")
    pd.DataFrame({"raw_variable": ["a", "b"], "raw_response": ["1", "2"]}).to_csv(
        csv, index=False
    )
    ds = readers.read_csv_table(csv, columns=["raw_variable"])
    assert sorted(r["raw_variable"] for r in ds.take_all()) == ["a", "b"]

    errs = str(tmp_path / "errs")
    readers.write_errors_csv(ds, errs)
    assert glob.glob(os.path.join(errs, "*.csv"))


def test_cli_merge_and_delete(ray_session, tmp_path, capsys):
    import numpy as np
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    df = pd.DataFrame(
        {
            "k": np.arange(2000, dtype=np.int64),
            "v": np.arange(2000, dtype=np.float64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), str(src / "t.parquet")
    )
    seg = str(tmp_path / "seg")
    assert cli_main(["encode", str(src), seg, "--sort-keys", "k", "--target-rows", "500"]) == 0
    capsys.readouterr()

    upd = pd.DataFrame({"k": np.arange(0, 2000, 10, dtype=np.int64)})
    upd["v"] = -1.0
    updp = tmp_path / "upd.parquet"
    pq.write_table(pa.Table.from_pandas(upd, preserve_index=False), str(updp))
    assert cli_main(["merge", seg, str(updp), "--key", "k"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["upserted"] == 200 and out["inserted"] == 0

    dels = pd.DataFrame({"k": np.arange(1000, 2000, dtype=np.int64)})
    delp = tmp_path / "dels.parquet"
    pq.write_table(pa.Table.from_pandas(dels, preserve_index=False), str(delp))
    assert cli_main(["delete", seg, str(delp), "--key", "k"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"] == 1000 and out["rows"] == 1000

    dec_out = str(tmp_path / "out")
    assert cli_main(["decode", seg, dec_out]) == 0
    got = pq.read_table(dec_out).to_pandas().sort_values("k").reset_index(drop=True)
    exp = df[df.k < 1000].copy().reset_index(drop=True)
    exp.loc[exp.k % 10 == 0, "v"] = -1.0
    assert got.equals(exp)


def test_cli_snapshot_and_vacuum(ray_session, tmp_path, capsys):
    import numpy as np
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64), "role": ["u", "a"] * 250})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(src / "t.parquet"))
    seg = str(tmp_path / "seg")
    assert cli_main(["encode", str(src), seg, "--sort-keys", "k"]) == 0
    capsys.readouterr()

    assert cli_main(["snapshot", seg, "--note", "first"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["version"] == 1 and rec["note"] == "first"

    assert cli_main(["snapshot", seg, "--list"]) == 0
    lst = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [s["version"] for s in lst] == [1]

    assert cli_main(["vacuum", seg]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed"] == []  # nothing orphaned on a fresh encode
    assert out["orphan_segments_removed"] == []

    # a stray unreferenced segment file is swept by vacuum
    import shutil as _sh

    seg0 = sorted(glob.glob(os.path.join(seg, "part-*.seg")))[0]
    stray = os.path.join(seg, "part-" + "e" * 16 + ".seg")
    _sh.copy(seg0, stray)
    assert cli_main(["vacuum", seg]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["orphan_segments_removed"] == [stray]
    assert not os.path.exists(stray)

    assert cli_main(["snapshot", seg, "--drop", "1"]) == 0
    capsys.readouterr()
    assert cli_main(["snapshot", seg, "--list"]) == 0
    lst2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert lst2 == []


def test_cli_archive_roundtrip(ray_session, frag_dir, tmp_path, capsys):
    """S8 parity (reference ingest.py:599-601, 618-621): ``encode
    --compress`` archives the segment dir and removes it; the archive file
    then feeds stats/verify/decode directly via transparent unpack."""
    seg = str(tmp_path / "aseg")
    out = str(tmp_path / "aout")

    assert cli_main(["encode", frag_dir, seg, "--compress", "gztar"]) == 0
    enc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    archive = enc["archive"]
    assert archive.endswith(".tar.gz") and os.path.isfile(archive)
    assert not os.path.exists(seg)  # source dir removed, as the reference does

    # stats reads the manifest straight from the archive
    assert cli_main(["stats", archive]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["rows"] == 5_000

    # verify + decode round-trip through the unpacked sibling dir
    assert cli_main(["verify", frag_dir, archive]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["equal"]
    assert cli_main(["decode", archive, out]) == 0
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert sum(pq.read_metadata(f).num_rows for f in files) == 5_000


def test_archive_helpers(tmp_path):
    from fhirflat_ray.sources.archive import (
        compress_dir,
        is_archive,
        maybe_unpack,
        strip_archive_suffix,
    )

    d = tmp_path / "bundle"
    d.mkdir()
    (d / "x.txt").write_text("hello")
    arc = compress_dir(str(d), "zip")
    assert arc.endswith(".zip") and not d.exists()
    assert is_archive(arc) and not is_archive(str(tmp_path))
    assert strip_archive_suffix("a/b.tar.gz") == "a/b"
    assert strip_archive_suffix("a/b.tgz") == "a/b"
    got = maybe_unpack(arc)
    assert got == str(d) and (d / "x.txt").read_text() == "hello"
    # idempotent: second call re-uses the marker-stamped extraction
    assert maybe_unpack(arc) == str(d)
    # a REGENERATED archive re-extracts instead of serving stale contents
    import time

    (d / "x.txt").write_text("old")
    d2 = tmp_path / "bundle2"
    d2.mkdir()
    (d2 / "x.txt").write_text("new")
    import shutil as _sh

    _sh.make_archive(str(tmp_path / "bundle"), "zip", str(d2))
    ts = time.time() + 2
    os.utime(arc, (ts, ts))  # ensure the size/mtime token differs
    assert maybe_unpack(arc) == str(d)
    assert (d / "x.txt").read_text() == "new"
    # a foreign (marker-less, non-empty) dir at the target is never destroyed
    _sh.rmtree(d)
    d.mkdir()
    (d / "precious.txt").write_text("keep me")
    with pytest.raises(FileExistsError):
        maybe_unpack(arc)
    assert (d / "precious.txt").read_text() == "keep me"
    _sh.rmtree(d)
    # non-archive paths pass through untouched
    assert maybe_unpack(str(d2)) == str(d2)
    with pytest.raises(ValueError):
        compress_dir(str(tmp_path / "none"), "rar")


# ---------------------------------------------------------------------------
# S4 remote mapping fetch (sources/remote.py)
# ---------------------------------------------------------------------------

_INDEX_CSV = "Resources,Resource Type,Sheet ID\npatient,one-to-one,111\nencounter,one-to-many,222\n"
_PATIENT_CSV = (
    "raw_variable,raw_response,target_column,expr\n"
    "sex,female,gender,f\nsex,male,gender,m\n"
)
_ENCOUNTER_CSV = (
    "raw_variable,raw_response,target_column,expr\n"
    "adm_date,,period.start.date,<FIELD>\n"
)


def _write_local_pack(tmp_path):
    d = tmp_path / "pack"
    d.mkdir()
    (d / "index.csv").write_text(_INDEX_CSV)
    (d / "111").write_text(_PATIENT_CSV)
    (d / "222").write_text(_ENCOUNTER_CSV)
    return d


def test_sheet_export_url_matches_reference_shape():
    """URL construction mirrors /root/reference/fhirflat/ingest.py:496-507."""
    from fhirflat_ray.sources import remote

    assert (
        remote.sheet_export_url("ABC123")
        == "https://docs.google.com/spreadsheets/d/ABC123/export?format=csv"
    )
    assert remote.sheet_export_url("ABC123", gid=42).endswith("format=csv&gid=42")


def test_fetch_mappings_local_pack(tmp_path):
    from fhirflat_ray.sources import remote

    pack = _write_local_pack(tmp_path)
    mappings, types = remote.fetch_mappings(index_source=str(pack / "index.csv"))
    assert types == {"patient": "one-to-one", "encounter": "one-to-many"}
    assert sorted(mappings) == ["encounter", "patient"]
    assert mappings["patient"]["target_column"].tolist() == ["gender", "gender"]
    # file:// URL goes through the same sibling-file resolution
    m2, t2 = remote.fetch_mappings(index_source=f"file://{pack / 'index.csv'}")
    assert t2 == types and m2["encounter"].equals(mappings["encounter"])


def test_fetch_mappings_http_loopback(tmp_path):
    """A loopback HTTP server standing in for the Sheets export endpoint:
    the index at ?format=csv, each tab at &gid=N — the exact URL shapes
    the reference requests."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    from fhirflat_ray.sources import remote

    tabs = {None: _INDEX_CSV, "111": _PATIENT_CSV, "222": _ENCOUNTER_CSV}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            gid = q.get("gid", [None])[0]
            body = tabs[gid].encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/export?format=csv"
        mappings, types = remote.fetch_mappings(index_source=url)
        assert types == {"patient": "one-to-one", "encounter": "one-to-many"}
        assert mappings["patient"]["raw_response"].tolist() == ["female", "male"]
        assert mappings["encounter"]["target_column"].tolist() == ["period.start.date"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_fetch_mappings_errors(tmp_path):
    from fhirflat_ray.sources import remote

    with pytest.raises(TypeError, match="exactly one"):
        remote.fetch_mappings()
    with pytest.raises(TypeError, match="exactly one"):
        remote.fetch_mappings("SHEET", index_source="x.csv")
    with pytest.raises(remote.MappingFetchError, match="could not read"):
        remote.fetch_mappings(index_source=str(tmp_path / "missing.csv"))
    # unreachable host → MappingFetchError with the no-network hint
    with pytest.raises(remote.MappingFetchError, match="could not fetch"):
        remote.fetch_bytes("http://invalid.invalid/export?format=csv", timeout=2.0)
    # malformed index: missing required columns
    bad = tmp_path / "bad.csv"
    bad.write_text("Resources,Wrong\nx,y\n")
    with pytest.raises(remote.MappingFetchError, match="Resource Type"):
        remote.fetch_mapping_index(str(bad))
    # missing the Resources key column itself -> same error contract,
    # not a raw pandas ValueError
    bad2 = tmp_path / "bad2.csv"
    bad2.write_text("Resource,Resource Type,Sheet ID\nx,one-to-one,1\n")
    with pytest.raises(remote.MappingFetchError, match="Resources"):
        remote.fetch_mapping_index(str(bad2))
    # duplicate resource rows are rejected, not silently collapsed
    dup = tmp_path / "dup.csv"
    dup.write_text(
        "Resources,Resource Type,Sheet ID\npatient,one-to-one,1\npatient,one-to-many,2\n"
    )
    with pytest.raises(remote.MappingFetchError, match="more than once"):
        remote.fetch_mapping_index(str(dup))
    # path traversal via index values must not escape the pack directory
    evil = tmp_path / "evil" ; evil.mkdir()
    (evil / "index.csv").write_text(
        "Resources,Resource Type,Sheet ID\npatient,one-to-one,../outside\n"
    )
    with pytest.raises(remote.MappingFetchError, match="not a safe filename"):
        remote.fetch_mappings(index_source=str(evil / "index.csv"))
    (evil / "index.csv").write_text(
        "Resources,Resource Type,Sheet ID\n../../escape,one-to-one,111\n"
    )
    (evil / "111").write_text("raw_variable,raw_response,target_column,expr\na,b,c,d\n")
    with pytest.raises(remote.MappingFetchError, match="not a safe filename"):
        remote.download_mapping_pack(str(tmp_path / "evil_out"), index_source=str(evil / "index.csv"))


def test_download_mapping_pack_and_cli(tmp_path, capsys):
    from fhirflat_ray.sources import remote

    pack = _write_local_pack(tmp_path)
    dest = tmp_path / "fetched"
    paths = remote.download_mapping_pack(str(dest), index_source=str(pack / "index.csv"))
    assert sorted(paths) == ["encounter", "patient"]
    types = json.loads((dest / "types.json").read_text())
    assert types["patient"] == "one-to-one"
    # written CSVs are byte-stable re-parses of the tabs
    import pandas as pd

    again = pd.read_csv(paths["patient"])
    assert again["expr"].tolist() == ["f", "m"]
    # re-running overwrites atomically, no error, same content
    paths2 = remote.download_mapping_pack(str(dest), index_source=str(pack / "index.csv"))
    assert paths2 == paths

    dest2 = tmp_path / "fetched_cli"
    assert cli_main(["fetch-mappings", str(dest2), "--index", str(pack / "index.csv")]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["resources"] == ["encounter", "patient"]
    assert (dest2 / "types.json").exists()


def test_fetched_pack_drives_mapping_engine(ray_session, tmp_path):
    """End-to-end S4→M17: a fetched mapping tab feeds apply_mapping_long
    unchanged — fetched and hand-authored packs are indistinguishable."""
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.functions import mapping_dsl as dsl
    from fhirflat_ray.sources import remote

    pack = _write_local_pack(tmp_path)
    mappings, _types = remote.fetch_mappings(index_source=str(pack / "index.csv"))
    mapping = mappings["patient"].astype(object).where(pd.notna(mappings["patient"]), None)
    raw = pa.table(
        {"rid": pa.array([1, 2], pa.int64()), "sex": ["female", "male"]}
    )
    assigns = dsl.apply_mapping_long(rd.from_arrow(raw), mapping, "rid", ["sex"])
    wide = dsl.pivot_assignments(assigns, "rid").to_pandas().sort_values("rid")
    assert wide["gender"].tolist() == ["f", "m"]


def test_encode_folder_roundtrip_and_validate(ray_session, frag_dir, tmp_path, capsys):
    """Folder-of-tables contract (reference ingest.py:397-432): one segment
    dir per table, ONE folder metadata whose checksum is the sha256 of the
    per-table checksum text; decode_folder roundtrips every table;
    validate_folder (shallow + deep) passes, and detects both a missing
    segment and in-body bit rot."""
    import hashlib
    import shutil

    import numpy as np
    import pandas as pd

    from fhirflat_ray.pipelines.folder import (
        CHECKSUMS_FILE,
        FOLDER_META,
        decode_folder,
        encode_folder,
        read_folder_metadata,
        validate_folder,
    )

    # second table: events-ish parquet
    ev_src = tmp_path / "ev_src"
    ev_src.mkdir()
    ev = pd.DataFrame(
        {
            "event_id": np.arange(2_000, dtype=np.int64),
            "user_id": np.arange(2_000, dtype=np.int64) % 37,
            "value": np.linspace(0, 1, 2_000),
        }
    )
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), str(ev_src / "e.parquet"))

    out = str(tmp_path / "folder")
    meta = encode_folder(
        {"transcripts": frag_dir, "events": str(ev_src)},
        out,
        primary="transcripts",
        id_column="conv_id",
        target_rows=1_000,
    )
    assert set(meta["tables"]) == {"transcripts", "events"}
    assert meta["tables"]["events"]["n_rows"] == 2_000
    assert isinstance(meta["N"], int) and meta["N"] > 0
    assert os.path.exists(os.path.join(out, FOLDER_META))
    # folder checksum == sha256 of the reference-layout checksum text
    text = open(os.path.join(out, CHECKSUMS_FILE)).read()
    assert meta["checksum"] == hashlib.sha256(text.encode()).hexdigest()
    lines = dict(
        (ln.split("  ", 1)[1], ln.split("  ", 1)[0]) for ln in text.splitlines()
    )
    assert lines["events"] == meta["tables"]["events"]["checksum"]

    # roundtrip every table
    tabs = decode_folder(out)
    got_ev = tabs["events"].to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got_ev.equals(ev)
    assert tabs["transcripts"].count() == 5_000
    # N matches a direct distinct count
    n_direct = tabs["transcripts"].to_pandas()["conv_id"].nunique()
    assert meta["N"] == n_direct

    # validate: shallow + deep green
    rep = validate_folder(out)
    assert rep["ok"] and rep["checksum"] == meta["checksum"]
    rep = validate_folder(out, deep=True)
    assert rep["ok"] and all(t["ok"] for t in rep["tables"].values())

    # CLI over the folder
    assert cli_main(["validate-folder", out]) == 0
    cli_rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cli_rep["ok"]

    # tamper 1: remove one segment -> shallow validate fails
    broken = str(tmp_path / "broken")
    shutil.copytree(out, broken)
    segs = sorted(glob.glob(os.path.join(broken, "events", "part-*.seg")))
    os.remove(segs[0])
    # refold the table manifest (uncommit first so the lineage scan globs
    # the surviving files) so only the FOLDER metadata can catch it
    from fhirflat_ray.state import lineage as lin

    bdir = os.path.join(broken, "events")
    lin.uncommit_manifest(bdir)
    lin.write_manifest(bdir, lin.collect_lineage(bdir))
    rep = validate_folder(broken)
    assert not rep["ok"] and not rep["tables"]["events"]["ok"]
    assert cli_main(["validate-folder", broken]) == 1
    capsys.readouterr()

    # tamper 2: flip payload bytes (headers intact) -> deep validate fails
    broken2 = str(tmp_path / "broken2")
    shutil.copytree(out, broken2)
    seg_path = sorted(glob.glob(os.path.join(broken2, "events", "part-*.seg")))[0]
    data = bytearray(open(seg_path, "rb").read())
    data[-3] ^= 0xFF  # inside the last column's payload
    open(seg_path, "wb").write(bytes(data))
    assert validate_folder(broken2)["ok"]  # shallow trusts headers
    assert not validate_folder(broken2, deep=True)["ok"]


def test_cli_encode_folder(ray_session, frag_dir, tmp_path, capsys):
    out = str(tmp_path / "cli_folder")
    rc = cli_main(
        [
            "encode-folder",
            out,
            f"transcripts={frag_dir}",
            "--primary",
            "transcripts",
            "--target-rows",
            "2000",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["tables"]["transcripts"] == 5_000 and rep["N"] > 0
    assert cli_main(["validate-folder", out, "--deep"]) == 0


def test_parse_predicate_in_syntax(tmp_path):
    """CLI predicate grammar: 'col in v1|v2' → is_in conjunct with coerced
    values; mixes with range ops; bad conjuncts still raise."""
    import datetime as dt

    from fhirflat_ray.pipelines.decode import parse_predicate

    got = parse_predicate("ts>=2024-01-22,tag in click|signup,v<10")
    assert got[0] == ("ts", ">=", dt.datetime(2024, 1, 22))
    assert got[1] == ("tag", "is_in", ["click", "signup"])
    assert got[2] == ("v", "<", 10)
    assert parse_predicate("k in 1|2|3") == [("k", "is_in", [1, 2, 3])]
    with pytest.raises(ValueError, match="bad predicate"):
        parse_predicate("k ~~ 3")


def test_encode_folder_resume_skips_done_tables(ray_session, frag_dir, tmp_path):
    """encode_folder(resume=True) re-runs without re-encoding durable
    partitions (encode_files' resume contract per table) and reproduces
    identical folder metadata."""
    from fhirflat_ray.pipelines.folder import encode_folder

    out = str(tmp_path / "rf")
    meta1 = encode_folder({"transcripts": frag_dir}, out, target_rows=2_000)
    segs = sorted(glob.glob(os.path.join(out, "transcripts", "part-*.seg")))
    mtimes = {p: os.path.getmtime(p) for p in segs}
    meta2 = encode_folder({"transcripts": frag_dir}, out, resume=True, target_rows=2_000)
    assert meta2["checksum"] == meta1["checksum"]
    for p, mt in mtimes.items():
        assert os.path.getmtime(p) == mt, f"segment re-encoded: {p}"
