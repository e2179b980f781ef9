"""CLI: ``python -m fhirflat_ray {encode,decode,verify,bench} ...``

The subcommand surface mirrors the reference's ``fhirflat transform`` /
``fhirflat validate`` CLI (/root/reference/fhirflat/__main__.py:7-32)
re-expressed for the encode engine; runnable under ``ray job submit``.
The CLI owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


_OWNS_SESSION = False


def _init_ray(num_cpus: int | None) -> None:
    global _OWNS_SESSION
    from fhirflat_ray.pipelines.encode import tune_session_memory_env

    tune_session_memory_env()
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        _OWNS_SESSION = True


def cmd_encode(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from fhirflat_ray.pipelines.encode import encode_files

    kwargs = {}
    if args.sort_keys is not None:  # "" → unsorted; default keeps ORDER_KEY
        kwargs["sort_keys"] = (
            tuple(args.sort_keys.split(",")) if args.sort_keys else None
        )
    manifest = encode_files(
        args.input,
        args.output,
        resume=args.resume,
        shared_dict_columns=args.shared_dicts.split(",") if args.shared_dicts else None,
        target_rows=args.target_rows,
        **kwargs,
    )
    out = {
        "partitions": manifest["n_partitions"],
        "rows": manifest["n_rows"],
        "raw_bytes": manifest["raw_bytes"],
        "encoded_bytes": manifest["encoded_bytes"],
        "ratio": round(manifest["raw_bytes"] / max(1, manifest["encoded_bytes"]), 2),
        "checksum": manifest["checksum_of_checksums"],
    }
    if args.compress:
        # reference ingest.py:599-601: archive the output folder, drop the dir
        from fhirflat_ray.sources.archive import compress_dir

        out["archive"] = compress_dir(args.output, args.compress)
    print(json.dumps(out))
    return 0


def cmd_encode_folder(args: argparse.Namespace) -> int:
    """Multi-table folder encode: the reference's unit of output is a
    folder of per-resource tables with ONE metadata/checksum file
    (/root/reference/fhirflat/ingest.py:397-432,543-560) — here one
    segment dir per table plus folder_metadata.json / sha256sums.txt."""
    _init_ray(args.num_cpus)
    from fhirflat_ray.pipelines.folder import encode_folder

    inputs: dict[str, str] = {}
    for spec in args.tables:
        if "=" not in spec:
            raise SystemExit(f"table spec {spec!r} must be name=path")
        name, path = spec.split("=", 1)
        inputs[name] = path
    meta = encode_folder(
        inputs,
        args.output,
        primary=args.primary,
        id_column=args.id_column,
        resume=args.resume,
        target_rows=args.target_rows,
    )
    print(json.dumps({"N": meta["N"], "checksum": meta["checksum"],
                      "tables": {k: v["n_rows"] for k, v in meta["tables"].items()}}))
    return 0


def cmd_validate_folder(args: argparse.Namespace) -> int:
    """Folder integrity check vs the recorded metadata (checksum-of-
    checksums per table and across tables; --deep re-reads payloads with
    per-column sha256 verification)."""
    if args.deep:
        _init_ray(args.num_cpus)
    from fhirflat_ray.pipelines.folder import validate_folder

    report = validate_folder(args.folder, deep=args.deep)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


def cmd_decode(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from fhirflat_ray.pipelines.decode import decode_to_parquet, parse_predicate
    from fhirflat_ray.sources.archive import maybe_unpack

    decode_to_parquet(
        maybe_unpack(args.input),
        args.output,
        columns=args.columns.split(",") if args.columns else None,
        predicate=parse_predicate(args.where) if args.where else None,
    )
    print(json.dumps({"decoded_to": args.output}))
    return 0


def cmd_verify(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fhirflat_ray.pipelines.decode import decode_dataset
    from fhirflat_ray.pipelines.verify import verify_roundtrip

    from fhirflat_ray.sources.archive import maybe_unpack

    verdict = verify_roundtrip(
        rd.read_parquet(args.source), decode_dataset(maybe_unpack(args.segments))
    )
    print(json.dumps(verdict))
    return 0 if verdict["equal"] else 1


def cmd_stats(args: argparse.Namespace) -> int:
    from collections import Counter

    from fhirflat_ray.sources.archive import maybe_unpack
    from fhirflat_ray.state.lineage import read_manifest

    m = read_manifest(maybe_unpack(args.segments))
    if m is None:
        print(json.dumps({"error": f"no manifest under {args.segments}"}))
        return 1
    codec_counts: Counter[str] = Counter()
    for p in m["partitions"]:
        for col, codec in p.get("codecs", {}).items():
            codec_counts[f"{col}:{codec}"] += 1
    print(
        json.dumps(
            {
                "partitions": m["n_partitions"],
                "rows": m["n_rows"],
                "raw_bytes": m["raw_bytes"],
                "encoded_bytes": m["encoded_bytes"],
                "ratio": round(m["raw_bytes"] / max(1, m["encoded_bytes"]), 2),
                "checksum": m["checksum_of_checksums"],
                "codecs": dict(sorted(codec_counts.items())),
                "shared_dicts": m.get("shared_dicts", {}),
            }
        )
    )
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from fhirflat_ray.pipelines.encode import compact_segments

    m = compact_segments(args.segments, args.output, target_rows=args.target_rows)
    print(
        json.dumps(
            {
                "partitions": m["n_partitions"],
                "rows": m["n_rows"],
                "encoded_bytes": m["encoded_bytes"],
            }
        )
    )
    return 0


def cmd_compact_small(args: argparse.Namespace) -> int:
    """Size-tiered in-place compaction: rewrite only undersized segments;
    the manifest swap is the commit (readers stay consistent throughout)."""
    _init_ray(args.num_cpus)
    from fhirflat_ray.pipelines.encode import compact_small_segments

    m = compact_small_segments(
        args.segments, min_rows=args.min_rows, target_rows=args.target_rows
    )
    print(
        json.dumps(
            {
                "partitions": m["n_partitions"],
                "rows": m["n_rows"],
                "compacted_small": m.get("compacted_small", 0),
            }
        )
    )
    return 0


def cmd_merge(args: argparse.Namespace) -> int:
    """Zone-routed upsert of a parquet update set into an encoded dir."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import merge_upsert

    updates = rd.read_parquet(args.updates)
    m = merge_upsert(args.segments, updates, args.key)
    print(
        json.dumps(
            {
                "upserted": m["upserted"],
                "inserted": m["inserted"],
                "rows": m["n_rows"],
                "partitions": m["n_partitions"],
            }
        )
    )
    return 0


def cmd_delete(args: argparse.Namespace) -> int:
    """Zone-routed delete of a parquet key set from an encoded dir."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fhirflat_ray.pipelines.merge import merge_delete

    keys = rd.read_parquet(args.keys, columns=[args.key])
    m = merge_delete(args.segments, keys, args.key)
    print(
        json.dumps(
            {
                "deleted": m["deleted"],
                "rows": m["n_rows"],
                "partitions": m["n_partitions"],
            }
        )
    )
    return 0


def cmd_snapshot(args: argparse.Namespace) -> int:
    """Freeze / list / drop zero-copy snapshots of an encoded dir."""
    from fhirflat_ray.pipelines import snapshots as snap

    if args.drop is not None:
        snap.drop_snapshot(args.segments, args.drop)
        print(json.dumps({"dropped": args.drop}))
    elif args.list:
        print(json.dumps(snap.list_snapshots(args.segments)))
    else:
        print(json.dumps(snap.create_snapshot(args.segments, note=args.note)))
    return 0


def cmd_fetch_mappings(args: argparse.Namespace) -> int:
    """Download a mapping pack (SURVEY S4) — the `convert_data_to_flat(
    sheet_id=…)` fetch (/root/reference/fhirflat/ingest.py:496-507) as a
    standalone step writing {resource}.csv + types.json into --dest."""
    from fhirflat_ray.sources.remote import download_mapping_pack

    paths = download_mapping_pack(
        args.dest,
        args.sheet_id,
        index_source=args.index,
        timeout=args.timeout,
    )
    print(json.dumps({"dest": args.dest, "resources": sorted(paths)}))
    return 0


def cmd_vacuum(args: argparse.Namespace) -> int:
    """Garbage-collect unreferenced shared-dictionary files and (on
    committed dirs) segment files the manifest does not reference —
    leftovers of a compaction that crashed between its manifest commit
    and its GC, or of an orphaned worker's late write."""
    from fhirflat_ray.state import lineage as lin

    out = lin.vacuum_dict_store(args.segments)
    out["orphan_segments_removed"] = lin.gc_orphan_segments(args.segments)
    print(json.dumps(out))
    return 0


def cmd_validate(args: argparse.Namespace) -> int:
    """Valid/error routing over parquet or encoded segments — the engine's
    `fhirflat validate` (/root/reference/fhirflat/ingest.py:658-742): rows
    violating the transcript contract (key integrity) and the typed schema
    spec go to an errors table instead of failing the job."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fhirflat_ray.pipelines.verify import (
        TRANSCRIPT_SCHEMA_SPEC,
        split_valid,
        validate_schema,
        validate_transcripts,
    )

    from fhirflat_ray.sources.archive import maybe_unpack

    # reference ingest.py:618-621: a compressed file input unpacks next to
    # itself before validation
    inp = maybe_unpack(args.input)
    if os.path.isdir(inp) and any(f.endswith(".seg") for f in os.listdir(inp)):
        from fhirflat_ray.pipelines.decode import decode_dataset

        ds = decode_dataset(inp)
    else:
        ds = rd.read_parquet(inp)

    spec = TRANSCRIPT_SCHEMA_SPEC
    if args.spec:
        with open(args.spec) as f:
            spec = json.load(f)
    marked = validate_schema(ds, spec)
    if not args.schema_only:
        # key-contract validation (null/duplicate (conv_id, turn_idx))
        # composes after the typed schema pass; rows already marked keep
        # their first error
        marked = validate_transcripts(marked)
    valid, errors = split_valid(marked)
    n_err = errors.count()
    if args.errors_out:
        errors.write_parquet(args.errors_out)
    if args.valid_out:
        valid.write_parquet(args.valid_out)
    print(json.dumps({"valid_rows": valid.count(), "error_rows": n_err}))
    return 0 if n_err == 0 or args.errors_out else 1


def cmd_bench(args: argparse.Namespace) -> int:
    # delegate to the repo-root bench harness (one JSON line contract)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    import bench

    print(json.dumps(bench.run_scaling() if args.scaling else bench.run_bench()))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="fhirflat_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode", help="parquet → encoded segments + manifest")
    pe.add_argument("input")
    pe.add_argument("output")
    pe.add_argument("--resume", action="store_true")
    pe.add_argument("--shared-dicts", default="role,tool")
    pe.add_argument("--target-rows", type=int, default=None)
    pe.add_argument(
        "--sort-keys",
        default=None,
        help="comma-separated segment sort keys ('' = unsorted; default: transcript order key)",
    )
    pe.add_argument(
        "--compress",
        default=None,
        choices=("zip", "tar", "gztar", "bztar", "xztar"),
        help="archive the output dir and remove it (small exports only; "
        "the 100TB path stays directory-of-segments)",
    )
    pe.set_defaults(fn=cmd_encode)

    pef = sub.add_parser(
        "encode-folder",
        help="multi-table folder encode: one segment dir per table + one "
        "folder-level metadata/checksum file (reference ingest folder shape)",
    )
    pef.add_argument("output")
    pef.add_argument("tables", nargs="+", help="name=path pairs")
    pef.add_argument("--primary", default=None, help="table for the N distinct-id count")
    pef.add_argument("--id-column", default="conv_id")
    pef.add_argument("--resume", action="store_true")
    pef.add_argument("--target-rows", type=int, default=None)
    pef.set_defaults(fn=cmd_encode_folder)

    pvf = sub.add_parser(
        "validate-folder",
        help="verify a folder against its metadata (checksum-of-checksums; "
        "--deep re-reads payloads with per-column sha256 checks)",
    )
    pvf.add_argument("folder")
    pvf.add_argument("--deep", action="store_true")
    pvf.set_defaults(fn=cmd_validate_folder)

    pd_ = sub.add_parser("decode", help="encoded segments → parquet")
    pd_.add_argument("input")
    pd_.add_argument("output")
    pd_.add_argument("--columns", default=None)
    pd_.add_argument(
        "--where",
        default=None,
        help="zone-map pruned scan: conjuncts like 'ts>=2024-01-22,v<10,"
        "tag in a|b' (string ==/in evaluate on dict code streams)",
    )
    pd_.set_defaults(fn=cmd_decode)

    pv = sub.add_parser("verify", help="decoded == source round-trip check")
    pv.add_argument("source")
    pv.add_argument("segments")
    pv.set_defaults(fn=cmd_verify)

    ps = sub.add_parser("stats", help="summarize a segment dir's manifest")
    ps.add_argument("segments")
    ps.set_defaults(fn=cmd_stats)

    pc_ = sub.add_parser("compact", help="merge small segments into larger ones")
    pc_.add_argument("segments")
    pc_.add_argument("output")
    pc_.add_argument("--target-rows", type=int, default=512 * 1024)
    pc_.set_defaults(fn=cmd_compact)

    pcs = sub.add_parser(
        "compact-small",
        help="size-tiered in-place compaction: rewrite only undersized "
        "segments (manifest swap = commit; healthy segments untouched)",
    )
    pcs.add_argument("segments")
    pcs.add_argument("--min-rows", type=int, default=None)
    pcs.add_argument("--target-rows", type=int, default=None)
    pcs.set_defaults(fn=cmd_compact_small)

    pm = sub.add_parser("merge", help="upsert parquet rows into encoded segments by key")
    pm.add_argument("segments", help="encoded segment dir")
    pm.add_argument("updates", help="parquet file/dir of update rows (base schema)")
    pm.add_argument("--key", required=True, help="unique integer key column")
    pm.set_defaults(fn=cmd_merge)

    pdl = sub.add_parser("delete", help="delete keys from encoded segments")
    pdl.add_argument("segments", help="encoded segment dir")
    pdl.add_argument("keys", help="parquet file/dir holding the key column")
    pdl.add_argument("--key", required=True, help="unique integer key column")
    pdl.set_defaults(fn=cmd_delete)

    psn = sub.add_parser("snapshot", help="freeze/list/drop zero-copy table snapshots")
    psn.add_argument("segments", help="encoded segment dir")
    psn.add_argument("--list", action="store_true")
    psn.add_argument("--drop", type=int, default=None, help="snapshot version to release")
    psn.add_argument("--note", default=None)
    psn.set_defaults(fn=cmd_snapshot)

    pfm = sub.add_parser(
        "fetch-mappings",
        help="download a mapping pack (Google-Sheet id, URL, or local index CSV)",
    )
    pfm.add_argument("dest", help="directory for {resource}.csv + types.json")
    pfm_src = pfm.add_mutually_exclusive_group(required=True)
    pfm_src.add_argument("--sheet-id", default=None, help="Google Sheets document id")
    pfm_src.add_argument(
        "--index", default=None, help="index CSV URL or local path (alternative to --sheet-id)"
    )
    pfm.add_argument("--timeout", type=float, default=30.0)
    pfm.set_defaults(fn=cmd_fetch_mappings)

    pvc = sub.add_parser("vacuum", help="GC shared-dict files no live segment references")
    pvc.add_argument("segments", help="encoded segment dir")
    pvc.set_defaults(fn=cmd_vacuum)

    pval = sub.add_parser(
        "validate", help="typed schema + key-contract validation → valid/error split"
    )
    pval.add_argument("input", help="parquet path/dir or encoded segment dir")
    pval.add_argument("--spec", default=None, help="JSON schema-spec file (default: transcript contract)")
    pval.add_argument("--schema-only", action="store_true", help="skip conv/turn key-contract checks")
    pval.add_argument("--valid-out", default=None)
    pval.add_argument("--errors-out", default=None)
    pval.set_defaults(fn=cmd_validate)

    pb = sub.add_parser("bench", help="run the benchmark harness")
    pb.add_argument("--scaling", action="store_true")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if _OWNS_SESSION and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
