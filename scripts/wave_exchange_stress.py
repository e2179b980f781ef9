"""128M-row stress for the wave-sharded exchanges (functions/exchange.py).

Proves the VERDICT r4 item-1 'done' criterion: exact dedup and a
distributed hash join COMPLETING at 128M rows on this host — the scale
where the one-shot all-to-all measured its abort boundary (BASELINE.md:
29 GB sort vs 37.6 GiB store grew plasma fallback past 200 GB) — with
planted-oracle verification, not just completion.

Inputs are storage-backed parquet (the re-executable-plan contract), built
deterministically:

- dedup corpus: 128M docs, text keyed by ``doc_id % 64M`` → every doc has
  exactly one twin; survivors must be EXACTLY {0..64M-1} (count + id-sum
  checked distributed, never driver-materialized).
- join: 128M-row fact (o_custkey = i % 10M, ~120B payload) × 10M-row dim;
  output must be 128M rows with per-row invariants (c_nationkey ==
  o_custkey % 25) checked vectorized per batch.

Usage: python scripts/wave_exchange_stress.py [--rows N] [--waves W]
Writes scratch under /tmp/wave_stress (removed at the end unless --keep).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def gen_docs(n_rows: int, out: str) -> None:
    import ray.data as rd

    half = n_rows // 2
    filler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore et dolore magna aliqua "

    def make(b: pa.Table) -> pa.Table:
        i = b["id"].combine_chunks().cast(pa.int64())
        j = pc.cast(np.remainder(i.to_numpy(), half), pa.string())
        text = pc.binary_join_element_wise(
            "synthetic document body number ", j, " ", filler, j, ""
        )
        return pa.table({"doc_id": i, "text": text})

    rd.range(n_rows).map_batches(make, batch_format="pyarrow").write_parquet(out)


def gen_join_inputs(n_rows: int, n_dim: int, fact_dir: str, dim_dir: str) -> None:
    import ray.data as rd

    pad = "x" * 100

    def make_fact(b: pa.Table) -> pa.Table:
        i = b["id"].combine_chunks().cast(pa.int64())
        ck = np.remainder(i.to_numpy(), n_dim)
        payload = pc.binary_join_element_wise(
            pad, pc.cast(pc.cast(i, pa.int64()), pa.string()), ""
        )
        return pa.table(
            {
                "o_orderkey": i,
                "o_custkey": pa.array(ck, pa.int64()),
                "o_payload": payload,
            }
        )

    def make_dim(b: pa.Table) -> pa.Table:
        i = b["id"].combine_chunks().cast(pa.int64())
        name = pc.binary_join_element_wise("customer#", pc.cast(i, pa.string()), "")
        nk = np.remainder(i.to_numpy(), 25)
        return pa.table(
            {"c_custkey": i, "c_name": name, "c_nationkey": pa.array(nk, pa.int64())}
        )

    rd.range(n_rows).map_batches(make_fact, batch_format="pyarrow").write_parquet(
        fact_dir
    )
    rd.range(n_dim).map_batches(make_dim, batch_format="pyarrow").write_parquet(dim_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=128_000_000)
    ap.add_argument("--dim-rows", type=int, default=10_000_000)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-dedup", action="store_true")
    ap.add_argument("--skip-join", action="store_true")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)

    from fhirflat_ray.functions.exchange import exact_dedup_to_parquet, hash_join_to_parquet

    base = "/tmp/wave_stress"
    shutil.rmtree(base, ignore_errors=True)
    report: dict = {"rows": args.rows, "waves": args.waves, "buckets": args.buckets,
                    "cpus": args.cpus}

    if not args.skip_dedup:
        docs_dir = os.path.join(base, "docs")
        t0 = time.perf_counter()
        gen_docs(args.rows, docs_dir)
        report["gen_docs_sec"] = round(time.perf_counter() - t0, 1)
        report["docs_bytes"] = sum(
            os.path.getsize(os.path.join(docs_dir, f)) for f in os.listdir(docs_dir)
        )

        out_dir = os.path.join(base, "dedup_out")
        ds = rd.read_parquet(docs_dir)
        t0 = time.perf_counter()
        man = exact_dedup_to_parquet(
            ds, out_dir, column="text", id_column="doc_id",
            num_buckets=args.buckets, n_waves=args.waves,
        )
        report["dedup_sec"] = round(time.perf_counter() - t0, 1)
        report["dedup_files"] = len(man["files_written"])

        # planted-oracle verify, fully distributed: survivors must be
        # EXACTLY {0 .. rows/2 - 1} -> count, min, max, and exact id-sum
        half = args.rows // 2
        surv = rd.read_parquet(out_dir)
        agg = surv.map_batches(
            lambda b: pa.table(
                {
                    "n": pa.array([b.num_rows], pa.int64()),
                    "s": pa.array(
                        [int(b["doc_id"].to_numpy(zero_copy_only=False).sum())],
                        pa.int64(),
                    ),
                    "mx": pa.array(
                        [int(b["doc_id"].to_numpy(zero_copy_only=False).max())],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        n, s, mx = int(agg["n"].sum()), int(agg["s"].sum()), int(agg["mx"].max())
        expect_sum = half * (half - 1) // 2
        report["dedup_survivors"] = n
        report["dedup_exact"] = bool(n == half and s == expect_sum and mx == half - 1)
        assert report["dedup_exact"], (n, half, s, expect_sum, mx)
        shutil.rmtree(docs_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)

    if not args.skip_join:
        fact_dir = os.path.join(base, "fact")
        dim_dir = os.path.join(base, "dim")
        t0 = time.perf_counter()
        gen_join_inputs(args.rows, args.dim_rows, fact_dir, dim_dir)
        report["gen_join_sec"] = round(time.perf_counter() - t0, 1)
        report["fact_bytes"] = sum(
            os.path.getsize(os.path.join(fact_dir, f)) for f in os.listdir(fact_dir)
        )

        out_dir = os.path.join(base, "join_out")
        t0 = time.perf_counter()
        man = hash_join_to_parquet(
            rd.read_parquet(fact_dir),
            rd.read_parquet(dim_dir),
            out_dir,
            on="o_custkey",
            right_on="c_custkey",
            how="inner",
            num_buckets=args.buckets,
            n_waves=args.waves,
        )
        report["join_sec"] = round(time.perf_counter() - t0, 1)
        report["join_files"] = len(man["files_written"])

        # per-row invariants, vectorized per batch; totals folded distributed
        def check(b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].to_numpy(zero_copy_only=False)
            nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
            bad = int((nk != ck % 25).sum())
            return pa.table(
                {
                    "n": pa.array([b.num_rows], pa.int64()),
                    "bad": pa.array([bad], pa.int64()),
                    "okey_sum": pa.array(
                        [int(b["o_orderkey"].to_numpy(zero_copy_only=False).sum())],
                        pa.int64(),
                    ),
                }
            )

        agg = (
            rd.read_parquet(out_dir)
            .map_batches(check, batch_format="pyarrow")
            .to_pandas()
        )
        n, bad, osum = int(agg["n"].sum()), int(agg["bad"].sum()), int(agg["okey_sum"].sum())
        report["join_rows"] = n
        report["join_exact"] = bool(
            n == args.rows and bad == 0 and osum == args.rows * (args.rows - 1) // 2
        )
        assert report["join_exact"], (n, args.rows, bad, osum)
        if not args.keep:
            shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
