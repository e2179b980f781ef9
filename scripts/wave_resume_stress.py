"""SIGKILL + resume proof for the wave exchange at the 128M-row scale.

Runs the same planted-oracle dedup as ``wave_exchange_stress`` but KILLS
the job mid-exchange (once roughly half the bucket files are durable),
then resumes with ``resume=True`` and verifies: (a) every pre-kill durable
bucket is reused (skipped, byte-identical), (b) the survivors are still
EXACTLY the planted set, (c) the completion marker lands. The at-scale
form of ``test_wave_dedup_killed_midrun_resumes_exact``.

Usage: python scripts/wave_resume_stress.py [--rows 128000000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=128_000_000)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--kill-at", type=int, default=None, help="bucket files before SIGKILL")
    args = ap.parse_args()
    kill_at = args.kill_at or args.buckets // 2

    base = "/tmp/wave_resume_stress"
    shutil.rmtree(base, ignore_errors=True)
    docs_dir = os.path.join(base, "docs")
    out_dir = os.path.join(base, "out")

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from scripts.wave_exchange_stress import gen_docs

    t0 = time.perf_counter()
    gen_docs(args.rows, docs_dir)
    gen_sec = round(time.perf_counter() - t0, 1)
    ray.shutdown()

    code = (
        "import ray; ray.init(address='local', num_cpus="
        f"{args.cpus}, include_dashboard=False, logging_level='ERROR')\n"
        "import ray.data as rd\n"
        "from fhirflat_ray.functions.exchange import exact_dedup_to_parquet\n"
        f"ds = rd.read_parquet({docs_dir!r})\n"
        f"exact_dedup_to_parquet(ds, {out_dir!r}, num_buckets={args.buckets}, "
        f"n_waves={args.waves})\n"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    killed = False
    deadline = time.time() + 900
    while time.time() < deadline and proc.poll() is None:
        if len(glob.glob(os.path.join(out_dir, "part-*.parquet"))) >= kill_at:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
            killed = True
            break
        time.sleep(0.25)
    if proc.poll() is None:
        proc.kill()
        proc.wait(timeout=60)
    first_sec = round(time.perf_counter() - t0, 1)
    # let orphaned Ray workers finish their in-flight atomic writes/exit
    time.sleep(5)
    subprocess.run(["pkill", "-9", "-f", "raylet"], check=False)
    time.sleep(3)
    durable = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from fhirflat_ray.functions.exchange import exact_dedup_to_parquet

    t0 = time.perf_counter()
    man = exact_dedup_to_parquet(
        rd.read_parquet(docs_dir), out_dir,
        num_buckets=args.buckets, n_waves=args.waves, resume=True,
    )
    resume_sec = round(time.perf_counter() - t0, 1)
    skipped = set(man["files_skipped"])
    reused = [p for p in durable if p in skipped]

    half = args.rows // 2
    surv = rd.read_parquet(sorted(glob.glob(os.path.join(out_dir, "part-*.parquet"))))
    agg = surv.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "s": pa.array(
                    [int(b["doc_id"].to_numpy(zero_copy_only=False).sum())], pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n, s = int(agg["n"].sum()), int(agg["s"].sum())
    report = {
        "rows": args.rows,
        "gen_sec": gen_sec,
        "killed": killed,
        "durable_at_kill": len(durable),
        "first_run_sec_until_kill": first_sec,
        "resume_sec": resume_sec,
        "buckets_reused": len(reused),
        "buckets_rewritten": len(man["files_written"]),
        "complete_marker": bool(man.get("complete")),
        "survivors": n,
        "exact": bool(n == half and s == half * (half - 1) // 2),
    }
    assert report["exact"], (n, half, s)
    assert report["buckets_reused"] == len(durable), "durable bucket not reused"
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
