"""Planted-oracle near-dedup stress (r4 verdict item 4: one more order of
magnitude past the recorded 1M-doc run).

Corpus shape (the adversarially dup-heavy construction the 200k/1M runs
used): ``n_families`` duplicate families of ``family_size`` docs — a base
of ``base_words`` family-seeded words plus one variant word per member, so
within-family Jaccard is base/(base+2) (≈0.94 at 30 words: well above the
0.7 verify threshold, and every member pair must land in one LSH band for
the component to connect) — plus ``n_unique`` singletons whose word space
is disjoint from every family. Survivors are EXACTLY one min-id per
planted component: family f keeps id ``f*family_size``; every unique
survives. The check is count + id-sum + max, computed distributed.

Usage: python scripts/near_dedup_stress.py [--docs 10000000] [--dup-frac 0.8]
Writes scratch under /tmp/near_dedup_stress (removed at exit).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa


def gen_corpus(n_docs: int, dup_frac: float, family_size: int, out: str) -> dict:
    import ray.data as rd

    n_dupes = int(n_docs * dup_frac) // family_size * family_size
    n_families = n_dupes // family_size
    n_unique = n_docs - n_dupes
    base_words = 30

    def make(b: pa.Table) -> pa.Table:
        ids = b["id"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        texts = []
        for i in ids:
            if i < n_dupes:
                fam, member = divmod(int(i), family_size)
                rng = np.random.default_rng(fam)
                words = rng.integers(0, 1 << 30, base_words)
                toks = [f"w{int(w)}" for w in words] + [f"fam{fam}var{member}"]
            else:
                # disjoint namespace: a unique doc shares no token with any
                # family or other unique
                rng = np.random.default_rng(1_000_000_007 + int(i))
                words = rng.integers(0, 1 << 30, base_words)
                toks = [f"u{int(i)}t{int(w)}" for w in words]
            texts.append(" ".join(toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    rd.range(n_docs).map_batches(make, batch_format="pyarrow").write_parquet(out)
    return {"n_families": n_families, "n_dupes": n_dupes, "n_unique": n_unique}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--dup-frac", type=float, default=0.8)
    ap.add_argument("--family-size", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)

    from fhirflat_ray.functions.dedup import near_dedup

    base = "/tmp/near_dedup_stress"
    shutil.rmtree(base, ignore_errors=True)
    docs_dir = os.path.join(base, "docs")
    t0 = time.perf_counter()
    shape = gen_corpus(args.docs, args.dup_frac, args.family_size, docs_dir)
    gen_sec = round(time.perf_counter() - t0, 1)

    ds = rd.read_parquet(docs_dir)
    t0 = time.perf_counter()
    surv = near_dedup(ds, id_column="doc_id", column="text", threshold=0.7)
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
    wall = round(time.perf_counter() - t0, 1)
    n, s = int(agg["n"].sum()), int(agg["s"].sum())

    fam, fs = shape["n_families"], args.family_size
    nd, nu = shape["n_dupes"], shape["n_unique"]
    expect_n = fam + nu
    # family survivor ids: 0, fs, 2fs, ...; unique ids: n_dupes .. n_docs-1
    expect_s = fs * (fam * (fam - 1) // 2) + (nd + args.docs - 1) * nu // 2
    report = {
        "docs": args.docs,
        "families": fam,
        "uniques": nu,
        "gen_sec": gen_sec,
        "dedup_sec": wall,
        "docs_per_sec": int(args.docs / wall),
        "survivors": n,
        "expect": expect_n,
        "exact": bool(n == expect_n and s == expect_s),
        "cpus": args.cpus,
    }
    assert report["exact"], (n, expect_n, s, expect_s)
    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
