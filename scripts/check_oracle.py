"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB result on
the same parquet tables and reports row-count / schema / order-insensitive
value-hash comparisons. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    # ray Dataset
    return result.to_pandas()


def canonical(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    rows = [
        "|".join(repr(v) for v in rec)
        for rec in df.itertuples(index=False, name=None)
    ]
    digest = hashlib.sha256("\n".join(sorted(rows)).encode()).hexdigest()[:16]
    return len(df), sorted(df.columns), digest


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ncpu = int(os.environ.get("CHECK_ORACLE_CPUS", "8"))
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name:20s} rows={len(got):>7d} (rows-only) {dt:5.1f}s")
            continue
        want = con.sql(oracles[name]).df()
        n_g, cols_g, h_g = canonical(got)
        n_w, cols_w, h_w = canonical(want)
        status = "ok  " if (n_g, cols_g, h_g) == (n_w, cols_w, h_w) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name:20s} rows={n_g}/{n_w} cols={'=' if cols_g == cols_w else f'{cols_g}!={cols_w}'} "
            f"hash={'=' if h_g == h_w else f'{h_g}!={h_w}'} {dt:5.1f}s"
        )
        if status == "FAIL" and cols_g == cols_w and n_g == n_w:
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
            neq = (g.astype(str) != w.astype(str)).any(axis=1)
            print("  first diffs:\n", g[neq].head(3), "\n  vs\n", w[neq].head(3))
            print("  dtypes got:", dict(g.dtypes.astype(str)), "want:", dict(w.dtypes.astype(str)))

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
