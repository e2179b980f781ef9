"""Mergeable sketches for approximate corpus statistics at 100-TB scale.

HyperLogLog distinct-count with a fully DETERMINISTIC, SQL-expressible
construction: the register assignment uses the engine's shared int64-safe
multiplicative hash (``sampling.hash32``) plus one xor-shift mix, and the
estimator is the classic HLL harmonic mean with the small-range
linear-counting correction (Flajolet et al. 2007). Because every step is
exact integer math + a fixed float formula, the SAME sketch evaluates in
numpy and in ANSI SQL — so unlike library HLLs the estimate itself is
oracle-checkable against DuckDB bit-for-bit (modulo a final rounding).

Scale shape: each batch reduces to at most ``M`` (register, max-rho) pairs
— a 4096-row partial regardless of batch size — and register partials merge
by elementwise max, so the shuffle moves O(M x blocks) tiny rows and the
driver finish touches only the bounded register table. This is the A4/A5
partial+final pattern (SURVEY.md §2.5) applied to a sketch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from fhirflat_ray.functions.sampling import hash32, hash32_sql

P = 12
M = 1 << P  # 4096 registers
REST_BITS = 20
REST_MASK = (1 << REST_BITS) - 1
MAX_RHO = REST_BITS + 1
ALPHA = 0.7213 / (1.0 + 1.079 / M)

# exact powers of two for integer bit_length via searchsorted (no float log2:
# correctly-rounded log2 of exact powers is not guaranteed by IEEE)
_POW2 = (1 << np.arange(REST_BITS + 1)).astype(np.int64)


_MIX1 = 2246822519  # murmur3-finalizer-style odd constants; every product
_MIX2 = 3266489917  # is < 2^31 * 3.3e9 < 2^63, so the math stays int64-safe


def hll_mix(ids: np.ndarray) -> np.ndarray:
    """Shared 32-bit hash + a murmur-finalizer-style xorshift/multiply mix.

    The bare multiplicative hash's low bits are structured (sequential ids
    gave a +30-60% biased estimate); two xorshift+multiply rounds make rho
    uniform — measured bias < 2.5% across id patterns at n=500..1e6. Every
    step is int64-safe (< 2^32 values, < 2^63 products) so the IDENTICAL
    expression runs in numpy and ANSI SQL."""
    h = hash32(ids)
    h = h ^ (h >> 16)
    h = ((h % (1 << 31)) * _MIX1) % (1 << 32)
    h = h ^ (h >> 13)
    h = ((h % (1 << 31)) * _MIX2) % (1 << 32)
    return h ^ (h >> 16)


def hll_partial(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reduce an id array to its (register, max_rho) pairs (nonzero only)."""
    h = hll_mix(np.asarray(ids, dtype=np.int64))
    reg = h >> REST_BITS
    rest = h & REST_MASK
    bl = np.searchsorted(_POW2, rest, side="right")  # integer bit_length
    rho = (MAX_RHO - bl).astype(np.int64)  # rest == 0 -> MAX_RHO
    regs = np.zeros(M, dtype=np.int64)
    np.maximum.at(regs, reg, rho)
    nz = np.nonzero(regs)[0]
    return nz, regs[nz]


def hll_register_table(ds, column: str):
    """Dataset of merged (reg, mx) register maxima for ``column``."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[column].to_numpy(zero_copy_only=False)
        reg, mx = hll_partial(ids)
        return pa.table(
            {"reg": pa.array(reg, pa.int64()), "mx": pa.array(mx, pa.int64())}
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def _estimate_from_registers(regs: np.ndarray) -> float:
    """The deterministic HLL estimator over a dense M-register array."""
    sm = float(np.sum(np.power(2.0, -regs.astype(np.float64))))
    e = ALPHA * M * M / sm
    v = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * M and v > 0:
        return M * math.log(M / v)
    return e


def hll_estimate(ds, column: str) -> float:
    """Approximate distinct count of ``column`` (relative error ~1.04/sqrt(M)
    ≈ 1.6% at M=4096). Partials are bounded (≤M rows per block); the merge
    is an elementwise max over the collected register partials — the driver
    never sees more than M x blocks tiny rows."""
    from fhirflat_ray.functions.util import collect_small_table

    t = collect_small_table(hll_register_table(ds, column))
    regs = np.zeros(M, dtype=np.int64)
    if t.num_rows:
        np.maximum.at(
            regs,
            t["reg"].to_numpy(zero_copy_only=False),
            t["mx"].to_numpy(zero_copy_only=False),
        )
    return _estimate_from_registers(regs)


def hll_estimate_sql(column_expr: str, table: str) -> str:
    """The identical sketch as ANSI SQL (DuckDB): same hash, same mix, same
    register/rho integer math (bit_length via binary printf — exact), same
    estimator formula. Rounded to 3 decimals on both sides to absorb
    sum-order float noise."""
    h = hash32_sql(column_expr)
    rest = f"(h % {REST_MASK + 1})"
    return f"""
WITH h0 AS (SELECT {h} AS h FROM {table}),
h1 AS (SELECT ((xor(h, h >> 16) % {1 << 31}) * {_MIX1}) % {1 << 32} AS h FROM h0),
h2 AS (SELECT ((xor(h, h >> 13) % {1 << 31}) * {_MIX2}) % {1 << 32} AS h FROM h1),
hm AS (SELECT xor(h, h >> 16) AS h FROM h2),
regs AS (SELECT h // {REST_MASK + 1} AS reg,
                MAX(CASE WHEN {rest} = 0 THEN {MAX_RHO}
                         ELSE {MAX_RHO} - length(printf('%b', {rest})) END) AS mx
         FROM hm GROUP BY reg),
s AS (SELECT sum(pow(2.0, -mx)) + ({M} - count(*)) AS sm,
             {M} - count(*) AS v
      FROM regs),
e AS (SELECT CAST({ALPHA!r} AS DOUBLE) * {M} * {M} / sm AS raw, v FROM s)
SELECT round(CASE WHEN raw <= 2.5 * {M} AND v > 0
                  THEN {M} * ln(CAST({M} AS DOUBLE) / v)
                  ELSE raw END, 3) AS approx_distinct
FROM e
"""


# ---------------------------------------------------- count-min sketch

CMS_W = 2048  # counters per row (power of two so bucket = mix % W in SQL too)
CMS_D = 4
#: one odd multiplier per sketch row — murmur-finalizer-style constants; the
#: per-row mix is the HLL discipline (int64-safe products < 2^63) so the
#: IDENTICAL expression evaluates in numpy and ANSI SQL.
CMS_MULT = (2654435761, 2246822519, 3266489917, 668265263)


def cms_buckets(ids: np.ndarray, d: int) -> np.ndarray:
    """Row-``d`` bucket assignment for an int64 id array."""
    h = hash32(np.asarray(ids, dtype=np.int64))
    g = ((h ^ (h >> 16)) % (1 << 31)) * CMS_MULT[d] % (1 << 32)
    return (g ^ (g >> 13)) % CMS_W


def cms_bucket_sql(id_expr: str, d: int) -> str:
    """The identical row-``d`` bucket as an ANSI-SQL expression."""
    h = hash32_sql(id_expr)
    g = f"((xor({h}, ({h}) >> 16) % {1 << 31}) * {CMS_MULT[d]}) % {1 << 32}"
    return f"xor({g}, ({g}) >> 13) % {CMS_W}"


def cms_counter_table(ds, column: str):
    """Dataset of partial (d, b, n) counter increments: each batch reduces
    to at most D x W rows regardless of batch size (the A5 combiner shape),
    and partials merge by plain SUM — the sketch is trivially mergeable
    across blocks, partitions, and clusters."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[column].to_numpy(zero_copy_only=False)
        ds_, bs_, ns_ = [], [], []
        for d in range(CMS_D):
            cnt = np.bincount(cms_buckets(ids, d), minlength=CMS_W)
            nz = np.nonzero(cnt)[0]
            ds_.append(np.full(len(nz), d, dtype=np.int64))
            bs_.append(nz.astype(np.int64))
            ns_.append(cnt[nz].astype(np.int64))
        return pa.table(
            {
                "d": pa.array(np.concatenate(ds_)),
                "b": pa.array(np.concatenate(bs_)),
                "n": pa.array(np.concatenate(ns_)),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def cms_counters(ds, column: str) -> np.ndarray:
    """Dense (D, W) counter matrix for ``column`` — the driver merge touches
    only the bounded D x W x blocks partial rows, never the data."""
    from fhirflat_ray.functions.util import collect_small_table

    t = collect_small_table(cms_counter_table(ds, column))
    counters = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if t.num_rows:
        np.add.at(
            counters,
            (
                t["d"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False),
            ),
            t["n"].to_numpy(zero_copy_only=False),
        )
    return counters


def cms_estimates(counters: np.ndarray, query_ids: np.ndarray) -> np.ndarray:
    """Point-frequency estimates (min over rows — Cormode & Muthukrishnan
    2005; always >= the true count, over-counts only via collisions)."""
    query_ids = np.asarray(query_ids, dtype=np.int64)
    est = np.full(len(query_ids), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(CMS_D):
        est = np.minimum(est, counters[d, cms_buckets(query_ids, d)])
    return est


def cms_estimate_sql(id_expr: str, table: str, query_sql: str, query_col: str) -> str:
    """The identical sketch + point query as SQL: per-row GROUP BY bucket
    counts over ``table``, then LEAST() across the D counter lookups for
    every row of ``query_sql``. Exact integer math end to end — the
    approximate answer itself is the oracle-checked value."""
    cnt_ctes = ",\n".join(
        f"c{d} AS (SELECT {cms_bucket_sql(id_expr, d)} AS b, COUNT(*) AS n "
        f"FROM {table} GROUP BY 1)"
        for d in range(CMS_D)
    )
    joins = "\n".join(
        f"LEFT JOIN c{d} ON c{d}.b = {cms_bucket_sql('q.' + query_col, d)}"
        for d in range(CMS_D)
    )
    least = ", ".join(f"COALESCE(c{d}.n, 0)" for d in range(CMS_D))
    return f"""
WITH {cnt_ctes},
q AS ({query_sql})
SELECT q.{query_col}, CAST(LEAST({least}) AS BIGINT) AS est_count
FROM q
{joins}
"""


# ------------------------------------------------- grouped HyperLogLog


def hll_grouped_register_table(ds, group_col: str, column: str):
    """Per-group (g, reg, mx) register partials — the grouped extension of
    :func:`hll_register_table`; each batch still reduces to at most
    ``M x groups-in-batch`` rows."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[column].to_numpy(zero_copy_only=False)
        h = hll_mix(np.asarray(ids, dtype=np.int64))
        reg = h >> REST_BITS
        rest = h & REST_MASK
        bl = np.searchsorted(_POW2, rest, side="right")
        rho = (MAX_RHO - bl).astype(np.int64)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "reg": reg, "mx": rho})
        out = df.groupby(["g", "reg"], sort=False)["mx"].max().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow")


def hll_grouped_estimate(ds, group_col: str, column: str) -> "pd.DataFrame":
    """Per-group approximate distinct counts (bounded driver state:
    groups x M register maxima). Returns (g, approx_distinct) with the
    same deterministic estimator as :func:`hll_estimate`, rounded to 3
    decimals to match the SQL mirror."""
    from fhirflat_ray.functions.util import collect_small_table

    t = collect_small_table(hll_grouped_register_table(ds, group_col, column))
    df = t.to_pandas()
    merged = df.groupby(["g", "reg"], sort=False)["mx"].max().reset_index()
    rows = []
    for g, sub in merged.groupby("g", sort=False):
        regs = np.zeros(M, dtype=np.int64)
        regs[sub["reg"].to_numpy()] = sub["mx"].to_numpy()
        rows.append((g, round(_estimate_from_registers(regs), 3)))
    return pd.DataFrame(rows, columns=[group_col, "approx_distinct"])


def hll_grouped_estimate_sql(group_expr: str, column_expr: str, table: str) -> str:
    """The grouped sketch as ANSI SQL — identical hash/mix/register/
    estimator math as :func:`hll_estimate_sql`, with the group key carried
    through every CTE."""
    h = hash32_sql(column_expr)
    rest = f"(h % {REST_MASK + 1})"
    return f"""
WITH h0 AS (SELECT {group_expr} AS g, {h} AS h FROM {table}),
h1 AS (SELECT g, ((xor(h, h >> 16) % {1 << 31}) * {_MIX1}) % {1 << 32} AS h FROM h0),
h2 AS (SELECT g, ((xor(h, h >> 13) % {1 << 31}) * {_MIX2}) % {1 << 32} AS h FROM h1),
hm AS (SELECT g, xor(h, h >> 16) AS h FROM h2),
regs AS (SELECT g, h // {REST_MASK + 1} AS reg,
                MAX(CASE WHEN {rest} = 0 THEN {MAX_RHO}
                         ELSE {MAX_RHO} - length(printf('%b', {rest})) END) AS mx
         FROM hm GROUP BY g, reg),
s AS (SELECT g, sum(pow(2.0, -mx)) + ({M} - count(*)) AS sm,
             {M} - count(*) AS v
      FROM regs GROUP BY g),
e AS (SELECT g, CAST({ALPHA!r} AS DOUBLE) * {M} * {M} / sm AS raw, v FROM s)
SELECT g, round(CASE WHEN raw <= 2.5 * {M} AND v > 0
                     THEN {M} * ln(CAST({M} AS DOUBLE) / v)
                     ELSE raw END, 3) AS approx_distinct
FROM e
"""
