"""Driver-contract tests: queries() vs DuckDB oracles on sf0.001.

A fast subset runs in CI; the full sweep is ``scripts/check_oracle.py``."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
FAST = [
    "condense_codes",
    "melt_events",
    "token_count",
    "dedup_exact",
    "stats_profile",
    "dedup_near_exhaustive",
    "weighted_sample",
    "distinct_users_hll",
    "revenue_rollup",
    "corpus_prep",
    "ewma_value",
    "bm25_search",
    "source_cap",
    "role_runs",
    "rolling_median3",
    "gini_activity",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents", "customer", "orders", "lineitem", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> list[tuple]:
    # repr-tuples, same canonical form as the driver harness — plain tuples
    # would fail to sort rows with None keys (e.g. ROLLUP subtotal rows)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return sorted(
        tuple(repr(v) for v in rec)
        for rec in df.itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(ray_session, con, name):
    got = entrymod.queries()[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = con.sql(entrymod.oracle_sql()[name]).df()
    assert canon(got) == canon(want)


def test_every_query_has_callable_and_every_oracle_has_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for fn in qs.values():
        assert callable(fn)


def test_entry_runs(ray_session):
    out = entrymod.entry()
    assert out.count() == 1000
    assert set(out.schema().names) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
