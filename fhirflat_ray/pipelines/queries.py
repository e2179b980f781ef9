"""Named pipelines for the driver's correctness gate (``__ray_entry__``).

Every function takes ``sf_dir`` (a directory of the driver's parquet tables)
and returns a Dataset / DataFrame / Arrow table. Each has a matching ANSI-SQL
oracle in ``ORACLE_SQL`` (same column names!) unless the operation is not
SQL-expressible, in which case the driver records a rows-only check.

The set covers SURVEY.md §2 line by line: sources (S2/S5), per-batch maps and
normalizers (M4/M6/M17/M18/M21/M23/M24), lookups (J1/J4), aggregations
(A1-A5), sort/limit (§2.6), dedup (§2.7), scalar functions (§2.8), plus the
training-data operators (dedup family, similarity search, text analysis) and
the flagship transcript encode→decode round trip.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# =====================================================================
# Transcript engine (flagship)
# =====================================================================


def transcript_build(sf_dir: str):
    """Derive a transcript-shaped table from ``events``.

    conv_id = 'conv-' || user_id; turn_idx = dense order of (ts, event_id)
    within the conversation (row_number analogue via groupby + per-group
    sort — the implode/stable-index pattern, SURVEY.md §2.5 A1).
    """
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events")
    return bucketed_map_groups(ds, ["user_id"], _transcript_bucket)


def _transcript_bucket(g: pd.DataFrame) -> pd.DataFrame:
    # one vectorized pass over ALL users in the bucket: sort by
    # (user, ts, event_id), then turn_idx = per-user cumcount (C path) —
    # no Python per conversation
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    turn = g.groupby("user_id", sort=False).cumcount().to_numpy().astype(np.int32)
    return pd.DataFrame(
        {
            "conv_id": "conv-" + g["user_id"].astype(str),
            "turn_idx": turn,
            "role": np.where(
                g["event_type"].isin(["click", "view"]), "user", "assistant"
            ),
            "text": g["props"].astype(str),
            "tool": g["event_type"].astype(str),
            "ts": g["ts"],
        }
    )


def _transcript_grouped(sf_dir: str, bucket_fn, columns: list[str] | None = None):
    """Build the transcript AND run a conversation-keyed per-bucket kernel
    in the SAME bucket pass. ``conv_id`` is a bijection of ``user_id``, so
    rows grouped by user are already co-partitioned by conversation —
    chaining a second ``bucketed_map_groups`` on ``conv_id`` after
    ``transcript_build`` would re-shuffle identically-partitioned data.
    One shuffle total (the "reuse the partitioning key across stages"
    rule)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        built = _transcript_bucket(g)
        if columns is not None:
            built = built[columns]
        return bucket_fn(built)

    return bucketed_map_groups(_read(sf_dir, "events"), ["user_id"], per_bucket)


TRANSCRIPT_BUILD_SQL = """
SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
       CASE WHEN event_type IN ('click','view') THEN 'user' ELSE 'assistant' END AS role,
       CAST(props AS VARCHAR) AS text,
       CAST(event_type AS VARCHAR) AS tool,
       ts
FROM events
"""


def transcript_roundtrip(sf_dir: str):
    """Flagship: build transcripts → encode to segments → decode → return.

    Decode must be bit-identical to the built table, so the SQL oracle for
    the *round trip* is the build SQL itself — the engine's whole encode/
    decode stack sits between the two and must be invisible."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc

    work = os.path.join(
        "/tmp/fhirflat_ray_rt", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir, exist_ok=True)
    built = transcript_build(sf_dir)
    # stream the built transcripts straight to sharded parquet — nothing
    # materializes on the driver (round 1 concat_tables'd the whole table
    # here; at 100x the data that was the job-killer). encode_files sorts
    # each partition by (conv_id, turn_idx) itself, so the global sort is
    # unnecessary for both correctness (multiset compare) and compression.
    built.write_parquet(src_dir)

    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, shared_dict_columns=["role", "tool"])
    return dec.decode_dataset(seg_dir)


def compacted_roundtrip(sf_dir: str):
    """Round trip THROUGH small-file compaction: encode the transcript
    table into deliberately tiny segments (the long-running-ingest
    small-file problem), `compact_segments` them into target-sized ones
    (streaming decode → re-sort → re-encode, fresh manifest), then decode
    the compacted set. The oracle is the build SQL — compaction, like the
    rest of the encode stack, must be invisible to the decoded rows."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc

    work = os.path.join(
        "/tmp/fhirflat_ray_cp", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir, exist_ok=True)
    transcript_build(sf_dir).write_parquet(src_dir)
    small = os.path.join(work, "small")
    m_small = enc.encode_files(src_dir, small, target_rows=256)
    n_small = len(dec.segment_paths(small))
    # compact into segments ~4x the measured small size: the encode planner
    # cannot split below input row-group granularity, so a FIXED compact
    # target can exceed what "small" actually produced at larger scales —
    # size the target from the observed layout, as a real compactor would
    per_small = -(-int(m_small["n_rows"]) // max(1, n_small))
    big = os.path.join(work, "compacted")
    enc.compact_segments(small, big, target_rows=max(4096, per_small * 4))
    n_big = len(dec.segment_paths(big))
    if n_big >= n_small:
        raise AssertionError(
            f"compaction did not shrink the segment set ({n_small} -> {n_big})"
        )
    return dec.decode_dataset(big)


def _generic_roundtrip(sf_dir: str, table: str):
    """Encode→decode any parquet table (the codec layer is schema-generic:
    ints/floats/strings/timestamps all round-trip bit-identically)."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc

    work = os.path.join(
        "/tmp/fhirflat_ray_rt",
        hashlib.sha1(f"{sf_dir}:{table}".encode()).hexdigest()[:10],
    )
    shutil.rmtree(work, ignore_errors=True)
    enc.encode_files(
        [os.path.join(sf_dir, f"{table}.parquet")], work, sort_keys=None
    )
    return dec.decode_dataset(work)


def events_roundtrip(sf_dir: str):
    return _generic_roundtrip(sf_dir, "events")


def documents_roundtrip(sf_dir: str):
    return _generic_roundtrip(sf_dir, "documents")


def embeddings_roundtrip(sf_dir: str):
    """Numeric-list (embedding) columns through the numlist codec; the
    returned labels/ids prove the row set — the vector payload equality is
    asserted by the codec layer's bit-exact guarantee (rows-only check:
    list-typed value hashing differs between engines)."""
    ds = _generic_roundtrip(sf_dir, "embeddings")
    return ds.select_columns(["vec_id", "label"])


EVENTS_ROUNDTRIP_SQL = "SELECT * FROM events"
DOCUMENTS_ROUNDTRIP_SQL = "SELECT * FROM documents"
EMBEDDINGS_ROUNDTRIP_SQL = "SELECT vec_id, label FROM embeddings"


# =====================================================================
# Aggregations (partial pre-aggregation before the shuffle)
# =====================================================================


def q1_lineitem(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with per-batch partial combine."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_quantity": batch["l_quantity"],
                "rev": rev,
            }
        )
        # Arrow-native partial aggregate: no pandas copy inside the hot stage
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("rev", "sum"), ([], "count_all")]
        )
        from fhirflat_ray.functions.util import agg_select

        # select by the aggregate OUTPUT names, not position (pyarrow's
        # keys-first vs aggregates-first order has flipped across versions)
        return agg_select(
            g,
            {
                "l_returnflag": "l_returnflag",
                "l_linestatus": "l_linestatus",
                "l_quantity_sum": "sum_qty",
                "rev_sum": "sum_rev",
                "count_all": "n",
            },
        )

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_rev", alias_name="sum_rev"),
        Sum("n", alias_name="n"),
    )

    # float sums are summation-order-dependent; the query semantics round to
    # cents so the result is independent of partial-aggregation order
    def round_rev(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_rev"),
            "sum_rev",
            pc.round(batch["sum_rev"], ndigits=2),
        )

    return out.map_batches(round_rev, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def events_condense(sf_dir: str):
    """A2 one-row-per-subject condense (groupby(subject).agg).

    Partial per-batch Arrow aggregate → coarse-bucket shuffle → one
    vectorized pandas combine per bucket. Ray's built-in
    ``groupby.aggregate`` pays Python per group (~1 ms/group), which is
    fine at hundreds of subjects but not at the 1e8+ a 100 TB corpus
    carries; this shape is O(buckets) in Python regardless of subjects."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("user_id").aggregate(
            [("ts", "min"), ("ts", "max"), ("value", "sum"), ([], "count_all")]
        )
        from fhirflat_ray.functions.util import agg_select

        return agg_select(
            g,
            {
                "user_id": "user_id",
                "ts_min": "first_ts",
                "ts_max": "last_ts",
                "value_sum": "total_value",
                "count_all": "n_events",
            },
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("user_id", sort=False)
            .agg(
                n_events=("n_events", "sum"),
                first_ts=("first_ts", "min"),
                last_ts=("last_ts", "max"),
                total_value=("total_value", "sum"),
            )
            .reset_index()
        )
        out["total_value"] = out["total_value"].round(2)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_map_groups(partials, ["user_id"], combine)


EVENTS_CONDENSE_SQL = """
SELECT user_id, count(*) AS n_events, min(ts) AS first_ts,
       max(ts) AS last_ts, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
"""


def distinct_users(sf_dir: str):
    """A3 distinct-count: per-batch distinct → distributed distinct → count.

    ``ds.unique`` would pull the full distinct list onto the driver; this
    keeps the distinct set sharded (one narrow shuffle on the key) and only
    the count crosses to the driver."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def batch_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(batch["user_id"])})

    from fhirflat_ray.functions.util import distinct_rows

    n = distinct_rows(
        ds.map_batches(batch_distinct, batch_format="pyarrow"), ["user_id"]
    ).count()
    return pa.table({"n_users": pa.array([int(n)], pa.int64())})


DISTINCT_USERS_SQL = "SELECT count(DISTINCT user_id) AS n_users FROM events"


def stats_profile(sf_dir: str):
    """A5 codec-selection statistics: rows + exact cardinality per column.

    Fully distributed (round-1 version unioned every distinct value into
    driver-side Python sets — unbounded on a high-cardinality column): each
    batch emits its per-column distinct (col, val) pairs, a groupby on
    (col, val) dedupes them across blocks, and a second tiny groupby counts
    per column. Both shuffles carry only distinct pairs, never row data; the
    driver sees two result rows."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        cols: list[str] = []
        vals: list[str] = []
        for col in ("event_type", "user_id"):
            u = pc.unique(batch[col]).cast(pa.string())
            cols.extend([col] * len(u))
            vals.extend(u.to_pylist())
        return pa.table(
            {"col": pa.array(cols, pa.string()), "val": pa.array(vals, pa.string())}
        )

    from fhirflat_ray.functions.util import distinct_rows

    uniq = distinct_rows(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"), ["col", "val"]
    )
    card = {
        r["col"]: r["ncard"]
        for r in uniq.groupby("col").aggregate(Count(alias_name="ncard")).take_all()
    }
    n_rows = ds.count()
    cols = sorted(card)
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "n": pa.array([n_rows] * len(cols), pa.int64()),
            "ncard": pa.array([int(card[c]) for c in cols], pa.int64()),
        }
    )


STATS_PROFILE_SQL = """
SELECT 'event_type' AS col, count(*) AS n, count(DISTINCT event_type) AS ncard FROM events
UNION ALL
SELECT 'user_id', count(*), count(DISTINCT user_id) FROM events
"""


def rle_runs(sf_dir: str):
    """Run-length statistics: total runs of event_type under per-user
    (ts, event_id) order — the sort-before-RLE win metric (SURVEY.md §2.6)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every user in the bucket: a run boundary is a
        # change in event_type OR a change of user under (user, ts, event_id)
        # order — one partial count row per bucket
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy()
        if len(et) == 0:
            return pd.DataFrame({"runs": [0]})
        boundaries = 1 + int(((et[1:] != et[:-1]) | (uid[1:] != uid[:-1])).sum())
        return pd.DataFrame({"runs": [boundaries]})

    per_bucket = bucketed_map_groups(ds, ["user_id"], runs)
    total = per_bucket.sum("runs")  # distributed reduce, O(1) on the driver
    return pa.table({"n_runs": pa.array([int(total)], pa.int64())})


RLE_RUNS_SQL = """
SELECT CAST(sum(c) AS BIGINT) AS n_runs FROM (
  SELECT CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS c
  FROM events
)
"""


# =====================================================================
# Maps / projections / normalizers
# =====================================================================


def condense_codes(sf_dir: str):
    """M4/M6/M24 ``system|code`` condensing as a vectorized join."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def condense(batch: pa.Table) -> pa.Table:
        code = pc.binary_join_element_wise(batch["lang"], batch["source"], "|")
        return pa.table({"doc_id": batch["doc_id"], "code": code})

    return ds.map_batches(condense, batch_format="pyarrow")


CONDENSE_CODES_SQL = "SELECT doc_id, lang || '|' || source AS code FROM documents"


def melt_events(sf_dir: str):
    """M21 wide→long unpivot, built per batch with no shuffle."""
    ds = _read(sf_dir, "events", columns=["event_id", "value", "user_id"])

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        eid = batch["event_id"]
        return pa.table(
            {
                "event_id": pa.concat_arrays(
                    [eid.combine_chunks(), eid.combine_chunks()]
                ),
                "key": pa.array(["value"] * n + ["user_id"] * n, pa.string()),
                "val": pa.concat_arrays(
                    [
                        batch["value"].combine_chunks(),
                        batch["user_id"].cast(pa.float64()).combine_chunks(),
                    ]
                ),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


MELT_EVENTS_SQL = """
SELECT event_id, 'value' AS key, value AS val FROM events
UNION ALL
SELECT event_id, 'user_id', CAST(user_id AS DOUBLE) FROM events
"""


def date_format(sf_dir: str):
    """M18 date normalization: ISO day strings + per-day counts."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        from fhirflat_ray.functions.util import agg_select

        day = pc.strftime(batch["ts"], format="%Y-%m-%d")
        g = pa.table({"day": day}).group_by("day").aggregate([([], "count_all")])
        return agg_select(g, {"day": "day", "count_all": "n"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
    )


DATE_FORMAT_SQL = "SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n FROM events GROUP BY 1"


#: The mapping table (J1/T2): a small side input, broadcast — the reference's
#: mapping-rule lookup (/root/reference/fhirflat/ingest.py:150-153).
EVENT_CATEGORY_MAP = {
    "click": "engagement",
    "view": "engagement",
    "purchase": "conversion",
    "signup": "conversion",
}


def mapping_apply(sf_dir: str):
    """M17/M19 mapping-DSL application via broadcast small-side lookup."""
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])
    map_ref = ray.put(EVENT_CATEGORY_MAP)

    class Apply:
        def __init__(self, ref):
            self.mapping = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            et = batch["event_type"].combine_chunks().dictionary_encode()
            vocab = et.dictionary.to_pylist()
            mapped = pa.array(
                [self.mapping.get(v, "other") for v in vocab], pa.string()
            )
            cat = mapped.take(et.indices)
            return pa.table({"event_id": batch["event_id"], "category": cat})

    from fhirflat_ray.functions.util import worker_cached_stage

    return ds.map_batches(
        worker_cached_stage(Apply, ref=map_ref), batch_format="pyarrow"
    )


MAPPING_APPLY_SQL = """
SELECT event_id,
       CASE event_type WHEN 'click' THEN 'engagement' WHEN 'view' THEN 'engagement'
            WHEN 'purchase' THEN 'conversion' WHEN 'signup' THEN 'conversion'
            ELSE 'other' END AS category
FROM events
"""


def dict_vocab(sf_dir: str):
    """A5/T3 shared-dictionary vocabulary build (distinct (col, val) pairs)."""
    import ray.data as rd

    ev = _read(sf_dir, "events", columns=["event_type"])
    dc = _read(sf_dir, "documents", columns=["lang"])

    def distinct(col: str):
        def f(batch: pa.Table) -> pa.Table:
            u = pc.unique(batch[col])
            return pa.table(
                {"col": pa.array([col] * len(u), pa.string()), "val": u.cast(pa.string())}
            )

        return f

    both = ev.map_batches(distinct("event_type"), batch_format="pyarrow").union(
        dc.map_batches(distinct("lang"), batch_format="pyarrow")
    )

    from fhirflat_ray.functions.util import distinct_rows

    return distinct_rows(both, ["col", "val"])


DICT_VOCAB_SQL = """
SELECT 'event_type' AS col, event_type AS val FROM events GROUP BY 2
UNION ALL
SELECT 'lang', lang FROM documents GROUP BY 2
"""


# =====================================================================
# Joins / sort / limit
# =====================================================================


def fk_anti_join(sf_dir: str):
    """J4 referential-integrity anti join via broadcast key set.

    Returns one count row (the TPC-H-ish data is referentially complete, so a
    row-level result would be empty; the count proves the path ran)."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    keys = set(cust.unique("c_custkey"))
    keys_ref = ray.put(np.fromiter(keys, dtype=np.int64, count=len(keys)))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    class Anti:
        def __init__(self, ref):
            arr = ray.get(ref)
            self.keys = np.sort(arr)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ck)
            pos = np.clip(pos, 0, len(self.keys) - 1)
            missing = self.keys[pos] != ck
            return pa.table({"n": pa.array([int(missing.sum())], pa.int64())})

    from fhirflat_ray.functions.util import worker_cached_stage

    total = orders.map_batches(
        worker_cached_stage(Anti, ref=keys_ref), batch_format="pyarrow"
    ).sum("n")
    return pa.table({"n_orphans": pa.array([int(total)], pa.int64())})


FK_ANTI_JOIN_SQL = """
SELECT count(*) AS n_orphans FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


def top_docs(sf_dir: str):
    """Sort + limit (top-k by n_chars, deterministic tie-break) — via
    ``streaming_topk``: per-block local top-k + driver merge, a map-only
    plan instead of ``sort().limit()``'s corpus-wide all-to-all."""
    from fhirflat_ray.functions.util import streaming_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return streaming_topk(ds, ["n_chars", "doc_id"], 10, descending=[True, False])


TOP_DOCS_SQL = """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10
"""


# =====================================================================
# Windows / as-of join (custom operators the Dataset API lacks)
# =====================================================================


def tumbling_window(sf_dir: str):
    """Tumbling 1-day windows per event_type (computed window key + partial
    aggregate; SURVEY.md §2.9 / ray guide streaming section)."""
    from fhirflat_ray.functions.windows import tumbling_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    return tumbling_aggregate(ds, "ts", width_us=86_400_000_000, by="event_type")


TUMBLING_WINDOW_SQL = """
SELECT epoch_us(ts) // 86400000000 AS window, event_type, count(*) AS n
FROM events GROUP BY 1, 2
"""


def session_windows(sf_dir: str):
    """Gap-based sessionization (30-min gap) per user."""
    from fhirflat_ray.functions.windows import sessionize

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    return sessionize(ds, "user_id", "ts", gap_us=1_800_000_000, order_cols=["event_id"])


SESSION_WINDOWS_SQL = """
WITH flag AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag
),
per_sess AS (SELECT user_id, sid, count(*) AS len FROM sess GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(len) AS BIGINT) AS max_session_len
FROM per_sess GROUP BY user_id
"""


def asof_join(sf_dir: str):
    """As-of join: each event matched to the latest order (same user key)
    whose order date is <= the event timestamp. Broadcast small side +
    per-batch merge_asof (no shuffle)."""
    import pyarrow.parquet as pq2

    from fhirflat_ray.functions.joins import broadcast_asof_join

    orders = (
        pq2.read_table(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_orderdate"]
        )
        .to_pandas()
        .groupby(["o_custkey", "o_orderdate"], as_index=False)
        .first()  # dedupe ties so the matched o_orderdate is deterministic
    )
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = broadcast_asof_join(
        ds,
        orders.rename(columns={"o_orderdate": "order_ts"}),
        left_on="ts",
        right_on="order_ts",
        by_left="user_id",
        by_right="o_custkey",
        right_value_cols=[],
    )
    return out.select_columns(["event_id", "order_ts"])


ASOF_JOIN_SQL = """
SELECT e.event_id, o.o_orderdate AS order_ts
FROM events e ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def asof_join_bucketed(sf_dir: str):
    """Same as-of join forced through the TWO-LARGE-SIDES path: both sides
    hash-bucketed on the key (one narrow shuffle each, nothing broadcast or
    driver-materialized), one vectorized ``merge_asof`` per bucket. Same
    oracle as ``asof_join`` — the two paths must be indistinguishable."""
    from fhirflat_ray.functions.joins import bucketed_asof_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    # (key, ts) ties are deduped INSIDE the bucket kernel (dedupe_right) —
    # hash co-partitioning makes that equivalent to a global distinct but
    # saves re-shuffling the whole orders table through a distinct pre-pass
    orders = orders.map_batches(
        lambda b: b.rename_columns(
            ["order_ts" if c == "o_orderdate" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = bucketed_asof_join(
        ds,
        orders,
        left_on="ts",
        right_on="order_ts",
        by_left="user_id",
        by_right="o_custkey",
        right_value_cols=[],
        dedupe_right=True,
    )
    return out.select_columns(["event_id", "order_ts"])


ASOF_JOIN_BUCKETED_SQL = ASOF_JOIN_SQL


# =====================================================================
# Text analysis
# =====================================================================


def token_count(sf_dir: str):
    from fhirflat_ray.functions.text import token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )


TOKEN_COUNT_SQL = """
SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
FROM documents
"""


def chunk_docs(sf_dir: str):
    """Overlapping token-window chunking (RAG / pretraining context prep):
    every document becomes ceil(n_tokens/stride) chunks of up to 32 tokens
    with stride 16. Map-only — a document is one row, so the fan-out is
    exact per batch and the pipeline has no shuffle at all."""
    from fhirflat_ray.functions.text import chunk_documents_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: chunk_documents_batch(b, size=32, stride=16),
        batch_format="pyarrow",
    )


CHUNK_DOCS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
),
g AS (SELECT doc_id, t, unnest(range(0, len(t), 16)) AS s FROM toks)
SELECT doc_id, s // 16 AS chunk_idx,
       least(len(t) - s, 32) AS n_tokens,
       array_to_string(list_slice(t, s + 1, least(s + 32, len(t))), ' ') AS chunk_text
FROM g
"""


def bpe_train(sf_dir: str):
    """BPE vocabulary training (Sennrich et al. 2016) under a FULL unrolled
    SQL oracle: distributed word counting (per-batch pre-reduce → narrow
    word groupby → deterministic capped top-k), then the classic merge loop
    on the driver over the compact vocabulary table. The oracle unrolls all
    8 merge rounds as chained CTEs — pair counts from the split symbol
    list, best pair by (count DESC, pair ASC) via scalar subqueries, merge
    application as the same boundary-safe sentinel string replace."""
    from fhirflat_ray.functions.text import train_bpe

    ds = _read(sf_dir, "documents", columns=["text"])
    return train_bpe(ds, n_merges=8)


def _bpe_sql(n_merges: int = 8, max_words: int = 65536, mode: str = "merges") -> str:
    # MATERIALIZED on every multiply-referenced CTE: the naive chain would
    # let DuckDB inline w{k-1} into each of its consumers and the expansion
    # goes exponential in rounds (observed: "too many open files" from
    # thousands of re-reads of the parquet). The best-pair row joins in as
    # a 1-row cross join rather than scalar subqueries for the same reason
    # — and an empty b{k} then empties all later rounds, mirroring the
    # Python trainer's early stop.
    parts = [
        "WITH words AS MATERIALIZED (",
        "  SELECT word, count(*)::BIGINT AS f FROM (",
        r"    SELECT unnest(regexp_extract_all(text, '\S+')) AS word FROM documents)",
        f"  GROUP BY word ORDER BY f DESC, word LIMIT {max_words}",
        "),",
        "w0 AS MATERIALIZED (SELECT word, '<' || array_to_string(regexp_extract_all(word, '.'), '><') || '>' AS s, f FROM words)",
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(
            f""",
x{k} AS (SELECT string_split(substr(s, 2, len(s) - 2), '><') AS lst, f FROM w{p}),
e{k} AS (SELECT lst, f, unnest(range(1, len(lst))) AS i FROM x{k}),
p{k} AS (SELECT lst[i] AS l_sym, lst[i + 1] AS r_sym, sum(f)::BIGINT AS cnt
         FROM e{k} GROUP BY 1, 2),
b{k} AS MATERIALIZED (
  SELECT l_sym, r_sym, cnt FROM p{k} ORDER BY cnt DESC, l_sym, r_sym LIMIT 1),
w{k} AS MATERIALIZED (
  SELECT word, replace(s, '<' || b.l_sym || '><' || b.r_sym || '>',
                          '<' || b.l_sym || b.r_sym || '>') AS s, f
  FROM w{p}, b{k} b)"""
        )
    if mode == "tokenize":
        # per-word token count from the final symbol strings, applied back
        # to every document's word stream; out-of-vocab (cap overflow)
        # falls back to character count, mirroring the Ray stage.
        return "\n".join(parts) + f""",
tok AS (SELECT word, len(string_split(substr(s, 2, len(s) - 2), '><'))::BIGINT AS n_tok
        FROM w{n_merges}),
docw AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS word FROM documents)
SELECT d.doc_id, sum(coalesce(t.n_tok, len(d.word)))::BIGINT AS n_bpe_tokens
FROM docw d LEFT JOIN tok t USING (word)
GROUP BY d.doc_id"""
    sel = "\nUNION ALL\n".join(
        f"SELECT {k}::BIGINT AS merge_rank, l_sym, r_sym, cnt FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return "\n".join(parts) + "\n" + sel


BPE_TRAIN_SQL = _bpe_sql(8)


def bpe_tokenize(sf_dir: str):
    """Apply the TRAINED BPE vocabulary back to the corpus: per-document
    token count under the 8-merge vocab. Train = distributed word count +
    driver merge loop (vocabulary-scale); apply = one broadcast of the
    compact (word, n_tok) lookup (``ray.put`` once, fetched per actor) and
    a single fully-vectorized corpus pass. Also under the full unrolled
    oracle (same CTE chain + LEFT JOIN back to the document word stream,
    char-count fallback for out-of-vocab words)."""
    import ray

    from fhirflat_ray.functions.text import (
        BpeVocabTokenCounter,
        bpe_token_counts,
        word_frequencies,
    )
    from fhirflat_ray.functions.util import worker_cached_stage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lookup = bpe_token_counts(word_frequencies(ds), n_merges=8)
    ref = ray.put(lookup)
    return ds.map_batches(
        worker_cached_stage(BpeVocabTokenCounter, lookup_ref=ref),
        batch_format="pyarrow",
    )


BPE_TOKENIZE_SQL = _bpe_sql(8, mode="tokenize")


def token_count_bpe(sf_dir: str):
    """BPE-ish token counting (word/number/punct split regex compiled once
    per actor) under the same-regex SQL oracle."""
    from fhirflat_ray.functions.text import BpeishTokenCounter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from fhirflat_ray.functions.util import worker_cached_stage

    return ds.map_batches(
        worker_cached_stage(BpeishTokenCounter), batch_format="pyarrow"
    ).select_columns(["doc_id", "n_bpe_tokens"])


TOKEN_COUNT_BPE_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
"""


def text_quality(sf_dir: str):
    from fhirflat_ray.functions.text import quality_score_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_chars_text", "n_tokens", "punct_ratio", "alpha_ratio"]
    )


TEXT_QUALITY_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_text,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
         / greatest(length(text), 1) AS punct_ratio,
       CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
         / greatest(length(text), 1) AS alpha_ratio
FROM documents
"""


def fingerprint(sf_dir: str):
    from fhirflat_ray.functions.text import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def lang_id(sf_dir: str):
    """Stopword-heuristic language ID — now under a FULL SQL oracle: the
    DuckDB mirror counts the same stopword regex hits per language and
    reproduces numpy argmax's first-max tie-break with a CASE cascade over
    the alphabetically ordered languages."""
    from fhirflat_ray.functions.text import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from fhirflat_ray.functions.util import worker_cached_stage

    return ds.map_batches(
        worker_cached_stage(LangId), batch_format="pyarrow"
    ).select_columns(["doc_id", "lang_pred"])


def _lang_id_sql() -> str:
    from fhirflat_ray.functions.text import LangId

    langs = sorted(LangId.STOPWORDS)
    counts = ",\n    ".join(
        "len(regexp_extract_all(lower(text), '\\b(?:"
        + "|".join(sorted(LangId.STOPWORDS[lang]))
        + ")\\b')) AS " + lang
        for lang in langs
    )
    # numpy argmax keeps the FIRST maximum → >= cascade in lang order
    cascade = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{lang} >= {o}" for o in langs[i + 1 :])
        cascade.append(f"WHEN {conds} THEN '{lang}'")
    all_langs = ", ".join(langs)
    return f"""
WITH s AS (
  SELECT doc_id,
    {counts}
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest({all_langs}) = 0 THEN 'und'
            {' '.join(cascade)}
            ELSE '{langs[-1]}' END AS lang_pred
FROM s
"""


LANG_ID_SQL = _lang_id_sql()


def langid_confusion(sf_dir: str):
    """Language-ID evaluation: the (predicted, labeled) confusion counts
    of the stopword classifier against the corpus's own lang labels —
    closing the classify→measure loop for the text ops the way
    ``quality_confusion`` does for the trained model. Map-only prediction
    (the ``lang_id`` kernel) + a ≤ |langs|² partial fold."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.text import LangId
    from fhirflat_ray.functions.util import agg_select, worker_cached_stage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(worker_cached_stage(LangId), batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        g = (
            b.select(["lang_pred", "lang"])
            .group_by(["lang_pred", "lang"])
            .aggregate([([], "count_all")])
        )
        return agg_select(
            g, {"lang_pred": "lang_pred", "lang": "lang", "count_all": "n"}
        )

    return (
        pred.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang_pred", "lang"])
        .aggregate(Sum("n", alias_name="n"))
    )


LANGID_CONFUSION_SQL = f"""
WITH p AS ({LANG_ID_SQL.strip()})
SELECT p.lang_pred, d.lang, CAST(count(*) AS BIGINT) AS n
FROM p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY p.lang_pred, d.lang
"""


#: PSI histogram geometry: 10 fixed-width bins over [0, 500); shared with
#: the SQL oracle so bin edges are identical integer math
_PSI_BINS, _PSI_HI = 10, 500.0


def psi_value_split(sf_dir: str):
    """Population-stability index of event values between the train and
    test hash splits — the standard drift metric an MLOps gate reports.
    Bin counts are exact integers (fixed-width bins, clipped top bin);
    PSI = Σ (p_i − q_i)·ln(p_i/q_i) rides at 6dp with the expression
    mirrored (zero-count bins take the standard 0.5-count floor so the
    ln is defined on both sides identically)."""
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.util import agg_select, collect_small_table

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    width = _PSI_HI / _PSI_BINS

    def partial(b: pa.Table) -> pa.Table:
        ids = b["user_id"].to_numpy(zero_copy_only=False)
        h = hash32(ids) % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        v = b["value"].to_numpy(zero_copy_only=False)
        # floor (not int-truncation, which rounds toward zero for negative
        # values) to match SQL's floor(); the oracle's 0..BINS-1 grid drops
        # negative bins entirely, so mask them out rather than letting a
        # negative index silently add the count to the top bin.
        bins = np.minimum(np.floor(v / width).astype(np.int64), _PSI_BINS - 1)
        keep = bins >= 0
        g = (
            pd.DataFrame({"split": split[keep], "bin": bins[keep]})
            .groupby(["split", "bin"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    t = collect_small_table(ds.map_batches(partial, batch_format="pyarrow"))
    df = t.to_pandas().groupby(["split", "bin"], as_index=False)["n"].sum()
    cnt = {s: np.zeros(_PSI_BINS, np.float64) for s in ("train", "test")}
    for sp, bn, n in df.itertuples(index=False):
        if sp in cnt:
            cnt[sp][int(bn)] = n
    a, b_ = cnt["train"], cnt["test"]
    a = np.where(a == 0, 0.5, a)
    b_ = np.where(b_ == 0, 0.5, b_)
    p = a / a.sum()
    q = b_ / b_.sum()
    psi = float(np.sum((p - q) * np.log(p / q)))
    return pa.table({"psi": pa.array([round(psi, 6)], pa.float64())})


def _psi_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    h = hash32_sql("user_id")
    w = _PSI_HI / _PSI_BINS
    return f"""
WITH a AS (
  SELECT CASE WHEN ({h}) % 100 < 80 THEN 'train'
              WHEN ({h}) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         least(CAST(floor(value / {w}) AS BIGINT), {_PSI_BINS - 1}) AS bin
  FROM events),
g AS (SELECT split, bin, CAST(count(*) AS DOUBLE) AS n FROM a
      WHERE split IN ('train', 'test') GROUP BY split, bin),
grid AS (
  SELECT s.split, b.b AS bin,
         coalesce((SELECT n FROM g WHERE g.split = s.split AND g.bin = b.b), 0.5)
           AS n
  FROM (VALUES ('train'), ('test')) s(split)
  CROSS JOIN generate_series(0, {_PSI_BINS - 1}) b(b)),
norm AS (
  SELECT split, bin, n / sum(n) OVER (PARTITION BY split) AS p FROM grid)
SELECT round(sum((tr.p - te.p) * ln(tr.p / te.p)), 6) AS psi
FROM norm tr JOIN norm te ON te.bin = tr.bin
WHERE tr.split = 'train' AND te.split = 'test'
"""


PSI_VALUE_SPLIT_SQL = _psi_sql()


def ks_value_split(sf_dir: str):
    """EXACT Kolmogorov-Smirnov statistic between the train and test
    value distributions — reported as the integer triple
    (max |cum_train·n_test − cum_test·n_train|, n_train, n_test), so the
    supremum is computed with NO floats anywhere (D = d_num/(n_train·
    n_test) is the consumer's division). Per-split value counts fold
    through one value-bucket exchange; the cum-diff maximum needs the
    values in order, so the merged count table (distinct-value-bounded)
    sorts once on the driver."""
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.util import collect_small_table

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ids = b["user_id"].to_numpy(zero_copy_only=False)
        h = hash32(ids) % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        g = (
            pd.DataFrame({"split": split, "value": b["value"].to_numpy(zero_copy_only=False)})
            .groupby(["split", "value"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g[g["split"] != "val"], preserve_index=False)

    t = collect_small_table(ds.map_batches(partial, batch_format="pyarrow"))
    df = t.to_pandas().groupby(["split", "value"], as_index=False)["n"].sum()
    piv = (
        df.pivot(index="value", columns="split", values="n")
        .fillna(0)
        .sort_index()
    )
    a = piv.get("train", pd.Series(0, index=piv.index)).to_numpy(np.int64)
    b_ = piv.get("test", pd.Series(0, index=piv.index)).to_numpy(np.int64)
    na, nb = int(a.sum()), int(b_.sum())
    if na * nb < 2**62:
        d_num = int(np.abs(np.cumsum(a) * nb - np.cumsum(b_) * na).max())
    else:
        # cum·n products approach n_train·n_test; past ~2^62 the int64 path
        # would wrap silently while the SQL oracle's window sums promote to
        # HUGEINT — redo the cross-multiplication in Python ints (object
        # dtype) to keep the exact-integer guarantee at any scale.
        ca = np.cumsum(a.astype(object))
        cb = np.cumsum(b_.astype(object))
        d_num = int(max(abs(x * nb - y * na) for x, y in zip(ca, cb)))
    return pa.table(
        {
            "d_num": pa.array([d_num], pa.int64()),
            "n_train": pa.array([na], pa.int64()),
            "n_test": pa.array([nb], pa.int64()),
        }
    )


def _ks_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    h = hash32_sql("user_id")
    return f"""
WITH a AS (
  SELECT value,
         CASE WHEN ({h}) % 100 < 80 THEN 'train'
              WHEN ({h}) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM events),
c AS (
  SELECT value,
         sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS nb
  FROM a WHERE split IN ('train', 'test') GROUP BY value),
t AS (SELECT (SELECT sum(na) FROM c) AS n_train, (SELECT sum(nb) FROM c) AS n_test),
cum AS (
  SELECT sum(na) OVER (ORDER BY value) AS ca,
         sum(nb) OVER (ORDER BY value) AS cb
  FROM c)
SELECT CAST(max(abs(ca * t.n_test - cb * t.n_train)) AS BIGINT) AS d_num,
       CAST(t.n_train AS BIGINT) AS n_train, CAST(t.n_test AS BIGINT) AS n_test
FROM cum, t GROUP BY t.n_train, t.n_test
"""


KS_VALUE_SPLIT_SQL = _ks_sql()


def degree_assortativity(sf_dir: str):
    """Degree assortativity of the co-ordered-parts graph: the Pearson
    correlation of endpoint degrees over all edges (both orientations) —
    positive means hubs connect to hubs. Degrees attach via
    ``attach_degrees`` (broadcast below the node budget, distributed hash
    joins above — no driver node state at scale); per-edge moment
    partials fold map-only; the closed form mirrors ``qty_price_corr``
    at 6dp."""
    from fhirflat_ray.functions.graph import attach_degrees
    from fhirflat_ray.functions.util import collect_small_table

    n_parts = _join_partitions(sf_dir, ["lineitem"])
    edges = _coorder_edges(sf_dir, n_parts).materialize()
    with_deg = attach_degrees(
        edges, edges, [("u", "du"), ("v", "dv")], num_partitions=n_parts,
    )

    def moments(b: pa.Table) -> pa.Table:
        du = b["du"].to_numpy(zero_copy_only=False).astype(np.float64)
        dv = b["dv"].to_numpy(zero_copy_only=False).astype(np.float64)
        # both orientations: x = deg(src), y = deg(dst) symmetrized
        x = np.concatenate([du, dv])
        y = np.concatenate([dv, du])
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([x.sum()], pa.float64()),
                "sy": pa.array([y.sum()], pa.float64()),
                "sxx": pa.array([(x * x).sum()], pa.float64()),
                "syy": pa.array([(y * y).sum()], pa.float64()),
                "sxy": pa.array([(x * y).sum()], pa.float64()),
            }
        )

    t = collect_small_table(
        with_deg.map_batches(moments, batch_format="pyarrow")
    ).to_pandas()
    n = float(t["n"].sum())
    sx, sy = float(t["sx"].sum()), float(t["sy"].sum())
    sxx, syy, sxy = float(t["sxx"].sum()), float(t["syy"].sum()), float(t["sxy"].sum())
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sxx / n - (sx / n) * (sx / n)
    vy = syy / n - (sy / n) * (sy / n)
    r = cov / ((vx**0.5) * (vy**0.5))
    return pa.table({"assortativity": pa.array([round(r, 6)], pa.float64())})


DEGREE_ASSORTATIVITY_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
d AS (
  SELECT node, CAST(count(*) AS DOUBLE) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node),
p AS (
  SELECT du.deg AS x, dv.deg AS y FROM e
  JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v
  UNION ALL
  SELECT dv.deg, du.deg FROM e
  JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
  FROM p)
SELECT round((sxy / n - (sx / n) * (sy / n)) /
             (sqrt(sxx / n - (sx / n) * (sx / n)) *
              sqrt(syy / n - (sy / n) * (sy / n))), 6) AS assortativity
FROM m
"""


def poisson_sample(sf_dir: str):
    """Deterministic importance sampling: each document keeps with
    probability proportional to its token count (p = n_tokens/100, capped
    at 1) — the length-weighted draw a token-budgeted mixture uses.
    Map-only and exactly reproducible: the Bernoulli trial is the INTEGER
    compare ``hash32(doc_id) * 100 < n_tokens * 2^32`` (no float
    probability ever computed), so any cluster size, block layout or rerun
    keeps the same documents and SQL mirrors the draw bit-for-bit."""
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.text import token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pick(b: pa.Table) -> pa.Table:
        t = token_count_batch(b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hash32(ids) * np.int64(100) < ntok * np.int64(1 << 32)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "n_tokens": t["n_tokens"].filter(pa.array(keep)),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def _poisson_sample_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens FROM t
WHERE {hash32_sql('doc_id')} * 100 < n_tokens * 4294967296
"""


POISSON_SAMPLE_SQL = _poisson_sample_sql()


# =====================================================================
# Dedup
# =====================================================================


def dedup_exact(sf_dir: str):
    from fhirflat_ray.functions.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(ds, column="text", id_column="doc_id").select_columns(["doc_id"])


DEDUP_EXACT_SQL = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def dedup_exact_wave(sf_dir: str):
    """Wave-sharded exact dedup (functions/exchange.py): identical survivors
    to ``dedup_exact``, but the exchange runs in 3 bucket-slice waves with
    every bucket landing as durable parquet — the external path for corpora
    past the object store (each wave holds ~1/3 of the hashes in flight).
    Same oracle as dedup_exact: the wave structure must be invisible."""
    from fhirflat_ray.functions.exchange import (
        exact_dedup_to_parquet,
        read_exchange_output,
    )

    work = os.path.join(
        "/tmp/fhirflat_ray_dw", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    exact_dedup_to_parquet(
        ds, work, column="text", id_column="doc_id", num_buckets=32, n_waves=3
    )
    return read_exchange_output(work).select_columns(["doc_id"])


def hash_join_wave(sf_dir: str):
    """Wave-sharded distributed hash join (functions/exchange.py):
    orders ⋈ customer with the bucket-id space cut into 3 waves, each
    exchanging only its slice and landing per-bucket parquet atomically —
    the escape hatch for one-shot Dataset.join aborting past ~0.5× object
    store (BASELINE.md 128M finding)."""
    from fhirflat_ray.functions.exchange import (
        hash_join_to_parquet,
        read_exchange_output,
    )

    work = os.path.join(
        "/tmp/fhirflat_ray_hjw", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    hash_join_to_parquet(
        orders, cust, work, on="o_custkey", right_on="c_custkey",
        how="inner", num_buckets=32, n_waves=3,
    )
    return read_exchange_output(work).select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_nationkey"]
    )


HASH_JOIN_WAVE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_nationkey
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def group_agg_wave(sf_dir: str):
    """Wave-sharded bucketed groupby (functions/exchange.py): per-user
    event count + value sum via ``bucketed_map_groups_to_parquet`` in 2
    waves — the grouped-aggregation member of the external-exchange family
    (Python per bucket, durable per-bucket output, resumable)."""
    import pandas as _pd

    from fhirflat_ray.functions.exchange import (
        bucketed_map_groups_to_parquet,
        read_exchange_output,
    )

    work = os.path.join(
        "/tmp/fhirflat_ray_gaw", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def agg(g: _pd.DataFrame) -> _pd.DataFrame:
        out = g.groupby("user_id", sort=False)["value"].agg(["count", "sum"])
        return out.reset_index().rename(columns={"count": "n", "sum": "value_sum"})

    bucketed_map_groups_to_parquet(
        ds, ["user_id"], agg, work, num_buckets=32, n_waves=2
    )
    out = read_exchange_output(work)
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n"), "n", b["n"].cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


GROUP_AGG_WAVE_SQL = """
SELECT user_id, count(*) AS n, sum(value) AS value_sum
FROM events GROUP BY user_id
"""


def dedup_passage(sf_dir: str):
    """Passage-level exact dedup (C4/RefinedWeb-style): every later copy of
    a repeated 20-token passage is dropped corpus-wide, documents are
    reassembled from their surviving passages. Two narrow shuffles
    (keep-first per passage text, then per-doc reassembly)."""
    from fhirflat_ray.functions.dedup import passage_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return passage_dedup(ds, id_column="doc_id", column="text", size=20)


DEDUP_PASSAGE_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
g AS (SELECT doc_id, t, unnest(range(0, len(t), 20)) AS s FROM toks),
chunks AS (
  SELECT doc_id, s // 20 AS chunk_idx,
         array_to_string(list_slice(t, s + 1, least(s + 20, len(t))), ' ') AS chunk_text
  FROM g
),
kept AS (
  SELECT doc_id, chunk_idx, chunk_text FROM (
    SELECT *, row_number() OVER (
        PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks) WHERE rn = 1
)
SELECT doc_id,
       string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text,
       count(*) AS n_chunks_kept
FROM kept GROUP BY doc_id
"""


def dedup_minhash(sf_dir: str):
    """MinHash+LSH candidate pairs (rows-only check; LSH is probabilistic by
    construction but fully deterministic under the fixed seed)."""
    from fhirflat_ray.functions.dedup import minhash_lsh_candidates

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_candidates(ds, id_column="doc_id", column="text")


def dedup_simhash(sf_dir: str):
    from fhirflat_ray.functions.dedup import simhash_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_dedup(ds, id_column="doc_id", column="text").select_columns(["doc_id"])


def dedup_near(sf_dir: str):
    """END-TO-END near-dedup (LSH → Jaccard verify → connected components →
    min-id survivors): returns the surviving doc_ids. Rows-only check —
    LSH recall is probabilistic by construction (deterministic under the
    fixed seed, but not ANSI-SQL-expressible); the planted-duplicate pytest
    in tests/test_functions.py asserts exact survivor sets."""
    from fhirflat_ray.functions.dedup import near_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dedup(ds, id_column="doc_id", column="text", threshold=0.7).select_columns(
        ["doc_id"]
    )


def dedup_near_exhaustive(sf_dir: str):
    """The flagship near-dedup's verify → components → survivor machinery
    under a FULL SQL oracle: candidates are ALL pairs (LSH bypassed, the
    same exhaustive-as-oracle trick ``knn_ivf_exhaustive`` plays), then the
    REAL vectorized Jaccard verifier, connected components and min-id
    survivor selection run unchanged. The DuckDB mirror builds the same
    word-5-shingle sets with list ops and closes components with the
    recursive transitive-closure CTE."""
    from fhirflat_ray.functions.dedup import near_dedup_exhaustive

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dedup_exhaustive(
        ds, id_column="doc_id", column="text", threshold=0.7
    ).select_columns(["doc_id"])


DEDUP_NEAR_EXHAUSTIVE_SQL = """
WITH RECURSIVE tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5 THEN
           list_distinct(list_transform(generate_series(1, len(t) - 4),
                                        i -> array_to_string(t[i:i+4], ' ')))
         ELSE [array_to_string(t, ' ')] END AS s
  FROM tok
),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
),
edges AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
)
SELECT node AS doc_id FROM reach GROUP BY node HAVING min(r) = node
"""


def jaccard_join_exact(sf_dir: str):
    """EXACT all-pairs set-similarity self-join (prefix filtering, the
    AllPairs/PPJoin principle): every document pair whose word-5-shingle
    sets have Jaccard >= 7/10, no probabilistic stage anywhere — the exact
    counterpart of the MinHash-LSH candidate path, under a full oracle.

    Scale shape (``functions/setjoin.py:prefix_jaccard_join``): distributed
    df combine -> bounded top-K common-token broadcast (ordering affects
    only candidate volume, never correctness), prefix postings shuffle
    three narrow int64 columns, pairs generate per bucket with the integer
    length filter, and verification is integer math (``10*ni >= 7*union``)
    so SQL mirrors the decision bit-for-bit."""
    from fhirflat_ray.functions.setjoin import prefix_jaccard_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return prefix_jaccard_join(
        ds, id_column="doc_id", text_column="text", k=5, num=7, den=10
    )


JACCARD_JOIN_EXACT_SQL = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5 THEN
           list_distinct(list_transform(generate_series(1, len(t) - 4),
                                        i -> array_to_string(t[i:i+4], ' ')))
         ELSE [array_to_string(t, ' ')] END AS s
  FROM tok
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
 AND len(a.s) * 10 >= len(b.s) * 7 AND len(b.s) * 10 >= len(a.s) * 7
WHERE 10 * len(list_intersect(a.s, b.s))
      >= 7 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
"""


def curriculum_export(sf_dir: str):
    """Flagship composition #3 — the curriculum-export pipeline a training
    run feeds from: quality gate (>= 30 tokens) → length-proportional
    Poisson sample (integer-exact trial) → exact dedup (min-id per content,
    narrow hash shuffle) → range-partitioned GLOBAL sort by descending
    length into 8 contiguous balanced shards with exact ranks. Four
    stages, one narrow shuffle + one all-to-all total, and the whole
    composition sits under ONE SQL oracle because every stage is
    deterministic (hash trials, id tie-breaks, integer math)."""
    from fhirflat_ray.functions.dedup import exact_dedup
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.sort import range_partition_sort
    from fhirflat_ray.functions.text import token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gate_sample(b: pa.Table) -> pa.Table:
        t = token_count_batch(b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ntok >= 30) & (hash32(ids) * np.int64(100) < ntok * np.int64(1 << 32))
        t = t.append_column(
            "neg_tokens", pa.array(-ntok, pa.int64())
        )  # ascending sort key = descending length
        return t.filter(pa.array(keep))

    gated = ds.map_batches(gate_sample, batch_format="pyarrow")
    deduped = exact_dedup(gated, column="text", id_column="doc_id").drop_columns(
        ["text"]
    )
    ranked = range_partition_sort(
        deduped, key_col="neg_tokens", tiebreak_cols=["doc_id"], n_shards=8
    )
    return ranked.select_columns(["doc_id", "n_tokens", "pos", "shard"])


def _curriculum_export_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    return f"""
WITH t AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
f AS (
  SELECT * FROM t
  WHERE n_tokens >= 30 AND {hash32_sql('doc_id')} * 100 < n_tokens * 4294967296
),
d AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text),
j AS (SELECT f.doc_id, f.n_tokens FROM f JOIN d USING (doc_id)),
r AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS pos
  FROM j
)
SELECT doc_id, n_tokens, CAST(pos AS BIGINT) AS pos,
       CAST((pos * 8) // (SELECT count(*) FROM r) AS BIGINT) AS shard
FROM r
"""


CURRICULUM_EXPORT_SQL = _curriculum_export_sql()


def reach_3hop(sf_dir: str):
    """Multi-hop graph reachability (BFS frontier expansion): every node
    within 3 hops of part #1 in the part↔supplier bipartite graph (edges =
    distinct lineitem pairs, nodes namespaced part*2 / supp*2+1 — the
    ``pagerank_partsupp`` graph).

    Scale shape: the edge list stays a distributed Dataset (materialized
    once, scanned once per hop); each hop is a map-only broadcast
    semi-join of edges against the CURRENT frontier (frontiers are
    node-bounded — the standard BFS broadcast assumption; a hash-join
    per hop is the fallback past that). The oracle unrolls the three
    hops as chained DISTINCT joins."""
    import ray

    from fhirflat_ray.functions.util import collect_small_table, distinct_rows

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        p = b["l_partkey"].to_numpy(zero_copy_only=False) * 2
        s = b["l_suppkey"].to_numpy(zero_copy_only=False) * 2 + 1
        return pa.table(
            {
                "u": pa.array(np.concatenate([p, s]), pa.int64()),
                "v": pa.array(np.concatenate([s, p]), pa.int64()),
            }
        )

    edges = distinct_rows(
        li.map_batches(to_edges, batch_format="pyarrow"), ["u", "v"]
    ).materialize()

    seed = np.array([2], dtype=np.int64)  # part #1 → node 1*2
    visited = set(seed.tolist())
    frontier = seed
    for _ in range(3):
        if len(frontier) == 0:
            break
        fref = ray.put(np.sort(frontier))

        def expand(b: pa.Table) -> pa.Table:
            f = ray.get(fref)
            u = b["u"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(f, u), 0, len(f) - 1)
            hit = f[pos] == u
            return pa.table({"v": pa.array(np.unique(b["v"].to_numpy(zero_copy_only=False)[hit]), pa.int64())})

        nxt_t = collect_small_table(edges.map_batches(expand, batch_format="pyarrow"))
        nxt = np.unique(nxt_t["v"].to_numpy(zero_copy_only=False))
        frontier = np.array(
            [n for n in nxt.tolist() if n not in visited], dtype=np.int64
        )
        visited.update(frontier.tolist())

    out = np.array(sorted(visited), dtype=np.int64)
    return pa.table({"node": pa.array(out, pa.int64())})


REACH_3HOP_SQL = """
WITH e AS (
  SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v FROM lineitem
  UNION
  SELECT DISTINCT l_suppkey * 2 + 1 AS u, l_partkey * 2 AS v FROM lineitem
),
h0 AS (SELECT CAST(2 AS BIGINT) AS node),
h1 AS (SELECT DISTINCT e.v AS node FROM e JOIN h0 ON e.u = h0.node),
h2 AS (SELECT DISTINCT e.v AS node FROM e JOIN h1 ON e.u = h1.node),
h3 AS (SELECT DISTINCT e.v AS node FROM e JOIN h2 ON e.u = h2.node)
SELECT node FROM h0 UNION SELECT node FROM h1
UNION SELECT node FROM h2 UNION SELECT node FROM h3
"""


def value_trend_by_type(sf_dir: str):
    """Grouped bivariate regression: per event type, the least-squares
    slope of value over time (hours since 1997-01-01 — the
    centering constant keeps x² sums ~1e13 so float combine-order noise
    sits ~1e-16 relative, invisible at 6dp). One moment row per (batch,
    type) leaves the map stage — n, Σx, Σy, Σx², Σxy — and the closed form
    is mirrored expression-for-expression in SQL (the ``qty_price_corr``
    discipline, grouped)."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import agg_select

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    epoch0 = 852076800000000  # 1997-01-01 in epoch microseconds

    def partial(b: pa.Table) -> pa.Table:
        x = (
            b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) - epoch0
        ) / 3.6e9
        y = b["value"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x, pa.float64()),
                "sy": pa.array(y, pa.float64()),
                "sxx": pa.array(x * x, pa.float64()),
                "sxy": pa.array(x * y, pa.float64()),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxx", "sum"), ("sxy", "sum")]
        )
        return agg_select(
            g,
            {
                "event_type": "event_type",
                "n_sum": "n",
                "sx_sum": "sx",
                "sy_sum": "sy",
                "sxx_sum": "sxx",
                "sxy_sum": "sxy",
            },
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        denom = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / denom
        # degenerate group (single row / constant ts): SQL's division by
        # zero yields NULL — mirror with a null, not nan/inf
        slope = np.where(denom == 0, np.nan, slope)
        # no intercept column: at-origin intercept = (Σy - slope·Σx)/n
        # amplifies combine-order float noise through the slope·Σx
        # cancellation (~1e-5 at this magnitude — measured), while the
        # slope itself is stable well past 6dp
        return pa.table(
            {
                "event_type": b["event_type"],
                "n": b["n"],
                "slope_6dp": pa.array(
                    np.round(slope, 6), pa.float64(), from_pandas=True
                ),  # from_pandas=True maps the nan sentinel to a NULL
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


VALUE_TREND_BY_TYPE_SQL = """
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         sum((CAST(epoch_us(ts) AS BIGINT) - 852076800000000) / 3.6e9) AS sx,
         sum(value) AS sy,
         sum(((CAST(epoch_us(ts) AS BIGINT) - 852076800000000) / 3.6e9)
             * ((CAST(epoch_us(ts) AS BIGINT) - 852076800000000) / 3.6e9)) AS sxx,
         sum(((CAST(epoch_us(ts) AS BIGINT) - 852076800000000) / 3.6e9) * value) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_6dp
FROM m
"""


def split_kl_divergence(sf_dir: str):
    """Distribution drift between two corpus splits: KL(P_even || P_odd)
    over unigram token distributions with add-one smoothing on the union
    vocabulary — the drift monitor a training mixture runs between crawl
    snapshots or train/val splits.

    Scale shape: per-batch (term, side) count partials (one row per
    in-batch distinct term — the A5 combiner), ONE term-bucket combine
    shuffle, a bounded totals aggregate, then a map-only contribution pass
    with the three scalars broadcast; the float sum is rounded to 6dp and
    the SQL mirrors the smoothing/ln expression term-for-term (the
    ``doc_surprisal``/``qty_price_corr`` discipline)."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        collect_small_table,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(pc.fill_null(pc.utf8_lower(b["text"]), ""))
        parts = pc.split_pattern_regex(txt, r"\s+")
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        own = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        is_even = (b["doc_id"].to_numpy(zero_copy_only=False) % 2 == 0)[own]
        t = pa.table(
            {
                "t": flat,
                "a": pa.array(is_even.astype(np.int64), pa.int64()),
                "b": pa.array((~is_even).astype(np.int64), pa.int64()),
            }
        ).filter(pc.not_equal(flat, ""))
        g = t.group_by(["t"]).aggregate([("a", "sum"), ("b", "sum")])
        return agg_select(g, {"t": "t", "a_sum": "ca", "b_sum": "cb"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("t", as_index=False, sort=False)[["ca", "cb"]].sum()

    counts = bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), ["t"], combine
    ).materialize()

    tot = counts.aggregate(Sum("ca", alias_name="na"), Sum("cb", alias_name="nb"))
    na, nb = int(tot["na"]), int(tot["nb"])
    v = counts.count()

    def contrib(b: pa.Table) -> pa.Table:
        ca = b["ca"].to_numpy(zero_copy_only=False).astype(np.float64)
        cb = b["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        pa_ = (ca + 1.0) / (na + v)
        pb_ = (cb + 1.0) / (nb + v)
        return pa.table(
            {"kl": pa.array([float(np.sum(pa_ * np.log(pa_ / pb_)))], pa.float64())}
        )

    t = collect_small_table(counts.map_batches(contrib, batch_format="pyarrow"))
    kl = round(float(pc.sum(t["kl"]).as_py() or 0.0), 6)
    return pd.DataFrame(
        [(v, na, nb, kl)], columns=["vocab", "tokens_even", "tokens_odd", "kl_6dp"]
    )


SPLIT_KL_DIVERGENCE_SQL = """
WITH tok AS (
  SELECT doc_id % 2 AS side,
         unnest(regexp_extract_all(lower(text), '\\S+')) AS t
  FROM documents
),
c AS (
  SELECT t,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM tok GROUP BY t
),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
               count(*) AS v FROM c)
SELECT v AS vocab, na AS tokens_even, nb AS tokens_odd,
       round(sum(((ca + 1.0) / (na + v)) * ln(((ca + 1.0) / (na + v))
                 / ((cb + 1.0) / (nb + v)))), 6) AS kl_6dp
FROM c, tot GROUP BY v, na, nb
"""


def dedup_incremental(sf_dir: str):
    """Incremental dedup against a PERSISTED MinHash band index: corpus =
    4/5 of the documents (indexed once to ``/tmp``, band postings
    hash-partitioned so probes prune at the read), new batch = the other
    1/5; returns the new docs that are NOT near-duplicates of the corpus —
    the crawl-increment flow a growing training corpus runs. Rows-only
    (LSH recall is probabilistic by construction; the planted-index pytest
    covers link correctness)."""
    import hashlib as _h
    import shutil as _sh

    from fhirflat_ray.functions.dedup import build_minhash_index, incremental_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _split(keep_new: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 5 == 0) if keep_new else (ids % 5 != 0)
            return b.filter(pa.array(m))

        return f

    corpus = ds.map_batches(_split(False), batch_format="pyarrow")
    new = ds.map_batches(_split(True), batch_format="pyarrow")
    idx = os.path.join(
        "/tmp/fhirflat_ray_mhidx", _h.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    _sh.rmtree(idx, ignore_errors=True)
    build_minhash_index(corpus, idx)
    links, survivors = incremental_dedup(new, corpus, idx)
    return survivors.select_columns(["doc_id"])


def dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dedup, EXACT variant: every pair with cosine
    >= 0.45 is an edge, keep min-id per connected component. Fully
    oracle-checked — the DuckDB oracle computes the same components with a
    recursive transitive-closure CTE."""
    from fhirflat_ray.functions.dedup import cosine_dedup_exact

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_dedup_exact(ds, threshold=0.45).select_columns(["vec_id"])


DEDUP_EMBEDDING_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
),
edges AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
reach(node, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
)
SELECT node AS vec_id FROM reach GROUP BY node HAVING min(r) = node
"""


def dedup_embedding_lsh(sf_dir: str):
    """Embedding-cosine near-dedup, LSH scale path: banded hyperplane
    signatures sized from the threshold (OR-construction), ids-only
    candidate shuffle, exact-cosine verification. Rows-only — LSH recall is
    probabilistic by construction (deterministic under the fixed seed)."""
    from fhirflat_ray.functions.dedup import cosine_dedup_lsh

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_dedup_lsh(ds, threshold=0.45).select_columns(["vec_id"])


def dedup_embedding_auto(sf_dir: str):
    """The single ``cosine_dedup`` entry point (size-dispatching: exact
    below the broadcast cell cap, banded LSH above). At oracle scale it
    takes the exact path, so the dispatcher sits under the SAME recursive
    transitive-closure oracle as ``dedup_embedding``."""
    from fhirflat_ray.functions.dedup import cosine_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_dedup(ds, threshold=0.45).select_columns(["vec_id"])


def dedup_simhash_near(sf_dir: str):
    """Hamming-k (k=3) SimHash near-dedup via pigeonhole chunk re-bucketing
    (rows-only check, same reasoning as dedup_near)."""
    from fhirflat_ray.functions.dedup import simhash_near_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dedup(ds, id_column="doc_id", column="text", k=3).select_columns(
        ["doc_id"]
    )


# =====================================================================
# Similarity search
# =====================================================================


def _load_queries(sf_dir: str, n: int = 4):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    t = t.filter(pc.less(t["vec_id"], n)).sort_by("vec_id")
    ids = t["vec_id"].to_pylist()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    return ids, vecs


def knn_bruteforce(sf_dir: str):
    """Exact cosine top-10 for query vectors vec_id<4 (ints only returned so
    the value-hash is float-rounding-proof)."""
    from fhirflat_ray.functions.similarity import knn_bruteforce as knn

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids, vecs = _load_queries(sf_dir)
    out = knn(ds, ids, vecs, k=10)
    return out.select_columns(["query_id", "vec_id", "rank"])


KNN_BRUTEFORCE_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
s AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM s
)
SELECT qid AS query_id, vec_id, CAST(rk AS BIGINT) AS rank FROM r WHERE rk <= 10
"""


def hard_negatives_mining(sf_dir: str):
    """Hard-negative mining for contrastive training: top-5 highest-cosine
    DIFFERENT-label neighbours per query vector (vec_id<4). Queries+labels
    broadcast once; corpus pass is one masked matmul per batch; ints only
    returned so the value-hash is float-rounding-proof."""
    from fhirflat_ray.functions.similarity import hard_negatives

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    t = t.filter(pc.less(t["vec_id"], 4)).sort_by("vec_id")
    ids = t["vec_id"].to_pylist()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    labels = t["label"].to_pylist()

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    out = hard_negatives(ds, ids, vecs, labels, k=5)

    def name_neg(b: pa.Table) -> pa.Table:
        return b.select(["query_id", "vec_id", "rank"]).rename_columns(
            ["query_id", "neg_id", "rank"]
        )

    return out.map_batches(name_neg, batch_format="pyarrow")


HARD_NEGATIVES_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
           FROM embeddings WHERE vec_id < 4),
s AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.label <> q.ql
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM s
)
SELECT qid AS query_id, vec_id AS neg_id, CAST(rk AS BIGINT) AS rank
FROM r WHERE rk <= 5
"""


def mmr_diverse_select(sf_dir: str):
    """Maximal-marginal-relevance selection (Carbonell & Goldstein 1998):
    pick 3 vectors that are relevant to the query (vec_id 0's embedding)
    but mutually diverse — the diverse-example curation primitive. Each
    round is one map-only corpus pass (query + selected set broadcast,
    one best row per block reduced on the driver)."""
    from fhirflat_ray.functions.similarity import mmr_select

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = np.asarray(
        t.filter(pc.equal(t["vec_id"], 0))["embedding"][0].as_py(), dtype=np.float64
    )
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).filter(
        expr="vec_id >= 1"
    )
    return mmr_select(ds, qvec, k=3, lam=0.7)


def _mmr_sql(k: int = 3, lam: float = 0.7) -> str:
    def lcs(a: str, b: str) -> str:
        # DOUBLE[] cast: float32 cosine error (~1e-6) could flip a
        # near-tied argmax between the two engines
        return (
            f"list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        )

    parts = [
        "WITH qv AS MATERIALIZED (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),",
        "cand AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 1)",
    ]
    for r in range(1, k + 1):
        froms = "cand c, qv" + "".join(f", s{i}" for i in range(1, r))
        excl = (
            " WHERE " + " AND ".join(f"c.vec_id <> s{i}.vec_id" for i in range(1, r))
            if r > 1
            else ""
        )
        if r == 1:
            pen = "0.0"
        elif r == 2:
            pen = lcs("s1.embedding", "c.embedding")
        else:
            pens = ", ".join(
                lcs(f"s{i}.embedding", "c.embedding") for i in range(1, r)
            )
            pen = f"greatest({pens})"
        parts.append(
            f""",
s{r} AS MATERIALIZED (
  SELECT c.vec_id, c.embedding
  FROM {froms}{excl}
  ORDER BY {lam} * {lcs('qv.qe', 'c.embedding')} - {1.0 - lam:.1f} * {pen} DESC,
           c.vec_id
  LIMIT 1)"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {r}::BIGINT AS sel_rank, vec_id FROM s{r}" for r in range(1, k + 1)
    )
    return "\n".join(parts) + "\n" + sel


MMR_DIVERSE_SQL = _mmr_sql(3, 0.7)


def embed_quantize(sf_dir: str):
    """Symmetric per-vector int8 quantization of the embedding column
    (map-only): per-vector scale + exact-integer code checksums. The
    half-up rule is written as ``floor(x + 0.5)`` in BOTH engines so the
    codes are bit-identical and the checksums hash-proof — the lossy
    compression operator a training pipeline applies before shipping
    vectors (4x smaller than float32), with the quantizer itself under a
    full oracle."""
    from fhirflat_ray.functions.similarity import quantize_stats_batch

    return _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        quantize_stats_batch, batch_format="pyarrow"
    )


EMBED_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id, scale,
         list_transform(
           v, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(floor(x / scale + 0.5) AS BIGINT) END
         ) AS qc
  FROM s
)
SELECT vec_id,
       CAST(list_sum(qc) AS BIGINT) AS qsum,
       CAST(list_sum(list_transform(qc, c -> c * c)) AS BIGINT) AS qnorm2,
       ROUND(scale, 9) AS scale
FROM q
"""


def knn_quantized(sf_dir: str):
    """Approximate top-10 under int8-quantized dot product — and still a
    FULL oracle: the ranking float is the single product
    ``int_dot * corpus_scale`` (query scale is a positive per-query
    constant, dropped), the same IEEE expression the SQL computes, so even
    this approximate index's results are hash-checkable, not just
    recall-tested."""
    from fhirflat_ray.functions.similarity import knn_quantized as knn

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids, vecs = _load_queries(sf_dir)
    out = knn(ds, ids, vecs, k=10)
    return out.select_columns(["query_id", "vec_id", "rank"])


KNN_QUANTIZED_SQL = """
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), z AS (
  SELECT vec_id, scale,
         list_transform(
           v, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(floor(x / scale + 0.5) AS BIGINT) END
         ) AS qc
  FROM s
), q AS (
  SELECT vec_id AS qid, qc AS qqc FROM z WHERE vec_id < 4
), sc AS (
  SELECT q.qid, e.vec_id,
         CAST(list_dot_product(q.qqc, e.qc) AS DOUBLE) * e.scale AS qsim
  FROM q CROSS JOIN z e
), r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY qsim DESC, vec_id) AS rk
  FROM sc
)
SELECT qid AS query_id, vec_id, CAST(rk AS BIGINT) AS rank FROM r WHERE rk <= 10
"""


def knn_ivf(sf_dir: str):
    """IVF-bucketed approximate variant (rows-only check)."""
    from fhirflat_ray.functions.similarity import knn_ivf as knn

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids, vecs = _load_queries(sf_dir)
    out = knn(ds, ids, vecs, k=10)
    return out.select_columns(["query_id", "vec_id", "rank"])


def knn_ivf_exhaustive(sf_dir: str):
    """IVF with nprobe = n_centroids: every cell probed, so the result must
    EQUAL exact brute force — this puts the whole IVF machinery (centroid
    build, assignment, cell pruning, scoring, global top-k) under the same
    DuckDB oracle as ``knn_bruteforce`` instead of a rows-only check."""
    from fhirflat_ray.functions.similarity import knn_ivf as knn

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids, vecs = _load_queries(sf_dir)
    out = knn(ds, ids, vecs, k=10, n_centroids=8, nprobe=8)
    return out.select_columns(["query_id", "vec_id", "rank"])


def knn_ivf_persisted(sf_dir: str):
    """Query the PERSISTED IVF index (centroids file + cell-partitioned
    corpus, built once per sf_dir and cached): with nprobe = n_centroids
    every cell is read, so the whole persisted path (partitioned write,
    centroid reload, cell-pruned read, scoring, global top-k) sits under
    the brute-force DuckDB oracle. Repeat queries skip the corpus scan
    entirely — only the probed partition directories are read."""
    from fhirflat_ray.functions.similarity import build_ivf_index, knn_ivf_persisted as knnp

    index_dir = os.path.join(
        "/tmp/fhirflat_ray_ivf", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    marker = os.path.join(index_dir, "_complete")
    if not os.path.exists(marker):
        shutil.rmtree(index_dir, ignore_errors=True)
        ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        build_ivf_index(ds, index_dir, n_centroids=8)
        open(marker, "w").close()
    ids, vecs = _load_queries(sf_dir)
    out = knnp(index_dir, ids, vecs, k=10, nprobe=8)
    return out.select_columns(["query_id", "vec_id", "rank"])


def flatten_props(sf_dir: str):
    """M1/M8 struct-flatten on live data: parse the ``props`` JSON column
    into a struct, run the real ``flatten_batch`` (dotted names), aggregate
    the flattened leaf per event_type."""
    from ray.data.aggregate import Count, Sum

    from fhirflat_ray.stages.flatten import flatten_batch

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def parse_and_flatten(batch: pa.Table) -> pa.Table:
        k = pc.extract_regex(batch["props"], r'"k": (?P<k>-?\d+)')
        kv = pc.struct_field(k, [0]).cast(pa.int64())
        nested = pa.table(
            {
                "event_type": batch["event_type"],
                "props": pa.StructArray.from_arrays([kv.combine_chunks()], ["k"]),
            }
        )
        return flatten_batch(nested)  # → event_type, props.k

    flat = ds.map_batches(parse_and_flatten, batch_format="pyarrow")
    out = flat.groupby("event_type").aggregate(
        Sum("props.k", alias_name="sum_k"), Count(alias_name="n")
    )
    return out


FLATTEN_PROPS_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def schema_check(sf_dir: str):
    """Typed schema validation under a FULL SQL oracle: run the documents
    table through ``validate_schema`` (enum + range rules chosen to produce
    real violations) and return the error rows. First-error-wins column
    order matches the oracle's CASE evaluation order exactly."""
    from fhirflat_ray.pipelines.verify import validate_schema

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    spec = {
        "doc_id": {"nullable": False, "min": 0},
        "lang": {"enum": ["en", "de", "fr", "es"]},  # zh rows become errors
        "n_chars": {"min": 100},
    }
    marked = validate_schema(ds, spec)
    return marked.filter(expr="_error != ''").select_columns(["doc_id", "_error"])


SCHEMA_CHECK_SQL = """
SELECT doc_id, _error FROM (
  SELECT doc_id,
         CASE
           WHEN doc_id IS NULL THEN 'null doc_id'
           WHEN doc_id < 0 THEN 'doc_id below min 0'
           WHEN lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')
             THEN 'lang not in enum'
           WHEN n_chars IS NOT NULL AND n_chars < 100
             THEN 'n_chars below min 100'
           ELSE ''
         END AS _error
  FROM documents
) WHERE _error != ''
"""


def validate_errors(sf_dir: str):
    """Valid/error routing over a transcript table with injected defects
    (duplicate (conv, turn) rows) — the reference's validation split
    (/root/reference/fhirflat/resources/base.py:89-149). The injected rows
    are the 10 SMALLEST (conv_id, turn_idx) keys (streaming top-k), so the
    error set is deterministic and the check runs a FULL SQL oracle."""
    import ray.data as rd

    from fhirflat_ray.pipelines.verify import split_valid, validate_transcripts

    from fhirflat_ray.functions.util import streaming_topk

    built = transcript_build(sf_dir)
    # inject defects via a streaming union: duplicate 10 rows (same
    # (conv_id, turn_idx)) — only those 10 rows ever touch the driver, and
    # picking them is per-block local top-k + driver merge (map-only; the
    # round-2 sort().limit(10) here was a full-corpus all-to-all sort);
    # the built dataset itself streams through validate → split
    dupes = streaming_topk(built, ["conv_id", "turn_idx"], 10)
    defective = built.union(rd.from_arrow(dupes))
    marked = validate_transcripts(defective)
    _, errors = split_valid(marked)
    return errors.select_columns(["conv_id", "turn_idx", "_error"])


VALIDATE_ERRORS_SQL = """
WITH built AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx
  FROM events
)
SELECT conv_id, turn_idx, 'duplicate (conv_id, turn_idx)' AS _error
FROM built ORDER BY conv_id, turn_idx LIMIT 10
"""


# =====================================================================
# Sampling / splitting / quantiles / range join / per-key top-k
# (corpus-pipeline extensions past the reference surface — the reference
# has no sampling, quantile or interval-join machinery at all)
# =====================================================================


def sample_split(sf_dir: str):
    """Deterministic train/val/test split (80/10/10 by multiplicative hash
    of event_id — map-only, partition-independent), then per-split count +
    value sum. The hash is int64-safe arithmetic shared verbatim with the
    SQL oracle (see ``functions/sampling.py``)."""
    from fhirflat_ray.functions.sampling import hash_split
    from fhirflat_ray.functions.util import agg_select
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    ds = hash_split(ds, "event_id", [("train", 80), ("val", 10), ("test", 10)])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["split", "value"]).group_by(["split"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )
        return agg_select(g, {"split": "split", "value_sum": "sum_value", "count_all": "n"})

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("split").aggregate(
        Sum("sum_value", alias_name="sum_value"), Sum("n", alias_name="n")
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_value"),
            "sum_value",
            pc.round(batch["sum_value"], ndigits=2),
        )

    return out.map_batches(rnd, batch_format="pyarrow")


def _sample_split_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql, split_thresholds

    th = split_thresholds([("train", 80), ("val", 10), ("test", 10)])
    h = hash32_sql("event_id")
    return f"""
SELECT CASE WHEN {h} < {th[0][1]} THEN 'train'
            WHEN {h} < {th[1][1]} THEN 'val'
            ELSE 'test' END AS split,
       round(sum(value), 2) AS sum_value,
       count(*) AS n
FROM events GROUP BY 1
"""


def top_docs_per_lang(sf_dir: str):
    """Top-3 longest documents PER language — exact per-key top-k via local
    prune + coarse-bucket shuffle (``topk_per_key``), no global sort."""
    from fhirflat_ray.functions.util import topk_per_key

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return topk_per_key(
        ds, ["lang"], 3, ["n_chars", "doc_id"], descending=[True, False]
    )


TOP_DOCS_PER_LANG_SQL = """
SELECT doc_id, lang, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 3
"""


def range_join_agg(sf_dir: str):
    """Broadcast interval join: 25 deterministically-derived OVERLAPPING
    time intervals (stride = span/25, width = 1.5x stride, so a third of
    events match two intervals) joined against the events stream, then a
    per-interval partial aggregate. Interval bounds are integer-us
    arithmetic shared exactly with the SQL oracle."""
    from fhirflat_ray.functions.joins import broadcast_range_join
    from fhirflat_ray.functions.util import agg_select
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    mm = ds.aggregate(Min("ts"), Max("ts"))
    tmin = int(pd.Timestamp(mm["min(ts)"]).value // 1000)
    tmax = int(pd.Timestamp(mm["max(ts)"]).value // 1000)
    width = (tmax - tmin) // 25
    starts = np.array([tmin + i * width for i in range(25)], dtype=np.int64)
    iv = pa.table(
        {
            "interval_id": pa.array(np.arange(25, dtype=np.int64)),
            "start_us": pa.array(starts),
            "end_us": pa.array(starts + (3 * width) // 2),
        }
    )
    joined = broadcast_range_join(ds, iv, "ts")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["interval_id", "value"]).group_by(["interval_id"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )
        return agg_select(
            g, {"interval_id": "interval_id", "value_sum": "sum_value", "count_all": "n_events"}
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("interval_id")
        .aggregate(Sum("sum_value", alias_name="sum_value"), Sum("n_events", alias_name="n_events"))
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_value"),
            "sum_value",
            pc.round(batch["sum_value"], ndigits=2),
        )

    return out.map_batches(rnd, batch_format="pyarrow")


RANGE_JOIN_AGG_SQL = """
WITH b AS (SELECT epoch_us(min(ts)) AS tmin, epoch_us(max(ts)) AS tmax FROM events),
     iv AS (SELECT i AS interval_id,
                   tmin + i * ((tmax - tmin) // 25) AS s,
                   tmin + i * ((tmax - tmin) // 25) + (3 * ((tmax - tmin) // 25)) // 2 AS e
            FROM range(0, 25) t(i), b)
SELECT iv.interval_id,
       round(sum(e2.value), 2) AS sum_value,
       count(*) AS n_events
FROM iv JOIN events e2 ON epoch_us(e2.ts) >= iv.s AND epoch_us(e2.ts) < iv.e
GROUP BY iv.interval_id
"""


def quantiles_qty(sf_dir: str):
    """Exact discrete quantiles of l_quantity via distributed value counts
    (one row per distinct value leaves each block; merge is O(distinct)).
    Matches DuckDB ``quantile_disc`` semantics exactly."""
    from fhirflat_ray.functions.quantiles import quantile_disc

    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])
    return quantile_disc(ds, "l_quantity", [0.25, 0.5, 0.75, 0.9])


QUANTILES_QTY_SQL = """
SELECT CAST(0.25 AS DOUBLE) AS q, CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS value FROM lineitem
UNION ALL SELECT CAST(0.5 AS DOUBLE), CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) FROM lineitem
UNION ALL SELECT CAST(0.75 AS DOUBLE), CAST(quantile_disc(l_quantity, 0.75) AS DOUBLE) FROM lineitem
UNION ALL SELECT CAST(0.9 AS DOUBLE), CAST(quantile_disc(l_quantity, 0.9) AS DOUBLE) FROM lineitem
"""


def quantiles_cont_value(sf_dir: str):
    """Exact INTERPOLATED quantiles of the continuous event value column
    (``quantile_cont`` semantics: position q*(n-1), linear interpolation) —
    same distributed value-count shape as the discrete variant."""
    from fhirflat_ray.functions.quantiles import quantile_cont

    ds = _read(sf_dir, "events", columns=["value"])
    t = quantile_cont(ds, "value", [0.25, 0.5, 0.75, 0.99])
    return t.set_column(
        t.column_names.index("value"), "value", pc.round(t["value"], ndigits=6)
    )


QUANTILES_CONT_VALUE_SQL = """
SELECT CAST(0.25 AS DOUBLE) AS q, round(quantile_cont(value, 0.25), 6) AS value FROM events
UNION ALL SELECT CAST(0.5 AS DOUBLE), round(quantile_cont(value, 0.5), 6) FROM events
UNION ALL SELECT CAST(0.75 AS DOUBLE), round(quantile_cont(value, 0.75), 6) FROM events
UNION ALL SELECT CAST(0.99 AS DOUBLE), round(quantile_cont(value, 0.99), 6) FROM events
"""


_HOP_US = 30 * 60 * 1_000_000  # 30-minute hop, 1-hour windows


def hopping_window(sf_dir: str):
    """Hopping (sliding) event-time windows: 1-hour windows every 30 min,
    per-window count + value sum. Expansion happens per batch and collapses
    to window partials BEFORE the shuffle (see ``hopping_aggregate``)."""
    from fhirflat_ray.functions.windows import hopping_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    out = hopping_aggregate(ds, "ts", 2 * _HOP_US, _HOP_US, value_col="value")

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_v"),
            "sum_v",
            pc.round(batch["sum_v"], ndigits=2),
        )

    return out.map_batches(rnd, batch_format="pyarrow")


HOPPING_WINDOW_SQL = f"""
WITH e AS (SELECT epoch_us(ts) AS t, value FROM events),
     w AS (SELECT (t // {_HOP_US}) * {_HOP_US} - i * {_HOP_US} AS ws, value
           FROM e, range(0, 2) r(i))
SELECT ws, count(*) AS n, round(sum(value), 2) AS sum_v
FROM w GROUP BY ws
"""


def users_intersect(sf_dir: str):
    """Distinct user_ids with BOTH a purchase and an error event — keyed
    set intersection via per-batch distinct pre-reduce + bucketed OR."""
    from fhirflat_ray.functions.util import intersect_keys

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    a = ds.filter(expr="event_type == 'purchase'").select_columns(["user_id"])
    b = ds.filter(expr="event_type == 'error'").select_columns(["user_id"])
    return intersect_keys(a, b, "user_id")


USERS_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def users_except(sf_dir: str):
    """Distinct user_ids with a high-value purchase but NO high-value error
    (SQL EXCEPT) — the set-difference sibling of `users_intersect`, same
    tagged-union + coarse-bucket machinery
    (`functions/util.py:except_keys`)."""
    from fhirflat_ray.functions.util import except_keys

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
    a = ds.filter(expr="event_type == 'purchase' and value > 80").select_columns(
        ["user_id"]
    )
    b = ds.filter(expr="event_type == 'error' and value > 80").select_columns(
        ["user_id"]
    )
    return except_keys(a, b, "user_id")


USERS_EXCEPT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 80
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 80
"""


def stratified_sample(sf_dir: str):
    """Deterministic exact-n-per-stratum sample: the 10 documents with the
    SMALLEST id-hash per language — a uniform-without-replacement sample
    that is reproducible across runs and partitionings, computed as
    per-key top-k on the hash (local prune + coarse-bucket shuffle)."""
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.util import topk_per_key

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def add_h(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("h", pa.array(hash32(ids), pa.int64()))

    sampled = topk_per_key(
        ds.map_batches(add_h, batch_format="pyarrow"),
        ["lang"],
        10,
        ["h", "doc_id"],
        descending=False,
    )
    return sampled.select_columns(["doc_id", "lang"])


def _stratified_sample_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    return f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY {hash32_sql('doc_id')}, doc_id) <= 10
"""


def _join_partitions(sf_dir: str, tables: list[str]) -> int:
    """Hash-join partition count sized by DATA bytes, not CPU count.

    Ray's hash-shuffle join provisions one aggregator actor per partition,
    so the partition count is a real cost: at test scale a 25 MB join with
    32 partitions spends 15 s provisioning actors to do 2 s of work
    (measured on this host). Size partitions at ~128 MB of the largest
    input — a handful at test scale, thousands at 100 TB — capped at 4x
    cluster CPUs (the shuffle's useful parallelism) and floored at 4."""
    import ray

    biggest = max(
        os.path.getsize(os.path.join(sf_dir, f"{t}.parquet")) for t in tables
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    by_bytes = -(-biggest // (128 << 20))  # ceil
    return int(min(max(4, by_bytes), max(8, cpus * 4)))


def customer_order_counts(sf_dir: str):
    """LEFT OUTER join coverage: every customer with its order count and
    cents-rounded total spend — zero-order customers included with 0/0.0.

    Scale shape: the big side (orders) collapses to one row per customer
    BEFORE the join (Arrow partial aggregate per batch + coarse-bucket
    final combine), so the left-outer hash exchange moves |customers| +
    |distinct custkeys| rows — never raw orders. The aggregated side is
    repartitioned first (groupby-derived empty blocks break acero's
    FieldRef resolution otherwise)."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    n_parts = _join_partitions(sf_dir, ["customer", "orders"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]
        )
        return agg_select(
            g,
            {"o_custkey": "o_custkey", "count_all": "n", "o_totalprice_sum": "t"},
        )

    partials = orders.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_custkey", sort=False, as_index=False).agg(
            n=("n", "sum"), t=("t", "sum")
        )

    per_cust = bucketed_map_groups(partials, ["o_custkey"], final).repartition(
        max(4, n_parts)
    )

    j = cust.join(
        per_cust, "left_outer", n_parts, on=("c_custkey",), right_on=("o_custkey",)
    )

    def fill(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "n_orders": pc.fill_null(pc.cast(b["n"], pa.int64()), 0),
                # exact integer cents: at 1e6+ magnitudes two engines' round(2)
                # can land on ADJACENT doubles (spacing ~5e-10), which the
                # oracle canonicalizer cannot normalize; *100 → rint → int64
                # is error-free because true sums are multiples of 0.01
                "total_cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.fill_null(b["t"], pa.scalar(0.0, pa.float64())),
                            pa.scalar(100.0),
                        ),
                        0,
                    ),
                    pa.int64(),
                ),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow")


def nation_coverage_full_outer(sf_dir: str):
    """FULL OUTER join coverage: per-nation counts of BUILDING-segment
    customers vs high-balance suppliers, keeping nations that have only one
    side (the other side fills 0). Same aggregate-before-join shape as the
    left-outer query: both sides collapse to one row per nation before the
    `Dataset.join(full_outer)` exchange."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    def side(table: str, key: str, filt, out_key: str, out_n: str):
        ds = _read(sf_dir, table)
        ds = ds.map_batches(filt, batch_format="pyarrow")

        def partial(b: pa.Table) -> pa.Table:
            g = b.group_by([key]).aggregate([([], "count_all")])
            return agg_select(g, {key: out_key, "count_all": out_n})

        partials = ds.map_batches(partial, batch_format="pyarrow")

        def final(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(out_key, sort=False, as_index=False).agg(**{out_n: (out_n, "sum")})

        agg = bucketed_map_groups(partials, [out_key], final)

        # pin the schema before the join: groupby pipelines can emit
        # schema-less empty blocks that poison acero FieldRef resolution
        # (the hash_anti_join coerce+repartition discipline, joins.py)
        target = pa.schema([(out_key, pa.int64()), (out_n, pa.int64())])

        def coerce(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or out_key not in b.column_names:
                return target.empty_table()
            return pa.table(
                {out_key: b[out_key].cast(pa.int64()), out_n: b[out_n].cast(pa.int64())}
            )

        return agg.map_batches(coerce, batch_format="pyarrow").repartition(2)

    cust = side(
        "customer",
        "c_nationkey",
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).select(
            ["c_nationkey"]
        ),
        "c_nk",
        "n_cust",
    )
    supp = side(
        "supplier",
        "s_nationkey",
        lambda b: b.filter(pc.greater(b["s_acctbal"], 4000.0)).select(
            ["s_nationkey"]
        ),
        "s_nk",
        "n_supp",
    )

    # one join partition: both sides are per-NATION aggregates (bounded by
    # the nation count at any data scale), and Ray's hash-join finalize
    # KeyErrors when a partition receives zero blocks of one side — with
    # nation-bounded sides a multi-partition exchange buys nothing anyway
    j = cust.join(supp, "full_outer", 1, on=("c_nk",), right_on=("s_nk",))

    def fill(b: pa.Table) -> pa.Table:
        # acero full-outer joins COALESCE the key columns: the output carries
        # one "c_nk" already populated for right-only rows
        return pa.table(
            {
                "nationkey": pc.cast(b["c_nk"], pa.int64()),
                "n_cust": pc.fill_null(pc.cast(b["n_cust"], pa.int64()), 0),
                "n_supp": pc.fill_null(pc.cast(b["n_supp"], pa.int64()), 0),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow")


NATION_COVERAGE_SQL = """
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_supp
FROM (
  SELECT c_nationkey AS nk, COUNT(*) AS n FROM customer
  WHERE c_mktsegment = 'BUILDING' GROUP BY 1
) c
FULL OUTER JOIN (
  SELECT s_nationkey AS nk, COUNT(*) AS n FROM supplier
  WHERE s_acctbal > 4000.0 GROUP BY 1
) s ON c.nk = s.nk
"""


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
       CAST(round(COALESCE(o.t, 0.0) * 100, 0) AS BIGINT) AS total_cents
FROM customer c
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n, SUM(o_totalprice) AS t
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


def q3_top_orders(sf_dir: str):
    """TPC-H-Q3-shaped 3-way join + high-cardinality aggregate + top-k.

    Scale shape: the two big sides (orders x lineitem) and the filtered
    customer key set meet in distributed hash joins (``Dataset.join`` —
    hash-partitioned, neither side materializes; at 100 TB even the
    filtered customer set is not broadcastable). The per-ORDER revenue
    aggregate is high-cardinality, so it is a per-batch Arrow partial
    combine followed by a coarse-bucket final pass (Python per bucket, not
    per key), and the top-10 is streaming per-block top-k + driver merge —
    no global sort ever enters the plan."""
    import datetime as dt

    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        streaming_topk,
    )

    cutoff = pa.scalar(dt.datetime(1998, 1, 1), pa.timestamp("us"))
    n_parts = _join_partitions(sf_dir, ["orders", "lineitem"])

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def cust_filter(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
        return keep.select(["c_custkey"])

    cust = cust.map_batches(cust_filter, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.less(b["o_orderdate"], cutoff)),
        batch_format="pyarrow",
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_filter(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.greater(b["l_shipdate"], cutoff))
        rev = pc.multiply(
            keep["l_extendedprice"], pc.subtract(pa.scalar(1.0), keep["l_discount"])
        )
        return pa.table({"l_orderkey": keep["l_orderkey"], "rev": rev})

    li = li.map_batches(li_filter, batch_format="pyarrow")

    # the customer side is a PURE SEMI JOIN (it contributes only
    # membership), so it dispatches by key-set size: bounded BUILDING key
    # sets broadcast and filter map-only; past the budget the
    # Bloom-prefiltered distributed path runs (hybrid_semi_join)
    from fhirflat_ray.functions.joins import hybrid_semi_join

    o_c = hybrid_semi_join(
        orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=n_parts
    ).select_columns(["o_orderkey", "o_orderdate"])
    j = li.join(o_c, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "o_orderdate": b["o_orderdate"],
                    "rev": b["rev"],
                }
            )
            .group_by(["l_orderkey", "o_orderdate"])
            .aggregate([("rev", "sum")])
        )
        return agg_select(
            g,
            {
                "l_orderkey": "l_orderkey",
                "o_orderdate": "o_orderdate",
                "rev_sum": "revenue",
            },
        )

    partials = j.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["l_orderkey", "o_orderdate"], sort=False, as_index=False)[
            "revenue"
        ].sum()
        # round to cents so the result is independent of combine order
        out["revenue"] = out["revenue"].round(2)
        return out

    agg = bucketed_map_groups(partials, ["l_orderkey"], final)
    return streaming_topk(
        agg, ["revenue", "l_orderkey"], 10, descending=[True, False]
    )


Q3_TOP_ORDERS_SQL = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(sf_dir: str):
    """TPC-H-Q5-shaped 6-way join: revenue by nation for one region/year.

    Scale shape: the genuinely-fixed-size dims (region: 5 rows, nation: 25
    rows in TPC-H at ANY scale factor) broadcast as a nationkey→name dict;
    customer/orders/lineitem/supplier — all O(SF) tables — meet in three
    distributed hash joins, with the extra Q5 constraint (customer and
    supplier in the SAME nation) as a vectorized post-join filter. The
    final aggregate has ≤25 groups: per-batch Arrow partial + one tiny
    Ray groupby."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import agg_select

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nat = nation.filter(pc.is_in(nation["n_regionkey"], value_set=asia.combine_chunks()))
    nation_keys = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    name_by_key = dict(
        zip(nation_keys.tolist(), nat["n_name"].to_pylist())
    )
    key_set = pa.array(nation_keys, pa.int64())

    import datetime as dt

    lo = pa.scalar(dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1997, 1, 1), pa.timestamp("us"))
    n_parts = _join_partitions(sf_dir, ["orders", "lineitem", "supplier"])

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_nationkey": b["c_nationkey"].cast(pa.int64()),
            }
        ).filter(pc.is_in(b["c_nationkey"].cast(pa.int64()), value_set=key_set)),
        batch_format="pyarrow",
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    o_c = orders.join(cust, "inner", n_parts, on=("o_custkey",), right_on=("c_custkey",))
    o_c = o_c.select_columns(["o_orderkey", "c_nationkey"])

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_rev(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "rev": pc.multiply(
                    b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
                ),
            }
        )

    li = li.map_batches(li_rev, batch_format="pyarrow")
    j = li.join(o_c, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",))

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.map_batches(
        lambda b: pa.table(
            {
                "s_suppkey": b["s_suppkey"],
                "s_nationkey": b["s_nationkey"].cast(pa.int64()),
            }
        ).filter(pc.is_in(b["s_nationkey"].cast(pa.int64()), value_set=key_set)),
        batch_format="pyarrow",
    )
    # the nationkey filter can leave schema-less empty blocks; acero's hash
    # join needs every right-side partition to carry the key column —
    # repartition() concatenates blocks and drops the degenerate empties
    # (same workaround as hash_anti_join)
    supp = supp.repartition(max(2, n_parts // 2))
    j2 = j.join(supp, "inner", n_parts, on=("l_suppkey",), right_on=("s_suppkey",))

    def partial(b: pa.Table) -> pa.Table:
        # Q5's local-supplier constraint: customer and supplier same nation
        keep = b.filter(pc.equal(b["c_nationkey"], b["s_nationkey"]))
        g = (
            pa.table({"s_nationkey": keep["s_nationkey"], "rev": keep["rev"]})
            .group_by(["s_nationkey"])
            .aggregate([("rev", "sum")])
        )
        return agg_select(g, {"s_nationkey": "s_nationkey", "rev_sum": "revenue"})

    partials = j2.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("s_nationkey").aggregate(Sum("revenue", alias_name="revenue"))

    def finish(b: pa.Table) -> pa.Table:
        keys = b["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array([name_by_key[int(k)] for k in keys], pa.string()),
                "revenue": pc.round(b["revenue"], ndigits=2),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


Q5_REGION_REVENUE_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def user_value_ranks(sf_dir: str):
    """Rank-family window functions (DENSE_RANK / PERCENT_RANK / NTILE)
    per user over event values — the same single-shuffle `keyed_window`
    machinery as `user_event_windows`, extended with the rank ops. NTILE
    follows the sort order (value, event_id — deterministic tiebreak);
    the rank ops order by the value column, SQL semantics."""
    from fhirflat_ray.functions.windows import keyed_window

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = keyed_window(
        ds,
        "user_id",
        ["value", "event_id"],
        [
            ("dense_rank", "value", None, "dr"),
            ("percent_rank", "value", None, "pr"),
            ("ntile", None, 4, "quartile"),
        ],
    )
    return out.select_columns(["event_id", "user_id", "value", "dr", "pr", "quartile"])


USER_VALUE_RANKS_SQL = """
SELECT event_id, user_id, value,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value) AS BIGINT) AS dr,
       ROUND(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value), 9) AS pr,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) AS quartile
FROM events
"""


def user_event_windows(sf_dir: str):
    """Per-key SQL window functions (lag / row_number / cumulative sum /
    rolling mean) over the full event stream: one coarse-bucket shuffle on
    the key, one vectorized pandas pass per bucket
    (:func:`fhirflat_ray.functions.windows.keyed_window`). Per-row window
    output ships each row exactly once — nothing amplifies."""
    from fhirflat_ray.functions.windows import keyed_window

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = keyed_window(
        ds,
        "user_id",
        ["ts", "event_id"],
        [
            ("lag", "ts", 1, "prev_ts"),
            ("row_number", None, None, "rn"),
            ("cumsum", "value", None, "cum_value"),
            ("rolling_mean", "value", 3, "roll_avg"),
        ],
    )

    def rnd(b: pa.Table) -> pa.Table:
        # windowed float accumulations are order/implementation dependent
        # (DuckDB uses segment trees); round to fixed decimals on both sides
        for c in ("cum_value", "roll_avg"):
            b = b.set_column(
                b.column_names.index(c), c, pc.round(b[c], ndigits=6)
            )
        return b.select(
            ["event_id", "user_id", "prev_ts", "rn", "cum_value", "roll_avg"]
        )

    return out.map_batches(rnd, batch_format="pyarrow")


USER_EVENT_WINDOWS_SQL = """
SELECT event_id, user_id,
       lag(ts) OVER w AS prev_ts,
       row_number() OVER w AS rn,
       round(sum(value) OVER w, 6) AS cum_value,
       round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS roll_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def user_type_seq(sf_dir: str):
    """Ordered string-agg implode (the M3 run-collapse analogue at the row
    level): per user, the comma-joined event-type sequence under
    (ts, event_id) order. One coarse-bucket shuffle; inside each bucket a
    single-threaded Arrow group_by collects per-key LISTS in sorted order
    (encounter order is only guaranteed with ``use_threads=False``) and one
    vectorized ``binary_join`` flattens them — no Python per key."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(
            g.sort_values(["user_id", "ts", "event_id"], kind="mergesort"),
            preserve_index=False,
        )
        agg = t.select(["user_id", "event_type"]).group_by(
            ["user_id"], use_threads=False
        ).aggregate([("event_type", "list")])
        joined = pc.binary_join(
            agg["event_type_list"].combine_chunks(), pa.scalar(",")
        )
        return pa.table(
            {"user_id": agg["user_id"], "type_seq": joined}
        ).to_pandas()

    return bucketed_map_groups(ds, ["user_id"], per_bucket)


USER_TYPE_SEQ_SQL = """
SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq
FROM events GROUP BY user_id
"""


def weighted_sample(sf_dir: str):
    """Deterministic weighted sample without replacement (Efraimidis &
    Spirakis 2006): rank = ln(u)/w with u a hash-derived uniform and w the
    document length — the top-k ranks are a weighted sample, reproducible
    across runs, partitionings and engines because u comes from the shared
    integer hash, not RNG state. Map-only rank + streaming per-block top-k;
    no global sort, no shuffle."""
    from fhirflat_ray.functions.sampling import MOD32, hash32
    from fhirflat_ray.functions.util import streaming_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rank(b: pa.Table) -> pa.Table:
        h = hash32(b["doc_id"].to_numpy(zero_copy_only=False))
        u = (h.astype(np.float64) + 0.5) / MOD32
        w = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False).astype(
            np.float64
        ) + 1.0
        return pa.table(
            {"doc_id": b["doc_id"], "r": pa.array(np.log(u) / w, pa.float64())}
        )

    t = streaming_topk(
        ds.map_batches(rank, batch_format="pyarrow"),
        ["r", "doc_id"],
        50,
        descending=[True, False],
    )
    return t.select(["doc_id"])


def _weighted_sample_sql() -> str:
    from fhirflat_ray.functions.sampling import MOD32, hash32_sql

    return f"""
SELECT doc_id FROM documents
ORDER BY ln((({hash32_sql('doc_id')}) + 0.5) / {MOD32}.0) / (length(text) + 1) DESC,
         doc_id
LIMIT 50
"""


def distinct_users_hll(sf_dir: str):
    """Approximate distinct count via the deterministic shared-hash
    HyperLogLog (``functions/sketches.py``): every batch reduces to ≤4096
    (register, rho) rows, partials merge by elementwise max, and the SAME
    integer construction + estimator runs in the SQL oracle — an
    oracle-checked sketch, unlike library HLLs."""
    from fhirflat_ray.functions.sketches import hll_estimate

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = round(hll_estimate(ds, "user_id"), 3)
    return pa.table({"approx_distinct": pa.array([est], pa.float64())})


def funnel_events(sf_dir: str):
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing timestamps per user) — the event-analytics sequential
    pattern. One USER-bucket shuffle of only the three stage types (three
    narrow columns); inside each bucket the cascade is vectorized across
    every user at once (three groupby-min passes with per-user threshold
    masks); each bucket emits ONE partial row of stage counts and the
    driver sums a bucket-count-bounded table."""
    from fhirflat_ray.functions.util import bucketed_map_groups, collect_small_table

    stages = ("view", "click", "purchase")
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["event_type"], pa.array(list(stages))))

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g.event_type == stages[0]].groupby("user_id")["ts"].min()
        counts = [len(t)]
        for stage in stages[1:]:
            rows = g[g.event_type == stage]
            thresh = rows["user_id"].map(t)
            rows = rows[thresh.notna() & (rows["ts"] > thresh)]
            t = rows.groupby("user_id")["ts"].min()
            counts.append(len(t))
        return pd.DataFrame(
            {
                "n_view": [counts[0]],
                "n_view_click": [counts[1]],
                "n_view_click_purchase": [counts[2]],
            }
        )

    partials = bucketed_map_groups(pruned, ["user_id"], per_bucket)
    t = collect_small_table(partials)
    out = {
        c: pa.array([int(pc.sum(t[c]).as_py() or 0)], pa.int64())
        for c in ("n_view", "n_view_click", "n_view_click_purchase")
    }
    return pa.table(out)


FUNNEL_EVENTS_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_view_click_purchase
"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_user_events(sf_dir: str):
    """Crosstab: one row per user, one count column per event type (the
    wide feature table a per-user model consumes). Per-batch Arrow
    (user, type) partials shrink the shuffle to distinct pairs; one
    USER-bucket pass pivots wide with a fixed, schema-stable column set."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return agg_select(
            g, {"user_id": "user_id", "event_type": "event_type", "count_all": "n"}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        w = (
            g.groupby(["user_id", "event_type"], sort=False)["n"].sum().unstack(
                fill_value=0
            )
        )
        out = pd.DataFrame({"user_id": w.index.to_numpy()})
        for t in _PIVOT_TYPES:
            out[f"n_{t}"] = (
                w[t].to_numpy(np.int64) if t in w.columns else np.zeros(len(w), np.int64)
            )
        return out

    return bucketed_map_groups(partials, ["user_id"], pivot)


PIVOT_USER_EVENTS_SQL = """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def heavy_hitters_cms(sf_dir: str):
    """Point-frequency estimates from a count-min sketch (Cormode &
    Muthukrishnan 2005) over the events stream: per-batch partials are at
    most D x W = 8192 counter rows regardless of batch size, merge by plain
    SUM, and the point query is min over D counter lookups. The construction
    is the engine's int64-safe shared-hash discipline, so the APPROXIMATE
    answer itself is what the SQL oracle checks — bit-for-bit."""
    from fhirflat_ray.functions.sketches import cms_counters, cms_estimates

    ds = _read(sf_dir, "events", columns=["user_id"])
    counters = cms_counters(ds, "user_id")
    q = np.arange(50, dtype=np.int64)  # fixed point-query set: users 0..49
    est = cms_estimates(counters, q)
    return pa.table({"user_id": pa.array(q), "est_count": pa.array(est)})


def _heavy_hitters_cms_sql() -> str:
    from fhirflat_ray.functions.sketches import cms_estimate_sql

    return cms_estimate_sql(
        "user_id",
        "events",
        "SELECT unnest(range(0, 50)) AS user_id",
        "user_id",
    )


def _distinct_users_hll_sql() -> str:
    from fhirflat_ray.functions.sketches import hll_estimate_sql

    return hll_estimate_sql("user_id", "events")


def decontaminate_corpus(sf_dir: str):
    """Benchmark decontamination (GPT-3-style n-gram overlap filter): drop
    corpus documents sharing >= 3 distinct word 4-grams with the eval set
    (here: every 20th document plays the eval set). Eval n-grams build once
    and broadcast; the corpus pass is map-only — the shape that streams
    100 TB untouched (``functions/decontam.py``)."""
    from fhirflat_ray.functions.decontam import build_ngram_set, decontaminate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def is_eval(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 20 == 0))

    def is_corpus(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 20 != 0))

    eval_grams = build_ngram_set(
        docs.map_batches(is_eval, batch_format="pyarrow"), "text", 4
    )
    out = decontaminate(
        docs.map_batches(is_corpus, batch_format="pyarrow"),
        eval_grams,
        text_col="text",
        n=4,
        min_hits=3,
    )
    return out.select_columns(["doc_id"])


DECONTAMINATE_SQL = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t FROM documents
),
ng AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 4 THEN
           list_distinct(list_transform(generate_series(1, len(t) - 3),
                                        i -> array_to_string(t[i:i+3], ' ')))
         WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
         ELSE [] END AS s
  FROM tok
),
eval_ng AS (SELECT DISTINCT unnest(s) AS g FROM ng WHERE doc_id % 20 = 0),
corpus AS (SELECT doc_id, s FROM ng WHERE doc_id % 20 <> 0),
cg AS (SELECT doc_id, unnest(s) AS g FROM corpus),
hits AS (SELECT cg.doc_id, count(*) AS h
         FROM cg JOIN eval_ng USING (g) GROUP BY cg.doc_id)
SELECT doc_id FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM hits WHERE h >= 3)
"""


def quantiles_by_type(sf_dir: str):
    """Per-group exact discrete quantiles (median + p90 of event value per
    event type): distributed value counts + one vectorized per-bucket
    cumsum/threshold pass — no per-key Python, no global sort."""
    from fhirflat_ray.functions.quantiles import grouped_quantile_disc

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantile_disc(ds, "event_type", "value", [0.5, 0.9])


QUANTILES_BY_TYPE_SQL = """
SELECT event_type, 0.5 AS q, quantile_disc(value, 0.5) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.9 AS q, quantile_disc(value, 0.9) AS value
FROM events GROUP BY event_type
"""


def revenue_rollup(sf_dir: str):
    """ROLLUP (grouping-sets) aggregate: revenue by (returnflag, linestatus)
    plus per-returnflag subtotals and the grand total. The heavy pass is the
    ordinary distributed partial+final aggregate (6 groups); every rollup
    level derives from that TINY result on the driver — subtotal levels
    never rescan or reshuffle the corpus."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import agg_select, collect_small_table

    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"]
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        g = (
            pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "l_linestatus": b["l_linestatus"],
                    "rev": rev,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("rev", "sum")])
        )
        return agg_select(
            g,
            {
                "l_returnflag": "l_returnflag",
                "l_linestatus": "l_linestatus",
                "rev_sum": "rev",
            },
        )

    base = collect_small_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("rev", alias_name="rev"))
    ).to_pandas()

    # rollup levels from unrounded base sums (matches SQL ROLLUP, which sums
    # raw values per level); round each level once at the end
    lvl1 = (
        base.groupby("l_returnflag", as_index=False)["rev"]
        .sum()
        .assign(l_linestatus=None)
    )
    lvl2 = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None], "rev": [base["rev"].sum()]}
    )
    out = pd.concat([base, lvl1, lvl2], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "rev"]
    ]
    out["rev"] = out["rev"].round(2)
    return out


REVENUE_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def corpus_prep(sf_dir: str):
    """FLAGSHIP training-data prep composition, end to end in ONE streaming
    pipeline: language + quality filter (map-only Arrow kernels) → exact
    dedup (keep min doc_id per text — narrow bucketed shuffle) →
    benchmark decontamination (broadcast eval n-gram set, map-only) →
    deterministic train/val/test split + token counts (map-only). The only
    all-to-all is the dedup key shuffle; every other stage streams.
    Fully SQL-expressible, so the whole composition sits under one oracle.
    """
    from fhirflat_ray.functions.decontam import build_ngram_set, decontaminate
    from fhirflat_ray.functions.sampling import assign_split
    from fhirflat_ray.functions.text import BpeishTokenCounter
    from fhirflat_ray.functions.util import keep_min_per_key

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def is_eval(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 20 == 0))

    eval_grams = build_ngram_set(
        docs.map_batches(is_eval, batch_format="pyarrow"), "text", 4
    )

    def qual(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n_tokens = pc.cast(pc.count_substring_regex(b["text"], r"\S+"), pa.int64())
        n_alpha = pc.count_substring_regex(b["text"], "[A-Za-z]")
        safe = pc.max_element_wise(
            pc.cast(pc.utf8_length(b["text"]), pa.int64()), pa.scalar(1, pa.int64())
        )
        alpha_ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()), pc.cast(safe, pa.float64())
        )
        keep = (
            (ids % 20 != 0)
            & pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
            & (n_tokens.to_numpy() >= 25)
            & (alpha_ratio.to_numpy() >= 0.81)
        )
        return b.append_column("n_tokens", n_tokens).filter(pa.array(keep))

    kept = docs.map_batches(qual, batch_format="pyarrow")
    # exact dedup keyed on the text itself (rows must ship through a key
    # shuffle once regardless; exactness keeps the oracle collision-free)
    deduped = keep_min_per_key(kept, key="text", id_column="doc_id")
    clean = decontaminate(deduped, eval_grams, text_col="text", n=4, min_hits=3)

    def finish(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        split = assign_split(ids, [("train", 90), ("val", 5), ("test", 5)])
        n_bpe = pc.cast(
            pc.count_substring_regex(b["text"], BpeishTokenCounter.PATTERN),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "split": pa.array(split, pa.string()),
                "n_tokens": b["n_tokens"],
                "n_bpe_tokens": n_bpe,
            }
        )

    return clean.map_batches(finish, batch_format="pyarrow")


def _corpus_prep_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql, split_thresholds

    th = split_thresholds([("train", 90), ("val", 5), ("test", 5)])
    h = hash32_sql("doc_id")
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t FROM documents
),
ng AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 4 THEN
           list_distinct(list_transform(generate_series(1, len(t) - 3),
                                        i -> array_to_string(t[i:i+3], ' ')))
         WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
         ELSE [] END AS s
  FROM tok
),
eval_ng AS (SELECT DISTINCT unnest(s) AS g FROM ng WHERE doc_id % 20 = 0),
quality AS (
  SELECT doc_id, lang, text,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE doc_id % 20 <> 0 AND lang = 'en'
    AND len(regexp_extract_all(text, '\\S+')) >= 25
    AND CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        / greatest(length(text), 1) >= 0.81
),
dedup AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY text),
surv AS (SELECT q.* FROM quality q JOIN dedup USING (doc_id)),
cg AS (SELECT surv.doc_id, unnest(ng.s) AS g
       FROM surv JOIN ng ON ng.doc_id = surv.doc_id),
hits AS (SELECT cg.doc_id, count(*) AS h
         FROM cg JOIN eval_ng USING (g) GROUP BY cg.doc_id)
SELECT doc_id, lang,
       CASE WHEN {h} < {th[0][1]} THEN 'train'
            WHEN {h} < {th[1][1]} THEN 'val'
            ELSE 'test' END AS split,
       n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         AS n_bpe_tokens
FROM surv
WHERE doc_id NOT IN (SELECT doc_id FROM hits WHERE h >= 3)
"""


def rolling_hour_sum(sf_dir: str):
    """Trailing 1-hour RANGE-frame window sum per user (incl. the SQL peer
    rule for tied timestamps): one key shuffle, one vectorized
    searchsorted/prefix-sum pass per bucket
    (:func:`fhirflat_ray.functions.windows.rolling_time_sum`)."""
    from fhirflat_ray.functions.windows import rolling_time_sum

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = rolling_time_sum(ds, "user_id", "ts", "value", 3_600_000_000)

    def rnd(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                # prefix-sum differences vs segment-tree sums: round on both
                # sides so float association order cannot flip the hash
                "roll_sum": pc.round(b["roll_sum"], ndigits=4),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow")


ROLLING_HOUR_SUM_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                        AND CURRENT ROW), 4) AS roll_sum
FROM events
"""


def label_centroids(sf_dir: str):
    """Per-label embedding centroid (the mean vector a clustering / ANN
    index build starts from): each batch reduces to one (label, sum-vector,
    count) partial via a single ``np.add.at`` over the zero-copy (n, dim)
    float block — the shuffle moves one 64-float row per (batch, label) —
    and the bounded label set merges on the driver. Output exploded as
    (label, idx, mean_v) rows for the SQL oracle."""
    from fhirflat_ray.functions.util import collect_small_table

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    DIM = 64

    def partial(b: pa.Table) -> pa.Table:
        emb = b["embedding"].combine_chunks()
        vecs = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
            -1, DIM
        )
        labels = b["label"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), DIM), dtype=np.float64)
        np.add.at(sums, inv, vecs)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq.astype(np.int64), pa.int64()),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.float64()), DIM
                ),
                "n": pa.array(n, pa.int64()),
            }
        )

    t = collect_small_table(ds.map_batches(partial, batch_format="pyarrow"))
    labels = t["label"].to_numpy(zero_copy_only=False)
    sums = np.asarray(
        t["sums"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, DIM)
    n = t["n"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(labels, return_inverse=True)
    tot = np.zeros((len(uniq), DIM), dtype=np.float64)
    np.add.at(tot, inv, sums)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv, n)
    mean = np.round(tot / cnt[:, None], 6)
    return pa.table(
        {
            "label": pa.array(np.repeat(uniq, DIM), pa.int64()),
            "idx": pa.array(np.tile(np.arange(1, DIM + 1), len(uniq)), pa.int64()),
            "mean_v": pa.array(mean.ravel(), pa.float64()),
        }
    )


LABEL_CENTROIDS_SQL = """
SELECT CAST(label AS BIGINT) AS label, i AS idx,
       round(sum(embedding[i]) / count(*), 6) AS mean_v
FROM embeddings, generate_series(1, 64) AS t(i)
GROUP BY label, i
"""


def media_features(sf_dir: str):
    """Multimodal decode end to end through the driver gate, under a FULL
    oracle: synthesize a deterministic PPM image per document (pixels =
    the text's own bytes tiled to 16x12 RGB), run the REAL stdlib PPM
    decode + color-feature extraction in the actor-pool stage
    (``multimodal.ImageFeatureExtractor``, small batches — binary rows
    are heavy), and return (doc_id, n_payload_bytes, f0) with f0 the
    first real feature (mean red channel). Because the pixel bytes are
    the text's own ASCII codes, the SQL oracle recomputes the SAME mean
    via ord()/generate_series — and the float32 feature cast is mirrored
    with CAST AS REAL, which quantizes away float64 summation-order noise
    on both sides. Covers binary-column schema, actor decode path, and
    feature layout; `test_media_*` assert the decode math itself."""
    from fhirflat_ray.functions.multimodal import _encode_ppm
    from fhirflat_ray.functions.util import worker_cached_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W, H = 16, 12

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for s in b["text"].to_pylist():
            raw = (s or "").encode("utf-8") or b"\x00"
            need = W * H * 3
            buf = (raw * (need // len(raw) + 1))[:need]
            px = np.frombuffer(buf, dtype=np.uint8).reshape(H, W, 3)
            payloads.append(_encode_ppm(px))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "n_payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
            }
        )

    from fhirflat_ray.functions.multimodal import ImageFeatureExtractor

    media = docs.map_batches(to_media, batch_format="pyarrow")
    feats = media.map_batches(
        worker_cached_stage(ImageFeatureExtractor, dim=8),
        batch_format="pyarrow",
        batch_size=128,
    )

    def finish(b: pa.Table) -> pa.Table:
        f0 = pa.array(
            [round(float(v[0]), 4) for v in b["features"].to_pylist()],
            pa.float64(),
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_payload_bytes": b["n_payload_bytes"],
                "f0": f0,
            }
        )

    return feats.map_batches(finish, batch_format="pyarrow")


def nearest_eval_vec(sf_dir: str):
    """Cross-corpus 1-NN join (embedding decontamination / attribute
    transfer): for every corpus vector, the id + cosine of its nearest
    EVAL-set vector (every 10th id plays the eval set). Eval matrix
    broadcasts once; the corpus pass is map-only
    (:func:`fhirflat_ray.functions.similarity.nearest_neighbor_join`)."""
    from fhirflat_ray.functions.similarity import nearest_neighbor_join

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def split(b: pa.Table, keep_eval: bool) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        mask = ids % 10 == 0
        return b.filter(pa.array(mask if keep_eval else ~mask))

    from fhirflat_ray.functions.util import collect_small_table

    ev = collect_small_table(
        ds.map_batches(lambda b: split(b, True), batch_format="pyarrow")
    )
    DIM = 64
    ref_ids = ev["vec_id"].to_numpy(zero_copy_only=False)
    ref_vecs = np.asarray(
        ev["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
        dtype=np.float64,
    ).reshape(-1, DIM)
    corpus = ds.map_batches(lambda b: split(b, False), batch_format="pyarrow")
    return nearest_neighbor_join(corpus, ref_ids, ref_vecs)


NEAREST_EVAL_VEC_SQL = """
WITH eval AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
pairs AS (
  SELECT c.vec_id, e.vec_id AS nn_vec_id,
         -- DOUBLE[] cast: on FLOAT lists list_cosine_similarity computes
         -- in float32 (~1e-6 error), which 6dp rounding cannot absorb
         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS sim
  FROM corpus c CROSS JOIN eval e
)
SELECT vec_id, nn_vec_id, round(sim, 6) AS nn_cosine
FROM pairs
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_vec_id) = 1
"""


def props_extract(sf_dir: str):
    """Semi-structured column handling: extract the integer ``k`` field
    from the JSON ``props`` string per event and aggregate it per event
    type — vectorized Arrow regex extraction (no per-row JSON parser in
    the hot path; the reference flattens nested payloads the same
    field-at-a-time way, fhir2flat's dotted-column expansion), partial
    combine before the tiny groupby."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import agg_select

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        extracted = pc.extract_regex(
            b["props"], r'"k":\s*(?P<k>-?\d+)'
        ).combine_chunks()
        k = extracted.field("k").cast(pa.int64())
        g = (
            pa.table({"event_type": b["event_type"], "k": k})
            .group_by(["event_type"])
            .aggregate([("k", "sum"), ([], "count_all")])
        )
        return agg_select(
            g, {"event_type": "event_type", "k_sum": "sum_k", "count_all": "n"}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("sum_k", alias_name="sum_k"), Sum("n", alias_name="n"))
    )
    return out


PROPS_EXTRACT_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def incremental_counts(sf_dir: str):
    """Incremental materialized-view maintenance: encode HALF the events,
    build the GROUP BY event_type count view, append the other half as new
    segments (`merge.append_dataset`), then REFRESH — the second pass
    touches only the appended segments (content-identity delta detection,
    `pipelines/incremental.py`) and counts them in the encoded domain (dict
    code stream, no string decode). The returned view must equal a full
    GROUP BY over everything."""
    from fhirflat_ray.pipelines import encode as enc
    from fhirflat_ray.pipelines.incremental import refresh_value_counts
    from fhirflat_ray.pipelines.merge import append_dataset

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_iv", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")

    def half(batch: pa.Table, parity: int) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 2 == parity))

    _read(sf_dir, "events").map_batches(
        lambda b: half(b, 0), batch_format="pyarrow"
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("event_id",), target_rows=2048)
    state = os.path.join(work, "view.json")
    refresh_value_counts(seg_dir, state, "event_type")

    append_dataset(
        seg_dir,
        _read(sf_dir, "events").map_batches(
            lambda b: half(b, 1), batch_format="pyarrow"
        ),
        target_rows=2048,
    )
    view, info = refresh_value_counts(seg_dir, state, "event_type")
    assert info["mode"] == "incremental", info
    return view


INCREMENTAL_COUNTS_SQL = """
SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
"""


def time_travel(sf_dir: str):
    """Snapshot isolation under the oracle: encode events, freeze snapshot
    v1 (hardlink metadata op, zero data copied — `pipelines/snapshots.py`),
    mutate the LIVE table in place (update every event_id % 7, delete every
    % 13), then read the SNAPSHOT. The result must equal the original table
    even though the live segments were rewritten/removed — os.replace
    detaches directory entries while the snapshot's hardlinks keep the old
    inodes alive (copy-on-write time travel)."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc
    from fhirflat_ray.pipelines import snapshots as snap
    from fhirflat_ray.pipelines.merge import merge_delete, merge_upsert

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_tt", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), override_num_blocks=8
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("event_id",), target_rows=2048)
    snap.create_snapshot(seg_dir, note="pre-mutation")

    def make_updates(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        upd = batch.filter(pa.array(ids % 7 == 0))
        return upd.set_column(
            upd.schema.get_field_index("value"),
            "value",
            pc.add(upd["value"], pa.scalar(1000.0, pa.float64())),
        )

    merge_upsert(
        seg_dir,
        _read(sf_dir, "events").map_batches(make_updates, batch_format="pyarrow"),
        "event_id",
    )

    def pick_keys(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return batch.select(["event_id"]).filter(pa.array(ids % 13 == 0))

    merge_delete(
        seg_dir,
        _read(sf_dir, "events", columns=["event_id"]).map_batches(
            pick_keys, batch_format="pyarrow"
        ),
        "event_id",
    )
    return dec.decode_dataset(snap.snapshot_path(seg_dir, 1))


TIME_TRAVEL_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


def snapshot_diff(sf_dir: str):
    """CDC over the lakehouse stack: encode events, freeze snapshot v1,
    mutate the live table (zone-routed upsert of every id%7 value, insert
    id%97 rows at id+1e9, delete id%13 keys), then ``table_diff`` the
    DECODED snapshot against the DECODED live table — the
    "what changed since version N" question a downstream consumer asks
    before an incremental sync. Both diff inputs stream out of the encoded
    format (snapshot hardlinks keep the pre-mutation inodes alive) and the
    diff exchange ships (key, digest) only; the result is exactly the
    mutation that was applied, change-proportional."""
    from fhirflat_ray.functions.diff import table_diff
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc
    from fhirflat_ray.pipelines import snapshots as snap
    from fhirflat_ray.pipelines.merge import merge_delete, merge_upsert

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_sd", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), override_num_blocks=8
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("event_id",), target_rows=2048)
    snap.create_snapshot(seg_dir, note="pre-mutation")

    def make_changes(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        upd = batch.filter(pa.array(ids % 7 == 0))
        upd = upd.set_column(
            upd.schema.get_field_index("value"),
            "value",
            pc.add(upd["value"], pa.scalar(1000.0, pa.float64())),
        )
        new = batch.filter(pa.array(ids % 97 == 0))
        new = new.set_column(
            new.schema.get_field_index("event_id"),
            "event_id",
            pc.add(new["event_id"], pa.scalar(1_000_000_000, pa.int64())),
        )
        return pa.concat_tables([upd, new])

    merge_upsert(
        seg_dir,
        _read(sf_dir, "events").map_batches(make_changes, batch_format="pyarrow"),
        "event_id",
    )

    def pick_keys(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return batch.select(["event_id"]).filter(pa.array(ids % 13 == 0))

    merge_delete(
        seg_dir,
        _read(sf_dir, "events", columns=["event_id"]).map_batches(
            pick_keys, batch_format="pyarrow"
        ),
        "event_id",
    )
    old = dec.decode_dataset(snap.snapshot_path(seg_dir, 1))
    new = dec.decode_dataset(seg_dir)
    return table_diff(
        old, new, "event_id", ["ts", "user_id", "event_type", "value", "props"]
    )


SNAPSHOT_DIFF_SQL = """
WITH live AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN value + 1000.0 ELSE value END AS value
  FROM events WHERE event_id % 13 <> 0
  UNION ALL
  SELECT event_id + 1000000000 AS event_id, value FROM events WHERE event_id % 97 = 0
)
SELECT COALESCE(s.event_id, l.event_id) AS event_id,
       CASE WHEN s.event_id IS NULL THEN 'added'
            WHEN l.event_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM events s FULL OUTER JOIN live l ON s.event_id = l.event_id
WHERE s.event_id IS NULL OR l.event_id IS NULL
   OR s.value IS DISTINCT FROM l.value
"""


def schema_evolve(sf_dir: str):
    """Catalog-only ALTER TABLE on the encoded format: encode events, then
    ADD COLUMN source_tag DEFAULT 'batch-a', RENAME props → props_json,
    DROP value — three O(1) manifest rewrites that never open a segment
    (`pipelines/evolve.py`); decode applies them vectorized. The reference
    can only re-run its whole ingest to change an output schema
    (/root/reference/fhirflat/ingest.py:543-575)."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc
    from fhirflat_ray.pipelines import evolve as evo

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_ev", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), override_num_blocks=8
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("event_id",), target_rows=4096)
    evo.add_column(seg_dir, "source_tag", "string", "batch-a")
    evo.rename_column(seg_dir, "props", "props_json")
    evo.drop_column(seg_dir, "value")
    return dec.decode_dataset(seg_dir)


SCHEMA_EVOLVE_SQL = """
SELECT event_id, ts, user_id, event_type, props AS props_json,
       'batch-a' AS source_tag
FROM events
"""


def pruned_scan_zorder(sf_dir: str):
    """Multi-dimensional zone pruning via z-order CLUSTER BY: re-layout the
    events table on the Morton key of (user_id, ts) — one explicit global
    sort, the one-time cost every warehouse CLUSTER BY pays — then decode
    with a ``user_id`` range predicate. Because segments are Z-curve
    ranges, their zone rectangles are tight on BOTH cluster columns, so
    header-only pruning skips non-matching segments for filters on either
    dimension (the single-key ``pruned_scan`` can only prune its sort
    key)."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.stages.layout import cluster_zorder

    work = os.path.join(
        "/tmp/fhirflat_ray_zo", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    seg_dir = os.path.join(work, "enc")
    cluster_zorder(_read(sf_dir, "events"), seg_dir, ["user_id", "ts"], target_rows=1024)
    return dec.decode_dataset(
        seg_dir, predicate=[("user_id", ">=", 2), ("user_id", "<=", 4)]
    ).select_columns(["event_id", "ts", "user_id", "event_type", "value", "props"])


PRUNED_SCAN_ZORDER_SQL = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events WHERE user_id BETWEEN 2 AND 4
"""


def cross_validate_errors(sf_dir: str):
    """Cross-field + per-group-cardinality validation (the reference's
    pydantic root_validator family, SURVEY §1.3's documented parity gap):
    deterministic null planting over events, then the one_of-required /
    requires row rules (``validate_cross_fields``) and the
    at-most-N-per-key rule (``validate_max_per_key``, one bucket shuffle),
    first-error-wins across all of them — mirrored by a CASE cascade +
    COUNT() OVER window in the oracle."""
    from fhirflat_ray.pipelines.verify import (
        validate_cross_fields,
        validate_max_per_key,
    )

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value", "props"])

    def plant(b: pa.Table) -> pa.Table:
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        def masked(col, mod):
            keep = (eid % mod) != 0
            arr = b[col].combine_chunks()
            return pc.if_else(pa.array(keep), arr, pa.nulls(len(eid), arr.type))
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "a": masked("props", 3),
                "b": masked("event_type", 5),
                "c": masked("value", 7),
            }
        )

    marked = validate_cross_fields(
        ds.map_batches(plant, batch_format="pyarrow"),
        [
            {"rule": "one_of", "columns": ["a", "c"], "required": True},
            {"rule": "requires", "column": "b", "needs": "a"},
        ],
    )
    marked = validate_max_per_key(marked, ["user_id"], "event_type", 2)
    return marked.map_batches(
        lambda b: b.select(["event_id", "_error"]), batch_format="pyarrow"
    )


CROSS_VALIDATE_ERRORS_SQL = """
WITH t AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_id % 3 != 0 THEN props END AS a,
         CASE WHEN event_id % 5 != 0 THEN event_type END AS b,
         CASE WHEN event_id % 7 != 0 THEN value END AS c
  FROM events
), k AS (
  SELECT *, count(*) OVER (PARTITION BY user_id, event_type) AS cnt FROM t
)
SELECT event_id,
  CASE
    WHEN a IS NOT NULL AND c IS NOT NULL THEN 'multiple of [''a'', ''c''] present'
    WHEN a IS NULL AND c IS NULL THEN 'one of [''a'', ''c''] required'
    WHEN b IS NOT NULL AND a IS NULL THEN 'b requires a'
    WHEN cnt > 2 THEN 'event_type appears more than 2x per [''user_id'']'
    ELSE ''
  END AS _error
FROM k
"""


def pruned_scan_dict(sf_dir: str):
    """Encoded-domain STRING predicates: decode the engine's own format
    with ``event_type is_in ('click','signup')`` + a ``user_id`` range.
    For dict-coded segments the string conjunct is evaluated on the
    integer CODE STREAM (vocab lookup → int compare inside
    ``decode.read_segment_filtered``) and the string column materializes
    only surviving rows; per-segment blooms prune point lookups at the
    header level. The no-string-decode contract is pinned by the
    ``test_pruned_scan_dict_never_decodes_strings`` tripwire."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_pd", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), override_num_blocks=8
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("ts",), target_rows=1024)
    return dec.decode_dataset(
        seg_dir,
        predicate=[
            ("event_type", "is_in", ["click", "signup"]),
            ("user_id", ">=", 3),
        ],
    ).select_columns(["event_id", "ts", "user_id", "event_type", "value", "props"])


PRUNED_SCAN_DICT_SQL = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events WHERE event_type IN ('click', 'signup') AND user_id >= 3
"""


def pruned_scan(sf_dir: str):
    """Zone-map predicate pushdown through the engine's OWN format: encode
    the (ts-sorted) events table into many small segments — row-range
    partitions of a sorted source give tight disjoint per-segment ts zones
    — then decode with ``ts >= cutoff``. Header-only zone checks skip the
    earlier segments entirely (``pipelines/decode.py:prune_segments``) and
    the exact vectorized residual filter runs on the survivors, so the
    result equals a full scan + WHERE while reading only matching
    segments — the engine-format analogue of Parquet row-group pruning."""
    import datetime as dt

    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_zm", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    # re-shard the (single-row-group) source into ordered fragments first —
    # at real scale data arrives as many fragments anyway; row-range blocks
    # of a ts-sorted source keep per-fragment ts ranges disjoint
    src_dir = os.path.join(work, "src")
    rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), override_num_blocks=8
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("ts",), target_rows=1024)
    cutoff = dt.datetime(2024, 1, 22)
    out = dec.decode_dataset(
        seg_dir,
        columns=["event_id", "user_id", "ts"],
        predicate=[("ts", ">=", cutoff)],
    )
    return out


PRUNED_SCAN_SQL = """
SELECT event_id, user_id, ts FROM events
WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'
"""


def conv_lookup(sf_dir: str):
    """Point lookup through the engine format: fetch ONE conversation from
    encoded transcript segments. Per-segment string BLOOM filters (built at
    encode over each segment's distinct values) prove absence from the
    header alone, so only segments that may hold the conversation are
    decoded — the transcript-serving access pattern ('show me conv X')
    without any full scan."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc

    work = os.path.join(
        "/tmp/fhirflat_ray_cl", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir, exist_ok=True)
    transcript_build(sf_dir).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(
        src_dir, seg_dir, shared_dict_columns=["role", "tool"], target_rows=256
    )
    return dec.decode_dataset(seg_dir, predicate=[("conv_id", "==", "conv-7")])


def _conv_lookup_sql() -> str:
    return f"SELECT * FROM ({TRANSCRIPT_BUILD_SQL}) WHERE conv_id = 'conv-7'"


def merge_events(sf_dir: str):
    """MERGE INTO on the encoded format: encode the events table, apply a
    deterministic update/insert mix by unique key (every event_id % 7 == 0
    row gets value+1000 and props='updated'; every % 97 == 0 row spawns a
    new synthetic event at id+1e9), decode the merged set. Updates route
    to candidate segments by the catalog's zone maps alone and only those
    segments rewrite (atomic replace); unmatched keys append as new
    content-addressed segments — the in-place mutation primitive the
    reference's regenerate-every-parquet model lacks
    (/root/reference/fhirflat/ingest.py:543-575)."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc
    from fhirflat_ray.pipelines.merge import merge_upsert

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_mg", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), override_num_blocks=8
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("event_id",), target_rows=2048)

    def make_updates(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        upd = batch.filter(pa.array(ids % 7 == 0))
        upd = upd.set_column(
            upd.schema.get_field_index("value"),
            "value",
            pc.add(upd["value"], pa.scalar(1000.0, pa.float64())),
        )
        upd = upd.set_column(
            upd.schema.get_field_index("props"),
            "props",
            pa.array(["updated"] * upd.num_rows, pa.string()),
        )
        new = batch.filter(pa.array(ids % 97 == 0))
        new = new.set_column(
            new.schema.get_field_index("event_id"),
            "event_id",
            pc.add(new["event_id"], pa.scalar(1_000_000_000, pa.int64())),
        )
        new = new.set_column(
            new.schema.get_field_index("event_type"),
            "event_type",
            pa.array(["synthetic"] * new.num_rows, pa.string()),
        )
        return pa.concat_tables([upd, new])

    updates = _read(sf_dir, "events").map_batches(make_updates, batch_format="pyarrow")
    merge_upsert(seg_dir, updates, "event_id")
    return dec.decode_dataset(seg_dir)


MERGE_EVENTS_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events WHERE event_id % 7 <> 0
UNION ALL
SELECT event_id, ts, user_id, event_type, value + 1000.0 AS value, 'updated' AS props
FROM events WHERE event_id % 7 = 0
UNION ALL
SELECT event_id + 1000000000 AS event_id, ts, user_id, 'synthetic' AS event_type, value, props
FROM events WHERE event_id % 97 = 0
"""


def delete_events(sf_dir: str):
    """DELETE on the encoded format: encode the events table, delete every
    event_id % 13 == 0 row by key, decode the survivors. Deletes route to
    candidate segments via catalog zone maps alone; only those segments
    rewrite (emptied segments are removed outright) — the reference can
    only regenerate whole outputs (/root/reference/fhirflat/ingest.py:543-575)."""
    from fhirflat_ray.pipelines import decode as dec
    from fhirflat_ray.pipelines import encode as enc
    from fhirflat_ray.pipelines.merge import merge_delete

    import ray.data as rd

    work = os.path.join(
        "/tmp/fhirflat_ray_del", hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), override_num_blocks=8
    ).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, sort_keys=("event_id",), target_rows=2048)

    def pick_keys(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return batch.select(["event_id"]).filter(pa.array(ids % 13 == 0))

    keys = _read(sf_dir, "events", columns=["event_id"]).map_batches(
        pick_keys, batch_format="pyarrow"
    )
    merge_delete(seg_dir, keys, "event_id")
    return dec.decode_dataset(seg_dir)


DELETE_EVENTS_SQL = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events WHERE event_id % 13 <> 0
"""


def _transcript_segdir(sf_dir: str, salt: str) -> str:
    """Encode the transcript table into a fresh segment dir for the
    encoded-domain aggregate queries (role shared-dict so the counts path
    exercises the manifest dictionary store; tool local-dict so the
    distinct path exercises vocab-only reads)."""
    from fhirflat_ray.pipelines import encode as enc

    work = os.path.join(
        "/tmp/fhirflat_ray_ea",
        hashlib.sha1(f"{salt}:{sf_dir}".encode()).hexdigest()[:10],
    )
    shutil.rmtree(work, ignore_errors=True)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir, exist_ok=True)
    transcript_build(sf_dir).write_parquet(src_dir)
    seg_dir = os.path.join(work, "enc")
    enc.encode_files(src_dir, seg_dir, shared_dict_columns=["role"])
    return seg_dir


def role_counts_encoded(sf_dir: str):
    """GROUP BY role → COUNT(*) computed INSIDE the encoded format: one task
    per segment reads only the role column's code stream (dict codes; RLE
    runs counted without expansion — ``encoded_agg._code_counts``) plus the
    shared vocabulary from the manifest store, then a vocab-bounded combine.
    No string value is ever materialized; the bytes read per segment are the
    packed codes, not the column."""
    from fhirflat_ray.pipelines.encoded_agg import encoded_value_counts

    return encoded_value_counts(_transcript_segdir(sf_dir, "rc"), "role")


ROLE_COUNTS_ENCODED_SQL = f"""
SELECT role, COUNT(*) AS n FROM ({TRANSCRIPT_BUILD_SQL}) GROUP BY role
"""


def tool_vocab_encoded(sf_dir: str):
    """DISTINCT tool from the encoded format's dictionary vocabularies
    alone: each segment's local dict vocab is exactly its observed value
    set, so the per-segment partial is a ranged read of the (tiny) vocab
    bytes — the code stream and every other column stay on disk."""
    from fhirflat_ray.pipelines.encoded_agg import encoded_distinct

    return encoded_distinct(_transcript_segdir(sf_dir, "tv"), "tool")


TOOL_VOCAB_ENCODED_SQL = f"""
SELECT DISTINCT tool FROM ({TRANSCRIPT_BUILD_SQL})
"""


def ts_range_encoded(sf_dir: str):
    """MIN/MAX ts answered from per-segment zone maps only — O(segments)
    header reads, zero payload bytes (the same statistics predicate
    pushdown uses to SKIP segments, used here to ANSWER the aggregate).
    The zone stores timestamps as int64 in the column's own unit; the
    original type from the segment header rebuilds the timestamps."""
    from fhirflat_ray.codecs.core import str_to_type
    from fhirflat_ray.pipelines.decode import segment_paths
    from fhirflat_ray.pipelines.encoded_agg import encoded_min_max
    from fhirflat_ray.state import segments as segmod

    seg_dir = _transcript_segdir(sf_dir, "tr")
    lo, hi = encoded_min_max(seg_dir, "ts")
    hdr, _ = segmod.read_segment_header(segment_paths(seg_dir)[0])
    t = str_to_type(
        next(c["hdr"]["t"] for c in hdr["columns"] if c["name"] == "ts")
    )
    return pa.table(
        {"ts_min": pa.array([lo], pa.int64()).cast(t),
         "ts_max": pa.array([hi], pa.int64()).cast(t)}
    )


TS_RANGE_ENCODED_SQL = "SELECT min(ts) AS ts_min, max(ts) AS ts_max FROM events"


# =====================================================================
# Transcript training/serving operators
# =====================================================================


_PACK_BUDGET = 64


def context_pack(sf_dir: str):
    """Greedy context-window packing: chunk every conversation's turns into
    <=64-token windows (a single over-budget turn gets its own chunk) — the
    training-data chunking pass. The per-conversation reset-cumsum is
    inherently sequential, so the engine runs it as max_turns vectorized
    numpy steps across all conversations per bucket (jagged-transpose); the
    oracle is a recursive CTE stepping the same recurrence."""
    from fhirflat_ray.functions.transcripts import pack_bucket_fn

    ds = _transcript_grouped(
        sf_dir,
        pack_bucket_fn("conv_id", "turn_idx", "text", _PACK_BUDGET),
        columns=["conv_id", "turn_idx", "text"],
    )
    return ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "n_tokens", "chunk_id"]),
        batch_format="pyarrow",
    )


CONTEXT_PACK_SQL = f"""
WITH RECURSIVE base AS (
  SELECT conv_id, turn_idx,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS BIGINT) AS n_tokens,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS pos
  FROM ({TRANSCRIPT_BUILD_SQL})
), rec AS (
  SELECT conv_id, turn_idx, pos, n_tokens,
         CAST(0 AS BIGINT) AS chunk_id, n_tokens AS cum
  FROM base WHERE pos = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.pos, b.n_tokens,
         CASE WHEN r.cum + b.n_tokens > {_PACK_BUDGET}
              THEN r.chunk_id + 1 ELSE r.chunk_id END,
         CASE WHEN r.cum + b.n_tokens > {_PACK_BUDGET}
              THEN b.n_tokens ELSE r.cum + b.n_tokens END
  FROM rec r JOIN base b ON b.conv_id = r.conv_id AND b.pos = r.pos + 1
)
SELECT conv_id, turn_idx, n_tokens, chunk_id FROM rec
"""


_TRUNC_BUDGET = 128


def context_truncate(sf_dir: str):
    """Serving-side context truncation: keep each conversation's most
    recent turns whose running token total fits the budget (the newest turn
    always survives). One key shuffle + a vectorized reverse cumsum per
    bucket."""
    from fhirflat_ray.functions.transcripts import truncate_bucket_fn

    ds = _transcript_grouped(
        sf_dir,
        truncate_bucket_fn("conv_id", "turn_idx", "text", _TRUNC_BUDGET),
        columns=["conv_id", "turn_idx", "role", "text"],
    )
    return ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role", "text"]),
        batch_format="pyarrow",
    )


CONTEXT_TRUNCATE_SQL = f"""
WITH base AS (
  SELECT conv_id, turn_idx, role, text,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS BIGINT) AS n_tokens
  FROM ({TRANSCRIPT_BUILD_SQL})
), r AS (
  SELECT conv_id, turn_idx, role, text,
         SUM(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revcum,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) AS rn
  FROM base
)
SELECT conv_id, turn_idx, role, text FROM r
WHERE revcum <= {_TRUNC_BUDGET} OR rn = 1
"""


def turn_pairs(sf_dir: str):
    """SFT-pair mining: adjacent (user -> assistant) turns become
    (prompt, response) rows — LEAD() through the shared keyed-window
    machinery, then a vectorized filter."""
    from fhirflat_ray.functions.transcripts import turn_pairs as _tp

    return _tp(
        transcript_build(sf_dir).select_columns(["conv_id", "turn_idx", "role", "text"]),
        "conv_id", "turn_idx", "role", "text",
    )


TURN_PAIRS_SQL = f"""
WITH w AS (
  SELECT conv_id, turn_idx, role, text AS prompt,
         LEAD(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS response,
         LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role
  FROM ({TRANSCRIPT_BUILD_SQL})
)
SELECT conv_id, turn_idx, prompt, response
FROM w WHERE role = 'user' AND next_role = 'assistant'
"""


def pii_scrub(sf_dir: str):
    """Map-only PII scrub over the raw event payloads: emails, phone
    numbers and standalone digit runs redacted with vectorized RE2 kernels;
    n_redactions counts matches on the original text per pattern. Both
    sides (pyarrow, DuckDB) execute RE2, so the patterns are portable."""
    from fhirflat_ray.functions.text import pii_scrub_batch

    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    return ds.map_batches(
        lambda b: pii_scrub_batch(b, column="props"), batch_format="pyarrow"
    ).select_columns(["event_id", "clean_props", "n_redactions"])


PII_SCRUB_SQL = r"""
SELECT event_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(props,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
         '\b\d+\b', '<NUM>', 'g') AS clean_props,
       CAST(len(regexp_extract_all(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(props, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
          + len(regexp_extract_all(props, '\b\d+\b')) AS BIGINT) AS n_redactions
FROM events
"""


def repetition_flags(sf_dir: str):
    """C4/Gopher repetition filter signal: most-frequent-token count vs
    total tokens per document; flagged when top_word_n/n_words > 1/5
    (exact integer comparison on both sides)."""
    from fhirflat_ray.functions.text import repetition_metrics_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        repetition_metrics_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_words", "top_word_n", "flagged"])


REPETITION_FLAGS_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word FROM documents
), c AS (
  SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word
), a AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words, CAST(max(n) AS BIGINT) AS top_word_n
  FROM c GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_words, 0) AS n_words,
       COALESCE(a.top_word_n, 0) AS top_word_n,
       COALESCE(a.top_word_n * 5 > a.n_words * 1, FALSE) AS flagged
FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
"""


def bigram_top(sf_dir: str):
    """Corpus-wide top-20 bigrams: per-batch partial counts (one row per
    in-batch distinct bigram leaves the map stage), a coarse-bucket
    vectorized combine, then streaming top-k — no global sort anywhere."""
    from fhirflat_ray.functions.text import bigram_counts_partial
    from fhirflat_ray.functions.util import bucketed_map_groups, streaming_topk

    partial = _read(sf_dir, "documents", columns=["text"]).map_batches(
        bigram_counts_partial, batch_format="pyarrow"
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bigram", sort=False).agg(n=("n", "sum")).reset_index()

    combined = bucketed_map_groups(partial, ["bigram"], combine)
    return streaming_topk(combined, ["n", "bigram"], 20, descending=[True, False])


BIGRAM_TOP_SQL = r"""
WITH d AS (
  SELECT regexp_extract_all(text, '\S+') AS w FROM documents
), b AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM d
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""


def term_stats(sf_dir: str):
    """Inverted-index statistics: per term, document frequency and total
    term frequency over the corpus. Map stage emits exact (term, doc, tf)
    postings per batch (documents never span rows), so the term-bucket
    combine is a pure vectorized count/sum — the index-build pipeline a
    retrieval system runs, with the postings shuffle carrying three narrow
    columns."""
    from fhirflat_ray.functions.text import term_doc_tf
    from fhirflat_ray.functions.util import bucketed_map_groups

    postings = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        term_doc_tf, batch_format="pyarrow"
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=False).agg(
            df=("doc_id", "size"), tf=("tf", "sum")
        ).reset_index()
        return out

    return bucketed_map_groups(postings, ["term"], combine)


TERM_STATS_SQL = r"""
WITH t AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)
  GROUP BY term, doc_id
)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf
FROM t GROUP BY term
"""


def tfidf_top_terms(sf_dir: str):
    """Per-document top-3 salient terms with their TF-IDF scores — the
    keyword-extraction pass. Two narrow shuffles, no broadcast and no
    driver state: (1) postings bucket-shuffle on TERM attaches each term's
    document frequency via a vectorized transform (every term's postings
    land in one bucket); (2) re-shuffle on DOC picks each document's top 3.
    The RANKING is the integer total order (tf DESC, df ASC, term ASC) —
    most frequent then rarest — so the gate never depends on cross-engine
    libm ``ln`` agreement; the tfidf value itself (tf · ln(N/df), rounded
    6dp) rides along for the hash compare."""
    from fhirflat_ray.functions.text import term_doc_tf
    from fhirflat_ray.functions.util import bucketed_map_groups

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()
    postings = docs.map_batches(term_doc_tf, batch_format="pyarrow")

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("term", sort=False)["doc_id"].transform("size").astype(np.int64)
        return g

    with_df = bucketed_map_groups(postings, ["term"], attach_df)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "tf", "df", "term"],
            ascending=[True, False, True, True],
            kind="mergesort",
        )
        out = g.groupby("doc_id", sort=False).head(3).copy()
        out["tfidf"] = np.round(
            out["tf"].to_numpy(np.float64)
            * np.log(float(n_docs) / out["df"].to_numpy(np.float64)),
            6,
        )
        return out[["doc_id", "term", "tf", "df", "tfidf"]]

    return bucketed_map_groups(with_df, ["doc_id"], topk)


def doc_surprisal(sf_dir: str):
    """Unigram-LM surprisal per document — the perplexity-style quality
    filter a pretraining pipeline runs (docs whose tokens are improbable
    under the corpus unigram distribution are boilerplate/garbage
    candidates). Mean negative log-probability per token:
    ``-(1/n_d) * Σ_t tf_dt · ln(cf_t / N)``.

    Scale shape mirrors `tfidf_top_terms`: exact per-batch postings
    (map-only), one TERM-bucket shuffle attaches each term's corpus
    frequency via a vectorized transform, one DOC-bucket shuffle reduces to
    the per-document score; the corpus token total is a scalar from
    one-row-per-batch partials. No broadcast vocabulary, no driver state —
    the corpus distribution never materializes anywhere."""
    from fhirflat_ray.functions.text import _split_words, term_doc_tf
    from fhirflat_ray.functions.util import bucketed_map_groups, collect_small_table

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    postings = docs.map_batches(term_doc_tf, batch_format="pyarrow")

    def tok_partial(b: pa.Table) -> pa.Table:
        vals, _, _ = _split_words(b["text"])
        return pa.table({"n": pa.array([len(vals)], pa.int64())})

    tot = collect_small_table(
        _read(sf_dir, "documents", columns=["text"]).map_batches(
            tok_partial, batch_format="pyarrow"
        )
    )
    n_total = float(pc.sum(tot["n"]).as_py() or 0)

    def attach_cf(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["cf"] = g.groupby("term", sort=False)["tf"].transform("sum").astype(np.int64)
        return g

    with_cf = bucketed_map_groups(postings, ["term"], attach_cf)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        tf = g["tf"].to_numpy(np.float64)
        lp = tf * np.log(g["cf"].to_numpy(np.float64) / n_total)
        agg = pd.DataFrame({"doc_id": g["doc_id"], "lp": lp, "tf": tf}).groupby(
            "doc_id", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"],
                "surprisal": np.round(-agg["lp"].to_numpy() / agg["tf"].to_numpy(), 6),
            }
        )

    return bucketed_map_groups(with_cf, ["doc_id"], per_doc)


DOC_SURPRISAL_SQL = r"""
WITH t AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)
  GROUP BY term, doc_id
), cf AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM t GROUP BY term
), n AS (SELECT CAST(sum(tf) AS DOUBLE) AS nt FROM t)
SELECT doc_id,
       ROUND(-sum(tf * ln(CAST(cf AS DOUBLE) / nt)) / sum(tf), 6) AS surprisal
FROM t JOIN cf USING (term), n
GROUP BY doc_id
"""


def bigram_surprisal(sf_dir: str):
    """Bigram-LM surprisal per document with add-one smoothing — the
    next-order perplexity-style quality filter after `doc_surprisal`:
    ``-(1/n_bg) * Σ tf · ln((c(w1,w2)+1) / (c(w1·)+V))`` where ``c(w1·)``
    counts w1 as a left context and V is the corpus unigram vocabulary.

    Scale shape mirrors `doc_surprisal`: exact per-batch bigram postings
    (map-only; bigrams never cross documents), a BIGRAM-bucket shuffle
    attaches corpus bigram counts, a LEFT-WORD-bucket shuffle attaches
    left-context totals, a DOC-bucket shuffle reduces to the score. V is
    a scalar from the distinct-term count. No broadcast vocabulary —
    the LM distribution never materializes anywhere."""
    from fhirflat_ray.functions.text import bigram_doc_tf, term_doc_tf
    from fhirflat_ray.functions.util import bucketed_map_groups, distinct_rows

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    postings = docs.map_batches(bigram_doc_tf, batch_format="pyarrow")

    vocab = distinct_rows(
        docs.map_batches(term_doc_tf, batch_format="pyarrow").select_columns(["term"]),
        ["term"],
    )
    v_size = float(vocab.count())

    def attach_cbg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["cbg"] = g.groupby("bg", sort=False)["tf"].transform("sum").astype(np.int64)
        return g

    def attach_cw1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["cw1"] = g.groupby("w1", sort=False)["tf"].transform("sum").astype(np.int64)
        return g

    staged = bucketed_map_groups(
        bucketed_map_groups(postings, ["bg"], attach_cbg), ["w1"], attach_cw1
    )

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        tf = g["tf"].to_numpy(np.float64)
        lp = tf * np.log(
            (g["cbg"].to_numpy(np.float64) + 1.0)
            / (g["cw1"].to_numpy(np.float64) + v_size)
        )
        agg = pd.DataFrame({"doc_id": g["doc_id"], "lp": lp, "tf": tf}).groupby(
            "doc_id", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"],
                "bigram_surprisal": np.round(
                    -agg["lp"].to_numpy() / agg["tf"].to_numpy(), 6
                ),
            }
        )

    return bucketed_map_groups(staged, ["doc_id"], per_doc)


BIGRAM_SURPRISAL_SQL = r"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS b
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
),
tb AS (SELECT doc_id, w1, b, count(*)::BIGINT AS tf FROM bg GROUP BY 1, 2, 3),
cb AS (SELECT b, sum(tf)::BIGINT AS cbg FROM tb GROUP BY b),
cw AS (SELECT w1, sum(tf)::BIGINT AS cw1 FROM tb GROUP BY w1),
v AS (
  SELECT CAST(count(DISTINCT term) AS DOUBLE) AS vsz
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)
)
SELECT doc_id,
       ROUND(-sum(tf * ln((cbg + 1.0) / (cw1 + vsz))) / sum(tf), 6)
         AS bigram_surprisal
FROM tb JOIN cb USING (b) JOIN cw USING (w1), v
GROUP BY doc_id
"""


TFIDF_TOP_TERMS_SQL = r"""
WITH t AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)
  GROUP BY term, doc_id
), s AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY term
), n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, df,
       ROUND(CAST(tf AS DOUBLE) * ln(nd / CAST(df AS DOUBLE)), 6) AS tfidf
FROM (
  SELECT t.term, t.doc_id, t.tf, s.df,
         row_number() OVER (
           PARTITION BY t.doc_id ORDER BY t.tf DESC, s.df ASC, t.term ASC
         ) AS rn
  FROM t JOIN s USING (term)
), n
WHERE rn <= 3
"""


# =====================================================================
# Conversation-level operators
# =====================================================================


def conv_dedup(sf_dir: str):
    """Conversation-level exact dedup: collapse each conversation to its
    ordered ``role|text`` content string, then keep the min-conv_id
    representative per distinct content (with the duplicate-group size).
    The grouping key the shuffle ships is the 64-bit siphash of the
    content, never the content itself (the ``dedup_exact`` discipline —
    collision-free by assumption, documented there); the oracle groups by
    the raw content string."""
    from fhirflat_ray.functions.dedup import add_content_hash
    from fhirflat_ray.functions.transcripts import content_bucket_fn
    from fhirflat_ray.functions.util import bucketed_map_groups

    content = _transcript_grouped(
        sf_dir,
        content_bucket_fn("conv_id", "turn_idx", "role", "text"),
        columns=["conv_id", "turn_idx", "role", "text"],
    )
    hashed = content.map_batches(
        lambda b: add_content_hash(b, "content").drop_columns(["content"]),
        batch_format="pyarrow",
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("content_hash", sort=False)
        out = gb.agg(
            conv_id=("conv_id", "min"),
            n_convs=("conv_id", "size"),
            n_turns=("n_turns", "min"),
        ).reset_index(drop=True)
        return out.astype({"n_convs": np.int64, "n_turns": np.int64})

    return bucketed_map_groups(hashed, ["content_hash"], per_bucket)


CONV_DEDUP_SQL = f"""
WITH c AS (
  SELECT conv_id,
         string_agg(COALESCE(role, '') || '|' || COALESCE(text, ''), chr(30) ORDER BY turn_idx) AS content,
         CAST(count(*) AS BIGINT) AS n_turns
  FROM ({TRANSCRIPT_BUILD_SQL}) GROUP BY conv_id
)
SELECT min(conv_id) AS conv_id, CAST(count(*) AS BIGINT) AS n_convs,
       min(n_turns) AS n_turns
FROM c GROUP BY content
"""


def sft_export(sf_dir: str):
    """FLAGSHIP transcript composition #2 — the end-to-end SFT dataset
    export a post-training pipeline runs, in one streaming plan:
    transcript build → structure gate (break ratio: at most 3 same-role
    adjacencies per 5 turns, integer cross-multiplied so the gate is
    float-free) → conversation-level exact dedup (min-conv_id per
    content fingerprint) → leakage-free hash split at conversation
    granularity → per-conversation turn/token accounting. The gate,
    content fingerprint and token counts all FUSE into the single
    transcript bucket pass (one shuffle); dedup adds one narrow exchange
    on the 64-bit content hash; split assignment is map-only. The whole
    composition sits under ONE SQL oracle."""
    from fhirflat_ray.functions.dedup import add_content_hash
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.transcripts import _ordered_group_concat
    from fhirflat_ray.functions.util import bucketed_map_groups

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        role = g["role"].to_numpy(dtype=object)
        text = g["text"].to_numpy(dtype=object)
        n = len(g)
        toks = pc.count_substring_regex(
            pc.fill_null(pa.array(text, pa.string()), ""), r"\S+"
        ).to_numpy(zero_copy_only=False)
        part = pd.Series(np.where(pd.isna(role), "", role), dtype=object).str.cat(
            pd.Series(np.where(pd.isna(text), "", text), dtype=object), sep="|"
        )
        gg = g.assign(part=part.to_numpy(), toks=toks)
        stats = gg.groupby("conv_id", sort=False).agg(
            n_turns=("turn_idx", "size"), n_tokens=("toks", "sum")
        )
        first_ok = (
            gg[gg["turn_idx"] == 0]
            .assign(ok=lambda d: d["role"] == "user")
            .set_index("conv_id")["ok"]
        )
        same = np.zeros(n, bool)
        if n > 1:
            # SQL's `role = prev` is NULL (FILTER-skipped) when either side
            # is NULL; numpy object equality would count None == None as a
            # break, so mask null roles out of the adjacency comparison.
            role_ok = ~pd.isna(role)
            same[1:] = (
                (conv[1:] == conv[:-1])
                & (role[1:] == role[:-1])
                & role_ok[1:]
                & role_ok[:-1]
            )
        breaks = (
            pd.DataFrame({"conv_id": conv, "b": same})
            .groupby("conv_id", sort=False)["b"]
            .sum()
        )
        content = _ordered_group_concat(
            gg, ["conv_id"], ["turn_idx"], "part", "\x1e"
        )
        out = pd.DataFrame(
            {
                "conv_id": content["conv_id"].to_pandas(),
                "content": content["__joined"].to_pandas(),
            }
        )
        out = out.set_index("conv_id")
        out["n_turns"] = stats["n_turns"]
        out["n_tokens"] = stats["n_tokens"].astype(np.int64)
        out["starts_ok"] = first_ok.reindex(out.index, fill_value=False)
        br = breaks.reindex(out.index, fill_value=0).astype(np.int64)
        out = out[5 * br <= 3 * out["n_turns"]].reset_index()
        return out

    convs = _transcript_grouped(
        sf_dir, per_conv, columns=["conv_id", "turn_idx", "role", "text"]
    )
    hashed = convs.map_batches(
        lambda b: add_content_hash(b, "content").drop_columns(["content"]),
        batch_format="pyarrow",
    )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", sort=False).agg(
            conv_id=("conv_id", "min"),
            n_turns=("n_turns", "min"),
            n_tokens=("n_tokens", "min"),
            starts_ok=("starts_ok", "min"),
        )
        return out.reset_index(drop=True)

    survivors = bucketed_map_groups(hashed, ["content_hash"], dedup)

    def assign(b: pa.Table) -> pa.Table:
        conv = b["conv_id"].to_numpy(zero_copy_only=False).astype(object)
        uid = np.array([int(c[5:]) for c in conv], np.int64)
        h = hash32(uid) % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "split": pa.array(split, pa.string()),
                "n_turns": pc.cast(b["n_turns"], pa.int64()),
                "n_tokens": pc.cast(b["n_tokens"], pa.int64()),
                "starts_ok": b["starts_ok"],
            }
        )

    return survivors.map_batches(assign, batch_format="pyarrow")


def _sft_export_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    h = hash32_sql("CAST(substr(conv_id, 6) AS BIGINT)")
    return rf"""
WITH t AS ({TRANSCRIPT_BUILD_SQL}),
w AS (
  SELECT conv_id, turn_idx, role, text,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM t),
c AS (
  SELECT conv_id,
         string_agg(COALESCE(role, '') || '|' || COALESCE(text, ''),
                    chr(30) ORDER BY turn_idx) AS content,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(length(regexp_extract_all(COALESCE(text, ''), '\S+')) ) AS BIGINT)
           AS n_tokens,
         bool_or(turn_idx = 0 AND role = 'user') AS starts_ok,
         count(*) FILTER (role = prev) AS n_breaks
  FROM w GROUP BY conv_id),
d AS (
  SELECT min(conv_id) AS conv_id, min(n_turns) AS n_turns,
         min(n_tokens) AS n_tokens, min(starts_ok) AS starts_ok
  FROM c WHERE 5 * n_breaks <= 3 * n_turns GROUP BY content)
SELECT conv_id,
       CASE WHEN ({h}) % 100 < 80 THEN 'train'
            WHEN ({h}) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       n_turns, n_tokens, starts_ok
FROM d
"""


SFT_EXPORT_SQL = _sft_export_sql()


def role_tool_pmi(sf_dir: str):
    """Pointwise mutual information between role and tool across all turns
    — the association-statistics pass (feature selection / co-occurrence
    audit) over the transcript dimensions. Both dims derive row-wise from
    ``event_type``, so the corpus pass is map-only partial joint counts +
    one tiny (|roles| x |tools|)-key aggregate; marginals and PMI derive
    from the collected vocab-scale table on the driver."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import collect_small_table

    ds = _read(sf_dir, "events", columns=["event_type"])

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        tool = et.to_numpy(zero_copy_only=False).astype(object)
        role = np.where(np.isin(tool, ["click", "view"]), "user", "assistant")
        g = (
            pd.DataFrame({"role": role, "tool": tool})
            .groupby(["role", "tool"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "role": pa.array(g["role"], pa.string()),
                "tool": pa.array(g["tool"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["role", "tool"])
        .aggregate(Sum("n", alias_name="n_joint"))
    )
    t = collect_small_table(agg).to_pandas()
    nn = float(t["n_joint"].sum())
    nr = t.groupby("role")["n_joint"].transform("sum").to_numpy(np.float64)
    nt = t.groupby("tool")["n_joint"].transform("sum").to_numpy(np.float64)
    nj = t["n_joint"].to_numpy(np.float64)
    return pa.table(
        {
            "role": pa.array(t["role"], pa.string()),
            "tool": pa.array(t["tool"], pa.string()),
            "n_joint": pa.array(t["n_joint"].to_numpy(np.int64)),
            "pmi": pa.array(np.round(np.log(nj * nn / (nr * nt)), 6), pa.float64()),
        }
    )


ROLE_TOOL_PMI_SQL = """
WITH j AS (
  SELECT CASE WHEN event_type IN ('click','view') THEN 'user' ELSE 'assistant' END AS role,
         CAST(event_type AS VARCHAR) AS tool,
         count(*)::BIGINT AS n_joint
  FROM events GROUP BY 1, 2
),
r AS (SELECT role, sum(n_joint)::BIGINT AS nr FROM j GROUP BY role),
t AS (SELECT tool, sum(n_joint)::BIGINT AS nt FROM j GROUP BY tool),
n AS (SELECT sum(n_joint)::DOUBLE AS nn FROM j)
SELECT j.role, j.tool, j.n_joint,
       round(ln(j.n_joint * nn / (nr::DOUBLE * nt::DOUBLE)), 6) AS pmi
FROM j JOIN r USING (role) JOIN t USING (tool), n
"""


def conv_stats(sf_dir: str):
    """Per-conversation profile (turns by role, token total, distinct
    tools, exact microsecond duration) — the session-stats rollup a
    transcript store serves for corpus curation."""
    from fhirflat_ray.functions.transcripts import profile_bucket_fn

    return _transcript_grouped(
        sf_dir,
        profile_bucket_fn("conv_id", "role", "text", "tool", "ts"),
        columns=["conv_id", "role", "text", "tool", "ts"],
    )


CONV_STATS_SQL = f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (role = 'user') AS BIGINT) AS n_user,
       CAST(count(*) FILTER (role = 'assistant') AS BIGINT) AS n_assistant,
       CAST(sum(len(regexp_extract_all(COALESCE(text, ''), '\\S+'))) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tool) AS BIGINT) AS n_tools,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS dur_us
FROM ({TRANSCRIPT_BUILD_SQL}) GROUP BY conv_id
"""


def alternation_audit(sf_dir: str):
    """Dialogue-structure audit: per conversation, whether turn 0 is a
    user turn and how many adjacent same-role turns break strict
    alternation — the validation pass an SFT-data pipeline runs before
    pair mining."""
    from fhirflat_ray.functions.transcripts import alternation_bucket_fn

    return _transcript_grouped(
        sf_dir,
        alternation_bucket_fn("conv_id", "turn_idx", "role"),
        columns=["conv_id", "turn_idx", "role"],
    )


ALTERNATION_AUDIT_SQL = f"""
WITH w AS (
  SELECT conv_id, turn_idx, role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM ({TRANSCRIPT_BUILD_SQL})
)
SELECT conv_id,
       bool_or(turn_idx = 0 AND role = 'user') AS starts_ok,
       CAST(count(*) FILTER (role = prev_role) AS BIGINT) AS n_breaks
FROM w GROUP BY conv_id
"""


def tool_latency(sf_dir: str):
    """Per-tool response latency: for every transcript turn, the gap to
    the NEXT turn in its conversation; per tool, the count and exact
    median gap in integer MICROSECONDS (discrete quantile over int64 — no
    float anywhere). The lead-gap extraction fuses into the transcript
    bucket pass (one shuffle); the per-tool median runs over (tool, gap,
    cnt) value-count partials in a second narrow exchange."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        tool = g["tool"].to_numpy()
        same = conv[1:] == conv[:-1]
        out = pd.DataFrame(
            {"tool": tool[:-1][same], "gap_us": (ts[1:] - ts[:-1])[same]}
        )
        # value-count partial: shuffle one row per in-bucket (tool, gap)
        return out.groupby(["tool", "gap_us"], sort=False, as_index=False).agg(
            cnt=("gap_us", "size")
        )

    partials = _transcript_grouped(
        sf_dir, gaps, columns=["conv_id", "turn_idx", "tool", "ts"]
    )

    def per_tool(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby(["tool", "gap_us"], sort=False, as_index=False)["cnt"]
            .sum()
            .sort_values(["tool", "gap_us"], kind="mergesort")
        )
        cum = g.groupby("tool", sort=False)["cnt"].cumsum().to_numpy()
        tot = g.groupby("tool", sort=False)["cnt"].transform("sum").to_numpy()
        rank = np.maximum(1, np.ceil(0.5 * tot.astype(np.float64)))
        sel = g.loc[cum >= rank, ["tool", "gap_us"]]
        med = sel.groupby("tool", as_index=False, sort=False).first()
        n = g.groupby("tool", as_index=False, sort=False)["cnt"].sum()
        out = n.merge(med, on="tool")
        return pd.DataFrame(
            {
                "tool": out["tool"],
                "n": out["cnt"].astype(np.int64),
                "med_gap_us": out["gap_us"].astype(np.int64),
            }
        )

    return bucketed_map_groups(partials, ["tool"], per_tool)


TOOL_LATENCY_SQL = f"""
WITH w AS (
  SELECT tool, ts,
         LEAD(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
  FROM ({TRANSCRIPT_BUILD_SQL})
)
SELECT tool, CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(epoch_us(nxt) - epoch_us(ts), 0.5) AS BIGINT)
         AS med_gap_us
FROM w WHERE nxt IS NOT NULL GROUP BY tool
"""


def role_runs(sf_dir: str):
    """Dialogue-monologue detection (gaps and islands): per conversation,
    the number of maximal same-role runs and the longest run — integer
    outputs, fused into the transcript bucket pass (one shuffle)."""

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        role = g["role"].to_numpy()
        n = len(g)
        new = np.ones(n, bool)
        if n > 1:
            new[1:] = (conv[1:] != conv[:-1]) | (role[1:] != role[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        r = pd.DataFrame({"conv_id": conv[starts], "len": lens})
        return r.groupby("conv_id", sort=False, as_index=False).agg(
            n_runs=("len", "size"), max_run=("len", "max")
        )

    return _transcript_grouped(sf_dir, runs, columns=["conv_id", "turn_idx", "role"])


ROLE_RUNS_SQL = f"""
WITH w AS (
  SELECT conv_id, turn_idx, role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM ({TRANSCRIPT_BUILD_SQL})),
g AS (
  SELECT conv_id,
         sum(CASE WHEN prev IS NULL OR role != prev THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM w),
r AS (SELECT conv_id, run_id, count(*) AS len FROM g GROUP BY conv_id, run_id)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(len) AS BIGINT) AS max_run
FROM r GROUP BY conv_id
"""


def activity_streaks(sf_dir: str):
    """Longest consecutive-active-day streak per user (gaps and islands on
    the distinct active-day set): the retention statistic behind "N-day
    streak" features. Per-batch distinct (user, day) pre-reduce shrinks
    the shuffle; one user-bucket exchange; the island detection is one
    vectorized day - rank subtraction across the whole bucket. Integer
    outputs only."""
    from fhirflat_ray.functions.util import bucketed_map_groups, distinct_rows

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.date32())
        t = pa.table({"user_id": b["user_id"], "day": d})
        return t.group_by(["user_id", "day"]).aggregate([])

    dd = distinct_rows(ds.map_batches(days, batch_format="pyarrow"), ["user_id", "day"])

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        day = g["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
        n = len(g)
        new = np.ones(n, bool)
        if n > 1:
            new[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        r = pd.DataFrame({"user_id": uid[starts], "len": lens})
        out = r.groupby("user_id", sort=False, as_index=False).agg(
            max_streak=("len", "max")
        )
        tot = (
            pd.DataFrame({"user_id": uid})
            .groupby("user_id", sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n_active_days"})
        )
        return tot.merge(out, on="user_id")

    return bucketed_map_groups(dd, ["user_id"], streaks)


ACTIVITY_STREAKS_SQL = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
g AS (
  SELECT user_id, day,
         CAST(day - CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY day) AS INTEGER) AS DATE) AS anchor
  FROM d),
r AS (SELECT user_id, anchor, count(*) AS len FROM g GROUP BY user_id, anchor)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak
FROM r GROUP BY user_id
"""


def weekly_delta(sf_dir: str):
    """Week-over-week event-count deltas per type (trend monitoring): the
    heavy pass is the ordinary distributed partial+final count into the
    BOUNDED (type, week) grid; lag/delta derive from that aggregate on
    the driver. Integer outputs."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import agg_select, collect_small_table

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        wk = pc.cast(pc.floor_temporal(b["ts"], unit="week"), pa.date32())
        t = pa.table({"event_type": b["event_type"], "week": wk})
        g = t.group_by(["event_type", "week"]).aggregate([([], "count_all")])
        return agg_select(
            g, {"event_type": "event_type", "week": "week", "count_all": "n"}
        )

    grid = collect_small_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "week"])
        .aggregate(Sum("n", alias_name="n"))
    )
    df = grid.to_pandas()
    df["week"] = pd.to_datetime(df["week"])
    df = df.sort_values(["event_type", "week"], kind="mergesort")
    prev = df.groupby("event_type", sort=False)["n"].shift(1)
    same_week = df.groupby("event_type", sort=False)["week"].shift(1) == df[
        "week"
    ] - pd.Timedelta(days=7)
    delta = np.where(same_week.fillna(False), df["n"] - prev.fillna(0), np.nan)
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "week": pa.array(df["week"].to_numpy().astype("datetime64[us]"), pa.timestamp("us")),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "delta": pa.array(
                [None if np.isnan(d) else int(d) for d in delta], pa.int64()
            ),
        }
    )


WEEKLY_DELTA_SQL = """
WITH w AS (
  SELECT event_type, date_trunc('week', ts) AS week, count(*) AS n
  FROM events GROUP BY event_type, date_trunc('week', ts))
SELECT event_type, week, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN lag(week) OVER win = week - INTERVAL 7 DAY
                 THEN n - lag(n) OVER win END AS BIGINT) AS delta
FROM w WINDOW win AS (PARTITION BY event_type ORDER BY week)
"""


def conv_prefix_dedup(sf_dir: str):
    """Conversation-PREFIX dedup — the agent-log reality that many
    trajectories share their first turns (same system prompt + opening):
    conversations group by the exact first-3-turn text concat, each group
    keeps its lexicographically-min conv_id and reports the group size.
    Prefix fingerprints build inside the transcript bucket pass (the
    shared ``_ordered_group_concat`` kernel); groups fold in one more
    narrow exchange on the prefix."""
    from fhirflat_ray.functions.transcripts import _ordered_group_concat
    from fhirflat_ray.functions.util import bucketed_map_groups

    def prefixes(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["turn_idx"] < 3]
        if not len(g):
            return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                                 "pfx": pd.Series([], dtype=object)})
        t = _ordered_group_concat(g, ["conv_id"], ["turn_idx"], "text", "\x1f")
        return pd.DataFrame(
            {
                "conv_id": t["conv_id"].to_pandas(),
                "pfx": t["__joined"].to_pandas(),
            }
        )

    pfx = _transcript_grouped(sf_dir, prefixes, columns=["conv_id", "turn_idx", "text"])

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("pfx", sort=False, as_index=False).agg(
            conv_id=("conv_id", "min"), n_convs=("conv_id", "size")
        )[["conv_id", "n_convs"]]

    return bucketed_map_groups(pfx, ["pfx"], survivors)


CONV_PREFIX_DEDUP_SQL = f"""
WITH t AS ({TRANSCRIPT_BUILD_SQL}),
p AS (
  SELECT conv_id, string_agg(text, chr(31) ORDER BY turn_idx) AS pfx
  FROM t WHERE turn_idx < 3 GROUP BY conv_id)
SELECT min(conv_id) AS conv_id, CAST(count(*) AS BIGINT) AS n_convs
FROM p GROUP BY pfx
"""


def rolling_median3(sf_dir: str):
    """Per-user rolling 3-point median smoothing of event values — the
    spike filter a telemetry pipeline applies before trend fits. The
    3-median is PURE min/max selection (greatest(least(a,b),
    least(greatest(a,b), c))), so outputs are bit-identical doubles with
    no arithmetic and no rounding at all. One user-bucket exchange;
    interior rows only."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def med3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        v = g["value"].to_numpy(np.float64)
        eid = g["event_id"].to_numpy()
        n = len(g)
        if n < 3:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "med3": pd.Series([], dtype=np.float64),
                }
            )
        interior = (uid[1:-1] == uid[:-2]) & (uid[1:-1] == uid[2:])
        # windows containing a null are excluded on BOTH sides: numpy
        # min/max would propagate NaN where SQL least/greatest SKIP nulls,
        # so the mirrored form is "all three present" (oracle WHERE)
        finite = ~(np.isnan(v[:-2]) | np.isnan(v[1:-1]) | np.isnan(v[2:]))
        interior = interior & finite
        p, c, nx = v[:-2][interior], v[1:-1][interior], v[2:][interior]
        med = np.maximum(np.minimum(p, c), np.minimum(np.maximum(p, c), nx))
        return pd.DataFrame(
            {
                "event_id": eid[1:-1][interior],
                "user_id": uid[1:-1][interior],
                "med3": med,
            }
        )

    return bucketed_map_groups(ds, ["user_id"], med3)


ROLLING_MEDIAN3_SQL = """
WITH w AS (
  SELECT event_id, user_id, value,
         LAG(value) OVER win AS p, LEAD(value) OVER win AS nx
  FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id,
       greatest(least(p, value), least(greatest(p, value), nx)) AS med3
FROM w WHERE p IS NOT NULL AND nx IS NOT NULL AND value IS NOT NULL
"""


def moments_by_type(sf_dir: str):
    """Higher-moment shape statistics per event type: population skewness
    (m3/m2^1.5) and excess kurtosis (m4/m2² − 3) from raw-moment partials
    — the distribution-drift probe. One row of (n, Σx..Σx⁴) per (batch,
    type) leaves the map stage; the closed forms are mirrored
    expression-for-expression in SQL at 6dp (the ``qty_price_corr``
    discipline extended two moments up)."""
    from fhirflat_ray.functions.util import agg_select, collect_small_table

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "x": b["value"].to_numpy(zero_copy_only=False),
            }
        )
        df["x2"] = df["x"] * df["x"]
        df["x3"] = df["x2"] * df["x"]
        df["x4"] = df["x2"] * df["x2"]
        g = df.groupby("event_type", sort=False).agg(
            n=("x", "size"), s1=("x", "sum"), s2=("x2", "sum"),
            s3=("x3", "sum"), s4=("x4", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    t = collect_small_table(ds.map_batches(partial, batch_format="pyarrow"))
    df = (
        t.to_pandas()
        .groupby("event_type", as_index=False)[["n", "s1", "s2", "s3", "s4"]]
        .sum()
        .sort_values("event_type")
    )
    n = df["n"].to_numpy(np.float64)
    m = df["s1"].to_numpy() / n
    m2 = df["s2"].to_numpy() / n - m * m
    m3 = df["s3"].to_numpy() / n - 3.0 * m * (df["s2"].to_numpy() / n) + 2.0 * m**3
    m4 = (
        df["s4"].to_numpy() / n
        - 4.0 * m * (df["s3"].to_numpy() / n)
        + 6.0 * (m * m) * (df["s2"].to_numpy() / n)
        - 3.0 * m**4
    )
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "skew": pa.array(np.round(m3 / m2**1.5, 6), pa.float64()),
            "kurt": pa.array(np.round(m4 / (m2 * m2) - 3.0, 6), pa.float64()),
        }
    )


MOMENTS_BY_TYPE_SQL = """
WITH r AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(value) AS s1, sum(value*value) AS s2,
         sum(value*value*value) AS s3, sum(value*value*value*value) AS s4
  FROM events GROUP BY event_type),
m AS (
  SELECT event_type,
         s1/n AS mu,
         s2/n - (s1/n)*(s1/n) AS m2,
         s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n) AS m3,
         s4/n - 4.0*(s1/n)*(s3/n) + 6.0*((s1/n)*(s1/n))*(s2/n)
              - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
  FROM r)
SELECT event_type,
       round(m3 / power(m2, 1.5), 6) AS skew,
       round(m4 / (m2 * m2) - 3.0, 6) AS kurt
FROM m
"""


def iqr_outliers(sf_dir: str):
    """Tukey-fence outlier counting per type: values outside
    [q1 - 1.5·IQR, q3 + 1.5·IQR] with EXACT discrete quartiles — integer
    outputs, so no float tolerance anywhere (the fences are the same
    doubles on both sides because the quartiles are selected, not
    interpolated). Quartiles fold type-bounded and broadcast; the count
    pass is map-only."""
    import ray

    from fhirflat_ray.functions.quantiles import grouped_quantile_disc
    from fhirflat_ray.functions.util import (
        agg_select,
        collect_small_table,
        worker_cached_stage,
    )

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    qt = collect_small_table(
        grouped_quantile_disc(ds, "event_type", "value", [0.25, 0.75])
    ).to_pandas()
    piv = qt.pivot(index="event_type", columns="q", values="value")
    types = np.array(sorted(piv.index))
    q1 = piv.loc[types, 0.25].to_numpy(np.float64)
    q3 = piv.loc[types, 0.75].to_numpy(np.float64)
    lo = q1 - 1.5 * (q3 - q1)
    hi = q3 + 1.5 * (q3 - q1)
    ref = ray.put((types.astype(str), lo, hi))

    class Count:
        def __init__(self, ref):
            self.types, self.lo, self.hi = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            t = b["event_type"].to_numpy(zero_copy_only=False).astype(str)
            v = b["value"].to_numpy(zero_copy_only=False)
            i = np.searchsorted(self.types, t)
            out = (v < self.lo[i]) | (v > self.hi[i])
            g = pd.DataFrame({"event_type": t, "o": out.astype(np.int64)}).groupby(
                "event_type", sort=False, as_index=False
            ).agg(n=("o", "size"), n_outliers=("o", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

    parts = collect_small_table(
        ds.map_batches(worker_cached_stage(Count, ref=ref), batch_format="pyarrow")
    )
    df = (
        parts.to_pandas()
        .groupby("event_type", as_index=False)[["n", "n_outliers"]]
        .sum()
        .sort_values("event_type")
    )
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "n_outliers": pa.array(df["n_outliers"].to_numpy(np.int64)),
        }
    )


IQR_OUTLIERS_SQL = """
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1, quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY event_type)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN e.value < q.q1 - 1.5*(q.q3 - q.q1)
                       OR e.value > q.q3 + 1.5*(q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN q ON q.event_type = e.event_type
GROUP BY e.event_type
"""


def acf1_by_type(sf_dir: str):
    """Lag-1 autocorrelation of event value per type (time-series
    regularity probe). Adjacent-pair moments need global (ts, event_id)
    adjacency per type WITHOUT holding a whole type in one task: rows
    co-partition on (type, DAY), each day folds its within-day pair
    moments to one row, and every day also emits its first/last row — the
    cross-day pairs reconstruct on the driver from that BOUNDED
    (types × days) boundary table. Same mirrored-moment 6dp discipline as
    ``qty_price_corr``."""
    from fhirflat_ray.functions.util import bucketed_map_groups, collect_small_table

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value", "event_id"])

    def day_tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "day", pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.date32())
        )

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "day", "ts", "event_id"], kind="mergesort")
        t = g["event_type"].to_numpy()
        day = g["day"].to_numpy()
        v = g["value"].to_numpy(np.float64)
        n = len(g)
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = (t[1:] == t[:-1]) & (day[1:] == day[:-1])
        x, y = v[:-1][same[1:]], v[1:][same[1:]]
        pk = pd.DataFrame(
            {
                "event_type": t[1:][same[1:]],
                "day": day[1:][same[1:]],
                "n": 1,
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        mom = pk.groupby(["event_type", "day"], sort=False, as_index=False).sum()
        new = np.ones(n, bool)
        new[1:] = ~same[1:]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n) - 1
        bound = pd.DataFrame(
            {
                "event_type": t[starts],
                "day": day[starts],
                "first_v": v[starts],
                "last_v": v[ends],
            }
        )
        return mom.merge(bound, on=["event_type", "day"], how="outer")

    tagged = ds.map_batches(day_tag, batch_format="pyarrow")
    folded = collect_small_table(
        bucketed_map_groups(tagged, ["event_type", "day"], per_day)
    ).to_pandas()
    folded = folded.sort_values(["event_type", "day"], kind="mergesort")
    out_rows = []
    for et, sub in folded.groupby("event_type", sort=True):
        n = float(sub["n"].fillna(0).sum())
        sx = float(sub["sx"].fillna(0).sum())
        sy = float(sub["sy"].fillna(0).sum())
        sxx = float(sub["sxx"].fillna(0).sum())
        syy = float(sub["syy"].fillna(0).sum())
        sxy = float(sub["sxy"].fillna(0).sum())
        # cross-day adjacent pairs from the bounded boundary rows
        lv = sub["last_v"].to_numpy(np.float64)
        fv = sub["first_v"].to_numpy(np.float64)
        for i in range(len(sub) - 1):
            x, y = lv[i], fv[i + 1]
            n += 1
            sx += x
            sy += y
            sxx += x * x
            syy += y * y
            sxy += x * y
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) * (sx / n)
        vy = syy / n - (sy / n) * (sy / n)
        out_rows.append((et, round(cov / ((vx**0.5) * (vy**0.5)), 6)))
    return pd.DataFrame(out_rows, columns=["event_type", "acf1"])


ACF1_BY_TYPE_SQL = """
WITH w AS (
  SELECT event_type, value AS y,
         LAG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS x
  FROM events),
m AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM w WHERE x IS NOT NULL GROUP BY event_type)
SELECT event_type,
       round((sxy / n - (sx / n) * (sy / n)) /
             (sqrt(sxx / n - (sx / n) * (sx / n)) *
              sqrt(syy / n - (sy / n) * (sy / n))), 6) AS acf1
FROM m
"""


def gini_activity(sf_dir: str):
    """Activity-concentration statistic: the integer basis of the Gini
    coefficient of per-user event counts — (n_users, total_events,
    Σ rank·count) with ranks from the range-partitioned GLOBAL sort of the
    per-user aggregate (counts shuffle once as two int64 columns; the
    corpus never re-sorts). Integer-only output: the final
    G = (2S)/(n·T) − (n+1)/n division is the consumer's, because a
    rounded ratio can land on the half-boundary where engines' rounding
    modes diverge."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.sort import range_partition_sort
    from fhirflat_ray.functions.util import agg_select, collect_small_table

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate([([], "count_all")])
        return agg_select(g, {"user_id": "user_id", "count_all": "cnt"})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    ranked = range_partition_sort(counts, "cnt", ["user_id"], n_ranges=8)

    def fold(b: pa.Table) -> pa.Table:
        cnt = b["cnt"].to_numpy(zero_copy_only=False)
        rk = b["pos"].to_numpy(zero_copy_only=False) + 1
        return pa.table(
            {
                "n": pa.array([len(cnt)], pa.int64()),
                "tot": pa.array([int(cnt.sum())], pa.int64()),
                "wrs": pa.array([int((rk * cnt).sum())], pa.int64()),
            }
        )

    t = collect_small_table(ranked.map_batches(fold, batch_format="pyarrow"))
    return pa.table(
        {
            "n_users": pa.array([int(t["n"].to_numpy().sum())], pa.int64()),
            "total_events": pa.array([int(t["tot"].to_numpy().sum())], pa.int64()),
            "weighted_rank_sum": pa.array(
                [int(t["wrs"].to_numpy().sum())], pa.int64()
            ),
        }
    )


GINI_ACTIVITY_SQL = """
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rk FROM c)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       CAST(sum(rk * cnt) AS BIGINT) AS weighted_rank_sum
FROM r
"""


def sft_pack_examples(sf_dir: str):
    """Training-example materialization: greedy-pack each conversation
    into 64-token chunks, then collapse every (conversation, chunk) into
    one ``role: text`` newline-joined example row with turn/token totals —
    the final shape an SFT dataloader reads."""
    from fhirflat_ray.functions.transcripts import sft_bucket_fn

    return _transcript_grouped(
        sf_dir,
        sft_bucket_fn("conv_id", "turn_idx", "role", "text", _PACK_BUDGET),
        columns=["conv_id", "turn_idx", "role", "text"],
    )


SFT_PACK_EXAMPLES_SQL = f"""
WITH RECURSIVE base AS (
  SELECT conv_id, turn_idx, role, text,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS BIGINT) AS n_tokens,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS pos
  FROM ({TRANSCRIPT_BUILD_SQL})
), rec AS (
  SELECT conv_id, turn_idx, pos, n_tokens,
         CAST(0 AS BIGINT) AS chunk_id, n_tokens AS cum
  FROM base WHERE pos = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.pos, b.n_tokens,
         CASE WHEN r.cum + b.n_tokens > {_PACK_BUDGET}
              THEN r.chunk_id + 1 ELSE r.chunk_id END,
         CASE WHEN r.cum + b.n_tokens > {_PACK_BUDGET}
              THEN b.n_tokens ELSE r.cum + b.n_tokens END
  FROM rec r JOIN base b ON b.conv_id = r.conv_id AND b.pos = r.pos + 1
)
SELECT r.conv_id, r.chunk_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(r.n_tokens) AS BIGINT) AS n_tokens,
       string_agg(COALESCE(b.role, '') || ': ' || COALESCE(b.text, ''), chr(10) ORDER BY r.turn_idx) AS example
FROM rec r JOIN base b ON b.conv_id = r.conv_id AND b.turn_idx = r.turn_idx
GROUP BY r.conv_id, r.chunk_id
"""


def tool_transitions(sf_dir: str):
    """Agent-trajectory mining: corpus-wide top-20 adjacent tool
    transitions (tool>next_tool within a conversation's turn order). The
    conversation bucket pass emits PARTIAL transition counts (one row per
    in-bucket distinct transition — the A5 combiner), a second narrow
    bucket pass combines, and streaming top-k avoids any global sort."""
    from fhirflat_ray.functions.util import bucketed_map_groups, streaming_topk

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        tool = g["tool"].to_numpy()
        same = conv[1:] == conv[:-1]
        trans = pd.Series(tool[:-1][same]).str.cat(
            pd.Series(tool[1:][same]), sep=">"
        )
        c = trans.value_counts(sort=False)
        # explicit dtypes so an all-single-turn bucket's empty frame keeps a
        # string-typed transition column through Arrow schema unification
        return pd.DataFrame(
            {
                "transition": pd.Series(c.index.to_numpy(), dtype=object),
                "n": pd.Series(c.to_numpy(np.int64), dtype=np.int64),
            }
        )

    partial = _transcript_grouped(
        sf_dir, pairs, columns=["conv_id", "turn_idx", "tool"]
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("transition", sort=False).agg(n=("n", "sum")).reset_index()

    combined = bucketed_map_groups(partial, ["transition"], combine)
    return streaming_topk(combined, ["n", "transition"], 20, descending=[True, False])


TOOL_TRANSITIONS_SQL = f"""
WITH w AS (
  SELECT conv_id, tool,
         LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_tool
  FROM ({TRANSCRIPT_BUILD_SQL})
)
SELECT tool || '>' || next_tool AS transition, CAST(count(*) AS BIGINT) AS n
FROM w WHERE next_tool IS NOT NULL
GROUP BY 1 ORDER BY n DESC, transition LIMIT 20
"""


def _tool_transition_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed (tool, next_tool, n) transition counts over the
    transcript turn order — the bounded (|tools|²) table behind the
    Markov-chain analytics. Counting fuses into the transcript bucket
    pass; the fold is a driver sum over the vocab-bounded partials."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        tool = g["tool"].to_numpy()
        same = conv[1:] == conv[:-1]
        out = pd.DataFrame({"a": tool[:-1][same], "b": tool[1:][same]})
        return out.groupby(["a", "b"], sort=False, as_index=False).size().rename(
            columns={"size": "n"}
        )

    from fhirflat_ray.functions.util import collect_small_table

    t = collect_small_table(
        _transcript_grouped(sf_dir, pairs, columns=["conv_id", "turn_idx", "tool"])
    )
    return t.to_pandas().groupby(["a", "b"], as_index=False)["n"].sum()


def tool_markov_stationary(sf_dir: str):
    """Stationary distribution of the tool-transition Markov chain (3
    power iterations from uniform, row-normalized counts) — which tools
    an agent's behavior concentrates on in the long run. The distributed
    work is the transition counting (vocab-bounded partials); the 3
    matrix-vector steps run on the bounded |tools|² table and are
    unrolled exactly in the oracle (6dp)."""
    df = _tool_transition_counts(sf_dir)
    tools = np.array(sorted(set(df["a"]) | set(df["b"])))
    k = len(tools)
    idx = {t: i for i, t in enumerate(tools)}
    P = np.zeros((k, k), np.float64)
    for a, b, n in df.itertuples(index=False):
        P[idx[a], idx[b]] = n
    rs = P.sum(axis=1, keepdims=True)
    rs[rs == 0] = 1.0
    P = P / rs
    pi = np.full(k, 1.0 / k)
    for _ in range(3):
        pi = pi @ P
    return pa.table(
        {
            "tool": pa.array(tools, pa.string()),
            "pi": pa.array(np.round(pi, 6), pa.float64()),
        }
    )


def _markov_sql() -> str:
    def step(prev: str, name: str) -> str:
        return f"""{name} AS (
  SELECT p.b AS tool, sum(v.pi * p.pr) AS pi
  FROM p JOIN {prev} v ON v.tool = p.a GROUP BY p.b)"""

    return f"""WITH w AS (
  SELECT conv_id, tool,
         LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_tool
  FROM ({TRANSCRIPT_BUILD_SQL})),
c AS (SELECT tool AS a, next_tool AS b, CAST(count(*) AS DOUBLE) AS n
      FROM w WHERE next_tool IS NOT NULL GROUP BY tool, next_tool),
p AS (SELECT a, b, n / sum(n) OVER (PARTITION BY a) AS pr FROM c),
tools AS (SELECT DISTINCT a AS tool FROM c UNION SELECT DISTINCT b FROM c),
v0 AS (SELECT tool, 1.0 / (SELECT count(*) FROM tools) AS pi FROM tools),
{step('v0', 'v1')},
{step('v1', 'v2')},
{step('v2', 'v3')}
SELECT t.tool, round(coalesce(v3.pi, 0.0), 6) AS pi
FROM tools t LEFT JOIN v3 ON v3.tool = t.tool"""


TOOL_MARKOV_STATIONARY_SQL = _markov_sql()


def tool_entropy_rate(sf_dir: str):
    """Conditional entropy H(next tool | tool) of agent trajectories —
    the regularity/predictability audit: 0 means deterministic workflows,
    ln(|tools|) means uniform wandering. One number from the bounded
    transition table; ln at 6dp with the weighting mirrored
    (Σ p(a,b)·(−ln p(b|a)))."""
    df = _tool_transition_counts(sf_dir)
    n_ab = df["n"].to_numpy(np.float64)
    total = n_ab.sum()
    row = df.groupby("a")["n"].transform("sum").to_numpy(np.float64)
    h = float(np.sum((n_ab / total) * (-np.log(n_ab / row))))
    return pa.table({"entropy_rate": pa.array([round(h, 6)], pa.float64())})


TOOL_ENTROPY_RATE_SQL = f"""
WITH w AS (
  SELECT conv_id, tool,
         LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_tool
  FROM ({TRANSCRIPT_BUILD_SQL})),
c AS (SELECT tool AS a, next_tool AS b, CAST(count(*) AS DOUBLE) AS n
      FROM w WHERE next_tool IS NOT NULL GROUP BY tool, next_tool),
t AS (SELECT a, b, n, sum(n) OVER (PARTITION BY a) AS row_n,
             sum(n) OVER () AS total FROM c)
SELECT round(sum((n / total) * (-ln(n / row_n))), 6) AS entropy_rate FROM t
"""



# =====================================================================
# Wave 7: join/aggregate breadth (TPC-H Q4/Q13/Q18 shapes) + product
# analytics (cohort retention, distributed histogram) + corpus filtering
# =====================================================================


def q4_priority_exists(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS semi-join: count orders per priority that
    have at least one line item shipped AFTER the order date.

    Scale shape: the EXISTS collapses lineitem to ONE row per orderkey
    (max(l_shipdate) — Arrow partial per batch + coarse-bucket final)
    BEFORE the distributed hash join, so the exchange moves |orders in
    window| + |distinct orderkeys| rows, never raw line items. The
    correlated predicate (ship > orderdate) becomes a vectorized
    post-join filter; the priority rollup is a low-cardinality partial
    aggregate."""
    import datetime as dt

    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    lo = pa.scalar(dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1996, 7, 1), pa.timestamp("us"))
    n_parts = _join_partitions(sf_dir, ["orders", "lineitem"])

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
            )
        ),
        batch_format="pyarrow",
    )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def li_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("l_shipdate", "max")])
        return agg_select(g, {"l_orderkey": "l_orderkey", "l_shipdate_max": "max_ship"})

    def li_final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("l_orderkey", sort=False, as_index=False)
            .agg(max_ship=("max_ship", "max"))
        )

    per_order = bucketed_map_groups(
        li.map_batches(li_partial, batch_format="pyarrow"), ["l_orderkey"], li_final
    ).repartition(max(4, n_parts))

    j = orders.join(
        per_order, "inner", n_parts, on=("o_orderkey",), right_on=("l_orderkey",)
    )

    def late_partial(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.greater(b["max_ship"], b["o_orderdate"]))
        g = keep.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
        return agg_select(
            g, {"o_orderpriority": "o_orderpriority", "count_all": "order_count"}
        )

    from ray.data.aggregate import Sum

    return (
        j.map_batches(late_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
    )


Q4_PRIORITY_EXISTS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q13_order_distribution(sf_dir: str):
    """TPC-H-Q13-shaped two-level aggregate: distribution of per-customer
    order counts (how many customers placed exactly N non-urgent orders),
    zero-order customers included.

    Scale shape: orders collapse to one (custkey, count) row per key
    before the left-outer join (aggregate-before-join, as in
    ``customer_order_counts``); the second-level histogram is another
    partial aggregate over the count column — tiny by construction."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    n_parts = _join_partitions(sf_dir, ["customer", "orders"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.not_equal(b["o_orderpriority"], "1-URGENT"))
        g = keep.group_by(["o_custkey"]).aggregate([([], "count_all")])
        return agg_select(g, {"o_custkey": "o_custkey", "count_all": "n"})

    per_cust = bucketed_map_groups(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"],
        lambda g: g.groupby("o_custkey", sort=False, as_index=False).agg(n=("n", "sum")),
    ).repartition(max(4, n_parts))

    j = cust.join(
        per_cust, "left_outer", n_parts, on=("c_custkey",), right_on=("o_custkey",)
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        c = pc.fill_null(pc.cast(b["n"], pa.int64()), 0)
        g = pa.table({"c_count": c}).group_by(["c_count"]).aggregate([([], "count_all")])
        return agg_select(g, {"c_count": "c_count", "count_all": "custdist"})

    from ray.data.aggregate import Sum

    return (
        j.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    )


Q13_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


def q18_large_orders(sf_dir: str):
    """TPC-H-Q18-shaped HAVING filter on a high-cardinality aggregate:
    orders whose total quantity exceeds 250, joined back to orders and
    customer for the report columns.

    Scale shape: the HAVING threshold is applied inside the coarse-bucket
    final combine, so only qualifying orderkeys (a tiny fraction) enter
    the two report joins; l_quantity is integral so the double sum is
    exact under any combine order."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    n_parts = _join_partitions(sf_dir, ["orders", "lineitem"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("l_quantity", "sum")])
        return agg_select(g, {"l_orderkey": "l_orderkey", "l_quantity_sum": "sum_qty"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_orderkey", sort=False, as_index=False).agg(
            sum_qty=("sum_qty", "sum")
        )
        return out[out["sum_qty"] > 250.0]

    big = bucketed_map_groups(
        li.map_batches(partial, batch_format="pyarrow"), ["l_orderkey"], final
    ).repartition(max(4, n_parts))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    j = big.join(orders, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.join(cust, "inner", n_parts, on=("o_custkey",), right_on=("c_custkey",))
    return j.select_columns(["c_name", "l_orderkey", "o_totalprice", "sum_qty"])


Q18_LARGE_ORDERS_SQL = """
SELECT c_name, l_orderkey, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users grouped by the ISO week of their
    FIRST event; for each (cohort_week, weeks_since_cohort) the count of
    distinct active users.

    Scale shape: ONE user-key bucket shuffle — each bucket derives every
    user's cohort (min event week) and its distinct (cohort, age) pairs
    vectorized; because a user lives entirely in one bucket, the partial
    distinct-user counts are disjoint and a tiny Sum finishes the matrix
    (no count-distinct shuffle, no join back to the corpus)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"]
        # Monday-start week truncation, mirroring date_trunc('week', ts)
        week = ts.dt.normalize() - pd.to_timedelta(ts.dt.weekday, unit="D")
        cohort = week.groupby(g["user_id"], sort=False).transform("min")
        age = ((week - cohort).dt.days // 7).astype(np.int64)
        d = pd.DataFrame(
            {"user_id": g["user_id"], "cohort_week": cohort, "age_weeks": age}
        ).drop_duplicates()
        out = (
            d.groupby(["cohort_week", "age_weeks"], sort=False)
            .agg(active_users=("user_id", "size"))
            .reset_index()
        )
        out["active_users"] = out["active_users"].astype(np.int64)
        return out

    partial = bucketed_map_groups(ds, ["user_id"], per_bucket)

    from ray.data.aggregate import Sum

    return partial.groupby(["cohort_week", "age_weeks"]).aggregate(
        Sum("active_users", alias_name="active_users")
    )


RETENTION_COHORTS_SQL = """
WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS age_weeks,
       count(DISTINCT e.user_id) AS active_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


def value_histogram(sf_dir: str):
    """Distributed equi-width histogram of ``l_extendedprice`` (width
    5000): per-bin count plus exact min/max. Map-only partials (floor
    division + Arrow group_by per batch) and a tiny final combine — the
    profile-style sketch every ingest pipeline runs before picking codec
    or partition bounds. Bin edges are IEEE-exact (divide + floor), so
    the result is bit-identical across engines."""
    from fhirflat_ray.functions.util import agg_select

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        binv = pc.cast(
            pc.floor(pc.divide(b["l_extendedprice"], pa.scalar(5000.0))), pa.int64()
        )
        t = pa.table({"bin": binv, "price": b["l_extendedprice"]})
        g = t.group_by(["bin"]).aggregate(
            [([], "count_all"), ("price", "min"), ("price", "max")]
        )
        return agg_select(
            g,
            {"bin": "bin", "count_all": "n", "price_min": "lo", "price_max": "hi"},
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"),
        )
    )


VALUE_HISTOGRAM_SQL = """
SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
       count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
FROM lineitem GROUP BY bin
"""


#: multi-pattern blocklist as ONE compiled RE2 alternation — the
#: Aho-Corasick-style corpus filter a training pipeline runs over every
#: document; both Arrow and DuckDB execute the identical RE2 pattern
BLOCKLIST_PATTERN = r"\b(spark|slow|error)\b"


def blocklist_filter(sf_dir: str):
    """Corpus blocklist screening: per source, how many documents match a
    banned-term list. The N-term list compiles to one RE2 alternation
    evaluated vectorized per batch (map-only; one pass over the text
    column), with a low-cardinality partial aggregate — no shuffle of
    text bytes anywhere."""
    from fhirflat_ray.functions.util import agg_select

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        hit = pc.cast(
            pc.match_substring_regex(b["text"], BLOCKLIST_PATTERN), pa.int64()
        )
        t = pa.table({"source": b["source"], "hit": hit})
        g = t.group_by(["source"]).aggregate([([], "count_all"), ("hit", "sum")])
        return agg_select(
            g, {"source": "source", "count_all": "n_docs", "hit_sum": "n_flagged"}
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_flagged", alias_name="n_flagged"),
        )
    )


BLOCKLIST_FILTER_SQL = f"""
SELECT source, count(*) AS n_docs,
       CAST(count(*) FILTER (WHERE regexp_matches(text, '{BLOCKLIST_PATTERN}')) AS BIGINT) AS n_flagged
FROM documents GROUP BY source
"""


# =====================================================================
# Wave 8: iterative / numerical operators (per-dimension profile,
# distributed k-means, distributed PageRank)
# =====================================================================


def embed_dim_stats(sf_dir: str):
    """Per-dimension mean/variance profile of the embedding table — the
    normalization-statistics pass a training pipeline runs before
    whitening or quantizing vectors.

    Map-only: each batch reduces its zero-copy (n, dim) float block to
    ``dim`` partial rows (n, sum, sum-of-squares); a tiny Sum combine
    finishes. No shuffle of vector data anywhere."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(len(col), -1)
        dim = mat.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, dim + 1), pa.int64()),
                "cnt": pa.array(np.full(dim, mat.shape[0]), pa.int64()),
                "s": pa.array(mat.sum(axis=0), pa.float64()),
                "ss": pa.array((mat * mat).sum(axis=0), pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False)
        ss = b["ss"].to_numpy(zero_copy_only=False)
        mean = s / n
        var = ss / n - mean * mean
        return pa.table(
            {
                "dim": b["dim"],
                "mean_v": pa.array(np.round(mean, 6), pa.float64()),
                "var_v": pa.array(np.round(var, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


EMBED_DIM_STATS_SQL = """
SELECT i AS dim, round(avg(v), 6) AS mean_v, round(var_pop(v), 6) AS var_v
FROM (SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
      FROM embeddings)
GROUP BY i
"""


def embed_cov(sf_dir: str):
    """Full population covariance matrix of the embedding table as
    ``(i, j, cov)`` rows — the statistics pass before whitening / PCA.
    Map-only corpus fold (one X^T X matmul per batch) + a d^2-key
    aggregate; vectors never shuffle."""
    from fhirflat_ray.functions.clustering import embedding_covariance

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def rounded(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("cov"),
            "cov",
            pa.array(np.round(b["cov"].to_numpy(zero_copy_only=False), 6), pa.float64()),
        )

    return embedding_covariance(ds).map_batches(rounded, batch_format="pyarrow")


EMBED_COV_SQL = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, round(covar_pop(a.v, b.v), 6) AS cov
FROM ex a JOIN ex b ON a.vec_id = b.vec_id
GROUP BY a.i, b.i
"""


def embed_pca_project(sf_dir: str):
    """PCA projection onto the top-2 principal components (rows-only check:
    the eigendecomposition step is not SQL-expressible — the distributed
    covariance underneath it IS fully oracle-checked via `embed_cov`, and
    the projection is pinned against direct numpy PCA in pytest)."""
    from fhirflat_ray.functions.clustering import pca_project

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pca_project(ds, k=2)


def kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means (k=4, 3 iterations) over the embedding
    table: broadcast centroids down, fold K-row partial sums up — every
    corpus pass map-only (``functions/clustering.py``). Output is the
    integer per-cluster summary (size + id checksum), fully
    hash-comparable against the unrolled-CTE SQL oracle."""
    from fhirflat_ray.functions.clustering import kmeans_fit_assign

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_fit_assign(ds, k=4, iters=3)


def _km_assign_cte(prev_cent: str, name: str) -> str:
    return f"""{name} AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.cluster_id FROM {prev_cent} c
          ORDER BY list_distance(e.embedding, c.c), c.cluster_id LIMIT 1) AS cl
  FROM embeddings e)"""


def _km_cent_cte(assign: str, name: str) -> str:
    return f"""{name}_d AS (
  SELECT cl, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
  FROM {assign}),
{name} AS (
  SELECT cl AS cluster_id, list(avg_v ORDER BY i) AS c FROM (
    SELECT cl, i, avg(v) AS avg_v FROM {name}_d GROUP BY cl, i) GROUP BY cl)"""


def _km_cte_chain(k: int) -> str:
    """The shared unrolled 3-iteration Lloyd prefix: c0 init (smallest-id
    vectors) → assign a1 → centroids c1 → assign a2 → centroids c2 →
    final assignment a3(vec_id, embedding, cl)."""
    return f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster_id,
         embedding AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k})),
{_km_assign_cte('c0', 'a1')},
{_km_cent_cte('a1', 'c1')},
{_km_assign_cte('c1', 'a2')},
{_km_cent_cte('a2', 'c2')},
{_km_assign_cte('c2', 'a3')}"""


def _kmeans_sql(k: int = 4) -> str:
    return f"""WITH {_km_cte_chain(k)}
SELECT cl AS cluster_id, count(*) AS n_members,
       CAST(sum(vec_id) AS BIGINT) AS id_sum
FROM a3 GROUP BY cl"""


KMEANS_EMBEDDINGS_SQL = _kmeans_sql(4)


def semantic_dedup(sf_dir: str):
    """SemDeDup (cluster-then-dedup): k-means buckets the embedding space
    (map-only broadcast/fold fit, one assignment pass), pairwise cosine
    runs only WITHIN a cluster, min-id survives per near-dup component.
    The full pipeline — centroid fit, assignment, cluster-bucket shuffle,
    in-cluster similarity + component flood — sits under one unrolled-CTE
    oracle (kmeans chain + recursive transitive closure restricted to
    same-cluster pairs)."""
    from fhirflat_ray.functions.dedup import semantic_dedup as _sd

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return _sd(ds, k=4, iters=3, threshold=0.45)


SEMANTIC_DEDUP_SQL = f"""
WITH RECURSIVE {_km_cte_chain(4)},
pairs AS (
  SELECT x.vec_id AS u, y.vec_id AS v
  FROM a3 x JOIN a3 y ON x.cl = y.cl AND x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.45
),
edges AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
reach(node, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
)
SELECT node AS vec_id FROM reach GROUP BY node HAVING min(r) = node
"""

def embed_outliers(sf_dir: str):
    """Embedding outlier detection: distance to the assigned k-means
    centroid, global top-20 farthest vectors. Composes the map-only
    broadcast/fold centroid fit (``kmeans_centroids``), ONE scoring pass
    (centroids broadcast once per worker), and ``streaming_topk`` — no
    shuffle in the whole pipeline. Distances round to 6dp so combine-order
    float noise cannot leak into the oracle hash."""
    import ray

    from fhirflat_ray.functions.clustering import _matrix, kmeans_centroids
    from fhirflat_ray.functions.util import streaming_topk, worker_cached_stage

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = kmeans_centroids(ds, k=4, iters=3)
    ref = ray.put(cent)

    class Dist:
        def __init__(self, ref):
            self.cent = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            mat = _matrix(b["embedding"])
            d2 = ((mat[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            cl = np.argmin(d2, axis=1)
            dist = np.sqrt(d2[np.arange(len(cl)), cl])
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "cl": pa.array(cl, pa.int64()),
                    "dist": pa.array(np.round(dist, 6), pa.float64()),
                }
            )

    scored = ds.map_batches(
        worker_cached_stage(Dist, ref=ref), batch_format="pyarrow"
    )
    return streaming_topk(scored, ["dist", "vec_id"], 20, descending=[True, False])


EMBED_OUTLIERS_SQL = f"""
WITH {_km_cte_chain(4)},
d AS (
  SELECT a3.vec_id, a3.cl,
         round(list_distance(CAST(a3.embedding AS DOUBLE[]), c.c), 6) AS dist
  FROM a3 JOIN c2 c ON c.cluster_id = a3.cl)
SELECT vec_id, cl, dist FROM d ORDER BY dist DESC, vec_id LIMIT 20
"""


def logreg_train(sf_dir: str):
    """Distributed logistic-regression training (full-batch GD, 3
    iterations, lr=0.5): predict lang='en' from two document features
    (chars/1000, spaces/100). Weights broadcast down, partial gradients
    fold up — one map-only corpus pass per iteration
    (``clustering.logreg_train_gd``); the oracle unrolls the three exact
    gradient steps in SQL."""
    from fhirflat_ray.functions.clustering import logreg_train_gd

    ds = _read(sf_dir, "documents", columns=["text", "lang", "n_chars"])

    def feat(b: pa.Table) -> pa.Table:
        nsp = pc.subtract(
            pc.utf8_length(b["text"]),
            pc.utf8_length(pc.replace_substring(b["text"], " ", "")),
        )
        return pa.table(
            {
                "x1": pc.divide(pc.cast(b["n_chars"], pa.float64()), 1000.0),
                "x2": pc.divide(pc.cast(nsp, pa.float64()), 100.0),
                "y": pc.if_else(
                    pc.equal(b["lang"], "en"), pa.scalar(1.0), pa.scalar(0.0)
                ),
            }
        )

    w = logreg_train_gd(
        ds.map_batches(feat, batch_format="pyarrow"), ["x1", "x2"], "y",
        iters=3, lr=0.5,
    )
    return pa.table(
        {
            "feature": pa.array(["bias", "x1", "x2"], pa.string()),
            "weight": pa.array(np.round(w, 6), pa.float64()),
        }
    )


def _logreg_sql(iters: int = 3, lr: float = 0.5) -> str:
    b, w1, w2 = "0.0", "0.0", "0.0"
    ctes = []
    for i in range(1, iters + 1):
        z = f"({b} + ({w1})*x1 + ({w2})*x2)"
        s = f"(1.0/(1.0+exp(-{z})))"
        ctes.append(
            f"""w{i} AS (
  SELECT {b} - {lr}*avg({s} - y) AS b,
         ({w1}) - {lr}*avg(({s} - y)*x1) AS wx1,
         ({w2}) - {lr}*avg(({s} - y)*x2) AS wx2
  FROM f)"""
        )
        b = f"(SELECT b FROM w{i})"
        w1 = f"(SELECT wx1 FROM w{i})"
        w2 = f"(SELECT wx2 FROM w{i})"
    joined = ",\n".join(ctes)
    return f"""WITH f AS (
  SELECT n_chars/1000.0 AS x1,
         (length(text) - length(replace(text,' ','')))/100.0 AS x2,
         CASE WHEN lang='en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
{joined}
SELECT 'bias' AS feature, round((SELECT b FROM w{iters}), 6) AS weight
UNION ALL SELECT 'x1', round((SELECT wx1 FROM w{iters}), 6)
UNION ALL SELECT 'x2', round((SELECT wx2 FROM w{iters}), 6)"""


LOGREG_TRAIN_SQL = _logreg_sql(3, 0.5)


def _coorder_edges(sf_dir: str, n_parts: int):
    """Distinct co-ordered part pairs (u < v) from lineitem — the shared
    edge build of the graph-analytics queries. One coarse-bucket shuffle
    on the order key (per-order fan-out is bounded at 7 line items, so
    in-order pair enumeration is output-linear) + one distinct exchange.

    Bucket count: ``max(n_parts, default_num_buckets())`` — the bucket
    stages are sort-exchange + CPU-bound pandas kernels, NOT hash-join
    aggregator actors, so they should saturate the cluster's cores even
    when the byte-sized join partition count is small (n_parts=4 at sf0.1
    left a 32-core host 87% idle through the pair kernel; 3.5x measured)."""
    from fhirflat_ray.functions.graph import group_pairs
    from fhirflat_ray.functions.util import (
        bucketed_map_groups,
        default_num_buckets,
        distinct_rows,
    )

    nb = max(n_parts, default_num_buckets())
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(
            ["l_orderkey", "l_partkey"], kind="mergesort"
        )
        u, v = group_pairs(
            g["l_partkey"].to_numpy(), g["l_orderkey"].to_numpy()
        )
        return pd.DataFrame({"u": u, "v": v}).drop_duplicates()

    prs = bucketed_map_groups(li, ["l_orderkey"], pairs, num_buckets=nb)
    return distinct_rows(prs, ["u", "v"], num_buckets=nb)


def quality_scores(sf_dir: str):
    """Train-then-apply composition: the distributed logistic regression
    of ``logreg_train`` fits in-pipeline (3 map-only GD iterations), then
    ONE scoring pass applies the learned weights to every document —
    P(lang='en' | features) at 6dp. The oracle chains the unrolled
    gradient CTEs into a per-document sigmoid."""
    import ray

    from fhirflat_ray.functions.clustering import logreg_train_gd
    from fhirflat_ray.functions.util import worker_cached_stage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])

    def feat(b: pa.Table) -> pa.Table:
        nsp = pc.subtract(
            pc.utf8_length(b["text"]),
            pc.utf8_length(pc.replace_substring(b["text"], " ", "")),
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "x1": pc.divide(pc.cast(b["n_chars"], pa.float64()), 1000.0),
                "x2": pc.divide(pc.cast(nsp, pa.float64()), 100.0),
                "y": pc.if_else(
                    pc.equal(b["lang"], "en"), pa.scalar(1.0), pa.scalar(0.0)
                ),
            }
        )

    feats = ds.map_batches(feat, batch_format="pyarrow").materialize()
    w = logreg_train_gd(feats, ["x1", "x2"], "y", iters=3, lr=0.5)
    ref = ray.put(w)

    class Score:
        def __init__(self, ref):
            self.w = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            x1 = b["x1"].to_numpy(zero_copy_only=False)
            x2 = b["x2"].to_numpy(zero_copy_only=False)
            z = self.w[0] + self.w[1] * x1 + self.w[2] * x2
            p = 1.0 / (1.0 + np.exp(-z))
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "p_en": pa.array(np.round(p, 6), pa.float64()),
                }
            )

    return feats.map_batches(worker_cached_stage(Score, ref=ref), batch_format="pyarrow")


def _quality_scores_sql() -> str:
    # reuse the unrolled training CTEs, then score every document
    train = _logreg_sql(3, 0.5).split("\nSELECT 'bias'")[0].removeprefix("WITH ")
    b = "(SELECT b FROM w3)"
    w1 = "(SELECT wx1 FROM w3)"
    w2 = "(SELECT wx2 FROM w3)"
    return f"""WITH fd AS (
  SELECT doc_id, n_chars/1000.0 AS x1,
         (length(text) - length(replace(text,' ','')))/100.0 AS x2
  FROM documents),
{train}
SELECT doc_id,
       round(1.0/(1.0+exp(-({b} + {w1}*x1 + {w2}*x2))), 6) AS p_en
FROM fd"""


QUALITY_SCORES_SQL = _quality_scores_sql()


#: hashed-feature dims for document clustering (leading-byte buckets —
#: a SQL-mirrorable stand-in for the term-hashing trick)
_DOCVEC_DIMS = 16


def doc_clusters(sf_dir: str):
    """Document clustering over hashed bag-of-words features: each doc
    reduces to a 16-dim count vector (terms bucketed by leading byte mod
    16 — the hashing-trick shape with a SQL-mirrorable hash), distributed
    Lloyd k-means (k=4, 3 iters) fits on those vectors, and the output is
    the integer per-cluster summary (members, id sum) so the whole
    unsupervised pipeline is hash-comparable with no float tolerance.
    Feature build is map-only (token ord only ever computed on the
    vocab-bounded UNIQUE leading chars per batch); clustering reuses the
    broadcast/fold kmeans engine."""
    from fhirflat_ray.functions.clustering import kmeans_fit_assign
    from fhirflat_ray.functions.text import _split_words

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_vec(b: pa.Table) -> pa.Table:
        vals, parent, n = _split_words(b["text"])
        mat = np.zeros((n, _DOCVEC_DIMS), np.float64)
        if len(vals):
            firsts = np.array([s[:1] for s in vals], dtype=object)
            un, inv = np.unique(firsts, return_inverse=True)
            buckets = np.array([ord(c) % _DOCVEC_DIMS for c in un], np.int64)[inv]
            np.add.at(mat, (parent, buckets), 1.0)
        return pa.table(
            {
                "vec_id": b["doc_id"],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.float64()), _DOCVEC_DIMS
                ),
            }
        )

    vecs = docs.map_batches(to_vec, batch_format="pyarrow")
    return kmeans_fit_assign(vecs, k=4, iters=3)


def _doc_clusters_sql() -> str:
    d = _DOCVEC_DIMS

    def assign(prev: str, name: str) -> str:
        return f"""{name} AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.cluster_id FROM {prev} c
          ORDER BY list_distance(e.embedding, c.c), c.cluster_id LIMIT 1) AS cl
  FROM docvec e)"""

    def cent(prev: str, name: str) -> str:
        return f"""{name}_d AS (
  SELECT cl, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
  FROM {prev}),
{name} AS (
  SELECT cl AS cluster_id, list(avg_v ORDER BY i) AS c FROM (
    SELECT cl, i, avg(v) AS avg_v FROM {name}_d GROUP BY cl, i) GROUP BY cl)"""

    return rf"""WITH tok AS (
  SELECT doc_id, ord(substr(term, 1, 1)) % {d} AS b FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)),
cnt AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS v FROM tok GROUP BY doc_id, b),
grid AS (
  SELECT d.doc_id, s.d AS b, coalesce(c.v, 0.0) AS v
  FROM documents d CROSS JOIN generate_series(0, {d - 1}) s(d)
  LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.b = s.d),
docvec AS (
  SELECT doc_id AS vec_id, list(v ORDER BY b) AS embedding
  FROM grid GROUP BY doc_id),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster_id,
         embedding AS c
  FROM (SELECT * FROM docvec ORDER BY vec_id LIMIT 4)),
{assign('c0', 'a1')},
{cent('a1', 'c1')},
{assign('c1', 'a2')},
{cent('a2', 'c2')},
{assign('c2', 'a3')}
SELECT cl AS cluster_id, count(*) AS n_members,
       CAST(sum(vec_id) AS BIGINT) AS id_sum
FROM a3 GROUP BY cl"""


DOC_CLUSTERS_SQL = _doc_clusters_sql()


def quality_confusion(sf_dir: str):
    """Classifier evaluation: confusion counts (tp/fp/fn/tn at the 0.5
    threshold) of the in-pipeline-trained logistic regression against the
    true labels — the eval loop closing the train→apply→measure ML cycle.
    Integer-only output; the threshold compare uses the UNROUNDED sigmoid
    on both sides (z > 0 ⟺ p > 0.5, so the compare is sign(z) — no float
    boundary at all)."""
    import ray

    from fhirflat_ray.functions.clustering import logreg_train_gd
    from fhirflat_ray.functions.util import collect_small_table, worker_cached_stage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])

    def feat(b: pa.Table) -> pa.Table:
        nsp = pc.subtract(
            pc.utf8_length(b["text"]),
            pc.utf8_length(pc.replace_substring(b["text"], " ", "")),
        )
        return pa.table(
            {
                "x1": pc.divide(pc.cast(b["n_chars"], pa.float64()), 1000.0),
                "x2": pc.divide(pc.cast(nsp, pa.float64()), 100.0),
                "y": pc.if_else(
                    pc.equal(b["lang"], "en"), pa.scalar(1.0), pa.scalar(0.0)
                ),
            }
        )

    feats = ds.map_batches(feat, batch_format="pyarrow").materialize()
    w = logreg_train_gd(feats, ["x1", "x2"], "y", iters=3, lr=0.5)
    ref = ray.put(w)

    class Confuse:
        def __init__(self, ref):
            self.w = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            x1 = b["x1"].to_numpy(zero_copy_only=False)
            x2 = b["x2"].to_numpy(zero_copy_only=False)
            y = b["y"].to_numpy(zero_copy_only=False) > 0.5
            pred = (self.w[0] + self.w[1] * x1 + self.w[2] * x2) > 0.0
            return pa.table(
                {
                    "tp": pa.array([int((pred & y).sum())], pa.int64()),
                    "fp": pa.array([int((pred & ~y).sum())], pa.int64()),
                    "fn": pa.array([int((~pred & y).sum())], pa.int64()),
                    "tn": pa.array([int((~pred & ~y).sum())], pa.int64()),
                }
            )

    t = collect_small_table(
        feats.map_batches(worker_cached_stage(Confuse, ref=ref), batch_format="pyarrow")
    )
    return pa.table(
        {
            c: pa.array([int(t[c].to_numpy(zero_copy_only=False).sum())], pa.int64())
            for c in ("tp", "fp", "fn", "tn")
        }
    )


def _quality_confusion_sql() -> str:
    train = _logreg_sql(3, 0.5).split("\nSELECT 'bias'")[0].removeprefix("WITH ")
    z = (
        "((SELECT b FROM w3) + (SELECT wx1 FROM w3)*x1"
        " + (SELECT wx2 FROM w3)*x2)"
    )
    return f"""WITH {train}
SELECT CAST(sum(CASE WHEN {z} > 0 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN {z} > 0 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN {z} <= 0 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(sum(CASE WHEN {z} <= 0 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM f"""


QUALITY_CONFUSION_SQL = _quality_confusion_sql()


def quality_calibration(sf_dir: str):
    """Reliability-diagram data for the trained quality classifier: 10
    equal-width probability bins with (n, n_pos) INTEGER counts — the
    calibration curve a model gate plots. The bin index derives from the
    ROUNDED 6dp sigmoid (the ``quality_scores`` output), so the integer
    bin edges are boundary-safe on both engines."""
    import ray

    from fhirflat_ray.functions.clustering import logreg_train_gd
    from fhirflat_ray.functions.util import collect_small_table, worker_cached_stage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])

    def feat(b: pa.Table) -> pa.Table:
        nsp = pc.subtract(
            pc.utf8_length(b["text"]),
            pc.utf8_length(pc.replace_substring(b["text"], " ", "")),
        )
        return pa.table(
            {
                "x1": pc.divide(pc.cast(b["n_chars"], pa.float64()), 1000.0),
                "x2": pc.divide(pc.cast(nsp, pa.float64()), 100.0),
                "y": pc.if_else(
                    pc.equal(b["lang"], "en"), pa.scalar(1.0), pa.scalar(0.0)
                ),
            }
        )

    feats = ds.map_batches(feat, batch_format="pyarrow").materialize()
    w = logreg_train_gd(feats, ["x1", "x2"], "y", iters=3, lr=0.5)
    ref = ray.put(w)

    class Bins:
        def __init__(self, ref):
            self.w = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            x1 = b["x1"].to_numpy(zero_copy_only=False)
            x2 = b["x2"].to_numpy(zero_copy_only=False)
            y = (b["y"].to_numpy(zero_copy_only=False) > 0.5).astype(np.int64)
            p = np.round(
                1.0 / (1.0 + np.exp(-(self.w[0] + self.w[1] * x1 + self.w[2] * x2))),
                6,
            )
            bn = np.minimum((p * 10.0).astype(np.int64), 9)
            g = (
                pd.DataFrame({"bin": bn, "n": 1, "n_pos": y})
                .groupby("bin", sort=False, as_index=False)
                .agg(n=("n", "sum"), n_pos=("n_pos", "sum"))
            )
            return pa.Table.from_pandas(g, preserve_index=False)

    t = collect_small_table(
        feats.map_batches(worker_cached_stage(Bins, ref=ref), batch_format="pyarrow")
    )
    df = (
        t.to_pandas().groupby("bin", as_index=False)[["n", "n_pos"]].sum()
        .sort_values("bin")
    )
    return pa.table(
        {
            "bin": pa.array(df["bin"].to_numpy(np.int64)),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "n_pos": pa.array(df["n_pos"].to_numpy(np.int64)),
        }
    )


def _quality_calibration_sql() -> str:
    train = _logreg_sql(3, 0.5).split("\nSELECT 'bias'")[0].removeprefix("WITH ")
    z = (
        "((SELECT b FROM w3) + (SELECT wx1 FROM w3)*x1"
        " + (SELECT wx2 FROM w3)*x2)"
    )
    return f"""WITH {train},
sc AS (
  SELECT y, least(CAST(floor(round(1.0/(1.0+exp(-{z})), 6) * 10.0) AS BIGINT), 9) AS bin
  FROM f)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
FROM sc GROUP BY bin"""


QUALITY_CALIBRATION_SQL = _quality_calibration_sql()


def lang_balance(sf_dir: str):
    """Balanced-mixture downsampling: every language keeps exactly
    min-language-count documents (smallest doc_ids win) — the
    equal-representation resample a multilingual mixture designer runs.
    The per-lang count folds tiny, the global min broadcasts, and the
    keep-k pass is one lang-bucket exchange with a vectorized head(k)."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        collect_small_table,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang"]).aggregate([([], "count_all")])
        return agg_select(g, {"lang": "lang", "count_all": "n"})

    counts = collect_small_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
    )
    k = int(counts["n"].to_numpy(zero_copy_only=False).min())

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "doc_id"], kind="mergesort")
        return g.groupby("lang", sort=False).head(k)

    return bucketed_map_groups(ds, ["lang"], keep)


LANG_BALANCE_SQL = """
WITH k AS (
  SELECT min(n) AS k FROM (SELECT count(*) AS n FROM documents GROUP BY lang))
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents) WHERE rn <= (SELECT k FROM k)
"""


def triangles_coorder(sf_dir: str):
    """Exact triangle count on the parts-co-ordered-together graph (edge =
    two parts sharing an order; triangle = three parts pairwise
    co-ordered); counting is the degree-ordered node-iterator in
    ``functions/graph.py:triangle_count``."""
    from fhirflat_ray.functions.graph import triangle_count

    n_parts = _join_partitions(sf_dir, ["lineitem"])
    return triangle_count(_coorder_edges(sf_dir, n_parts), num_partitions=n_parts)


TRIANGLES_COORDER_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


def span_corruption(sf_dir: str):
    """T5-style span-corruption example builder: every 5th-offset token
    (1-based position ≡ 3 mod 5 — deterministic, no RNG) is replaced by
    the sentinel ``<X>`` in the input and collected into the target;
    documents with no masked token drop out. Map-only end to end: the
    per-batch kernel rebuilds Arrow list arrays around the masked token
    stream and joins them with ``pc.binary_join`` (C++ kernel — no Python
    per document)."""
    from fhirflat_ray.functions.text import _split_words

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def build(b: pa.Table) -> pa.Table:
        vals, parent, n = _split_words(b["text"])
        cnt = np.bincount(parent, minlength=n)
        # 1-based position of each token inside its document
        firsts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pos = np.arange(len(vals)) - firsts[parent] + 1
        masked = pos % 5 == 3
        inp = vals.copy()
        inp[masked] = "<X>"
        in_offs = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
        in_list = pa.ListArray.from_arrays(
            pa.array(in_offs), pa.array(inp, pa.string())
        )
        mcnt = np.bincount(parent[masked], minlength=n)
        tg_offs = np.concatenate([[0], np.cumsum(mcnt)]).astype(np.int32)
        tg_list = pa.ListArray.from_arrays(
            pa.array(tg_offs), pa.array(vals[masked], pa.string())
        )
        keep = mcnt > 0
        t = pa.table(
            {
                "doc_id": b["doc_id"],
                "input_text": pc.binary_join(in_list, " "),
                "target_text": pc.binary_join(tg_list, " "),
            }
        )
        return t.filter(pa.array(keep))

    return docs.map_batches(build, batch_format="pyarrow")


SPAN_CORRUPTION_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\S+')) AS term,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS i
  FROM documents)
SELECT doc_id,
       string_agg(CASE WHEN i % 5 = 3 THEN '<X>' ELSE term END, ' ' ORDER BY i)
         AS input_text,
       string_agg(CASE WHEN i % 5 = 3 THEN term END, ' ' ORDER BY i)
         AS target_text
FROM tok GROUP BY doc_id
HAVING count(*) FILTER (i % 5 = 3) > 0
"""


def kcore_filter(sf_dir: str):
    """Fixed-round k-core peeling (k=75, 3 rounds) on the co-ordered-parts
    graph — the graph-sparsification pass that strips low-connectivity
    noise before community/embedding work. Each round is ONE
    ``peel_low_degree`` pass: below the node budget the sub-k DROP set
    broadcasts and edges drop map-only; above it survivors resolve via
    Bloom-prefiltered distributed semi joins, so no node-scale state ever
    touches the driver. Returns the distinct surviving nodes."""
    from fhirflat_ray.functions.graph import peel_low_degree
    from fhirflat_ray.functions.util import distinct_rows

    n_parts = _join_partitions(sf_dir, ["lineitem"])
    edges = _coorder_edges(sf_dir, n_parts).materialize()

    k = 75
    for _ in range(3):
        edges, n_dropped, n_nodes = peel_low_degree(edges, k, num_partitions=n_parts)
        if n_nodes == 0 or n_dropped == 0:
            break

    def nodes_of(b: pa.Table) -> pa.Table:
        nodes = np.unique(
            np.concatenate(
                [
                    b["u"].to_numpy(zero_copy_only=False),
                    b["v"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node": pa.array(nodes, pa.int64())})

    return distinct_rows(
        edges.map_batches(nodes_of, batch_format="pyarrow"), ["node"],
        num_buckets=n_parts,
    )


def _kcore_sql(k: int = 3, rounds: int = 3) -> str:
    ctes = [
        """e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS (
  SELECT node FROM (
    SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
  GROUP BY node HAVING count(*) >= {k}),
e{r} AS (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT node FROM d{r}) AND v IN (SELECT node FROM d{r}))"""
        )
        prev = f"e{r}"
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT DISTINCT node FROM (
  SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})"""


KCORE_FILTER_SQL = _kcore_sql(75, 3)


def clustering_coeff(sf_dir: str):
    """Top-25 nodes by local clustering coefficient (2T / d(d-1)) on the
    co-ordered-parts graph — the community-structure probe. Triangle
    triples come from the degree-ordered node-iterator
    (``triangle_count(return_triangles=True)``); per-node triangle counts
    fold through one coarse-bucket exchange on the (node-bounded) exploded
    triple stream; degrees attach via the hybrid ``attach_degrees``
    (broadcast below the node budget, distributed hash joins above);
    the top-25 is ``streaming_topk``. Tie note: coefficient ties are
    broken by node id, and 2T/d(d-1) can land exactly on a 1e-6
    half-boundary only when d(d-1) is a power of two — impossible for
    d > 2 — so 6dp rounding is tie-free across engines."""
    from fhirflat_ray.functions.graph import triangle_count
    from fhirflat_ray.functions.util import (
        bucketed_map_groups,
        default_num_buckets,
        streaming_topk,
    )

    n_parts = _join_partitions(sf_dir, ["lineitem"])
    edges = _coorder_edges(sf_dir, n_parts).materialize()
    tri = triangle_count(edges, num_partitions=n_parts, return_triangles=True)

    def explode(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [b[c].to_numpy(zero_copy_only=False) for c in ("n1", "n2", "n3")]
        )
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(un, pa.int64()), "tri": pa.array(cnt, pa.int64())}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False, as_index=False).agg(tri=("tri", "sum"))

    tri_counts = bucketed_map_groups(
        tri.map_batches(explode, batch_format="pyarrow"), ["node"], fold,
        num_buckets=max(n_parts, default_num_buckets()),
    )

    # degrees: broadcast below the node budget, distributed joins above
    from fhirflat_ray.functions.graph import attach_degrees

    with_deg = attach_degrees(
        tri_counts, edges, [("node", "deg")], num_partitions=n_parts,
    )

    def coeff_kernel(b: pa.Table) -> pa.Table:
        tri_n = b["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = b["deg"].to_numpy(zero_copy_only=False)
        keep = d >= 2
        coeff = np.round(
            2.0 * tri_n[keep] / (d[keep] * (d[keep] - 1)).astype(np.float64), 6
        )
        return pa.table(
            {
                "node": b["node"].filter(pa.array(keep)),
                "tri": b["tri"].filter(pa.array(keep)),
                "deg": pa.array(d[keep].astype(np.int64), pa.int64()),
                "coeff": pa.array(coeff, pa.float64()),
            }
        )

    scored = with_deg.map_batches(coeff_kernel, batch_format="pyarrow")
    return streaming_topk(scored, ["coeff", "node"], 25, descending=[True, False])


CLUSTERING_COEFF_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
t AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
n AS (
  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
    SELECT x AS node FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t)
  GROUP BY node),
d AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node)
SELECT node, tri, deg, coeff FROM (
  SELECT n.node, n.tri, d.deg,
         round(2.0 * n.tri / (d.deg * (d.deg - 1)), 6) AS coeff
  FROM n JOIN d ON d.node = n.node AND d.deg >= 2)
ORDER BY coeff DESC, node LIMIT 25
"""


#: duplicated-span window width (tokens) shared with the SQL oracle
_DUP_SPAN_W = 8


def dup_span_flags(sf_dir: str):
    """Duplicated-n-gram span signal (the exact-substring-dedup statistic
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22, reduced to 8-token windows): per document, how many
    of its token windows occur more than once ANYWHERE in the corpus.

    Scale shape: window construction is map-only (8 shifted slices of the
    flat token stream joined by one ``pc.binary_join_element_wise`` C++
    call, doc-boundary windows masked); the window strings shuffle ONCE
    (coarse-bucket on the n-gram — at production scale this column would
    be a 64-bit content hash; the oracle keeps the string so SQL can form
    the identical key); per-doc partials re-shuffle as 3 narrow columns."""
    from fhirflat_ray.functions.text import _split_words
    from fhirflat_ray.functions.util import bucketed_map_groups

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    w = _DUP_SPAN_W

    def windows(b: pa.Table) -> pa.Table:
        vals, parent, _ = _split_words(b["text"])
        n = len(vals)
        if n < w:
            return pa.table(
                {"g": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
            )
        valid = parent[w - 1 :] == parent[: n - w + 1]
        shifted = [
            pa.array(vals[i : n - w + 1 + i], pa.string()) for i in range(w)
        ]
        g = pc.binary_join_element_wise(*shifted, "\x1f")
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)[parent[: n - w + 1]]
        return pa.table(
            {"g": g, "doc_id": pa.array(doc_ids, pa.int64())}
        ).filter(pa.array(valid))

    posts = docs.map_batches(windows, batch_format="pyarrow")

    def per_ngram(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("g", sort=False)["doc_id"].transform("size")
        g = g.assign(dup=(cnt > 1).astype(np.int64))
        out = g.groupby("doc_id", sort=False, as_index=False).agg(
            n_spans=("dup", "size"), n_dup=("dup", "sum")
        )
        return out

    partials = bucketed_map_groups(posts, ["g"], per_ngram)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        # integer outputs only: a rounded ratio k/n_spans can land exactly
        # on a 1e-6 half (n_spans = 128 windows -> k*7812.5) where numpy
        # and SQL rounding modes diverge
        return g.groupby("doc_id", sort=False, as_index=False).agg(
            n_spans=("n_spans", "sum"), n_dup=("n_dup", "sum")
        )

    return bucketed_map_groups(partials, ["doc_id"], per_doc)


def _dup_span_sql(w: int = _DUP_SPAN_W) -> str:
    leads = " || chr(31) || ".join(
        ["term"] + [f"lead(term, {k}) OVER win" for k in range(1, w)]
    )
    return rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\S+')) AS term,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS i
  FROM documents),
ng AS (
  SELECT doc_id, {leads} AS g
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
v AS (SELECT doc_id, g FROM ng WHERE g IS NOT NULL),
c AS (SELECT g, count(*) AS cnt FROM v GROUP BY g)
SELECT v.doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM v JOIN c ON c.g = v.g GROUP BY v.doc_id
"""


DUP_SPAN_FLAGS_SQL = _dup_span_sql()


def mad_by_type(sf_dir: str):
    """Robust per-group dispersion: median + median-absolute-deviation of
    event value per type — the outlier-resistant z-score basis. Two exact
    grouped discrete-quantile passes (``grouped_quantile_disc``: value-
    count partials + one vectorized per-bucket cumsum): pass 1 finds each
    type's median, which broadcasts (type-bounded); pass 2 runs the same
    machinery over |value - med|. Discrete quantiles SELECT an existing
    double, so both columns are bit-identical across engines with no
    rounding at all."""
    import ray

    from fhirflat_ray.functions.quantiles import grouped_quantile_disc
    from fhirflat_ray.functions.util import collect_small_table, worker_cached_stage

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    med_t = collect_small_table(
        grouped_quantile_disc(ds, "event_type", "value", [0.5])
    )
    types = med_t["event_type"].to_numpy(zero_copy_only=False).astype(str)
    meds = med_t["value"].to_numpy(zero_copy_only=False)
    order = np.argsort(types)
    ref = ray.put((types[order], meds[order]))

    class AbsDev:
        def __init__(self, ref):
            self.types, self.meds = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            t = b["event_type"].to_numpy(zero_copy_only=False).astype(str)
            m = self.meds[np.searchsorted(self.types, t)]
            ad = np.abs(b["value"].to_numpy(zero_copy_only=False) - m)
            return pa.table(
                {"event_type": b["event_type"], "ad": pa.array(ad, pa.float64())}
            )

    devs = ds.map_batches(worker_cached_stage(AbsDev, ref=ref), batch_format="pyarrow")
    mad_t = collect_small_table(
        grouped_quantile_disc(devs, "event_type", "ad", [0.5])
    )
    mad_map = dict(
        zip(
            mad_t["event_type"].to_numpy(zero_copy_only=False).astype(str),
            mad_t["value"].to_numpy(zero_copy_only=False),
        )
    )
    return pa.table(
        {
            "event_type": pa.array(types[order], pa.string()),
            "med": pa.array(meds[order], pa.float64()),
            "mad": pa.array([mad_map[t] for t in types[order]], pa.float64()),
        }
    )


MAD_BY_TYPE_SQL = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type)
SELECT e.event_type, m.med,
       quantile_disc(abs(e.value - m.med), 0.5) AS mad
FROM events e JOIN med m ON m.event_type = e.event_type
GROUP BY e.event_type, m.med
"""


#: sorted-neighborhood window (ranks apart) + verify threshold, shared
#: with the SQL oracle
_SNM_W = 3


def snm_pairs(sf_dir: str):
    """Sorted-neighborhood record linkage (Hernandez & Stolfo SIGMOD'95):
    documents globally sorted by the blocking key (n_chars, doc_id), every
    pair within ``_SNM_W`` ranks verified by prefix Levenshtein ≤ 8 — the
    windowed alternative to hash blocking that catches near-matches
    straddling block boundaries.

    Scale shape: the global rank comes from ``range_partition_sort`` (one
    all-to-all); the window pass re-buckets on rank//B with each bucket's
    first ``_SNM_W`` rows ghosted into the previous bucket, so every
    within-window pair materializes in exactly one bucket and the verify
    is the batch-wide Levenshtein DP."""
    from fhirflat_ray.functions.sort import range_partition_sort
    from fhirflat_ray.functions.util import bucketed_map_groups, default_num_buckets

    n_parts = _join_partitions(sf_dir, ["documents"])
    # the window DP is CPU-bound per bucket; derive the rank-block size from
    # the CLUSTER-width bucket count (not the byte-sized join count) so
    # there are enough distinct bkt keys to spread — any bsize >= w+1 is
    # correct, each within-window pair still lands in exactly one bucket
    nb = max(n_parts, default_num_buckets())
    w = _SNM_W

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": b["n_chars"],
                "prefix": pc.utf8_slice_codeunits(pc.fill_null(b["text"], ""), 0, 24),
            }
        )

    ranked = range_partition_sort(
        docs.map_batches(prep, batch_format="pyarrow"),
        "n_chars",
        ["doc_id"],
        n_ranges=n_parts,
    ).materialize()
    total = ranked.count()
    bsize = max(w + 1, -(-total // max(1, nb)))

    def ghost(b: pa.Table) -> pa.Table:
        pos = b["pos"].to_numpy(zero_copy_only=False)
        own = pos // bsize
        is_ghost = (pos % bsize < w) & (own > 0)
        dup = b.filter(pa.array(is_ghost))
        t = pa.table(
            {
                "bkt": pa.array(
                    np.concatenate([own, own[is_ghost] - 1]), pa.int64()
                ),
                "pos": pa.array(
                    np.concatenate([pos, pos[is_ghost]]), pa.int64()
                ),
                "doc_id": pa.concat_arrays(
                    [b["doc_id"].combine_chunks(), dup["doc_id"].combine_chunks()]
                ),
                "prefix": pa.concat_arrays(
                    [b["prefix"].combine_chunks(), dup["prefix"].combine_chunks()]
                ),
            }
        )
        return t

    ghosted = ranked.select_columns(["pos", "doc_id", "prefix"]).map_batches(
        ghost, batch_format="pyarrow"
    )

    def window_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from fhirflat_ray.functions.text import levenshtein_pairs_batch

        g = g.sort_values(["bkt", "pos"], kind="mergesort")
        pos = g["pos"].to_numpy()
        bkt = g["bkt"].to_numpy()
        li: list[np.ndarray] = []
        ri: list[np.ndarray] = []
        for j in range(1, w + 1):
            if j >= len(g):
                break
            i = np.arange(len(g) - j)
            # pair owned by the LEFT row's own bucket (ghosts only ever
            # appear as right-hand sides), ranks exactly j apart
            ok = (
                (bkt[i] == bkt[i + j])
                & (pos[i + j] - pos[i] == j)
                & (pos[i] // bsize == bkt[i])
            )
            li.append(i[ok])
            ri.append(i[ok] + j)
        if not li or not sum(len(a) for a in li):
            return pd.DataFrame(
                {
                    "l_doc": pd.Series([], dtype=np.int64),
                    "r_doc": pd.Series([], dtype=np.int64),
                    "lev": pd.Series([], dtype=np.int64),
                }
            )
        lidx = np.concatenate(li)
        ridx = np.concatenate(ri)
        pref = pa.array(g["prefix"].to_numpy(), pa.string())
        d = levenshtein_pairs_batch(pref.take(pa.array(lidx)), pref.take(pa.array(ridx)))
        keep = d <= 8
        ids = g["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "l_doc": ids[lidx[keep]],
                "r_doc": ids[ridx[keep]],
                "lev": d[keep],
            }
        )

    return bucketed_map_groups(ghosted, ["bkt"], window_pairs, num_buckets=nb)


SNM_PAIRS_SQL = f"""
WITH r AS (
  SELECT doc_id, text,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS pos
  FROM documents)
SELECT a.doc_id AS l_doc, b.doc_id AS r_doc,
       levenshtein(substr(a.text, 1, 24), substr(b.text, 1, 24)) AS lev
FROM r a JOIN r b ON b.pos > a.pos AND b.pos <= a.pos + {_SNM_W}
WHERE levenshtein(substr(a.text, 1, 24), substr(b.text, 1, 24)) <= 8
"""


#: product quantization geometry: 4 subspaces x 16 dims over the 64-dim
#: embeddings, 4 centroids per subspace (shared with the SQL oracle)
_PQ_SUBS, _PQ_SUBDIM, _PQ_K = 4, 16, 4


def _pq_fit_codebooks(ds):
    """Fit the 4 per-subspace k-means codebooks (shared by ``pq_encode``
    and ``knn_pq_adc`` — the SQL side shares ``_pq_sql`` the same way).
    Each fit is the map-only broadcast/fold Lloyd loop over one 16-dim
    slice."""
    from fhirflat_ray.functions.clustering import _matrix, kmeans_centroids

    cents = []
    for s in range(_PQ_SUBS):
        lo = s * _PQ_SUBDIM

        def slice_sub(b: pa.Table, lo=lo) -> pa.Table:
            mat = _matrix(b["embedding"])[:, lo : lo + _PQ_SUBDIM]
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1), pa.float64()), _PQ_SUBDIM
                    ),
                }
            )

        sub = ds.map_batches(slice_sub, batch_format="pyarrow")
        cents.append(kmeans_centroids(sub, k=_PQ_K, iters=3))
    return cents


def pq_encode(sf_dir: str):
    """Product-quantization codebook encode (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI'11): each embedding
    splits into 4 contiguous 16-dim subvectors, each subspace gets its own
    k-means codebook (k=4, the deterministic smallest-id init), and every
    vector reduces to 4 int codes — the memory-compressed representation
    an ANN index stores at 100 TB (64 float32 -> 4 bytes here).

    Scale shape: 4 independent ``kmeans_centroids`` fits (map-only
    broadcast/fold each) + ONE final encode pass with all 4 codebooks
    broadcast together. The oracle unrolls four parallel Lloyd CTE chains
    over ``embedding[lo:hi]`` slices and joins the four assignments."""
    import ray

    from fhirflat_ray.functions.clustering import _assign, _matrix
    from fhirflat_ray.functions.util import worker_cached_stage

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = _pq_fit_codebooks(ds)

    ref = ray.put(cents)

    class Encode:
        def __init__(self, ref):
            self.cents = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            mat = _matrix(b["embedding"])
            out = {"vec_id": b["vec_id"]}
            for s, cent in enumerate(self.cents):
                sub = mat[:, s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
                out[f"c{s}"] = pa.array(_assign(sub, cent), pa.int64())
            return pa.table(out)

    return ds.map_batches(worker_cached_stage(Encode, ref=ref), batch_format="pyarrow")


def _pq_sql() -> str:
    chains, joins = [], []
    for s in range(_PQ_SUBS):
        lo, hi = s * _PQ_SUBDIM + 1, (s + 1) * _PQ_SUBDIM
        p = f"s{s}_"

        def assign(prev: str, name: str) -> str:
            return f"""{p}{name} AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.cluster_id FROM {p}{prev} c
          ORDER BY list_distance(e.embedding, c.c), c.cluster_id LIMIT 1) AS cl
  FROM {p}sub e)"""

        def cent(prev: str, name: str) -> str:
            return f"""{p}{name}_d AS (
  SELECT cl, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
  FROM {p}{prev}),
{p}{name} AS (
  SELECT cl AS cluster_id, list(avg_v ORDER BY i) AS c FROM (
    SELECT cl, i, avg(v) AS avg_v FROM {p}{name}_d GROUP BY cl, i) GROUP BY cl)"""

        chains.append(
            f"""{p}sub AS (
  SELECT vec_id, (embedding)[{lo}:{hi}] AS embedding FROM embeddings),
{p}c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster_id,
         embedding AS c
  FROM (SELECT * FROM {p}sub ORDER BY vec_id LIMIT {_PQ_K})),
{assign('c0', 'a1')},
{cent('a1', 'c1')},
{assign('c1', 'a2')},
{cent('a2', 'c2')},
{assign('c2', 'a3')}"""
        )
        joins.append(f"JOIN s{s}_a3 ON s{s}_a3.vec_id = e.vec_id")
    chain = ",\n".join(chains)
    join = "\n".join(joins)
    cols = ", ".join(f"s{s}_a3.cl AS c{s}" for s in range(_PQ_SUBS))
    return f"""WITH {chain}
SELECT e.vec_id, {cols}
FROM embeddings e
{join}"""


PQ_ENCODE_SQL = _pq_sql()


def knn_pq_adc(sf_dir: str):
    """PQ asymmetric-distance (ADC) k-NN search: queries (vec_id 0 and 1)
    score every corpus vector by the sum of squared subspace distances to
    the CODEBOOK CENTROID its code names — the memory-bound search an ANN
    system runs over PQ codes (Jégou et al. TPAMI'11, ADC variant).

    Scale shape: codebooks fit map-only (``pq_encode``'s fits), then ONE
    scoring pass with (codebooks, query slices) broadcast — per batch the
    per-subspace distance table is (n_queries x K) tiny and scores gather
    by code index; global top-10 per query via ``streaming_topk``. The
    oracle reuses the four unrolled Lloyd chains and mirrors
    power(list_distance, 2) per subspace."""
    import ray

    from fhirflat_ray.functions.clustering import _assign, _matrix
    from fhirflat_ray.functions.util import collect_small_table, worker_cached_stage

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = _pq_fit_codebooks(ds)

    qt = collect_small_table(
        ds.filter(expr="vec_id == 0 or vec_id == 1").select_columns(
            ["vec_id", "embedding"]
        )
    ).sort_by("vec_id")
    qmat = _matrix(qt["embedding"])
    ref = ray.put((cents, qt["vec_id"].to_numpy(zero_copy_only=False), qmat))

    class Score:
        def __init__(self, ref):
            self.cents, self.qids, self.qmat = ray.get(ref)
            # (n_queries, K) squared-distance lookup table per subspace,
            # built ONCE per worker: sqrt-then-square mirrors the SQL
            # power(list_distance, 2) bit for bit
            self.tables = []
            for s, cent in enumerate(self.cents):
                qs = self.qmat[:, s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
                d = np.linalg.norm(qs[:, None, :] - cent[None, :, :], axis=2) ** 2
                self.tables.append(d)

        def __call__(self, b: pa.Table) -> pa.Table:
            mat = _matrix(b["embedding"])
            vid = b["vec_id"].to_numpy(zero_copy_only=False)
            n = len(vid)
            dist = np.zeros((len(self.qids), n), np.float64)
            for s, cent in enumerate(self.cents):
                code = _assign(mat[:, s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM], cent)
                dist += self.tables[s][:, code]
            out_q = np.repeat(self.qids, n)
            return pa.table(
                {
                    "q_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(np.tile(vid, len(self.qids)), pa.int64()),
                    "dist": pa.array(np.round(dist.reshape(-1), 6), pa.float64()),
                }
            )

    from fhirflat_ray.functions.util import topk_per_key

    scored = ds.map_batches(worker_cached_stage(Score, ref=ref), batch_format="pyarrow")
    return topk_per_key(scored, ["q_id"], 10, ["dist", "vec_id"])


def _knn_pq_sql() -> str:
    # reuse the four unrolled chains from PQ_ENCODE_SQL's builder
    chain = _pq_sql().split("\nSELECT")[0].removeprefix("WITH ")
    dparts = []
    for s in range(_PQ_SUBS):
        lo, hi = s * _PQ_SUBDIM + 1, (s + 1) * _PQ_SUBDIM
        dparts.append(
            f"power(list_distance((q.embedding)[{lo}:{hi}], s{s}_cc.c), 2)"
        )
        # join each subspace's final centroid table on the vector's code
    joins = "\n".join(
        f"JOIN s{s}_a3 ON s{s}_a3.vec_id = x.vec_id\n"
        f"JOIN s{s}_c2 s{s}_cc ON s{s}_cc.cluster_id = s{s}_a3.cl"
        for s in range(_PQ_SUBS)
    )
    dist = " + ".join(dparts)
    return f"""WITH {chain},
q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id IN (0, 1)),
sc AS (
  SELECT q.q_id, x.vec_id, round({dist}, 6) AS dist
  FROM embeddings x
{joins}
  CROSS JOIN q)
SELECT q_id, vec_id, dist FROM (
  SELECT q_id, vec_id, dist,
         row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rn
  FROM sc) WHERE rn <= 10 ORDER BY q_id, dist, vec_id"""


KNN_PQ_ADC_SQL = _knn_pq_sql()


def edge_common_neighbors(sf_dir: str):
    """Link-prediction features on the co-ordered-parts graph: the top-25
    edges by common-neighbor count (= per-edge triangle count) with both
    endpoint degrees — the integer basis of Jaccard/Adamic-Adar edge
    scores (the float ratio is left to the consumer: k/(du+dv-2-k) can
    land exactly on a 1e-6 rounding half where engines' rounding modes
    diverge). Triangle triples explode to their three canonical edges,
    fold per edge in one coarse-bucket exchange; degrees attach via
    ``attach_degrees`` (broadcast below the node budget, distributed
    hash joins above — no driver node state at scale)."""
    from fhirflat_ray.functions.graph import triangle_count
    from fhirflat_ray.functions.util import (
        bucketed_map_groups,
        default_num_buckets,
        streaming_topk,
    )

    n_parts = _join_partitions(sf_dir, ["lineitem"])
    edges = _coorder_edges(sf_dir, n_parts).materialize()
    tri = triangle_count(edges, num_partitions=n_parts, return_triangles=True)

    def explode(b: pa.Table) -> pa.Table:
        n1 = b["n1"].to_numpy(zero_copy_only=False)
        n2 = b["n2"].to_numpy(zero_copy_only=False)
        n3 = b["n3"].to_numpy(zero_copy_only=False)
        us = np.concatenate([np.minimum(n1, n2), np.minimum(n1, n3), np.minimum(n2, n3)])
        vs = np.concatenate([np.maximum(n1, n2), np.maximum(n1, n3), np.maximum(n2, n3)])
        t = pa.table({"u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64())})
        g = t.group_by(["u", "v"]).aggregate([([], "count_all")])
        from fhirflat_ray.functions.util import agg_select

        return agg_select(g, {"u": "u", "v": "v", "count_all": "cn"})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["u", "v"], sort=False, as_index=False).agg(cn=("cn", "sum"))

    per_edge = bucketed_map_groups(
        tri.map_batches(explode, batch_format="pyarrow"), ["u", "v"], fold,
        num_buckets=max(n_parts, default_num_buckets()),
    )

    from fhirflat_ray.functions.graph import attach_degrees

    scored = attach_degrees(
        per_edge, edges, [("u", "deg_u"), ("v", "deg_v")], num_partitions=n_parts,
    )
    return streaming_topk(
        scored, ["cn", "u", "v"], 25, descending=[True, False, False]
    )


EDGE_COMMON_NEIGHBORS_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
t AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
te AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cn FROM (
    SELECT least(x, y) AS u, greatest(x, y) AS v FROM t
    UNION ALL SELECT least(x, z), greatest(x, z) FROM t
    UNION ALL SELECT least(y, z), greatest(y, z) FROM t)
  GROUP BY u, v),
d AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node)
SELECT te.u, te.v, te.cn, du.deg AS deg_u, dv.deg AS deg_v
FROM te JOIN d du ON du.node = te.u JOIN d dv ON dv.node = te.v
ORDER BY te.cn DESC, te.u, te.v LIMIT 25
"""


#: co-occurrence window (token positions apart) + minimum pair support
_COOC_W, _COOC_MIN = 3, 5


def term_cooc_pmi(sf_dir: str):
    """Windowed term co-occurrence PMI — the SGNS/word-embedding prep
    statistic: top-20 term pairs (within 3 positions, support ≥ 5) by
    pointwise mutual information. Pairs build map-only from shifted
    slices of the flat token stream (the ``dup_span_flags`` trick) with
    per-batch pre-aggregation; unigram counts fold vocab-bounded and
    broadcast; ONE narrow (ta, tb, cnt) exchange; ln rides at 6dp with
    the division order mirrored token-for-token in SQL."""
    import ray

    from fhirflat_ray.functions.text import _split_words
    from fhirflat_ray.functions.util import (
        bucketed_map_groups,
        collect_small_table,
        streaming_topk,
        worker_cached_stage,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    w = _COOC_W

    def pairs(b: pa.Table) -> pa.Table:
        vals, parent, _ = _split_words(b["text"])
        n = len(vals)
        las, lbs = [], []
        for k in range(1, w + 1):
            if n <= k:
                break
            ok = parent[k:] == parent[:-k]
            a, bb = vals[:-k][ok], vals[k:][ok]
            lo = np.where(a <= bb, a, bb)
            hi = np.where(a <= bb, bb, a)
            las.append(lo)
            lbs.append(hi)
        if not las:
            return pa.table(
                {
                    "ta": pa.array([], pa.string()),
                    "tb": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame({"ta": np.concatenate(las), "tb": np.concatenate(lbs)})
            .groupby(["ta", "tb"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "ta": pa.array(g["ta"], pa.string()),
                "tb": pa.array(g["tb"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
            }
        )

    pair_partials = docs.map_batches(pairs, batch_format="pyarrow").materialize()

    def unigrams(b: pa.Table) -> pa.Table:
        vals, _, _ = _split_words(b["text"])
        un, cnt = np.unique(vals, return_counts=True)
        return pa.table(
            {"term": pa.array(un, pa.string()), "n": pa.array(cnt, pa.int64())}
        )

    ug = collect_small_table(docs.map_batches(unigrams, batch_format="pyarrow"))
    terms, inv = np.unique(ug["term"].to_numpy(zero_copy_only=False), return_inverse=True)
    ucnt = np.zeros(len(terms), np.int64)
    np.add.at(ucnt, inv, ug["n"].to_numpy(zero_copy_only=False))
    n_tokens = int(ucnt.sum())
    n_pairs = int(
        collect_small_table(pair_partials.select_columns(["cnt"]))["cnt"]
        .to_numpy(zero_copy_only=False)
        .sum()
    )
    ref = ray.put((terms, ucnt, n_pairs, n_tokens))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["ta", "tb"], sort=False, as_index=False).agg(
            nab=("cnt", "sum")
        )

    merged = bucketed_map_groups(pair_partials, ["ta", "tb"], combine)

    class Pmi:
        def __init__(self, ref):
            self.terms, self.ucnt, self.np_, self.nt = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ta = b["ta"].to_numpy(zero_copy_only=False)
            tb = b["tb"].to_numpy(zero_copy_only=False)
            nab = b["nab"].to_numpy(zero_copy_only=False).astype(np.float64)
            keep = nab >= _COOC_MIN
            ta, tb, nab = ta[keep], tb[keep], nab[keep]
            na = self.ucnt[np.searchsorted(self.terms, ta)].astype(np.float64)
            nb = self.ucnt[np.searchsorted(self.terms, tb)].astype(np.float64)
            pmi = np.log(
                (nab * 1.0 / self.np_) / ((na * 1.0 / self.nt) * (nb * 1.0 / self.nt))
            )
            return pa.table(
                {
                    "ta": pa.array(ta, pa.string()),
                    "tb": pa.array(tb, pa.string()),
                    "nab": pa.array(nab.astype(np.int64)),
                    "pmi": pa.array(np.round(pmi, 6), pa.float64()),
                }
            )

    scored = merged.map_batches(worker_cached_stage(Pmi, ref=ref), batch_format="pyarrow")
    return streaming_topk(
        scored, ["pmi", "ta", "tb"], 20, descending=[True, False, False]
    )


TERM_COOC_PMI_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\S+')) AS term,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS i
  FROM documents),
pr AS (
  SELECT least(a.term, b.term) AS ta, greatest(a.term, b.term) AS tb
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + {_COOC_W}),
pcnt AS (SELECT ta, tb, count(*) AS nab FROM pr GROUP BY ta, tb),
ug AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
tot AS (SELECT (SELECT count(*) FROM pr) AS np, (SELECT count(*) FROM tok) AS nt)
SELECT ta, tb, CAST(nab AS BIGINT) AS nab,
       round(ln((nab * 1.0 / tot.np) /
                ((ua.n * 1.0 / tot.nt) * (ub.n * 1.0 / tot.nt))), 6) AS pmi
FROM pcnt JOIN ug ua ON ua.term = pcnt.ta JOIN ug ub ON ub.term = pcnt.tb, tot
WHERE nab >= {_COOC_MIN}
ORDER BY pmi DESC, ta, tb LIMIT 20
"""


def source_entropy(sf_dir: str):
    """Per-source token-distribution Shannon entropy (plus token count) —
    the corpus-diversity metric a data-mixture designer reads. One narrow
    (source, term, cnt) partial per batch, one coarse-bucket shuffle on
    source, per-bucket vectorized entropy; ln rides at 6dp (the KL-drift
    precision discipline: float combine-order noise sits ~1e-13, far
    below the rounding)."""
    from fhirflat_ray.functions.text import _split_words
    from fhirflat_ray.functions.util import bucketed_map_groups

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        vals, parent, _ = _split_words(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)[parent]
        g = (
            pd.DataFrame({"source": src, "term": vals})
            .groupby(["source", "term"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "term": pa.array(g["term"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
            }
        )

    posts = docs.map_batches(partial, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["source", "term"], sort=False, as_index=False)["cnt"].sum()
        # deterministic p*ln(p) fold order (term-sorted) — noise stays
        # ~1e-13 either way, but determinism keeps re-runs hash-stable
        c = c.sort_values(["source", "term"], kind="mergesort")
        n = c.groupby("source", sort=False)["cnt"].transform("sum").to_numpy(np.float64)
        p = c["cnt"].to_numpy(np.float64) / n
        c = c.assign(h=p * np.log(p), n=n)
        out = c.groupby("source", sort=False, as_index=False).agg(
            n_tokens=("cnt", "sum"), h=("h", "sum")
        )
        out["entropy"] = np.round(-out["h"].to_numpy(np.float64), 6)
        return out[["source", "n_tokens", "entropy"]]

    return bucketed_map_groups(posts, ["source"], per_bucket)


SOURCE_ENTROPY_SQL = r"""
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
c AS (SELECT source, term, count(*) AS cnt FROM tok GROUP BY source, term),
n AS (SELECT source, sum(cnt) AS n FROM c GROUP BY source)
SELECT c.source, CAST(n.n AS BIGINT) AS n_tokens,
       round(-sum((cnt * 1.0 / n.n) * ln(cnt * 1.0 / n.n)), 6) AS entropy
FROM c JOIN n ON n.source = c.source GROUP BY c.source, n.n
"""


#: node-id offset separating part nodes from supplier nodes in the
#: lineitem co-occurrence graph (shared with the SQL oracle)
PAGERANK_SUPP_OFFSET = 10_000_000


def pagerank_partsupp(sf_dir: str):
    """Distributed PageRank (3 iterations, d=0.85) over the bipartite
    part↔supplier co-occurrence graph mined from lineitem.

    Scale shape: distinct edge extraction is one narrow shuffle of two
    int64 columns; each iteration is one distributed hash join + one
    bucketed combine (``functions/graph.py``) — the rank vector never
    leaves the cluster. Returns the FULL ranking (node, pr) so the
    oracle comparison has no top-k tie boundary."""
    from fhirflat_ray.functions.graph import pagerank
    from fhirflat_ray.functions.util import distinct_rows

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def to_edge(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": b["l_partkey"],
                "v": pc.add(
                    b["l_suppkey"], pa.scalar(PAGERANK_SUPP_OFFSET, pa.int64())
                ),
            }
        )

    edges = distinct_rows(li.map_batches(to_edge, batch_format="pyarrow"), ["u", "v"])
    n_parts = _join_partitions(sf_dir, ["lineitem"])
    return pagerank(edges, iters=3, damping=0.85, num_partitions=n_parts)


def _pagerank_sql() -> str:
    d, off = 0.85, PAGERANK_SUPP_OFFSET

    def iter_cte(prev: str, name: str) -> str:
        return f"""{name} AS (
  SELECT b.v AS node,
         (1 - {d}) / (SELECT cnt FROM n) + {d} * sum(p.pr / dg.deg) AS pr
  FROM bi b JOIN {prev} p ON p.node = b.u JOIN deg dg ON dg.node = b.u
  GROUP BY b.v)"""

    return f"""WITH edges AS (
  SELECT DISTINCT l_partkey AS u, {off} + l_suppkey AS v FROM lineitem),
bi AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
deg AS (SELECT u AS node, CAST(count(*) AS DOUBLE) AS deg FROM bi GROUP BY u),
n AS (SELECT count(DISTINCT u) AS cnt FROM bi),
r0 AS (SELECT u AS node, 1.0 / (SELECT cnt FROM n) AS pr
       FROM (SELECT DISTINCT u FROM bi)),
{iter_cte('r0', 'r1')},
{iter_cte('r1', 'r2')},
{iter_cte('r2', 'r3')}
SELECT node, round(pr, 9) AS pr FROM r3"""


PAGERANK_PARTSUPP_SQL = _pagerank_sql()


# =====================================================================
# Wave 9: scale-join breadth (bloom semi join, two-large-sides range
# join), CUBE grouping sets, fuzzy-match scoring
# =====================================================================


def bloom_semi_orders(sf_dir: str):
    """Bloom-prefiltered semi join: revenue of line items whose order is
    URGENT-priority, grouped by return flag. The urgent-order key set
    folds to a constant-size Bloom bitmap (broadcast once); the lineitem
    pass is map-only with definite non-members dropped before the exact
    verification join ever sees them — the semi-join shape that avoids
    shuffling the corpus at 100 TB (``functions/joins.py:bloom_semi_join``)."""
    from fhirflat_ray.functions.joins import bloom_semi_join
    from fhirflat_ray.functions.util import agg_select

    n_parts = _join_partitions(sf_dir, ["orders", "lineitem"])
    keys = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice"])
    semi = bloom_semi_join(
        li,
        keys,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=n_parts,
        keys_distinct=True,  # o_orderkey is the orders primary key
    )

    def partial(b: pa.Table) -> pa.Table:
        # per-ROW integer cents before any summation: prices are 2-decimal,
        # so rint(x*100) is error-free per row and the int64 sum is exact
        # under ANY combine order — float sums over 10^5+ rows at 1e10
        # magnitude can drift past the canonicalizer's rounding across
        # engines (the customer_order_counts lesson, aggregate-sized)
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)), 0),
            pa.int64(),
        )
        t = pa.table({"l_returnflag": b["l_returnflag"], "cents": cents})
        g = t.group_by(["l_returnflag"]).aggregate([("cents", "sum"), ([], "count_all")])
        return agg_select(
            g,
            {
                "l_returnflag": "l_returnflag",
                "cents_sum": "rev_cents",
                "count_all": "n",
            },
        )

    from ray.data.aggregate import Sum

    return (
        semi.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"), Sum("n", alias_name="n"))
    )


BLOOM_SEMI_ORDERS_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
       count(*) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


#: revenue in exact integer cent-basis-points: price has 2 decimals and
#: discount has 2, so round(price*100) and round(discount*100) are each
#: error-free per row and cents_bp = price_cents * (100 - disc_bp) is an
#: exact int64 under ANY combine order — no float sum ever exists
def _revenue_cents_bp(b: pa.Table) -> pa.ChunkedArray:
    cents = pc.cast(
        pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)), 0), pa.int64()
    )
    bp = pc.cast(
        pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0)), 0), pa.int64()
    )
    return pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), bp))


_REV_BP_SQL = (
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
)


def promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: promotion revenue share for one ship month — a
    conditional aggregate over a distributed part⋈lineitem join. Revenue is
    exact integer cent-basis-points per row (see ``_revenue_cents_bp``);
    the final ratio is ONE mirrored float division over two exact ints."""
    import datetime as dt

    from fhirflat_ray.functions.util import agg_select

    n_parts = _join_partitions(sf_dir, ["lineitem", "part"])
    lo = pa.scalar(dt.datetime(1997, 9, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1997, 10, 1), pa.timestamp("us"))

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def li_prep(b: pa.Table) -> pa.Table:
        keep = b.filter(
            pc.and_(pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi))
        )
        return pa.table(
            {"l_partkey": keep["l_partkey"], "rev_bp": _revenue_cents_bp(keep)}
        )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def part_prep(b: pa.Table) -> pa.Table:
        promo = pc.cast(pc.starts_with(b["p_type"], "PROMO"), pa.int64())
        return pa.table({"p_partkey": b["p_partkey"], "promo": promo})

    j = li.map_batches(li_prep, batch_format="pyarrow").join(
        part.map_batches(part_prep, batch_format="pyarrow"),
        "inner",
        n_parts,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = b["rev_bp"]
        promo = pc.multiply(rev, b["promo"])
        return pa.table(
            {
                "promo_bp": pa.array([pc.sum(promo).as_py() or 0], pa.int64()),
                "total_bp": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            }
        )

    from fhirflat_ray.functions.util import collect_small_table

    t = collect_small_table(j.map_batches(partial, batch_format="pyarrow"))
    p = int(pc.sum(t["promo_bp"]).as_py() or 0)
    tot = int(pc.sum(t["total_bp"]).as_py() or 0)
    # empty window -> SQL yields NULL ratio; mirror with None, not a crash
    ratio = 100.0 * float(p) / float(tot) if tot else None
    return pd.DataFrame(
        [(p, tot, ratio)], columns=["promo_bp", "total_bp", "promo_ratio"]
    )


PROMO_REVENUE_SQL = f"""
SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_BP_SQL} ELSE 0 END) AS BIGINT)
         AS promo_bp,
       CAST(sum({_REV_BP_SQL}) AS BIGINT) AS total_bp,
       100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_BP_SQL} ELSE 0 END) AS DOUBLE)
         / CAST(sum({_REV_BP_SQL}) AS DOUBLE) AS promo_ratio
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


def disjunctive_pred_revenue(sf_dir: str):
    """TPC-H Q19 shape: an OR-of-ANDs predicate spanning BOTH join sides
    (brand x size-range x quantity-range branches) — the predicate cannot
    push below the join, so it runs as one vectorized mask post-join;
    per-branch revenue + row count come back exact (integer
    cent-basis-points)."""
    from fhirflat_ray.functions.util import agg_select

    n_parts = _join_partitions(sf_dir, ["lineitem", "part"])
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "l_quantity": b["l_quantity"],
                "rev_bp": _revenue_cents_bp(b),
            }
        )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    j = li.map_batches(li_prep, batch_format="pyarrow").join(
        part, "inner", n_parts, on=("l_partkey",), right_on=("p_partkey",)
    )

    _BRANCHES = [
        ("Brand#12", 1, 15, 1, 11),
        ("Brand#2", 1, 25, 10, 20),
        ("Brand#20", 1, 35, 20, 30),
    ]

    def partial(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"]
        size = b["p_size"]
        brand = b["p_brand"]
        mask = None
        for br, s_lo, s_hi, q_lo, q_hi in _BRANCHES:
            m = pc.and_(
                pc.and_(
                    pc.equal(brand, br),
                    pc.and_(
                        pc.greater_equal(size, s_lo), pc.less_equal(size, s_hi)
                    ),
                ),
                pc.and_(
                    pc.greater_equal(qty, float(q_lo)),
                    pc.less_equal(qty, float(q_hi)),
                ),
            )
            mask = m if mask is None else pc.or_(mask, m)
        keep = b.filter(mask)
        return pa.table(
            {
                "rev_bp": pa.array(
                    [pc.sum(keep["rev_bp"]).as_py() or 0], pa.int64()
                ),
                "n": pa.array([keep.num_rows], pa.int64()),
            }
        )

    from fhirflat_ray.functions.util import collect_small_table

    t = collect_small_table(j.map_batches(partial, batch_format="pyarrow"))
    return pd.DataFrame(
        [
            (
                int(pc.sum(t["rev_bp"]).as_py() or 0),
                int(pc.sum(t["n"]).as_py() or 0),
            )
        ],
        columns=["rev_bp", "n"],
    )


DISJUNCTIVE_PRED_REVENUE_SQL = f"""
SELECT CAST(sum({_REV_BP_SQL}) AS BIGINT) AS rev_bp, count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def priority_class_counts(sf_dir: str):
    """TPC-H Q12 shape: per return flag, how many late-shipped line items
    belong to HIGH-priority vs LOW-priority orders — a join followed by
    CASE-bucketed conditional counts (the CASE evaluates as one vectorized
    membership test, partial-combined before the final groupby)."""
    import datetime as dt

    from fhirflat_ray.functions.util import agg_select

    n_parts = _join_partitions(sf_dir, ["lineitem", "orders"])
    cutoff = pa.scalar(dt.datetime(1999, 1, 1), pa.timestamp("us"))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    li = li.map_batches(
        lambda b: b.filter(pc.greater(b["l_shipdate"], cutoff)).select(
            ["l_orderkey", "l_returnflag"]
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    j = li.join(orders, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        hi = pc.cast(
            pc.is_in(
                b["o_orderpriority"],
                value_set=pa.array(["1-URGENT", "2-HIGH"], pa.string()),
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "high_n": hi,
                "low_n": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )
        g = t.group_by(["l_returnflag"]).aggregate([("high_n", "sum"), ("low_n", "sum")])
        return agg_select(
            g,
            {
                "l_returnflag": "l_returnflag",
                "high_n_sum": "high_n",
                "low_n_sum": "low_n",
            },
        )

    from ray.data.aggregate import Sum

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("high_n", alias_name="high_n"), Sum("low_n", alias_name="low_n"))
    )


PRIORITY_CLASS_COUNTS_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_n,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY l_returnflag
"""


def idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape: customers with above-average balance and no
    URGENT-priority order, counted per nation. The scalar subquery
    (average positive balance) folds to two exact ints and the threshold
    compare runs as ``bal_cents * n > sum_cents`` — integer math, no float
    average ever materializes; the no-urgent-order test is the distributed
    anti join."""
    from fhirflat_ray.functions.joins import hash_anti_join
    from fhirflat_ray.functions.util import agg_select, collect_small_table

    n_parts = _join_partitions(sf_dir, ["customer", "orders"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["c_acctbal"], pa.scalar(100.0)), 0), pa.int64()
        )
        pos = pc.greater(cents, pa.scalar(0, pa.int64()))
        kept = pc.if_else(pos, cents, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "s": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
                "n": pa.array([pc.sum(pc.cast(pos, pa.int64())).as_py() or 0], pa.int64()),
            }
        )

    t = collect_small_table(cust.map_batches(bal_partial, batch_format="pyarrow"))
    s = int(pc.sum(t["s"]).as_py() or 0)
    n = int(pc.sum(t["n"]).as_py() or 0)

    def rich(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["c_acctbal"], pa.scalar(100.0)), 0), pa.int64()
        )
        keep = pc.greater(
            pc.multiply(cents, pa.scalar(n, pa.int64())), pa.scalar(s, pa.int64())
        )
        out = b.append_column("bal_cents", cents)
        return out.filter(keep).select(["c_custkey", "c_nationkey", "bal_cents"])

    candidates = cust.map_batches(rich, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    idle = hash_anti_join(
        candidates, orders, on="c_custkey", right_on="o_custkey", num_partitions=n_parts
    )

    def partial(b: pa.Table) -> pa.Table:
        g = (
            b.select(["c_nationkey", "bal_cents"])
            .group_by(["c_nationkey"])
            .aggregate([([], "count_all"), ("bal_cents", "sum")])
        )
        return agg_select(
            g,
            {
                "c_nationkey": "c_nationkey",
                "count_all": "n_cust",
                "bal_cents_sum": "bal_cents",
            },
        )

    from ray.data.aggregate import Sum

    return (
        idle.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("n_cust", alias_name="n_cust"), Sum("bal_cents", alias_name="bal_cents"))
    )


IDLE_RICH_CUSTOMERS_SQL = """
WITH avg_bal AS (
  SELECT CAST(sum(CASE WHEN round(c_acctbal * 100, 0) > 0
                       THEN CAST(round(c_acctbal * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS s,
         CAST(sum(CASE WHEN round(c_acctbal * 100, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
  FROM customer
)
SELECT c_nationkey, count(*) AS n_cust,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer, avg_bal
WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def range_join_bucketed(sf_dir: str):
    """Same interval-overlap aggregate as ``range_join_agg`` but through
    the TWO-LARGE-SIDES path: both events and intervals co-partition on a
    time bucket (one narrow shuffle each; each interval replicates only to
    the ~3 buckets its span covers) and match per bucket with a chunked
    vectorized mask — no broadcast, no interval cap
    (``functions/joins.py:bucketed_range_join``). Same SQL oracle as the
    broadcast path, so the two implementations also check each other."""
    from fhirflat_ray.functions.joins import bucketed_range_join
    from fhirflat_ray.functions.util import agg_select
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    mm = ds.aggregate(Min("ts"), Max("ts"))
    tmin = int(pd.Timestamp(mm["min(ts)"]).value // 1000)
    tmax = int(pd.Timestamp(mm["max(ts)"]).value // 1000)
    width = (tmax - tmin) // 25
    starts = np.array([tmin + i * width for i in range(25)], dtype=np.int64)
    import ray.data as rd

    iv = rd.from_arrow(
        pa.table(
            {
                "interval_id": pa.array(np.arange(25, dtype=np.int64)),
                "start_us": pa.array(starts),
                "end_us": pa.array(starts + (3 * width) // 2),
            }
        )
    )
    joined = bucketed_range_join(ds, iv, "ts", bucket_width_us=max(1, width // 2))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["interval_id", "value"]).group_by(["interval_id"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )
        return agg_select(
            g,
            {
                "interval_id": "interval_id",
                "value_sum": "sum_value",
                "count_all": "n_events",
            },
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("interval_id")
        .aggregate(
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_events", alias_name="n_events"),
        )
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.column_names.index("sum_value"),
            "sum_value",
            pc.round(b["sum_value"], ndigits=2),
        ),
        batch_format="pyarrow",
    )


def revenue_cube(sf_dir: str):
    """CUBE grouping sets: revenue at (flag, status), per-flag, per-status
    and grand-total levels. Like ``revenue_rollup``, the corpus is scanned
    ONCE (distributed partial+final aggregate, 6 base groups); all four
    cube levels derive from that tiny result on the driver — grouping-set
    breadth costs zero extra shuffles."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import agg_select, collect_small_table

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        g = (
            pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "l_linestatus": b["l_linestatus"],
                    "rev": rev,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("rev", "sum")])
        )
        return agg_select(
            g,
            {
                "l_returnflag": "l_returnflag",
                "l_linestatus": "l_linestatus",
                "rev_sum": "rev",
            },
        )

    base = collect_small_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("rev", alias_name="rev"))
    ).to_pandas()

    by_flag = (
        base.groupby("l_returnflag", as_index=False)["rev"].sum().assign(l_linestatus=None)
    )
    by_status = (
        base.groupby("l_linestatus", as_index=False)["rev"].sum().assign(l_returnflag=None)
    )
    total = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None], "rev": [base["rev"].sum()]}
    )
    out = pd.concat([base, by_flag, by_status, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "rev"]
    ]
    out["rev"] = out["rev"].round(2)
    return out


REVENUE_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

#: fixed fuzzy-match probe shared with the SQL oracle
EDIT_PROBE = "the table scan fast row"


def edit_distance_probe(sf_dir: str):
    """Fuzzy-match scoring: Levenshtein distance of every document's
    32-char prefix against a fixed probe phrase — map-only, the DP fully
    vectorized across the batch (``functions/text.py:
    levenshtein_probe_batch``); the near-miss screen used alongside exact
    blocklists."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        from fhirflat_ray.functions.text import levenshtein_probe_batch

        d = levenshtein_probe_batch(b["text"], EDIT_PROBE, prefix_chars=32)
        return pa.table({"doc_id": b["doc_id"], "lev": pa.array(d, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


EDIT_DISTANCE_PROBE_SQL = f"""
SELECT doc_id, levenshtein(substr(text, 1, 32), '{EDIT_PROBE}') AS lev
FROM documents
"""


# =====================================================================
# Wave 10: blocked fuzzy join, time-series gap fill, SCD2 intervals,
# histogram-based approximate percentiles
# =====================================================================


def fuzzy_block_join(sf_dir: str):
    """Blocked fuzzy self-join (record linkage): document pairs in the
    same (lang, length-bucket) block whose 24-char prefixes are within
    Levenshtein distance 8.

    Scale shape: blocking bounds the candidate set to within-block pairs
    (the standard record-linkage trick); ONE narrow shuffle of
    (block key, doc_id, prefix) co-locates each block, and the verify is
    the batch-wide pairwise DP (``levenshtein_pairs_batch``) across ALL
    pairs of the bucket at once — no Python loop over pairs. Oversized
    blocks raise instead of silently going quadratic."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b["lang"],
                "cb": pc.divide(b["n_chars"], pa.scalar(16, pa.int64())),
                "doc_id": b["doc_id"],
                "prefix": pc.utf8_slice_codeunits(pc.fill_null(b["text"], ""), 0, 24),
            }
        )

    MAX_BLOCK = 4096

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from fhirflat_ray.functions.text import levenshtein_pairs_batch

        g = g.sort_values(["lang", "cb", "doc_id"], kind="mergesort")
        key = g["lang"].astype(str) + "\x00" + g["cb"].astype(str)
        _, first, counts = np.unique(key.to_numpy(), return_index=True, return_counts=True)
        if counts.max(initial=0) > MAX_BLOCK:
            raise ValueError(
                f"fuzzy_block_join: block of {counts.max()} docs exceeds "
                f"{MAX_BLOCK}; narrow the blocking key"
            )
        li: list[np.ndarray] = []
        ri: list[np.ndarray] = []
        for f, c in zip(first, counts):
            if c >= 2:
                a, b_ = np.triu_indices(int(c), k=1)
                li.append(a + f)
                ri.append(b_ + f)
        if not li:
            return pd.DataFrame(
                {
                    "l_doc": pd.Series([], dtype=np.int64),
                    "r_doc": pd.Series([], dtype=np.int64),
                    "lev": pd.Series([], dtype=np.int64),
                }
            )
        lidx = np.concatenate(li)
        ridx = np.concatenate(ri)
        ids = g["doc_id"].to_numpy()
        pref = pa.array(g["prefix"].to_numpy(), pa.string())
        d = levenshtein_pairs_batch(pref.take(pa.array(lidx)), pref.take(pa.array(ridx)))
        keep = d <= 8
        return pd.DataFrame(
            {
                "l_doc": ids[lidx[keep]],
                "r_doc": ids[ridx[keep]],
                "lev": d[keep],
            }
        )

    return bucketed_map_groups(
        ds.map_batches(prep, batch_format="pyarrow"), ["lang", "cb"], per_bucket
    )


FUZZY_BLOCK_JOIN_SQL = """
SELECT a.doc_id AS l_doc, b.doc_id AS r_doc,
       levenshtein(substr(a.text, 1, 24), substr(b.text, 1, 24)) AS lev
FROM documents a JOIN documents b
  ON a.lang = b.lang AND a.n_chars // 16 = b.n_chars // 16 AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, 24), substr(b.text, 1, 24)) <= 8
"""

def fuzzy_best_match(sf_dir: str):
    """Record-linkage best match: for every document with at least one
    blocked fuzzy candidate (``fuzzy_block_join``), the single closest
    other document under (levenshtein, match id). The pair set is
    duplicate-proportional, so the mirror + per-doc argmin adds one narrow
    shuffle over pairs — never the corpus."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    pairs = fuzzy_block_join(sf_dir)

    def mirror(b: pa.Table) -> pa.Table:
        l = b["l_doc"].to_numpy(zero_copy_only=False)
        r = b["r_doc"].to_numpy(zero_copy_only=False)
        d = b["lev"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([l, r]), pa.int64()),
                "match_id": pa.array(np.concatenate([r, l]), pa.int64()),
                "lev": pa.array(np.concatenate([d, d]), pa.int64()),
            }
        )

    m = pairs.map_batches(mirror, batch_format="pyarrow")

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "lev", "match_id"], kind="mergesort")
        return g.groupby("doc_id", sort=False).head(1)

    return bucketed_map_groups(m, ["doc_id"], best)


FUZZY_BEST_MATCH_SQL = """
WITH p AS (
  SELECT a.doc_id AS l_doc, b.doc_id AS r_doc,
         levenshtein(substr(a.text, 1, 24), substr(b.text, 1, 24)) AS lev
  FROM documents a JOIN documents b
    ON a.lang = b.lang AND a.n_chars // 16 = b.n_chars // 16 AND a.doc_id < b.doc_id
  WHERE levenshtein(substr(a.text, 1, 24), substr(b.text, 1, 24)) <= 8
),
m AS (
  SELECT l_doc AS doc_id, r_doc AS match_id, lev FROM p
  UNION ALL SELECT r_doc, l_doc, lev FROM p
)
SELECT doc_id, match_id, lev FROM (
  SELECT doc_id, match_id, lev,
         row_number() OVER (PARTITION BY doc_id ORDER BY lev, match_id) AS rn
  FROM m) WHERE rn = 1
"""


def source_cap(sf_dir: str):
    """Per-source document cap — the web-pipeline staple that stops one
    domain from dominating the corpus: keep each source's top 10 documents
    by (n_chars DESC, doc_id). One coarse-bucket shuffle on source; the
    per-bucket head() is vectorized across all sources in the bucket."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return g.groupby("source", sort=False).head(10)

    return bucketed_map_groups(ds, ["source"], cap)


SOURCE_CAP_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 10
"""


#: fixed 3-term query + Okapi parameters shared with the SQL oracle
BM25_QUERY_TERMS = ("window", "merge", "hash")
_BM25_K1, _BM25_B = 1.2, 0.75


def bm25_search(sf_dir: str):
    """BM25 ranked retrieval (Okapi, Lucene idf smoothing) for a fixed
    3-term query: top-10 documents by score.

    Scale shape: NO postings shuffle — because the query term set is
    bounded, one map pass reduces each document to a narrow row
    (doc_id, len, tf per query term); corpus statistics (N, avgdl, per-term
    df) fold from per-batch partials on the driver; scoring is a second
    map-only pass with the (idf, avgdl) broadcast; the top-10 comes from
    ``streaming_topk``. Zero exchanges end to end."""
    import ray

    from fhirflat_ray.functions.text import _split_words
    from fhirflat_ray.functions.util import (
        collect_small_table,
        streaming_topk,
        worker_cached_stage,
    )

    terms = BM25_QUERY_TERMS
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def narrow(b: pa.Table) -> pa.Table:
        vals, parent, n = _split_words(b["text"])
        cols = {
            "doc_id": b["doc_id"],
            "len": pa.array(np.bincount(parent, minlength=n).astype(np.int64)),
        }
        for i, t in enumerate(terms):
            m = vals == t
            cols[f"tf{i}"] = pa.array(
                np.bincount(parent[m], minlength=n).astype(np.int64)
            )
        return pa.table(cols)

    nr = docs.map_batches(narrow, batch_format="pyarrow").materialize()

    def stat_partial(b: pa.Table) -> pa.Table:
        out = {
            "n": pa.array([b.num_rows], pa.int64()),
            "lensum": pa.array(
                [int(b["len"].to_numpy(zero_copy_only=False).sum())], pa.int64()
            ),
        }
        for i in range(len(terms)):
            out[f"df{i}"] = pa.array(
                [int((b[f"tf{i}"].to_numpy(zero_copy_only=False) > 0).sum())],
                pa.int64(),
            )
        return pa.table(out)

    st = collect_small_table(nr.map_batches(stat_partial, batch_format="pyarrow"))
    n_docs = int(st["n"].to_numpy(zero_copy_only=False).sum())
    avgdl = float(st["lensum"].to_numpy(zero_copy_only=False).sum()) / n_docs
    df = np.array(
        [int(st[f"df{i}"].to_numpy(zero_copy_only=False).sum()) for i in range(len(terms))],
        np.float64,
    )
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((idf, avgdl))

    class Score:
        def __init__(self, ref):
            self.idf, self.avgdl = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ln = b["len"].to_numpy(zero_copy_only=False).astype(np.float64)
            norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * ln / self.avgdl)
            score = np.zeros(b.num_rows, np.float64)
            for i in range(len(self.idf)):
                tf = b[f"tf{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
                score += self.idf[i] * tf * (_BM25_K1 + 1.0) / (tf + norm)
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "score": pa.array(np.round(score, 6), pa.float64()),
                }
            )

    scored = nr.map_batches(worker_cached_stage(Score, ref=ref), batch_format="pyarrow")
    hit = scored.filter(expr="score > 0")
    return streaming_topk(hit, ["score", "doc_id"], 10, descending=[True, False])


def _bm25_sql() -> str:
    t0, t1, t2 = BM25_QUERY_TERMS
    k1, b = _BM25_K1, _BM25_B

    def tpart(i: int) -> str:
        return (
            f"ln((st.n - st.df{i} + 0.5)/(st.df{i} + 0.5) + 1.0) * tf{i} * "
            f"({k1} + 1.0) / (tf{i} + {k1} * (1.0 - {b} + {b} * len / st.avgdl))"
        )

    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
agg AS (
  SELECT doc_id, count(*) AS len,
         count(*) FILTER (term = '{t0}') AS tf0,
         count(*) FILTER (term = '{t1}') AS tf1,
         count(*) FILTER (term = '{t2}') AS tf2
  FROM tok GROUP BY doc_id),
ft AS (
  SELECT d.doc_id, coalesce(a.len, 0) AS len, coalesce(a.tf0, 0) AS tf0,
         coalesce(a.tf1, 0) AS tf1, coalesce(a.tf2, 0) AS tf2
  FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id),
st AS (
  SELECT count(*) AS n, avg(len) AS avgdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM ft)
SELECT doc_id, score FROM (
  SELECT ft.doc_id,
         round({tpart(0)} + {tpart(1)} + {tpart(2)}, 6) AS score
  FROM ft, st)
WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 10"""


BM25_SEARCH_SQL = _bm25_sql()


#: 16-term exponentially-weighted moving average: alpha, and the lag
#: coefficients alpha*(1-alpha)^k computed by SUCCESSIVE multiplication so
#: the SQL literals (repr round-trip) are bit-identical to the engine's.
#: alpha is deliberately 1/3 — NOT a finite decimal: with any finite-decimal
#: alpha (0.25, 0.3, ...) the coefficients are exact decimals, so 2-decimal
#: inputs produce sums landing EXACTLY on 1e-6 half-boundaries where numpy
#: (half-even) and SQL (half-away) rounding disagree; 1/3's coefficients
#: have no decimal structure, so scaled sums never tie and both engines
#: round identically
_EWMA_ALPHA = 1.0 / 3.0
_EWMA_LAGS = 16


def _ewma_coefs() -> list[float]:
    c, out = _EWMA_ALPHA, []
    for _ in range(_EWMA_LAGS):
        out.append(c)
        c = c * (1.0 - _EWMA_ALPHA)
    return out


def ewma_value(sf_dir: str):
    """Per-user exponentially-weighted moving average of event values
    (16-lag window, alpha=1/3) — the time-series smoothing pass a
    monitoring/feature pipeline runs. One user-bucket shuffle; the kernel
    is 16 vectorized shifted multiply-adds across ALL users in the bucket
    (missing lags contribute exact 0.0, so the float add order matches the
    oracle's coalesce(lag(...), 0) chain term for term)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    coefs = _ewma_coefs()

    def ewma(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        x = g["value"].to_numpy(np.float64)
        n = len(g)
        adj = np.zeros(n, bool)  # adj[i]: rows i and i-1 share one user
        if n > 1:
            adj[1:] = uid[1:] == uid[:-1]
        same = np.ones(n, bool)  # same[i] at step k: uid[i] == uid[i-k]
        y = coefs[0] * x
        for k in range(1, len(coefs)):
            if k >= n:
                break
            same[k:] = same[k:] & adj[1 : n - k + 1]
            contrib = np.zeros(n, np.float64)
            contrib[k:][same[k:]] = coefs[k] * x[:-k][same[k:]]
            y = y + contrib
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": uid,
                "ewma": np.round(y, 6),
            }
        )

    return bucketed_map_groups(ds, ["user_id"], ewma)


def _ewma_sql() -> str:
    coefs = _ewma_coefs()
    parts = [f"value * {coefs[0]!r}"]
    for k in range(1, _EWMA_LAGS):
        parts.append(f"coalesce(lag(value, {k}) OVER w, 0) * {coefs[k]!r}")
    expr = "\n       + ".join(parts)
    return f"""
SELECT event_id, user_id,
  round({expr}, 6) AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


EWMA_VALUE_SQL = _ewma_sql()


_HOUR_US = 3_600_000_000


def fuzzy_components(sf_dir: str):
    """Entity-resolution clusters: the blocked fuzzy pair set
    (``fuzzy_block_join``) feeds the distributed connected-components
    engine; every linked document maps to its cluster representative (the
    min doc id reachable through fuzzy matches). Puts
    ``functions/components.py`` under a SECOND full oracle (a recursive
    transitive-closure CTE over the identical Levenshtein pair set) on a
    graph whose edges came from string similarity rather than embeddings."""
    from fhirflat_ray.functions.components import connected_components

    from fhirflat_ray.functions.util import distinct_rows

    pairs = fuzzy_block_join(sf_dir).select_columns(["l_doc", "r_doc"])
    comps = connected_components(pairs, src="l_doc", dst="r_doc").materialize()

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["node"], "cluster_rep": b["component"]})

    # the star forest leaves minima implicit (node == component rows are
    # dropped by the engine); restore each representative's self-row
    def self_rows(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["component"], "cluster_rep": b["component"]})

    reps = distinct_rows(
        comps.map_batches(self_rows, batch_format="pyarrow"),
        ["doc_id", "cluster_rep"],
    )
    return comps.map_batches(rename, batch_format="pyarrow").union(reps)


FUZZY_COMPONENTS_SQL = """
WITH RECURSIVE p AS (
  SELECT a.doc_id AS l_doc, b.doc_id AS r_doc
  FROM documents a JOIN documents b
    ON a.lang = b.lang AND a.n_chars // 16 = b.n_chars // 16 AND a.doc_id < b.doc_id
  WHERE levenshtein(substr(a.text, 1, 24), substr(b.text, 1, 24)) <= 8),
e AS (SELECT l_doc AS u, r_doc AS v FROM p
      UNION SELECT r_doc AS u, l_doc AS v FROM p),
n AS (SELECT DISTINCT u AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT reach.node, e.v FROM reach JOIN e ON e.u = reach.r)
SELECT node AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY node
"""


def contamination_rate(sf_dir: str):
    """Train/eval contamination statistic: of the eval split's distinct
    8-token windows (every 10th doc plays the eval set), how many also
    appear in the train split — the scalar the decontamination gate
    reports. Eval windows are split-bounded and broadcast as a sorted
    hash-free string set is avoided: both sides reduce to DISTINCT window
    sets and the train pass streams map-only against the broadcast eval
    set. Integer outputs."""
    import ray

    from fhirflat_ray.functions.text import _split_words
    from fhirflat_ray.functions.util import collect_small_table

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    w = _DUP_SPAN_W

    def windows(b: pa.Table, keep_eval: bool) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        mask = ids % 10 == 0
        b = b.filter(pa.array(mask if keep_eval else ~mask))
        vals, parent, _ = _split_words(b["text"])
        n = len(vals)
        if n < w:
            return pa.table({"g": pa.array([], pa.string())})
        valid = parent[w - 1 :] == parent[: n - w + 1]
        shifted = [pa.array(vals[i : n - w + 1 + i], pa.string()) for i in range(w)]
        g = pc.binary_join_element_wise(*shifted, "\x1f")
        return pa.table({"g": pc.unique(g.filter(pa.array(valid)))})

    ev = collect_small_table(
        docs.map_batches(lambda b: windows(b, True), batch_format="pyarrow")
    )
    ev_set = np.unique(ev["g"].to_numpy(zero_copy_only=False))
    ref = ray.put(ev_set)

    def hits(b: pa.Table) -> pa.Table:
        es = ray.get(ref)
        tr = windows(b, False)["g"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(es, tr)
        pos = np.clip(pos, 0, max(0, len(es) - 1))
        hit = es[pos] == tr if len(es) else np.zeros(len(tr), bool)
        return pa.table({"g": pa.array(np.unique(tr[hit]), pa.string())})

    hit_t = collect_small_table(docs.map_batches(hits, batch_format="pyarrow"))
    n_hit = len(np.unique(hit_t["g"].to_numpy(zero_copy_only=False)))
    return pa.table(
        {
            "n_eval_ngrams": pa.array([len(ev_set)], pa.int64()),
            "n_contaminated": pa.array([n_hit], pa.int64()),
        }
    )


CONTAMINATION_RATE_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\S+')) AS term,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS i
  FROM documents),
ng AS (
  SELECT doc_id, {" || chr(31) || ".join(["term"] + [f"lead(term, {k}) OVER win" for k in range(1, _DUP_SPAN_W)])} AS g
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % 10 = 0 AND g IS NOT NULL),
tr AS (SELECT DISTINCT g FROM ng WHERE doc_id % 10 != 0 AND g IS NOT NULL)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_eval_ngrams,
       (SELECT CAST(count(*) AS BIGINT) FROM ev JOIN tr ON tr.g = ev.g)
         AS n_contaminated
"""


def resample_fill(sf_dir: str):
    """Time-series resample with gap fill: hourly event counts per type
    over the full observed range, missing (type, hour) cells filled with
    0 — the dense-grid input a forecasting/monitoring job needs.

    Scale shape: the heavy pass is the ordinary distributed partial+final
    count; the dense grid derives from that BOUNDED aggregate on the
    driver (types x hours — O(result), no corpus rescan or join)."""
    from fhirflat_ray.functions.util import agg_select, collect_small_table
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.multiply(
            pc.divide(b["ts"].cast(pa.int64()), pa.scalar(_HOUR_US, pa.int64())),
            pa.scalar(_HOUR_US, pa.int64()),
        )
        t = pa.table({"event_type": b["event_type"], "h": hour})
        g = t.group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return agg_select(g, {"event_type": "event_type", "h": "h", "count_all": "n"})

    agg = collect_small_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "h"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()

    lo, hi = int(agg["h"].min()), int(agg["h"].max())
    hours = np.arange(lo, hi + 1, _HOUR_US, dtype=np.int64)
    types = np.sort(agg["event_type"].unique())
    grid = pd.DataFrame(
        {
            "event_type": np.repeat(types, len(hours)),
            "h": np.tile(hours, len(types)),
        }
    )
    out = grid.merge(agg, on=["event_type", "h"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    out["hour_ts"] = pd.to_datetime(out["h"], unit="us")
    return out[["event_type", "hour_ts", "n"]]


RESAMPLE_FILL_SQL = """
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b) g
)
SELECT grid.event_type, grid.h AS hour_ts, coalesce(c.n, 0) AS n
FROM grid LEFT JOIN c ON c.event_type = grid.event_type AND c.h = grid.h
"""


def scd2_intervals(sf_dir: str):
    """Slowly-changing-dimension (SCD2) interval derivation: per user, the
    validity interval of each event-type regime — a new version row opens
    whenever the type CHANGES (ordered by ts, event_id), closed by the
    next change (open-ended for the current regime).

    Scale shape: ONE user-key bucket shuffle; inside a bucket the change
    detection and interval close are two vectorized shifts across ALL
    users at once (same-user + same-type masks) — the CDC compaction
    pattern for building dimension tables from event logs."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        same_user = np.concatenate([[False], u[1:] == u[:-1]])
        same_type = np.concatenate([[False], t[1:] == t[:-1]])
        is_change = ~(same_user & same_type)
        ch = g[is_change]
        cu = ch["user_id"].to_numpy()
        ts = ch["ts"].to_numpy()
        nxt_same = np.concatenate([cu[1:] == cu[:-1], [False]])
        valid_to = np.concatenate([ts[1:], [np.datetime64("NaT", "us")]])
        valid_to[~nxt_same] = np.datetime64("NaT", "us")
        return pd.DataFrame(
            {
                "user_id": cu,
                "event_type": ch["event_type"].to_numpy(),
                "valid_from": ts,
                "valid_to": valid_to,
            }
        )

    return bucketed_map_groups(ds, ["user_id"], per_bucket)


SCD2_INTERVALS_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ch AS (
  SELECT user_id, event_type, ts, event_id FROM o
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM ch
"""


def approx_percentile_hist(sf_dir: str):
    """Histogram-sketch percentiles (p50/p90/p99 of l_extendedprice):
    the distributed pass is the same map-only equi-width histogram as
    ``value_histogram``; percentile extraction is integer rank arithmetic
    over the BOUNDED bin table plus one linear interpolation whose float
    expression is written identically in the SQL oracle — so even the
    approximation is hash-checked, the HLL/CMS discipline applied to
    quantile sketches."""
    from fhirflat_ray.functions.util import agg_select, collect_small_table
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        binv = pc.cast(
            pc.floor(pc.divide(b["l_extendedprice"], pa.scalar(5000.0))), pa.int64()
        )
        g = pa.table({"bin": binv}).group_by(["bin"]).aggregate([([], "count_all")])
        return agg_select(g, {"bin": "bin", "count_all": "n"})

    bins = (
        collect_small_table(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n"))
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    n = bins["n"].to_numpy().astype(np.int64)
    b = bins["bin"].to_numpy().astype(np.int64)
    cum = np.cumsum(n)
    total = int(cum[-1])
    out_rows = []
    for pct in (50, 90, 99):
        t = (total * pct + 99) // 100  # 1-based target rank, exact ints
        i = int(np.searchsorted(cum, t))
        cum_before = int(cum[i - 1]) if i else 0
        val = b[i] * 5000.0 + 5000.0 * ((t - cum_before) / n[i])
        out_rows.append((pct, round(val, 6)))
    return pd.DataFrame(out_rows, columns=["pct", "approx_value"])


APPROX_PERCENTILE_HIST_SQL = """
WITH h AS (
  SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin, count(*) AS n
  FROM lineitem GROUP BY bin
),
c AS (
  SELECT bin, n,
         sum(n) OVER (ORDER BY bin) AS cum,
         sum(n) OVER () AS total
  FROM h
),
p AS (SELECT unnest([50, 90, 99]) AS pct)
SELECT p.pct,
       round(c.bin * 5000.0 + 5000.0 * (((c.total * p.pct + 99) // 100 - (c.cum - c.n)) * 1.0 / c.n), 6) AS approx_value
FROM p JOIN c
  ON c.cum >= (c.total * p.pct + 99) // 100
 AND (c.cum - c.n) < (c.total * p.pct + 99) // 100
"""


# =====================================================================
# Wave 11: correlated-aggregate join shapes (TPC-H Q17, argmin
# join-back) + mirrored statistical moments
# =====================================================================


def q17_small_quantity(sf_dir: str):
    """TPC-H-Q17-shaped correlated-average filter: total revenue of line
    items whose quantity is below 20% of their part's average quantity.

    Scale shape: the correlated subquery becomes an aggregate-before-join
    — lineitem collapses to one (partkey, sum, count) row per part before
    the distributed hash join back to itself; the inequality is a
    vectorized post-join filter. Integer cents per row keep the final sum
    exact under any combine order."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    n_parts = _join_partitions(sf_dir, ["lineitem"])
    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey"]).aggregate(
            [("l_quantity", "sum"), ([], "count_all")]
        )
        return agg_select(
            g, {"l_partkey": "l_partkey", "l_quantity_sum": "s", "count_all": "c"}
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_partkey", sort=False, as_index=False).agg(
            s=("s", "sum"), c=("c", "sum")
        )
        # threshold = 0.2 * avg(qty); quantities are integral doubles, so
        # s is exact and the float expression mirrors the SQL one-to-one
        out["threshold"] = 0.2 * (out["s"] / out["c"])
        return out[["l_partkey", "threshold"]]

    per_part = bucketed_map_groups(
        li.map_batches(partial, batch_format="pyarrow"), ["l_partkey"], final
    ).repartition(max(4, n_parts))

    j = li.join(per_part, "inner", n_parts, on=("l_partkey",))

    def keep_small(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.less(b["l_quantity"], b["threshold"]))
        cents = pc.cast(
            pc.round(pc.multiply(keep["l_extendedprice"], pa.scalar(100.0)), 0),
            pa.int64(),
        )
        return pa.table(
            {
                "cents": pa.array(
                    [int(pc.sum(cents).as_py() or 0)], pa.int64()
                ),
                "n": pa.array([keep.num_rows], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = j.map_batches(keep_small, batch_format="pyarrow").aggregate(
        Sum("cents", alias_name="rev_cents"), Sum("n", alias_name="n")
    )
    return pd.DataFrame(
        [(int(out["rev_cents"] or 0), int(out["n"] or 0))], columns=["rev_cents", "n"]
    )


Q17_SMALL_QUANTITY_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
       count(*) AS n
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.2 * (sum(l2.l_quantity) / count(*))
  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
"""


def part_min_supplier(sf_dir: str):
    """Argmin join-back (TPC-H-Q2 shape): for every part, the supplier
    offering its MINIMUM extended price (ties toward the smallest
    suppkey).

    Scale shape: a pure per-key argmin — one narrow bucket shuffle of
    (partkey, price, suppkey) with a per-batch argmin PRE-REDUCE (one
    candidate row per in-batch part), so the exchange carries one row per
    (batch, part), never raw line items; no join is needed at all because
    the argmin carries its witness columns along."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    )

    def local_argmin(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
                "price": b["l_extendedprice"].to_numpy(zero_copy_only=False),
                "l_suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(
            ["l_partkey", "price", "l_suppkey"], kind="mergesort"
        ).drop_duplicates("l_partkey")
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_partkey", "price", "l_suppkey"], kind="mergesort")
        return g.drop_duplicates("l_partkey")[["l_partkey", "l_suppkey", "price"]]

    return bucketed_map_groups(
        li.map_batches(local_argmin, batch_format="pyarrow"), ["l_partkey"], final
    )


PART_MIN_SUPPLIER_SQL = """
SELECT l_partkey, l_suppkey, l_extendedprice AS price
FROM lineitem
QUALIFY row_number() OVER (
  PARTITION BY l_partkey ORDER BY l_extendedprice, l_suppkey
) = 1
"""


def qty_price_corr(sf_dir: str):
    """Pearson correlation of (l_quantity, l_extendedprice) as a
    distributed moment aggregate: each batch folds to ONE row of raw
    moments (n, sx, sy, sxx, syy, sxy); the closed-form correlation is
    written with the IDENTICAL expression in the SQL oracle, so even this
    float statistic is hash-checked (6dp)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = b["l_quantity"].to_numpy(zero_copy_only=False)
        y = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([x.sum()], pa.float64()),
                "sy": pa.array([y.sum()], pa.float64()),
                "sxx": pa.array([(x * x).sum()], pa.float64()),
                "syy": pa.array([(y * y).sum()], pa.float64()),
                "sxy": pa.array([(x * y).sum()], pa.float64()),
            }
        )

    m = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"),
        Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"),
        Sum("sxy", alias_name="sxy"),
    )
    n = float(m["n"])
    cov = m["sxy"] / n - (m["sx"] / n) * (m["sy"] / n)
    vx = m["sxx"] / n - (m["sx"] / n) * (m["sx"] / n)
    vy = m["syy"] / n - (m["sy"] / n) * (m["sy"] / n)
    corr = cov / ((vx**0.5) * (vy**0.5))
    return pd.DataFrame([(round(corr, 6),)], columns=["corr_qty_price"])


QTY_PRICE_CORR_SQL = """
WITH m AS (
  SELECT count(*) AS n, sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_quantity) AS sxx,
         sum(l_extendedprice * l_extendedprice) AS syy,
         sum(l_quantity * l_extendedprice) AS sxy
  FROM lineitem
)
SELECT round(
  (sxy / n - (sx / n) * (sy / n)) /
  (sqrt(sxx / n - (sx / n) * (sx / n)) * sqrt(syy / n - (sy / n) * (sy / n))),
  6) AS corr_qty_price
FROM m
"""


# =====================================================================
# Wave 12: grouped distincts — exact (Q16 shape) and sketched (grouped
# HLL)
# =====================================================================


def brand_supplier_counts(sf_dir: str):
    """TPC-H-Q16-shaped grouped COUNT DISTINCT: distinct suppliers per
    (brand, type) of the parts they ship.

    Scale shape: lineitem FIRST collapses to its distinct (partkey,
    suppkey) pairs (one narrow two-int64 shuffle) before the distributed
    hash join attaches part attributes; a second distinct on (brand,
    type, suppkey) then makes the count a plain size-per-group — the
    two-level-distinct pattern that keeps COUNT(DISTINCT) shuffle-narrow."""
    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        distinct_rows,
    )

    n_parts = _join_partitions(sf_dir, ["lineitem", "part"])
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    pairs = distinct_rows(li, ["l_partkey", "l_suppkey"]).repartition(max(4, n_parts))
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_type"])
    j = pairs.join(part, "inner", n_parts, on=("l_partkey",), right_on=("p_partkey",))
    trip = distinct_rows(
        j.select_columns(["p_brand", "p_type", "l_suppkey"]),
        ["p_brand", "p_type", "l_suppkey"],
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand", "p_type"]).aggregate([([], "count_all")])
        return agg_select(
            g, {"p_brand": "p_brand", "p_type": "p_type", "count_all": "supplier_cnt"}
        )

    from ray.data.aggregate import Sum

    return (
        trip.map_batches(partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_type"])
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
    )


BRAND_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_brand, p_type
"""


def distinct_users_hll_by_type(sf_dir: str):
    """GROUPED HyperLogLog: approximate distinct users per event type —
    the same deterministic, SQL-expressible sketch as
    ``distinct_users_hll`` with the group key carried through partials,
    merge, and estimator (bounded driver state: groups x 4096 register
    maxima). Even the grouped APPROXIMATION is hash-checked bit-for-bit
    against DuckDB."""
    from fhirflat_ray.functions.sketches import hll_grouped_estimate

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    out = hll_grouped_estimate(ds, "event_type", "user_id")
    return out.rename(columns={"g": "event_type"}) if "g" in out.columns else out


def _distinct_users_hll_by_type_sql() -> str:
    from fhirflat_ray.functions.sketches import hll_grouped_estimate_sql

    sql = hll_grouped_estimate_sql("event_type", "user_id", "events")
    return f"SELECT g AS event_type, approx_distinct FROM ({sql}) t"


# =====================================================================
# Wave 13: global running aggregates (distributed prefix scan)
# =====================================================================


def running_totals(sf_dir: str):
    """GLOBAL running aggregates over the whole event stream — SQL
    ``OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)`` with NO
    partition key, i.e. the window family a per-key shuffle cannot serve.

    Scale shape: the two-pass distributed prefix scan
    (``functions/windows.py:global_running``) — pass 1 folds each batch
    to per-TIME-bucket partials (map-only), the driver prefix-combines
    the bounded bucket table, pass 2 is ONE narrow bucket shuffle where
    every bucket adds its exclusive offset. No global sort, no sequential
    bottleneck. Running money is integer cents (exact under any order);
    running max picks real elements, so every output row is
    hash-comparable."""
    from fhirflat_ray.functions.windows import global_running

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["value"], pa.scalar(100.0)), 0), pa.int64()
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "value": b["value"],
                "cents": cents,
            }
        )

    out = global_running(
        ds.map_batches(prep, batch_format="pyarrow"),
        ts_col="ts",
        tiebreak_col="event_id",
        sum_cols=["cents"],
        max_cols=["value"],
        bucket_width_us=_HOUR_US,
    )
    return out.select_columns(["event_id", "rn", "run_cents", "run_value"])


RUNNING_TOTALS_SQL = """
SELECT event_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) AS run_cents,
       max(value) OVER w AS run_value
FROM events
WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# =====================================================================
# Wave 14: gaps-and-islands interval coalescing + forward as-of join
# =====================================================================

_ISLAND_WIDTH_US = 300_000_000  # 5-minute interval per event


def merge_intervals(sf_dir: str):
    """Gaps-and-islands interval coalescing: every event opens a 5-minute
    half-open interval; per user, overlapping/touching intervals merge
    into islands. Output per user: island count, covered microseconds,
    longest island.

    Scale shape: ONE user-bucket shuffle; island detection is the
    vectorized shifted-running-max trick across ALL users in the bucket
    (per-user cummax of ends, shift, compare) — the same one-pass
    gaps-and-islands kernel SQL expresses with two window functions."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {"u": g["user_id"].to_numpy(), "s": s, "e": s + _ISLAND_WIDTH_US}
        ).sort_values(["u", "s", "e"], kind="mergesort")
        grp = df.groupby("u", sort=False)
        prev_max = grp["e"].cummax().shift(1)
        first = grp.cumcount().to_numpy() == 0
        new_island = first | (df["s"].to_numpy() > prev_max.to_numpy())
        df["island"] = np.cumsum(new_island)  # globally unique per (u, island)
        isl = df.groupby(["u", "island"], sort=False).agg(
            is_=("s", "min"), ie=("e", "max")
        )
        isl["span"] = isl["ie"] - isl["is_"]
        out = isl.groupby("u", sort=False).agg(
            n_islands=("span", "size"),
            covered_us=("span", "sum"),
            max_island_us=("span", "max"),
        )
        out = out.reset_index().rename(columns={"u": "user_id"})
        for c in ("n_islands", "covered_us", "max_island_us"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucketed_map_groups(ds, ["user_id"], per_bucket)


MERGE_INTERVALS_SQL = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_ISLAND_WIDTH_US} AS e
  FROM events
),
o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e) AS island
  FROM o
),
g AS (
  SELECT user_id, island, min(s) AS is_, max(e) AS ie
  FROM isl GROUP BY user_id, island
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(ie - is_) AS BIGINT) AS covered_us,
       CAST(max(ie - is_) AS BIGINT) AS max_island_us
FROM g GROUP BY user_id
"""


def asof_join_forward(sf_dir: str):
    """FORWARD as-of join: for every event, its user's NEXT order at or
    after the event time (the backward family's mirror — `asof_join`
    finds the latest preceding). Same broadcast shape; the per-batch
    kernel is ``merge_asof(direction='forward')``. The SQL oracle
    expresses forward-asof by negating the time axis of DuckDB's
    backward-only ASOF JOIN."""
    import pyarrow.parquet as pq2

    from fhirflat_ray.functions.joins import broadcast_asof_join

    orders = (
        pq2.read_table(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_orderdate"]
        )
        .to_pandas()
        .groupby(["o_custkey", "o_orderdate"], as_index=False)
        .first()  # dedupe ties so the matched o_orderdate is deterministic
    )
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = broadcast_asof_join(
        ds,
        orders.rename(columns={"o_orderdate": "order_ts"}),
        left_on="ts",
        right_on="order_ts",
        by_left="user_id",
        by_right="o_custkey",
        right_value_cols=[],
        direction="forward",
    )
    return out.select_columns(["event_id", "order_ts"])


ASOF_JOIN_FORWARD_SQL = """
WITH ee AS (SELECT event_id, user_id, -epoch_us(ts) AS nts FROM events),
     oe AS (SELECT o_custkey, o_orderdate, -epoch_us(o_orderdate) AS nts
            FROM orders),
j AS (
  SELECT ee.event_id, oe.o_orderdate
  FROM ee ASOF LEFT JOIN oe
    ON ee.user_id = oe.o_custkey AND ee.nts >= oe.nts
)
SELECT event_id, o_orderdate AS order_ts FROM j
"""


def export_shards(sf_dir: str):
    """Deterministic seeded shuffle + balanced export sharding: documents
    get a reproducible global shuffle position (rank in id-hash order —
    same permutation on any cluster size or partitioning), then round-robin
    into 16 shards; output per shard: doc count + total whitespace tokens.

    Scale shape: the global rank is the distributed prefix scan
    (``global_running`` bucketed on hash ranges — no global sort); the
    shard aggregate is a tiny partial+final. The export step every
    training run needs: reshuffle-free, resumable, and identical across
    reruns because position depends only on ids."""
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.windows import global_running

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.cast(pc.count_substring_regex(b["text"], r"\S+"), pa.int64())
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "h": pa.array(hash32(ids), pa.int64()),
                "n_tokens": toks,
            }
        )

    ranked = global_running(
        ds.map_batches(prep, batch_format="pyarrow"),
        ts_col="h",
        tiebreak_col="doc_id",
        sum_cols=[],
        max_cols=[],
        bucket_width_us=1 << 26,  # hash space 2^32 → ~64 rank buckets
    )

    def shard_partial(b: pa.Table) -> pa.Table:
        rn = b["rn"].to_numpy(zero_copy_only=False)
        shard = pa.array((rn - 1) % 16, pa.int64())
        t = pa.table({"shard": shard, "n_tokens": b["n_tokens"]})
        g = t.group_by(["shard"]).aggregate([([], "count_all"), ("n_tokens", "sum")])
        from fhirflat_ray.functions.util import agg_select

        return agg_select(
            g, {"shard": "shard", "count_all": "n_docs", "n_tokens_sum": "tok_sum"}
        )

    from ray.data.aggregate import Sum

    return (
        ranked.map_batches(shard_partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("tok_sum", alias_name="tok_sum"))
    )


def _export_shards_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    return f"""
WITH r AS (
  SELECT doc_id, length(regexp_extract_all(text, '\\S+')) AS n_tokens,
         row_number() OVER (ORDER BY {hash32_sql('doc_id')}, doc_id) AS rn
  FROM documents
)
SELECT (rn - 1) % 16 AS shard, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tok_sum
FROM r GROUP BY 1
"""


def media_features_png(sf_dir: str):
    """The ``media_features`` trick through the PNG path: pixels are the
    text's own bytes, but the payload is a real zlib-compressed PNG whose
    scanlines cycle through ALL FIVE filter types — so the driver gate
    exercises chunk parsing, inflate and every unfilter branch, and the
    SQL oracle still recomputes the decoded mean-red via ord() because
    decode is pixel-exact. Payload size is zlib-dependent, so unlike the
    PPM variant only (doc_id, f0) is asserted."""
    from fhirflat_ray.functions.multimodal import (
        ImageFeatureExtractor,
        _encode_png,
    )
    from fhirflat_ray.functions.util import worker_cached_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W, H = 16, 12

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for s in b["text"].to_pylist():
            raw = (s or "").encode("utf-8") or b"\x00"
            need = W * H * 3
            buf = (raw * (need // len(raw) + 1))[:need]
            px = np.frombuffer(buf, dtype=np.uint8).reshape(H, W, 3)
            payloads.append(_encode_png(px))
        return pa.table(
            {"doc_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    feats = docs.map_batches(to_media, batch_format="pyarrow").map_batches(
        worker_cached_stage(ImageFeatureExtractor, dim=8),
        batch_format="pyarrow",
        batch_size=128,
    )

    def finish(b: pa.Table) -> pa.Table:
        f0 = pa.array(
            [round(float(v[0]), 4) for v in b["features"].to_pylist()],
            pa.float64(),
        )
        return pa.table({"doc_id": b["doc_id"], "f0": f0})

    return feats.map_batches(finish, batch_format="pyarrow")


MEDIA_FEATURES_PNG_SQL = """
WITH px AS (
  SELECT doc_id, ord(substr(text, (s.p % length(text)) + 1, 1)) AS red
  FROM documents, generate_series(0, 573, 3) s(p)
)
SELECT doc_id,
       round(CAST(CAST(CAST(avg(red) AS DOUBLE) / 255.0 AS REAL) AS DOUBLE), 4) AS f0
FROM px GROUP BY doc_id
"""


def media_features_gif(sf_dir: str):
    """The multimodal-oracle trick through the GIF path: palette indices
    are the text's own bytes under a 256-entry GRAYSCALE global color
    table, and the payload is a real GIF87a whose LZW stream the decoder
    must walk (variable code widths, CLEAR/EOI) — so the driver gate
    exercises the whole stdlib-only GIF decode, and the SQL oracle
    recomputes the decoded mean-red via ord() exactly as for PPM/PNG/WAV.
    With the gray table every channel equals the source byte, so the red
    mean is the byte mean."""
    from fhirflat_ray.functions.multimodal import (
        ImageFeatureExtractor,
        make_gif_bytes,
    )
    from fhirflat_ray.functions.util import worker_cached_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W, H = 16, 12

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for s in b["text"].to_pylist():
            raw = (s or "").encode("utf-8") or b"\x00"
            need = W * H
            buf = (raw * (need // len(raw) + 1))[:need]
            ix = np.frombuffer(buf, dtype=np.uint8).reshape(H, W)
            payloads.append(make_gif_bytes(W, H, indices=ix))
        return pa.table(
            {"doc_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    feats = docs.map_batches(to_media, batch_format="pyarrow").map_batches(
        worker_cached_stage(ImageFeatureExtractor, dim=8),
        batch_format="pyarrow",
        batch_size=128,
    )

    def finish(b: pa.Table) -> pa.Table:
        f0 = pa.array(
            [round(float(v[0]), 4) for v in b["features"].to_pylist()],
            pa.float64(),
        )
        return pa.table({"doc_id": b["doc_id"], "f0": f0})

    return feats.map_batches(finish, batch_format="pyarrow")


MEDIA_FEATURES_GIF_SQL = """
WITH px AS (
  SELECT doc_id, ord(substr(text, (s.p % length(text)) + 1, 1)) AS red
  FROM documents, generate_series(0, 191, 1) s(p)
)
SELECT doc_id,
       round(CAST(CAST(CAST(avg(red) AS DOUBLE) / 255.0 AS REAL) AS DOUBLE), 4) AS f0
FROM px GROUP BY doc_id
"""


def media_features_jpeg(sf_dir: str):
    """The multimodal-oracle trick through the JPEG path — over a LOSSY
    format. The payload is a REAL baseline JFIF stream (huffman entropy
    coding, DHT/DQT/SOF0/SOS markers) built so decode is pixel-EXACT:
    all-ones quantization + one CONSTANT 8x8 block per text byte, so every
    DCT block is DC-only and reconstructs its byte exactly
    (functions/jpeg.py). The driver gate therefore exercises the full
    huffman+IDCT decode while the SQL oracle still recomputes the decoded
    gray mean via ord()."""
    from fhirflat_ray.functions.jpeg import encode_jpeg_gray_blocks
    from fhirflat_ray.functions.multimodal import ImageFeatureExtractor
    from fhirflat_ray.functions.util import worker_cached_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    BW, BH = 6, 4  # 24 constant blocks -> 48x32 pixels

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for s in b["text"].to_pylist():
            raw = (s or "").encode("utf-8") or b"\x00"
            need = BW * BH
            buf = (raw * (need // len(raw) + 1))[:need]
            payloads.append(
                encode_jpeg_gray_blocks(np.frombuffer(buf, dtype=np.uint8), BW)
            )
        return pa.table(
            {"doc_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    feats = docs.map_batches(to_media, batch_format="pyarrow").map_batches(
        worker_cached_stage(ImageFeatureExtractor, dim=8),
        batch_format="pyarrow",
        batch_size=128,
    )

    def finish(b: pa.Table) -> pa.Table:
        f0 = pa.array(
            [round(float(v[0]), 4) for v in b["features"].to_pylist()],
            pa.float64(),
        )
        return pa.table({"doc_id": b["doc_id"], "f0": f0})

    return feats.map_batches(finish, batch_format="pyarrow")


MEDIA_FEATURES_JPEG_SQL = """
WITH px AS (
  SELECT doc_id, ord(substr(text, (s.p % length(text)) + 1, 1)) AS red
  FROM documents, generate_series(0, 23, 1) s(p)
)
SELECT doc_id,
       round(CAST(CAST(CAST(avg(red) AS DOUBLE) / 255.0 AS REAL) AS DOUBLE), 4) AS f0
FROM px GROUP BY doc_id
"""


def audio_features_wav(sf_dir: str):
    """The multimodal-oracle trick for AUDIO: each document's bytes become
    8-bit PCM samples in a REAL RIFF/WAVE payload (stdlib ``wave``
    writer), the actor-pool stage decodes them back through the real WAV
    path, and the first feature — RMS of (byte-128)/128 samples — is
    recomputable in SQL via ord(). The float32 feature cast is mirrored
    with CAST AS REAL, which absorbs float64 summation-order noise (the
    ``media_features`` discipline), so the WAV decode path sits under a
    full oracle alongside the PPM and PNG image paths."""
    import io as _io
    import wave as _wave

    from fhirflat_ray.functions.multimodal import AudioFeatureExtractor
    from fhirflat_ray.functions.util import worker_cached_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    N = 192  # samples per payload (text bytes tiled)

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for s in b["text"].to_pylist():
            raw = (s or "").encode("utf-8") or b"\x00"
            buf = (raw * (N // len(raw) + 1))[:N]
            out = _io.BytesIO()
            with _wave.open(out, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(1)  # 8-bit PCM: samples ARE the text bytes
                w.setframerate(8000)
                w.writeframes(buf)
            payloads.append(out.getvalue())
        return pa.table(
            {"doc_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    feats = docs.map_batches(to_media, batch_format="pyarrow").map_batches(
        worker_cached_stage(AudioFeatureExtractor, dim=4),
        batch_format="pyarrow",
        batch_size=128,
    )

    def finish(b: pa.Table) -> pa.Table:
        rms = pa.array(
            [round(float(v[0]), 4) for v in b["features"].to_pylist()],
            pa.float64(),
        )
        return pa.table({"doc_id": b["doc_id"], "rms": rms})

    return feats.map_batches(finish, batch_format="pyarrow")


AUDIO_FEATURES_WAV_SQL = """
WITH sm AS (
  SELECT doc_id,
         (ord(substr(text, (s.p % length(text)) + 1, 1)) - 128.0) / 128.0 AS x
  FROM documents, generate_series(0, 191) s(p)
)
SELECT doc_id,
       round(CAST(CAST(sqrt(avg(x * x)) AS REAL) AS DOUBLE), 4) AS rms
FROM sm GROUP BY doc_id
"""


def video_frame_features(sf_dir: str):
    """The multimodal-oracle trick for VIDEO: each document becomes a
    'clip' of 4 equal-size PPM frames concatenated (frame i's pixels =
    the text's bytes shifted by i, so frames differ deterministically),
    ``FrameSampler`` splits the payload back into frames on exact byte
    boundaries, and each frame decodes through the REAL PPM path — so the
    whole video pipeline (clip → frame sampling → per-frame decode →
    features) sits under one SQL oracle mirroring the per-frame mean-red
    via ord(). Completes the modality-oracle set (image, audio, video)."""
    from fhirflat_ray.functions.multimodal import (
        FrameSampler,
        ImageFeatureExtractor,
        _encode_ppm,
    )
    from fhirflat_ray.functions.util import worker_cached_stage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W, H, F = 16, 12, 4

    def to_clip(b: pa.Table) -> pa.Table:
        payloads = []
        for s in b["text"].to_pylist():
            raw = (s or "").encode("utf-8") or b"\x00"
            need = W * H * 3
            frames = []
            for i in range(F):
                shifted = raw[i % len(raw):] + raw[: i % len(raw)]
                buf = (shifted * (need // len(shifted) + 1))[:need]
                px = np.frombuffer(buf, dtype=np.uint8).reshape(H, W, 3)
                frames.append(_encode_ppm(px))
            payloads.append(b"".join(frames))
        return pa.table(
            {"media_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    frames = docs.map_batches(to_clip, batch_format="pyarrow").map_batches(
        worker_cached_stage(FrameSampler, n_frames=F),
        batch_format="pyarrow",
        batch_size=64,
    )

    def rename_frame(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": b["media_id"],
                "frame_idx": b["frame_idx"],
                "payload": b["frame"],
            }
        )

    feats = frames.map_batches(rename_frame, batch_format="pyarrow").map_batches(
        worker_cached_stage(ImageFeatureExtractor, dim=8),
        batch_format="pyarrow",
        batch_size=128,
    )

    def finish(b: pa.Table) -> pa.Table:
        f0 = pa.array(
            [round(float(v[0]), 4) for v in b["features"].to_pylist()],
            pa.float64(),
        )
        return pa.table(
            {
                "doc_id": b["media_id"],
                "frame_idx": pc.cast(b["frame_idx"], pa.int64()),
                "f0": f0,
            }
        )

    return feats.map_batches(finish, batch_format="pyarrow")


VIDEO_FRAME_FEATURES_SQL = """
WITH px AS (
  SELECT doc_id, f.i AS frame_idx,
         ord(substr(text, (((f.i % length(text)) + s.p) % length(text)) + 1, 1)) AS red
  FROM documents, generate_series(0, 3) f(i), generate_series(0, 573, 3) s(p)
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       round(CAST(CAST(CAST(avg(red) AS DOUBLE) / 255.0 AS REAL) AS DOUBLE), 4) AS f0
FROM px GROUP BY doc_id, frame_idx
"""


def salted_join_segments(sf_dir: str):
    """Skew-robust distributed join: event value cents per customer market
    segment, through ``functions/joins.py:salted_hash_join`` — the top
    hot keys' fact rows split across 16 salts (deterministic per event) and
    their dim rows replicate, so a zipf key cannot serialise one
    aggregator. Row-for-row identical to the unsalted join; the oracle is
    the plain SQL join."""
    from fhirflat_ray.functions.joins import salted_hash_join
    from fhirflat_ray.functions.util import agg_select

    n_parts = _join_partitions(sf_dir, ["events", "customer"])
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    j = salted_hash_join(
        ev,
        cust,
        on="user_id",
        right_on="c_custkey",
        salt_source="event_id",
        num_partitions=n_parts,
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["value"], pa.scalar(100.0)), 0), pa.int64()
        )
        t = pa.table({"c_mktsegment": b["c_mktsegment"], "cents": cents})
        g = t.group_by(["c_mktsegment"]).aggregate([("cents", "sum"), ([], "count_all")])
        return agg_select(
            g,
            {"c_mktsegment": "c_mktsegment", "cents_sum": "cents", "count_all": "n"},
        )

    from ray.data.aggregate import Sum

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
    )


SALTED_JOIN_SEGMENTS_SQL = """
SELECT c.c_mktsegment,
       CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
       count(*) AS n
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


def sorted_export(sf_dir: str):
    """Range-partitioned GLOBAL sort (the terasort shape): every event gets
    its exact global rank under (value, event_id) order plus a contiguous
    balanced shard id — the curriculum-ordered export a training run needs
    when the ORDER is the product (vs ``export_shards``' order-free
    shuffle).

    Scale shape (``functions/sort.py:range_partition_sort``): sampled split
    points keep ranges balanced under the zipf-skewed value distribution;
    exact per-range counts fold to prefix offsets on the driver (one row
    per range); ONE all-to-all moves the data; ranks are exact regardless
    of where the splits landed."""
    from fhirflat_ray.functions.sort import range_partition_sort

    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    out = range_partition_sort(
        ds, key_col="value", tiebreak_cols=["event_id"], n_shards=16, pin_input=False
    )
    return out.select_columns(["event_id", "pos", "shard"])


SORTED_EXPORT_SQL = """
WITH r AS (
  SELECT event_id,
         row_number() OVER (ORDER BY value, event_id) - 1 AS pos
  FROM events
)
SELECT event_id, CAST(pos AS BIGINT) AS pos,
       CAST((pos * 16) // (SELECT count(*) FROM events) AS BIGINT) AS shard
FROM r
"""


def sorted_export_by_source(sf_dir: str):
    """Range-partitioned global sort under a STRING key ((source, doc_id)
    over documents) — the oracle gate for ``range_partition_sort``'s
    string-key path: siphash value sampling, vocab-level binary search
    (one Python comparison per DISTINCT value per batch, rows attach via
    one int take), codepoint order matching DuckDB's binary collation."""
    from fhirflat_ray.functions.sort import range_partition_sort

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = range_partition_sort(
        ds, key_col="source", tiebreak_cols=["doc_id"], n_shards=8, pin_input=False
    )
    return out.select_columns(["doc_id", "source", "pos", "shard"])


SORTED_EXPORT_BY_SOURCE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (ORDER BY source, doc_id) - 1 AS pos
  FROM documents
)
SELECT doc_id, source, CAST(pos AS BIGINT) AS pos,
       CAST((pos * 8) // (SELECT count(*) FROM documents) AS BIGINT) AS shard
FROM r
"""


def turn_sum_encoded(sf_dir: str):
    """SUM pushed INTO the encoded format: total turn_idx + row count
    computed from per-codec closed forms over the encoded int stream —
    RLE sums as dot(run_values, run_lengths) with nothing expanded, FOR
    as n*ref + g*sum(residuals), delta as a weighted-suffix dot — one
    task per segment returning two ints
    (``encoded_agg.segment_int_sum``). The fourth encoded-domain
    aggregate after COUNT/DISTINCT/MIN-MAX."""
    from fhirflat_ray.pipelines.encoded_agg import encoded_sum

    s, n = encoded_sum(_transcript_segdir(sf_dir, "ts"), "turn_idx")
    return pd.DataFrame([(s, n)], columns=["turn_sum", "n_rows"])


TURN_SUM_ENCODED_SQL = f"""
SELECT CAST(sum(turn_idx) AS BIGINT) AS turn_sum, count(*) AS n_rows
FROM ({TRANSCRIPT_BUILD_SQL})
"""


def turn_var_encoded(sf_dir: str):
    """Second moment pushed INTO the encoded format: SUM(x), SUM(x*x) and
    COUNT from per-codec closed forms (RLE: dot(v², lens) over O(runs);
    FOR: n·ref² + 2·ref·g·Σr + g²·Σr²) — population variance derives from
    three exact integers, with the final float division written
    EXPRESSION-FOR-EXPRESSION the same in SQL so the IEEE result is
    identical (``encoded_agg.encoded_moments``)."""
    from fhirflat_ray.pipelines.encoded_agg import encoded_moments

    s, s2, n = encoded_moments(_transcript_segdir(sf_dir, "var"), "turn_idx")
    var = (
        (float(s2) * n - float(s) * float(s)) / (float(n) * n) if n else None
    )  # empty table -> SQL NULL, not 0/0
    return pd.DataFrame(
        [(s, s2, n, var)],
        columns=["turn_sum", "turn_sumsq", "n_rows", "var_pop"],
    )


TURN_VAR_ENCODED_SQL = f"""
WITH t AS (
  SELECT CAST(sum(turn_idx) AS BIGINT) AS s,
         CAST(sum(turn_idx * turn_idx) AS BIGINT) AS s2,
         count(*) AS n
  FROM ({TRANSCRIPT_BUILD_SQL})
)
SELECT s AS turn_sum, s2 AS turn_sumsq, n AS n_rows,
       (CAST(s2 AS DOUBLE) * n - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         / (CAST(n AS DOUBLE) * n) AS var_pop
FROM t
"""


def role_turn_sum_encoded(sf_dir: str):
    """GROUP BY key → SUM(value) pushed INTO the encoded format: per-role
    turn_idx totals from the role column's dict CODES + the turn_idx int
    stream — one int64 scatter-add per segment, strings mapped in only at
    the vocab-bounded end (``encoded_agg.segment_grouped_sum``). Completes
    the encoded-domain aggregate matrix (COUNT / DISTINCT / MIN-MAX /
    SUM / grouped SUM)."""
    from fhirflat_ray.pipelines.encoded_agg import encoded_grouped_sum

    out = encoded_grouped_sum(_transcript_segdir(sf_dir, "gs"), "role", "turn_idx")
    return out.map_batches(
        lambda b: pa.table(
            {"role": b["role"], "turn_sum": b["s"], "n": b["n"]}
        ),
        batch_format="pyarrow",
    )


ROLE_TURN_SUM_ENCODED_SQL = f"""
SELECT role, CAST(sum(turn_idx) AS BIGINT) AS turn_sum, count(*) AS n
FROM ({TRANSCRIPT_BUILD_SQL}) GROUP BY role
"""


def role_tool_counts_encoded(sf_dir: str):
    """Two-column GROUP BY (role × tool cross-tab) pushed INTO the encoded
    format: both dictionary code streams decode as ints, fuse into one
    composite code, and a single ``bincount`` per segment produces the
    vocab²-bounded partial — neither string column ever materializes
    (``encoded_agg.segment_pair_counts``). role is shared-dict (manifest
    store) and tool local-dict, so one query exercises both vocab paths."""
    from fhirflat_ray.pipelines.encoded_agg import encoded_pair_counts

    return encoded_pair_counts(_transcript_segdir(sf_dir, "pc2"), "role", "tool")


ROLE_TOOL_COUNTS_ENCODED_SQL = f"""
SELECT role, tool, COUNT(*) AS n
FROM ({TRANSCRIPT_BUILD_SQL}) GROUP BY role, tool
"""


def table_diff_events(sf_dir: str):
    """Row-granular table reconciliation: diff the events table against a
    deterministically mutated successor (every id%7 row's value bumped,
    id%13 rows deleted, id%97 rows re-inserted at id+1e9) and report each
    key as added / removed / changed. The exchange ships (key, 64-bit
    payload digest) only — 16 bytes/row regardless of payload width — and
    the output is change-proportional (``functions/diff.py:table_diff``).
    The reference can only say two FOLDERS differ via sha256sums.txt
    (/root/reference/fhirflat/ingest.py:381-432); this is the row-level
    audit a merge/replication pipeline needs."""
    from fhirflat_ray.functions.diff import table_diff

    cols = ["event_id", "value", "event_type", "props"]
    old = _read(sf_dir, "events", columns=cols)

    def mutate(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        kept = b.filter(pa.array(ids % 13 != 0))
        kids = kept["event_id"].to_numpy(zero_copy_only=False)
        vals = kept["value"].to_numpy(zero_copy_only=False).copy()
        upd = kids % 7 == 0
        vals[upd] = vals[upd] + 1000.0
        kept = kept.set_column(
            kept.schema.get_field_index("value"), "value", pa.array(vals, pa.float64())
        )
        added = b.filter(pa.array(ids % 97 == 0))
        added = added.set_column(
            added.schema.get_field_index("event_id"),
            "event_id",
            pc.add(added["event_id"], pa.scalar(1_000_000_000, pa.int64())),
        )
        return pa.concat_tables([kept, added])

    new = _read(sf_dir, "events", columns=cols).map_batches(
        mutate, batch_format="pyarrow"
    )
    return table_diff(old, new, "event_id", ["value", "event_type", "props"])


TABLE_DIFF_EVENTS_SQL = """
WITH o AS (SELECT event_id, value, event_type, props FROM events),
n AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN value + 1000.0 ELSE value END AS value,
         event_type, props
  FROM events WHERE event_id % 13 <> 0
  UNION ALL
  SELECT event_id + 1000000000 AS event_id, value, event_type, props
  FROM events WHERE event_id % 97 = 0
)
SELECT COALESCE(o.event_id, n.event_id) AS event_id,
       CASE WHEN o.event_id IS NULL THEN 'added'
            WHEN n.event_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.event_id = n.event_id
WHERE o.event_id IS NULL OR n.event_id IS NULL
   OR o.value IS DISTINCT FROM n.value
   OR o.event_type IS DISTINCT FROM n.event_type
   OR o.props IS DISTINCT FROM n.props
"""


def mode_event_type(sf_dir: str):
    """Per-user MODE (most frequent event type, ties broken to the
    lexicographically smallest type — the deterministic tie-break SQL's
    ROW_NUMBER ORDER BY encodes). Per-batch Arrow partial counts shrink the
    shuffle to one row per in-batch (user, type); the bucketed combine
    resolves the argmax with one vectorized stable sort per bucket."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return agg_select(
            g, {"user_id": "user_id", "event_type": "event_type", "count_all": "n"}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["user_id", "event_type"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        c = c.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": c["user_id"].to_numpy(np.int64),
                "mode_type": c["event_type"].to_numpy(),
                "n": c["n"].to_numpy(np.int64),
            }
        )

    return bucketed_map_groups(partials, ["user_id"], pick)


MODE_EVENT_TYPE_SQL = """
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
         ) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


def data_mixture(sf_dir: str):
    """Data-mixture construction: per detected language, greedily keep the
    highest-quality documents until a fixed token budget fills — the
    "sample X tokens per language" step that turns a raw corpus into a
    training mixture. Quality rank is the integer alpha-character count
    (exact in both engines; float-ratio ordering would be bit-fragile),
    tie-broken by doc_id; the budget cut is the inclusive running token sum.

    Shape: one map-only scoring pass (LangId actor + Arrow regex counts) →
    shuffle of 4 narrow columns keyed by language → one vectorized
    sort+cumsum per bucket. A language is a coarse natural partition; the
    per-language prefix scan is inherently sequential in rank order, but
    only (doc_id, lang, 2 ints) ever shuffles and at extreme scale the same
    cut runs as a two-pass distributed prefix scan per language
    (``functions/windows.py:global_running``)."""
    from fhirflat_ray.functions.text import LangId, token_count_batch
    from fhirflat_ray.functions.util import bucketed_map_groups, worker_cached_stage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lang = ds.map_batches(worker_cached_stage(LangId), batch_format="pyarrow")

    def feats(b: pa.Table) -> pa.Table:
        b = token_count_batch(b)
        n_alpha = pc.cast(
            pc.count_substring_regex(pc.fill_null(b["text"], ""), "[A-Za-z]"),
            pa.int64(),
        )
        return b.append_column("n_alpha", n_alpha).select(
            ["doc_id", "lang_pred", "n_tokens", "n_alpha"]
        )

    scored = lang.map_batches(feats, batch_format="pyarrow")

    budget = 4000

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["lang_pred", "n_alpha", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        cum = g.groupby("lang_pred", sort=False)["n_tokens"].cumsum()
        keep = (cum <= budget).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64)[keep],
                "lang": g["lang_pred"].to_numpy()[keep],
                "cum_tokens": cum.to_numpy(np.int64)[keep],
            }
        )

    return bucketed_map_groups(scored, ["lang_pred"], pick)


DATA_MIXTURE_SQL = f"""
WITH lang AS ({LANG_ID_SQL}),
feat AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha
  FROM documents
),
c AS (
  SELECT f.doc_id, l.lang_pred AS lang,
         SUM(f.n_tokens) OVER (
           PARTITION BY l.lang_pred
           ORDER BY f.n_alpha DESC, f.doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM feat f JOIN lang l USING (doc_id)
)
SELECT doc_id, lang, CAST(cum AS BIGINT) AS cum_tokens FROM c WHERE cum <= 4000
"""


# =====================================================================
# Wave 16: corpus normalization, dedup provenance mapping, conversation
# length distribution, per-group standardization
# =====================================================================


def normalize_text(sf_dir: str):
    """Corpus text normalization (the pre-tokenization cleanup pass):
    lowercase, strip non-alphanumeric/space characters, collapse runs of
    whitespace, trim. Map-only Arrow/RE2 kernels; the oracle runs the
    identical regex chain in DuckDB, so the transform is hash-checked
    byte-for-byte."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(pc.fill_null(b["text"], ""))
        t = pc.replace_substring_regex(t, r"[^a-z0-9 ]", " ")
        t = pc.replace_substring_regex(t, r" +", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": b["doc_id"], "norm_text": t})

    return ds.map_batches(f, batch_format="pyarrow")


NORMALIZE_TEXT_SQL = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
FROM documents
"""


def _content_group_hash64(col) -> pa.Array:
    """64-bit content-group key for the exact-dedup provenance queries.

    The SQL oracles partition by raw text, where NULL is its own group —
    distinct from the empty string — so the hashed value is a prefixed key:
    "v:" + text for non-null rows, the length-1 marker "n" for nulls (no
    prefixed string can collide with the marker). Two distinct contents
    merging on a 64-bit hash collision remains a ~2^-64-per-pair
    approximation relative to the oracle's raw-text partition, the same
    contract as the other content-hash dedup paths."""
    import pandas.util as pdu

    keyed = pc.fill_null(pc.binary_join_element_wise("v", col, ":"), "n")
    txt = keyed.to_numpy(zero_copy_only=False)
    h = (pdu.hash_array(np.asarray(txt, dtype=object)) >> np.uint64(1)).astype(np.int64)
    return pa.array(h, pa.int64())


def dedup_mapping(sf_dir: str):
    """Dedup PROVENANCE mapping — every document mapped to the canonical
    (minimum) doc_id of its exact-content group, not just the survivor
    list: the id-rewrite table a downstream join uses to repoint
    references after dedup.

    Scale shape: the shuffle ships (content-hash, doc_id) — never text —
    and one bucketed pass computes the per-hash min and assigns it back
    to every member (vectorized transform per bucket)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_partial(b: pa.Table) -> pa.Table:
        return pa.table({"h": _content_group_hash64(b["text"]), "doc_id": b["doc_id"]})

    hashed = ds.map_batches(hash_partial, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        canon = g.groupby("h", sort=False)["doc_id"].transform("min")
        return pd.DataFrame(
            {"doc_id": g["doc_id"], "canonical_id": canon.astype(np.int64)}
        )

    return bucketed_map_groups(hashed, ["h"], per_bucket)


DEDUP_MAPPING_SQL = """
SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canonical_id
FROM documents
"""


def dup_rate_by_source(sf_dir: str):
    """Duplicate-rate report per source — the curation dashboard number
    that tells you WHICH crawl is flooding the corpus with copies: per
    source, total documents and how many are non-canonical members of an
    exact-content group. The dedup provenance shuffle ships
    (content-hash, doc_id, source); duplicate flags assign per bucket and
    the per-source tallies fold as a tiny second exchange. Integer
    outputs."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def hash_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": _content_group_hash64(b["text"]),
                "doc_id": b["doc_id"],
                "source": b["source"],
            }
        )

    hashed = ds.map_batches(hash_partial, batch_format="pyarrow")

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        canon = g.groupby("h", sort=False)["doc_id"].transform("min")
        dup = (g["doc_id"].to_numpy() != canon.to_numpy()).astype(np.int64)
        out = pd.DataFrame({"source": g["source"], "dup": dup})
        return out.groupby("source", sort=False, as_index=False).agg(
            n_docs=("dup", "size"), n_dupes=("dup", "sum")
        )

    partials = bucketed_map_groups(hashed, ["h"], flag)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("source", sort=False, as_index=False).agg(
            n_docs=("n_docs", "sum"), n_dupes=("n_dupes", "sum")
        )

    return bucketed_map_groups(partials, ["source"], fold)


DUP_RATE_BY_SOURCE_SQL = """
WITH m AS (
  SELECT source, CASE WHEN doc_id != min(doc_id) OVER (PARTITION BY text)
                      THEN 1 ELSE 0 END AS dup
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dup) AS BIGINT) AS n_dupes
FROM m GROUP BY source
"""


def dup_size_histogram(sf_dir: str):
    """Duplicate-cluster size distribution: how many exact-content groups
    have exactly N members — the structural report that distinguishes "a
    few mega-clusters" from "many pairs" before choosing a dedup
    strategy. Double aggregate: per-hash sizes in one bucketed exchange,
    then the bounded count-of-counts folds on the driver. Integer
    outputs."""
    from fhirflat_ray.functions.util import bucketed_map_groups, collect_small_table

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_partial(b: pa.Table) -> pa.Table:
        return pa.table({"h": _content_group_hash64(b["text"])})

    hashed = ds.map_batches(hash_partial, batch_format="pyarrow")

    def sizes(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("h", sort=False).size()
        out = c.value_counts()
        return pd.DataFrame(
            {
                "group_size": out.index.to_numpy(np.int64),
                "n_groups": out.to_numpy(np.int64),
            }
        )

    t = collect_small_table(bucketed_map_groups(hashed, ["h"], sizes))
    df = (
        t.to_pandas()
        .groupby("group_size", as_index=False)["n_groups"]
        .sum()
        .sort_values("group_size")
    )
    return pa.table(
        {
            "group_size": pa.array(df["group_size"].to_numpy(np.int64)),
            "n_groups": pa.array(df["n_groups"].to_numpy(np.int64)),
        }
    )


DUP_SIZE_HISTOGRAM_SQL = """
WITH g AS (SELECT text, count(*) AS sz FROM documents GROUP BY text)
SELECT CAST(sz AS BIGINT) AS group_size, CAST(count(*) AS BIGINT) AS n_groups
FROM g GROUP BY sz
"""


def term_freq_spectrum(sf_dir: str):
    """Token frequency-of-frequencies spectrum (the Zipf/Heaps
    diagnostic): how many distinct terms occur exactly N times. The term
    counts fold through one term-bucket exchange (A5 combiner partials);
    the count-of-counts is a bounded second aggregate. Integer outputs."""
    from fhirflat_ray.functions.text import _split_words
    from fhirflat_ray.functions.util import bucketed_map_groups, collect_small_table

    docs = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        vals, _, _ = _split_words(b["text"])
        un, cnt = np.unique(vals, return_counts=True)
        return pa.table(
            {"term": pa.array(un, pa.string()), "n": pa.array(cnt, pa.int64())}
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def spectrum(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("term", sort=False)["n"].sum()
        out = c.value_counts()
        return pd.DataFrame(
            {"freq": out.index.to_numpy(np.int64), "n_terms": out.to_numpy(np.int64)}
        )

    t = collect_small_table(bucketed_map_groups(partials, ["term"], spectrum))
    df = (
        t.to_pandas().groupby("freq", as_index=False)["n_terms"].sum()
        .sort_values("freq")
    )
    return pa.table(
        {
            "freq": pa.array(df["freq"].to_numpy(np.int64)),
            "n_terms": pa.array(df["n_terms"].to_numpy(np.int64)),
        }
    )


TERM_FREQ_SPECTRUM_SQL = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
c AS (SELECT term, count(*) AS n FROM tok GROUP BY term)
SELECT CAST(n AS BIGINT) AS freq, CAST(count(*) AS BIGINT) AS n_terms
FROM c GROUP BY n
"""


def split_leak_audit(sf_dir: str):
    """Split-integrity audit: the invariant check that NO conversation
    straddles train/val/test after the leakage-free hash split — reports
    conversations per split-count bucket (every conversation must land in
    exactly 1). Distinct (user, split) pairs fold through one narrow
    exchange; at a healthy pipeline the answer is one row (1, n_users).
    Integer outputs."""
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id"])

    def assign(b: pa.Table) -> pa.Table:
        ids = b["user_id"].to_numpy(zero_copy_only=False)
        h = hash32(ids) % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        t = pa.table(
            {"user_id": b["user_id"], "split": pa.array(split, pa.string())}
        )
        return t.group_by(["user_id", "split"]).aggregate([])

    pairs = ds.map_batches(assign, batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop_duplicates().groupby("user_id", sort=False).size()
        return pd.DataFrame({"n_splits": c.to_numpy(np.int64)})

    per = bucketed_map_groups(pairs, ["user_id"], per_user)

    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["n_splits"]).aggregate([([], "count_all")])
        return agg_select(g, {"n_splits": "n_splits", "count_all": "n_convs"})

    from ray.data.aggregate import Sum

    return (
        per.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_splits")
        .aggregate(Sum("n_convs", alias_name="n_convs"))
    )


def _split_leak_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    h = hash32_sql("user_id")
    return f"""
WITH a AS (
  SELECT DISTINCT user_id,
         CASE WHEN ({h}) % 100 < 80 THEN 'train'
              WHEN ({h}) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM events),
c AS (SELECT user_id, count(*) AS n_splits FROM a GROUP BY user_id)
SELECT n_splits, CAST(count(*) AS BIGINT) AS n_convs FROM c GROUP BY n_splits
"""


SPLIT_LEAK_AUDIT_SQL = _split_leak_sql()


def conv_turn_histogram(sf_dir: str):
    """Conversation-length distribution: how many conversations have
    exactly N turns — the two-level aggregate (per-conv count, then
    histogram of counts) every transcript-curation job starts with. The
    conv-level count fuses into the transcript bucket pass; the second
    level is a tiny partial+Sum."""
    from fhirflat_ray.functions.util import agg_select

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("conv_id", sort=False).size()
        return pd.DataFrame({"n_turns": c.to_numpy(np.int64)})

    partial = _transcript_grouped(sf_dir, counts, columns=["conv_id"])

    empty = pa.schema([("n_turns", pa.int64()), ("n_convs", pa.int64())])

    def hist_partial(b: pa.Table) -> pa.Table:
        # groupby pipelines can emit SCHEMA-LESS empty blocks
        if b.num_rows == 0 or "n_turns" not in b.column_names:
            return empty.empty_table()
        g = b.group_by(["n_turns"]).aggregate([([], "count_all")])
        return agg_select(g, {"n_turns": "n_turns", "count_all": "n_convs"})

    from ray.data.aggregate import Sum

    return (
        partial.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_turns")
        .aggregate(Sum("n_convs", alias_name="n_convs"))
    )


CONV_TURN_HISTOGRAM_SQL = f"""
SELECT n_turns, count(*) AS n_convs FROM (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
  FROM ({TRANSCRIPT_BUILD_SQL}) GROUP BY conv_id
) GROUP BY n_turns
"""


def value_zscore_by_type(sf_dir: str):
    """Per-group standardization (feature engineering): each event's value
    z-scored against ITS TYPE's population mean/std.

    Scale shape: one tiny moment aggregate per type (partial+Sum — the
    corpus never shuffles), broadcast of the bounded stats table, then a
    MAP-ONLY standardization pass. The z formula is written expression-
    for-expression in the SQL oracle and rounded to 6dp."""
    import ray

    from fhirflat_ray.functions.util import agg_select, collect_small_table
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moment_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "v": b["value"],
                "vv": pc.multiply(b["value"], b["value"]),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("v", "sum"), ("vv", "sum"), ([], "count_all")]
        )
        return agg_select(
            g,
            {"event_type": "event_type", "v_sum": "s", "vv_sum": "ss", "count_all": "n"},
        )

    stats = collect_small_table(
        ds.map_batches(moment_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("s", alias_name="s"), Sum("n", alias_name="n"), Sum("ss", alias_name="ss")
        )
    ).to_pandas()
    stats["mean"] = stats["s"] / stats["n"]
    stats["sd"] = np.sqrt(stats["ss"] / stats["n"] - stats["mean"] * stats["mean"])
    ref = ray.put(
        {
            r["event_type"]: (float(r["mean"]), float(r["sd"]))
            for _, r in stats.iterrows()
        }
    )

    def z(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        types = b["event_type"].to_numpy(zero_copy_only=False)
        keys = np.array(sorted(m))
        means = np.array([m[k][0] for k in keys])
        sds = np.array([m[k][1] for k in keys])
        pos = np.searchsorted(keys, types)
        v = b["value"].to_numpy(zero_copy_only=False)
        zv = (v - means[pos]) / sds[pos]
        return pa.table(
            {
                "event_id": b["event_id"],
                "z": pa.array(np.round(zv, 6), pa.float64()),
            }
        )

    return ds.map_batches(z, batch_format="pyarrow")


VALUE_ZSCORE_BY_TYPE_SQL = """
WITH m AS (
  SELECT event_type, sum(value) AS s, count(*) AS n, sum(value * value) AS ss
  FROM events GROUP BY event_type
)
SELECT e.event_id,
       round((e.value - (m.s / m.n)) /
             sqrt(m.ss / m.n - (m.s / m.n) * (m.s / m.n)), 6) AS z
FROM events e JOIN m USING (event_type)
"""


def leakfree_split(sf_dir: str):
    """Leakage-free train/val/test split at CONVERSATION granularity:
    every turn of a conversation lands in the same split (assignment
    hashes the conv key, not the row), so no conversation straddles
    train and eval — the grouping-aware split a transcript pipeline
    must use instead of row-level sampling. Output per split: distinct
    conversations and total turns.

    Scale shape: assignment is map-only (shared int64 hash); the per-split
    conv count is a two-level distinct (distinct (split, user) pairs via
    one narrow shuffle, then size-per-group)."""
    from fhirflat_ray.functions.sampling import hash32
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id"])

    def assign(b: pa.Table) -> pa.Table:
        ids = b["user_id"].to_numpy(zero_copy_only=False)
        h = hash32(ids) % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table(
            {
                "split": pa.array(split, pa.string()),
                "user_id": b["user_id"],
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def pair_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["split", "user_id"]).aggregate([([], "count_all")])
        return agg_select(
            g, {"split": "split", "user_id": "user_id", "count_all": "n"}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        per_user = g.groupby(["split", "user_id"], sort=False, as_index=False).agg(
            n=("n", "sum")
        )
        out = per_user.groupby("split", sort=False).agg(
            n_convs=("user_id", "size"), n_turns=("n", "sum")
        )
        return out.reset_index()

    pairs = bucketed_map_groups(
        assigned.map_batches(pair_partial, batch_format="pyarrow"),
        ["user_id"],
        combine,
    )

    from ray.data.aggregate import Sum

    return (
        pairs.groupby("split")
        .aggregate(
            Sum("n_convs", alias_name="n_convs"), Sum("n_turns", alias_name="n_turns")
        )
    )


def _leakfree_split_sql() -> str:
    from fhirflat_ray.functions.sampling import hash32_sql

    h = hash32_sql("user_id")
    return f"""
WITH a AS (
  SELECT user_id,
         CASE WHEN ({h}) % 100 < 80 THEN 'train'
              WHEN ({h}) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM events
)
SELECT split, count(DISTINCT user_id) AS n_convs, count(*) AS n_turns
FROM a GROUP BY split
"""


# =====================================================================
# Wave 17: co-occurrence mining + rolling-window distinct counts
# =====================================================================


def type_cooccurrence(sf_dir: str):
    """Basket co-occurrence mining: for every unordered pair of event
    types that fire for the SAME user on the SAME day, the number of
    (user, day) baskets containing both — the association-rule input for
    recommendation/affinity analysis.

    Scale shape: ONE user-bucket shuffle; inside a bucket the basket
    self-join is a vectorized pandas merge over the (user, day, type)
    DISTINCT set (baskets are small — pairs per basket are bounded by the
    type vocabulary squared), emitting per-bucket partial pair counts."""
    from fhirflat_ray.functions.util import bucketed_map_groups
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "u": g["user_id"].to_numpy(),
                "day": g["ts"].to_numpy().astype("datetime64[D]"),
                "t": g["event_type"].to_numpy(),
            }
        ).drop_duplicates()
        j = d.merge(d, on=["u", "day"])
        j = j[j["t_x"] < j["t_y"]]
        out = (
            j.groupby(["t_x", "t_y"], sort=False)
            .size()
            .rename("n_baskets")
            .reset_index()
            .rename(columns={"t_x": "type_a", "t_y": "type_b"})
        )
        out["n_baskets"] = out["n_baskets"].astype(np.int64)
        return out

    partial = bucketed_map_groups(ds, ["user_id"], per_bucket)
    return partial.groupby(["type_a", "type_b"]).aggregate(
        Sum("n_baskets", alias_name="n_baskets")
    )


TYPE_COOCCURRENCE_SQL = """
WITH b AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type FROM events
)
SELECT a.event_type AS type_a, c.event_type AS type_b, count(*) AS n_baskets
FROM b a JOIN b c
  ON a.user_id = c.user_id AND a.day = c.day AND a.event_type < c.event_type
GROUP BY 1, 2
"""


def weekly_active_users(sf_dir: str):
    """Rolling 7-day distinct active users per day (the DAU/WAU board
    metric) — an exact rolling COUNT DISTINCT, which no plain windowed sum
    can produce.

    Scale shape: events first dedupe to (user, active-day) pairs (one
    narrow shuffle); each pair then fans out to the ≤7 report days whose
    trailing window contains it (map-only, bounded 7x expansion of the
    ALREADY-deduped pairs — never raw events); a second distinct on
    (report_day, user) + size-per-group finishes. Report days are
    restricted to the observed day range."""
    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        distinct_rows,
    )
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    mm = ds.aggregate(Min("ts"), Max("ts"))
    day_us = 86_400_000_000
    lo_day = int(pd.Timestamp(mm["min(ts)"]).value // 1000) // day_us
    hi_day = int(pd.Timestamp(mm["max(ts)"]).value // 1000) // day_us

    def to_days(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(ts // day_us, pa.int64()),
            }
        )

    pairs = distinct_rows(
        ds.map_batches(to_days, batch_format="pyarrow"), ["user_id", "day"]
    )

    def fan_out(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        d = b["day"].to_numpy(zero_copy_only=False)
        n = len(u)
        rep = np.repeat(np.arange(n, dtype=np.int64), 7)
        w = d[rep] + np.tile(np.arange(7, dtype=np.int64), n)
        keep = w <= hi_day
        return pa.table(
            {
                "report_day": pa.array(w[keep], pa.int64()),
                "user_id": pa.array(u[rep][keep], pa.int64()),
            }
        )

    windowed = distinct_rows(
        pairs.map_batches(fan_out, batch_format="pyarrow"),
        ["report_day", "user_id"],
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["report_day"]).aggregate([([], "count_all")])
        return agg_select(g, {"report_day": "report_day", "count_all": "wau"})

    out = (
        windowed.map_batches(partial, batch_format="pyarrow")
        .groupby("report_day")
        .aggregate(Sum("wau", alias_name="wau"))
    )

    def to_ts(b: pa.Table) -> pa.Table:
        d = b["report_day"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "report_day": pa.array(
                    (d * day_us).astype("datetime64[us]"), pa.timestamp("us")
                ),
                "wau": b["wau"],
            }
        )

    return out.map_batches(to_ts, batch_format="pyarrow")


WEEKLY_ACTIVE_USERS_SQL = """
WITH p AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
     bounds AS (SELECT max(date_trunc('day', ts)) AS hi FROM events),
     f AS (
       SELECT p.user_id, p.day + to_days(CAST(s.i AS INTEGER)) AS report_day
       FROM p, generate_series(0, 6) s(i), bounds
       WHERE p.day + to_days(CAST(s.i AS INTEGER)) <= bounds.hi
     )
SELECT CAST(report_day AS TIMESTAMP) AS report_day,
       count(DISTINCT user_id) AS wau
FROM f GROUP BY 1
"""


# =====================================================================
# Wave 18: cyclic date-part seasonality + global quantile bucketing
# =====================================================================


def orders_monthly_seasonality(sf_dir: str):
    """Cyclic seasonality rollup: order volume and revenue by calendar
    MONTH-OF-YEAR across all years (the cyclic date-part group that
    calendar-truncation windows cannot express). Map-only partials with
    integer cents; 12-row result."""
    from fhirflat_ray.functions.util import agg_select
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        month = pc.cast(pc.month(b["o_orderdate"]), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], pa.scalar(100.0)), 0), pa.int64()
        )
        t = pa.table({"month": month, "cents": cents})
        g = t.group_by(["month"]).aggregate([([], "count_all"), ("cents", "sum")])
        return agg_select(
            g, {"month": "month", "count_all": "n_orders", "cents_sum": "rev_cents"}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("rev_cents", alias_name="rev_cents"),
        )
    )


ORDERS_MONTHLY_SEASONALITY_SQL = """
SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
FROM orders GROUP BY 1
"""


def user_ltv_deciles(sf_dir: str):
    """Global quantile bucketing: users ranked by lifetime value (total
    event value, integer cents) and NTILE'd into 10 deciles; per decile
    the user count and total cents.

    Scale shape: per-user totals via one bucketed aggregate; the GLOBAL
    rank comes from the distributed prefix scan ordered by (cents,
    user_id) — cents-range buckets replace a global sort — and the NTILE
    boundary is integer arithmetic on (rank, N), mirrored exactly in
    SQL's first-(n%k)-tiles-larger rule."""
    from fhirflat_ray.functions.util import agg_select, bucketed_map_groups
    from fhirflat_ray.functions.windows import global_running
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["value"], pa.scalar(100.0)), 0), pa.int64()
        )
        t = pa.table({"user_id": b["user_id"], "cents": cents})
        g = t.group_by(["user_id"]).aggregate([("cents", "sum")])
        return agg_select(g, {"user_id": "user_id", "cents_sum": "cents"})

    # materialize: count() plus the prefix scan's two passes would
    # otherwise re-run the bucketed aggregate three times (shuffle-audit
    # finding); pinned, the count is free metadata
    per_user = bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        lambda g: g.groupby("user_id", sort=False, as_index=False).agg(
            cents=("cents", "sum")
        ),
    ).materialize()
    n_users = per_user.count()

    ranked = global_running(
        per_user,
        ts_col="cents",
        tiebreak_col="user_id",
        sum_cols=[],
        max_cols=[],
        bucket_width_us=1 << 14,  # cents-range buckets (LTVs span ~10^5-10^6)
    )

    def decile_partial(b: pa.Table) -> pa.Table:
        rn = b["rn"].to_numpy(zero_copy_only=False)
        # SQL NTILE(10): first (n % 10) tiles get ceil(n/10) rows
        n, k = n_users, 10
        big = n % k
        size_big = -(-n // k)
        size_small = n // k
        cut = big * size_big
        dec = np.where(
            rn <= cut,
            (rn - 1) // max(1, size_big) + 1,
            big + (rn - cut - 1) // max(1, size_small) + 1,
        ).astype(np.int64)
        t = pa.table({"decile": pa.array(dec, pa.int64()), "cents": b["cents"]})
        g = t.group_by(["decile"]).aggregate([([], "count_all"), ("cents", "sum")])
        from fhirflat_ray.functions.util import agg_select as sel

        return sel(
            g, {"decile": "decile", "count_all": "n_users", "cents_sum": "ltv_cents"}
        )

    return (
        ranked.map_batches(decile_partial, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("ltv_cents", alias_name="ltv_cents"),
        )
    )


USER_LTV_DECILES_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
r AS (SELECT user_id, cents, ntile(10) OVER (ORDER BY cents, user_id) AS decile FROM u)
SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_users,
       CAST(sum(cents) AS BIGINT) AS ltv_cents
FROM r GROUP BY decile
"""


# =====================================================================
# Wave 19: first-touch attribution + derived-column exact quantiles
# =====================================================================


def first_touch_attribution(sf_dir: str):
    """First-touch attribution: every user's purchase revenue attributed
    to the event type of their FIRST event (ordered by ts, event_id) —
    the marketing-attribution rollup.

    Scale shape: ONE user-bucket shuffle; inside the bucket the first
    event per user and the per-user purchase cents are two vectorized
    groupby passes, emitting one (first_type, cents) partial row per
    user; a tiny Sum finishes."""
    from fhirflat_ray.functions.util import bucketed_map_groups
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"]
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = g.drop_duplicates("user_id")[["user_id", "event_type"]].rename(
            columns={"event_type": "first_type"}
        )
        cents = np.rint(g["value"].to_numpy() * 100.0).astype(np.int64)
        rev = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"],
                    "c": np.where(g["event_type"].to_numpy() == "purchase", cents, 0),
                }
            )
            .groupby("user_id", sort=False, as_index=False)
            .agg(c=("c", "sum"))
        )
        m = first.merge(rev, on="user_id")
        out = m.groupby("first_type", sort=False).agg(
            n_users=("user_id", "size"), attributed_cents=("c", "sum")
        )
        out = out.reset_index()
        out["n_users"] = out["n_users"].astype(np.int64)
        out["attributed_cents"] = out["attributed_cents"].astype(np.int64)
        return out

    partial = bucketed_map_groups(ds, ["user_id"], per_bucket)
    return partial.groupby("first_type").aggregate(
        Sum("n_users", alias_name="n_users"),
        Sum("attributed_cents", alias_name="attributed_cents"),
    )


FIRST_TOUCH_ATTRIBUTION_SQL = """
WITH f AS (
  SELECT user_id,
         first_value(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS first_type
  FROM events QUALIFY row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) = 1
),
r AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS c
  FROM events GROUP BY user_id
)
SELECT f.first_type, count(*) AS n_users,
       CAST(sum(r.c) AS BIGINT) AS attributed_cents
FROM f JOIN r USING (user_id)
GROUP BY f.first_type
"""


def gap_quantiles(sf_dir: str):
    """Exact quantiles of a DERIVED column: p50/p90/p99 of the
    microsecond gap between a user's consecutive events. The gap
    derivation is one user-bucket shuffle (vectorized shift per bucket);
    the quantiles then run as distributed value counts over the derived
    stream (``functions/quantiles.quantile_disc`` — DuckDB
    ``quantile_disc`` position semantics)."""
    from fhirflat_ray.functions.quantiles import quantile_disc
    from fhirflat_ray.functions.util import bucketed_map_groups

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.concatenate([[False], u[1:] == u[:-1]])
        gap = np.concatenate([[0], t[1:] - t[:-1]])
        return pd.DataFrame({"gap_us": gap[same].astype(np.float64)})

    gaps = bucketed_map_groups(ds, ["user_id"], per_bucket)
    return quantile_disc(gaps, "gap_us", [0.5, 0.9, 0.99])


GAP_QUANTILES_SQL = """
WITH g AS (
  SELECT CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id)) AS DOUBLE) AS gap_us
  FROM events
), v AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL)
SELECT 0.5 AS q, quantile_disc(gap_us, 0.5) AS value FROM v
UNION ALL
SELECT 0.9 AS q, quantile_disc(gap_us, 0.9) AS value FROM v
UNION ALL
SELECT 0.99 AS q, quantile_disc(gap_us, 0.99) AS value FROM v
"""


# =====================================================================
# Wave 20: flagship transcript-curation composition
# =====================================================================

_PREP_BUDGET = 64  # tokens per packed training chunk


def transcript_prep(sf_dir: str):
    """FLAGSHIP transcript curation, end to end in one streaming pipeline
    (the payload-native sibling of ``corpus_prep``): build transcripts →
    keep only STRICTLY ALTERNATING dialogues → conversation-level exact
    dedup (min conv survives) → per-conversation token totals + packed
    chunk counts at a fixed context budget.

    Scale shape: ONE user-bucket pass derives per-conversation content
    hash, alternation breaks, and token totals (everything fused into the
    transcript build — no second corpus shuffle); the dedup ships only
    (hash, conv, tokens) through one narrow keep-min shuffle. The whole
    multi-stage composition sits under a single SQL oracle."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        import pandas.util as pdu

        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        role = g["role"].to_numpy()
        same_conv = np.concatenate([[False], conv[1:] == conv[:-1]])
        brk = (same_conv & (role == np.concatenate([[""], role[:-1]]))).astype(np.int64)
        toks = (
            pd.Series(g["text"].to_numpy()).str.count(r"\S+").to_numpy(np.int64)
        )
        content = pd.Series(role).str.cat(pd.Series(g["text"].to_numpy()), sep="|")
        d = pd.DataFrame(
            {"conv_id": conv, "brk": brk, "tok": toks, "piece": content}
        )
        agg = d.groupby("conv_id", sort=False).agg(
            breaks=("brk", "sum"),
            n_turns=("brk", "size"),
            n_tokens=("tok", "sum"),
            content=("piece", lambda s: "\x1f".join(s)),
        )
        agg = agg.reset_index()
        h = (
            pdu.hash_array(agg["content"].to_numpy(object)) >> np.uint64(1)
        ).astype(np.int64)
        # dialogue-quality gate: fewer than half the turns break alternation
        keep = (agg["breaks"].to_numpy() * 2 < agg["n_turns"].to_numpy())
        out = agg[keep][["conv_id", "n_tokens"]].copy()
        out["h"] = h[keep]
        out["n_tokens"] = out["n_tokens"].astype(np.int64)
        return out[["h", "conv_id", "n_tokens"]]

    convs = _transcript_grouped(
        sf_dir, per_conv, columns=["conv_id", "turn_idx", "role", "text"]
    )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "conv_id"], kind="mergesort").drop_duplicates("h")
        out = g[["conv_id", "n_tokens"]].copy()
        out["n_chunks"] = (out["n_tokens"] + _PREP_BUDGET - 1) // _PREP_BUDGET
        return out

    return bucketed_map_groups(convs, ["h"], keep_min)


TRANSCRIPT_PREP_SQL = f"""
WITH t AS ({TRANSCRIPT_BUILD_SQL}),
per_turn AS (
  SELECT conv_id, turn_idx, role, text,
         CASE WHEN role = lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              THEN 1 ELSE 0 END AS brk,
         length(regexp_extract_all(text, '\\S+')) AS tok
  FROM t
),
per_conv AS (
  SELECT conv_id,
         CAST(sum(brk) AS BIGINT) AS breaks,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(tok) AS BIGINT) AS n_tokens,
         string_agg(role || '|' || text, chr(31) ORDER BY turn_idx) AS content
  FROM per_turn GROUP BY conv_id
),
clean AS (SELECT * FROM per_conv WHERE breaks * 2 < n_turns),
dedup AS (
  SELECT conv_id, n_tokens,
         min(conv_id) OVER (PARTITION BY content) AS canon
  FROM clean
)
SELECT conv_id, n_tokens,
       CAST((n_tokens + {_PREP_BUDGET} - 1) // {_PREP_BUDGET} AS BIGINT) AS n_chunks
FROM dedup WHERE conv_id = canon
"""


# =====================================================================
# TPC-H join-shape breadth: Q6 / Q7 / Q10 / Q15
# =====================================================================


def q6_revenue_delta(sf_dir: str):
    """TPC-H Q6 shape: forecasting-revenue-change — a pure predicate scan
    with ONE global sum, no join, no shuffle (map-only partials folded on
    the driver). Filters compare exact integer basis points, never floats;
    the summed quantity is exact integer cents×bp per row."""
    import datetime as dt

    from fhirflat_ray.functions.util import collect_small_table

    lo = pa.scalar(dt.datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1998, 1, 1), pa.timestamp("us"))

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        disc_bp = pc.cast(
            pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0)), 0), pa.int64()
        )
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi)
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc_bp, pa.scalar(2, pa.int64())),
                    pc.less_equal(disc_bp, pa.scalar(4, pa.int64())),
                ),
                pc.less(b["l_quantity"], pa.scalar(24.0)),
            ),
        )
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)), 0),
            pa.int64(),
        )
        # revenue = extendedprice * discount, in cents×bp units
        rev = pc.multiply(cents, disc_bp).filter(keep)
        n = pc.sum(pc.cast(keep, pa.int64())).as_py() or 0
        return pa.table(
            {
                "rev_bp": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    t = collect_small_table(li.map_batches(partial, batch_format="pyarrow"))
    rev = int(pc.sum(t["rev_bp"]).as_py() or 0)
    n = int(pc.sum(t["n"]).as_py() or 0)
    return pd.DataFrame([(rev, n)], columns=["revenue_bp", "n_items"])


Q6_REVENUE_DELTA_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_bp,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 2 AND 4
  AND l_quantity < 24
"""


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape (national market share): for PROMO-type parts sold
    to ASIA customers during 1995-1996, the yearly revenue of
    NATION_3-supplied line items vs the total — emitted as the two exact
    integer cents×bp sums (the ratio is the consumer's; a rounded share
    can tie on 1e-6 halves).

    Scale shape: the PROMO part-key set and the supplier→nation and
    nation→region maps broadcast (dim-bounded, with the standard budget
    assumption); customers prune to the region BEFORE their hash join
    with date-filtered orders; lineitem prunes map-only on the part
    bloom/broadcast set, hash-joins orders once, and folds a ≤ 2-year
    partial. One distributed join on the fact table."""
    import datetime as dt

    import ray

    from fhirflat_ray.functions.util import agg_select, collect_small_table

    n_parts = _join_partitions(sf_dir, ["lineitem", "orders"])

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    asia = int(
        region["r_regionkey"].to_numpy(zero_copy_only=False)[
            np.array(region["r_name"].to_pylist()) == "ASIA"
        ][0]
    )
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    asia_nations = pa.array(
        sorted(
            nk[
                nation["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
                == asia
            ].tolist()
        ),
        pa.int64(),
    )
    target_nk = int(nk[np.array(nation["n_name"].to_pylist()) == "NATION_3"][0])

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    promo_keys = np.sort(
        part["p_partkey"].to_numpy(zero_copy_only=False)[
            np.array(part["p_type"].to_pylist()) == "PROMO"
        ].astype(np.int64)
    )

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    s_keys = np.sort(supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    s_order = np.argsort(supp["s_suppkey"].to_numpy(zero_copy_only=False))
    s_nk = (
        supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)[s_order]
    )
    sref = ray.put((s_keys, s_nk, promo_keys))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda b: b.select(["c_custkey"]).filter(
            pc.is_in(b["c_nationkey"].cast(pa.int64()), value_set=asia_nations)
        ),
        batch_format="pyarrow",
    ).repartition(2)

    lo = pa.scalar(dt.datetime(1995, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1997, 1, 1), pa.timestamp("us"))
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(b: pa.Table) -> pa.Table:
        keep = b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
            )
        )
        return pa.table(
            {
                "o_orderkey": keep["o_orderkey"],
                "o_custkey": keep["o_custkey"],
                "o_year": pc.cast(pc.year(keep["o_orderdate"]), pa.int64()),
            }
        )

    o_pruned = (
        orders.map_batches(o_prep, batch_format="pyarrow")
        .join(cust, "inner", n_parts, on=("o_custkey",), right_on=("c_custkey",))
        .select_columns(["o_orderkey", "o_year"])
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    class LiPrep:
        def __init__(self, ref):
            self.s_keys, self.s_nk, self.promo = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.promo, pk), 0, max(0, len(self.promo) - 1))
            keep_m = self.promo[pos] == pk if len(self.promo) else np.zeros(len(pk), bool)
            keep = b.filter(pa.array(keep_m))
            sk = keep["l_suppkey"].to_numpy(zero_copy_only=False)
            s_nk = self.s_nk[np.searchsorted(self.s_keys, sk)]
            return pa.table(
                {
                    "l_orderkey": keep["l_orderkey"],
                    "is_target": pa.array(s_nk == target_nk),
                    "rev_bp": _revenue_cents_bp(keep),
                }
            )

    from fhirflat_ray.functions.util import worker_cached_stage

    j = li.map_batches(
        worker_cached_stage(LiPrep, ref=sref), batch_format="pyarrow"
    ).join(o_pruned, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        g = (
            b.select(["o_year", "is_target", "rev_bp"])
            .group_by(["o_year", "is_target"])
            .aggregate([("rev_bp", "sum")])
        )
        return agg_select(
            g, {"o_year": "o_year", "is_target": "is_target", "rev_bp_sum": "rev_bp"}
        )

    t = collect_small_table(j.map_batches(partial, batch_format="pyarrow"))
    df = (
        t.to_pandas()
        .groupby(["o_year", "is_target"], as_index=False)["rev_bp"]
        .sum()
    )
    out = []
    for y, sub in df.groupby("o_year"):
        tgt = int(sub.loc[sub.is_target, "rev_bp"].sum())
        tot = int(sub["rev_bp"].sum())
        out.append((int(y), tgt, tot))
    return pd.DataFrame(
        out, columns=["o_year", "nation_bp", "total_bp"]
    ).sort_values("o_year").reset_index(drop=True)


Q8_MARKET_SHARE_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN ns.n_name = 'NATION_3' THEN {_REV_BP_SQL} ELSE 0 END)
            AS BIGINT) AS nation_bp,
       CAST(sum({_REV_BP_SQL}) AS BIGINT) AS total_bp
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ns ON ns.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
JOIN region ON r_regionkey = nc.n_regionkey AND r_name = 'ASIA'
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_year
"""


def q21_blame_suppliers(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    this schema ("late" = shipped more than 90 days after the order
    date): count, per supplier, the multi-supplier orders where THIS
    supplier shipped late and NO other supplier did — the classic
    EXISTS + NOT EXISTS double-correlated join.

    Scale shape: both correlations collapse into ONE order-bucket
    aggregate — per (order, supplier) partials (any-late, line count)
    shuffle once on the order key, and a vectorized per-bucket pass
    derives each order's supplier count and late-supplier count, then
    emits blame rows only for orders with ≥ 2 suppliers and EXACTLY one
    late supplier. Top-10 suppliers by (count DESC, suppkey)."""
    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        default_num_buckets,
        streaming_topk,
    )

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    n_parts = _join_partitions(sf_dir, ["lineitem", "orders"])

    j = li.join(orders, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        late = pc.greater(
            pc.cast(b["l_shipdate"], pa.int64()),
            pc.add(
                pc.cast(b["o_orderdate"], pa.int64()),
                pa.scalar(90 * 24 * 3600 * 1_000_000, pa.int64()),
            ),
        )
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "late": pc.cast(late, pa.int64()),
            }
        )
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("late", "max")])
        return agg_select(
            g,
            {"l_orderkey": "l_orderkey", "l_suppkey": "l_suppkey", "late_max": "late"},
        )

    per_os = j.map_batches(partial, batch_format="pyarrow")

    def blame(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["l_orderkey", "l_suppkey"], sort=False, as_index=False).agg(
            late=("late", "max")
        )
        n_supp = g.groupby("l_orderkey", sort=False)["l_suppkey"].transform("size")
        n_late = g.groupby("l_orderkey", sort=False)["late"].transform("sum")
        keep = (g["late"] == 1) & (n_supp.to_numpy() >= 2) & (n_late.to_numpy() == 1)
        out = g.loc[keep, ["l_suppkey"]]
        return out.groupby("l_suppkey", sort=False, as_index=False).size().rename(
            columns={"size": "numwait"}
        )

    partials = bucketed_map_groups(
        per_os, ["l_orderkey"], blame,
        num_buckets=max(n_parts, default_num_buckets()),
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_suppkey", sort=False, as_index=False).agg(
            numwait=("numwait", "sum")
        )

    totals = bucketed_map_groups(partials, ["l_suppkey"], fold)

    def typed(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
                "numwait": pc.cast(b["numwait"], pa.int64()),
            }
        )

    return streaming_topk(
        totals.map_batches(typed, batch_format="pyarrow"),
        ["numwait", "l_suppkey"],
        10,
        descending=[True, False],
    )


Q21_BLAME_SUPPLIERS_SQL = """
WITH os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY l_orderkey, l_suppkey),
blame AS (
  SELECT l_suppkey, count(*) AS numwait FROM (
    SELECT l_orderkey, l_suppkey, late,
           count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
           sum(late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM os)
  WHERE late = 1 AND n_supp >= 2 AND n_late = 1
  GROUP BY l_suppkey)
SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, CAST(numwait AS BIGINT) AS numwait
FROM blame ORDER BY numwait DESC, l_suppkey LIMIT 10
"""


def open_orders_daily(sf_dir: str):
    """Sweep-line interval counting: how many orders are OPEN on each day
    (an order stays open 30 days from placement) — the backlog time
    series an ops dashboard plots. Each order emits a +1 at its start day
    and a -1 at its end day (map-only); the deltas fold into the BOUNDED
    day grid and one driver prefix-sum converts deltas to levels — the
    interval-stabbing shape that never joins intervals against days.
    Integer outputs."""
    from fhirflat_ray.functions.util import agg_select, collect_small_table

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def deltas(b: pa.Table) -> pa.Table:
        d = (
            pc.cast(pc.floor_temporal(b["o_orderdate"], unit="day"), pa.date32())
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        days = np.concatenate([d, d + 30])
        sign = np.concatenate(
            [np.ones(len(d), np.int64), -np.ones(len(d), np.int64)]
        )
        g = (
            pd.DataFrame({"day": days, "delta": sign})
            .groupby("day", sort=False, as_index=False)["delta"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    t = collect_small_table(ds.map_batches(deltas, batch_format="pyarrow"))
    df = t.to_pandas().groupby("day", as_index=False)["delta"].sum().sort_values("day")
    level = df["delta"].cumsum().to_numpy(np.int64)
    # report only days where the level CHANGES (the compact event form),
    # excluding the trailing zero after the last close
    days = df["day"].to_numpy(np.int64)
    return pa.table(
        {
            "day": pa.array(days.astype("datetime64[D]"), pa.date32()).cast(
                pa.timestamp("us")
            ),
            "n_open": pa.array(level, pa.int64()),
        }
    )


OPEN_ORDERS_DAILY_SQL = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
  UNION ALL
  SELECT CAST(o_orderdate AS DATE) + 30, -1 FROM orders),
g AS (SELECT day, sum(delta) AS delta FROM d GROUP BY day)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) AS n_open
FROM g ORDER BY day
"""


def brand_return_rate(sf_dir: str):
    """Return-rate report by part brand: per brand, line items and how
    many came back (l_returnflag = 'R') — integer counts via one
    fact-side hash join against the brand dimension (aggregate-after-join
    with per-batch partials)."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import agg_select

    n_parts = _join_partitions(sf_dir, ["lineitem"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_returnflag"])

    j = li.join(part, "inner", n_parts, on=("l_partkey",), right_on=("p_partkey",))

    def partial(b: pa.Table) -> pa.Table:
        ret = pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())
        t = pa.table({"p_brand": b["p_brand"], "ret": ret})
        g = t.group_by(["p_brand"]).aggregate([("ret", "sum"), ([], "count_all")])
        return agg_select(
            g, {"p_brand": "p_brand", "count_all": "n", "ret_sum": "n_returned"}
        )

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("n", alias_name="n"), Sum("n_returned", alias_name="n_returned"))
    )


BRAND_RETURN_RATE_SQL = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_brand
"""


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape: shipping volume between two nations by direction and
    year. Scale shape: supplier and customer prune to the two nations at
    the READ (map-only `is_in` filter on a 2-key set — both sides shrink
    ~12.5x before any exchange); lineitem carries exact cents×bp revenue
    plus ship year through two distributed hash joins (supplier, then
    orders→customer pre-joined on the pruned customer side); the final
    aggregate has ≤ 2×years groups — Arrow partial per batch, driver fold.
    Nation names come from a 25-row broadcast dict, never a join."""
    import datetime as dt

    from fhirflat_ray.functions.util import collect_small_table

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    name_by_key = dict(
        zip(
            nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(int).tolist(),
            nation["n_name"].to_pylist(),
        )
    )
    pair = [k for k, v in name_by_key.items() if v in ("NATION_3", "NATION_8")]
    key_set = pa.array(sorted(pair), pa.int64())

    lo = pa.scalar(dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1998, 1, 1), pa.timestamp("us"))
    n_parts = _join_partitions(sf_dir, ["lineitem", "orders"])

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.map_batches(
        lambda b: pa.table(
            {
                "s_suppkey": b["s_suppkey"],
                "supp_nk": b["s_nationkey"].cast(pa.int64()),
            }
        ).filter(pc.is_in(b["s_nationkey"].cast(pa.int64()), value_set=key_set)),
        batch_format="pyarrow",
    ).repartition(2)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"],
                "cust_nk": b["c_nationkey"].cast(pa.int64()),
            }
        ).filter(pc.is_in(b["c_nationkey"].cast(pa.int64()), value_set=key_set)),
        batch_format="pyarrow",
    ).repartition(2)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    o_c = orders.join(
        cust, "inner", n_parts, on=("o_custkey",), right_on=("c_custkey",)
    ).select_columns(["o_orderkey", "cust_nk"])

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        keep = b.filter(
            pc.and_(pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi))
        )
        return pa.table(
            {
                "l_orderkey": keep["l_orderkey"],
                "l_suppkey": keep["l_suppkey"],
                "l_year": pc.cast(pc.year(keep["l_shipdate"]), pa.int64()),
                "rev_bp": _revenue_cents_bp(keep),
            }
        )

    j = li.map_batches(li_prep, batch_format="pyarrow").join(
        supp, "inner", n_parts, on=("l_suppkey",), right_on=("s_suppkey",)
    )
    j2 = j.join(o_c, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        # keep only cross-nation flows (the two directions of the pair)
        keep = b.filter(pc.not_equal(b["supp_nk"], b["cust_nk"]))
        g = (
            pa.table(
                {
                    "supp_nk": keep["supp_nk"],
                    "cust_nk": keep["cust_nk"],
                    "l_year": keep["l_year"],
                    "rev_bp": keep["rev_bp"],
                }
            )
            .group_by(["supp_nk", "cust_nk", "l_year"])
            .aggregate([("rev_bp", "sum")])
        )
        from fhirflat_ray.functions.util import agg_select

        return agg_select(
            g,
            {
                "supp_nk": "supp_nk",
                "cust_nk": "cust_nk",
                "l_year": "l_year",
                "rev_bp_sum": "rev_bp",
            },
        )

    t = collect_small_table(j2.map_batches(partial, batch_format="pyarrow"))
    if t.num_rows == 0:
        return pd.DataFrame(
            columns=["supp_nation", "cust_nation", "l_year", "revenue_bp"]
        )
    df = (
        t.to_pandas()
        .groupby(["supp_nk", "cust_nk", "l_year"], as_index=False)["rev_bp"]
        .sum()
    )
    df["supp_nation"] = df["supp_nk"].map(name_by_key)
    df["cust_nation"] = df["cust_nk"].map(name_by_key)
    df = df.rename(columns={"rev_bp": "revenue_bp"})
    df["revenue_bp"] = df["revenue_bp"].astype(np.int64)
    df = df.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)
    return df[["supp_nation", "cust_nation", "l_year", "revenue_bp"]]


Q7_VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({_REV_BP_SQL}) AS BIGINT) AS revenue_bp
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey
  AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter. Scale shape: orders prune to the quarter and lineitem to
    returnflag='R' at the read; their join pre-aggregates to one row per
    (custkey) inside the bucket combine BEFORE customer attributes attach,
    so the attribute join moves |customers-with-returns| rows, not raw
    lineitems; nation names attach from a 25-row broadcast dict; the final
    top-20 is streaming per-block top-k, never a global sort."""
    import datetime as dt

    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        streaming_topk,
    )

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    name_by_key = dict(
        zip(
            nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(int).tolist(),
            nation["n_name"].to_pylist(),
        )
    )

    lo = pa.scalar(dt.datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1997, 4, 1), pa.timestamp("us"))
    n_parts = _join_partitions(sf_dir, ["lineitem", "orders", "customer"])

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["l_returnflag"], "R"))
        return pa.table(
            {"l_orderkey": keep["l_orderkey"], "rev_bp": _revenue_cents_bp(keep)}
        )

    j = li.map_batches(li_prep, batch_format="pyarrow").join(
        orders, "inner", n_parts, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({"o_custkey": b["o_custkey"], "rev_bp": b["rev_bp"]})
            .group_by(["o_custkey"])
            .aggregate([("rev_bp", "sum")])
        )
        return agg_select(g, {"o_custkey": "o_custkey", "rev_bp_sum": "rev_bp"})

    partials = j.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", sort=False, as_index=False)["rev_bp"].sum()
        out["rev_bp"] = out["rev_bp"].astype(np.int64)
        return out

    per_cust = bucketed_map_groups(partials, ["o_custkey"], final)

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    jc = per_cust.join(
        cust.repartition(max(2, n_parts // 2)),
        "inner",
        n_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    top = streaming_topk(jc, ["rev_bp", "o_custkey"], 20, descending=[True, False])
    df = top.to_pandas()
    df["n_name"] = df["c_nationkey"].astype(int).map(name_by_key)
    df = df.rename(columns={"o_custkey": "c_custkey", "rev_bp": "revenue_bp"})
    return df[["c_custkey", "c_name", "revenue_bp", "c_acctbal", "n_name"]]


Q10_RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name,
       CAST(sum({_REV_BP_SQL}) AS BIGINT) AS revenue_bp,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_bp DESC, c_custkey
LIMIT 20
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a quarter —
    an argmax over a derived aggregate (the `revenue0` view). Scale shape:
    lineitem prunes to the window at the read and pre-aggregates per
    suppkey (Arrow partial + coarse-bucket combine — one row per supplier
    survives); the global max folds from per-block maxima (map-only);
    only the argmax TIE SET (a handful of rows) is collected, and their
    names attach via a pruned `is_in` read of supplier — no join moves
    the supplier table."""
    import datetime as dt

    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        collect_small_table,
    )

    lo = pa.scalar(dt.datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(1997, 4, 1), pa.timestamp("us"))

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        keep = b.filter(
            pc.and_(pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi))
        )
        g = (
            pa.table({"l_suppkey": keep["l_suppkey"], "rev_bp": _revenue_cents_bp(keep)})
            .group_by(["l_suppkey"])
            .aggregate([("rev_bp", "sum")])
        )
        return agg_select(g, {"l_suppkey": "l_suppkey", "rev_bp_sum": "rev_bp"})

    partials = li.map_batches(li_prep, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_suppkey", sort=False, as_index=False)["rev_bp"].sum()
        out["rev_bp"] = out["rev_bp"].astype(np.int64)
        return out

    per_supp = bucketed_map_groups(partials, ["l_suppkey"], final)
    # pin: the per-supplier aggregate is read twice (max + filter) — without
    # materializing, the lazy upstream (shuffle included) re-executes per pass
    per_supp = per_supp.materialize()

    best = per_supp.max("rev_bp")

    def is_best(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["rev_bp"], pa.scalar(best, pa.int64())))

    winners = collect_small_table(per_supp.map_batches(is_best, batch_format="pyarrow"))
    keys = winners["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    supp = supp.filter(pc.is_in(supp["s_suppkey"], value_set=pa.array(keys, pa.int64())))
    df = winners.to_pandas().rename(columns={"l_suppkey": "s_suppkey"})
    df = df.merge(supp.to_pandas(), on="s_suppkey", how="inner")
    df = df.rename(columns={"rev_bp": "total_revenue_bp"})
    df = df.sort_values("s_suppkey").reset_index(drop=True)
    return df[["s_suppkey", "s_name", "total_revenue_bp"]]


Q15_TOP_SUPPLIER_SQL = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV_BP_SQL}) AS BIGINT) AS total_revenue_bp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_bp
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue_bp = (SELECT max(total_revenue_bp) FROM revenue0)
ORDER BY s_suppkey
"""


# =====================================================================
# Registry
# =====================================================================

QUERIES = {
    "transcript_build": transcript_build,
    "transcript_roundtrip": transcript_roundtrip,
    "events_roundtrip": events_roundtrip,
    "documents_roundtrip": documents_roundtrip,
    "embeddings_roundtrip": embeddings_roundtrip,
    "corpus_prep": corpus_prep,
    "transcript_prep": transcript_prep,
    "sft_export": sft_export,
    "curriculum_export": curriculum_export,
    "pruned_scan": pruned_scan,
    "pruned_scan_zorder": pruned_scan_zorder,
    "pruned_scan_dict": pruned_scan_dict,
    "role_counts_encoded": role_counts_encoded,
    "turn_sum_encoded": turn_sum_encoded,
    "schema_evolve": schema_evolve,
    "time_travel": time_travel,
    "incremental_counts": incremental_counts,
    "merge_events": merge_events,
    "delete_events": delete_events,
    "dedup_exact": dedup_exact,
    "dedup_exact_wave": dedup_exact_wave,
    "hash_join_wave": hash_join_wave,
    "group_agg_wave": group_agg_wave,
    "dedup_passage": dedup_passage,
    "dedup_near_exhaustive": dedup_near_exhaustive,
    "dedup_embedding": dedup_embedding,
    "dedup_embedding_auto": dedup_embedding_auto,
    "semantic_dedup": semantic_dedup,
    "knn_bruteforce": knn_bruteforce,
    "knn_quantized": knn_quantized,
    "knn_ivf_exhaustive": knn_ivf_exhaustive,
    "knn_ivf_persisted": knn_ivf_persisted,
    "kmeans_embeddings": kmeans_embeddings,
    "embed_cov": embed_cov,
    "q1_lineitem": q1_lineitem,
    "q3_top_orders": q3_top_orders,
    "q5_region_revenue": q5_region_revenue,
    "sorted_export_by_source": sorted_export_by_source,
    "knn_pq_adc": knn_pq_adc,
    "q21_blame_suppliers": q21_blame_suppliers,
    "asof_join": asof_join,
    "asof_join_bucketed": asof_join_bucketed,
    "tumbling_window": tumbling_window,
    "session_windows": session_windows,
    "fk_anti_join": fk_anti_join,
    "jaccard_join_exact": jaccard_join_exact,
    "token_count": token_count,
    "bpe_train": bpe_train,
    "bpe_tokenize": bpe_tokenize,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "fingerprint": fingerprint,
    "decontaminate": decontaminate_corpus,
    "bm25_search": bm25_search,
    "events_condense": events_condense,
    "distinct_users": distinct_users,
    "stats_profile": stats_profile,
    "rle_runs": rle_runs,
    "condense_codes": condense_codes,
    "turn_var_encoded": turn_var_encoded,
    "role_turn_sum_encoded": role_turn_sum_encoded,
    "role_tool_counts_encoded": role_tool_counts_encoded,
    "tool_vocab_encoded": tool_vocab_encoded,
    "ts_range_encoded": ts_range_encoded,
    "q6_revenue_delta": q6_revenue_delta,
    "q8_market_share": q8_market_share,
    "melt_events": melt_events,
    "date_format": date_format,
    "mapping_apply": mapping_apply,
    "dict_vocab": dict_vocab,
    "top_docs": top_docs,
    "chunk_docs": chunk_docs,
    "token_count_bpe": token_count_bpe,
    "poisson_sample": poisson_sample,
    "split_kl_divergence": split_kl_divergence,
    "value_trend_by_type": value_trend_by_type,
    "reach_3hop": reach_3hop,
    "hard_negatives": hard_negatives_mining,
    "mmr_select": mmr_diverse_select,
    "embed_quantize": embed_quantize,
    "validate_errors": validate_errors,
    "cross_validate_errors": cross_validate_errors,
    "schema_check": schema_check,
    "flatten_props": flatten_props,
    "sample_split": sample_split,
    "top_docs_per_lang": top_docs_per_lang,
    "range_join_agg": range_join_agg,
    "quantiles_qty": quantiles_qty,
    "hopping_window": hopping_window,
    "users_intersect": users_intersect,
    "users_except": users_except,
    "stratified_sample": stratified_sample,
    "q7_volume_shipping": q7_volume_shipping,
    "open_orders_daily": open_orders_daily,
    "brand_return_rate": brand_return_rate,
    "q10_returned_items": q10_returned_items,
    "q15_top_supplier": q15_top_supplier,
    "customer_order_counts": customer_order_counts,
    "nation_coverage_full_outer": nation_coverage_full_outer,
    "user_event_windows": user_event_windows,
    "user_value_ranks": user_value_ranks,
    "user_type_seq": user_type_seq,
    "weighted_sample": weighted_sample,
    "distinct_users_hll": distinct_users_hll,
    "heavy_hitters_cms": heavy_hitters_cms,
    "funnel_events": funnel_events,
    "pivot_user_events": pivot_user_events,
    "quantiles_by_type": quantiles_by_type,
    "revenue_rollup": revenue_rollup,
    "rolling_hour_sum": rolling_hour_sum,
    "label_centroids": label_centroids,
    "quantiles_cont_value": quantiles_cont_value,
    "media_features": media_features,
    "media_features_png": media_features_png,
    "media_features_gif": media_features_gif,
    "media_features_jpeg": media_features_jpeg,
    "audio_features_wav": audio_features_wav,
    "video_frame_features": video_frame_features,
    "nearest_eval_vec": nearest_eval_vec,
    "props_extract": props_extract,
    "conv_lookup": conv_lookup,
    "compacted_roundtrip": compacted_roundtrip,
    "context_pack": context_pack,
    "context_truncate": context_truncate,
    "turn_pairs": turn_pairs,
    "pii_scrub": pii_scrub,
    "repetition_flags": repetition_flags,
    "bigram_top": bigram_top,
    "term_stats": term_stats,
    "tfidf_top_terms": tfidf_top_terms,
    "doc_surprisal": doc_surprisal,
    "bigram_surprisal": bigram_surprisal,
    "conv_dedup": conv_dedup,
    "conv_stats": conv_stats,
    "role_tool_pmi": role_tool_pmi,
    "alternation_audit": alternation_audit,
    "sft_pack_examples": sft_pack_examples,
    "tool_transitions": tool_transitions,
    "tool_markov_stationary": tool_markov_stationary,
    "tool_entropy_rate": tool_entropy_rate,
    "tool_latency": tool_latency,
    "role_runs": role_runs,
    "gini_activity": gini_activity,
    "activity_streaks": activity_streaks,
    "weekly_delta": weekly_delta,
    "acf1_by_type": acf1_by_type,
    "moments_by_type": moments_by_type,
    "iqr_outliers": iqr_outliers,
    "conv_prefix_dedup": conv_prefix_dedup,
    "rolling_median3": rolling_median3,
    "q4_priority_exists": q4_priority_exists,
    "q13_order_distribution": q13_order_distribution,
    "q18_large_orders": q18_large_orders,
    "retention_cohorts": retention_cohorts,
    "value_histogram": value_histogram,
    "blocklist_filter": blocklist_filter,
    "embed_dim_stats": embed_dim_stats,
    "embed_outliers": embed_outliers,
    "logreg_train": logreg_train,
    "quality_scores": quality_scores,
    "lang_balance": lang_balance,
    "quality_confusion": quality_confusion,
    "quality_calibration": quality_calibration,
    "langid_confusion": langid_confusion,
    "psi_value_split": psi_value_split,
    "ks_value_split": ks_value_split,
    "degree_assortativity": degree_assortativity,
    "doc_clusters": doc_clusters,
    "triangles_coorder": triangles_coorder,
    "fuzzy_best_match": fuzzy_best_match,
    "source_cap": source_cap,
    "ewma_value": ewma_value,
    "span_corruption": span_corruption,
    "kcore_filter": kcore_filter,
    "clustering_coeff": clustering_coeff,
    "dup_span_flags": dup_span_flags,
    "mad_by_type": mad_by_type,
    "snm_pairs": snm_pairs,
    "pq_encode": pq_encode,
    "edge_common_neighbors": edge_common_neighbors,
    "source_entropy": source_entropy,
    "term_cooc_pmi": term_cooc_pmi,
    "pagerank_partsupp": pagerank_partsupp,
    "bloom_semi_orders": bloom_semi_orders,
    "promo_revenue": promo_revenue,
    "disjunctive_pred_revenue": disjunctive_pred_revenue,
    "priority_class_counts": priority_class_counts,
    "idle_rich_customers": idle_rich_customers,
    "range_join_bucketed": range_join_bucketed,
    "revenue_cube": revenue_cube,
    "edit_distance_probe": edit_distance_probe,
    "fuzzy_block_join": fuzzy_block_join,
    "resample_fill": resample_fill,
    "scd2_intervals": scd2_intervals,
    "approx_percentile_hist": approx_percentile_hist,
    "q17_small_quantity": q17_small_quantity,
    "part_min_supplier": part_min_supplier,
    "qty_price_corr": qty_price_corr,
    "fuzzy_components": fuzzy_components,
    "contamination_rate": contamination_rate,
    "brand_supplier_counts": brand_supplier_counts,
    "distinct_users_hll_by_type": distinct_users_hll_by_type,
    "running_totals": running_totals,
    "merge_intervals": merge_intervals,
    "asof_join_forward": asof_join_forward,
    "sorted_export": sorted_export,
    "salted_join_segments": salted_join_segments,
    "export_shards": export_shards,
    "table_diff_events": table_diff_events,
    "mode_event_type": mode_event_type,
    "data_mixture": data_mixture,
    "snapshot_diff": snapshot_diff,
    "normalize_text": normalize_text,
    "dedup_mapping": dedup_mapping,
    "dup_rate_by_source": dup_rate_by_source,
    "dup_size_histogram": dup_size_histogram,
    "term_freq_spectrum": term_freq_spectrum,
    "split_leak_audit": split_leak_audit,
    "conv_turn_histogram": conv_turn_histogram,
    "value_zscore_by_type": value_zscore_by_type,
    "leakfree_split": leakfree_split,
    "type_cooccurrence": type_cooccurrence,
    "weekly_active_users": weekly_active_users,
    "orders_monthly_seasonality": orders_monthly_seasonality,
    "user_ltv_deciles": user_ltv_deciles,
    "first_touch_attribution": first_touch_attribution,
    "gap_quantiles": gap_quantiles,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_near": dedup_near,
    "dedup_incremental": dedup_incremental,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "dedup_simhash_near": dedup_simhash_near,
    "knn_ivf": knn_ivf,
    "embed_pca_project": embed_pca_project,
}

ORACLE_SQL = {
    "transcript_build": TRANSCRIPT_BUILD_SQL,
    "transcript_roundtrip": TRANSCRIPT_BUILD_SQL,
    "events_roundtrip": EVENTS_ROUNDTRIP_SQL,
    "documents_roundtrip": DOCUMENTS_ROUNDTRIP_SQL,
    "embeddings_roundtrip": EMBEDDINGS_ROUNDTRIP_SQL,
    "q1_lineitem": Q1_SQL,
    "events_condense": EVENTS_CONDENSE_SQL,
    "distinct_users": DISTINCT_USERS_SQL,
    "stats_profile": STATS_PROFILE_SQL,
    "rle_runs": RLE_RUNS_SQL,
    "condense_codes": CONDENSE_CODES_SQL,
    "melt_events": MELT_EVENTS_SQL,
    "date_format": DATE_FORMAT_SQL,
    "mapping_apply": MAPPING_APPLY_SQL,
    "dict_vocab": DICT_VOCAB_SQL,
    "fk_anti_join": FK_ANTI_JOIN_SQL,
    "top_docs": TOP_DOCS_SQL,
    "tumbling_window": TUMBLING_WINDOW_SQL,
    "session_windows": SESSION_WINDOWS_SQL,
    "asof_join": ASOF_JOIN_SQL,
    "asof_join_bucketed": ASOF_JOIN_BUCKETED_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "chunk_docs": CHUNK_DOCS_SQL,
    "token_count_bpe": TOKEN_COUNT_BPE_SQL,
    "bpe_train": BPE_TRAIN_SQL,
    "bpe_tokenize": BPE_TOKENIZE_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "fingerprint": FINGERPRINT_SQL,
    "lang_id": LANG_ID_SQL,
    "poisson_sample": POISSON_SAMPLE_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_exact_wave": DEDUP_EXACT_SQL,
    "hash_join_wave": HASH_JOIN_WAVE_SQL,
    "group_agg_wave": GROUP_AGG_WAVE_SQL,
    "dedup_passage": DEDUP_PASSAGE_SQL,
    "dedup_near_exhaustive": DEDUP_NEAR_EXHAUSTIVE_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    "jaccard_join_exact": JACCARD_JOIN_EXACT_SQL,
    "split_kl_divergence": SPLIT_KL_DIVERGENCE_SQL,
    "value_trend_by_type": VALUE_TREND_BY_TYPE_SQL,
    "curriculum_export": CURRICULUM_EXPORT_SQL,
    "reach_3hop": REACH_3HOP_SQL,
    "dedup_embedding_auto": DEDUP_EMBEDDING_SQL,
    "knn_bruteforce": KNN_BRUTEFORCE_SQL,
    "hard_negatives": HARD_NEGATIVES_SQL,
    "mmr_select": MMR_DIVERSE_SQL,
    "embed_quantize": EMBED_QUANTIZE_SQL,
    "knn_quantized": KNN_QUANTIZED_SQL,
    "knn_ivf_exhaustive": KNN_BRUTEFORCE_SQL,
    "knn_ivf_persisted": KNN_BRUTEFORCE_SQL,
    "flatten_props": FLATTEN_PROPS_SQL,
    "schema_check": SCHEMA_CHECK_SQL,
    "validate_errors": VALIDATE_ERRORS_SQL,
    "cross_validate_errors": CROSS_VALIDATE_ERRORS_SQL,
    "sample_split": _sample_split_sql(),
    "top_docs_per_lang": TOP_DOCS_PER_LANG_SQL,
    "range_join_agg": RANGE_JOIN_AGG_SQL,
    "quantiles_qty": QUANTILES_QTY_SQL,
    "hopping_window": HOPPING_WINDOW_SQL,
    "users_intersect": USERS_INTERSECT_SQL,
    "users_except": USERS_EXCEPT_SQL,
    "stratified_sample": _stratified_sample_sql(),
    "q3_top_orders": Q3_TOP_ORDERS_SQL,
    "q6_revenue_delta": Q6_REVENUE_DELTA_SQL,
    "q7_volume_shipping": Q7_VOLUME_SHIPPING_SQL,
    "q8_market_share": Q8_MARKET_SHARE_SQL,
    "q21_blame_suppliers": Q21_BLAME_SUPPLIERS_SQL,
    "open_orders_daily": OPEN_ORDERS_DAILY_SQL,
    "brand_return_rate": BRAND_RETURN_RATE_SQL,
    "q10_returned_items": Q10_RETURNED_ITEMS_SQL,
    "q15_top_supplier": Q15_TOP_SUPPLIER_SQL,
    "customer_order_counts": CUSTOMER_ORDER_COUNTS_SQL,
    "nation_coverage_full_outer": NATION_COVERAGE_SQL,
    "q5_region_revenue": Q5_REGION_REVENUE_SQL,
    "user_event_windows": USER_EVENT_WINDOWS_SQL,
    "user_value_ranks": USER_VALUE_RANKS_SQL,
    "user_type_seq": USER_TYPE_SEQ_SQL,
    "weighted_sample": _weighted_sample_sql(),
    "distinct_users_hll": _distinct_users_hll_sql(),
    "heavy_hitters_cms": _heavy_hitters_cms_sql(),
    "funnel_events": FUNNEL_EVENTS_SQL,
    "pivot_user_events": PIVOT_USER_EVENTS_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    "quantiles_by_type": QUANTILES_BY_TYPE_SQL,
    "revenue_rollup": REVENUE_ROLLUP_SQL,
    "corpus_prep": _corpus_prep_sql(),
    "rolling_hour_sum": ROLLING_HOUR_SUM_SQL,
    "label_centroids": LABEL_CENTROIDS_SQL,
    "quantiles_cont_value": QUANTILES_CONT_VALUE_SQL,
    "nearest_eval_vec": NEAREST_EVAL_VEC_SQL,
    "props_extract": PROPS_EXTRACT_SQL,
    "pruned_scan": PRUNED_SCAN_SQL,
    "pruned_scan_zorder": PRUNED_SCAN_ZORDER_SQL,
    "pruned_scan_dict": PRUNED_SCAN_DICT_SQL,
    "schema_evolve": SCHEMA_EVOLVE_SQL,
    "time_travel": TIME_TRAVEL_SQL,
    "incremental_counts": INCREMENTAL_COUNTS_SQL,
    "conv_lookup": _conv_lookup_sql(),
    "role_counts_encoded": ROLE_COUNTS_ENCODED_SQL,
    "compacted_roundtrip": TRANSCRIPT_BUILD_SQL,
    "merge_events": MERGE_EVENTS_SQL,
    "delete_events": DELETE_EVENTS_SQL,
    "tool_vocab_encoded": TOOL_VOCAB_ENCODED_SQL,
    "ts_range_encoded": TS_RANGE_ENCODED_SQL,
    "context_pack": CONTEXT_PACK_SQL,
    "context_truncate": CONTEXT_TRUNCATE_SQL,
    "turn_pairs": TURN_PAIRS_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "repetition_flags": REPETITION_FLAGS_SQL,
    "bigram_top": BIGRAM_TOP_SQL,
    "term_stats": TERM_STATS_SQL,
    "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
    "doc_surprisal": DOC_SURPRISAL_SQL,
    "bigram_surprisal": BIGRAM_SURPRISAL_SQL,
    "conv_dedup": CONV_DEDUP_SQL,
    "conv_stats": CONV_STATS_SQL,
    "role_tool_pmi": ROLE_TOOL_PMI_SQL,
    "alternation_audit": ALTERNATION_AUDIT_SQL,
    "sft_pack_examples": SFT_PACK_EXAMPLES_SQL,
    "tool_transitions": TOOL_TRANSITIONS_SQL,
    "tool_markov_stationary": TOOL_MARKOV_STATIONARY_SQL,
    "tool_entropy_rate": TOOL_ENTROPY_RATE_SQL,
    "tool_latency": TOOL_LATENCY_SQL,
    "role_runs": ROLE_RUNS_SQL,
    "gini_activity": GINI_ACTIVITY_SQL,
    "activity_streaks": ACTIVITY_STREAKS_SQL,
    "weekly_delta": WEEKLY_DELTA_SQL,
    "acf1_by_type": ACF1_BY_TYPE_SQL,
    "moments_by_type": MOMENTS_BY_TYPE_SQL,
    "iqr_outliers": IQR_OUTLIERS_SQL,
    "conv_prefix_dedup": CONV_PREFIX_DEDUP_SQL,
    "sft_export": SFT_EXPORT_SQL,
    "rolling_median3": ROLLING_MEDIAN3_SQL,
    "q4_priority_exists": Q4_PRIORITY_EXISTS_SQL,
    "q13_order_distribution": Q13_ORDER_DISTRIBUTION_SQL,
    "q18_large_orders": Q18_LARGE_ORDERS_SQL,
    "retention_cohorts": RETENTION_COHORTS_SQL,
    "value_histogram": VALUE_HISTOGRAM_SQL,
    "blocklist_filter": BLOCKLIST_FILTER_SQL,
    "embed_dim_stats": EMBED_DIM_STATS_SQL,
    "kmeans_embeddings": KMEANS_EMBEDDINGS_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_SQL,
    "embed_outliers": EMBED_OUTLIERS_SQL,
    "logreg_train": LOGREG_TRAIN_SQL,
    "quality_scores": QUALITY_SCORES_SQL,
    "lang_balance": LANG_BALANCE_SQL,
    "quality_confusion": QUALITY_CONFUSION_SQL,
    "quality_calibration": QUALITY_CALIBRATION_SQL,
    "langid_confusion": LANGID_CONFUSION_SQL,
    "psi_value_split": PSI_VALUE_SPLIT_SQL,
    "ks_value_split": KS_VALUE_SPLIT_SQL,
    "degree_assortativity": DEGREE_ASSORTATIVITY_SQL,
    "doc_clusters": DOC_CLUSTERS_SQL,
    "triangles_coorder": TRIANGLES_COORDER_SQL,
    "fuzzy_best_match": FUZZY_BEST_MATCH_SQL,
    "source_cap": SOURCE_CAP_SQL,
    "bm25_search": BM25_SEARCH_SQL,
    "ewma_value": EWMA_VALUE_SQL,
    "span_corruption": SPAN_CORRUPTION_SQL,
    "kcore_filter": KCORE_FILTER_SQL,
    "clustering_coeff": CLUSTERING_COEFF_SQL,
    "dup_span_flags": DUP_SPAN_FLAGS_SQL,
    "mad_by_type": MAD_BY_TYPE_SQL,
    "snm_pairs": SNM_PAIRS_SQL,
    "pq_encode": PQ_ENCODE_SQL,
    "knn_pq_adc": KNN_PQ_ADC_SQL,
    "edge_common_neighbors": EDGE_COMMON_NEIGHBORS_SQL,
    "source_entropy": SOURCE_ENTROPY_SQL,
    "term_cooc_pmi": TERM_COOC_PMI_SQL,
    "embed_cov": EMBED_COV_SQL,
    "pagerank_partsupp": PAGERANK_PARTSUPP_SQL,
    "bloom_semi_orders": BLOOM_SEMI_ORDERS_SQL,
    "promo_revenue": PROMO_REVENUE_SQL,
    "disjunctive_pred_revenue": DISJUNCTIVE_PRED_REVENUE_SQL,
    "priority_class_counts": PRIORITY_CLASS_COUNTS_SQL,
    "idle_rich_customers": IDLE_RICH_CUSTOMERS_SQL,
    "range_join_bucketed": RANGE_JOIN_AGG_SQL,
    "revenue_cube": REVENUE_CUBE_SQL,
    "edit_distance_probe": EDIT_DISTANCE_PROBE_SQL,
    "fuzzy_block_join": FUZZY_BLOCK_JOIN_SQL,
    "resample_fill": RESAMPLE_FILL_SQL,
    "scd2_intervals": SCD2_INTERVALS_SQL,
    "approx_percentile_hist": APPROX_PERCENTILE_HIST_SQL,
    "q17_small_quantity": Q17_SMALL_QUANTITY_SQL,
    "part_min_supplier": PART_MIN_SUPPLIER_SQL,
    "qty_price_corr": QTY_PRICE_CORR_SQL,
    "fuzzy_components": FUZZY_COMPONENTS_SQL,
    "contamination_rate": CONTAMINATION_RATE_SQL,
    "brand_supplier_counts": BRAND_SUPPLIER_COUNTS_SQL,
    "distinct_users_hll_by_type": _distinct_users_hll_by_type_sql(),
    "running_totals": RUNNING_TOTALS_SQL,
    "merge_intervals": MERGE_INTERVALS_SQL,
    "asof_join_forward": ASOF_JOIN_FORWARD_SQL,
    "sorted_export": SORTED_EXPORT_SQL,
    "sorted_export_by_source": SORTED_EXPORT_BY_SOURCE_SQL,
    "salted_join_segments": SALTED_JOIN_SEGMENTS_SQL,
    "turn_sum_encoded": TURN_SUM_ENCODED_SQL,
    "turn_var_encoded": TURN_VAR_ENCODED_SQL,
    "export_shards": _export_shards_sql(),
    "role_turn_sum_encoded": ROLE_TURN_SUM_ENCODED_SQL,
    "role_tool_counts_encoded": ROLE_TOOL_COUNTS_ENCODED_SQL,
    "table_diff_events": TABLE_DIFF_EVENTS_SQL,
    "mode_event_type": MODE_EVENT_TYPE_SQL,
    "data_mixture": DATA_MIXTURE_SQL,
    "snapshot_diff": SNAPSHOT_DIFF_SQL,
    "normalize_text": NORMALIZE_TEXT_SQL,
    "dedup_mapping": DEDUP_MAPPING_SQL,
    "dup_rate_by_source": DUP_RATE_BY_SOURCE_SQL,
    "dup_size_histogram": DUP_SIZE_HISTOGRAM_SQL,
    "term_freq_spectrum": TERM_FREQ_SPECTRUM_SQL,
    "split_leak_audit": SPLIT_LEAK_AUDIT_SQL,
    "conv_turn_histogram": CONV_TURN_HISTOGRAM_SQL,
    "value_zscore_by_type": VALUE_ZSCORE_BY_TYPE_SQL,
    "leakfree_split": _leakfree_split_sql(),
    "type_cooccurrence": TYPE_COOCCURRENCE_SQL,
    "weekly_active_users": WEEKLY_ACTIVE_USERS_SQL,
    "orders_monthly_seasonality": ORDERS_MONTHLY_SEASONALITY_SQL,
    "user_ltv_deciles": USER_LTV_DECILES_SQL,
    "first_touch_attribution": FIRST_TOUCH_ATTRIBUTION_SQL,
    "gap_quantiles": GAP_QUANTILES_SQL,
    "transcript_prep": TRANSCRIPT_PREP_SQL,
    # pixels are the text's own ASCII codes (16x12 RGB tiled), so the mean
    # red channel is SQL-recomputable; CAST AS REAL mirrors the float32
    # feature quantization, absorbing float64 sum-order noise on both sides
    "media_features_png": MEDIA_FEATURES_PNG_SQL,
    "media_features_gif": MEDIA_FEATURES_GIF_SQL,
    "media_features_jpeg": MEDIA_FEATURES_JPEG_SQL,
    "audio_features_wav": AUDIO_FEATURES_WAV_SQL,
    "video_frame_features": VIDEO_FRAME_FEATURES_SQL,
    "media_features": """
WITH px AS (
  SELECT doc_id, ord(substr(text, (s.p % length(text)) + 1, 1)) AS red
  FROM documents, generate_series(0, 573, 3) s(p)
)
SELECT doc_id,
       589 AS n_payload_bytes,
       round(CAST(CAST(CAST(avg(red) AS DOUBLE) / 255.0 AS REAL) AS DOUBLE), 4) AS f0
FROM px GROUP BY doc_id
""",
    # lang_id, dedup_minhash, dedup_simhash, knn_ivf: rows-only (heuristic /
    # hash-construction ops with no faithful ANSI-SQL equivalent)
}
