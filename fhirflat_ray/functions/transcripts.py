"""Transcript-shaped operators: context-window packing, truncation and
turn-pair mining over (conv_id, turn_idx)-keyed tables.

These are the serving/training access patterns a transcript store exists
for: chunk a conversation into model-context-sized windows, keep the most
recent N tokens, and mine (prompt, response) pairs for SFT. All three are
one coarse-bucket shuffle on the conversation key plus a vectorized pass
per bucket (the keyed_window discipline — Python cost per bucket, never
per conversation or per row). Parity targets are window-function /
recursive-CTE SQL (see the oracles in ``pipelines/queries.py``); the
reference's analogous grouped-reshape machinery is the melt/implode family
(``/root/reference/fhirflat/ingest.py:181-226``).

Scale shape: each operator ships every transcript row through the key
shuffle exactly once (no amplification, no materialized side). The packing
pass builds a dense (conversations x max_turns) int64 matrix per bucket —
the standard jagged-transpose trick that turns the inherently sequential
reset-cumsum into ``max_turns`` numpy steps vectorized across all
conversations in the bucket. Assumption (same as any keyed window): one
conversation's rows fit in a worker; matrix size is bounded by the bucket's
row count times the skew of the longest conversation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TOKEN_RE = r"\S+"

#: conversations longer than this take the per-chunk binary-search path in
#: ``pack_bucket_fn`` (module-level so the equality test can force tiers)
_LONG_CONV = 4096


def _whitespace_tokens(texts: pd.Series) -> np.ndarray:
    """Whitespace token counts, C-vectorized; parity with DuckDB
    ``len(regexp_extract_all(COALESCE(text, ''), '\\S+'))`` (nulls count
    0). Runs through pyarrow so BOTH sides execute RE2 — Python ``re``
    treats ``\\s`` as Unicode whitespace while RE2 is ASCII-only, and that
    divergence (e.g. U+00A0) would silently shift chunk boundaries."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(texts.astype(object), type=pa.string())
    counts = pc.fill_null(pc.count_substring_regex(arr, _TOKEN_RE), 0)
    return counts.to_numpy(zero_copy_only=False).astype(np.int64)


def pack_context_windows(
    ds,
    key: str,
    order_col: str,
    text_col: str,
    budget: int,
    out_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
):
    """Greedy context-window packing: within each ``key`` (ordered by
    ``order_col``) assign every row a chunk id such that a chunk's token
    total never exceeds ``budget`` unless a single row alone does.

    Semantics (must match the recursive-CTE oracle exactly): the first row
    of a conversation opens chunk 0 with ``cum = tokens`` even when it
    already exceeds the budget; each later row starts a new chunk iff
    ``cum + tokens > budget`` (resetting ``cum`` to its own token count),
    else joins the current chunk.

    The reset-cumsum is sequential per conversation, so the per-bucket pass
    iterates over within-conversation POSITIONS (max_turns numpy steps),
    each step vectorized across every conversation still active at that
    position — the Python loop length is the longest conversation, not the
    row count, and memory stays LINEAR in rows (CSR segment indexing, no
    dense conversations x max_turns matrix: one skewed long conversation
    must not inflate the bucket's footprint quadratically).
    """
    from fhirflat_ray.functions.util import bucketed_map_groups

    return bucketed_map_groups(
        ds, [key], pack_bucket_fn(key, order_col, text_col, budget, out_col, tokens_col)
    )


def pack_bucket_fn(
    key: str,
    order_col: str,
    text_col: str,
    budget: int,
    out_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
):
    """Per-bucket packing kernel (see :func:`pack_context_windows`) —
    exposed separately so pipelines already co-partitioned on ``key`` can
    FUSE the pack into their existing bucket pass instead of paying a
    second shuffle."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort").reset_index(drop=True)
        tok = _whitespace_tokens(g[text_col])
        # sorted by key => each conversation is one contiguous segment
        sizes = g.groupby(key, sort=False).size().to_numpy(np.int64)
        starts = np.concatenate(([0], np.cumsum(sizes)[:-1])) if len(sizes) else sizes

        chunk_out = np.zeros(len(g), np.int64)

        # pathological conversations (> _LONG_CONV turns) route through a
        # per-CHUNK binary search over the token prefix sum — O(chunks ·
        # log turns) instead of the position loop's O(turns) steps. Exact
        # greedy equivalence with the position loop (incl. over-budget
        # openers, zero-token rows, mid-chunk giants) is pinned by test.
        # Measured: a planted 5M-turn conversation dropped the bucket pass
        # from ~50 s to seconds.
        long_sel = sizes > _LONG_CONV
        for ci in np.flatnonzero(long_sel):
            s, n = int(starts[ci]), int(sizes[ci])
            prefix = np.cumsum(tok[s : s + n], dtype=np.int64)
            bounds = [0]
            while bounds[-1] < n:
                i = bounds[-1]
                base = int(prefix[i - 1]) if i else 0
                j = int(np.searchsorted(prefix, base + budget, side="right"))
                bounds.append(max(j, i + 1))  # a lone over-budget row is its own chunk
            lens = np.diff(np.asarray(bounds, dtype=np.int64))
            chunk_out[s : s + n] = np.repeat(
                np.arange(len(lens), dtype=np.int64), lens
            )

        # everyone else: one loop over within-conversation POSITIONS, each
        # step vectorized across every short conversation still active
        sizes_s = sizes[~long_sel]
        starts_s = starts[~long_sel]
        max_pos = int(sizes_s.max()) if len(sizes_s) else 0
        cum = np.zeros(len(sizes_s), np.int64)
        chunk = np.zeros(len(sizes_s), np.int64)
        for t in range(max_pos):
            alive = sizes_s > t  # conversations that still have a turn at pos t
            rows = starts_s[alive] + t
            tk = tok[rows]
            if t == 0:
                cum = tk.copy()
                # chunk stays 0; cum/chunk arrays shrink to the alive set as
                # shorter conversations retire (alive is a prefix-stable mask
                # only of the previous alive set, so re-mask both carries)
            else:
                keep = alive[prev_alive]
                cum, chunk = cum[keep], chunk[keep]
                over = cum + tk > budget
                chunk = chunk + over
                cum = np.where(over, tk, cum + tk)
            chunk_out[rows] = chunk
            prev_alive = alive

        g[tokens_col] = tok
        g[out_col] = chunk_out
        return g

    return per_bucket


def truncate_context(
    ds,
    key: str,
    order_col: str,
    text_col: str,
    budget: int,
):
    """Keep each conversation's most recent suffix whose token total fits
    ``budget`` — the context-window truncation a serving path applies
    before prompting. The newest row always survives even when it alone
    exceeds the budget. One shuffle + one vectorized reverse-cumsum per
    bucket (pandas C groupby engine)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    return bucketed_map_groups(
        ds, [key], truncate_bucket_fn(key, order_col, text_col, budget)
    )


def truncate_bucket_fn(key: str, order_col: str, text_col: str, budget: int):
    """Per-bucket truncation kernel (see :func:`truncate_context`); for
    fusing into an existing ``key``-bucketed pass."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key, order_col], ascending=[True, False], kind="mergesort"
        ).reset_index(drop=True)
        tok = _whitespace_tokens(g[text_col])
        gb = g.groupby(key, sort=False)
        revcum = (
            pd.Series(tok, index=g.index).groupby(g[key], sort=False).cumsum()
        ).to_numpy(np.int64)
        newest = gb.cumcount().to_numpy(np.int64) == 0
        return g[(revcum <= budget) | newest]

    return per_bucket


def turn_pairs(
    ds,
    key: str,
    order_col: str,
    role_col: str,
    text_col: str,
    prompt_role: str = "user",
    response_role: str = "assistant",
):
    """Mine adjacent (prompt, response) turn pairs: rows where this turn's
    role is ``prompt_role`` and the NEXT turn (by ``order_col`` within the
    conversation) is ``response_role`` — the SFT-pair extraction pass.
    LEAD() via the shared keyed_window machinery, then a vectorized
    filter."""
    from fhirflat_ray.functions.windows import keyed_window

    w = keyed_window(
        ds,
        key,
        [order_col],
        [
            ("lead", text_col, 1, "__next_text"),
            ("lead", role_col, 1, "__next_role"),
        ],
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = (g[role_col] == prompt_role) & (g["__next_role"] == response_role)
        out = g.loc[m, [key, order_col, text_col, "__next_text"]].copy()
        out.columns = [key, order_col, "prompt", "response"]
        return out

    return w.map_batches(finish, batch_format="pandas")

def _ordered_group_concat(
    g: pd.DataFrame,
    keys: list[str],
    order_cols: list[str],
    part_col: str,
    sep: str,
) -> "pa.Table":
    """Sorted Arrow list-collect + one vectorized ``binary_join``: the
    ordered string-agg kernel shared by conversation fingerprinting and SFT
    example materialization. ``use_threads=False`` is what guarantees
    encounter order inside each group (see ``user_type_seq``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = keys + order_cols + [part_col]
    t = pa.Table.from_pandas(
        g[cols].sort_values(keys + order_cols, kind="mergesort"),
        preserve_index=False,
    )
    agg = (
        t.select(keys + [part_col])
        .group_by(keys, use_threads=False)
        .aggregate([(part_col, "list")])
    )
    joined = pc.binary_join(agg[f"{part_col}_list"].combine_chunks(), pa.scalar(sep))
    return agg.drop_columns([f"{part_col}_list"]).append_column("__joined", joined)


def conv_content(
    ds,
    key: str,
    order_col: str,
    role_col: str,
    text_col: str,
    sep: str = "\x1e",
):
    """Collapse each conversation to ONE row: ``content`` is the ordered
    ``role|text`` concatenation (record-separator joined) plus ``n_turns`` —
    the canonical form conversation-level exact dedup hashes. One coarse
    bucket shuffle; per bucket a single sorted Arrow group_by + binary_join
    (no Python per conversation). Null role/text enter the content as ''
    (mirrored by COALESCE in the oracle — string concat with NULL would
    otherwise silently DROP the whole turn from SQL string_agg)."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    return bucketed_map_groups(
        ds, [key], content_bucket_fn(key, order_col, role_col, text_col, sep)
    )


def content_bucket_fn(
    key: str, order_col: str, role_col: str, text_col: str, sep: str = "\x1e"
):
    """Per-bucket content-collapse kernel (see :func:`conv_content`); for
    fusing into an existing ``key``-bucketed pass."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["__part"] = (
            g[role_col].fillna("").astype(str)
            + "|"
            + g[text_col].fillna("").astype(str)
        )
        out = _ordered_group_concat(g, [key], [order_col], "__part", sep)
        n = g.groupby(key, sort=False).size()
        df = out.to_pandas().rename(columns={"__joined": "content"})
        df["n_turns"] = n.reindex(df[key]).to_numpy(np.int64)
        return df

    return per_bucket


def conv_profile(
    ds,
    key: str,
    role_col: str,
    text_col: str,
    tool_col: str,
    ts_col: str,
):
    """Per-conversation profile: turn counts by role, whitespace token
    total, distinct tool count, and wall-clock duration (microseconds —
    exact integer math on both engine and oracle sides). One bucket shuffle
    + one vectorized pandas aggregate per bucket. (A combiner-style partial
    aggregate would shrink the shuffle for most columns, but the distinct
    tool count needs the raw (conv, tool) pairs anyway — so the single
    raw-row pass is the honest shape; the shuffle ships each transcript row
    exactly once, same as every keyed transcript operator.)"""
    from fhirflat_ray.functions.util import bucketed_map_groups

    return bucketed_map_groups(
        ds, [key], profile_bucket_fn(key, role_col, text_col, tool_col, ts_col)
    )


def profile_bucket_fn(
    key: str, role_col: str, text_col: str, tool_col: str, ts_col: str
):
    """Per-bucket profile kernel (see :func:`conv_profile`); for fusing
    into an existing ``key``-bucketed pass."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["__tok"] = _whitespace_tokens(g[text_col])
        g["__user"] = (g[role_col] == "user").astype(np.int64)
        gb = g.groupby(key, sort=False)
        out = gb.agg(
            n_turns=(role_col, "size"),
            n_user=("__user", "sum"),
            n_tokens=("__tok", "sum"),
            n_tools=(tool_col, "nunique"),
            __t0=(ts_col, "min"),
            __t1=(ts_col, "max"),
        ).reset_index()
        out["n_assistant"] = out["n_turns"] - out["n_user"]
        out["dur_us"] = (
            out["__t1"].to_numpy("datetime64[us]").astype(np.int64)
            - out["__t0"].to_numpy("datetime64[us]").astype(np.int64)
        )
        return out[
            [key, "n_turns", "n_user", "n_assistant", "n_tokens", "n_tools", "dur_us"]
        ].astype({"n_turns": np.int64, "n_user": np.int64})

    return per_bucket


def alternation_check(
    ds,
    key: str,
    order_col: str,
    role_col: str,
    first_role: str = "user",
):
    """Dialogue-structure validation: per conversation, does turn 0 carry
    ``first_role``, and how many adjacent turns repeat a role (alternation
    breaks)? Vectorized per bucket: one sort, one shifted same-conv/same-role
    compare, one groupby-sum."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    return bucketed_map_groups(
        ds, [key], alternation_bucket_fn(key, order_col, role_col, first_role)
    )


def alternation_bucket_fn(
    key: str, order_col: str, role_col: str, first_role: str = "user"
):
    """Per-bucket alternation-audit kernel (see :func:`alternation_check`);
    for fusing into an existing ``key``-bucketed pass."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort").reset_index(drop=True)
        conv = g[key].to_numpy()
        role = g[role_col].to_numpy()
        brk = np.zeros(len(g), np.int64)
        if len(g) > 1:
            brk[1:] = (conv[1:] == conv[:-1]) & (role[1:] == role[:-1])
        g = g.assign(__brk=brk)
        gb = g.groupby(key, sort=False)
        out = gb.agg(n_breaks=("__brk", "sum")).reset_index()
        first = g.loc[gb[role_col].head(1).index]
        out["starts_ok"] = (
            first[role_col].to_numpy() == first_role
        )
        return out[[key, "starts_ok", "n_breaks"]]

    return per_bucket


def sft_examples(
    ds,
    key: str,
    order_col: str,
    role_col: str,
    text_col: str,
    budget: int,
    chunk_col: str = "chunk_id",
):
    """Materialize training examples: greedy-pack each conversation into
    token-budget chunks, then collapse every (conversation, chunk) to one
    example row — ordered ``role: text`` lines joined by newline, with turn
    and token totals. Pack and collapse are keyed identically, so they run
    FUSED in a single bucket pass — one shuffle total."""
    from fhirflat_ray.functions.util import bucketed_map_groups

    return bucketed_map_groups(
        ds,
        [key],
        sft_bucket_fn(key, order_col, role_col, text_col, budget, chunk_col),
    )


def sft_bucket_fn(
    key: str,
    order_col: str,
    role_col: str,
    text_col: str,
    budget: int,
    chunk_col: str = "chunk_id",
):
    """Per-bucket SFT-example kernel: the packing kernel composed with the
    (conversation, chunk) ordered collapse — one bucket pass for both."""
    pack = pack_bucket_fn(key, order_col, text_col, budget, out_col=chunk_col)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = pack(g)
        g = g.copy()
        # null role/text as '' — mirrored by COALESCE in the oracle (see
        # conv_content)
        g["__part"] = (
            g[role_col].fillna("").astype(str)
            + ": "
            + g[text_col].fillna("").astype(str)
        )
        out = _ordered_group_concat(g, [key, chunk_col], [order_col], "__part", "\n")
        agg = g.groupby([key, chunk_col], sort=False).agg(
            n_turns=("__part", "size"), n_tokens=("n_tokens", "sum")
        )
        df = out.to_pandas().rename(columns={"__joined": "example"})
        idx = pd.MultiIndex.from_frame(df[[key, chunk_col]])
        df["n_turns"] = agg["n_turns"].reindex(idx).to_numpy(np.int64)
        df["n_tokens"] = agg["n_tokens"].reindex(idx).to_numpy(np.int64)
        return df[[key, chunk_col, "n_turns", "n_tokens", "example"]]

    return per_bucket
