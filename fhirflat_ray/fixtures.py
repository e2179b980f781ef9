"""Deterministic synthetic transcript tables (FIXTURES.md F1-F5).

All generators are seeded; no external data. F1 mirrors the BASELINE.json
``input_hint`` shape; F2 covers the null/degenerate classes the reference's
dummy-data tests hit (NaN/None/list normalization,
/root/reference/fhirflat/util.py:150-208); F3 is the shuffle fixture; F4 the
vocab-drift (shared-dictionary) fixture; F5 the resume fixture.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fhirflat_ray.schema import ROLE_VOCAB, TOOL_VOCAB, TRANSCRIPT_SCHEMA

_WORDS = (
    "the model ran tool call with args and returned output then user asked "
    "again for result"
).split()

ROLE_P = (0.45, 0.45, 0.02, 0.08)
TOOL_P = (0.37, 0.17, 0.14, 0.12, 0.10, 0.10)


def _conversation_lengths(rng: np.random.Generator, rows: int) -> np.ndarray:
    """Zipf(a=1.5) lengths clipped to [1, 500], truncated to sum to ``rows``."""
    lens: list[int] = []
    total = 0
    while total < rows:
        chunk = np.clip(rng.zipf(1.5, size=4096), 1, 500)
        for n in chunk:
            n = int(min(n, rows - total))
            lens.append(n)
            total += n
            if total >= rows:
                break
    return np.asarray(lens, dtype=np.int64)


def make_transcripts(rows: int = 10_000, seed: int = 42) -> pa.Table:
    """F1: skewed multi-turn transcript table, sorted by (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    lens = _conversation_lengths(rng, rows)
    n_conv = len(lens)

    conv_ids = np.array([f"conv-{i:08d}" for i in range(n_conv)], dtype=object)
    conv_col = np.repeat(conv_ids, lens)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lens])

    role = rng.choice(np.array(ROLE_VOCAB, dtype=object), size=rows, p=ROLE_P)
    tool = rng.choice(np.array(TOOL_VOCAB, dtype=object), size=rows, p=TOOL_P)

    n_words = rng.integers(5, 61, size=rows)
    word_ids = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    # vectorized text build (same strings as a per-row " ".join, C speed):
    # dictionary take → list wrap by token counts → binary_join
    vocab = pa.array(_WORDS, pa.string())
    tokens = vocab.take(pa.array(word_ids.astype(np.int32)))
    offsets = np.concatenate([[0], np.cumsum(n_words)]).astype(np.int64)
    token_lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), tokens)
    import pyarrow.compute as pc

    text = pc.binary_join(token_lists, " ")

    deltas = rng.integers(1, 5_000_000, size=rows, dtype=np.int64)
    ts = 1_700_000_000_000_000 + np.cumsum(deltas)

    text_arr = text.cast(pa.string()) if not text.type.equals(pa.string()) else text
    return pa.table(
        {
            "conv_id": pa.array(conv_col, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": text_arr,
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def make_edgecase_transcripts() -> pa.Table:
    """F2: nulls vs empty strings, unicode, giant text, degenerate columns.

    Uses a nullable variant of the schema (text/tool nullable)."""
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string(), nullable=False),
            pa.field("turn_idx", pa.int32(), nullable=False),
            pa.field("role", pa.string(), nullable=False),
            pa.field("text", pa.string(), nullable=True),
            pa.field("tool", pa.string(), nullable=True),
            pa.field("ts", pa.timestamp("us"), nullable=False),
        ]
    )
    rows = [
        # null vs empty string must round-trip distinctly
        ("c-0", 0, "user", None, None, 1),
        ("c-0", 1, "assistant", "", "", 2),
        # single-row conversation
        ("c-1", 0, "user", "solo", "bash", 3),
        # unicode: emoji, CJK, combining characters
        ("c-2", 0, "user", "héllo 👋 世界 á", "", 4),
        # very long text (>64 KiB single turn)
        ("c-2", 1, "assistant", "x" * 70_000, "read", 5),
        # leading/trailing/double spaces (worddict losslessness)
        ("c-2", 2, "user", "  padded   text  ", "grep", 6),
        # pipe and newline characters (reference's system|code separator)
        ("c-2", 3, "tool", "a|b\nc\td", "edit", 7),
        # turn_idx gap
        ("c-3", 0, "user", "gap", "", 8),
        ("c-3", 5, "assistant", "after gap", "", 9),
    ]
    cols = list(zip(*rows))
    return pa.table(
        {
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "role": pa.array(cols[2], pa.string()),
            "text": pa.array(cols[3], pa.string()),
            "tool": pa.array(cols[4], pa.string()),
            "ts": pa.array(cols[5], pa.timestamp("us")),
        },
        schema=schema,
    )


def make_unsorted_transcripts(rows: int = 10_000, seed: int = 42) -> pa.Table:
    """F3: F1 rows randomly permuted (seeded) — sort/layout fixture."""
    t = make_transcripts(rows, seed)
    perm = np.random.default_rng(seed + 1).permutation(t.num_rows)
    return t.take(pa.array(perm))


def write_scaling_fragments(
    out_dir: str, rows: int, n_fragments: int = 32, seed: int = 42
) -> list[str]:
    """Large bench fixture: fragments generated in PARALLEL Ray tasks.

    Each fragment is an independent seeded table (seed+i, conv ids prefixed
    ``f{i:02d}-`` so conversations never span fragments). Parallel generation
    matters on this sandbox: a single process faults fresh pages at
    ~16 MB/s, the cluster ~90 MB/s aggregate."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    per = (rows + n_fragments - 1) // n_fragments

    @ray.remote(num_cpus=1)
    def gen(i: int) -> str:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = make_transcripts(min(per, rows - i * per), seed + i)
        conv = pc.binary_join_element_wise(f"f{i:02d}-", t.column("conv_id").cast(pa.string()), "")
        t = t.set_column(0, pa.field("conv_id", pa.string(), nullable=False), conv)
        path = os.path.join(out_dir, f"transcripts-{i:05d}.parquet")
        pq.write_table(t, path, row_group_size=64 * 1024)
        return path

    return sorted(ray.get([gen.remote(i) for i in range(n_fragments) if i * per < rows]))


def write_transcript_fragments(
    out_dir: str, rows: int = 50_000, n_fragments: int = 8, seed: int = 42
) -> list[str]:
    """F5: F1 split into >=`n_fragments` parquet fragment files (resume fixture).

    Fragment boundaries are row-range slices so re-generation is deterministic.
    Returns the fragment paths in order.
    """
    os.makedirs(out_dir, exist_ok=True)
    t = make_transcripts(rows, seed)
    per = (t.num_rows + n_fragments - 1) // n_fragments
    paths = []
    for i in range(n_fragments):
        frag = t.slice(i * per, per)
        if frag.num_rows == 0:
            break
        path = os.path.join(out_dir, f"transcripts-{i:05d}.parquet")
        # small row groups so plan_partitions can hit any target_rows
        pq.write_table(frag, path, row_group_size=32 * 1024)
        paths.append(path)
    return paths
