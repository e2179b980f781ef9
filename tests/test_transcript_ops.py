"""Tests for transcript training/serving operators (context packing,
truncation, SFT pair mining) and the corpus-scrub text functions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fhirflat_ray.functions import text as tx
from fhirflat_ray.functions import transcripts as tr


def conv_table() -> pa.Table:
    # conv A: 4 turns of 3/5/4/2 tokens; conv B: one huge turn then a small
    # one; conv C: single turn. Null text counts as 0 tokens.
    rows = [
        ("A", 0, "user", "one two three"),
        ("A", 1, "assistant", "a b c d e"),
        ("A", 2, "user", "w x y z"),
        ("A", 3, "assistant", "ok done"),
        ("B", 0, "user", " ".join(f"t{i}" for i in range(40))),
        ("B", 1, "assistant", "short reply here"),
        ("C", 0, "user", None),
    ]
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
        }
    )


def _as_df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_pack_context_windows(ray_session):
    import ray

    ds = ray.data.from_arrow(conv_table())
    out = _as_df(tr.pack_context_windows(ds, "conv_id", "turn_idx", "text", budget=8))
    by = {(r.conv_id, r.turn_idx): (r.n_tokens, r.chunk_id) for r in out.itertuples()}
    # A: 3 -> cum 3; +5 = 8 fits; +4 > 8 new chunk; +2 = 6 fits
    assert by[("A", 0)] == (3, 0)
    assert by[("A", 1)] == (5, 0)
    assert by[("A", 2)] == (4, 1)
    assert by[("A", 3)] == (2, 1)
    # B: first turn alone exceeds budget -> still chunk 0; next opens chunk 1
    assert by[("B", 0)] == (40, 0)
    assert by[("B", 1)] == (3, 1)
    # C: null text = 0 tokens
    assert by[("C", 0)] == (0, 0)


def test_truncate_context(ray_session):
    import ray

    ds = ray.data.from_arrow(conv_table())
    out = _as_df(tr.truncate_context(ds, "conv_id", "turn_idx", "text", budget=7))
    kept = set(zip(out.conv_id, out.turn_idx))
    # A suffix sums (newest first): 2, 2+4=6, 6+5=11 -> keep turns 3 and 2
    assert ("A", 3) in kept and ("A", 2) in kept
    assert ("A", 1) not in kept and ("A", 0) not in kept
    # B: newest (3 tokens) fits; the 40-token turn does not
    assert ("B", 1) in kept and ("B", 0) not in kept
    # C: newest always survives
    assert ("C", 0) in kept


def test_truncate_newest_survives_even_over_budget(ray_session):
    import ray

    t = pa.table(
        {
            "conv_id": pa.array(["Z"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array([" ".join("w" * 1 for _ in range(50))]),
        }
    )
    out = tr.truncate_context(
        ray.data.from_arrow(t), "conv_id", "turn_idx", "text", budget=5
    ).to_pandas()
    assert len(out) == 1


def test_turn_pairs(ray_session):
    import ray

    ds = ray.data.from_arrow(conv_table())
    out = (
        tr.turn_pairs(ds, "conv_id", "turn_idx", "role", "text")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # pairs: (A,0)->(A,1), (A,2)->(A,3), (B,0)->(B,1); C has no successor
    assert list(zip(out.conv_id, out.turn_idx)) == [("A", 0), ("A", 2), ("B", 0)]
    assert out.loc[0, "prompt"] == "one two three"
    assert out.loc[0, "response"] == "a b c d e"


# ----------------------------------------------------------------- text


def test_pii_scrub_batch():
    t = pa.table(
        {
            "text": [
                "mail me at bob.smith+x@example.co.uk or call 555-123-4567",
                "order 12345 shipped",
                "no pii here",
                None,
            ]
        }
    )
    out = tx.pii_scrub_batch(t)
    clean = out["clean_text"].to_pylist()
    assert clean[0] == "mail me at <EMAIL> or call <PHONE>"
    assert clean[1] == "order <NUM> shipped"
    assert clean[2] == "no pii here"
    assert clean[3] is None
    # counts are per-pattern over the ORIGINAL text: the phone's digit runs
    # are also counted by the number pattern (1 email + 1 phone + 3 nums)
    assert out["n_redactions"].to_pylist() == [5, 1, 0, None]


def test_repetition_metrics_batch():
    t = pa.table(
        {
            "text": [
                "spam spam spam spam eggs",  # 4/5 > 1/5 -> flagged
                "a b c d e",  # 1/5 not > 1/5 -> not flagged
                "  ",  # no tokens
            ]
        }
    )
    out = tx.repetition_metrics_batch(t)
    assert out["n_words"].to_pylist() == [5, 5, 0]
    assert out["top_word_n"].to_pylist() == [4, 1, 0]
    assert out["flagged"].to_pylist() == [True, False, False]


def test_bigram_counts_partial():
    t = pa.table({"text": ["a b a b", "b a", None, "solo"]})
    out = tx.bigram_counts_partial(t)
    counts = dict(zip(out["bigram"].to_pylist(), out["n"].to_pylist()))
    # bigrams never cross document boundaries; "solo" has none
    assert counts == {"a b": 2, "b a": 2}


# ------------------------------------------------- conversation level


def dup_conv_table() -> pa.Table:
    # A and B are turn-for-turn identical; C differs in one role
    rows = [
        ("A", 0, "user", "hi"),
        ("A", 1, "assistant", "hello"),
        ("B", 0, "user", "hi"),
        ("B", 1, "assistant", "hello"),
        ("C", 0, "assistant", "hi"),
        ("C", 1, "assistant", "hello"),
    ]
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
        }
    )


def test_conv_content_and_dedup_grouping(ray_session):
    import ray

    out = (
        tr.conv_content(
            ray.data.from_arrow(dup_conv_table()), "conv_id", "turn_idx", "role", "text"
        )
        .to_pandas()
        .set_index("conv_id")
    )
    assert out.loc["A", "content"] == out.loc["B", "content"]
    assert out.loc["A", "content"] != out.loc["C", "content"]
    assert out.loc["A", "content"] == "user|hi\x1eassistant|hello"
    assert out["n_turns"].tolist() == [2, 2, 2]


def test_alternation_check(ray_session):
    import ray

    t = pa.table(
        {
            "conv_id": ["A", "A", "A", "B", "B"],
            "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int32()),
            "role": ["user", "user", "assistant", "assistant", "user"],
        }
    )
    out = (
        tr.alternation_check(ray.data.from_arrow(t), "conv_id", "turn_idx", "role")
        .to_pandas()
        .set_index("conv_id")
    )
    assert bool(out.loc["A", "starts_ok"]) is True
    assert out.loc["A", "n_breaks"] == 1  # user,user adjacent
    assert bool(out.loc["B", "starts_ok"]) is False
    assert out.loc["B", "n_breaks"] == 0


def test_sft_examples(ray_session):
    import ray

    ds = ray.data.from_arrow(conv_table())
    out = (
        tr.sft_examples(ds, "conv_id", "turn_idx", "role", "text", budget=8)
        .to_pandas()
        .sort_values(["conv_id", "chunk_id"])
        .reset_index(drop=True)
    )
    a0 = out[(out.conv_id == "A") & (out.chunk_id == 0)].iloc[0]
    # A chunk 0 = turns 0 (3 tok) + 1 (5 tok)
    assert a0.example == "user: one two three\nassistant: a b c d e"
    assert a0.n_turns == 2 and a0.n_tokens == 8
    a1 = out[(out.conv_id == "A") & (out.chunk_id == 1)].iloc[0]
    assert a1.example == "user: w x y z\nassistant: ok done"


# -------------------------------------------------- oracle-parity edges


def test_token_count_re2_parity_unicode_whitespace():
    import duckdb

    texts = ["a b", None, "  x  ", "normal text", " x y ", ""]
    eng = tr._whitespace_tokens(pd.Series(texts, dtype=object))
    ora = (
        duckdb.sql(
            "SELECT CAST(len(regexp_extract_all(COALESCE(t, ''), '\\S+')) AS BIGINT) "
            "FROM (SELECT unnest($1) AS t)",
            params=[texts],
        )
        .df()
        .iloc[:, 0]
        .to_numpy(np.int64)
    )
    assert eng.tolist() == ora.tolist()
    # RE2 \s is ASCII-only: the NBSP-joined pair is ONE token on both sides
    assert eng[0] == 1


def test_split_words_re2_parity_unicode_edges():
    import duckdb

    texts = [" x y ", " a  b ", None, ""]
    vals, parent, _ = tx._split_words(pa.array(texts, pa.string()))
    ora = duckdb.sql(
        "SELECT unnest(regexp_extract_all(t, '\\S+')) FROM (SELECT unnest($1) AS t)",
        params=[texts],
    ).df().iloc[:, 0].tolist()
    assert vals.tolist() == ora
    assert vals.tolist() == [" x", "y ", "a", "b"]


def test_pack_null_text_parity_with_recursive_oracle():
    """Null-text turns must not freeze the oracle's running cum (NULL
    poisoning) — both sides count nulls as 0 tokens and keep packing."""
    import duckdb
    import ray

    t = pa.table(
        {
            "conv_id": ["N"] * 4,
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "text": ["a b c d e", None, "f g h i j", "k l m n o"],
        }
    )
    eng = (
        tr.pack_context_windows(ray.data.from_arrow(t), "conv_id", "turn_idx", "text", 8)
        .to_pandas()
        .sort_values("turn_idx")
    )
    ora = duckdb.sql(
        """
        WITH RECURSIVE base AS (
          SELECT conv_id, turn_idx,
                 CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS BIGINT) AS n_tokens,
                 CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS pos
          FROM t
        ), rec AS (
          SELECT conv_id, turn_idx, pos, n_tokens, CAST(0 AS BIGINT) AS chunk_id, n_tokens AS cum
          FROM base WHERE pos = 1
          UNION ALL
          SELECT b.conv_id, b.turn_idx, b.pos, b.n_tokens,
                 CASE WHEN r.cum + b.n_tokens > 8 THEN r.chunk_id + 1 ELSE r.chunk_id END,
                 CASE WHEN r.cum + b.n_tokens > 8 THEN b.n_tokens ELSE r.cum + b.n_tokens END
          FROM rec r JOIN base b ON b.conv_id = r.conv_id AND b.pos = r.pos + 1
        )
        SELECT turn_idx, n_tokens, chunk_id FROM rec ORDER BY turn_idx
        """,
        params=None,
    ).df()
    assert eng["chunk_id"].tolist() == ora["chunk_id"].tolist() == [0, 0, 1, 2]
    assert eng["n_tokens"].tolist() == ora["n_tokens"].tolist()


def test_pack_skewed_long_conversation_linear_memory(ray_session):
    """One 3000-turn conversation among many single-turn ones — the CSR
    packing path must stay linear in rows (the dense-matrix formulation
    would allocate n_conv x max_turns)."""
    import ray

    n_small = 500
    conv = ["long"] * 3000 + [f"s{i}" for i in range(n_small)]
    idx = list(range(3000)) + [0] * n_small
    t = pa.table(
        {
            "conv_id": conv,
            "turn_idx": pa.array(idx, pa.int32()),
            "text": ["w w w"] * len(conv),
        }
    )
    out = (
        tr.pack_context_windows(ray.data.from_arrow(t), "conv_id", "turn_idx", "text", 7)
        .to_pandas()
    )
    long = out[out.conv_id == "long"].sort_values("turn_idx")
    # budget 7, 3 tokens per turn -> chunks of 2 turns each
    assert long["chunk_id"].tolist() == [i // 2 for i in range(3000)]
    assert (out[out.conv_id != "long"]["chunk_id"] == 0).all()


def test_pack_long_conv_tier_matches_position_loop(monkeypatch):
    """The per-chunk binary-search path (conversations > _LONG_CONV) must be
    chunk-for-chunk identical to the vectorized position loop — including
    over-budget single rows (lone chunk), zero-token rows after an
    over-budget opener (new chunk), and exact-budget boundaries (join)."""
    rng = np.random.default_rng(11)
    frames = []
    # adversarial hand-built stream: opener over budget, zero-token rows,
    # exact-budget fits
    texts = [
        "a " * 20,          # 20 tokens > budget 8 -> lone chunk 0
        "",                 # 0 tokens after over-budget opener -> chunk 1
        "b b b",            # 3 -> joins chunk 1 (cum 3)
        "c c c c c",        # 5 -> cum 8 == budget -> joins chunk 1
        "",                 # 0 -> cum still 8 -> joins
        "d",                # 1 -> cum 9 > 8 -> chunk 2
    ]
    frames.append(
        pd.DataFrame({"k": "edge", "o": range(len(texts)), "text": texts})
    )
    # randomized conversations at varied lengths
    for ci in range(6):
        n = int(rng.integers(1, 400))
        ntok = rng.integers(0, 6, n)
        frames.append(
            pd.DataFrame(
                {
                    "k": f"c{ci}",
                    "o": range(n),
                    "text": [" ".join(["w"] * t) for t in ntok],
                }
            )
        )
    g = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=0)

    fn = tr.pack_bucket_fn("k", "o", "text", budget=8)
    monkeypatch.setattr(tr, "_LONG_CONV", 10**9)  # everything short
    short = fn(g.copy()).sort_values(["k", "o"]).reset_index(drop=True)
    monkeypatch.setattr(tr, "_LONG_CONV", 0)  # everything long
    long_ = fn(g.copy()).sort_values(["k", "o"]).reset_index(drop=True)

    assert short["chunk_id"].tolist() == long_["chunk_id"].tolist()
    assert short["n_tokens"].tolist() == long_["n_tokens"].tolist()
    # spot-check the hand-built edge stream against the spec
    e = short[short["k"] == "edge"].sort_values("o")
    assert e["chunk_id"].tolist() == [0, 1, 1, 1, 1, 2]
