"""Benchmark decontamination: remove corpus documents that overlap an
evaluation set (the GPT-3-style n-gram contamination filter every serious
training-data pipeline runs before training).

Semantics: a corpus document is CONTAMINATED when at least ``min_hits`` of
its distinct word n-grams appear anywhere in the eval set's n-gram set.
Matching is on exact n-gram STRINGS (not hashes): the eval set is bounded,
so exactness costs nothing at scale and makes the operator bit-identical to
its SQL oracle with no collision caveat.

Scale shape: the eval n-gram set builds once (eval sets are small by
definition — thousands of documents) and broadcasts once via ``ray.put``;
the corpus pass is MAP-ONLY — per batch: one vectorized flat-token explode,
one pandas shifted-concat to form n-grams, one Arrow ``is_in`` against the
broadcast set, one bincount per doc. No shuffle, no all-to-all; 100 TB of
corpus streams through untouched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _flat_ngrams(texts: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Word n-gram strings for a batch of documents, vectorized.

    Returns ``(grams, own)``: flat object array of n-gram strings and the
    owning document index per gram. Tokenization is whitespace-split on
    trimmed text (matches ``regexp_extract_all(text, '\\S+')`` — the same
    convention as the shingle machinery in ``dedup.py``). Documents shorter
    than ``n`` tokens contribute their whole space-joined token run, so
    every non-empty document has at least one gram."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.utf8_trim_whitespace(pc.fill_null(texts, ""))
    s = texts.to_pandas()
    tokens = s.str.split()
    counts = tokens.str.len().to_numpy().astype(np.int64)
    flat = tokens.explode()
    flat = flat[flat.notna()].astype(str).reset_index(drop=True)
    total = int(counts.sum())
    n_win = max(total - n + 1, 0)
    grams_parts: list[np.ndarray] = []
    own_parts: list[np.ndarray] = []
    if n_win > 0:
        # n-gram strings via shifted vectorized concat (pandas C string ops)
        g = flat.iloc[:n_win].reset_index(drop=True)
        for j in range(1, n):
            g = g + " " + flat.iloc[j : j + n_win].reset_index(drop=True)
        offs = np.concatenate([[0], np.cumsum(counts)])
        starts = np.arange(n_win)
        doc_of = np.searchsorted(offs, starts, side="right") - 1
        valid = starts + n <= offs[doc_of + 1]
        grams_parts.append(g.to_numpy(dtype=object)[valid])
        own_parts.append(doc_of[valid])
    short = np.nonzero((counts > 0) & (counts < n))[0]
    if len(short):
        offs = np.concatenate([[0], np.cumsum(counts)])
        fl = flat.to_numpy(dtype=object)
        grams_parts.append(
            np.array(
                [" ".join(fl[offs[d] : offs[d + 1]]) for d in short], dtype=object
            )
        )
        own_parts.append(short)
    if not grams_parts:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    return np.concatenate(grams_parts), np.concatenate(own_parts)


def build_ngram_set(ds, text_col: str, n: int) -> pa.Array:
    """Distinct n-gram strings of an (eval-sized) dataset, collected on the
    driver: per-batch vectorized gram extraction + per-batch dedupe shrink
    the collected stream; the final dedupe touches only distinct-per-batch
    grams."""
    from fhirflat_ray.functions.util import collect_small_table

    def partial(b: pa.Table) -> pa.Table:
        grams, _ = _flat_ngrams(b[text_col], n)
        return pa.table({"g": pa.array(pd.unique(grams), pa.string())})

    t = collect_small_table(ds.map_batches(partial, batch_format="pyarrow"))
    return pc.unique(t["g"].combine_chunks())


def decontaminate(
    corpus_ds,
    eval_grams: pa.Array,
    text_col: str = "text",
    n: int = 4,
    min_hits: int = 3,
    keep_contaminated: bool = False,
):
    """Filter a corpus against a broadcast eval n-gram set (map-only).

    Keeps rows with FEWER than ``min_hits`` distinct n-grams in the eval
    set (or only the contaminated rows with ``keep_contaminated=True``,
    for auditing what was dropped)."""
    import ray

    ref = ray.put(eval_grams)

    def filt(b: pa.Table) -> pa.Table:
        grams, own = _flat_ngrams(b[text_col], n)
        if len(grams) == 0:
            return b if not keep_contaminated else b.slice(0, 0)
        # distinct grams per doc (min_hits counts DISTINCT matches)
        pairs = pd.DataFrame({"own": own, "g": grams}).drop_duplicates()
        hit = pc.is_in(
            pa.array(pairs["g"].to_numpy(dtype=object), pa.string()),
            value_set=ray.get(ref),
        ).to_numpy(zero_copy_only=False)
        hits_per_doc = np.bincount(
            pairs["own"].to_numpy()[hit], minlength=b.num_rows
        )
        contaminated = hits_per_doc >= min_hits
        mask = contaminated if keep_contaminated else ~contaminated
        return b.filter(pa.array(mask))

    return corpus_ds.map_batches(filt, batch_format="pyarrow")
