"""Text-analysis stages for large-scale training-data pipelines.

Every function is a vectorized per-batch transform meant for
``ds.map_batches(..., batch_format="pyarrow")``; the stateful variants
(compiled regexes, stopword tables) are callable classes for actor pools.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------- token count


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Whitespace token count per document (vectorized split + list length)."""
    toks = pc.count_substring_regex(batch[column], r"\S+")
    return batch.append_column("n_tokens", pc.cast(toks, pa.int64()))


class BpeishTokenCounter:
    """Token counting with a BPE-ish word/punct regex, compiled once per actor."""

    PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def __init__(self, column: str = "text"):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch[self.column], self.PATTERN)
        return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


# ------------------------------------------------------------- quality


def quality_score_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Length / punctuation / alpha-ratio quality features, all Arrow kernels."""
    text = batch[column]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    out = batch.append_column("n_chars_text", n_chars)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column(
        "punct_ratio", pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(safe_chars, pa.float64()))
    )
    out = out.append_column(
        "alpha_ratio", pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(safe_chars, pa.float64()))
    )
    return out


# ------------------------------------------------------------- language id


class LangId:
    """Stopword/character n-gram heuristic language ID (actor-pool stage).

    Tables are built once per actor. Deterministic and dependency-free; a
    production deployment would swap in fasttext behind the same interface.
    """

    STOPWORDS = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"},
        "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"},
        "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "no"},
    }

    def __init__(self, column: str = "text"):
        self.column = column
        self.langs = sorted(self.STOPWORDS)
        self.tables = [self.STOPWORDS[lang] for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        scores = []
        lowered = pc.utf8_lower(batch[self.column])
        for table in self.tables:
            pattern = r"\b(?:" + "|".join(sorted(table)) + r")\b"
            scores.append(
                pc.count_substring_regex(lowered, pattern).to_numpy(zero_copy_only=False)
            )
        mat = np.stack(scores, axis=1)  # (n, n_langs)
        best = mat.argmax(axis=1)
        hit = mat.max(axis=1) > 0
        langs = np.array(self.langs, dtype=object)[best]
        langs[~hit] = "und"
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


# ------------------------------------------------------------- fingerprint


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Deterministic document fingerprint (md5 hex of utf-8 text).

    md5 is chosen so the oracle is SQL-expressible (DuckDB ``md5()``) — the
    hexdigest loop is inherently per-row. Production pipelines that only
    need a stable 64-bit identity should use :func:`fingerprint_fast_batch`
    (fully vectorized siphash)."""
    texts = batch[column].combine_chunks()
    fps = [hashlib.md5(t.encode()).hexdigest() if t is not None else None for t in texts.to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def fingerprint_fast_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized 64-bit document fingerprint (production default).

    ``pandas.util.hash_array`` — siphash in C, deterministic across
    processes and Ray blocks (the same primitive the dedup family keys on).
    Nulls stay null."""
    import pandas.util as pdu

    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(col, "").to_numpy(zero_copy_only=False)
    h = (pdu.hash_array(np.asarray(vals, dtype=object)) >> np.uint64(1)).astype(np.int64)
    return batch.append_column(
        "fingerprint64", pa.array(np.where(mask, 0, h), pa.int64(), mask=mask)
    )


def rolling_hash_batch(batch: pa.Table, column: str = "text", window: int = 16) -> pa.Table:
    """Winnowing-style rolling-hash fingerprint: min of window hashes per doc.

    Fully vectorized over the batch's FLAT utf-8 byte stream (zero-copy from
    the Arrow data buffer): ``window`` strided passes accumulate every
    window's polynomial hash at once, windows crossing document boundaries
    are masked, and per-document minima come from ``np.minimum.reduceat`` —
    no Python loop over documents (round 1 looped per doc). Documents
    shorter than ``window`` bytes hash to their byte sum; nulls stay null."""
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    filled = pc.fill_null(col, "").cast(pa.large_binary())
    n_docs = len(filled)
    off_buf, data_buf = filled.buffers()[1], filled.buffers()[2]
    offs = np.frombuffer(off_buf, dtype=np.int64)[
        filled.offset : filled.offset + n_docs + 1
    ]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8).astype(np.int64)
        if data_buf is not None
        else np.zeros(0, dtype=np.int64)
    )
    base, end = int(offs[0]), int(offs[-1])
    b = data[base:end]
    offs = offs - base
    lens = np.diff(offs)

    out = np.zeros(n_docs, dtype=np.int64)
    # short docs (< window bytes): byte sum (np.add.reduceat needs care with
    # empty segments — compute via cumsum differences instead)
    csum = np.concatenate([[0], np.cumsum(b)])
    sums = csum[offs[1:]] - csum[offs[:-1]]
    short = lens < window
    out[short] = sums[short]

    n_win = len(b) - window + 1
    if n_win > 0:
        weights = np.power(31, np.arange(window, dtype=np.int64), dtype=np.int64)
        acc = np.zeros(n_win, dtype=np.int64)
        with np.errstate(over="ignore"):
            for j in range(window):
                acc += b[j : j + n_win] * weights[j]
        starts = np.arange(n_win)
        doc_of = np.searchsorted(offs, starts, side="right") - 1
        valid = (starts + window <= offs[doc_of + 1]) & ~short[doc_of]
        acc, doc_of = acc[valid], doc_of[valid]
        order = np.argsort(doc_of, kind="stable")
        acc, doc_of = acc[order], doc_of[order]
        present, first_idx = np.unique(doc_of, return_index=True)
        out[present] = np.minimum.reduceat(acc, first_idx)

    return batch.append_column(
        "rolling_fp", pa.array(np.where(null_mask, None, out), pa.int64(), mask=null_mask)
    )


# ------------------------------------------------------------- PII scrub


#: applied in order; counts are over the ORIGINAL text per pattern (a digit
#: run inside a phone number is counted by both the phone and number
#: patterns — deterministic and mirrored exactly by the SQL oracle)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d+\b", "<NUM>"),
]


def pii_scrub_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Redact emails / phone numbers / standalone digit runs — the map-only
    scrubbing pass a corpus goes through before training. Both pyarrow and
    the DuckDB oracle run RE2, so the patterns behave identically on both
    sides. Adds ``clean_<column>`` and ``n_redactions``."""
    text = batch[column]
    clean = text
    n_red = pa.chunked_array([pa.array(np.zeros(len(text), np.int64))])
    for pat, rep in PII_PATTERNS:
        n_red = pc.add(n_red, pc.cast(pc.count_substring_regex(text, pat), pa.int64()))
        clean = pc.replace_substring_regex(clean, pat, rep)
    out = batch.append_column(f"clean_{column}", clean)
    return out.append_column("n_redactions", n_red)


# ------------------------------------------------------------- repetition


def _split_words(arr) -> tuple[np.ndarray, np.ndarray, int]:
    """RE2 ``\\s+`` tokenization of a whole batch column: returns
    ``(vals, parent, n_docs)`` with empty tokens filtered (split emits ''
    at whitespace edges). No Unicode trim — RE2's ``\\s`` is ASCII-only and
    the DuckDB oracles (``regexp_extract_all(text, '\\S+')``) are RE2 too,
    so a Unicode-aware pre-trim would DESYNC token identity on characters
    like U+00A0."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    words = pc.split_pattern_regex(arr, r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy()
    vals = words.values.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(words), dtype=np.int64), np.diff(offs))
    nonempty = vals != ""
    return vals[nonempty], parent[nonempty], len(words)


def repetition_metrics_batch(
    batch: pa.Table,
    column: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 5,
) -> pa.Table:
    """Gopher/C4-style repetition signal: the count of a document's single
    most frequent token vs its total tokens. Docs where
    ``top_word_n / n_words > threshold_num / threshold_den`` are flagged
    for removal — the comparison is exact integer math
    (``top_word_n * den > n_words * num``) so the oracle can mirror it with
    no float-rounding ambiguity. Map-only (each document is one row, so the
    whole computation is per-batch): Arrow regex split -> offsets ->
    one pandas C-engine groupby across ALL documents in the batch."""
    import pandas as pd

    vals, parent, _ = _split_words(batch[column])
    n_docs = len(batch)
    mx = np.zeros(n_docs, np.int64)
    tot = np.zeros(n_docs, np.int64)
    if len(vals):
        counts = (
            pd.DataFrame({"d": parent, "w": vals})
            .groupby(["d", "w"], sort=False)
            .size()
        )
        per_doc = counts.groupby(level="d", sort=False)
        mx_s, tot_s = per_doc.max(), per_doc.sum()
        mx[mx_s.index.to_numpy()] = mx_s.to_numpy()
        tot[tot_s.index.to_numpy()] = tot_s.to_numpy()

    out = batch.append_column("n_words", pa.array(tot, pa.int64()))
    out = out.append_column("top_word_n", pa.array(mx, pa.int64()))
    return out.append_column(
        "flagged", pa.array(mx * threshold_den > tot * threshold_num, pa.bool_())
    )


# ------------------------------------------------------------- n-grams


def bigram_counts_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-batch partial bigram counts (the A5 combiner pattern: shrink the
    shuffle to one row per in-batch distinct bigram before any groupby).
    Consecutive-token pairing is pure numpy over the Arrow list offsets."""
    import pandas as pd

    vals, parent, _ = _split_words(batch[column])
    if len(vals) < 2:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    same = parent[1:] == parent[:-1]
    big = pd.Series(vals[:-1][same]).str.cat(pd.Series(vals[1:][same]), sep=" ")
    c = big.value_counts(sort=False)
    return pa.table(
        {"bigram": pa.array(c.index, pa.string()), "n": pa.array(c.to_numpy(np.int64))}
    )


# ------------------------------------------------------ inverted index


def term_doc_tf(batch: pa.Table, id_col: str = "doc_id", column: str = "text") -> pa.Table:
    """(term, doc_id, tf) postings for one batch — the inverted-index map
    stage. A document is one row, so the per-batch result is EXACT (not a
    partial): every downstream consumer can treat `(term, doc_id)` as
    globally unique. Tokenization is the engine-wide RE2 ``\\s+`` split
    (see :func:`_split_words`); the pairing/counting is one pandas
    C-groupby over the exploded arrays."""
    import pandas as pd

    vals, parent, _ = _split_words(batch[column])
    if len(vals) == 0:
        return pa.table({
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        })
    doc_ids = batch[id_col].to_numpy()
    df = pd.DataFrame({"term": vals, "doc_id": doc_ids[parent]})
    g = df.groupby(["term", "doc_id"], sort=False).size().reset_index(name="tf")
    return pa.table({
        "term": pa.array(g["term"], pa.string()),
        "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
        "tf": pa.array(g["tf"].to_numpy(np.int64)),
    })


# ------------------------------------------------------ chunking (RAG prep)


def chunk_documents_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    column: str = "text",
    size: int = 32,
    stride: int = 16,
) -> pa.Table:
    """Split each document into overlapping token-window chunks — the
    RAG / pretraining context-chunking primitive. Chunk ``i`` of a document
    covers whitespace tokens ``[i*stride, i*stride+size)``; the tail chunk
    may be shorter, a 0-token document emits nothing. A document is one
    row, so this is map-only and the per-batch output is exact.

    Fully vectorized despite the jagged overlap fan-out: tokens stay an
    Arrow string array end to end (one RE2 split, one ``take`` with a
    numpy-computed flat index, one ``binary_join`` back to chunk text) —
    no Python per document or per chunk. Peak memory is input tokens ×
    ``size/stride`` (the overlap factor), so callers bound fan-out by the
    stride, not by batch size.

    Output: ``(id_col, chunk_idx, n_tokens, chunk_text)``.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    arr = batch[column]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    words = pc.split_pattern_regex(arr, r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy()
    flat = words.values
    nonempty = pc.not_equal(flat, "")
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(words), dtype=np.int64), np.diff(offs))[ne_np]
    toks = flat.filter(nonempty)

    n_docs = len(batch)
    n_tok = np.bincount(parent, minlength=n_docs)
    doc_start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])

    empty = pa.table(
        {
            id_col: pa.array([], batch.schema.field(id_col).type),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    nc = (n_tok + stride - 1) // stride  # chunks per doc (0 for empty docs)
    total = int(nc.sum())
    if total == 0:
        return empty

    chunk_doc = np.repeat(np.arange(n_docs, dtype=np.int64), nc)
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(nc) - nc, nc
    )
    starts = chunk_idx * stride
    lens = np.minimum(starts + size, n_tok[chunk_doc]) - starts

    flat_chunk = np.repeat(np.arange(total, dtype=np.int64), lens)
    within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    tok_idx = doc_start[chunk_doc][flat_chunk] + starts[flat_chunk] + within

    chunk_tokens = pc.take(toks, pa.array(tok_idx, pa.int64()))
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), chunk_tokens)
    text_out = pc.binary_join(lists, " ")

    ids = batch[id_col].take(pa.array(chunk_doc, pa.int64()))
    return pa.table(
        {
            id_col: ids,
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(lens.astype(np.int64)),
            "chunk_text": text_out,
        }
    )


def _byte_matrix(
    texts, prefix_chars: int | None, pad_to: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) zero-padded byte-code matrix + per-text byte lengths, built
    zero-copy from the Arrow string buffers (byte == char on ASCII, the
    documented domain of the Levenshtein kernels)."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.fill_null(texts, "")
    if prefix_chars is not None:
        t = pc.utf8_slice_codeunits(t, 0, prefix_chars)
    t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
    n = len(t)
    off_buf, data_buf = t.buffers()[1], t.buffers()[2]
    offsets = np.frombuffer(off_buf, np.int32)[t.offset : t.offset + n + 1].astype(
        np.int64
    )
    data = (
        np.frombuffer(data_buf, np.uint8)
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    lens = offsets[1:] - offsets[:-1]
    L = pad_to if pad_to is not None else (int(lens.max()) if n else 0)
    A = np.zeros((n, L), dtype=np.int32)
    if L and n and int(lens.sum()):
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        col = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(np.concatenate([[0], lens[:-1]])), lens
        )
        A[row, col] = data[offsets[0] : offsets[-1]][
            np.repeat(offsets[:-1] - offsets[0], lens) + col
        ]
    return A, lens


def levenshtein_probe_batch(
    texts: "pa.Array", probe: str, prefix_chars: int | None = None
) -> np.ndarray:
    """Vectorized Levenshtein distance of every text (optionally its first
    ``prefix_chars`` characters) against ONE probe string.

    The DP runs column-wise across the WHOLE batch at once: for an
    m-char probe and L-char texts it is m x L numpy ops over (n,) vectors
    — no Python loop over rows (the fuzzy-match scoring kernel for
    blocklist/near-miss screening; ASCII-safe, mirroring SQL
    ``levenshtein`` which counts characters)."""
    n = len(texts)
    if n == 0:
        return np.array([], dtype=np.int64)
    A, lens = _byte_matrix(texts, prefix_chars)
    L = A.shape[1]
    m = len(probe)
    pcodes = np.frombuffer(probe.encode("latin-1", "replace"), np.uint8).astype(
        np.int32
    )
    # prev[j] = distance(probe[:i], text[:j]) for the whole batch
    prev = np.tile(np.arange(L + 1, dtype=np.int64), (n, 1))
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub_cost = (A != pcodes[i - 1]).astype(np.int64)
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub_cost[:, j - 1],
            )
        prev = cur
    return prev[np.arange(n), lens]


def levenshtein_pairs_batch(
    left: "pa.Array", right: "pa.Array", prefix_chars: int | None = None
) -> np.ndarray:
    """Vectorized PAIRWISE Levenshtein: distance(left[i], right[i]) for
    every aligned pair in one batch-wide DP — Lmax x L numpy ops over
    (n_pairs,) vectors, no Python loop over pairs. The verification
    kernel for blocked fuzzy joins (ASCII-safe, mirrors SQL
    ``levenshtein``)."""
    n = len(left)
    if n == 0:
        return np.array([], dtype=np.int64)
    A, lens_l = _byte_matrix(left, prefix_chars)
    B, lens_r = _byte_matrix(right, prefix_chars, pad_to=None)
    L = B.shape[1]
    m = A.shape[1]
    res = np.zeros(n, dtype=np.int64)
    rows = np.arange(n)
    done0 = lens_l == 0
    res[done0] = lens_r[done0]
    # prev[p, j] = distance(left[p][:i], right[p][:j])
    prev = np.tile(np.arange(L + 1, dtype=np.int64), (n, 1))
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub_cost = (B != A[:, i - 1 : i]).astype(np.int64)
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub_cost[:, j - 1],
            )
        hit = lens_l == i
        if hit.any():
            res[hit] = cur[rows[hit], lens_r[hit]]
        prev = cur
    return res


# ---------------------------------------------------------------- BPE train


def word_frequencies(ds, column: str = "text", max_words: int = 65536):
    """Distributed word-frequency table, deterministically capped.

    Per-batch vectorized pre-reduce (``value_counts`` over the flat token
    stream shrinks the shuffle to one row per in-batch word) → narrow
    ``groupby(word)`` sum → deterministic top-``max_words`` by
    ``(count DESC, word ASC)`` via the streaming top-k (map-only, no
    global sort). Returns a pyarrow Table ``(word, f)`` — vocabulary-scale,
    orders smaller than the corpus, which is what makes driver-side BPE
    training over it honest at web scale."""
    from ray.data.aggregate import Sum

    from fhirflat_ray.functions.util import streaming_topk

    def wc(b: pa.Table) -> pa.Table:
        arr = b[column]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        words = pc.split_pattern_regex(pc.fill_null(arr, ""), r"\s+")
        flat = words.values if not isinstance(words, pa.ChunkedArray) else words.combine_chunks().values
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "f": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(wc, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("f", alias_name="f"))
    )
    return streaming_topk(counts, keys=["f", "word"], k=max_words, descending=[True, False])


def bpe_train_merges(word_freq: pa.Table, n_merges: int = 8) -> pa.Table:
    """Classic BPE merge training over a word-frequency table (Sennrich et
    al. 2016 — the reference implementation's own space-joined-symbols +
    string-replace merge rule, made boundary-safe with ``<sym>`` sentinels
    so a merged symbol can never suffix-match inside a longer one).

    Runs on the driver over the CAPPED vocabulary table (see
    :func:`word_frequencies`) — the corpus never enters this loop; this is
    the same compact-statistics-then-local-train shape production BPE
    trainers (HF tokenizers, SentencePiece) use. Deterministic: best pair
    per round by ``(count DESC, left ASC, right ASC)``; merge application
    is left-to-right non-overlapping (exactly ``str.replace``). Stops
    early if no adjacent pairs remain.

    Output: ``(merge_rank, l_sym, r_sym, cnt)``.
    """
    merges, _ = _bpe_loop(word_freq, n_merges)
    ranks, ls, rs, cs = zip(*merges) if merges else ((), (), (), ())
    return pa.table(
        {
            "merge_rank": pa.array(list(ranks), pa.int64()),
            "l_sym": pa.array(list(ls), pa.string()),
            "r_sym": pa.array(list(rs), pa.string()),
            "cnt": pa.array(list(cs), pa.int64()),
        }
    )


def _bpe_loop(word_freq: pa.Table, n_merges: int):
    """Shared trainer core: returns ``(merges, ss)`` where ``merges`` is a
    list of ``(rank, left, right, count)`` and ``ss`` the final sentinel
    symbol string per vocabulary word (same row order as ``word_freq``)."""
    from collections import Counter

    words = word_freq["word"].to_pylist()
    freqs = word_freq["f"].to_pylist()
    ss = ["<" + "><".join(w) + ">" for w in words]
    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts: Counter = Counter()
        for s, f in zip(ss, freqs):
            lst = s[1:-1].split("><")
            for a, b in zip(lst, lst[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        (l, r), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        pat, rep = f"<{l}><{r}>", f"<{l}{r}>"
        ss = [s.replace(pat, rep) for s in ss]
    return merges, ss


def bpe_token_counts(word_freq: pa.Table, n_merges: int = 8) -> pa.Table:
    """Train BPE and return the per-vocabulary-word token count after all
    merges — the compact ``(word, n_tok)`` lookup an apply stage broadcasts.
    A word's token count is its symbol count in the final sentinel string
    (``count('><') + 1``)."""
    _, ss = _bpe_loop(word_freq, n_merges)
    n_tok = np.fromiter((s.count("><") + 1 for s in ss), dtype=np.int64, count=len(ss))
    return pa.table({"word": word_freq["word"], "n_tok": pa.array(n_tok, pa.int64())})


def train_bpe(ds, column: str = "text", n_merges: int = 8, max_words: int = 65536) -> pa.Table:
    """End-to-end BPE vocabulary training: distributed word counting
    (:func:`word_frequencies`) + driver merge loop over the compact table
    (:func:`bpe_train_merges`)."""
    return bpe_train_merges(word_frequencies(ds, column=column, max_words=max_words), n_merges=n_merges)


class BpeVocabTokenCounter:
    """Actor-pool stage: per-document token count under a TRAINED BPE vocab.

    ``__init__`` fetches the broadcast ``(word, n_tok)`` lookup once per
    worker (``ray.put`` object ref — the T2 broadcast-small-side pattern,
    /root/reference/fhirflat/ingest.py:358-366) and builds a pandas hash
    index; ``__call__`` is fully vectorized: one RE2 split, one C-hash
    ``get_indexer`` lookup over the flat token stream, char-length fallback
    for out-of-vocab words (``pc.utf8_length``), one ``bincount`` fold back
    to documents. Documents with zero words emit nothing (mirrors the
    oracle's inner unnest)."""

    def __init__(self, lookup_ref, id_col: str = "doc_id", column: str = "text"):
        import pandas as pd
        import ray

        tbl = ray.get(lookup_ref)
        self.index = pd.Index(tbl["word"].to_pylist())
        self.n_tok = tbl["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.id_col = id_col
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.column]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        words = pc.split_pattern_regex(pc.fill_null(arr, ""), r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = words.offsets.to_numpy()
        flat = words.values
        nonempty = pc.not_equal(flat, "")
        ne_np = nonempty.to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(words), dtype=np.int64), np.diff(offs))[ne_np]
        flat = flat.filter(nonempty)

        pos = self.index.get_indexer(flat.to_numpy(zero_copy_only=False))
        counts = np.where(
            pos >= 0,
            self.n_tok[np.clip(pos, 0, None)],
            pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64),
        )
        per_doc = np.bincount(parent, weights=counts, minlength=len(words)).astype(
            np.int64
        )
        has_words = np.bincount(parent, minlength=len(words)) > 0
        return pa.table(
            {
                self.id_col: batch[self.id_col].filter(pa.array(has_words)),
                "n_bpe_tokens": pa.array(per_doc[has_words], pa.int64()),
            }
        )


def bigram_doc_tf(batch: pa.Table, id_col: str = "doc_id", column: str = "text") -> pa.Table:
    """(w1, bigram, doc_id, tf) postings for one batch — the bigram-LM map
    stage. Bigrams never cross document boundaries (mask on the parent
    index); a document is one row, so per-batch output is EXACT like
    :func:`term_doc_tf`. Vectorized: one RE2 split, one shifted mask, one
    numpy char-join, one pandas C-groupby."""
    import pandas as pd

    empty = pa.table(
        {
            "w1": pa.array([], pa.string()),
            "bg": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        }
    )
    vals, parent, _ = _split_words(batch[column])
    if len(vals) < 2:
        return empty
    same = parent[:-1] == parent[1:]
    if not same.any():
        return empty
    left = vals[:-1][same]
    right = vals[1:][same]
    doc_ids = batch[id_col].to_numpy()[parent[:-1][same]]
    df = pd.DataFrame(
        {
            "w1": left,
            "bg": np.char.add(np.char.add(left.astype(str), " "), right.astype(str)),
            "doc_id": doc_ids,
        }
    )
    g = df.groupby(["w1", "bg", "doc_id"], sort=False).size().reset_index(name="tf")
    return pa.table(
        {
            "w1": pa.array(g["w1"], pa.string()),
            "bg": pa.array(g["bg"], pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "tf": pa.array(g["tf"].to_numpy(np.int64)),
        }
    )
