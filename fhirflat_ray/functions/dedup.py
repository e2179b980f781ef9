"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All are Ray-Data-first:

- exact dedup = vectorized content hash per batch → ``groupby(hash)`` →
  keep min-id per group (one shuffle on the hash key);
- MinHash+LSH = per-batch shingling+minhash (numpy matrix ops) → explode to
  (band, band_hash, doc_id) rows → ``groupby(band, band_hash)`` → candidate
  pairs → vectorized Jaccard verification (no driver-side loops);
- SimHash = per-batch 64-bit simhash; near-dup candidates via identical
  simhash bucket (Hamming-0 buckets; Hamming-k would re-bucket k rotations).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: Mersenne prime 2^31-1: keeps (a*x + b) inside int64 (a, x < 2^31 →
#: product < 2^62), so the universal-hash family evaluates as ONE vectorized
#: numpy matrix op per document instead of a Python loop per hash function.
_MERSENNE = (1 << 31) - 1


# ---------------------------------------------------------------- exact


def add_content_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    """Stable 64-bit content hash, vectorized.

    ``pandas.util.hash_array`` (siphash in C, deterministic across processes
    and Ray blocks — the same primitive MinHash/SimHash use for vocabulary
    hashing) replaces the round-1 per-row ``hashlib.sha1`` loop. The
    downstream keep-min-representative is hash-agnostic, so the groupby key
    only needs determinism, not any particular digest."""
    import pandas.util as pdu

    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    texts = pc.fill_null(col, "").to_numpy(zero_copy_only=False)
    h = pdu.hash_array(np.asarray(texts, dtype=object)) >> np.uint64(1)
    return batch.append_column("content_hash", pa.array(h.astype(np.int64), pa.int64()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Keep the min-id representative of every distinct ``column`` value.

    Hash-partition + per-group-first (SURVEY.md §2.7): the shuffle key is the
    64-bit content hash, never the full text, so the exchange is narrow."""
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, column), batch_format="pyarrow"
    )

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[[g[id_column].idxmin()]]

    return (
        hashed.groupby("content_hash")
        .map_groups(first_per_group, batch_format="pandas")
        .drop_columns(["content_hash"])
    )


# ---------------------------------------------------------------- shingles


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of word k-shingles (int64, sorted unique)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.fromiter(
        (
            int.from_bytes(hashlib.sha1(s.encode()).digest()[:4], "big") & (_MERSENNE - 1)
            for s in shingles
        ),
        dtype=np.int64,
        count=len(shingles),
    )
    return np.unique(out)


class MinHasher:
    """Per-batch MinHash signatures (stateful: permutation params built once).

    ``n_hashes`` universal-hash permutations ``(a*x + b) mod p`` evaluated as
    a numpy matrix per document."""

    def __init__(self, n_hashes: int = 64, k: int = 5, seed: int = 42, column: str = "text"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
        self.k = k
        self.column = column
        self.n_hashes = n_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.n_hashes, dtype=np.int64)
        # one vectorized (n_shingles, n_hashes) evaluation; products stay
        # inside int64 because a, x < 2^31
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def batch_signatures(self, texts: pa.Array) -> np.ndarray:
        """Fully vectorized (n_docs, n_hashes) signatures for a whole batch.

        Tokenize with Arrow, factorize tokens to int codes, compute k-shingle
        rolling polynomial hashes over the flat code stream (k passes), mask
        shingles that cross document boundaries, evaluate every universal
        hash as one flat array op, and take per-document minima with
        ``np.minimum.reduceat`` — no Python loop over documents."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        n_docs = len(texts)
        parts = pc.split_pattern_regex(texts, r"\s+")
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts)
        denc = flat.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        # token values are hashed DETERMINISTICALLY (stable across batches,
        # blocks and processes) via the small per-batch vocabulary — using
        # raw dictionary codes would make signatures batch-local and LSH
        # would only ever match duplicates inside one block
        import pandas.util as pdu

        vocab_hash = (
            pdu.hash_array(np.asarray(denc.dictionary.to_pylist(), dtype=object))
            % np.uint64(_MERSENNE - 1)
        ).astype(np.int64) + 1
        idx = denc.indices.to_numpy(zero_copy_only=False)
        codes = vocab_hash[idx]

        total = len(codes)
        k = self.k
        B = np.int64(1_000_003)
        # rolling polynomial hash of each k-window over the flat stream
        n_win = max(0, total - k + 1)
        acc = np.zeros(max(n_win, 0), dtype=np.int64)
        for j in range(k):
            acc = (acc * B + codes[j : j + n_win]) % _MERSENNE
        # document boundaries in the flat stream
        offs = np.concatenate([[0], np.cumsum(counts)])
        sigs = np.full((n_docs, self.n_hashes), _MERSENNE, dtype=np.int64)
        # shingle ownership: window starting at i belongs to the doc whose
        # span fully contains [i, i+k); windows crossing boundaries dropped
        if n_win > 0:
            starts = np.arange(n_win)
            doc_of = np.searchsorted(offs, starts, side="right") - 1
            valid = starts + k <= offs[doc_of + 1]
            sh = acc[valid]
            own = doc_of[valid]
        else:
            sh = np.array([], dtype=np.int64)
            own = np.array([], dtype=np.int64)
        # short documents (fewer than k tokens) hash their whole token run
        short = np.nonzero(counts < k)[0]
        if len(short):
            sh_extra = np.zeros(len(short), dtype=np.int64)
            for rank, d in enumerate(short):
                seg = codes[offs[d] : offs[d + 1]]
                h = np.int64(0)
                for c in seg:
                    h = (h * B + c) % _MERSENNE
                sh_extra[rank] = h
            sh = np.concatenate([sh, sh_extra])
            own = np.concatenate([own, short])
        if len(sh) == 0:
            sigs[:] = 0
            return sigs
        order = np.argsort(own, kind="stable")
        sh, own = sh[order], own[order]
        present, first_idx = np.unique(own, return_index=True)
        for h in range(self.n_hashes):
            vals = (sh * self.a[h] + self.b[h]) % _MERSENNE
            sigs[present, h] = np.minimum.reduceat(vals, first_idx)
        sigs[sigs == _MERSENNE] = 0  # docs with no shingles at all
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.batch_signatures(batch[self.column])
        n, m = sigs.shape
        offsets = np.arange(0, (n + 1) * m, m, dtype=np.int32)
        list_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(sigs.reshape(-1), pa.int64())
        )
        return batch.append_column("minhash", list_arr)


def explode_bands(batch: pa.Table, n_bands: int = 16, id_column: str = "doc_id") -> pa.Table:
    """(band_id, band_hash, doc_id) rows from minhash signatures.

    Band hashes are a polynomial fold over each band's signature slice,
    computed for the whole batch as one (n_docs, n_bands, r) matrix op."""
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    mh = batch["minhash"].combine_chunks()
    n_docs = len(mh)
    flat = pc.list_flatten(mh).to_numpy(zero_copy_only=False).astype(np.int64)
    m = flat.size // max(1, n_docs)
    r = m // n_bands
    sig = flat.reshape(n_docs, n_bands, r)
    B = np.int64(1_000_003)
    h = np.zeros((n_docs, n_bands), dtype=np.int64)
    for j in range(r):
        h = (h * B + sig[:, :, j]) % _MERSENNE
    # salt with the band index so identical slices in different bands differ
    h = (h * B + np.arange(n_bands, dtype=np.int64)[None, :]) % _MERSENNE
    return pa.table(
        {
            "band_id": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), n_docs), pa.int32()
            ),
            "band_hash": pa.array(h.reshape(-1), pa.int64()),
            id_column: pa.array(np.repeat(ids, n_bands), pa.int64()),
        }
    )


def minhash_lsh_candidates(ds, id_column: str = "doc_id", n_hashes: int = 64, n_bands: int = 16, column: str = "text"):
    """Candidate near-duplicate pairs via banded MinHash LSH.

    shingle→minhash→band→bucket-groupby (one shuffle on (band_id, band_hash));
    emits one (left, right) row per co-bucketed pair, deduplicated."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"n_hashes": n_hashes, "column": column},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    bands = sigs.select_columns([id_column, "minhash"]).map_batches(
        lambda b: explode_bands(b, n_bands, id_column), batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_column].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"left_id": [], "right_id": []}).astype(np.int64)
        left, right = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"left_id": ids[left], "right_id": ids[right]})

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")

    def dedupe_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["left_id", "right_id"]).map_groups(dedupe_pairs, batch_format="pandas")


# ---------------------------------------------------------------- jaccard


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


class JaccardVerifier:
    """Verify candidate pairs against true n-gram Jaccard (actor-pool stage).

    Expects rows (left_id, right_id, left_text, right_text)."""

    def __init__(self, k: int = 5, threshold: float = 0.7):
        self.k = k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = [
            ngram_jaccard(l or "", r or "", self.k)
            for l, r in zip(batch["left_text"].to_pylist(), batch["right_text"].to_pylist())
        ]
        out = batch.append_column("jaccard", pa.array(sims, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], self.threshold))


# ---------------------------------------------------------------- simhash


class SimHasher:
    """63-bit SimHash per document, fully vectorized per batch.

    Token bit-vectors come from a deterministic hash of the small per-batch
    vocabulary (block-invariant, like MinHash); per-document bit sums use
    ``np.add.reduceat`` over the flat token stream — no Python loop over
    documents or tokens."""

    def __init__(self, column: str = "text"):
        self.column = column

    def batch_simhashes(self, texts: pa.Array) -> np.ndarray:
        import pandas.util as pdu

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        n_docs = len(texts)
        parts = pc.split_pattern_regex(texts, r"\s+")
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts)
        denc = flat.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        vocab_h = pdu.hash_array(np.asarray(denc.dictionary.to_pylist(), dtype=object))
        # (vocab, 64) signed bit matrix: +1/-1 per bit of the token hash
        vb = np.unpackbits(
            vocab_h.astype("<u8").view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int8)
        vb = (2 * vb.astype(np.int16) - 1)
        idx = denc.indices.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        acc = np.zeros((n_docs, 64), dtype=np.int64)
        if len(idx):
            # 64 bincount passes (8MB working set each) instead of one
            # (tokens x 64) int64 matrix — first-touch memory is the scarce
            # resource on this host, not arithmetic
            for j in range(64):
                acc[:, j] = np.bincount(
                    doc_of, weights=vb[idx, j], minlength=n_docs
                ).astype(np.int64)
        bits = (acc > 0).astype(np.uint8)
        packed = np.packbits(bits, axis=1, bitorder="little")
        out = packed.reshape(-1).view("<u8").astype(np.uint64)
        return (out >> np.uint64(1)).astype(np.int64)  # keep in int64 range

    def simhash(self, text: str) -> int:
        return int(self.batch_simhashes(pa.array([text], pa.string()))[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = self.batch_simhashes(batch[self.column])
        return batch.append_column("simhash", pa.array(hs, pa.int64()))


def simhash_dedup(ds, id_column: str = "doc_id", column: str = "text"):
    """Exact-bucket SimHash dedup: keep min id per identical simhash."""
    hashed = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"column": column},
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[[g[id_column].idxmin()]]

    return hashed.groupby("simhash").map_groups(first, batch_format="pandas")
