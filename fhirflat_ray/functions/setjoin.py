"""EXACT set-similarity self-join via prefix filtering (AllPairs/PPJoin).

The dedup suite's LSH paths (``functions/dedup.py``) trade recall for
selectivity; this module is the EXACT counterpart — every document pair
whose word-``k``-shingle sets have Jaccard >= ``num/den`` is found, with no
probabilistic stage anywhere, using the public prefix-filtering principle
(Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity Search"; Xiao et
al. PPJoin): order every set by one GLOBAL token order (rarest first) and
keep only each set's first ``|s| - ceil(t*|s|) + 1`` tokens — two sets with
Jaccard >= t MUST share at least one prefix token, so candidates shuffle on
prefix tokens only and the guarantee is lossless.

Scale shape:

1. shingle-set extraction is the same block-invariant vectorized stream the
   MinHash/Jaccard machinery uses (``dedup._flat_shingle_stream``);
2. the global token order comes from a distributed document-frequency
   combine + a BOUNDED top-K of common tokens broadcast once (rare tokens —
   the ones prefixes actually keep — order by their hash). The ordering
   choice affects only candidate VOLUME, never correctness, so capping the
   broadcast at K entries keeps driver state bounded at any corpus size;
3. the candidate shuffle ships three narrow int64 columns (token, id, size)
   for PREFIX tokens only; pairs generate per bucket with the length filter
   ``num*max(|a|,|b|) <= den*min(|a|,|b|)`` applied vectorized;
4. exact verification attaches candidate texts hybrid (broadcast under the
   byte budget, distributed hash joins above — the ``near_dedup``
   discipline) and compares with INTEGER math (``den*ni >= num*union``), so
   the SQL oracle mirrors the decision bit-for-bit with no float boundary.

Degenerate inputs (all documents identical) have output quadratic in the
corpus — inherent to an exact join, not an artifact; the per-token posting
cap raises loudly instead of silently exploding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from fhirflat_ray.functions.dedup import _flat_shingle_stream, attach_pair_texts
from fhirflat_ray.functions.util import worker_cached_stage

#: rare-token order keys live in [0, 2^31); common tokens start here so the
#: rarest (non-top-K) tokens always sort first into prefixes
_COMMON_BASE = np.int64(1) << np.int64(32)


def _doc_sets(texts: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted distinct shingle hashes, owner doc index, set size per doc)
    for a batch of texts — the hashed-set universe shared with the LSH and
    verify stages, so candidate generation and verification agree."""
    sh, own, n_docs = _flat_shingle_stream(texts, k)
    keys = np.unique((own << np.int64(31)) | sh)
    owner = (keys >> np.int64(31)).astype(np.int64)
    tok = (keys & np.int64((1 << 31) - 1)).astype(np.int64)
    sizes = np.bincount(owner, minlength=n_docs).astype(np.int64)
    return tok, owner, sizes


def _prefix_len(sizes: np.ndarray, num: int, den: int) -> np.ndarray:
    """|s| - ceil(t*|s|) + 1 with t = num/den in exact integer math."""
    return sizes - (num * sizes + den - 1) // den + 1


class _PairSetVerifier:
    """Exact integer verify of (left_text, right_text) candidate pairs:
    ``den*|a∩b| >= num*|a∪b|`` over the hashed shingle sets — the same
    unique/bincount pass :class:`dedup.JaccardVerifier` uses, kept in
    integers so the SQL oracle's rational compare matches bit-for-bit."""

    def __init__(self, k: int, num: int, den: int):
        self.k, self.num, self.den = k, num, den

    def __call__(self, b: pa.Table) -> pa.Table:
        left = b["left_text"]
        right = b["right_text"]
        if isinstance(left, pa.ChunkedArray):
            left = left.combine_chunks()
        if isinstance(right, pa.ChunkedArray):
            right = right.combine_chunks()
        n = len(left)
        if n == 0:
            return pa.table(
                {"left_id": b["left_id"], "right_id": b["right_id"]}
            )
        both = pa.concat_arrays([pc.fill_null(left, ""), pc.fill_null(right, "")])
        tok, owner, _ = _doc_sets(both, self.k)
        is_left = owner < n
        pair_of = np.where(is_left, owner, owner - n)
        pair_keys = (pair_of << np.int64(31)) | tok
        lk, rk = pair_keys[is_left], pair_keys[~is_left]
        inter = np.intersect1d(lk, rk, assume_unique=True)
        na = np.bincount(pair_of[is_left], minlength=n)
        nb = np.bincount(pair_of[~is_left], minlength=n)
        ni = np.bincount(inter >> np.int64(31), minlength=n)
        union = na + nb - ni
        keep = (self.den * ni >= self.num * union) & (union > 0)
        return pa.table(
            {
                "left_id": b["left_id"].filter(pa.array(keep)),
                "right_id": b["right_id"].filter(pa.array(keep)),
            }
        )


def prefix_jaccard_join(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 5,
    num: int = 7,
    den: int = 10,
    topk_common: int = 1 << 17,
    posting_cap: int = 50_000,
    num_buckets: int | None = None,
):
    """All pairs with word-``k``-shingle Jaccard >= ``num/den`` — EXACT.

    Returns a Dataset of (left_id, right_id) with left_id < right_id."""
    from fhirflat_ray.functions.util import (
        agg_select,
        bucketed_map_groups,
        collect_small_table,
        default_num_buckets,
        distinct_rows,
        streaming_topk,
    )

    if num_buckets is None:
        num_buckets = default_num_buckets()
    txt = ds.select_columns([id_column, text_column])

    # ---- pass 1: document frequency of every shingle (distinct-per-doc
    # already, so a per-batch count partial + Sum combine is exact df)
    def df_partial(b: pa.Table) -> pa.Table:
        tok, _, _ = _doc_sets(b[text_column], k)
        u, c = np.unique(tok, return_counts=True)
        return pa.table(
            {"tok": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    def combine_df(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tok", as_index=False, sort=False)["n"].sum()
        return out.rename(columns={"n": "df"})

    # shingle cardinality ~ corpus tokens, so the combine is the bucketed
    # per-BUCKET pandas pass, never Ray's per-group aggregate
    df_ds = bucketed_map_groups(
        txt.map_batches(df_partial, batch_format="pyarrow"),
        ["tok"],
        combine_df,
        num_buckets,
    )
    common = streaming_topk(df_ds, ["df", "tok"], topk_common, descending=[True, False])
    # order among common tokens: ascending df (rarer first), hash tiebreak
    ct = common.sort_by([("df", "ascending"), ("tok", "ascending")])
    c_tok = ct["tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    c_order = _COMMON_BASE + np.arange(len(c_tok), dtype=np.int64)
    c_sorted = np.argsort(c_tok)
    c_tok_s, c_order_s = c_tok[c_sorted], c_order[c_sorted]

    import ray

    order_ref = ray.put({"tok": c_tok_s, "order": c_order_s})

    # ---- pass 2: emit (order-sorted) prefix postings per document
    def emit_prefix(b: pa.Table) -> pa.Table:
        d = ray.get(order_ref)
        tok, owner, sizes = _doc_sets(b[text_column], k)
        pos = np.searchsorted(d["tok"], tok)
        pos = np.clip(pos, 0, max(len(d["tok"]) - 1, 0))
        if len(d["tok"]):
            hit = d["tok"][pos] == tok
            order = np.where(hit, d["order"][pos], tok)
        else:
            order = tok
        srt = np.lexsort((order, owner))
        owner_s, tok_s = owner[srt], tok[srt]
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        idx_in_doc = np.arange(len(tok_s), dtype=np.int64) - starts[owner_s]
        plen = _prefix_len(sizes, num, den)
        keepable = sizes > 0
        keep = (idx_in_doc < plen[owner_s]) & keepable[owner_s]
        ids = b[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tok": pa.array(tok_s[keep], pa.int64()),
                "doc": pa.array(ids[owner_s[keep]], pa.int64()),
                "size": pa.array(sizes[owner_s[keep]], pa.int64()),
            }
        )

    postings = txt.map_batches(emit_prefix, batch_format="pyarrow")

    # ---- pass 3: candidate pairs per token (one narrow bucket shuffle)
    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tok", "doc"], kind="mergesort")
        tokv = g["tok"].to_numpy()
        docv = g["doc"].to_numpy()
        szv = g["size"].to_numpy()
        grp_start = np.concatenate([[True], tokv[1:] != tokv[:-1]])
        gid = np.cumsum(grp_start) - 1
        counts = np.bincount(gid)
        if counts.size and counts.max() > posting_cap:
            raise ValueError(
                f"prefix posting list of {counts.max()} docs exceeds cap "
                f"{posting_cap}: output would be quadratic (near-identical "
                "corpus); raise posting_cap only with that understanding"
            )
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        idx = np.arange(len(tokv), dtype=np.int64) - starts[gid]
        ls, rs = [], []
        max_m = int(counts.max()) if counts.size else 0
        for dshift in range(1, max_m):
            ok = idx + dshift < counts[gid]
            if not ok.any():
                break
            i = np.nonzero(ok)[0]
            j = i + dshift
            a, b_, sa, sb = docv[i], docv[j], szv[i], szv[j]
            # length filter: num*max <= den*min
            mx = np.maximum(sa, sb)
            mn = np.minimum(sa, sb)
            lk = num * mx <= den * mn
            lo = np.minimum(a[lk], b_[lk])
            hi = np.maximum(a[lk], b_[lk])
            ls.append(lo)
            rs.append(hi)
        if not ls:
            return pd.DataFrame({"left_id": [], "right_id": []}).astype(np.int64)
        out = pd.DataFrame(
            {"left_id": np.concatenate(ls), "right_id": np.concatenate(rs)}
        )
        return out[out["left_id"] != out["right_id"]].drop_duplicates()

    cand = bucketed_map_groups(postings, ["tok"], pairs_in_bucket, num_buckets)
    cand = distinct_rows(cand, ["left_id", "right_id"], num_buckets).materialize()

    # ---- pass 4: exact integer verification (shared hybrid attach)
    withtext = attach_pair_texts(cand, txt, id_column, text_column, num_buckets)
    return withtext.map_batches(
        worker_cached_stage(_PairSetVerifier, k=k, num=num, den=den),
        batch_format="pyarrow",
    ).select_columns(["left_id", "right_id"])
