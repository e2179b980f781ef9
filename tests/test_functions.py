"""Tests for training-data operators: text analysis, dedup, similarity,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fhirflat_ray.functions import dedup as dd
from fhirflat_ray.functions import multimodal as mm
from fhirflat_ray.functions import similarity as sim
from fhirflat_ray.functions import text as tx


def docs_table() -> pa.Table:
    base = "the quick brown fox jumps over the lazy dog while the sun sets slowly behind distant hills"
    texts = [
        base,
        base,  # exact dup of 0
        base + " tonight",  # near dup (high shingle overlap)
        "completely different text about databases and compression",
        "der schnelle braune fuchs und die faulen hunde sind ein test",
        "",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


# ----------------------------------------------------------------- text


def test_token_count_batch():
    out = tx.token_count_batch(docs_table())
    expected = [len(t.split()) for t in docs_table()["text"].to_pylist()]
    assert out["n_tokens"].to_pylist() == expected


def test_quality_score_batch():
    out = tx.quality_score_batch(docs_table())
    assert out.column_names[-4:] == ["n_chars_text", "n_tokens", "punct_ratio", "alpha_ratio"]
    ratios = out["alpha_ratio"].to_pylist()
    assert all(0 <= r <= 1 for r in ratios)


def test_lang_id_heuristic():
    out = tx.LangId()(docs_table())
    langs = out["lang_pred"].to_pylist()
    assert langs[0] == "en"
    assert langs[4] == "de"
    assert langs[5] == "und"  # empty text → undetermined


def test_fingerprint_matches_md5():
    import hashlib

    out = tx.fingerprint_batch(docs_table())
    assert out["fingerprint"].to_pylist()[0] == hashlib.md5(
        docs_table()["text"].to_pylist()[0].encode()
    ).hexdigest()


def test_rolling_hash_deterministic():
    a = tx.rolling_hash_batch(docs_table())["rolling_fp"].to_pylist()
    b = tx.rolling_hash_batch(docs_table())["rolling_fp"].to_pylist()
    assert a == b
    assert a[0] == a[1]  # identical docs → identical fingerprint


# ----------------------------------------------------------------- dedup


def test_exact_dedup(ray_session):
    import ray.data as rd

    out = dd.exact_dedup(rd.from_arrow(docs_table())).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 2, 3, 4, 5]  # doc 1 removed (dup of 0)


def test_minhash_signature_similarity():
    mh = dd.MinHasher(n_hashes=64, k=3)
    s1 = mh.signature("the quick brown fox jumps over the lazy dog")
    s2 = mh.signature("the quick brown fox jumps over a lazy dog today")
    s3 = mh.signature("completely different text about databases")
    sim12 = (s1 == s2).mean()
    sim13 = (s1 == s3).mean()
    assert sim12 > sim13
    assert sim12 > 0.2


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    pairs = dd.minhash_lsh_candidates(
        rd.from_arrow(docs_table()), n_hashes=64, n_bands=32
    ).take_all()
    found = {(r["left_id"], r["right_id"]) for r in pairs}
    assert (0, 1) in found  # exact dups always co-bucket
    assert (0, 2) in found or (1, 2) in found  # near dup caught by some band


def test_ngram_jaccard():
    assert dd.ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert dd.ngram_jaccard("a b c d e", "x y z w v") == 0.0


def test_simhash_near_for_similar():
    sh = dd.SimHasher()
    h1 = sh.simhash("the quick brown fox jumps over the lazy dog")
    h2 = sh.simhash("the quick brown fox jumps over the lazy cat")
    h3 = sh.simhash("completely different text entirely unrelated")
    d12 = bin(h1 ^ h2).count("1")
    d13 = bin(h1 ^ h3).count("1")
    assert d12 < d13


def test_simhash_dedup(ray_session):
    import ray.data as rd

    out = dd.simhash_dedup(rd.from_arrow(docs_table())).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert 1 not in kept  # identical text → identical simhash → deduped


# ----------------------------------------------------------------- knn


def embeddings_table(n=50, d=8, seed=0) -> pa.Table:
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        }
    )


def test_knn_bruteforce_self_is_top1(ray_session):
    import ray.data as rd

    t = embeddings_table()
    vecs = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()[:2]])
    out = sim.knn_bruteforce(rd.from_arrow(t), [0, 1], vecs, k=5).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in (0, 1):
        ranks = sorted(by_q[q])
        assert ranks[0] == (1, q)  # self is rank 1
        assert len(ranks) == 5


def test_knn_ivf_mostly_agrees_with_bruteforce(ray_session):
    import ray.data as rd

    t = embeddings_table(n=200)
    vecs = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()[:2]])
    exact = sim.knn_bruteforce(rd.from_arrow(t), [0, 1], vecs, k=5).take_all()
    approx = sim.knn_ivf(
        rd.from_arrow(t), [0, 1], vecs, k=5, n_centroids=8, nprobe=4
    ).take_all()
    e = {(r["query_id"], r["vec_id"]) for r in exact}
    a = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(e & a) >= 6  # high recall at nprobe=half the cells


# ----------------------------------------------------------------- media


def test_media_feature_extract_shapes():
    t = mm.make_fake_media(8)
    out = mm.ImageFeatureExtractor(dim=16)(t)
    assert "payload" not in out.column_names
    feats = out["features"].to_pylist()
    assert len(feats) == 8 and len(feats[0]) == 16
    again = mm.ImageFeatureExtractor(dim=16)(t)["features"].to_pylist()
    assert feats == again  # deterministic stub


def test_media_resize_updates_metadata():
    t = mm.make_fake_media(8)
    out = mm.ImageResizer(max_side=128)(t)
    w = out["meta_width"].to_pylist()
    h = out["meta_height"].to_pylist()
    assert all(max(a, b) <= 128 for a, b in zip(w, h))


def test_frame_sampler_explodes_rows():
    t = mm.make_fake_media(4)
    out = mm.FrameSampler(n_frames=3)(t)
    assert out.num_rows == 12
    assert sorted(set(out["frame_idx"].to_pylist())) == [0, 1, 2]


def test_media_actor_pool_runs_on_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(mm.make_fake_media(16))
    out = ds.map_batches(
        mm.ImageFeatureExtractor,
        fn_constructor_kwargs={"dim": 8},
        batch_size=4,
        batch_format="pyarrow",
        concurrency=2,
    ).take_all()
    assert len(out) == 16


# ------------------------------------------------- near-dedup end-to-end


def test_jaccard_verifier_matches_reference():
    """Vectorized batch Jaccard == per-pair reference ngram_jaccard."""
    pairs = [
        ("a b c d e f g", "a b c d e f g"),
        ("a b c d e f g", "a b c d e f h"),
        ("a b c d e f g", "x y z w v u t"),
        ("", ""),
        ("", "a b"),
        ("one two", "one two three four five six"),
    ]
    v = dd.JaccardVerifier(k=3, threshold=0.0)
    got = v.batch_jaccard(
        pa.array([p[0] for p in pairs]), pa.array([p[1] for p in pairs])
    )
    want = [dd.ngram_jaccard(a, b, 3) for a, b in pairs]
    assert np.allclose(got, want), (got, want)


def test_near_dedup_planted_cross_block(ray_session):
    """Planted exact + near duplicates spanning Ray blocks: the end-to-end
    near-dedup must keep exactly the min-id representative per family."""
    import ray.data as rd

    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind distant hills and the evening wind carries a faint "
        "smell of rain across the quiet valley"
    )
    texts, ids = [], []
    for i in range(200):
        if i % 40 == 0:
            t = base  # exact dup family member
        elif i % 40 == 1:
            t = base + " tonight"  # near dup of the family
        else:
            t = f"unique document number {i} about topic {i*7} keyword {i*13}"
        texts.append(t)
        ids.append(i)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(5)  # dups land in different blocks
    # num_partitions small: the test session runs on 4 CPUs and each hash
    # join spawns num_partitions shuffle aggregators
    kept = sorted(
        r["doc_id"]
        for r in dd.near_dedup(ds, threshold=0.5, num_partitions=2).take_all()
    )
    planted = {i for i in range(200) if i % 40 in (0, 1)}
    # the whole planted family collapses to doc 0; everything else survives
    assert [i for i in kept if i in planted] == [0]
    assert set(kept) == (set(range(200)) - planted) | {0}


def test_lsh_degenerate_bucket_emits_linear_edges(ray_session):
    """A bucket of 100k identical docs must emit O(bucket) star edges, not
    the O(b^2) clique (the round-1 skew bomb)."""
    import ray.data as rd

    n = 100_000
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["identical boilerplate text body here"] * n),
        }
    )
    cand = dd.minhash_lsh_candidates(rd.from_arrow(tbl), n_bands=4)
    n_pairs = cand.count()
    assert n_pairs == n - 1  # one star edge per non-min member


def test_simhash_near_candidates_hamming_k(ray_session):
    """Planted near-dup pairs at Hamming <= 3 must be recovered."""
    import ray.data as rd

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    texts = [
        words,
        words.replace("kappa", "sigma", 1),  # tiny perturbation
        "completely different content about compression engines and arrays "
        "with many distinct words appearing only here " * 5,
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)}
    )
    sh = dd.SimHasher()
    h = sh.batch_simhashes(pa.array(texts))
    d01 = int(dd._popcount64(np.array([h[0] ^ h[1]]))[0])
    cand = dd.simhash_near_candidates(rd.from_arrow(tbl), k=max(3, d01)).take_all()
    found = {(r["left_id"], r["right_id"]) for r in cand}
    assert (0, 1) in found
    assert (0, 2) not in found and (1, 2) not in found


def test_popcount64_and_chunk_bounds():
    x = np.array([0, 1, 3, (1 << 62) - 1, -1], dtype=np.int64)
    assert dd._popcount64(x).tolist() == [0, 1, 2, 62, 64]
    bounds = dd._simhash_chunk_bounds(4)
    assert sum(w for _, w in bounds) == 63
    assert bounds[0][0] == 0 and bounds[-1][0] + bounds[-1][1] == 63


def test_connected_components(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.components import connected_components

    edges = pa.table(
        {
            "left_id": pa.array([2, 3, 4, 10, 20, 21, 22, 23, 7, 1], pa.int64()),
            "right_id": pa.array([1, 2, 3, 11, 21, 22, 23, 24, 8, 4], pa.int64()),
        }
    )
    want = [
        (2, 1), (3, 1), (4, 1), (8, 7), (11, 10),
        (21, 20), (22, 20), (23, 20), (24, 20),
    ]
    # driver-vectorized fast path (default below SMALL_EDGES)...
    out = connected_components(rd.from_arrow(edges)).take_all()
    assert sorted((r["node"], r["component"]) for r in out) == want
    # ...and the distributed star-rounds path, forced, must agree exactly
    out = connected_components(rd.from_arrow(edges), small_edges=0).take_all()
    assert sorted((r["node"], r["component"]) for r in out) == want


def test_hash_anti_join_with_schemaless_empty_blocks(ray_session):
    """Regression: schema-less empty pandas blocks (as emitted by groupby
    pipelines) on the key side must not break the acero hash join."""
    import pandas as pd
    import ray.data as rd

    from fhirflat_ray.functions.joins import hash_anti_join

    tbl = pa.table(
        {"doc_id": pa.array(range(100), pa.int64()), "text": [f"t{i}" for i in range(100)]}
    )
    ds = rd.from_arrow(tbl).repartition(4)
    blocks = [pd.DataFrame({"node": [1, 3, 5]})] + [pd.DataFrame() for _ in range(25)]
    out = hash_anti_join(ds, rd.from_pandas(blocks), on="doc_id", right_on="node",
                         num_partitions=16)
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [i for i in range(100) if i not in (1, 3, 5)]


def test_rolling_hash_matches_per_doc_reference():
    """Vectorized flat-stream rolling hash == naive per-document computation."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        None,
        "short",
        "x" * 16,
        "a much longer document with enough bytes for several windows indeed",
    ]
    got = tx.rolling_hash_batch(
        pa.table({"text": pa.array(texts, pa.string())})
    )["rolling_fp"].to_pylist()

    def ref(t, window=16):
        if t is None:
            return None
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
        if len(b) < window:
            return int(b.sum()) if len(b) else 0
        w = np.power(31, np.arange(window, dtype=np.int64), dtype=np.int64)
        idx = np.arange(window)[None, :] + np.arange(len(b) - window + 1)[:, None]
        with np.errstate(over="ignore"):
            return int((b[idx] * w[None, :]).sum(axis=1).min())

    assert got == [ref(t) for t in texts]


def test_validate_schema(ray_session):
    import ray.data as rd

    from fhirflat_ray.pipelines.verify import split_valid, validate_schema

    t = pa.table(
        {
            "conv_id": pa.array(["a", None, "c", "d", "e"], pa.string()),
            "turn_idx": pa.array([0, 1, -2, 3, 4], pa.int32()),
            "role": pa.array(["user", "assistant", "user", "robot", "user"]),
            "ts": pa.array([1, 2, 3, 4, None], pa.int64()),
        }
    )
    spec = {
        "conv_id": {"type": "string", "nullable": False},
        "turn_idx": {"type": "int32", "min": 0},
        "role": {"enum": ["user", "assistant"]},
        "ts": {"nullable": False},
        "text": {"required": False},
    }
    marked = validate_schema(rd.from_arrow(t), spec)
    valid, errors = split_valid(marked)
    assert valid.count() == 1  # only row 0 passes every rule
    errs = {r["conv_id"]: r["_error"] for r in errors.take_all()}
    assert errs[None] == "null conv_id" or "null" in errs[None]
    assert "below min" in errs["c"]
    assert "enum" in errs["d"]
    assert "null ts" in errs["e"]


def test_validate_schema_type_and_missing_column(ray_session):
    import ray.data as rd

    from fhirflat_ray.pipelines.verify import validate_schema

    t = pa.table({"turn_idx": pa.array([1.5, 2.0], pa.float64())})
    marked = validate_schema(
        rd.from_arrow(t), {"turn_idx": {"type": "int32"}, "conv_id": {}}
    ).take_all()
    assert all("type" in r["_error"] or "missing" in r["_error"] for r in marked)


def test_fingerprint_fast_vectorized():
    t = pa.table({"text": pa.array(["a", "a", "b", None], pa.string())})
    out = tx.fingerprint_fast_batch(t)["fingerprint64"].to_pylist()
    assert out[0] == out[1] != out[2]
    assert out[3] is None
    again = tx.fingerprint_fast_batch(t)["fingerprint64"].to_pylist()
    assert out == again


def test_cosine_dedup_exact_and_lsh(ray_session):
    """Planted near-identical vectors collapse to the min id on both the
    exact (broadcast) and LSH (hyperplane-bucketed) paths."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    # rows 0/1/2 nearly identical; rows 10/11 nearly identical
    base[1] = base[0] + 0.01 * rng.standard_normal(16)
    base[2] = base[0] + 0.01 * rng.standard_normal(16)
    base[11] = base[10] + 0.01 * rng.standard_normal(16)
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(base.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    exact = sorted(
        r["vec_id"] for r in dd.cosine_dedup_exact(ds, threshold=0.99).take_all()
    )
    assert 1 not in exact and 2 not in exact and 11 not in exact
    assert 0 in exact and 10 in exact and len(exact) == 37
    lsh = sorted(
        r["vec_id"]
        for r in dd.cosine_dedup_lsh(ds, threshold=0.99).take_all()
    )
    assert 1 not in lsh and 2 not in lsh and 11 not in lsh
    assert 0 in lsh and 10 in lsh
    # unified entry point: below the cell cap it must take the exact path
    auto = sorted(
        r["vec_id"] for r in dd.cosine_dedup(ds, threshold=0.99).take_all()
    )
    assert auto == exact


def test_audio_feature_and_chunking(ray_session):
    import ray.data as rd

    t = mm.make_fake_audio(8)
    feats = mm.AudioFeatureExtractor(dim=12)(t)
    assert "payload" not in feats.column_names
    assert len(feats["features"].to_pylist()[0]) == 12
    # deterministic
    assert feats["features"].to_pylist() == mm.AudioFeatureExtractor(dim=12)(t)["features"].to_pylist()

    chunks = mm.AudioChunker(chunk_ms=20_000)(t)
    durs = t["meta_duration_ms"].to_pylist()
    expected = sum(max(1, -(-d // 20_000)) for d in durs)
    assert chunks.num_rows == expected
    # actor-pool run over Ray
    out = rd.from_arrow(t).map_batches(
        mm.AudioChunker, fn_constructor_kwargs={"chunk_ms": 20_000},
        batch_size=4, batch_format="pyarrow", concurrency=2,
    ).count()
    assert out == expected


def test_cosine_lsh_recall_at_scale(ray_session):
    """Banded-OR recall regression: the auto band plan must recover
    essentially all planted near-identical pairs at 20k vectors (the
    round-2 pigeonhole chunking had ~zero recall below cosine ~0.95)."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    n, d = 20_000, 64
    mat = rng.standard_normal((n, d)).astype(np.float32)
    planted = 1_000
    for i in range(0, 2 * planted, 2):
        mat[i + 1] = mat[i] + 0.02 * rng.standard_normal(d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }
    )
    kept = dd.cosine_dedup_lsh(
        rd.from_arrow(t).repartition(8), threshold=0.98
    ).count()
    dropped = n - kept
    assert dropped >= 0.98 * planted, (dropped, planted)


def test_cosine_lsh_band_plan_and_moderate_threshold_recall(ray_session):
    """The band plan must size bands from the threshold so even MODERATE
    thresholds (0.45 — where the round-2 Hamming-pigeonhole operator was a
    silent no-op) keep real recall; and the exact-path cap must refuse
    oversize inputs while cosine_dedup dispatches to LSH instead."""
    import pytest
    import ray.data as rd

    b_low, t_low, recall_low = dd.lsh_band_plan(0.45)
    b_high, t_high, recall_high = dd.lsh_band_plan(0.9)
    assert recall_low >= 0.9 and recall_high >= 0.9
    assert b_low < b_high  # looser threshold → narrower bands

    rng = np.random.default_rng(5)
    # d=128 keeps random-pair cosine (std 1/sqrt(d) ~ 0.09) far below the
    # 0.45 threshold, so only planted pairs form edges
    n, d = 800, 128
    mat = rng.standard_normal((n, d)).astype(np.float32)
    planted = 80
    for i in range(0, 2 * planted, 2):
        # moderate-similarity pair: cosine ~0.78, well below near-identical
        mat[i + 1] = mat[i] + 0.8 * rng.standard_normal(d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    exact = {r["vec_id"] for r in dd.cosine_dedup_exact(ds, threshold=0.45).take_all()}
    lsh = {r["vec_id"] for r in dd.cosine_dedup_lsh(ds, threshold=0.45).take_all()}
    exact_dropped = n - len(exact)
    lsh_dropped = n - len(lsh)
    assert exact_dropped > 0
    assert lsh_dropped >= 0.85 * exact_dropped, (lsh_dropped, exact_dropped)
    # verification is exact, so LSH can only MISS candidates, never add junk
    assert lsh >= exact  # survivors superset: every lsh drop is an exact drop

    with pytest.raises(ValueError, match="cap"):
        dd.cosine_dedup_exact(ds, threshold=0.45, max_cells=1_000)
    # the dispatcher routes the same oversize input to LSH instead of raising
    routed = dd.cosine_dedup(ds, threshold=0.45, max_cells=1_000)
    assert routed.count() == len(lsh)


def test_verify_distributed_join_paths(ray_session, monkeypatch):
    """Force the DISTRIBUTED hash-join verify paths (pair budget 0) on small
    planted inputs: cosine verify must match the broadcast-path survivors,
    and the Jaccard near-dedup must still collapse the planted family."""
    import ray.data as rd

    rng = np.random.default_rng(12)
    n, d = 200, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    mat[1] = mat[0] + 0.01 * rng.standard_normal(d).astype(np.float32)
    mat[11] = mat[10] + 0.01 * rng.standard_normal(d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    want = sorted(
        r["vec_id"] for r in dd.cosine_dedup_lsh(ds, threshold=0.99, num_partitions=2).take_all()
    )
    monkeypatch.setattr(dd, "BROADCAST_PAIR_BUDGET", 0)
    got = sorted(
        r["vec_id"] for r in dd.cosine_dedup_lsh(ds, threshold=0.99, num_partitions=2).take_all()
    )
    assert got == want and 1 not in got and 11 not in got

    base = "the quick brown fox jumps over the lazy dog near the quiet river tonight again"
    texts = [base, base, base + " ok"] + [
        f"unique document {i} topic {i*13}" for i in range(3, 40)
    ]
    docs = pa.table(
        {"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(texts)}
    )
    kept = sorted(
        r["doc_id"]
        for r in dd.near_dedup(
            rd.from_arrow(docs).repartition(3), threshold=0.5, num_partitions=2
        ).take_all()
    )
    assert kept == [0] + list(range(3, 40))


def test_pin_candidate_payload_tiers_agree(ray_session):
    """_pin_candidate_payload must return exactly the candidate-id payload
    rows on BOTH tiers — broadcast key filter (default budget) and the
    Bloom-prefiltered distributed semi join (budget 0) — so the two attach
    joins downstream consume one pinned scan either way."""
    import ray.data as rd

    corpus = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"payload {i}" for i in range(100)]),
        }
    )
    cand = rd.from_arrow(
        pa.table(
            {
                "left_id": pa.array([3, 7, 7, 90], pa.int64()),
                "right_id": pa.array([8, 42, 8, 3], pa.int64()),
            }
        )
    ).materialize()
    want = sorted({3, 7, 8, 42, 90})
    for budget in (2_000_000, 0):
        pinned = dd._pin_candidate_payload(
            cand, rd.from_arrow(corpus).repartition(3), "doc_id", 2,
            broadcast_key_budget=budget,
        )
        t = pinned.take_all()
        got = sorted(r["doc_id"] for r in t)
        assert got == want, (budget, got)
        assert all(r["text"] == f"payload {r['doc_id']}" for r in t)


def test_near_dedup_no_duplicates_passthrough(ray_session):
    """Zero candidates / zero drops must pass the corpus through untouched
    (regression: empty materialized datasets report schema=None)."""
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array([f"totally unique document {i} topic {i*31}" for i in range(20)]),
        }
    )
    kept = dd.near_dedup(rd.from_arrow(t), threshold=0.9).count()
    assert kept == 20
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    e = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        }
    )
    assert dd.cosine_dedup_lsh(rd.from_arrow(e), threshold=0.999).count() == 20


def test_ivf_persisted_index(ray_session, tmp_path):
    """Persisted IVF: cell-partitioned corpus + centroid file; nprobe=all
    must equal brute force exactly, nprobe=1 reads only the probed cell
    dirs (no full-corpus assignment pass on the query path)."""
    import os

    import ray.data as rd

    from fhirflat_ray.functions import similarity as sim

    rng = np.random.default_rng(3)
    n, d = 2_000, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(ds, idx, n_centroids=8)

    qids, qv = [0, 1], mat[:2]
    full = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in sim.knn_ivf_persisted(idx, qids, qv, k=5, nprobe=8).take_all()
    )
    bf = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in sim.knn_bruteforce(ds, qids, qv, k=5).take_all()
    )
    assert full == bf

    top1 = {
        r["query_id"]: r["vec_id"]
        for r in sim.knn_ivf_persisted(idx, qids, qv, k=1, nprobe=1).take_all()
    }
    assert top1 == {0: 0, 1: 1}  # each query's nearest neighbour is itself

    cells = [
        p for p in os.listdir(os.path.join(idx, "corpus")) if p.startswith("ivf_cell=")
    ]
    assert len(cells) > 1  # real partitioning → nprobe=1 reads a strict subset


def test_real_wav_decode_features(ray_session):
    """Real PCM WAV bytes (stdlib wave) through the actor pool: a pure tone
    concentrates spectral energy in its own band and the fake path is NOT
    used (features differ from the hash-seeded stub)."""
    import ray.data as rd

    low = mm.make_wav_bytes(freq_hz=200.0, rate=16_000)
    high = mm.make_wav_bytes(freq_hz=6_000.0, rate=16_000)
    x, rate = mm._decode_wav(low)
    assert rate == 16_000 and len(x) == 3_200
    assert abs(float(np.sqrt(np.mean(x * x))) - 0.5 / np.sqrt(2)) < 0.01  # tone RMS

    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([low, high], pa.binary()),
            "mime": pa.array(["audio/wav"] * 2, pa.string()),
            "meta_sample_rate": pa.array([16_000] * 2, pa.int32()),
            "meta_duration_ms": pa.array([200] * 2, pa.int32()),
        }
    )
    out = rd.from_arrow(t).map_batches(
        mm.AudioFeatureExtractor, fn_constructor_kwargs={"dim": 10},
        batch_size=2, batch_format="pyarrow", concurrency=1,
    ).take_all()
    f_low = np.array(out[0]["features"])
    f_high = np.array(out[1]["features"])
    # band energies occupy dims 2..9: the 200 Hz tone peaks in an earlier
    # band than the 6 kHz tone
    assert np.argmax(f_low[2:]) < np.argmax(f_high[2:])
    fake = mm._fake_decode_features(low, 10)
    assert not np.allclose(f_low, fake)


def test_real_ppm_bmp_decode_and_resize(ray_session):
    """PPM and BMP bytes decode to identical planted pixels; the resizer
    really resamples PPM payloads (decodable output, halved dims)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    ppm = mm._encode_ppm(rgb)
    # build a BMP with the same pixels and check both decoders agree
    import struct as _struct

    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    bmp = (
        _struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
        + _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )
    assert np.array_equal(mm._decode_ppm(ppm), rgb)
    assert np.array_equal(mm._decode_bmp(bmp), rgb)

    # features from real pixels: channel means land in dims 0..2
    feats = mm.ImageFeatureExtractor(dim=16)(
        pa.table(
            {
                "media_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array([ppm, bmp], pa.binary()),
                "mime": pa.array(["image/x-portable-pixmap", "image/bmp"]),
                "meta_width": pa.array([w, w], pa.int32()),
                "meta_height": pa.array([h, h], pa.int32()),
            }
        )
    )
    f = np.array(feats["features"].to_pylist())
    want_means = rgb.astype(np.float64).mean(axis=(0, 1)) / 255.0
    assert np.allclose(f[0][:3], want_means, atol=1e-4)
    assert np.allclose(f[0], f[1], atol=1e-4)  # same pixels → same features

    # real resize through the actor pool: dims halve, output stays decodable
    out = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0], pa.int64()),
                "payload": pa.array([ppm], pa.binary()),
                "mime": pa.array(["image/x-portable-pixmap"]),
                "meta_width": pa.array([w], pa.int32()),
                "meta_height": pa.array([h], pa.int32()),
            }
        )
    ).map_batches(
        mm.ImageResizer, fn_constructor_kwargs={"max_side": 8},
        batch_size=1, batch_format="pyarrow", concurrency=1,
    ).take_all()
    r = out[0]
    assert max(r["meta_width"], r["meta_height"]) == 8
    resized = mm._decode_ppm(r["payload"])
    assert resized.shape == (r["meta_height"], r["meta_width"], 3)
    # nearest-neighbour: every resized pixel exists in the source image
    src = {tuple(px) for px in rgb.reshape(-1, 3).tolist()}
    assert all(tuple(px) in src for px in resized.reshape(-1, 3).tolist())


def test_decontaminate_planted_overlap(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.decontam import build_ngram_set, decontaminate

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    # verbatim copy -> many shared 4-grams -> dropped
                    eval_text,
                    # shares exactly one 4-gram window -> below min_hits=3
                    "completely different words except the quick brown fox here",
                    "nothing in common with anything at all whatsoever",
                    # short doc (< 4 tokens) cannot hit 3 distinct grams
                    "quick brown fox",
                ],
                pa.string(),
            ),
        }
    )
    eval_ds = rd.from_arrow(
        pa.table({"text": pa.array([eval_text], pa.string())})
    )
    grams = build_ngram_set(eval_ds, "text", 4)
    kept = (
        decontaminate(rd.from_arrow(corpus), grams, n=4, min_hits=3)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert sorted(kept) == [2, 3, 4]
    dropped = (
        decontaminate(
            rd.from_arrow(corpus), grams, n=4, min_hits=3, keep_contaminated=True
        )
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert dropped == [1]


def test_bucketed_ops_under_heavy_key_skew(ray_session):
    """50% of all rows share ONE key: the coarse-bucket shuffle must stay
    correct (co-partitioning holds trivially) and the hot bucket's single
    vectorized pass must handle the whole hot key at once."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fhirflat_ray.functions.util import keep_min_per_key, topk_per_key

    n = 200_000
    rng = np.random.default_rng(7)
    keys = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 5_000, n))
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "id": pa.array(ids, pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(8)

    got = keep_min_per_key(ds, "k", "id").to_pandas().sort_values("k")
    want = (
        t.to_pandas().groupby("k", as_index=False)["id"].min().sort_values("k")
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["id"].tolist() == want["id"].tolist()

    got2 = (
        topk_per_key(ds, ["k"], 3, ["id"], descending=False)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    want2 = (
        t.to_pandas()
        .sort_values(["k", "id"])
        .groupby("k", sort=False)
        .head(3)
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    assert got2.equals(want2[["k", "id"]])


def test_term_doc_tf_and_tfidf_planted(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.text import term_doc_tf
    from fhirflat_ray.functions.util import bucketed_map_groups

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "apple apple banana",
                "apple cherry",
                "banana  banana\tbanana cherry",
            ],
        }
    )
    postings = (
        term_doc_tf(t).to_pandas().sort_values(["term", "doc_id"]).reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "term": ["apple", "apple", "banana", "banana", "cherry", "cherry"],
            "doc_id": [1, 2, 1, 3, 2, 3],
            "tf": [2, 1, 1, 3, 1, 1],
        }
    )
    assert postings.equals(want)

    # distributed stats over a multi-block dataset: df / total tf per term
    ds = rd.from_arrow(t).repartition(3).map_batches(term_doc_tf, batch_format="pyarrow")

    def combine(g):
        return (
            g.groupby("term", sort=False)
            .agg(df=("doc_id", "size"), tf=("tf", "sum"))
            .reset_index()
        )

    stats = (
        bucketed_map_groups(ds, ["term"], combine)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert stats["term"].tolist() == ["apple", "banana", "cherry"]
    assert stats["df"].tolist() == [2, 2, 2]
    assert stats["tf"].tolist() == [3, 4, 2]


def test_tfidf_top_terms_ranking(ray_session, tmp_path, monkeypatch):
    # rank must be (tf DESC, df ASC, term ASC); banana(tf3) beats apple(tf2)
    import pyarrow.parquet as pq

    from fhirflat_ray.pipelines.queries import tfidf_top_terms

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["x banana banana banana apple apple", "x y apple"],
            }
        ),
        str(sf / "documents.parquet"),
    )
    got = (
        tfidf_top_terms(str(sf))
        .to_pandas()
        .sort_values(["doc_id", "tf", "df", "term"], ascending=[True, False, True, True])
        .reset_index(drop=True)
    )
    d1 = got[got["doc_id"] == 1]
    assert d1["term"].tolist() == ["banana", "apple", "x"]
    assert d1["tf"].tolist() == [3, 2, 1]
    # banana df=1 of N=2 docs -> tfidf = 3*ln(2)
    assert abs(d1["tfidf"].iloc[0] - round(3 * np.log(2.0), 6)) < 1e-9
    # x appears in both docs -> idf = ln(1) = 0
    assert d1[d1["term"] == "x"]["tfidf"].iloc[0] == 0.0


def test_quantize_matrix_exactness_and_bounds():
    from fhirflat_ray.functions.similarity import quantize_matrix

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 64)).astype(np.float32).astype(np.float64)
    mat[7] = 0.0  # all-zero vector
    codes, scales = quantize_matrix(mat)
    assert scales[7] == 0.0 and np.all(codes[7] == 0)
    nz = np.arange(50) != 7
    assert np.abs(codes[nz]).max() == 127  # the max element maps to +/-127
    # dequantization error bounded by half a step
    err = np.abs(codes[nz] * scales[nz, None] - mat[nz])
    assert (err <= scales[nz, None] / 2 + 1e-12).all()


def test_knn_quantized_recall_vs_exact(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.similarity import knn_bruteforce, knn_quantized

    rng = np.random.default_rng(5)
    n, d = 400, 32
    mat = rng.normal(size=(n, d))
    # unit-normalize so exact-cosine and quantized-dot rank the same metric
    # and the test isolates QUANTIZATION error (not cosine-vs-dot mismatch)
    mat = (mat / np.linalg.norm(mat, axis=1, keepdims=True)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    qids = [0, 1, 2]
    qvecs = mat[:3].astype(np.float64)
    exact = knn_bruteforce(ds, qids, qvecs, k=10).to_pandas()
    quant = knn_quantized(ds, qids, qvecs, k=10).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(quant[quant["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert min(recalls) >= 0.8 and sum(recalls) / len(recalls) >= 0.9, recalls
    # the query vector itself must be rank-1 under both metrics
    for q in qids:
        assert quant[(quant["query_id"] == q) & (quant["rank"] == 1)]["vec_id"].iloc[0] == q
        assert exact[(exact["query_id"] == q) & (exact["rank"] == 1)]["vec_id"].iloc[0] == q


def test_chunk_documents_batch_planted():
    import numpy as np
    import pyarrow as pa

    from fhirflat_ray.functions.text import chunk_documents_batch

    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "a b c d e",      # 5 tokens, size 4 / stride 2 → 3 chunks
                "",                # no chunks
                "   \t  ",         # whitespace-only: no chunks
                "x",               # single token → one short chunk
                "t1 t2 t3 t4",     # exact multiple of stride → 2 chunks
            ],
        }
    )
    out = chunk_documents_batch(b, size=4, stride=2).to_pandas()
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
        for r in out.itertuples()
    }
    assert got == {
        (1, 0): (4, "a b c d"),
        (1, 1): (3, "c d e"),
        (1, 2): (1, "e"),
        (4, 0): (1, "x"),
        (5, 0): (4, "t1 t2 t3 t4"),
        (5, 1): (2, "t3 t4"),
    }

    # non-overlapping (stride == size) partitions tokens exactly
    out2 = chunk_documents_batch(b, size=2, stride=2).to_pandas()
    joined = " ".join(out2[out2.doc_id == 1].sort_values("chunk_idx").chunk_text)
    assert joined == "a b c d e"
    assert int(out2.n_tokens.sum()) == 5 + 1 + 4  # every token exactly once

    with pytest.raises(ValueError):
        chunk_documents_batch(b, size=0, stride=2)


def _brute_pairs(texts: list[str], ids: list[int], k: int, num: int, den: int):
    """Reference all-pairs result via the same hashed-set universe."""
    from fhirflat_ray.functions.setjoin import _doc_sets

    tok, owner, sizes = _doc_sets(pa.array(texts, pa.string()), k)
    sets = [set(tok[owner == i].tolist()) for i in range(len(texts))]
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            ni = len(sets[i] & sets[j])
            un = len(sets[i] | sets[j])
            if un > 0 and den * ni >= num * un:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_prefix_jaccard_join_matches_bruteforce(ray_session):
    """Exactness: the prefix-filtered join must find EXACTLY the pairs the
    all-pairs reference finds — planted families across blocks, varied
    similarity levels straddling the threshold."""
    import ray.data as rd

    from fhirflat_ray.functions.setjoin import prefix_jaccard_join

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    )
    rng = np.random.default_rng(3)
    texts, ids = [], []
    words = base.split()
    for i in range(120):
        if i % 20 < 3:
            t = base  # identical family
        elif i % 20 == 3:
            t = base + " extra"  # near (above threshold)
        elif i % 20 == 4:
            t = " ".join(words[: len(words) // 2])  # half: below threshold
        else:
            t = " ".join(
                f"w{rng.integers(0, 5000)}" for _ in range(30)
            )  # random noise
        texts.append(t)
        ids.append(i)
    want = _brute_pairs(texts, ids, k=5, num=7, den=10)
    assert len(want) > 100  # the identical families alone give C(18,2)+ pairs

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ).repartition(6)
    got_t = prefix_jaccard_join(
        ds, num_buckets=8, topk_common=64
    ).to_pandas()
    got = set(zip(got_t["left_id"], got_t["right_id"]))
    assert got == want


def test_prefix_jaccard_join_posting_cap_raises(ray_session):
    """A corpus of identical documents has quadratic output; the posting
    cap must raise loudly instead of silently exploding."""
    import ray.data as rd

    from fhirflat_ray.functions.setjoin import prefix_jaccard_join

    texts = ["same exact document body for everyone here today"] * 300
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(300), pa.int64()), "text": pa.array(texts)}
        )
    )
    with pytest.raises(Exception, match="posting list"):
        prefix_jaccard_join(ds, posting_cap=100, num_buckets=4).to_pandas()


def test_incremental_dedup_against_persisted_index(ray_session, tmp_path):
    """Corpus indexed once; an incremental batch probes the persisted band
    postings: planted near-copies of corpus docs must link to the right
    corpus ids and be dropped; unique new docs must survive."""
    import ray.data as rd

    from fhirflat_ray.functions.dedup import build_minhash_index, incremental_dedup

    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind distant hills and the evening wind carries a faint "
        "smell of rain across the quiet valley tonight again"
    )
    corpus_texts = [
        f"unique corpus document number {i} about topic {i*7} keyword {i*13} "
        f"filler {i*3} more {i*11} words {i*5} here {i*17} now {i*19} end"
        for i in range(300)
    ]
    corpus_texts[42] = base
    corpus = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array(corpus_texts),
        }
    )
    idx = str(tmp_path / "mh_index")
    build_minhash_index(rd.from_arrow(corpus).repartition(4), idx, n_hb=16)

    new_texts, new_ids = [], []
    for i in range(40):
        nid = 1000 + i
        if i < 8:
            t = base + (" extra" if i % 2 else "")  # near-copies of corpus #42
        else:
            t = f"fresh incremental crawl item {i} tokens {i*29} body {i*31} "
            t += f"tail {i*37} close {i*41} final {i*43} done {i*47} yes {i*53}"
        new_ids.append(nid)
        new_texts.append(t)
    new = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(new_ids, pa.int64()), "text": pa.array(new_texts)}
        )
    ).repartition(3)

    links, survivors = incremental_dedup(new, rd.from_arrow(corpus), idx)
    lt = links.to_pandas()
    st = survivors.to_pandas()
    dup_new = set(lt["new_id"])
    assert dup_new == {1000 + i for i in range(8)}
    assert set(lt["dup_of"]) == {42}
    assert set(st["doc_id"]) == {1000 + i for i in range(8, 40)}


def test_png_decode_roundtrip_all_filters():
    """PNG decode (stdlib zlib) is pixel-exact for gray/RGB/RGBA across
    every scanline filter type (the writer cycles filters 0-4)."""
    for ct in (0, 2, 6):
        b = mm.make_png_bytes(23, 17, seed=5 + ct, color_type=ct)
        px = mm._decode_png(b)
        rng = np.random.default_rng(5 + ct)
        ch = {0: 1, 2: 3, 6: 4}[ct]
        want = rng.integers(0, 256, size=(17, 23, ch), dtype=np.uint8)
        if ct == 0:
            want = np.repeat(want, 3, axis=2)
        if ct == 6:
            want = want[:, :, :3]
        assert (px == want).all()


def test_png_decode_external_fixture():
    """A PNG produced by a STANDARD encoder (the ubiquitous 1x1 red-pixel
    web fixture) decodes to exactly (255, 0, 0) — validates the parser
    against bytes this repo's own writer did not produce."""
    import base64

    b = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
        "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    px = mm._decode_png(b)
    assert px.shape == (1, 1, 3)
    assert px.tolist() == [[[255, 0, 0]]]


def test_png_features_through_actor_pool(ray_session):
    """PNG payloads flow through ImageFeatureExtractor as REAL pixels (the
    features equal the PPM-decoded features of the same pixel array, not
    the hash-seeded fake path)."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(14, 20, 3), dtype=np.uint8)
    png = mm.make_png_bytes(20, 14, seed=9, color_type=2)
    png_px = mm._decode_png(png)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([png], pa.binary()),
            "mime": pa.array(["image/png"], pa.string()),
            "meta_width": pa.array([20], pa.int32()),
            "meta_height": pa.array([14], pa.int32()),
        },
        schema=mm.MEDIA_SCHEMA,
    )
    out = (
        rd.from_arrow(t)
        .map_batches(mm.ImageFeatureExtractor, batch_size=8, batch_format="pyarrow",
                     concurrency=1)
        .to_pandas()
    )
    got = np.array(out["features"].iloc[0], dtype=np.float32)
    want = mm._image_features(png_px, 64)
    assert np.allclose(got, want)


def test_prefix_jaccard_join_property(ray_session):
    """Property: for random small corpora with planted duplicate families,
    arbitrary thresholds and shingle widths, the prefix-filtered join
    equals the brute-force all-pairs reference exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data as rd

    from fhirflat_ray.functions.setjoin import prefix_jaccard_join

    @settings(max_examples=3, deadline=None)
    @given(
        seed=st.integers(0, 2**16),
        num_den=st.sampled_from([(1, 2), (7, 10), (4, 5)]),
        k=st.integers(2, 6),
    )
    def check(seed, num_den, k):
        num, den = num_den
        rng = np.random.default_rng(seed)
        texts, ids = [], []
        base_words = [f"w{rng.integers(0, 300)}" for _ in range(40)]
        for i in range(60):
            if i % 10 < 2:
                t = " ".join(base_words)  # family
            elif i % 10 == 2:
                t = " ".join(base_words[: 30 + int(rng.integers(0, 10))])
            else:
                t = " ".join(f"w{rng.integers(0, 5000)}" for _ in range(20))
            texts.append(t)
            ids.append(i)
        want = _brute_pairs(texts, ids, k=k, num=num, den=den)
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
        ).repartition(4)
        got_t = prefix_jaccard_join(
            ds, k=k, num=num, den=den, num_buckets=6, topk_common=32
        ).to_pandas()
        got = set(zip(got_t["left_id"], got_t["right_id"]))
        assert got == want

    check()


def test_passage_dedup_planted(ray_session):
    import ray.data as rd

    words = lambda a, b: " ".join(f"w{i}" for i in range(a, b))
    shared = words(100, 120)  # exactly one 20-token passage
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                words(0, 20) + " " + shared,          # owns first copy of `shared`
                shared + " " + words(200, 220),       # later copy -> loses chunk 0
                shared,                               # later copy only -> vanishes
                words(300, 315),                      # short unique doc (tail chunk)
            ],
        }
    )
    out = (
        dd.passage_dedup(rd.from_arrow(docs), size=20)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [0, 1, 3]  # doc 2 fully deduplicated away
    assert out.text[0] == words(0, 20) + " " + shared
    assert out.text[1] == words(200, 220)  # chunk 0 (shared) dropped
    assert out.text[2] == words(300, 315)
    assert out.n_chunks_kept.tolist() == [2, 1, 1]


def test_passage_dedup_cross_block(ray_session):
    import ray.data as rd

    # the duplicate passage lives in a DIFFERENT block from the original:
    # keep-first must still pick the global min (doc_id, chunk_idx).
    p = " ".join(f"t{i}" for i in range(20))
    docs = pa.table(
        {
            "doc_id": pa.array([7, 3], pa.int64()),
            "text": [p, p],
        }
    )
    out = (
        dd.passage_dedup(rd.from_arrow(docs).repartition(2), size=20)
        .to_pandas()
    )
    assert out.doc_id.tolist() == [3]


def test_bpe_train_matches_naive_reference(ray_session):
    import ray.data as rd
    from collections import Counter

    from fhirflat_ray.functions.text import train_bpe

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "low lower lowest low low",
                "new newer newest new",
                "wide wider widest low",
            ],
        }
    )

    # naive reference: token-LIST BPE (no sentinels, no string replace)
    wf = Counter()
    for t in docs["text"].to_pylist():
        wf.update(t.split())
    words = {w: list(w) for w in wf}
    expect = []
    for rank in range(1, 7):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wf[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, l, r, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    got = train_bpe(rd.from_arrow(docs).repartition(3), n_merges=6).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == expect


def test_bpe_train_early_stop(ray_session):
    import ray.data as rd

    from fhirflat_ray.functions.text import train_bpe

    # single-char words: no adjacent pairs ever -> zero merges
    docs = pa.table({"text": ["a b c a", "b c a b"]})
    got = train_bpe(rd.from_arrow(docs), n_merges=5)
    assert got.num_rows == 0


def test_bpe_tokenize_oov_fallback(ray_session):
    import ray
    import ray.data as rd

    from fhirflat_ray.functions.text import (
        BpeVocabTokenCounter,
        bpe_token_counts,
        word_frequencies,
    )
    from fhirflat_ray.functions.util import worker_cached_stage

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["aa aa aa bb", "zzzz aa"],  # cap=1 keeps only 'aa'
        }
    )
    ds = rd.from_arrow(docs)
    lookup = bpe_token_counts(word_frequencies(ds, max_words=1), n_merges=4)
    assert lookup["word"].to_pylist() == ["aa"]
    assert lookup["n_tok"].to_pylist() == [1]  # 'a'+'a' merged round 1
    out = (
        ds.map_batches(
            worker_cached_stage(BpeVocabTokenCounter, lookup_ref=ray.put(lookup)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc 0: 3x'aa'(1) + OOV 'bb'(2 chars) = 5; doc 1: OOV 'zzzz'(4) + 'aa'(1) = 5
    assert out.n_bpe_tokens.tolist() == [5, 5]


def test_bigram_doc_tf_no_cross_doc_bigrams():
    from fhirflat_ray.functions.text import bigram_doc_tf

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["a b a b", "b c", "solo"],
        }
    )
    out = bigram_doc_tf(batch).to_pandas()
    got = {(r.doc_id, r.bg): r.tf for r in out.itertuples()}
    # doc 0: 'a b' x2, 'b a' x1; doc 1: 'b c'; doc 2 (single token): nothing;
    # NO 'b b' / 'c solo' bridging documents
    assert got == {(0, "a b"): 2, (0, "b a"): 1, (1, "b c"): 1}
    assert set(out.w1) == {"a", "b"}


def test_ewma_kernel_matches_naive_reference(ray_session):
    """The bucketed 16-lag EWMA must equal a per-row python recurrence on
    interleaved multi-user sequences (including a user longer than the
    window)."""
    import ray.data as rd

    from fhirflat_ray.pipelines.queries import _EWMA_ALPHA, _ewma_coefs, ewma_value
    import fhirflat_ray.pipelines.queries as q

    rng = np.random.default_rng(5)
    n = 120
    uid = rng.integers(0, 3, n)
    ts = pd.to_datetime(1_700_000_000_000_000 + np.sort(rng.integers(0, 10**9, n)), unit="us")
    val = np.round(rng.uniform(0, 100, n), 2)
    df = pd.DataFrame({"event_id": np.arange(n), "user_id": uid, "ts": ts, "value": val})

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        got = ewma_value(d).to_pandas().set_index("event_id")["ewma"]

    coefs = _ewma_coefs()
    ref = {}
    for u in np.unique(uid):
        sub = df[df.user_id == u].sort_values(["ts", "event_id"])
        vals = sub["value"].to_numpy()
        for i, eid in enumerate(sub["event_id"].to_numpy()):
            y = 0.0
            for k, c in enumerate(coefs):
                if i - k >= 0:
                    y += c * vals[i - k]
            ref[eid] = round(y, 6)
    for eid, want in ref.items():
        assert got[eid] == pytest.approx(want, abs=2e-6)


def test_dup_span_flags_planted(ray_session):
    """Two docs sharing one 8-token window + one doc with an internal
    repeat: the per-doc (n_spans, n_dup) must match hand counts."""
    import os
    import tempfile

    from fhirflat_ray.pipelines.queries import dup_span_flags

    shared = "a b c d e f g h"          # the duplicated 8-token window
    doc0 = shared + " x0 y0"            # windows: 3 valid, 1 dup (the shared one)
    doc1 = "z1 " + shared               # windows: 2 valid, 1 dup
    doc2 = "p q " + "r s t u v w k l r s t u v w k l"  # internal repeat
    doc3 = "too short"                  # < 8 tokens: excluded
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": [doc0, doc1, doc2, doc3]}
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = (
            dup_span_flags(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
    # doc0: 10 tokens -> 3 windows; the shared window appears in doc1 too -> 1 dup
    # doc1: 9 tokens -> 2 windows; 1 dup
    # doc2: 18 tokens -> 11 windows; window starting at "r s t u v w k l"
    #       occurs at positions 3 and 11 -> both flagged dup
    assert got.doc_id.tolist() == [0, 1, 2]
    assert got.n_spans.tolist() == [3, 2, 11]
    assert got.n_dup.tolist() == [1, 1, 2]


def test_snm_pairs_cross_bucket_windows(ray_session):
    """Sorted-neighborhood pairs must equal the brute-force window join —
    including pairs straddling rank-bucket boundaries (n_parts=4 floor
    gives bucket size ~50 at 200 docs, so ~12 boundary windows)."""
    import os
    import tempfile

    from fhirflat_ray.pipelines.queries import _SNM_W, snm_pairs

    n = 200
    # identical prefixes -> every window pair verifies (lev=0); n_chars
    # carries ties so the (n_chars, doc_id) tiebreak path is exercised
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["same prefix for everyone here"] * n,
            "n_chars": (np.arange(n, dtype=np.int64) // 3) * 7,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = snm_pairs(d).to_pandas()
    order = df.sort_values(["n_chars", "doc_id"]).doc_id.to_numpy()
    want = set()
    for j in range(1, _SNM_W + 1):
        for i in range(n - j):
            want.add((order[i], order[i + j]))
    assert set(zip(got.l_doc, got.r_doc)) == want
    assert (got.lev == 0).all()


def test_gif_decode_roundtrip_exact():
    """GIF LZW roundtrip is pixel-exact, including images large enough to
    exercise code-width bumps (9→12 bits) and the 12-bit CLEAR reset."""
    rng = np.random.default_rng(5)
    for (w, h) in [(3, 2), (16, 12), (64, 48), (200, 100)]:
        ix = rng.integers(0, 256, (h, w)).astype(np.uint8)
        px = mm._decode_gif(mm.make_gif_bytes(w, h, indices=ix))
        assert px.shape == (h, w, 3)
        assert (px[:, :, 0] == ix).all()
        assert (px[:, :, 1] == ix).all() and (px[:, :, 2] == ix).all()


def test_gif_decode_external_fixture():
    """A GIF produced by a STANDARD encoder (the classic 1x1 transparent-
    pixel web fixture, GIF89a with a graphic-control extension block)
    decodes through the extension-skipping and LZW paths."""
    import base64

    b = base64.b64decode("R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw==")
    px = mm._decode_gif(b)
    assert px.shape == (1, 1, 3)
    assert px.tolist() == [[[255, 255, 255]]]


def test_gif_features_through_actor_pool(ray_session):
    """GIF payloads flow through ImageFeatureExtractor as REAL pixels."""
    import ray.data as rd

    gif = mm.make_gif_bytes(20, 14, seed=9)
    gif_px = mm._decode_gif(gif)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([gif], pa.binary()),
            "mime": pa.array(["image/gif"], pa.string()),
            "meta_width": pa.array([20], pa.int32()),
            "meta_height": pa.array([14], pa.int32()),
        },
        schema=mm.MEDIA_SCHEMA,
    )
    out = (
        rd.from_arrow(t)
        .map_batches(mm.ImageFeatureExtractor, batch_size=8, batch_format="pyarrow",
                     concurrency=1)
        .to_pandas()
    )
    got = np.array(out["features"].iloc[0], dtype=np.float32)
    want = mm._image_features(gif_px, 64)
    assert np.allclose(got, want)


# ------------------------------------------------- LSH recall property tests


def _planted_pairs(n_pairs: int, dim: int, cosine: float, seed: int):
    """(u_matrix, v_matrix) of unit vectors with EXACT pairwise cosine:
    v = c*u + sqrt(1-c^2)*w with w a unit vector orthogonal to u."""
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n_pairs, dim))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.standard_normal((n_pairs, dim))
    w -= (np.einsum("ij,ij->i", w, u))[:, None] * u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    v = cosine * u + np.sqrt(1.0 - cosine**2) * w
    return u, v


def _band_keys(mat: np.ndarray, bits: int, n_bands: int, seed: int) -> np.ndarray:
    """(n_rows, n_bands) band keys via the production hasher itself."""
    n, dim = mat.shape
    ids = pa.array(np.arange(n, dtype=np.int64), pa.int64())
    vecs = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), pa.float64()), dim
    )
    h = dd.BandedHyperplaneHasher(
        dim=dim, n_bands=n_bands, bits=bits, vec_column="embedding",
        id_column="vec_id", seed=seed,
    )
    out = h(pa.table({"vec_id": ids, "embedding": vecs}))
    # rows emit in input order, n_bands keys per row
    return out["__key"].to_numpy(zero_copy_only=False).reshape(n, n_bands)


@pytest.mark.parametrize("threshold", [0.8, 0.9])
def test_lsh_band_plan_recall_promise(threshold):
    """lsh_band_plan's QUANTITATIVE promise: pairs planted at the cosine
    threshold must be recovered (some band key equal) at >= the plan's
    expected recall, across seeds, within binomial tolerance. This replaces
    fixed-fixture faith in the rows-only LSH dedup entries with a measured
    guarantee on the exact production hasher."""
    target_recall = 0.9
    bits, n_bands, expected = dd.lsh_band_plan(threshold, target_recall)
    assert expected >= target_recall

    n_pairs, dim = 400, 16
    hits = 0
    total = 0
    for seed in (11, 12, 13):
        # plant slightly ABOVE the threshold: recall is monotone in the
        # cosine, so the plan's number at the threshold is a lower bound
        # (and exact-at-threshold floats would flap the verify equality)
        u, v = _planted_pairs(n_pairs, dim, min(0.999, threshold + 0.01), seed)
        ku = _band_keys(u, bits, n_bands, seed=seed)
        kv = _band_keys(v, bits, n_bands, seed=seed)
        hits += int((ku == kv).any(axis=1).sum())
        total += n_pairs
    observed = hits / total
    sigma = np.sqrt(expected * (1.0 - expected) / total)
    assert observed >= expected - 4.0 * sigma, (
        f"observed recall {observed:.3f} < planned {expected:.3f} - 4σ "
        f"({4*sigma:.3f}) at threshold {threshold}"
    )


def test_cosine_dedup_lsh_end_to_end_recall(ray_session):
    """Full cosine_dedup_lsh pipeline recall on planted near-duplicate
    pairs: detected pairs remove one survivor each, so recall reads off the
    survivor count. Must meet the band plan's promise within tolerance."""
    import ray.data as rd

    threshold, target_recall = 0.9, 0.9
    _, _, expected = dd.lsh_band_plan(threshold, target_recall)
    n_pairs, dim = 200, 16
    u, v = _planted_pairs(n_pairs, dim, 0.91, seed=5)
    mat = np.concatenate([u, v])
    vecs = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), pa.float64()), dim
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(2 * n_pairs, dtype=np.int64), pa.int64()),
            "embedding": vecs,
        }
    )
    survivors = dd.cosine_dedup_lsh(
        rd.from_arrow(t).repartition(4),
        id_column="vec_id",
        vec_column="embedding",
        threshold=threshold,
        target_recall=target_recall,
        num_partitions=4,
        seed=5,
    )
    n_surv = survivors.count()
    detected = 2 * n_pairs - n_surv
    observed = detected / n_pairs
    sigma = np.sqrt(expected * (1.0 - expected) / n_pairs)
    assert observed >= expected - 4.0 * sigma, (n_surv, observed, expected)
    # random non-planted cross pairs at dim 16 sit near cosine 0 — exact
    # verification must not merge them (no over-deletion)
    assert n_surv >= n_pairs


def test_attach_pair_texts_byte_budget_fallback_agrees(ray_session, monkeypatch):
    """When the candidate payload exceeds BROADCAST_BYTE_BUDGET (forced to 0
    here) attach_pair_texts must re-ship the ALREADY-collected payload as
    object-store blocks and join — same rows as the broadcast path, no
    second corpus scan."""
    import ray.data as rd

    from fhirflat_ray.functions import dedup as dd

    docs = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array([f"document body number {i}" for i in range(20)]),
        }
    )
    cand = pa.table(
        {
            "left_id": pa.array([0, 2, 5], pa.int64()),
            "right_id": pa.array([1, 7, 19], pa.int64()),
        }
    )
    txt_ds = rd.from_arrow(docs).repartition(3)
    cand_ds = rd.from_arrow(cand).materialize()

    def run():
        return (
            dd.attach_pair_texts(cand_ds, txt_ds, "doc_id", "text", 2)
            .to_pandas()
            .sort_values(["left_id", "right_id"])
            .reset_index(drop=True)[
                ["left_id", "right_id", "left_text", "right_text"]
            ]
        )

    want = run()
    assert want["left_text"].tolist() == [f"document body number {i}" for i in (0, 2, 5)]
    monkeypatch.setattr(dd, "BROADCAST_BYTE_BUDGET", 0)
    got = run()
    pd.testing.assert_frame_equal(got, want)


def test_jpeg_constant_block_roundtrip_exact():
    """All-ones quant + constant 8x8 blocks: the lossy format's exact
    subspace — every block is DC-only and must reconstruct its byte
    EXACTLY (the media_features_jpeg oracle contract)."""
    from fhirflat_ray.functions import jpeg as jp

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, 12 * 7).astype(np.uint8)
    px = jp.decode_jpeg(jp.encode_jpeg_gray_blocks(vals, 7))
    want = np.repeat(np.repeat(vals.reshape(12, 7), 8, 0), 8, 1)
    assert px.shape == (96, 56, 3)
    for ch in range(3):
        assert (px[:, :, ch] == want).all()


def test_jpeg_smooth_and_noise_tolerance():
    """Quant=1 general grayscale: DCT rounding bounds error at ±1, and
    non-multiple-of-8 dimensions crop correctly."""
    from fhirflat_ray.functions import jpeg as jp

    g = np.clip(
        np.fromfunction(lambda y, x: 40 + y * 1.5 + x * 0.7, (37, 53)), 0, 255
    ).astype(np.uint8)
    px = jp.decode_jpeg(jp.encode_jpeg_gray(g))
    assert px.shape == (37, 53, 3)
    assert np.abs(px[:, :, 0].astype(int) - g.astype(int)).max() <= 1

    r = np.random.default_rng(5).integers(0, 256, (24, 24)).astype(np.uint8)
    px = jp.decode_jpeg(jp.encode_jpeg_gray(r))
    assert np.abs(px[:, :, 0].astype(int) - r.astype(int)).max() <= 1


def test_jpeg_decode_external_fixture():
    """A JPEG produced by a STANDARD encoder (libjpeg; the 2x2 uniform-gray
    IPython test fixture — Annex-K huffman tables, real quant tables,
    3-component YCbCr) decodes pixel-exactly to gray 128 — DC-only blocks
    leave no room for IDCT variance, so any correct decoder must produce
    exactly this. Validates DQT/DHT/SOF0/SOS parsing against bytes this
    repo's own writer did not produce."""
    import base64

    from fhirflat_ray.functions import jpeg as jp

    b = base64.b64decode(
        "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
        "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA/8QAHwAA"
        "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR"
        "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF"
        "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip"
        "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB"
        "AAA/ACv/2Q=="
    )
    px = jp.decode_jpeg(b)
    assert px.shape == (2, 2, 3)
    assert (px == 128).all()


def test_jpeg_through_actor_pool_and_fallbacks(ray_session):
    """JPEG payloads flow through ImageFeatureExtractor as REAL pixels
    (feature[0] equals the exact block-byte mean, which the hash-seeded
    fake could never produce); progressive (SOF2) and truncated payloads
    fall back to the stub instead of failing the stage."""
    import ray.data as rd

    from fhirflat_ray.functions import jpeg as jp

    vals = np.arange(24, dtype=np.uint8) * 10
    good = jp.encode_jpeg_gray_blocks(vals, 6)
    # forge a progressive stream: flip the SOF0 marker byte to SOF2
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0")] = 0xFF
    prog[bytearray(good).index(b"\xff\xc0") + 1] = 0xC2
    prog = bytes(prog)
    assert mm._image_pixels(prog) is None  # fallback, no raise
    assert mm._image_pixels(good[:40]) is None  # truncated

    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([good, prog], pa.binary()),
            "mime": pa.array(["image/jpeg", "image/jpeg"], pa.string()),
            "meta_width": pa.array([48, 48], pa.int32()),
            "meta_height": pa.array([32, 32], pa.int32()),
        },
        schema=mm.MEDIA_SCHEMA,
    )
    out = (
        rd.from_arrow(t)
        .map_batches(mm.ImageFeatureExtractor, batch_size=8, batch_format="pyarrow",
                     concurrency=1)
        .to_pandas()
        .sort_values("media_id")
    )
    f0_real = out.iloc[0]["features"][0]
    assert abs(f0_real - vals.mean() / 255.0) < 1e-6
    f0_fake = out.iloc[1]["features"][0]
    assert abs(f0_fake - vals.mean() / 255.0) > 1e-6  # stub path, not pixels


def test_jpeg_subsampled_color_roundtrip():
    """Hand-assembled 4:2:0 3-component stream (the common photo layout):
    encode Y/Cb/Cr planes through the grayscale encoder machinery is not
    possible, so build an image via the external-format invariants instead:
    a synthetic 4:2:0 JPEG from the uniform-gray fixture upscaled — here we
    at least pin that unsupported component counts and bad codes raise
    ValueError, never garbage."""
    from fhirflat_ray.functions import jpeg as jp

    with pytest.raises(ValueError, match="not a JPEG"):
        jp.decode_jpeg(b"\x00\x01")
    # SOI followed by garbage: missing SOF/SOS must raise, not return junk
    with pytest.raises(ValueError):
        jp.decode_jpeg(b"\xff\xd8\xff\xd9")


def test_jpeg_external_420_color_fixture():
    """A real libjpeg-produced 4:2:0 THREE-component baseline JPEG (the
    16x16 Python-logo test image shipped with CPython's imghdr test data):
    Y at 2x2, Cb/Cr at 1x1 sampling, Annex-K tables — exercises chroma
    upsampling + YCbCr->RGB against externally-encoded bytes. Structure
    (markers, sampling factors, entropy stream) is external ground truth;
    the channel means are pinned from this decoder (regression values —
    value-level correctness is established by the exact/±1 analytic
    tests above)."""
    import base64

    from fhirflat_ray.functions import jpeg as jp

    b = base64.b64decode(
        "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
        "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
        "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
        "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
        "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
        "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
        "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
        "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
        "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
        "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
        "f//Z"
    )
    px = jp.decode_jpeg(b)
    assert px.shape == (16, 16, 3)
    means = px.mean(axis=(0, 1))
    assert abs(means[0] - 97.89) < 0.5
    assert abs(means[1] - 102.29) < 0.5
    assert abs(means[2] - 76.36) < 0.5
