"""Retrieval indexes + search, recipe features, filters, diversity,
hybrid blending, reranker."""

import random

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu.rank import recipe_features as rf
from matrix_factorization_tpu.rank.diversity import select_diverse_greedy
from matrix_factorization_tpu.rank.filters import (
    apply_hard_filters,
    parse_time_constraint_from_query,
)
from matrix_factorization_tpu.rank.hybrid import blend, hybrid_rank, minmax
from matrix_factorization_tpu.rank.reranker import (
    FEATURE_NAMES,
    JaxLogisticRegression,
    featurize,
    generate_queries,
)
from matrix_factorization_tpu.retrieval.encode import hash_embed
from matrix_factorization_tpu.retrieval.index import (
    build_dense_index,
    build_tfidf_index,
    load_item_index,
    save_item_index,
)
from matrix_factorization_tpu.retrieval.search import (
    encode_query_for_index,
    search_topk,
    search_topk_pos,
)

TEXTS = [
    "title: grilled chicken salad\ningredients: chicken breast; lettuce; olive oil\ndirections: grill chicken 10-15 minutes and toss",
    "title: peanut butter cookies\ningredients: peanut butter; sugar; flour; eggs\ndirections: bake 12 minutes",
    "title: creamy salmon pasta\ningredients: salmon; cream; pasta; cheese\ndirections: cook pasta 1 hour",
    "title: tofu stir fry\ningredients: tofu; soy sauce; broccoli\ndirections: fry tofu 5 minutes",
    "title: walnut brownies\ningredients: walnut; chocolate; butter; sugar\ndirections: bake 30 minutes",
]
IDS = ["a", "b", "c", "d", "e"]


# ----------------------------- retrieval ---------------------------------


def test_tfidf_index_roundtrip(tmp_path):
    idx = build_tfidf_index(IDS, TEXTS, min_df=1)
    save_item_index(idx, tmp_path / "ix.pkl")
    loaded = load_item_index(tmp_path / "ix.pkl")
    q = encode_query_for_index(loaded, "grilled chicken salad")
    top = search_topk(loaded, q, k=2)
    assert top[0][0] == "a"
    assert top[0][1] > top[1][1]


def test_dense_index_topk(tmp_path):
    emb = hash_embed(TEXTS)
    idx = build_dense_index(IDS, TEXTS, emb)
    save_item_index(idx, tmp_path / "dx.pkl")
    loaded = load_item_index(tmp_path / "dx.pkl")
    q = encode_query_for_index(loaded, "peanut butter cookies")
    rows = search_topk_pos(loaded, q, k=3)
    assert rows[0][1] == "b"
    assert len(rows) == 3
    assert search_topk(loaded, q, k=0) == []


def test_hash_embed_normalized_and_deterministic():
    a = hash_embed(["chicken soup"], dim=128)
    b = hash_embed(["chicken soup"], dim=128)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


# --------------------------- recipe features ------------------------------


def test_ingredient_parsing_and_time():
    ings = rf.extract_ingredient_phrases(TEXTS[0])
    assert "chicken breast" in ings and "olive oil" in ings
    assert rf.extract_time_minutes(TEXTS[0]) == 15  # range takes upper bound
    assert rf.extract_time_minutes(TEXTS[2]) == 60  # 1 hour
    assert rf.extract_time_minutes("title: x") is None


def test_flags_and_scores():
    flags = rf.compute_flags(rf.extract_ingredient_phrases(TEXTS[1]))
    assert flags.has_peanut and flags.has_wheat and flags.has_egg
    assert not flags.has_fish
    flags2 = rf.compute_flags(rf.extract_ingredient_phrases(TEXTS[4]))
    assert flags2.has_tree_nuts
    assert rf.compute_protein_score(
        rf.extract_ingredient_phrases(TEXTS[0])
    ) >= 1.0
    low, pen = rf.compute_low_calorie_score(
        ingredients=rf.extract_ingredient_phrases(TEXTS[4]),
        directions=rf.extract_directions_text(TEXTS[4]),
    )
    assert pen >= 2.0  # chocolate, butter, sugar


def test_avoid_expansion():
    out = rf.expand_avoid_terms(["milk"], enable=True)
    assert "cheese" in out and "butter" in out and "dairy" in out
    assert rf.expand_avoid_terms(["milk"], enable=False) == ["milk"]
    out2 = rf.expand_avoid_terms(["nuts"], enable=True)
    assert "walnut" in out2


def test_query_intent_and_time_constraint():
    assert rf.parse_query_intent("high protein lunch")["want_high_protein"]
    assert not rf.parse_query_intent("low protein")["want_high_protein"]
    assert parse_time_constraint_from_query("dinner under 30 minutes") == 30
    assert parse_time_constraint_from_query("ready in 20 minutes") == 20
    assert parse_time_constraint_from_query("slow roast") is None


# ------------------------------- filters ----------------------------------


def test_hard_filters_chain():
    cands = [(i, IDS[i], 1.0 - 0.1 * i) for i in range(5)]
    meta = pd.DataFrame(
        {
            "time_min": [15, 12, 60, 5, 30],
            "protein_score": [3.0, 0.0, 2.0, 2.5, 0.0],
            "low_calorie_score": [2.0, 0.0, 0.0, 1.5, 0.0],
        },
        index=[str(x) for x in IDS],
    )
    out = apply_hard_filters(
        cands, TEXTS, avoid_terms=["peanut"], meta=meta, max_time_min=30,
        require_high_protein=True,
    )
    got = [c[1] for c in out]
    assert "b" not in got  # peanut
    assert "c" not in got  # 60 min
    assert "a" in got and "d" in got
    out2 = apply_hard_filters(cands, TEXTS, must_terms=["tofu"])
    assert [c[1] for c in out2] == ["d"]


# ------------------------------ diversity ---------------------------------


def test_diversity_greedy_prefers_distinct_sets():
    sets = [{"a", "b"}, {"a", "b"}, {"c", "d"}]
    scores = np.array([1.0, 0.99, 0.5])
    sel, _ = select_diverse_greedy(
        base_score=scores, cand_sets=sets, n=2, diversity_penalty=1.0
    )
    assert sel == [0, 2]  # near-duplicate 1 is penalized below 2

    # carry-over: previously selected set penalizes overlapping candidates
    sel2, _ = select_diverse_greedy(
        base_score=scores, cand_sets=sets, n=1, diversity_penalty=1.0,
        already_selected_sets=[{"a", "b"}],
    )
    assert sel2 == [2]


# -------------------------------- hybrid -----------------------------------


def test_minmax_and_blend():
    assert minmax(np.array([2.0, 2.0])).tolist() == [0.0, 0.0]
    s = blend(np.array([0.0, 10.0]), np.array([1.0, 0.0]), alpha=0.5)
    np.testing.assert_allclose(s, [0.5, 0.5])


def test_hybrid_rank_without_model_uses_sims():
    cands = [("x", 0.9), ("y", 0.5), ("z", 0.1)]
    out = hybrid_rank(cands, model=None, user_id=None, alpha=0.5, k=2)
    assert [o[0] for o in out] == ["x", "y"]


# ------------------------------- reranker ----------------------------------


def test_featurize_shape_and_semantics():
    v = featurize("high protein lunch under 20 minutes", TEXTS[0], 0.7, None)
    assert v.shape == (len(FEATURE_NAMES),)
    assert v[0] == pytest.approx(0.7)
    d = dict(zip(FEATURE_NAMES, v))
    assert d["time_ok"] == 1.0  # 15 <= 20
    # "chicken breast" hits both the "chicken breast" and "chicken" protein
    # words (substring counting, reference semantics) -> score 2 -> ok
    assert d["protein_score"] == 2.0
    assert d["protein_ok"] == 1.0
    v2 = featurize("dinner under 10 minutes", TEXTS[0], 0.7, None)
    assert dict(zip(FEATURE_NAMES, v2))["time_ok"] == 0.0


def test_generate_queries_plausible():
    qs = generate_queries(TEXTS[1], random.Random(0))
    assert 1 <= len(qs) <= 4
    assert any("no nuts" in q for q in qs)  # peanut recipe


def test_jax_logreg_learns_separable():
    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, (400, 5)).astype(np.float32)
    w_true = np.array([2.0, -1.0, 0.5, 0.0, 0.0])
    y = (X @ w_true + 0.1 * rng.normal(size=400) > 0).astype(np.int32)
    clf = JaxLogisticRegression(max_iter=300).fit(X, y)
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.95
    p = clf.predict_proba(X)
    assert p.shape == (400, 2)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_tfidf_batch_scores_match_scipy():
    from matrix_factorization_tpu.retrieval.sparse_scoring import (
        tfidf_batch_scores,
        tfidf_batch_topk,
    )

    idx = build_tfidf_index(IDS, TEXTS, min_df=1)
    queries = ["grilled chicken salad", "peanut butter", "tofu broccoli"]
    got = tfidf_batch_scores(idx, queries, vocab_block=8)
    want = np.vstack([
        np.asarray((idx.matrix @ idx.vectorizer.transform([q]).T).todense()).ravel()
        for q in queries
    ])
    np.testing.assert_allclose(got, want, atol=1e-5)

    vals, pos = tfidf_batch_topk(idx, queries, k=2, vocab_block=8)
    assert IDS[pos[0, 0]] == "a" and IDS[pos[1, 0]] == "b" and IDS[pos[2, 0]] == "d"


def test_jax_mlp_reranker_learns_nonlinear():
    """The MLP upgrade must fit an XOR-ish boundary logreg cannot, with
    the same serving API (payload drop-in)."""
    from matrix_factorization_tpu.rank.reranker import JaxMLPReranker

    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (600, 4)).astype(np.float32)
    y = ((X[:, 0] * X[:, 1]) > 0).astype(np.int32)  # XOR of signs
    lin = JaxLogisticRegression(max_iter=300).fit(X, y)
    mlp = JaxMLPReranker(hidden=16, max_iter=600, lr=0.05).fit(X, y)
    acc_lin = (lin.predict(X) == y).mean()
    acc_mlp = (mlp.predict(X) == y).mean()
    assert acc_mlp > 0.9 > acc_lin  # nonlinear vs linear ceiling (~0.5)
    p = mlp.predict_proba(X)
    assert p.shape == (600, 2)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_tfidf_mesh_topk_matches_single_device():
    """Item-sharded TF-IDF top-k (VERDICT r3 #9): mesh path reproduces
    the single-device scores and global positions."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh
    from matrix_factorization_tpu.retrieval.sparse_scoring import (
        tfidf_batch_topk,
        tfidf_csr_topk,
    )

    idx = build_tfidf_index(IDS, TEXTS, min_df=1)
    queries = ["grilled chicken salad", "peanut butter", "tofu broccoli"]
    vals_1, pos_1 = tfidf_batch_topk(idx, queries, k=3, vocab_block=8)
    mesh = make_mesh(n_data=4, n_model=2)
    vals_m, pos_m = tfidf_batch_topk(idx, queries, k=3, vocab_block=8,
                                     mesh=mesh)
    np.testing.assert_allclose(vals_m, vals_1, atol=1e-5)
    # positions agree wherever scores are not tied
    gap = vals_1[:, :-1] - vals_1[:, 1:]
    tied = np.concatenate([gap < 1e-6, np.ones((len(queries), 1), bool)],
                          axis=1)
    assert (pos_m == pos_1)[~tied].all()

    # pre-encoded CSR entry point (what search_topk(mesh=...) rides)
    Qs = idx.vectorizer.transform(queries)
    vals_c, _ = tfidf_csr_topk(idx, Qs, k=3, mesh=mesh, vocab_block=8)
    np.testing.assert_allclose(vals_c, vals_1, atol=1e-5)


def test_dense_mesh_topk_matches_single_device():
    """Row-sharded dense top-k (round 5): the mesh path reproduces the
    single-device scores and global positions, for single queries,
    batches, and the search_topk(mesh=) entry point."""
    from matrix_factorization_tpu.parallel.mesh import make_mesh
    from matrix_factorization_tpu.retrieval.encode import hash_embed
    from matrix_factorization_tpu.retrieval.index import build_dense_index
    from matrix_factorization_tpu.retrieval.search import (
        dense_topk_mesh,
        encode_query_for_index,
        search_topk_batch,
        search_topk_pos,
    )

    ids = [f"d{i}" for i in range(37)]
    texts = [f"recipe {i} protein p{i % 7} veg v{i % 5} method m{i % 3}"
             for i in range(37)]
    idx = build_dense_index(ids, texts, hash_embed(texts, dim=64))
    mesh = make_mesh(n_data=4, n_model=2)

    q = np.stack([encode_query_for_index(idx, t) for t in
                  ("protein p3 veg v1", "method m2", "recipe 11")])
    vals_1, pos_1 = search_topk_batch(idx, q, k=5)
    vals_m, pos_m = dense_topk_mesh(idx, q, k=5, mesh=mesh)
    np.testing.assert_allclose(vals_m, vals_1, atol=1e-5)
    gap = vals_1[:, :-1] - vals_1[:, 1:]
    tied = np.concatenate([gap < 1e-6, np.ones((len(q), 1), bool)], axis=1)
    assert (pos_m == pos_1)[~tied].all()

    # batch entry point routes through the mesh scorer
    vals_b, _ = search_topk_batch(idx, q, k=5, mesh=mesh)
    np.testing.assert_allclose(vals_b, vals_1, atol=1e-5)

    # single-query entry point (search_topk_pos) returns the same rows
    rows_1 = search_topk_pos(idx, q[0], k=5)
    rows_m = search_topk_pos(idx, q[0], k=5, mesh=mesh)
    assert [r[1] for r in rows_m] == [r[1] for r in rows_1]
    np.testing.assert_allclose([r[2] for r in rows_m],
                               [r[2] for r in rows_1], atol=1e-5)
