"""Weak-supervision reranker: 17 hand features + logistic regression.

Reference: ``project_template/pipeline/train_reranker.py`` — queries are
synthesized from seed items (``:169-219``), the seed's retrieval hit is the
positive, hard negatives come from the same top-k (``:284-296``), features
are 17 interpretable columns (``:60-101``), and the classifier is a
balanced logistic regression (``:305-306``).

TPU-first difference: the logistic regression trains on device with optax
(full-batch, balanced class weights) instead of sklearn/liblinear — same
model family, same payload schema (coef_/intercept_/predict_proba), no
sklearn dependency on this path.
"""

from __future__ import annotations

import random
import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.rank.recipe_features import (
    compute_flags,
    compute_low_calorie_score,
    compute_protein_score,
    extract_directions_text,
    extract_ingredient_phrases,
    extract_time_minutes,
    parse_query_intent,
)
from matrix_factorization_tpu.rank.filters import parse_time_constraint_from_query

FEATURE_NAMES = [
    "sim",
    "kw_overlap",
    "has_dairy",
    "has_peanut",
    "has_tree_nuts",
    "has_egg",
    "has_wheat",
    "has_soy",
    "has_fish",
    "has_shellfish",
    "time_min",
    "time_ok",
    "protein_score",
    "protein_ok",
    "low_calorie_score",
    "low_calorie_ok",
    "ingredients_count",
]


def keyword_overlap(query: str, text: str) -> float:
    """Fraction of the first 20 query tokens present in the item text."""
    q_terms = [t for t in re.split(r"\W+", (query or "").lower()) if t]
    if not q_terms:
        return 0.0
    hay = (text or "").lower()
    hit = sum(1 for t in q_terms[:20] if t in hay)
    return float(hit / max(1, min(20, len(q_terms))))


def featurize(
    query: str,
    item_text: str,
    sim: float,
    meta_row: Optional[pd.Series] = None,
) -> np.ndarray:
    """The 17-feature row; metadata values override parsed ones when
    present (reference ``:104-166``)."""
    ing = extract_ingredient_phrases(item_text)
    flags = compute_flags(ing)
    tmin = extract_time_minutes(item_text)
    pscore = compute_protein_score(ing)
    low_score, _ = compute_low_calorie_score(
        ingredients=ing, directions=extract_directions_text(item_text)
    )
    if meta_row is not None:
        for col, caster in (
            ("time_min", int), ("protein_score", float),
            ("low_calorie_score", float),
        ):
            if col in meta_row and pd.notna(meta_row[col]):
                try:
                    v = caster(meta_row[col])
                    if col == "time_min":
                        tmin = v
                    elif col == "protein_score":
                        pscore = v
                    else:
                        low_score = v
                except Exception:
                    pass

    q_t = parse_time_constraint_from_query(query)
    time_ok = 1.0
    if q_t is not None and tmin is not None:
        time_ok = 1.0 if int(tmin) <= int(q_t) else 0.0

    intent = parse_query_intent(query)
    protein_ok = 1.0
    if intent.get("want_high_protein", False):
        protein_ok = 1.0 if float(pscore) >= 2.0 else 0.0
    low_cal_ok = 1.0
    if intent.get("want_low_calorie", False):
        low_cal_ok = 1.0 if float(low_score) >= 1.0 else 0.0

    return np.asarray(
        [
            float(sim),
            keyword_overlap(query, item_text),
            float(flags.has_dairy),
            float(flags.has_peanut),
            float(flags.has_tree_nuts),
            float(flags.has_egg),
            float(flags.has_wheat),
            float(flags.has_soy),
            float(flags.has_fish),
            float(flags.has_shellfish),
            float(tmin) if tmin is not None else -1.0,
            float(time_ok),
            float(pscore),
            float(protein_ok),
            float(low_score),
            float(low_cal_ok),
            float(len(ing)),
        ],
        dtype=np.float32,
    )


def generate_queries(item_text: str, rng: random.Random) -> List[str]:
    """Synthesize up to 4 realistic queries from a seed item
    (reference ``:169-219``): goal + meal (+ ingredient tokens), a timed
    variant, and no-dairy / no-nuts variants when the allergens apply."""
    ing = list(extract_ingredient_phrases(item_text))
    flags = compute_flags(ing)
    tmin = extract_time_minutes(item_text)

    tokens = []
    for x in ing:
        w = str(x).split(",")[0].strip()
        if 2 <= len(w) <= 24:
            tokens.append(w)
    rng.shuffle(tokens)
    tokens = tokens[:3]

    meal = rng.choice(["breakfast", "lunch", "dinner"])
    goal = rng.choice(["high protein", "low carb", "low sodium", "low calorie"])
    t = (
        rng.choice([20, 30, 45, 60])
        if tmin is None
        else (30 if tmin <= 30 else 45 if tmin <= 45 else 60)
    )

    base = f"{goal} {meal}"
    if tokens:
        base += " with " + " and ".join(tokens[:2])
    out = [base, base + f" under {t} minutes"]
    if flags.has_dairy:
        out.append(base + " no dairy")
    if flags.has_tree_nuts or flags.has_peanut:
        out.append(base + " no nuts")

    uniq, seen = [], set()
    for q in out:
        key = re.sub(r"\s+", " ", q.strip().lower())
        if key and key not in seen:
            seen.add(key)
            uniq.append(q.strip())
    return uniq[:4]


class JaxLogisticRegression:
    """Balanced binary logistic regression trained on device with optax.

    API-compatible with the sklearn estimator the reference pickles
    (coef_, intercept_, predict_proba, decision_function).
    """

    def __init__(self, max_iter: int = 500, lr: float = 0.1, l2: float = 1e-3):
        self.max_iter = max_iter
        self.lr = lr
        self.l2 = l2
        self.coef_: Optional[np.ndarray] = None
        self.intercept_: Optional[np.ndarray] = None
        self._mean: Optional[np.ndarray] = None
        self._scale: Optional[np.ndarray] = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "JaxLogisticRegression":
        import optax

        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32)
        # standardize for conditioning; fold back into coef at the end
        self._mean = X.mean(axis=0)
        self._scale = np.maximum(X.std(axis=0), 1e-6)
        Xs = (X - self._mean) / self._scale
        # balanced class weights (reference: class_weight='balanced')
        n, d = Xs.shape
        n_pos = max(1.0, float(y.sum()))
        n_neg = max(1.0, float(n - y.sum()))
        w = np.where(y > 0.5, n / (2 * n_pos), n / (2 * n_neg)).astype(np.float32)

        Xj, yj, wj = jnp.asarray(Xs), jnp.asarray(y), jnp.asarray(w)
        params = {"w": jnp.zeros((d,), jnp.float32), "b": jnp.float32(0.0)}
        opt = optax.adam(self.lr)

        @jax.jit
        def train(params):
            state = opt.init(params)

            def loss_fn(p):
                z = Xj @ p["w"] + p["b"]
                ll = optax.sigmoid_binary_cross_entropy(z, yj)
                return jnp.mean(wj * ll) + self.l2 * jnp.sum(p["w"] ** 2)

            def step(carry, _):
                p, s = carry
                g = jax.grad(loss_fn)(p)
                up, s = opt.update(g, s)
                return (optax.apply_updates(p, up), s), None

            (params, _), _ = jax.lax.scan(
                step, (params, state), None, length=self.max_iter
            )
            return params

        out = train(params)
        w_s = np.asarray(out["w"])
        b_s = float(out["b"])
        # unfold standardization: w = w_s / scale; b = b_s - mean . w
        coef = w_s / self._scale
        self.coef_ = coef[None, :]
        self.intercept_ = np.asarray([b_s - float(self._mean @ coef)])
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, np.float32) @ self.coef_[0] + self.intercept_[0]

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = self.decision_function(X)
        p = 1.0 / (1.0 + np.exp(-z))
        return np.stack([1 - p, p], axis=1)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.decision_function(X) > 0).astype(np.int32)


class JaxMLPReranker:
    """One-hidden-layer MLP reranker trained on device with optax.

    Drop-in upgrade over :class:`JaxLogisticRegression` — identical
    serving API (``predict_proba`` / ``decision_function``) and payload
    schema, so serving and eval code need no changes.  The reference has
    no MLP counterpart (its reranker is sklearn LogisticRegression,
    ``train_reranker.py:305-306``); this is the documented upgrade path
    for when the 17 hand features interact non-linearly.
    """

    def __init__(self, hidden: int = 64, max_iter: int = 200,
                 lr: float = 0.005, l2: float = 1e-3, seed: int = 0,
                 val_frac: float = 0.0):
        self.hidden = hidden
        self.max_iter = max_iter
        self.lr = lr
        self.l2 = l2
        self.seed = seed
        self.val_frac = val_frac
        self._params: Optional[Dict] = None
        self._mean: Optional[np.ndarray] = None
        self._scale: Optional[np.ndarray] = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "JaxMLPReranker":
        import optax

        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32)
        self._mean = X.mean(axis=0)
        self._scale = np.maximum(X.std(axis=0), 1e-6)
        Xs = (X - self._mean) / self._scale
        n, d = Xs.shape
        n_pos = max(1.0, float(y.sum()))
        n_neg = max(1.0, float(n - y.sum()))
        w = np.where(y > 0.5, n / (2 * n_pos), n / (2 * n_neg)).astype(np.float32)

        # optional held-out split for in-scan early stopping
        # (val_frac>0).  Defaults train the full budget on all samples:
        # on the A/B corpus (benchmarks/reranker_ab.py) a modest fixed
        # budget (200 adam steps, l2=1e-3) beat both the original
        # 800-step config (which overfits: hit@5 0.39 vs 0.49) and
        # BCE-val early stopping (0.46 — pointwise val loss is a weak
        # proxy for ranking quality)
        n_val = int(round(n * self.val_frac))
        track_best = 0 < n_val < n

        k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
        h = self.hidden
        params = {
            "w1": jax.random.normal(k1, (d, h), jnp.float32) * (2.0 / d) ** 0.5,
            "b1": jnp.zeros((h,), jnp.float32),
            "w2": jax.random.normal(k2, (h,), jnp.float32) * (1.0 / h) ** 0.5,
            "b2": jnp.float32(0.0),
        }
        if track_best:
            perm = np.random.default_rng(self.seed).permutation(n)
            vi, ti = perm[:n_val], perm[n_val:]
            Xj, yj, wj = jnp.asarray(Xs[ti]), jnp.asarray(y[ti]), jnp.asarray(w[ti])
            Xv, yv, wv = jnp.asarray(Xs[vi]), jnp.asarray(y[vi]), jnp.asarray(w[vi])
        else:
            # default path: no split — no index copies and no second
            # device transfer of the full training set
            Xj, yj, wj = jnp.asarray(Xs), jnp.asarray(y), jnp.asarray(w)
            Xv = yv = wv = None
        opt = optax.adam(self.lr)

        def logits(p, x):
            return jax.nn.relu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]

        @jax.jit
        def train(params):
            import optax as _ox

            state = opt.init(params)

            def loss_fn(p):
                ll = _ox.sigmoid_binary_cross_entropy(logits(p, Xj), yj)
                reg = self.l2 * (jnp.sum(p["w1"] ** 2) + jnp.sum(p["w2"] ** 2))
                return jnp.mean(wj * ll) + reg

            def val_loss(p):
                ll = _ox.sigmoid_binary_cross_entropy(logits(p, Xv), yv)
                return jnp.mean(wv * ll)

            def step(carry, _):
                p, s, best_p, best_l = carry
                g = jax.grad(loss_fn)(p)
                up, s = opt.update(g, s)
                p = optax.apply_updates(p, up)
                if track_best:
                    vl = val_loss(p)
                    better = vl < best_l
                    best_p = jax.tree.map(
                        lambda new, old: jnp.where(better, new, old),
                        p, best_p)
                    best_l = jnp.minimum(vl, best_l)
                return (p, s, best_p, best_l), None

            init = (params, state, params,
                    val_loss(params) if track_best else jnp.float32(jnp.inf))
            (last_p, _, best_p, _), _ = jax.lax.scan(
                step, init, None, length=self.max_iter
            )
            # default (no held-out split): the documented fixed-budget
            # endpoint, with no per-step val pass paid
            return best_p if track_best else last_p

        self._params = {k: np.asarray(v) for k, v in train(params).items()}
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        Xs = (np.asarray(X, np.float32) - self._mean) / self._scale
        p = self._params
        hid = np.maximum(Xs @ p["w1"] + p["b1"], 0.0)
        return hid @ p["w2"] + p["b2"]

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = self.decision_function(X)
        # stable sigmoid: exp of a non-positive argument only
        e = np.exp(-np.abs(z))
        prob = np.where(z >= 0.0, 1.0 / (1.0 + e), e / (1.0 + e))
        return np.stack([1 - prob, prob], axis=1)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.decision_function(X) > 0).astype(np.int32)


def rerank_scores(
    payload: Dict,
    query: str,
    rows: List[Tuple[str, float]],  # [(item_text, sim)]
    meta_map: Optional[Dict[str, pd.Series]] = None,
    item_ids: Optional[List] = None,
) -> np.ndarray:
    """Serve-time scoring: P(relevant) per candidate from a reranker
    payload (reference streamlit_app.py:460-566 feature assembly)."""
    model = payload["model"]
    feats = []
    for idx, (text, sim) in enumerate(rows):
        meta_row = None
        if meta_map is not None and item_ids is not None:
            meta_row = meta_map.get(str(item_ids[idx]))
        feats.append(featurize(query, text, sim, meta_row))
    X = np.vstack(feats)
    return model.predict_proba(X)[:, 1]
