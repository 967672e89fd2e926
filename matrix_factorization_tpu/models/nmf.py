"""Non-negative matrix factorization recommender (extension family).

No reference counterpart (SHEEPididoo/matrix-factorization has five
explicit models, none non-negative); included because NMF is a standard
member of the rating-factorization family the reference builds
(`surprise.NMF` is its best-known implementation) and its multiplicative
updates are a natural TPU fit — two read-only segment-sum passes per
epoch (alternating sides), zero sequential dependencies (see
:mod:`matrix_factorization_tpu.ops.nmf` for the algorithm and the
hardware mapping).

Lifecycle and defaults follow the family conventions here
(``RecommenderBase``: fit / predict / recommend / update_users) with
Surprise's hyperparameter defaults (n_factors=15, n_epochs=50,
reg=0.06).  Ratings must be non-negative (the multiplicative rule
preserves sign only for non-negative data).  Cold-start pairs predict
the global mean rating, clipped — factors can't express a "no
information" score of 0 meaningfully on a 1..5 scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.models.base import RecommenderBase, bucketed_predict
from matrix_factorization_tpu.ops import nmf as nmf_ops
from matrix_factorization_tpu.ops import segment_sgd as sgd


class NMF(RecommenderBase):
    """Explicit-rating NMF: ``r_ui ~= p_u . q_i`` with ``p, q >= 0``.

    ``reg_pu`` / ``reg_qi`` default to ``reg``; the L2 term is scaled by
    each entity's observation count (the standard recommender-NMF rule).
    """

    def __init__(
        self,
        n_factors: int = 15,
        n_epochs: int = 50,
        reg: float = 0.06,
        reg_pu: Optional[float] = None,
        reg_qi: Optional[float] = None,
        init_low: float = 0.0,
        init_high: float = 1.0,
        min_rating: float = 0,
        max_rating: float = 5,
        verbose: int = 0,
        batch_size: int = 131_072,
        seed: int = 0,
        serving_dtype: str = "float32",
        mesh=None,
    ):
        if serving_dtype not in ("float32", "bfloat16"):
            raise ValueError("serving_dtype must be 'float32' or 'bfloat16'")
        if init_low < 0 or init_high <= init_low:
            raise ValueError("need 0 <= init_low < init_high")
        super().__init__(min_rating=min_rating, max_rating=max_rating,
                         verbose=verbose)
        self.n_factors = n_factors
        self.n_epochs = n_epochs
        # ctor args stored verbatim (sklearn get_params / checkpoint
        # roundtrip contract); resolve the None defaults via _reg_pu/_reg_qi
        self.reg = reg
        self.reg_pu = reg_pu
        self.reg_qi = reg_qi
        self.init_low = init_low
        self.init_high = init_high
        self.batch_size = batch_size
        self.seed = seed
        self.serving_dtype = serving_dtype
        # optional jax.sharding.Mesh: >1 data-axis devices routes fit
        # through ops.nmf.dp_nmf_train (P sharded, Q replicated, one
        # item-accumulator psum per epoch)
        self.mesh = mesh
        self._params: Optional[sgd.MFParams] = None
        self._serving_cache = None
        self.train_rmse: list = []
        self.global_mean: float = 0.0

    def _regs(self) -> tuple:
        """(reg_pu, reg_qi) with the ``reg`` default resolved."""
        return (self.reg if self.reg_pu is None else self.reg_pu,
                self.reg if self.reg_qi is None else self.reg_qi)

    def _cfg(self, batch_size: Optional[int] = None,
             compute_epoch_rmse: bool = True) -> SGDConfig:
        # linear kernel + zero global mean + zero biases == pure p.q —
        # the whole serving stack (predict_pairs, catalog scorers,
        # device top-k, bf16 residency) is reused unchanged
        return SGDConfig(
            kernel="linear",
            n_factors=self.n_factors,
            reg=self._regs()[0],
            min_rating=self.min_rating,
            max_rating=self.max_rating,
            batch_size=batch_size or self.batch_size,
            compute_epoch_rmse=compute_epoch_rmse,
        )

    # -- capacity -----------------------------------------------------------
    def _ensure_user_capacity(self, n_needed: int, key: jax.Array) -> None:
        cap = self._params.user_features.shape[0]
        if n_needed <= cap:
            return
        new_cap = sgd.round_up(max(n_needed, int(cap * 1.5) + 1), 1024)
        fresh = nmf_ops.fresh_nmf_user_rows(
            key, new_cap - cap, self._cfg(), self.init_low, self.init_high)
        self._params = self._params._replace(
            user_features=jnp.concatenate([self._params.user_features, fresh])
        )

    # -- lifecycle ----------------------------------------------------------
    @staticmethod
    def _counts(ids: np.ndarray, cap: int) -> jax.Array:
        return jnp.asarray(
            np.bincount(ids, minlength=cap).astype(np.float32))

    def fit(self, X: pd.DataFrame, y: pd.Series, n_epochs: int = None):
        u, i, r = self._preprocess_fit(X, y)
        if len(r) and r.min() < 0:
            raise ValueError(
                "NMF requires non-negative ratings (multiplicative updates "
                f"preserve sign only for r >= 0; got min {r.min()})")
        self.global_mean = float(np.mean(r)) if len(r) else 0.0
        n_epochs = n_epochs or self.n_epochs
        cfg = self._cfg()
        reg_pu, reg_qi = self._regs()
        mesh_data = 1
        if self.mesh is not None:
            from matrix_factorization_tpu.parallel.mesh import data_size_of

            mesh_data = data_size_of(self.mesh)
        if mesh_data > 1:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            from matrix_factorization_tpu.parallel import distributed as dist
            from matrix_factorization_tpu.parallel.mesh import data_axes_of

            ucap = sgd.round_up(self.n_users, 8 * mesh_data)
            params = nmf_ops.init_nmf_params(
                jax.random.PRNGKey(self.seed), self.n_users, self.n_items,
                cfg, self.init_low, self.init_high, user_capacity=ucap)
            params = dist.place_params(params, self.mesh)
            shard = NamedSharding(self.mesh, Pspec(data_axes_of(self.mesh)))
            rep = NamedSharding(self.mesh, Pspec())
            # the accumulate scatter writes (cap, 2k) rows, so the tile
            # cost model prices that width, not the factor-table width
            data = sgd.pack_ratings(
                u, i, r, cfg.batch_size, order="auto",
                row_width=2 * cfg.n_factors, n_dev=mesh_data,
                users_per_dev=ucap // mesh_data)
            data = jax.tree.map(lambda a: jax.device_put(a, shard), data)
            cnt_u = jax.device_put(self._counts(u, ucap), shard)
            cnt_i = jax.device_put(
                self._counts(i, params.item_features.shape[0]), rep)
            fn = nmf_ops.jit_dp_nmf_train(cfg, n_epochs, reg_pu, reg_qi,
                                          self.mesh)
            params, rmse_hist = fn(params, data, cnt_u, cnt_i)
            # gather for the single-device serving paths (the family
            # convention — SVDpp.fit does the same after its dp branch)
            params = sgd.MFParams(
                jnp.asarray(np.asarray(params.user_features)),
                jnp.asarray(np.asarray(params.item_features)),
                jnp.asarray(np.asarray(params.global_mean)),
            )
        else:
            params = nmf_ops.init_nmf_params(
                jax.random.PRNGKey(self.seed), self.n_users, self.n_items,
                cfg, self.init_low, self.init_high)
            # visit order is semantics-free for the full-batch passes,
            # so always chunk-sort for the tightest aggregation tiles;
            # the scatter target is the (cap, 2k) accumulator, so the
            # tile cost model prices that row width
            data = sgd.pack_ratings(u, i, r, cfg.batch_size, order="auto",
                                    row_width=2 * cfg.n_factors)
            cnt_u = self._counts(u, params.user_features.shape[0])
            cnt_i = self._counts(i, params.item_features.shape[0])
            fn = nmf_ops.jit_nmf_train(cfg, n_epochs, reg_pu, reg_qi)
            params, rmse_hist = fn(params, data, cnt_u, cnt_i)
        self._params = params
        self._serving_cache = None
        self.train_rmse = np.asarray(rmse_hist).tolist()
        if self.verbose:
            for e, v in enumerate(self.train_rmse):
                print(f"Epoch {e + 1} train RMSE: {v:.4f}")
        return self

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray,
                        bound_ratings: bool):
        self._require_fitted()
        fn = sgd.jit_predict_pairs(self._cfg(), bound_ratings)
        preds, possible = bucketed_predict(
            lambda uu, ii: fn(self._params, jnp.asarray(uu), jnp.asarray(ii)),
            u, i)
        # cold-start fallback: global mean rating, not the factor model's
        # meaningless 0 (params.global_mean is pinned at 0 so the linear
        # forward degenerates to p.q)
        fb = self.global_mean
        if bound_ratings:
            fb = float(np.clip(fb, self.min_rating, self.max_rating))
        return np.where(possible, preds, fb), possible

    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        if X.shape[0] == 0:
            return []
        u, i = self._preprocess_predict(X)
        preds, possible = self._predict_arrays(u, i, bound_ratings)
        self.predictions_possible = possible.tolist()
        return preds.tolist()

    def _predict_dense(self, u, i, bound_ratings):
        return self._predict_arrays(
            np.asarray(u, np.int32), np.asarray(i, np.int32), bound_ratings
        )

    def update_users(
        self,
        X: pd.DataFrame,
        y: pd.Series,
        lr: float = 0.0,  # unused: NMF updates are multiplicative (kept
        n_epochs: int = 20,  # for lifecycle-signature compatibility)
        verbose: int = 0,
    ):
        """Partial fit for new/updated users, item side frozen (the
        family's ``update_users`` contract): known users named in X are
        re-initialized to fresh non-negative rows, then ``n_epochs``
        user-side multiplicative updates run against the frozen items."""
        u, i, r, known_users, _new = self._preprocess_update(X, y)
        if len(r) and r.min() < 0:
            raise ValueError("NMF requires non-negative ratings")
        key = jax.random.PRNGKey(self.seed + 1)
        k_grow, k_reinit = jax.random.split(key)
        self._ensure_user_capacity(self.n_users, k_grow)

        if known_users:
            idx = jnp.asarray(
                self.user_vocab.encode(np.asarray(known_users, dtype=object))
            )
            fresh = nmf_ops.fresh_nmf_user_rows(
                k_reinit, len(known_users), self._cfg(),
                self.init_low, self.init_high)
            self._params = self._params._replace(
                user_features=self._params.user_features.at[idx].set(fresh)
            )

        pack_bs = min(self.batch_size, max(1, len(r)))
        cfg = self._cfg(batch_size=pack_bs)
        # user-primary: the one live (user) accumulator rides the
        # perm-free primary tiles
        data = sgd.pack_ratings(u, i, r, pack_bs, order="user",
                                row_width=2 * cfg.n_factors)
        cnt_u = self._counts(u, self._params.user_features.shape[0])
        cnt_i = jnp.zeros((self._params.item_features.shape[0],), jnp.float32)
        reg_pu, reg_qi = self._regs()
        fn = nmf_ops.jit_nmf_train(cfg, n_epochs, reg_pu, reg_qi,
                                   update_item_params=False)
        params, rmse_hist = fn(self._params, data, cnt_u, cnt_i)
        self._params = params
        self.train_rmse = np.asarray(rmse_hist).tolist()
        if verbose:
            for e, v in enumerate(self.train_rmse):
                print(f"Epoch {e + 1} train RMSE: {v:.4f}")
        return self

    # -- serving (shared machinery, see KernelMF) -----------------------------
    def _serving_params(self) -> sgd.MFParams:
        return self._cached_serving_params()

    def _catalog_scores_batch(self, u_dense: np.ndarray) -> np.ndarray:
        from matrix_factorization_tpu.ops.scoring import catalog_scores

        return catalog_scores(self._cfg(), self._serving_params(),
                              self.n_items, u_dense)

    def _catalog_scores(self, u_dense: int) -> np.ndarray:
        return self._catalog_scores_batch(np.asarray([u_dense], np.int32))[0]

    def _catalog_topk(self, u_dense: np.ndarray, k: int):
        from matrix_factorization_tpu.ops.scoring import catalog_topk

        return catalog_topk(self._cfg(), self._serving_params(),
                            self.n_items, u_dense, k)

    # -- parameter views ------------------------------------------------------
    @property
    def user_features(self) -> np.ndarray:
        return np.asarray(
            self._params.user_features[: self.n_users, : self.n_factors])

    @property
    def item_features(self) -> np.ndarray:
        return np.asarray(
            self._params.item_features[: self.n_items, : self.n_factors])
