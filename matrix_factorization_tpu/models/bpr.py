"""BPR: pairwise-ranking matrix factorization for implicit feedback.

The ranking-loss companion of
:class:`~matrix_factorization_tpu.models.implicit.ImplicitALS` — see
``ops/bpr.py`` for the objective and the TPU design (triplet scan,
deterministic uniform negatives, extended-row tables).  The reference
has no implicit-feedback models; both are extensions beyond its surface.

API matches the ``RecommenderBase`` lifecycle: ``fit(X)`` on an
interaction table (``y`` optional — interactions are binary events; a
provided ``y`` only filters rows with strength <= 0 out of the positive
set), ``predict`` returns unbounded ranking scores, ``recommend`` /
``recommend_batch`` rank the catalog on device, and ``update_users``
re-trains the named users' rows with the item side frozen.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.models.base import RecommenderBase, bucketed_predict
from matrix_factorization_tpu.ops import bpr as bpr_ops
from matrix_factorization_tpu.ops import segment_sgd as sgd


class BPR(RecommenderBase):
    def __init__(
        self,
        n_factors: int = 64,
        n_epochs: int = 30,
        lr: float = 0.05,
        reg: float = 0.002,
        batch_size: int = 8192,
        init_sd: float = 0.1,
        verbose: int = 0,
        seed: int = 0,
        mesh=None,
        overlap_psum: bool = False,
        serving_dtype: str = "float32",
        dp_layout: str = "tiled",
        psum_every=1,
    ):
        """``serving_dtype``: 'float32' or 'bfloat16' — the same
        bf16-resident catalog-serving option as ``KernelMF``.

        ``mesh``: optional ``jax.sharding.Mesh``; with >1 device on the
        data axes, ``fit`` trains data-parallel (user-sharded P, psum'd
        item deltas) and gathers the result for serving.
        ``dp_layout``: 'tiled' (default — the MXU tile-aggregated dp
        step, ``ops/bpr.py::dp_bpr_train_tiled``; the single-chip tile
        rate carried into the mesh) or 'flat' (per-row scatters,
        ``dp_bpr_train``).  ``overlap_psum`` defers the item all-reduce
        one step/window and ``psum_every`` windows it (tiled layout
        only), same knobs as ``KernelMF``."""
        if serving_dtype not in ("float32", "bfloat16"):
            raise ValueError("serving_dtype must be 'float32' or 'bfloat16'")
        if overlap_psum and mesh is None:
            raise ValueError("overlap_psum=True requires a mesh")
        if dp_layout not in ("tiled", "flat"):
            raise ValueError(f"unknown dp_layout {dp_layout!r}")
        if psum_every != 1 and mesh is None:
            raise ValueError("psum_every requires a mesh")
        # ranking scores are unbounded; +-inf makes every clamp a no-op
        super().__init__(min_rating=float("-inf"), max_rating=float("inf"),
                         verbose=verbose)
        self.n_factors = n_factors
        self.n_epochs = n_epochs
        self.lr = lr
        self.reg = reg
        self.batch_size = batch_size
        self.init_sd = init_sd
        self.seed = seed
        self.mesh = mesh
        self.overlap_psum = overlap_psum
        self.serving_dtype = serving_dtype
        self.dp_layout = dp_layout
        self.psum_every = psum_every
        self._params: Optional[sgd.MFParams] = None
        self._serving_cache = None
        self.train_loss: list = []

    def _cfg(self, compute_epoch_rmse: bool = False) -> SGDConfig:
        # rating bounds enter SGDConfig only through the sigmoid/rbf
        # epilogues and the clamp; BPR serves the linear kernel unbounded
        return SGDConfig(
            kernel="linear",
            n_factors=self.n_factors,
            reg=self.reg,
            min_rating=0.0,
            max_rating=1.0,
            compute_epoch_rmse=compute_epoch_rmse,
        )

    # -- lifecycle ----------------------------------------------------------
    def fit(self, X: pd.DataFrame, y: pd.Series = None,
            n_epochs: int = None, warm_start: bool = False):
        """Train on the interaction table.  ``y`` (optional interaction
        strengths) only gates which rows count as positives (> 0).

        ``warm_start=True`` continues from the current parameters (same
        id space, strict encode) instead of re-initializing — the
        building block of ``core.checkpoint.fit_resumable``.  Each
        segment draws fresh negative/permutation randomness (the epoch
        key is folded with the epochs completed so far); warm
        continuations train on the single-device path even when a mesh
        is attached, mirroring ``KernelMF``."""
        if y is None:
            y = pd.Series(np.ones(len(X), np.float32))
        prev_pairs = None
        if warm_start and self._params is not None:
            from matrix_factorization_tpu.core.ids import check_no_duplicates

            users = X["user_id"].to_numpy()
            items = X["item_id"].to_numpy()
            check_no_duplicates(users, items)
            u = self.user_vocab.encode(users, strict=True)
            i = self.item_vocab.encode(items, strict=True)
            r = np.asarray(y, dtype=np.float32)
            # auc() keeps rejecting EARLIER training positives too: a warm
            # segment may carry different (incremental) interactions
            prev_pairs = self._train_pairs
        else:
            warm_start = False
            u, i, r = self._preprocess_fit(X, y)
            self.train_loss = []
        keep = r > 0
        u, i = u[keep], i[keep]
        if len(u) == 0:
            raise ValueError("BPR needs at least one positive interaction")
        cfg = self._cfg()
        n_epochs = n_epochs or self.n_epochs
        if prev_pairs is None:  # AUC negative rejection
            self._train_pairs = (u.copy(), i.copy())
        else:
            self._train_pairs = (np.concatenate([prev_pairs[0], u]),
                                 np.concatenate([prev_pairs[1], i]))
        k_fit = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                   1 + len(self.train_loss))
        mesh_data = 1
        if self.mesh is not None:
            from matrix_factorization_tpu.parallel.mesh import data_size_of

            mesh_data = data_size_of(self.mesh)
        if mesh_data > 1 and not warm_start:
            from matrix_factorization_tpu.parallel import distributed as dist

            ucap, bs, (su, si, _, sw), shard, _rep = dist.dp_fit_plumbing(
                u, i, np.ones(len(u), np.float32), self.n_users, self.mesh,
                self.batch_size,
            )
            params = sgd.init_params(
                jax.random.PRNGKey(self.seed), self.n_users, self.n_items,
                cfg, global_mean=0.0, init_sd=self.init_sd,
                user_capacity=ucap,
            )
            params = dist.place_params(params, self.mesh)
            if self.dp_layout == "tiled":
                data = sgd.pack_ratings(
                    u.astype(np.int32), i.astype(np.int32),
                    np.ones(len(u), np.float32), bs,
                    shuffle_seed=self.seed, order="user",
                    row_width=cfg.padded_factors, n_dev=mesh_data,
                    users_per_dev=ucap // mesh_data,
                )
                data = jax.tree.map(lambda a: jax.device_put(a, shard),
                                    data)
                train = bpr_ops.jit_dp_bpr_train_tiled(
                    cfg, n_epochs, self.lr, self.n_items, self.mesh,
                    overlap_psum=self.overlap_psum,
                    psum_every=self.psum_every,
                )
                params, hist = train(params, data, k_fit)
            else:
                train = bpr_ops.jit_dp_bpr_train(
                    cfg, n_epochs, self.lr, self.n_items, bs, len(u),
                    self.mesh, overlap_psum=self.overlap_psum,
                )
                params, hist = train(
                    params, jax.device_put(su, shard),
                    jax.device_put(si, shard),
                    jax.device_put(sw, shard), k_fit,
                )
            # gather for the single-device serving paths
            params = sgd.MFParams(
                user_features=jnp.asarray(np.asarray(params.user_features)),
                item_features=jnp.asarray(np.asarray(params.item_features)),
                global_mean=jnp.asarray(np.asarray(params.global_mean)),
            )
        else:
            if warm_start:
                params = self._params
            else:
                params = sgd.init_params(
                    jax.random.PRNGKey(self.seed), self.n_users,
                    self.n_items, cfg, global_mean=0.0,
                    init_sd=self.init_sd,
                )
            # single-device default: the tile-aggregated trainer — the
            # P gather/scatter and positive-Q scatter ride the MXU tile
            # machinery (ops/bpr.py::bpr_train_tiled); the flat trainer
            # remains the dp-mesh path (negatives/epoch order semantics
            # documented there)
            bs = min(self.batch_size, max(1, len(u)))
            data = sgd.pack_ratings(
                u.astype(np.int32), i.astype(np.int32),
                np.ones(len(u), np.float32), bs,
                shuffle_seed=self.seed, order="user",
            )
            fn = bpr_ops.jit_bpr_train_tiled(cfg, n_epochs, self.lr,
                                             self.n_items)
            params, hist = fn(params, data, k_fit)
        self._params = params
        self.global_mean = 0.0
        done = len(self.train_loss)
        self.train_loss = self.train_loss + np.asarray(hist).tolist()
        if self.verbose:
            for e, v in enumerate(self.train_loss[done:], start=done):
                print(f"Epoch {e + 1} BPR loss: {v:.4f}")
        return self

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray,
                        bound_ratings: bool):
        self._require_fitted()
        # bound_ratings is a no-op on (-inf, inf); keep the unbounded path
        fn = sgd.jit_predict_pairs(self._cfg(), False)
        return bucketed_predict(
            lambda uu, ii: fn(self._params, jnp.asarray(uu), jnp.asarray(ii)),
            u, i,
        )

    def predict(self, X: pd.DataFrame, bound_ratings: bool = True) -> list:
        """Unbounded ranking scores (higher = preferred); cold-start
        pairs fall back to 0 with ``predictions_possible`` False."""
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

    def update_users(self, X: pd.DataFrame, y: pd.Series = None,
                     lr: float = None, n_epochs: int = None,
                     verbose: int = 0):
        """Re-train the named users' rows (fresh random init, reference
        re-initialize-then-refit semantics) with the item side frozen."""
        if y is None:
            y = pd.Series(np.ones(len(X), np.float32))
        u, i, r, known_users, _new = self._preprocess_update(X, y)
        cfg = self._cfg()
        # grow capacity BEFORE any early return: _preprocess_update has
        # already registered new users in the vocab, and a dense id
        # without a table row would silently clamp-gather another user's
        # scores on a later predict/recommend
        cap = self._params.user_features.shape[0]
        if self.n_users > cap:
            grown = sgd.round_up(self.n_users, 1024)
            fresh = sgd.fresh_user_rows(
                jax.random.PRNGKey(self.seed + 1), grown - cap, cfg, 0.0,
                self.init_sd,
            )
            self._params = self._params._replace(
                user_features=jnp.concatenate(
                    [self._params.user_features, fresh])
            )
            self._serving_cache = None
        keep = r > 0
        u, i = u[keep], i[keep]
        if len(u) == 0:
            return self
        if known_users:
            # re-init ONLY known users that still have positive pairs
            # after the r>0 filter: a known user whose update rows are
            # all non-positive gets zero training pairs, so a fresh
            # random row would silently destroy their trained factors
            enc = np.asarray(
                self.user_vocab.encode(np.asarray(known_users, dtype=object)))
            enc = enc[np.isin(enc, np.unique(np.asarray(u)))]
            if enc.size:
                fresh = sgd.fresh_user_rows(
                    jax.random.PRNGKey(self.seed + 2), int(enc.size), cfg,
                    0.0, self.init_sd,
                )
                self._params = self._params._replace(
                    user_features=self._params.user_features.at[
                        jnp.asarray(enc)].set(fresh)
                )
        bs = min(self.batch_size, max(1, len(u)))
        data = sgd.pack_ratings(
            u.astype(np.int32), i.astype(np.int32),
            np.ones(len(u), np.float32), bs,
            shuffle_seed=self.seed, order="user",
        )
        fn = bpr_ops.jit_bpr_train_tiled(
            cfg, n_epochs or self.n_epochs, lr or self.lr, self.n_items,
            update_item_params=False,
        )
        params, hist = fn(self._params, data,
                          jax.random.fold_in(jax.random.PRNGKey(self.seed), 2))
        self._params = params
        self._serving_cache = None
        if verbose:
            for e, v in enumerate(np.asarray(hist).tolist()):
                print(f"Epoch {e + 1} BPR loss: {v:.4f}")
        return self

    # -- serving --------------------------------------------------------------
    def _serving_params(self) -> sgd.MFParams:
        return self._cached_serving_params()

    def _catalog_topk(self, u_dense: np.ndarray, k: int):
        from matrix_factorization_tpu.ops.scoring import catalog_topk

        return catalog_topk(self._cfg(), self._serving_params(),
                            self.n_items, u_dense, k)

    def auc(self, X: pd.DataFrame, n_neg: int = 20, seed: int = 0) -> float:
        """Sampled pairwise AUC on held-out positives (the BPR metric).
        Negative draws reject the training positives AND the evaluated
        pairs, so the score is not capped by positive-positive ties."""
        self._require_fitted()
        u = self.user_vocab.encode(X["user_id"].to_numpy())
        i = self.item_vocab.encode(X["item_id"].to_numpy())
        keep = (u >= 0) & (i >= 0)
        if not keep.any():
            raise ValueError("no known (user, item) pairs to score")
        tu, ti = self._train_pairs
        observed = (np.concatenate([tu, u[keep]]),
                    np.concatenate([ti, i[keep]]))
        return bpr_ops.auc_sampled(self._params, u[keep], i[keep],
                                   self.n_items, self._cfg(), seed=seed,
                                   n_neg=n_neg, observed=observed)

    # -- parameter views ------------------------------------------------------
    @property
    def user_features(self) -> np.ndarray:
        return np.asarray(
            self._params.user_features[: self.n_users, : self.n_factors])

    @property
    def item_features(self) -> np.ndarray:
        return np.asarray(
            self._params.item_features[: self.n_items, : self.n_factors])

    @property
    def item_biases(self) -> np.ndarray:
        col = sgd.bias_col(self._cfg(), "item")
        return np.asarray(self._params.item_features[: self.n_items, col])
