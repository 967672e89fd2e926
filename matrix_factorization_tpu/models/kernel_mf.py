"""Kernel matrix factorization: r_ui ~= K(p_u, q_i) for K in
{linear, sigmoid, rbf}.

Reference: ``matrix_factorization/kernel_matrix_factorization.py`` (fit
``:81-128``, predict ``:130-163``, update_users ``:165-237``) with the
per-rating Numba kernels of ``kernels.py``.  Here training is the
vectorized segment-SGD engine (:mod:`..ops.segment_sgd`): one jitted
program per fit, ``lax.scan`` over epochs and mini-batches, scatter-add
parameter updates, factor tables lane-padded for MXU/VPU tiling.

Note the reference docstring advertises ``reg=0.01`` but the code default
is ``reg=1`` (``kernel_matrix_factorization.py:58``); we match the code.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.models.base import RecommenderBase, bucketed_predict
from matrix_factorization_tpu.ops import segment_sgd as sgd


def _als_needs_buckets(u, i, n_users: int, n_items: int,
                       budget_rows: int = 30_000_000) -> bool:
    """Global-pad ALS materializes (E, L_max) tables per side; switch to
    count-bucketed sweeps when that exceeds the memory budget."""
    lu = int(np.bincount(u, minlength=n_users).max()) if len(u) else 1
    li = int(np.bincount(i, minlength=n_items).max()) if len(i) else 1
    return n_users * lu > budget_rows or n_items * li > budget_rows


class KernelMF(RecommenderBase):
    def __init__(
        self,
        n_factors: int = 100,
        n_epochs: int = 100,
        kernel: str = "linear",
        gamma: Union[str, float] = "auto",
        reg: float = 1.0,
        lr: float = 0.01,
        init_mean: float = 0.0,
        init_sd: float = 0.1,
        min_rating: float = 0,
        max_rating: float = 5,
        verbose: int = 0,
        batch_size: int = 1024,
        seed: int = 0,
        mesh=None,
        method: str = "sgd",
        epoch_order: str = "shuffle",
        keep_sharded: bool = False,
        overlap_psum: bool = False,
        reg_scale: str = "absolute",
        als_warm_start: int = 0,
        als_warm_reg: Optional[float] = None,
        serving_dtype: str = "float32",
        dp_layout: str = "auto",
        psum_every=1,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` (see ``parallel.make_mesh``);
        when given with >1 device on the data axis, ``fit`` trains
        data-parallel (user-sharded P, psum'd item deltas) and gathers the
        result for serving.

        ``keep_sharded``: with a mesh, keep the trained tables resident in
        their training shardings after ``fit`` (P over ``data``, and Q
        over ``model`` for 2D fits) instead of gathering to one device —
        for catalogs that cannot fit one device's HBM.  ``recommend`` /
        ``recommend_batch`` then route through the distributed top-k
        (``parallel.serving.ShardedCatalog``), and ``predict`` gathers
        rows on demand.

        ``overlap_psum`` (mesh SGD fits only): defer each training
        window's delta all-reduce by one window so the collective
        overlaps the next window's compute instead of sitting on the
        critical path (``parallel.distributed._windowed_epoch``).
        Every item update lands exactly one window late, uniformly
        across devices — replicas stay bit-identical and training stays
        deterministic; pending deltas flush at each epoch boundary.
        Final-RMSE parity with the synchronous schedule is
        regression-tested; worth turning on when the measured psum share
        of the step is non-trivial (see the multi-chip performance model
        in benchmarks/RESULTS.md — up to ~16% of the step at the
        headline shape).

        ``psum_every`` (mesh SGD fits only): accumulate item deltas
        locally for this many steps and cross the mesh in ONE psum per
        window — 1 (default) is the fully synchronous schedule; 'auto'
        picks the largest divisor of the per-device batch count <= 16;
        'epoch' syncs once per epoch.  Amortizes the full-table
        delta-zero/add/all-reduce that dominates the dp step, at the
        cost of item reads being up to ``psum_every`` steps stale
        (the windowed stale-read regime; parity budget in
        benchmarks/config3_multistep.py, exact semantics oracle-tested
        in tests/test_parallel.py).

        ``method``: 'sgd' (reference semantics) or 'als' (extension: exact
        alternating least squares for factors+biases — linear kernel only,
        typically converges in far fewer epochs; see ``ops/ials.py``).

        ``reg_scale`` (method='als' only): 'absolute' ridge (reference
        bias-ALS convention) or 'per_obs' — reg scaled by each entity's
        rating count, the exact ALS counterpart of SGD's per-rating L2;
        use 'per_obs' when comparing against (or warm-starting from) an
        SGD fit at the same ``reg``, and at k approaching the typical
        ratings-per-user, where an absolute ridge underregularizes
        (see ``ops/ials.py::_reg_diag``).

        ``als_warm_start`` (extension — the ALS/SGD hybrid schedule):
        run this many exact linear ALS sweeps before the SGD epochs.
        For kernel='sigmoid' the linear pre-activation is fit in logit
        space (pred = a + c*sigma(x) => x_target = logit((r-a)/c),
        clipped to [0.01, 0.99] before the transform); kernel='linear'
        warm-starts on the ratings directly; rbf has no linear
        pre-activation and rejects the flag.  Single-device SGD fits
        only (not mesh / method='als').

        ``als_warm_reg``: per-obs ridge for the warm sweeps (defaults
        to ``reg``).  The exact solves need MORE regularization than
        SGD's implicit early stopping provides: at config-3 shape
        (25M ratings, k=200 sigmoid) the default reg=0.005 warm sweep
        stalls at val RMSE 0.51, while als_warm_reg=0.1 lands 0.331 in
        ONE sweep — below pure SGD's 20-epoch floor of 0.339
        (benchmarks/sigmoid_warmstart.py).

        ``epoch_order``: 'shuffle' (reference semantics: random visit
        order), 'item'/'user' (extension: chunk-sorted epochs with
        per-epoch batch-order shuffling — tiny aggregation tiles make
        SGD ~1.4x faster per epoch; final-RMSE parity with 'shuffle' is
        verified in tests/test_kernel_mf.py and PARITY.md), 'auto'
        (sorts whichever id space is larger), or 'block' (2D
        user-block x item-block cells — bounds BOTH sides' tile spans
        at any batch size, unlocking small batches at big-table shapes;
        oracle parity in tests/test_parity_oracle.py).

        ``dp_layout`` (mesh SGD fits via ``dp_fit`` only): 'auto'
        (default — the tile-aggregated data-parallel trainer,
        ``parallel.distributed.dp_sgd_train_tiled``, unless the shuffle
        mode forbids layout reuse), 'tiled', or 'flat' (plain per-row
        scatters, the pre-round-3 dp path).  The tiled trainer carries
        the single-chip MXU aggregation machinery into the mesh path so
        per-chip throughput does not regress when a mesh is attached;
        the epoch visit order matches ``epoch_order`` semantics per
        device shard.

        ``serving_dtype``: 'float32' (default) or 'bfloat16' — keep an
        extra bf16 copy of the factor tables resident on device and
        route the catalog scorers (``recommend`` / ``recommend_batch`` /
        the eval-harness bulk scorer) through it.  Catalog scoring is
        HBM-streaming bound, so halving the streamed bytes buys up to
        ~2x batch-serving throughput (measured on v5e:
        ``benchmarks/bf16_serving.py``); the MXU still accumulates in
        f32, so only the stored table values are rounded (top-k overlap
        measured there).  ``predict`` stays f32 — rating-parity numbers
        are unaffected."""
        if kernel not in ("linear", "sigmoid", "rbf"):
            raise ValueError("Kernel must be one of linear, sigmoid, or rbf")
        if method not in ("sgd", "als"):
            raise ValueError("Method must be 'sgd' or 'als'")
        if epoch_order not in ("shuffle", "item", "user", "auto",
                               "block"):
            raise ValueError(
                "epoch_order must be 'shuffle', 'item', 'user', 'auto' "
                "or 'block'")
        if method == "als" and kernel != "linear":
            raise ValueError("method='als' requires the linear kernel")
        if reg_scale not in ("absolute", "per_obs"):
            raise ValueError("reg_scale must be 'absolute' or 'per_obs'")
        if als_warm_start:
            if als_warm_start < 0:
                raise ValueError("als_warm_start must be >= 0")
            if kernel == "rbf":
                raise ValueError(
                    "als_warm_start requires a linear pre-activation "
                    "(kernel 'linear' or 'sigmoid'); rbf has none")
            if method == "als":
                raise ValueError(
                    "als_warm_start is an SGD initializer; method='als' "
                    "is already exact alternation")
            if mesh is not None:
                raise ValueError(
                    "als_warm_start is not supported with a mesh yet "
                    "(the dp/tp trainers own their init)")
        if overlap_psum and mesh is None:
            raise ValueError(
                "overlap_psum=True requires a mesh: without one there is "
                "no delta all-reduce to overlap"
            )
        if overlap_psum and method == "als":
            raise ValueError(
                "overlap_psum applies to the mesh SGD trainers; "
                "method='als' has no per-step delta psum"
            )
        if psum_every != 1:
            if mesh is None:
                raise ValueError(
                    "psum_every requires a mesh: without one there is no "
                    "delta all-reduce to window")
            if method == "als":
                raise ValueError(
                    "psum_every applies to the mesh SGD trainers; "
                    "method='als' has no per-step delta psum")
        if keep_sharded and mesh is None:
            raise ValueError(
                "keep_sharded=True requires a mesh: without one the item "
                "table cannot stay resident sharded and serving would "
                "silently gather the full catalog to one device"
            )
        if serving_dtype not in ("float32", "bfloat16"):
            raise ValueError("serving_dtype must be 'float32' or 'bfloat16'")
        if dp_layout not in ("auto", "tiled", "flat"):
            raise ValueError("dp_layout must be 'auto', 'tiled' or 'flat'")
        super().__init__(min_rating=min_rating, max_rating=max_rating, verbose=verbose)
        self.n_factors = n_factors
        self.n_epochs = n_epochs
        self.kernel = kernel
        self.gamma = 1.0 / n_factors if gamma == "auto" else gamma
        self.reg = reg
        self.lr = lr
        self.init_mean = init_mean
        self.init_sd = init_sd
        self.batch_size = batch_size
        self.seed = seed
        self.mesh = mesh
        self.method = method
        self.reg_scale = reg_scale
        self.als_warm_start = als_warm_start
        self.als_warm_reg = als_warm_reg
        self.epoch_order = epoch_order
        self.keep_sharded = keep_sharded
        self.overlap_psum = overlap_psum
        self.psum_every = psum_every
        self.dp_layout = dp_layout
        self.serving_dtype = serving_dtype
        self._params: Optional[sgd.MFParams] = None
        self._topk_catalog = None
        self._serving_cache = None  # (source MFParams, bf16 MFParams)
        self.train_rmse: list = []

    # -- config -------------------------------------------------------------
    def _cfg(
        self,
        batch_size: Optional[int] = None,
        update_item_params: bool = True,
        compute_epoch_rmse: bool = True,
    ) -> SGDConfig:
        return SGDConfig(
            kernel=self.kernel,
            n_factors=self.n_factors,
            lr=self.lr,
            reg=self.reg,
            gamma=self.gamma,
            min_rating=self.min_rating,
            max_rating=self.max_rating,
            batch_size=batch_size or self.batch_size,
            update_item_params=update_item_params,
            compute_epoch_rmse=compute_epoch_rmse,
        )

    def _mesh_data_size(self) -> int:
        from matrix_factorization_tpu.parallel.mesh import DATA_AXIS

        return self.mesh.shape.get(DATA_AXIS, 1) if self.mesh else 1

    # -- capacity -----------------------------------------------------------
    def _ensure_user_capacity(self, n_needed: int, key: jax.Array) -> None:
        cap = self._params.user_features.shape[0]
        if n_needed <= cap:
            return
        new_cap = sgd.round_up(max(n_needed, int(cap * 1.5) + 1), 1024)
        fresh = sgd.fresh_user_rows(
            key, new_cap - cap, self._cfg(), self.init_mean, self.init_sd
        )
        self._params = self._params._replace(
            user_features=jnp.concatenate([self._params.user_features, fresh])
        )

    # -- lifecycle ----------------------------------------------------------
    def fit(self, X: pd.DataFrame, y: pd.Series, n_epochs: int = None,
            warm_start: bool = False):
        """Train; ``warm_start=True`` continues from the current parameters
        (same id space) instead of re-initializing — the building block of
        ``core.checkpoint.fit_resumable``."""
        cfg = self._cfg()
        # any fit invalidates the resident sharded catalog: it holds a
        # padded COPY of Q, and serving prefers it over live _params
        # (ADVICE r2: warm-start refit served stale item factors)
        self._topk_catalog = None
        if warm_start and self._params is not None:
            from matrix_factorization_tpu.core.ids import check_no_duplicates

            users = X["user_id"].to_numpy()
            items = X["item_id"].to_numpy()
            check_no_duplicates(users, items)
            u = self.user_vocab.encode(users, strict=True)
            i = self.item_vocab.encode(items, strict=True)
            r = np.asarray(y, dtype=np.float32)
            params = self._params
        else:
            u, i, r = self._preprocess_fit(X, y)
            self.global_mean = float(np.mean(r))
            params = None  # initialized below, on the path that uses it
            self.train_rmse = []
        n_epochs = n_epochs or self.n_epochs
        # fresh shuffle randomness per fit call (epochs completed so far)
        k_train = jax.random.fold_in(
            jax.random.PRNGKey(self.seed), len(self.train_rmse) + 1
        )
        if self.mesh is not None and not warm_start and self._mesh_data_size() > 1:
            from matrix_factorization_tpu.parallel import distributed as dist
            from matrix_factorization_tpu.parallel.mesh import MODEL_AXIS

            if self.method == "als":
                # mesh ALS: per-entity solves sharded over the data axes
                from matrix_factorization_tpu.ops import ials

                k_init, _ = jax.random.split(jax.random.PRNGKey(self.seed))
                params = sgd.init_params(
                    k_init, self.n_users, self.n_items, cfg,
                    self.global_mean, self.init_mean, self.init_sd,
                )
                data = sgd.pack_ratings(u, i, r, cfg.batch_size,
                                        row_width=cfg.padded_factors)
                bu, bi = ials.group_both_sides_bucketed(
                    u, i, r, self.n_users, self.n_items)
                params, rmse_hist = ials.dp_ials_train_bucketed(
                    params, bu, bi, data, cfg, n_epochs, mesh=self.mesh,
                    reg_scale=self.reg_scale,
                )
            else:
                # model axis > 1: shard the item table too (2D training)
                kw = {}
                if self.mesh.shape.get(MODEL_AXIS, 1) > 1:
                    fit_fn = dist.dp_tp_fit
                else:
                    fit_fn = dist.dp_fit
                    kw = {"layout": self.dp_layout,
                          "pack_order": self.epoch_order}
                params, rmse_hist = fit_fn(
                    u, i, r, self.n_users, self.n_items, cfg, n_epochs,
                    self.lr, self.mesh, seed=self.seed,
                    init_mean=self.init_mean, init_sd=self.init_sd,
                    overlap_psum=self.overlap_psum,
                    psum_every=self.psum_every, **kw,
                )
            if self.keep_sharded:
                # tables stay resident in their training shardings;
                # full-catalog serving routes through the distributed
                # top-k (never gathers Q)
                from matrix_factorization_tpu.parallel.serving import (
                    ShardedCatalog,
                )

                self._topk_catalog = ShardedCatalog(
                    params, self.n_items, cfg, self.mesh,
                    dtype=self._serving_jnp_dtype(),
                )
            else:
                # gather to single-device arrays for the serving paths
                params = sgd.MFParams(
                    user_features=jnp.asarray(np.asarray(params.user_features)),
                    item_features=jnp.asarray(np.asarray(params.item_features)),
                    global_mean=jnp.asarray(np.asarray(params.global_mean)),
                )
        else:
            if params is None:
                k_init, _ = jax.random.split(jax.random.PRNGKey(self.seed))
                params = sgd.init_params(
                    k_init, self.n_users, self.n_items, cfg,
                    self.global_mean, self.init_mean, self.init_sd,
                )
            data = sgd.pack_ratings(u, i, r, cfg.batch_size,
                                    order=self.epoch_order,
                                    row_width=cfg.padded_factors)
            if self.method == "als":
                from matrix_factorization_tpu.ops import ials

                if _als_needs_buckets(u, i, self.n_users, self.n_items):
                    bu, bi = ials.group_both_sides_bucketed(
                        u, i, r, self.n_users, self.n_items)
                    params, rmse_hist = ials.ials_train_bucketed(
                        params, bu, bi, data, cfg, n_epochs,
                        reg_scale=self.reg_scale,
                    )
                else:
                    by_user = ials.group_by_entity(u, i, r, self.n_users)
                    by_item = ials.group_by_entity(i, u, r, self.n_items)
                    params, rmse_hist = ials.jit_ials_train(
                        cfg, n_epochs, reg_scale=self.reg_scale
                    )(params, by_user, by_item, data)
            else:
                # warm sweeps initialize a FRESH fit only: a
                # fit(warm_start=True) continuation (fit_resumable's
                # chunks) must keep descending from the current tables,
                # not overwrite the SGD-refined rows with exact solves
                if self.als_warm_start and not warm_start:
                    params = self._run_als_warm_start(params, u, i, r,
                                                      cfg, data)
                params, rmse_hist = sgd.jit_sgd_train(cfg, n_epochs)(
                    params, data, k_train, self.lr
                )
        self._params = params
        if self.keep_sharded and self._topk_catalog is None and self.mesh is not None:
            # warm-start fits train on the single-device branch; rebuild
            # the resident catalog from the refreshed tables so serving
            # never mixes new user rows with a stale padded Q copy
            from matrix_factorization_tpu.parallel.serving import ShardedCatalog

            self._topk_catalog = ShardedCatalog(
                params, self.n_items, cfg, self.mesh,
                dtype=self._serving_jnp_dtype(),
            )
        self.train_rmse = list(self.train_rmse) + np.asarray(rmse_hist).tolist()
        if self.verbose:
            for e, v in enumerate(self.train_rmse):
                print(f"Epoch {e + 1} train RMSE: {v:.4f}")
        return self

    def _rebuild_serving_catalog(self) -> None:
        """(Re)build the resident distributed-top-k catalog from the
        current tables — the ``keep_sharded`` serving state.  Called by
        ``core.checkpoint.load_model_orbax(mesh=...)`` after a
        sharded-native restore (the catalog is derived state, never
        checkpointed)."""
        from matrix_factorization_tpu.parallel.serving import ShardedCatalog

        self._require_fitted()
        self._topk_catalog = ShardedCatalog(
            self._params, self.n_items, self._cfg(), self.mesh,
            dtype=self._serving_jnp_dtype(),
        )

    def _run_als_warm_start(self, params, u, i, r, cfg, data):
        """Exact linear ALS sweeps as the SGD init (VERDICT r2 #4's
        hybrid schedule).  Sigmoid: fit the pre-activation x in logit
        space — pred = a + c*sigma(x), so x_target = logit((r-a)/c)
        (clipped); the free bias columns absorb the offset between
        mean(rating) and the x-space mean, so ``global_mean`` keeps its
        reference semantics.  reg_scale='per_obs' keeps the exact
        solves regularized like the SGD objective (ops/ials._reg_diag);
        the SGD epochs that follow descend the true kernel loss."""
        from matrix_factorization_tpu.core.config import SGDConfig
        from matrix_factorization_tpu.ops import ials

        if self.kernel == "sigmoid":
            frac = np.clip((np.asarray(r, np.float64) - cfg.a) / cfg.c,
                           0.01, 0.99)
            t = np.log(frac / (1.0 - frac)).astype(np.float32)
        else:
            t = np.asarray(r, np.float32)
        warm_reg = cfg.reg if self.als_warm_reg is None else self.als_warm_reg
        lin = SGDConfig(kernel="linear", n_factors=cfg.n_factors,
                        lr=cfg.lr, reg=warm_reg,
                        min_rating=cfg.min_rating,
                        max_rating=cfg.max_rating,
                        batch_size=cfg.batch_size,
                        compute_epoch_rmse=False)
        sweeps = self.als_warm_start
        if _als_needs_buckets(u, i, self.n_users, self.n_items):
            bu, bi = ials.group_both_sides_bucketed(
                u, i, t, self.n_users, self.n_items)
            params, _ = ials.ials_train_bucketed(
                params, bu, bi, data, lin, sweeps, reg_scale="per_obs")
        else:
            by_user = ials.group_by_entity(u, i, t, self.n_users)
            by_item = ials.group_by_entity(i, u, t, self.n_items)
            params, _ = ials.jit_ials_train(
                lin, sweeps, reg_scale="per_obs"
            )(params, by_user, by_item, data)
        return params

    def _predict_arrays(self, u: np.ndarray, i: np.ndarray, bound_ratings: bool):
        self._require_fitted()
        fn = sgd.jit_predict_pairs(self._cfg(), bound_ratings)
        return bucketed_predict(
            lambda uu, ii: fn(self._params, jnp.asarray(uu), jnp.asarray(ii)), u, i
        )

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
        lr: float = 0.01,
        n_epochs: int = 20,
        verbose: int = 0,
    ):
        """Partial fit for new/updated users with the item side frozen
        (reference ``kernel_matrix_factorization.py:165-237``): known users
        named in X are re-initialized (bias 0, fresh random factors,
        ``:189-199``), new users get fresh rows, then SGD runs with
        ``update_item_params=False``."""
        u, i, r, known_users, _new_users = self._preprocess_update(X, y)
        key = jax.random.PRNGKey(self.seed + 1)
        k_grow, k_reinit, k_train = jax.random.split(key, 3)
        self._ensure_user_capacity(self.n_users, k_grow)

        if known_users:
            idx = jnp.asarray(
                self.user_vocab.encode(np.asarray(known_users, dtype=object))
            )
            fresh = sgd.fresh_user_rows(
                k_reinit, len(known_users), self._cfg(), self.init_mean,
                self.init_sd,
            )
            self._params = self._params._replace(
                user_features=self._params.user_features.at[idx].set(fresh)
            )

        pack_bs = min(self.batch_size, max(1, len(r)))
        cfg = self._cfg(batch_size=pack_bs, update_item_params=False)
        data = sgd.pack_ratings(u, i, r, pack_bs)
        if self.method == "als":
            # exact user-side sweep, item side frozen — one closed-form
            # solve replaces the SGD epochs
            from matrix_factorization_tpu.ops import ials

            by_user = ials.group_by_entity(u, i, r, self.n_users)
            by_item = ials.group_by_entity(i, u, r, self.n_items)
            params, rmse_hist = ials.jit_ials_train(
                cfg, max(1, min(n_epochs, 2)), update_item_params=False,
                reg_scale=self.reg_scale,
            )(self._params, by_user, by_item, data)
        else:
            params, rmse_hist = sgd.jit_sgd_train(cfg, n_epochs)(
                self._params, data, k_train, lr
            )
        self._params = params
        self.train_rmse = np.asarray(rmse_hist).tolist()
        if verbose:
            for e, v in enumerate(self.train_rmse):
                print(f"Epoch {e + 1} train RMSE: {v:.4f}")
        return self

    def _serving_jnp_dtype(self):
        return jnp.bfloat16 if self.serving_dtype == "bfloat16" else None

    def _serving_params(self) -> sgd.MFParams:
        """The parameter view the catalog scorers read: ``_params``
        itself, or a device-resident bf16 copy (``serving_dtype``) —
        identity-keyed cache, see ``RecommenderBase._cached_serving_params``."""
        return self._cached_serving_params()

    def _topk_user_rows(self, u_dense: np.ndarray) -> np.ndarray:
        """(B, Kp) extended user rows for the sharded top-k path (a
        cross-device gather when P is resident sharded)."""
        return np.asarray(
            self._params.user_features[jnp.asarray(u_dense, jnp.int32)]
        )

    def _catalog_scores_batch(self, u_dense: np.ndarray) -> np.ndarray:
        """(B, n_items) unbounded scores — one MXU matmul for a whole
        user cohort (``ops.scoring.catalog_scores``; gather + slice
        traced in, see the RTT rationale there)."""
        from matrix_factorization_tpu.ops.scoring import catalog_scores

        return catalog_scores(self._cfg(), self._serving_params(),
                              self.n_items, u_dense)

    def _catalog_scores(self, u_dense: int) -> np.ndarray:
        """Unbounded scores of every known item for one user — the
        full-catalog ``recommend`` path as ONE device dispatch."""
        return self._catalog_scores_batch(np.asarray([u_dense], np.int32))[0]

    def _catalog_topk(self, u_dense: np.ndarray, k: int):
        """Top-``k`` catalog scores per user, fetching only (B, k)
        values+indices — see ``ops.scoring.catalog_topk`` (the
        ``recommend`` fast path; VERDICT r2 #3)."""
        from matrix_factorization_tpu.ops.scoring import catalog_topk

        return catalog_topk(self._cfg(), self._serving_params(),
                            self.n_items, u_dense, k)

    # -- reference-parity parameter views ------------------------------------
    # (biases live in extension columns of the factor tables — see
    # ops/segment_sgd.py module docstring)
    @property
    def user_features(self) -> np.ndarray:
        return np.asarray(self._params.user_features[: self.n_users, : self.n_factors])

    @property
    def item_features(self) -> np.ndarray:
        return np.asarray(self._params.item_features[: self.n_items, : self.n_factors])

    @property
    def user_biases(self) -> np.ndarray:
        col = sgd.bias_col(self._cfg(), "user")
        return np.asarray(self._params.user_features[: self.n_users, col])

    @property
    def item_biases(self) -> np.ndarray:
        col = sgd.bias_col(self._cfg(), "item")
        return np.asarray(self._params.item_features[: self.n_items, col])
