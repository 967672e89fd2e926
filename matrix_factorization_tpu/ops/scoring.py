"""Full-catalog scoring as tiled MXU matmuls with fused kernel epilogues.

The reference's ``recommend`` scores candidates one pair at a time through
``_predict`` (``recommender_base.py:253-254`` -> per-pair numba forward).
On TPU the whole (users x items) score block is one matmul over the
bias-folded extended rows (see ``ops/segment_sgd.py``): the user/item
biases ride inside ``P_ext Q_ext^T``, so

* linear : mu + P_ext Q_ext^T
* sigmoid: a + c * sigma(mu + P_ext Q_ext^T)
* rbf    : a + c * exp(-gamma * (|p|^2 + |q|^2 - 2 P Q^T)) — extension
  columns are zero for rbf, so the expansion is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from matrix_factorization_tpu.core.config import SGDConfig


def score_catalog(
    cfg: SGDConfig,
    mu: jax.Array,
    pu: jax.Array,  # (B, Kp) extended user rows
    Q: jax.Array,  # (I, Kp) extended item rows
) -> jax.Array:
    """Scores of every item for each queried user: (B, I).

    Accepts f32 or bf16 row tables: the MXU accumulates in f32 either
    way (``preferred_element_type``), and the rbf norms are reduced in
    f32 (the upcast fuses into the reduction, so a bf16-resident Q still
    streams half the HBM bytes — see ``benchmarks/bf16_serving.py``)."""
    dots = jnp.dot(pu, Q.T, preferred_element_type=jnp.float32)
    if cfg.kernel == "linear":
        return mu + dots
    if cfg.kernel == "sigmoid":
        return cfg.a + cfg.c * jax.nn.sigmoid(mu + dots)
    if cfg.kernel == "rbf":
        pu32 = pu.astype(jnp.float32)
        Q32 = Q.astype(jnp.float32)
        sq = (
            jnp.sum(pu32 * pu32, axis=1)[:, None]
            + jnp.sum(Q32 * Q32, axis=1)[None, :]
            - 2.0 * dots
        )
        return cfg.a + cfg.c * jnp.exp(-cfg.gamma * jnp.maximum(sq, 0.0))
    raise ValueError(f"unknown kernel {cfg.kernel!r}")


_topk_jit_cache: dict = {}
_catalog_scores_jit_cache: dict = {}


def catalog_scores(cfg: SGDConfig, params, n_items: int, u_dense):
    """(B, n_items) unbounded scores for a user cohort — one MXU matmul
    (eval harnesses, batch serving; shared by every model that serves
    through extended-row ``MFParams``: KernelMF, ImplicitALS, NMF, ...).

    The user-row gather and the catalog slice live INSIDE the jit: on a
    remote-dispatch backend every eager device op costs a round-trip,
    and the eager-slice version paid 3-4 RTTs per call (~600ms p50
    through the image's tunnel) for microseconds of compute.  Returns a
    host (B, n_items) array."""
    import numpy as np

    key = (cfg, n_items)
    fn = _catalog_scores_jit_cache.get(key)
    if fn is None:

        def run(mu, P, Q, u):
            pu = P.at[u].get(mode="promise_in_bounds")
            return score_catalog(cfg, mu, pu, Q[:n_items])

        fn = jax.jit(run)
        _catalog_scores_jit_cache[key] = fn
    return np.asarray(
        fn(params.global_mean, params.user_features, params.item_features,
           jnp.asarray(u_dense, jnp.int32))
    )


def _pallas_serving_wins(cfg: SGDConfig, b_padded: int, kp: int) -> bool:
    """Where the fused Pallas scorer beats XLA, per the on-chip study
    (``benchmarks/pallas_vs_xla.py``, v5e, RTT-cancelling two-window
    timing): single-user-class blocks (B padded to one 8-sublane tile)
    with 128-lane rows win 1.17-1.23x (linear 65.0us vs 79.9us, sigmoid
    61.8us vs 72.1us per 100k-item pass); everything else ties or loses
    (256-lane rows ~0.93-0.98x, B=256 0.47-0.65x, rbf 0.14-0.55x — XLA
    hoists the loop-invariant |Q|^2 that the kernel recomputes per
    tile).  Routed only where measured to win; CPU meshes always take
    the XLA path (interpret-mode Pallas is a debugging tool, not a
    production scorer)."""
    import jax as _jax

    return (
        _jax.default_backend() == "tpu"
        and cfg.kernel in ("linear", "sigmoid")
        and b_padded <= 8
        and kp <= 128
    )


def topk_harness(make_run, key_extra, n_items: int, u_dense, k: int,
                 cache: dict, arrays, prep=None):
    """Shared plumbing for device-side catalog top-k dispatches.

    Pads ``k`` and the user batch to power-of-two buckets to bound the
    number of distinct compilations, jit-caches ``make_run(kb, bb)``
    (which must return ``run(u_pad, *arrays) -> (vals, idx)``) once per
    ``(key_extra, n_items, kb, bb)`` bucket, and slices the (B, k) host
    result.  ``lax.top_k`` inside ``run`` sorts descending with
    lowest-index tie-breaks, matching the reference's stable
    sort-then-head ordering (``recommender_base.py:259-260``).

    ``prep``: optional host hook for models whose device inputs derive
    from the padded user batch rather than from fixed tables (EASE's
    history rows).  Called as ``prep(u_pad) -> (extra_arrays,
    extra_key)``; the arrays are appended to ``arrays`` and the key
    joins the cache key (it must capture any shape variation, e.g. the
    history-length bucket)."""
    import numpy as np

    k = min(k, n_items)
    kb = min(n_items, 1 << max(4, (k - 1).bit_length()))
    B = len(u_dense)
    bb = 1 << max(0, (B - 1).bit_length())
    u_pad = np.zeros(bb, np.int32)
    u_pad[:B] = np.asarray(u_dense, np.int32)
    extra_key = None
    if prep is not None:
        extra_arrays, extra_key = prep(u_pad)
        arrays = tuple(arrays) + tuple(extra_arrays)
    key = (key_extra, extra_key, n_items, kb, bb)
    fn = cache.get(key)
    if fn is None:
        fn = jax.jit(make_run(kb, bb))
        cache[key] = fn
    vals, idx = fn(jnp.asarray(u_pad), *arrays)
    return np.asarray(vals)[:B, :k], np.asarray(idx)[:B, :k]


def catalog_topk(
    cfg: SGDConfig,
    params,  # MFParams (or anything with the same three fields)
    n_items: int,
    u_dense,  # (B,) dense user ids, host array
    k: int,
):
    """Top-``k`` catalog scores per user as ONE device dispatch — the
    user-row gather, the scoring matmul with fused epilogue AND
    ``lax.top_k`` are traced into a single jit, so only (B, k)
    values+indices cross the host link instead of (B, n_items) scores
    (400KB/user at 100k items; over a remote-dispatch tunnel the score
    transfer dominated single-user ``recommend`` latency).
    Returns host ``(values, indices)``, each (B, k).
    """
    kp = int(params.user_features.shape[1])
    dt = str(params.item_features.dtype)

    def make_run(kb, bb):
        # the Pallas kernel is written for f32 blocks; bf16-resident
        # tables take the XLA path (which is what bf16 mode accelerates)
        if _pallas_serving_wins(cfg, bb, kp) and dt == "float32":
            from matrix_factorization_tpu.ops.pallas_scores import (
                pallas_score_catalog,
            )
            scorer = pallas_score_catalog
        else:
            scorer = score_catalog

        def run(u, mu, P, Q):
            pu = P.at[u].get(mode="promise_in_bounds")
            return jax.lax.top_k(scorer(cfg, mu, pu, Q[:n_items]), kb)

        return run

    return topk_harness(
        make_run, (cfg, dt), n_items, u_dense, k, _topk_jit_cache,
        (params.global_mean, params.user_features, params.item_features),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "k", "tile"))
def streaming_topk(
    cfg: SGDConfig,
    mu: jax.Array,
    pu: jax.Array,  # (B, Kp)
    Q: jax.Array,  # (I, Kp), I must be a multiple of tile
    valid_items: jax.Array,  # (I,) f32 1/0
    k: int,
    tile: int = 8192,
) -> tuple:
    """Memory-bounded full-catalog top-k: scan over item tiles keeping a
    running (B, k) candidate set — never materializes the (B, I) score
    matrix (2.2M-item catalogs x 256 users would be 2.3GB).  Returns
    (scores, global item indices), each (B, k)."""
    B = pu.shape[0]
    I = Q.shape[0]
    assert I % tile == 0, "pad the item table to a multiple of tile"
    n_tiles = I // tile
    Qt = Q.reshape(n_tiles, tile, Q.shape[1])
    Vt = valid_items.reshape(n_tiles, tile)
    kk = min(k, tile)

    def body(carry, xs):
        best_v, best_i = carry
        q_tile, v_tile, t = xs
        s = score_catalog(cfg, mu, pu, q_tile)
        s = jnp.where(v_tile[None, :] > 0, s, -jnp.inf)
        tv, ti = jax.lax.top_k(s, kk)
        ti = ti + t * tile
        merged_v = jnp.concatenate([best_v, tv], axis=1)
        merged_i = jnp.concatenate([best_i, ti], axis=1)
        best_v, pos = jax.lax.top_k(merged_v, kk)
        best_i = jnp.take_along_axis(merged_i, pos, axis=1)
        return (best_v, best_i), None

    init = (
        jnp.full((B, kk), -jnp.inf, jnp.float32),
        jnp.zeros((B, kk), jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(
        body, init, (Qt, Vt, jnp.arange(n_tiles, dtype=jnp.int32))
    )
    return vals[:, :k], idx[:, :k]
