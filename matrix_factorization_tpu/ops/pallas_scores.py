"""Pallas TPU kernels: tiled full-catalog scoring with fused epilogues.

The recommend/serving hot path scores a block of users against the whole
item catalog (reference counterpart: per-pair numba forwards behind
``recommender_base.py:253-254``).  The XLA version (``ops.scoring``) is a
matmul plus separate elementwise ops; this Pallas kernel fuses the kernel
epilogue (bias fold-in is already inside the dot; sigmoid / rbf transforms
run on the tile while it is still in VMEM) and streams the item table
through VMEM in lane-aligned tiles.

Layout contract: extended rows as in ``ops.segment_sgd`` — biases folded
into columns ``[n_factors, n_factors+2)``, rows lane-padded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matrix_factorization_tpu.core.config import SGDConfig

DEFAULT_ITEM_TILE = 2048
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _score_kernel(mu_ref, pu_ref, q_ref, out_ref, *, kernel: str,
                  gamma: float, a: float, c: float):
    mu = mu_ref[0, 0]
    pu = pu_ref[:]
    q = q_ref[:]
    dots = jax.lax.dot_general(
        pu, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if kernel == "linear":
        out_ref[:] = mu + dots
    elif kernel == "sigmoid":
        out_ref[:] = a + c * jax.nn.sigmoid(mu + dots)
    else:  # rbf: |p-q|^2 = |p|^2 + |q|^2 - 2 p.q (ext cols are zero)
        pn = jnp.sum(pu * pu, axis=1, keepdims=True)
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        sq = jnp.maximum(pn + qn.T - 2.0 * dots, 0.0)
        out_ref[:] = a + c * jnp.exp(-gamma * sq)


@functools.partial(
    jax.jit, static_argnames=("cfg", "item_tile", "interpret")
)
def pallas_score_catalog(
    cfg: SGDConfig,
    mu: jax.Array,
    pu: jax.Array,  # (B, Kp) extended user rows
    Q: jax.Array,  # (I, Kp) extended item rows
    item_tile: int = DEFAULT_ITEM_TILE,
    interpret: bool = False,
) -> jax.Array:
    """(B, I) scores; B and I are padded internally to tile boundaries."""
    B, kp = pu.shape
    I = Q.shape[0]
    bp = _round_up(B, _SUBLANE)
    tile = min(item_tile, _round_up(I, _SUBLANE))
    ip = _round_up(I, tile)
    if bp != B:
        pu = jnp.pad(pu, ((0, bp - B), (0, 0)))
    if ip != I:
        Q = jnp.pad(Q, ((0, ip - I), (0, 0)))
    mu2d = jnp.reshape(mu.astype(jnp.float32), (1, 1))

    kernel = functools.partial(
        _score_kernel, kernel=cfg.kernel, gamma=cfg.gamma, a=cfg.a, c=cfg.c
    )
    out = pl.pallas_call(
        kernel,
        grid=(ip // tile,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bp, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, ip), jnp.float32),
        interpret=interpret,
    )(mu2d, pu, Q)
    return out[:B, :I]


def recommend_topk(
    cfg: SGDConfig,
    mu: jax.Array,
    pu: jax.Array,
    Q: jax.Array,
    valid_items: jax.Array,  # (I,) f32 1/0
    k: int,
    use_pallas: bool = True,
    interpret: bool = False,
) -> tuple:
    """Full-catalog top-k for a block of users: fused scoring + lax.top_k."""
    if use_pallas:
        scores = pallas_score_catalog(cfg, mu, pu, Q, interpret=interpret)
    else:
        from matrix_factorization_tpu.ops.scoring import score_catalog

        scores = score_catalog(cfg, mu, pu, Q)
    scores = jnp.where(valid_items[None, :] > 0, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)
