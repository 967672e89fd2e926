"""Resident sharded-catalog serving: top-k without ever gathering Q.

``dp_tp_fit`` trains with the item table row-sharded over the ``model``
axis (SURVEY §2.4); round 1 gathered Q to one device for serving, which
caps the catalog at a single device's HBM.  A :class:`ShardedCatalog`
keeps the item table resident row-sharded over ALL mesh axes and serves
full-catalog top-k through ``parallel.topk.distributed_topk`` (local MXU
scoring + local top-k + an O(n_dev * k) all-gather merge) — the catalog
scales with the mesh, and per-query HBM traffic is one shard scan.

Reference counterpart: ``recommend`` scoring every item in one process
(``recommender_base.py:245-271``); no distributed analogue existed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops.segment_sgd import MFParams, round_up
from matrix_factorization_tpu.parallel import topk as ptopk
from matrix_factorization_tpu.parallel.mesh import data_axes_of, MODEL_AXIS


class ShardedCatalog:
    """Item catalog resident row-sharded across every mesh axis.

    Built once after fit from (possibly sharded) ``MFParams``; resharding
    is a one-time collective.  ``topk(pu, k)`` returns ``(scores, global
    item ids)`` for a replicated batch of extended user rows.
    """

    def __init__(self, params: MFParams, n_items: int, cfg: SGDConfig,
                 mesh: Mesh, dtype=None):
        """``dtype``: optional storage dtype for the resident shards
        (``jnp.bfloat16`` halves the per-query HBM stream — scoring is
        Q-streaming bound, see ``benchmarks/bf16_serving.py``; the MXU
        still accumulates f32)."""
        self.cfg = cfg
        self.mesh = mesh
        self.dtype = dtype
        self.axes = data_axes_of(mesh) + (
            (MODEL_AXIS,) if MODEL_AXIS in mesh.axis_names else ()
        )
        n_dev = int(np.prod([mesh.shape[a] for a in self.axes]))
        self.n_items = n_items
        icap = round_up(max(n_items, 1), 8 * n_dev)
        Q = params.item_features
        spec = NamedSharding(mesh, P(self.axes))
        # pad + reshard once (a collective when Q arrives model-sharded)
        take = min(Q.shape[0], icap)
        padn = icap - take
        cast = (lambda q: q.astype(dtype)) if dtype is not None else (lambda q: q)
        self.Q = jax.jit(
            lambda q: jnp.pad(cast(q[:take]), ((0, padn), (0, 0))),
            out_shardings=spec,
        )(Q)
        valid = jnp.zeros((icap,), jnp.float32).at[:n_items].set(1.0)
        self.valid = jax.device_put(valid, spec)
        self.mu = params.global_mean
        self._jit_cache: dict = {}

    def _fn(self, k: int, b: int):
        key = (k, b)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda pu, Q, mu, valid: ptopk.distributed_topk(
                    pu.astype(Q.dtype), Q, mu, valid, k=k, cfg=self.cfg,
                    mesh=self.mesh, axes=self.axes,
                )
            )
            self._jit_cache[key] = fn
        return fn

    def topk(self, pu: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(scores, global item ids), each (B, k), scores descending.

        ``pu``: (B, Kp) extended user rows (replicated).  Batches are
        padded to power-of-two sizes to bound distinct compilations.
        """
        k = min(k, self.n_items)
        B = pu.shape[0]
        b = 1 << max(3, (B - 1).bit_length())
        pad = np.zeros((b, pu.shape[1]), np.float32)
        pad[:B] = np.asarray(pu, np.float32)
        vals, idx = self._fn(k, b)(
            jnp.asarray(pad), self.Q, self.mu, self.valid
        )
        return np.asarray(vals)[:B], np.asarray(idx)[:B]
