"""Pallas TPU kernel: the fused primary-side SGD mini-batch step.

The XLA tile path (``segment_sgd._minibatch_update``) lowers the primary
side of a mini-batch to separate HBM-materializing ops — one-hot build,
gather-expand einsum, the elementwise forward/gradient chain, aggregate
einsum — each streaming (bs, Kp)-sized arrays through HBM (~7GB/batch at
the config-5 shape vs ~2GB unavoidable).  This kernel fuses that middle
into ONE pass over the gathered secondary rows.

Design (round 5, v2 — the v1 "VMEM-resident window" kernel measured
SLOWER end-to-end despite a 6.3ns/row standalone time: its ~30MB VMEM
appetite evicted the secondary table from XLA's VMEM space S(1), which
quintupled the per-batch 2M-row gather, and its (T, S, 1) vector
operands cost ~2.4ns/row in pure reshapes.  Profile evidence in
benchmarks/RESULTS.md):

* grid over the batch's S-entry tiles; per tile the kernel streams the
  tile's (C, Kp) pre-step primary BLOCK rows (XLA block-gathers them —
  C/S of the row count) and its (S, Kp) gathered secondary rows;
* r, w and the tile-local primary index ride in three spare PADDING
  LANES of the secondary block (tables are lane-padded and padding
  columns are invariantly zero, so masks already erase them from every
  gradient) — no extra operands, no sub-lane-width blocks;
* in-VMEM one-hot matmuls (MXU) expand block rows to per-entry rows and
  aggregate the primary deltas back to (C, Kp) blocks;
* outputs stream: per-tile aggregated primary deltas (T*C, Kp) — XLA
  block-scatter-adds them, exactly like the einsum path — and the
  per-entry secondary deltas (bs, Kp).

Total VMEM appetite is a few blocks (~4MB), so XLA's allocator keeps
whatever tables it kept without the kernel.

Semantics are IDENTICAL to the einsum path: every row reads pre-step
tables, deltas sum — only float regrouping differs.  Equivalence is
regression-tested in interpret mode on CPU (``tests/test_pallas_sgd.py``).

Reference counterpart: the per-rating numba updates this module family
replaces (``kernels.py:108-327``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matrix_factorization_tpu.core.config import SGDConfig

# number of spare padding lanes the stash needs (r, w, local index)
STASH_LANES = 3


def stash_col(cfg: SGDConfig) -> int:
    """First stash lane: right after factors + bias + const columns."""
    return cfg.n_factors + 2


def has_stash_room(cfg: SGDConfig) -> bool:
    return cfg.padded_factors - stash_col(cfg) >= STASH_LANES


def _step_kernel(mu_ref, lr_ref, reg_ref, blk_ref, qi_ref, pmask_ref,
                 smask_ref, cmask_ref, agg_ref, dq_ref,
                 *, C: int, sc: int, kernel: str, gamma: float,
                 a: float, c: float):
    """All math in f32; ``dq_ref`` may be bf16 — the secondary tile
    einsum consumes bf16 operands on TPU either way (default matmul
    precision), so emitting bf16 here is numerics-identical to the XLA
    path while halving the downstream random-row permute's bytes."""
    mu = mu_ref[0, 0]
    lr = lr_ref[0, 0]
    reg = reg_ref[0, 0]
    blk = blk_ref[...]  # (C, Kp) pre-step primary block rows
    qv_raw = qi_ref[...]  # (S, Kp) secondary rows + stash lanes
    rr = qv_raw[:, sc:sc + 1]  # (S, 1)
    ww = qv_raw[:, sc + 1:sc + 2]
    ll = qv_raw[:, sc + 2:sc + 3].astype(jnp.int32)  # tile-local index
    # columns the secondary row really has (erases the stash; padding and
    # stash lanes are zero in the true tables)
    qv = qv_raw * cmask_ref[...]
    oh = (ll == jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
          ).astype(jnp.float32)  # (S, C)
    pu = jax.lax.dot_general(
        oh, blk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (S, Kp)

    if kernel == "rbf":
        d = pu - qv
        power = -gamma * jnp.sum(d * d, axis=1, keepdims=True)  # (S, 1)
        e = jnp.exp(power)
        pred = a + c * e
        d_pu = -d * ((2.0 * gamma) * e)
        d_qi = -d_pu
    else:
        x = mu + jnp.sum(pu * qv, axis=1, keepdims=True)  # (S, 1)
        if kernel == "linear":
            pred, d_pu, d_qi = x, qv, pu
        else:  # sigmoid (reference gradient convention: c omitted)
            sig = jax.nn.sigmoid(x)
            pred = a + c * sig
            sb = sig * (1.0 - sig)
            d_pu = qv * sb
            d_qi = pu * sb

    err = (pred - rr) * ww  # (S, 1)
    rw = reg * ww
    gP = (err * d_pu + rw * pu) * pmask_ref[...]
    agg_ref[...] = jax.lax.dot_general(
        oh, -lr * gP, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (C, Kp)

    gQ = (err * d_qi + rw * qv) * smask_ref[...]
    dq_ref[...] = (-lr * gQ).astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "S", "C", "sec_bf16", "interpret"),
)
def fused_tile_step(
    cfg: SGDConfig,
    blk: jax.Array,  # (T*C, Kp) f32 — block-gathered pre-step prim rows
    qis: jax.Array,  # (bs, Kp) f32 — gathered sec rows, stash lanes set
    mu: jax.Array,
    lr,
    reg,
    pmask: jax.Array,  # (Kp,) update mask of the primary side
    smask: jax.Array,  # (Kp,) update mask of the secondary side
    cmask: jax.Array,  # (Kp,) real-column mask of the secondary side
    S: int,
    C: int,
    sec_bf16: bool = False,
    interpret: bool = False,
):
    """One fused mini-batch primary step.

    Returns ``(agg, dq)``: per-tile aggregated primary deltas (T*C, Kp)
    for the XLA block scatter-add, and per-entry secondary deltas
    (bs, Kp) — bf16 when ``sec_bf16`` (the sec TILE path's einsum
    consumes bf16 anyway; do not use for the plain f32 scatter)."""
    if cfg.kernel not in ("linear", "sigmoid", "rbf"):
        raise ValueError(f"unknown kernel {cfg.kernel!r}")
    bs, kp = qis.shape
    T = bs // S
    dq_dtype = jnp.bfloat16 if sec_bf16 else jnp.float32
    kern = functools.partial(
        _step_kernel, C=C, sc=stash_col(cfg), kernel=cfg.kernel,
        gamma=cfg.gamma, a=cfg.a, c=cfg.c,
    )

    # under shard_map (dp trainers) the streamed operands vary across
    # the data axes while the replicated ones (masks, scalars, the
    # window-frozen secondary table's derivatives) do not; lift every
    # operand to one common vma so the kernel sees consistent avals
    vma = tuple(getattr(jax.typeof(qis), "vma", ()) or ())

    def _lift(x):
        have = getattr(jax.typeof(x), "vma", frozenset()) or frozenset()
        missing = tuple(a for a in vma if a not in have)
        return jax.lax.pcast(x, missing, to="varying") if missing else x

    scal = lambda v: _lift(jnp.reshape(jnp.asarray(v, jnp.float32), (1, 1)))
    blk = _lift(blk)
    agg, dq = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),  # mu
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),  # lr
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),  # reg
            pl.BlockSpec((C, kp), lambda t: (t, 0)),  # block rows
            pl.BlockSpec((S, kp), lambda t: (t, 0)),  # sec rows + stash
            pl.BlockSpec((1, kp), lambda t: (0, 0)),  # pmask
            pl.BlockSpec((1, kp), lambda t: (0, 0)),  # smask
            pl.BlockSpec((1, kp), lambda t: (0, 0)),  # cmask
        ],
        out_specs=[
            pl.BlockSpec((C, kp), lambda t: (t, 0)),  # prim tile deltas
            pl.BlockSpec((S, kp), lambda t: (t, 0)),  # sec deltas
        ],
        # under shard_map (the dp trainers) outputs must declare their
        # varying-mesh-axes; inherit the streamed operand's
        out_shape=[
            jax.ShapeDtypeStruct((T * C, kp), jnp.float32,
                                 vma=getattr(jax.typeof(qis), "vma", None)),
            jax.ShapeDtypeStruct((bs, kp), dq_dtype,
                                 vma=getattr(jax.typeof(qis), "vma", None)),
        ],
        # the default scoped-vmem limit (16MB) trips at Kp=256; budget
        # the double-buffered stream blocks + one-hot + elementwise
        # temps explicitly.  Kept far below the ~51-61MB secondary
        # tables so XLA's VMEM residency choices are not disturbed
        # (the v1 lesson).
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                64 * 1024 * 1024,
                4 * (4 * S * kp + 4 * C * kp + S * C) * 4
                + 8 * 1024 * 1024,
            ),
        ),
        interpret=interpret,
    )(
        scal(mu), scal(lr), scal(reg), blk, qis,
        _lift(jnp.reshape(pmask, (1, kp))),
        _lift(jnp.reshape(smask, (1, kp))),
        _lift(jnp.reshape(cmask, (1, kp))),
    )
    return agg, dq
