"""Pallas leaf kernel for the batched SPD inverse (ops/spd.py).

The Schur-recursion inverse reduced the iALS solve stage from 459ms to
228ms per 2M-row chunk (d=201), but its leaves were still XLA's
unblocked batched Cholesky, which costs ~1ms per sequential step on chip
REGARDLESS of matrix size (a batched 32x32 Cholesky measures 33ms): each
of the d loop steps is a full-array pass over the (E, d, d) batch, and
there is a ~5ms floor per batched-matmul kernel besides.  Worse, the
MXU path is numerically fragile here: v5e's default matmul feeds bf16
operands, and a Schur complement computed with bf16 MACs can come out
indefinite on ill-conditioned ALS grams -> NaN in the leaf Cholesky
(observed, fusion-dependent, on ML-100K first-sweep grams).

This kernel removes both problems with a layout change: the matrices
live in VMEM as ``(d, d, B)`` with **B = 128 matrices in the lane
dimension**, so one Gauss-Jordan elimination step — a reciprocal, two
broadcasts, and a rank-1 update — retires the step for 128 matrices at
once, entirely on the VPU in exact f32, with zero HBM traffic between
steps.  Gauss-Jordan on an SPD matrix needs no pivoting (the pivots are
the positive diagonal of successive Schur complements), no sqrt, and
computes the explicit inverse in place in d steps:

    p = M[j, j]                          (B,) pivot lane-vector
    u = M[:, j] - e_j                    (d, B)
    v = (M[j, :] + e_j) / p              (d, B)
    M = M - u (x) v                      one rank-1 update

(the e_j shifts fold the pivot row/column/diagonal rewrites into the
same rank-1 update — no masked patch passes; check against the 1x1
case: p - (p-1)(p+1)/p = 1/p).

The (d, d, 128) tile is DMA'd HBM->VMEM into a run_scoped scratch, the
d steps run in-VMEM, and the result is DMA'd back — one HBM pass each
way (a pipelined BlockSpec would double-buffer in+out blocks: ~22MB at
d=104, over VMEM; compute here dwarfs the DMA anyway).

Like ops/pallas_scores.py this is TPU-only; callers gate on platform
and fall back to the XLA Cholesky leaf elsewhere.  Reference
counterpart: none — the reference's ALS is the scalar bias solve
(baseline_model.py:283-362); this serves the factor-ALS normal
equations (SURVEY.md §2.4 "batched closed-form ALS solves").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128  # matrices per program: one full lane register of batch


def _gj_kernel(a_hbm, out_hbm, d: int, dp: int):
    """Invert one (dp, dp, _LANES) tile of the lane-batched stack."""
    i = pl.program_id(0)

    def body(scratch, in_sem, out_sem):
        load = pltpu.make_async_copy(
            a_hbm.at[:, :, pl.ds(i * _LANES, _LANES)], scratch, in_sem)
        load.start()
        load.wait()

        idx = jax.lax.broadcasted_iota(jnp.int32, (dp, 1), 0)

        def step(j, _):
            # Only the pivot ROW is loaded dynamically (ref leading-dim
            # index — Mosaic-lowerable); the pivot COLUMN is recovered
            # from GJ's sign-symmetry invariant on SPD input:
            # M[i, j] = -M[j, i] for already-eliminated i < j, = M[j, i]
            # otherwise.  The pivot itself comes from a masked reduction
            # (dynamic_slice of a loop-carried VALUE cannot lower).
            row = scratch[j, :, :]                            # (dp, B)
            e_j = (idx == j).astype(row.dtype)                # (dp, 1)
            sign = jnp.where(idx < j, -1.0, 1.0).astype(row.dtype)
            p = jnp.sum(row * e_j, axis=0)                    # (B,)
            inv_p = pl.reciprocal(p, approx=False)
            u = row * sign - e_j                              # col_j - e_j
            v = (row + e_j) * inv_p[None, :]
            scratch[:] = scratch[:] - u[:, None, :] * v[None, :, :]
            return 0

        jax.lax.fori_loop(0, d, step, 0, unroll=False)

        store = pltpu.make_async_copy(
            scratch, out_hbm.at[:, :, pl.ds(i * _LANES, _LANES)], out_sem)
        store.start()
        store.wait()

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((dp, dp, _LANES), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA(()),
        out_sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gj_inverse(A: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched SPD inverse of ``A``: (E, d, d) -> (E, d, d), d <= 128.

    Pads d to a multiple of 8 (identity-extended, exact) and E to a
    multiple of 128 (identity matrices, sliced off), then runs one
    Gauss-Jordan program per 128-matrix lane block.
    """
    E, d, d2 = A.shape
    assert d == d2, "square matrices required"
    if d > _LANES:
        raise ValueError(f"gj_inverse leaf handles d <= {_LANES}, got {d}")
    dp = max(8, (d + 7) // 8 * 8)
    Ep = (E + _LANES - 1) // _LANES * _LANES
    # lane-batched layout; identity-pad the trailing dp - d rows/cols so
    # eliminating the padded pivots is an exact no-op on the live block
    At = jnp.transpose(A, (1, 2, 0))  # (d, d, E)
    At = jnp.pad(At, ((0, dp - d), (0, dp - d), (0, Ep - E)))
    if dp != d:
        eye_pad = jnp.pad(jnp.eye(dp - d, dtype=A.dtype),
                          ((d, 0), (d, 0)))[:, :, None]
        At = At + eye_pad
    if Ep != E:
        # padded lanes are all-zero in the live d x d block: give them a
        # unit diagonal so reciprocal() never sees 0 (results discarded)
        diag_fix = jnp.concatenate(
            [jnp.zeros((E,), A.dtype), jnp.ones((Ep - E,), A.dtype)])
        At = At + jnp.eye(dp, dtype=A.dtype)[:, :, None] * diag_fix

    out = pl.pallas_call(
        functools.partial(_gj_kernel, d=d, dp=dp),
        grid=(Ep // _LANES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((dp, dp, Ep), A.dtype),
        interpret=interpret,
    )(At)
    return jnp.transpose(out[:d, :d, :E], (2, 0, 1))
