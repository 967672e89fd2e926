"""Batched SPD solves that fit the TPU, for the ALS normal equations.

XLA's ``lax.linalg.cholesky`` on TPU is an UNBLOCKED loop: d sequential
steps, each streaming the full (E, d, d) batch through HBM.  At the iALS
sweep's shapes (E ~ 8k entities, d = n_factors + 1 ~ 201) that is
d x 1.26GB ~ 253GB of traffic — measured 296ms per 2M-row bucket chunk,
~2800x the factorization's FLOP roof, and ``cho_solve`` adds two
triangular solves of the same character.  The solve stage was 92% of the
measured sweep (see benchmarks/ials_solver.py).

This module replaces it with a **recursive Schur-complement block
inverse**: for SPD ``A = [[A11, A12], [A12^T, A22]]``,

    S       = A22 - A12^T A11^{-1} A12          (SPD Schur complement)
    A^{-1}  = [[inv11 + W S^{-1} W^T,  -W S^{-1}],
               [ -S^{-1} W^T,           S^{-1} ]],   W = A11^{-1} A12

which is just recursive block Cholesky rearranged so every level is a
handful of BATCHED MATMULS (MXU work, one pass of HBM traffic each)
instead of a length-d scalar loop.  The recursion bottoms out at
``base``-sized blocks where the unblocked Cholesky's loop is short and
its matrices are small.  For SPD matrices the recursion is
backward-stable (it is Cholesky in disguise); with the ALS ridge on the
diagonal the conditioning is benign.

Reference counterpart: the closed-form ALS solves in
``baseline_model.py:283-362`` are scalar; the factor-ALS normal
equations have no reference counterpart (SURVEY.md §2.4) — this is the
TPU-native realization of "batched closed-form ALS solves".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _base_inverse(A: jax.Array) -> jax.Array:
    """Small-block SPD inverse: Cholesky + one triangular solve against I.

    At d <= ~32 the unblocked loop is short and the per-step traffic is
    tiny, so XLA's primitive is fine here.
    """
    d = A.shape[-1]
    chol = jax.lax.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), A.shape)
    # L X = I  ->  X = L^{-1};  A^{-1} = L^{-T} L^{-1}
    inv_l = jax.lax.linalg.triangular_solve(
        chol, eye, left_side=True, lower=True)
    return jnp.einsum("...ki,...kj->...ij", inv_l, inv_l,
                      preferred_element_type=A.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    # HIGHEST is load-bearing, not tuning: v5e's default matmul feeds the
    # MXU bf16 operands (measured in benchmarks/ials_bf16.py), and under
    # bf16 MACs a Schur complement of an ill-conditioned gram can come
    # out indefinite -> NaN in the leaf Cholesky.  Seen in practice on
    # first-sweep ALS grams (ML-100K shape, reg=0.05) where the default
    # precision NaN'd for SOME program shapes (fusion-dependent).
    return jnp.matmul(a, b, preferred_element_type=a.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def _t(a: jax.Array) -> jax.Array:
    return jnp.swapaxes(a, -1, -2)


_PALLAS_LEAF_MAX = 128


def _pallas_leaf_available() -> bool:
    return jax.default_backend() == "tpu"


def spd_inverse(A: jax.Array, base: int = 32, leaf: str = "auto") -> jax.Array:
    """Batched inverse of SPD matrices via recursive Schur complements.

    ``A``: (..., d, d) SPD (e.g. regularized ALS grams).  The recursion
    splits at multiples of 8 (sublane-friendly); every level is batched
    matmuls, so the whole inverse is MXU work with O(log d) passes of
    HBM traffic instead of the primitive's O(d).

    ``leaf``: ``'pallas'`` inverts blocks of d <= 128 with the
    lane-batched Gauss-Jordan kernel (ops/pallas_spd.py — exact-f32 VPU
    work, 12x the XLA Cholesky leaf on chip and immune to the MXU's
    bf16 default); ``'xla'`` keeps the Cholesky leaf (CPU meshes /
    interpret-free tests); ``'auto'`` picks by backend.
    """
    d = A.shape[-1]
    use_pallas = leaf == "pallas" or (leaf == "auto" and _pallas_leaf_available())
    if use_pallas and d <= _PALLAS_LEAF_MAX:
        from matrix_factorization_tpu.ops.pallas_spd import gj_inverse

        flat = A.reshape((-1,) + A.shape[-2:])
        return gj_inverse(flat).reshape(A.shape)
    if d <= base:
        return _base_inverse(A)
    m = ((d // 2 + 7) // 8) * 8  # split point, multiple of 8
    A11 = A[..., :m, :m]
    A12 = A[..., :m, m:]
    A22 = A[..., m:, m:]
    inv11 = spd_inverse(A11, base, leaf)
    W = _mm(inv11, A12)                      # (..., m, d-m)
    S = A22 - _mm(_t(A12), W)                # Schur complement, SPD
    invS = spd_inverse(S, base, leaf)
    B12 = -_mm(W, invS)                      # (..., m, d-m)
    B11 = inv11 - _mm(B12, _t(W))
    top = jnp.concatenate([B11, B12], axis=-1)
    bot = jnp.concatenate([_t(B12), invS], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse_scaled(A: jax.Array, base: int = 32, refine: int = 1,
                       leaf: str = "auto") -> jax.Array:
    """Explicit SPD inverse with the same conditioning insurance as
    :func:`spd_solve`: Jacobi scaling to unit diagonal before the Schur
    recursion, then ``refine`` Newton–Schulz steps
    (``P <- 2P - P A P``, quadratic residual contraction) in HIGHEST
    precision.  The raw recursion NaNs on chip when the diagonal spans
    the data's entity counts (measured on an EASE item gram, diag in
    [lam, lam+792]: unscaled -> NaN, scaled -> finite with residual
    1.7e-2, one Newton step -> ~3e-4).  Use this whenever the inverse
    itself (not a solve) is the product."""
    hi = jax.lax.Precision.HIGHEST
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    dscale = jax.lax.rsqrt(jnp.maximum(diag, jnp.finfo(A.dtype).tiny))
    As = A * dscale[..., :, None] * dscale[..., None, :]
    inv = spd_inverse(As, base, leaf)
    P = inv * dscale[..., :, None] * dscale[..., None, :]
    for _ in range(refine):
        AP = jnp.matmul(A, P, preferred_element_type=A.dtype, precision=hi)
        P = 2.0 * P - jnp.matmul(P, AP, preferred_element_type=A.dtype,
                                 precision=hi)
    return P


def spd_solve(A: jax.Array, b: jax.Array, base: int = 32,
              refine: int = 1, leaf: str = "auto") -> jax.Array:
    """Batched solve of SPD systems ``A x = b`` (single RHS per system).

    Jacobi-scales to unit diagonal (conditioning insurance for the ALS
    grams, whose diagonals span the per-entity rating counts), forms the
    explicit Schur-recursion inverse of the scaled system, applies it,
    then runs ``refine`` steps of iterative refinement
    (x += Â⁻¹(b − Ax), HIGHEST-precision residual) against the SAME
    materialized inverse — which restores the Cholesky path's relative
    residual exactly (measured 4.5e-3 both; unrefined 2.2e-2).
    ``b``: (..., d).
    """
    hi = jax.lax.Precision.HIGHEST  # see _mm: bf16 MACs break refinement
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    dscale = jax.lax.rsqrt(jnp.maximum(diag, jnp.finfo(A.dtype).tiny))
    As = A * dscale[..., :, None] * dscale[..., None, :]
    inv = spd_inverse(As, base, leaf)

    def apply_inv(r):
        y = jnp.einsum("...ij,...j->...i", inv, dscale * r,
                       preferred_element_type=A.dtype, precision=hi)
        return dscale * y

    x = apply_inv(b)
    for _ in range(refine):
        r = b - jnp.einsum("...ij,...j->...i", A, x,
                           preferred_element_type=A.dtype, precision=hi)
        x = x + apply_inv(r)
    return x


def solve_spd(A: jax.Array, b: jax.Array, base: int = 32,
              refine: int = 1, leaf: str = "auto") -> jax.Array:
    """Dispatching SPD solve for the ALS normal equations.

    On TPU every d routes through the Schur/Pallas inverse (the
    Gauss-Jordan leaf beats the primitive Cholesky at ALL batched
    shapes measured — d=64: 7.3ms vs 70ms — and avoids its NaN mode on
    bf16-MAC Schur complements).  On CPU small d keeps the primitive
    Cholesky (LAPACK is exact and fast there); above the crossover
    (measured ~d=64 on chip: Cholesky's unblocked loop costs ~1ms/step
    regardless of d, so d=201 pays 459ms) the Schur recursion takes
    over.  ``A``: (..., d, d) SPD, ``b``: (..., d).
    """
    d = A.shape[-1]
    use_pallas = leaf == "pallas" or (leaf == "auto" and _pallas_leaf_available())
    if d <= 64 and not use_pallas:
        chol = jax.lax.linalg.cholesky(A)
        return jax.scipy.linalg.cho_solve((chol, True), b[..., None])[..., 0]
    return spd_solve(A, b, base=base, refine=refine, leaf=leaf)
