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


def spd_inverse(A: jax.Array, base: int = 32, leaf: str = "auto",
                spec=None, spec_min: int = 512) -> jax.Array:
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

    ``spec``: optional ``jax.sharding.NamedSharding``-compatible
    sharding whose PartitionSpec row-shards the SECOND-TO-LAST dim.
    Every temporary of the recursion with >= ``spec_min`` rows is
    pinned to it via ``with_sharding_constraint`` — without the pins
    the GSPMD partitioner replicates across the concat boundaries and
    per-device memory scales ~1/2 instead of ~1/n_dev (the round-3
    EASE capacity bound; measured via ``compiled.memory_analysis()``
    in tests/test_ease.py).  Leaves below ``spec_min`` rows run
    replicated — they are small and the pins would only add reshards.
    """
    d = A.shape[-1]

    def pin(x):
        # pin rows of big temporaries; skip small ones (reshard churn)
        if spec is not None and x.shape[-2] >= spec_min:
            return jax.lax.with_sharding_constraint(x, spec)
        return x

    use_pallas = leaf == "pallas" or (leaf == "auto" and _pallas_leaf_available())
    if use_pallas and d <= _PALLAS_LEAF_MAX:
        from matrix_factorization_tpu.ops.pallas_spd import gj_inverse

        flat = A.reshape((-1,) + A.shape[-2:])
        return gj_inverse(flat).reshape(A.shape)
    if d <= base:
        return _base_inverse(A)
    m = ((d // 2 + 7) // 8) * 8  # split point, multiple of 8
    A11 = pin(A[..., :m, :m])
    A12 = pin(A[..., :m, m:])
    A22 = pin(A[..., m:, m:])
    inv11 = pin(spd_inverse(A11, base, leaf, spec, spec_min))
    W = pin(_mm(inv11, A12))                 # (..., m, d-m)
    S = pin(A22 - _mm(_t(A12), W))           # Schur complement, SPD
    invS = pin(spd_inverse(S, base, leaf, spec, spec_min))
    B12 = pin(-_mm(W, invS))                 # (..., m, d-m)
    B11 = pin(inv11 - _mm(B12, _t(W)))
    top = jnp.concatenate([B11, B12], axis=-1)
    bot = jnp.concatenate([_t(B12), invS], axis=-1)
    return pin(jnp.concatenate([top, bot], axis=-2))


def spd_inverse_scaled(A: jax.Array, base: int = 32, refine: int = 1,
                       leaf: str = "auto", spec=None,
                       spec_min: int = 512) -> jax.Array:
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

    def pin(x):
        if spec is not None and x.shape[-2] >= spec_min:
            return jax.lax.with_sharding_constraint(x, spec)
        return x

    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    dscale = jax.lax.rsqrt(jnp.maximum(diag, jnp.finfo(A.dtype).tiny))
    As = pin(A * dscale[..., :, None] * dscale[..., None, :])
    inv = spd_inverse(As, base, leaf, spec, spec_min)
    P = pin(inv * dscale[..., :, None] * dscale[..., None, :])
    for _ in range(refine):
        AP = pin(jnp.matmul(A, P, preferred_element_type=A.dtype,
                            precision=hi))
        P = pin(2.0 * P - jnp.matmul(P, AP, preferred_element_type=A.dtype,
                                     precision=hi))
    return P


_ns_step_cache: dict = {}


def _get_ns_fns(mesh, dp: int, blk: int, d: int = None):
    """Build (step, prep, finish) jits for the sharded Newton–Schulz
    iteration at padded size ``dp`` (rows sharded over the mesh's first
    axis, ``blk``-wide column slabs).  ``d`` is the unpadded system size
    the finish jit slices back to (defaults to ``dp``)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    d = dp if d is None else d
    hi = jax.lax.Precision.HIGHEST
    axes = (mesh.axis_names[0],)
    n_dev = mesh.shape[axes[0]]
    shard = NamedSharding(mesh, Pspec(axes[0]))
    nb = dp // blk
    dl = dp // n_dev
    key = (dp, blk, d, mesh)
    fns = _ns_step_cache.get(key)
    if fns is not None:
        return fns

    def slabmm(X_l, Y_l):
        def body(C_l, j):
            cols = jax.lax.dynamic_slice(Y_l, (0, j * blk), (dl, blk))
            slab = jax.lax.all_gather(cols, axes, axis=0, tiled=True)
            Cb = jnp.matmul(X_l, slab, precision=hi,
                            preferred_element_type=X_l.dtype)
            return jax.lax.dynamic_update_slice(
                C_l, Cb, (0, j * blk)), None

        C_l, _ = jax.lax.scan(body, jnp.zeros_like(X_l),
                              jnp.arange(nb, dtype=jnp.int32))
        return C_l

    def local_step(As_l, P_l):
        row0 = jax.lax.axis_index(axes[0]) * dl
        eye_l = ((row0 + jnp.arange(dl)[:, None])
                 == jnp.arange(dp)[None, :]).astype(As_l.dtype)
        AP_l = slabmm(As_l, P_l)
        res_sq = jax.lax.psum(jnp.sum((AP_l - eye_l) ** 2), axes)
        Pn_l = 2.0 * P_l - slabmm(P_l, AP_l)
        return Pn_l, jnp.sqrt(res_sq) / np.sqrt(dp)

    step = jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(Pspec(axes[0]), Pspec(axes[0])),
        out_specs=(Pspec(axes[0]), Pspec()),
    ))

    def prep(A):
        Ap = jnp.zeros((dp, dp), A.dtype)
        Ap = Ap.at[:d, :d].set(A)
        Ap = Ap.at[jnp.arange(d, dp), jnp.arange(d, dp)].set(1.0)
        diag = jnp.diagonal(Ap)
        ds = jax.lax.rsqrt(jnp.maximum(diag, jnp.finfo(A.dtype).tiny))
        As = Ap * ds[:, None] * ds[None, :]
        c = 1.0 / jnp.sqrt(jnp.sum(As * As))
        P0 = jnp.eye(dp, dtype=A.dtype) * c
        return As, P0, ds

    prep_j = jax.jit(prep, out_shardings=(shard, shard, None))

    def finish(P, ds):
        return (P * ds[:, None] * ds[None, :])[:d, :d]

    finish_j = jax.jit(finish, out_shardings=shard)
    fns = (step, prep_j, finish_j)
    _ns_step_cache[key] = fns
    return fns


def spd_inverse_ns_sharded(A, mesh, max_iters: int = 100,
                           tol: float = 1e-5,
                           col_block: int = 1024) -> jax.Array:
    """Row-sharded Newton–Schulz SPD inverse with a PARTITIONER-PROOF
    memory bound — the >32k-item EASE path (VERDICT r3 #6).

    The iteration is ``P <- P (2I - As P)`` on the Jacobi-scaled system,
    but each (d, d) x (d, d) matmul runs under ``shard_map`` as a scan
    over (d, blk) column slabs: the slab is ``all_gather``'d, multiplied
    against the LOCAL row-shard, and written into the row-sharded
    result.  Per-device peak = 3 row-shards (As, P, AP) + one slab.
    This is done manually because GSPMD, given the same program through
    sharding annotations, hoists the slab gathers into ONE full-operand
    all-gather — measured 21.5GB/device temp at 64k (over HBM), vs the
    slab schedule's ~3 x 2GB shards + 256MB.  Total gathered bytes per
    matmul are identical (d^2); only the PEAK differs, which the GSPMD
    cost model does not optimize for.

    Iterations are host-driven (one scalar residual fetch per step,
    early exit at ``tol`` on ``||As P - I||_F / sqrt(d)``); convergence
    ~ log2(cond) + log2(1/tol) steps from ``P0 = I / ||As||_F``.
    ``A`` pads to a multiple of ``8 * n_dev`` with an identity block
    (exact: the inverse of ``blockdiag(A, I)`` is
    ``blockdiag(inv(A), I)``).  Returns the (d, d) inverse row-sharded
    over the mesh's first axis."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    hi = jax.lax.Precision.HIGHEST
    axes = (mesh.axis_names[0],)
    n_dev = mesh.shape[axes[0]]
    shard = NamedSharding(mesh, Pspec(axes[0]))
    d = A.shape[-1]
    dp = ((d + 8 * n_dev - 1) // (8 * n_dev)) * (8 * n_dev)
    blk = min(col_block, dp)
    while dp % blk:
        blk -= 8
    nb = dp // blk
    dl = dp // n_dev

    step, prep_j, finish_j = _get_ns_fns(mesh, dp, blk, d)

    As, P, ds = prep_j(A)
    for _ in range(max_iters):
        P, res = step(As, P)
        if float(res) < tol:
            break
    return finish_j(P, ds)


def spd_inverse_ns(A: jax.Array, spec=None, max_iters: int = 100,
                   tol: float = 1e-5) -> jax.Array:
    """SPD inverse by Newton–Schulz iteration.

    ``P <- P (2I - A P)`` from the Jacobi-scaled system, starting at
    ``P0 = I / ||As||_F`` (valid for SPD: eigenvalues of ``I - c As``
    lie in (0, 1)); quadratic contraction once ``||I - As P|| < 1``, so
    iterations ~ log2(cond) + log2(1/tol).
    In-jit convenience for SMALL systems; for sharded large systems use
    :func:`spd_inverse_ns_sharded` (this in-jit form cannot bound peak
    memory — GSPMD gathers a full operand per matmul).  ``tol`` is on
    ``||As P - I||_F / sqrt(d)`` (RMS off-identity), checked each step
    inside the ``while_loop``; HIGHEST precision throughout (the MXU's
    bf16 default diverges on ill-conditioned grams, same finding as
    ``_mm``)."""
    hi = jax.lax.Precision.HIGHEST
    d = A.shape[-1]

    def pin(x):
        if spec is not None:
            return jax.lax.with_sharding_constraint(x, spec)
        return x

    def mm(a, b):
        return pin(jnp.matmul(a, b, precision=hi,
                              preferred_element_type=A.dtype))

    diag = jnp.diagonal(A)
    ds = jax.lax.rsqrt(jnp.maximum(diag, jnp.finfo(A.dtype).tiny))
    As = pin(A * ds[:, None] * ds[None, :])
    eye = pin(jnp.eye(d, dtype=A.dtype))
    c = 1.0 / jnp.sqrt(jnp.sum(As * As))
    P0 = pin(eye * c)

    def cond(st):
        k, _, res = st
        return (k < max_iters) & (res > tol)

    def body(st):
        k, P, _ = st
        AP = mm(As, P)
        res = jnp.sqrt(jnp.sum((AP - eye) ** 2)) / jnp.sqrt(
            jnp.float32(d)).astype(A.dtype)
        Pn = pin(2.0 * P - mm(P, AP))
        return k + 1, Pn, res

    _, P, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), P0, jnp.asarray(jnp.inf, A.dtype)))
    return pin(P * ds[:, None] * ds[None, :])


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
