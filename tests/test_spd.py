"""Batched SPD solver (ops/spd.py) vs dense linalg ground truth.

The Schur-recursion inverse replaces XLA's unblocked batched Cholesky in
the iALS sweeps (measured 2x at d=201 on chip); these tests pin its
numerics on randomly generated ridged grams — the exact matrix class the
ALS normal equations produce.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matrix_factorization_tpu.ops.spd import solve_spd, spd_inverse, spd_solve


def _ridged_gram(key, E, d, L=64, ridge=0.1):
    X = jax.random.normal(key, (E, L, d), jnp.float32) * 0.3
    A = jnp.einsum("eld,elf->edf", X, X) + ridge * jnp.eye(d)[None]
    return A


@pytest.mark.parametrize("d", [3, 8, 17, 32, 33, 64, 96, 129, 201])
def test_spd_inverse_matches_dense(d):
    key = jax.random.PRNGKey(d)
    A = _ridged_gram(key, 4, d, ridge=0.5)
    inv = spd_inverse(A)
    eye = jnp.einsum("eij,ejk->eik", A, inv)
    err = float(jnp.abs(eye - jnp.eye(d)[None]).max())
    assert err < 5e-3, f"d={d}: |A A^-1 - I| = {err}"


@pytest.mark.parametrize("d", [8, 65, 201])
def test_solve_spd_matches_numpy(d):
    key = jax.random.PRNGKey(100 + d)
    kA, kb = jax.random.split(key)
    A = _ridged_gram(kA, 6, d, ridge=0.5)
    b = jax.random.normal(kb, (6, d), jnp.float32)
    x = solve_spd(A, b)
    x_np = np.linalg.solve(
        np.asarray(A, np.float64), np.asarray(b, np.float64)[..., None]
    )[..., 0]
    scale = np.abs(x_np).max()
    assert np.abs(np.asarray(x) - x_np).max() < 1e-3 * max(scale, 1.0)


def test_refinement_tightens_residual():
    key = jax.random.PRNGKey(7)
    kA, kb = jax.random.split(key)
    A = _ridged_gram(kA, 8, 201, L=256, ridge=0.1)
    b = jax.random.normal(kb, (8, 201), jnp.float32)

    def rel_res(x):
        r = jnp.linalg.norm(jnp.einsum("eij,ej->ei", A, x) - b, axis=-1)
        return float((r / jnp.linalg.norm(b, axis=-1)).max())

    raw = rel_res(spd_solve(A, b, refine=0))
    ref = rel_res(spd_solve(A, b, refine=1))
    assert ref < raw
    assert ref < 5e-3


def test_solve_spd_small_d_uses_exact_path():
    # d <= 64 dispatches to Cholesky; result must match numpy tightly
    key = jax.random.PRNGKey(3)
    kA, kb = jax.random.split(key)
    A = _ridged_gram(kA, 5, 16, ridge=1.0)
    b = jax.random.normal(kb, (5, 16), jnp.float32)
    x = np.asarray(solve_spd(A, b))
    x_np = np.linalg.solve(
        np.asarray(A, np.float64), np.asarray(b, np.float64)[..., None]
    )[..., 0]
    assert np.abs(x - x_np).max() < 1e-4


def test_spd_solve_under_jit_and_grad_shapes():
    # jit-compatible and shape-stable for the sweep's (E, d) RHS
    A = _ridged_gram(jax.random.PRNGKey(0), 2, 96)
    b = jnp.ones((2, 96), jnp.float32)
    x = jax.jit(lambda A, b: solve_spd(A, b))(A, b)
    assert x.shape == (2, 96)
    assert bool(jnp.isfinite(x).all())


def test_jacobi_scaling_survives_wild_diagonals():
    # ALS grams have diagonals spanning the per-entity rating counts;
    # scale two entities apart by 1e6 and demand the same accuracy
    key = jax.random.PRNGKey(11)
    kA, kb = jax.random.split(key)
    A = _ridged_gram(kA, 4, 96, ridge=0.5)
    scale = jnp.array([1.0, 1e3, 1e-3, 1.0])[:, None]
    A = A * scale[..., None] * scale[:, None, :]
    b = jax.random.normal(kb, (4, 96), jnp.float32)
    x = solve_spd(A, b)
    x_np = np.linalg.solve(
        np.asarray(A, np.float64), np.asarray(b, np.float64)[..., None]
    )[..., 0]
    rel = np.abs(np.asarray(x) - x_np).max() / max(np.abs(x_np).max(), 1.0)
    assert rel < 1e-3


@pytest.mark.parametrize("d", [3, 17, 64, 128])
def test_pallas_gj_leaf_interpret_matches_dense(d):
    # the TPU leaf, run via the Pallas interpreter on the CPU mesh
    from matrix_factorization_tpu.ops.pallas_spd import gj_inverse

    key = jax.random.PRNGKey(d)
    A = _ridged_gram(key, 3, d, L=48, ridge=0.5)
    inv = gj_inverse(A, interpret=True)
    err = float(jnp.abs(
        jnp.einsum("eij,ejk->eik", A, inv) - jnp.eye(d)[None]).max())
    assert err < 5e-3, f"d={d}: |A A^-1 - I| = {err}"


def test_pallas_gj_leaf_rejects_oversize():
    from matrix_factorization_tpu.ops.pallas_spd import gj_inverse

    A = jnp.eye(130)[None]
    with pytest.raises(ValueError):
        gj_inverse(A)


def test_spd_inverse_scaled_skewed_diagonal():
    """The EASE failure mode: gram diagonals spanning entity-popularity
    counts.  The scaled+refined inverse must stay finite and accurate
    where the raw recursion's conditioning margin is thin."""
    from matrix_factorization_tpu.ops.spd import spd_inverse_scaled

    key = jax.random.PRNGKey(7)
    A = _ridged_gram(key, 1, 96, L=48, ridge=5.0)
    # popularity-like diagonal spread (counts 5..800)
    scale = jnp.sqrt(jax.random.uniform(key, (1, 96), minval=5.0,
                                        maxval=800.0))
    A = A * scale[..., None] * scale[:, None, :]
    P = spd_inverse_scaled(A, refine=1)
    assert np.isfinite(np.asarray(P)).all()
    R = np.einsum("eij,ejk->eik", np.asarray(A, np.float64),
                  np.asarray(P, np.float64)) - np.eye(96)
    assert np.abs(R).max() < 1e-3


def test_spd_inverse_ns_matches_direct():
    """The in-jit Newton–Schulz variant (small systems; the sharded
    large-system form is spd_inverse_ns_sharded) converges to the true
    inverse and early-exits on tol."""
    import jax
    import jax.numpy as jnp

    from matrix_factorization_tpu.ops.spd import spd_inverse_ns

    rng = np.random.default_rng(5)
    M = rng.normal(0, 1, (96, 192)).astype(np.float32)
    A = M.T @ M + 5.0 * np.eye(192, dtype=np.float32)
    P = np.asarray(jax.jit(spd_inverse_ns)(jnp.asarray(A)))
    assert np.abs(P @ A - np.eye(192)).max() < 1e-3
