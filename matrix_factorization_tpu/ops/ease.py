"""EASE — Embarrassingly Shallow Autoencoder (Steck, WWW 2019).

An extension model family (no reference counterpart — the reference's
five models are MF/CF/content based): the closed-form item-item linear
model that is the standard strong baseline for implicit top-N
recommendation.  With ``X`` the (users x items) interaction matrix and
gram ``G = X^T X``, the training problem

    min_B ||X - X B||_F^2 + lam ||B||_F^2   s.t.  diag(B) = 0

has the exact solution (via the diag constraint's Lagrangian)

    P = (G + lam I)^{-1}
    B = I - P . diag(1 / diag(P))        (then diag(B) = 0 by construction)

i.e. ONE regularized SPD inverse of the item gram — no iterations, no
hyperparameters beyond ``lam``.  Serving is ``s_u = x_u B``: one sparse
history row against a dense item-item matrix.

TPU design:

* **Gram build** (:func:`item_gram`): a ``lax.scan`` over user chunks —
  each chunk scatters its (user-local, item) pairs into a dense
  ``(chunk_users, I_p)`` slab and accumulates ``D^T D`` on the MXU in
  one pass (HIGHEST precision: co-occurrence counts are exact in f32,
  and the downstream inverse is precision-sensitive — see
  ``ops/spd.py::_mm`` for the bf16-MAC failure mode this avoids).
* **Inverse** (:func:`ease_weights`): the Schur-recursion SPD inverse
  (``ops/spd.py::spd_inverse_scaled`` — Jacobi-scaled, Newton-refined,
  Pallas Gauss-Jordan leaf), the same solver family that carries the
  iALS sweeps, here on one big ``(I_p, I_p)`` system instead of many
  small ones.  XLA's unblocked Cholesky loop would take ~1ms x I_p
  sequential steps (~16s at 16k items); the recursion is O(log I_p)
  levels of batched matmuls.  Item-count padding rides through
  exactly: pad diagonal entries are ``lam`` with zero off-diagonals,
  so the padded block inverts in isolation and is sliced away in
  ``B``.
* **Scale bound**: the gram/inverse materialize O(I_p^2) f32 (~4
  live copies through the recursion), so one 16GB v5e handles catalogs
  to ~16k items; :func:`check_item_budget` raises actionably above
  that.  (The reference-scale datasets this family targets — ML-100K,
  Steam-200K, recipe subsets — are comfortably inside.)
* **Serving** (:func:`history_scores`): user histories scatter into a
  dense ``(B, I_p)`` block INSIDE the jit (one dispatch, RTT-safe) and
  one MXU matmul against ``B`` scores the whole catalog; the top-k
  variant fuses ``lax.top_k`` so only (B, k) crosses the host link.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.ops.spd import spd_inverse_scaled


class EASEParams(NamedTuple):
    """The trained state: one (I_p, I_p) item-item weight matrix."""

    item_weights: jax.Array


def round8(n: int) -> int:
    return ((max(n, 1) + 7) // 8) * 8


def check_item_budget(n_items: int, item_limit: int = 16384) -> None:
    """Raise before building a gram that cannot fit the chip.

    The hard cap IS the guard (not a bytes formula that would admit
    catalogs the recursion's transient peak then OOMs on): 16k items is
    the measured practical bound on a 16GB v5e — gram + inverse + the
    ~4 live recursion temporaries + the scatter slab ≈ 7GB steady with
    transient peaks well above (benchmarks/ease_bench.py runs 16384
    end-to-end; 2x that in every temporary would not).  Override
    ``item_limit`` only on larger-HBM parts."""
    if round8(n_items) > item_limit:
        raise ValueError(
            f"EASE at {n_items} items needs O(items^2) HBM; the "
            f"measured bound here is {item_limit} items (tiers: 16k "
            f"single 16GB v5e chip, 32k on a small mesh, 64k at >= 8 "
            f"devices — pass mesh= to raise the tier). Past 64k use "
            f"ImplicitALS or BPR: both rank implicit feedback at "
            f"catalog scale with O(items x k) memory. See "
            f"docs/CAPABILITIES.md 'Scope boundaries'."
        )


def _gram_chunks(u: np.ndarray, i: np.ndarray, w: np.ndarray,
                 n_users: int, chunk_users: int):
    """Host pack: sort pairs by user, split at user-chunk boundaries,
    pad every chunk's pair list to the max (weight-0 pads are inert).

    Returns (lu, ii, ww) each (n_chunks, P_max): user ids local to the
    chunk, item ids, weights."""
    order = np.argsort(u, kind="stable")
    u, i, w = u[order], i[order], w[order]
    n_chunks = max(1, (n_users + chunk_users - 1) // chunk_users)
    starts = np.searchsorted(u, np.arange(n_chunks) * chunk_users)
    ends = np.append(starts[1:], len(u))
    pmax = max(1, int((ends - starts).max()))
    pmax = 1 << (pmax - 1).bit_length()  # pow2: stable compile shape
    lu = np.zeros((n_chunks, pmax), np.int32)
    ii = np.zeros((n_chunks, pmax), np.int32)
    ww = np.zeros((n_chunks, pmax), np.float32)
    for c in range(n_chunks):
        s, e = starts[c], ends[c]
        lu[c, : e - s] = u[s:e] - c * chunk_users
        ii[c, : e - s] = i[s:e]
        ww[c, : e - s] = w[s:e]
    return lu, ii, ww


_gram_jit_cache: dict = {}


def item_gram(u: np.ndarray, i: np.ndarray, w: np.ndarray, n_users: int,
              n_items: int, chunk_users: int = 2048) -> jax.Array:
    """(I_p, I_p) item co-occurrence gram ``X^T X`` on device.

    ``w``: per-pair interaction weights (all-ones for the standard
    binary EASE).  One scan over user chunks; each step is a dense
    scatter + one MXU matmul — no (users x items) matrix ever
    materializes."""
    ip = round8(n_items)
    cu = min(chunk_users, round8(n_users))
    lu, ii, ww = _gram_chunks(u, i, w, n_users, cu)
    key = (ip, cu, lu.shape[1])
    fn = _gram_jit_cache.get(key)
    if fn is None:

        def run(lu, ii, ww):
            def body(G, xs):
                lu_c, ii_c, ww_c = xs
                D = jnp.zeros((cu, ip), jnp.float32)
                D = D.at[lu_c, ii_c].add(ww_c, mode="promise_in_bounds")
                G = G + jnp.matmul(D.T, D,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                return G, None

            G0 = jnp.zeros((ip, ip), jnp.float32)
            G, _ = jax.lax.scan(body, G0, (lu, ii, ww))
            return G

        fn = jax.jit(run)
        _gram_jit_cache[key] = fn
    return fn(jnp.asarray(lu), jnp.asarray(ii), jnp.asarray(ww))


_dp_gram_jit_cache: dict = {}


def dp_item_gram(u: np.ndarray, i: np.ndarray, w: np.ndarray,
                 n_users: int, n_items: int, mesh,
                 chunk_users: int = 2048) -> jax.Array:
    """Data-parallel gram: users shard over the mesh's data axes, each
    device grams its local pair stream (same scatter-slab scan as
    :func:`item_gram`), and the epoch costs ONE psum of the (I_p, I_p)
    accumulator — the gram is a pure sum over users, so device partials
    compose exactly (up to f32 summation order; the matmuls stay
    HIGHEST).  Returns the gram replicated over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    from matrix_factorization_tpu.parallel.mesh import (
        data_axes_of, data_size_of,
    )

    axes = data_axes_of(mesh)
    n_dev = data_size_of(mesh)
    ip = round8(n_items)
    upd = round8(max(1, (n_users + n_dev - 1) // n_dev))  # users/device
    cu = min(chunk_users, upd)
    dev = (u // upd).astype(np.int64)
    # per-device chunk packs padded to a SHARED (chunks, pmax) shape
    packs = [
        _gram_chunks(u[dev == d] - d * upd, i[dev == d], w[dev == d],
                     upd, cu)
        for d in range(n_dev)
    ]
    n_chunks = max(p[0].shape[0] for p in packs)
    pmax = max(p[0].shape[1] for p in packs)
    lu_s = np.zeros((n_dev, n_chunks, pmax), np.int32)
    ii_s = np.zeros((n_dev, n_chunks, pmax), np.int32)
    ww_s = np.zeros((n_dev, n_chunks, pmax), np.float32)
    for d, (lu, ii, ww) in enumerate(packs):
        lu_s[d, : lu.shape[0], : lu.shape[1]] = lu
        ii_s[d, : ii.shape[0], : ii.shape[1]] = ii
        ww_s[d, : ww.shape[0], : ww.shape[1]] = ww

    key = (ip, cu, n_chunks, pmax, axes, n_dev)
    fn = _dp_gram_jit_cache.get(key)
    if fn is None:

        def local(lu, ii, ww):
            def body(G, xs):
                lu_c, ii_c, ww_c = xs
                D = jnp.zeros((cu, ip), jnp.float32)
                D = D.at[lu_c, ii_c].add(ww_c, mode="promise_in_bounds")
                return G + jnp.matmul(
                    D.T, D, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), None

            # device-varying zeros carry: an unvarying literal would
            # fail shard_map's scan carry typing once the body mixes in
            # the device-varying xs (same trick as ops/nmf.py's dp path)
            G0 = jnp.zeros((ip, ip), jnp.float32) + 0.0 * ww.reshape(-1)[0]
            G, _ = jax.lax.scan(
                body, G0,
                (lu.reshape(-1, pmax), ii.reshape(-1, pmax),
                 ww.reshape(-1, pmax)))
            return jax.lax.psum(G, axes)

        spec = Pspec(axes)
        fn = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=Pspec(),
        ))
        _dp_gram_jit_cache[key] = fn
    shard = NamedSharding(mesh, Pspec(axes))
    return fn(jax.device_put(jnp.asarray(lu_s), shard),
              jax.device_put(jnp.asarray(ii_s), shard),
              jax.device_put(jnp.asarray(ww_s), shard))


_weights_jit_cache: dict = {}


def ease_weights(G: jax.Array, lam: float, leaf: str = "auto") -> jax.Array:
    """The closed-form EASE item-item matrix ``B`` from the gram.

    ``B = I - P / diag(P)`` with ``P = (G + lam I)^{-1}``; the diagonal
    is exactly zero.  Stays (I_p, I_p): padded items have gram row 0 so
    their ``P`` block is ``(1/lam) I`` and their ``B`` rows/cols come
    out 0 — pad-inert without slicing."""
    ip = G.shape[-1]
    key = (ip, leaf)
    fn = _weights_jit_cache.get(key)
    if fn is None:

        def run(G, lam):
            A = G + lam * jnp.eye(ip, dtype=jnp.float32)
            # scaled + Newton-refined: the raw recursion NaNs on chip
            # when the gram diagonal spans the item popularity counts
            # (see spd_inverse_scaled)
            P = spd_inverse_scaled(A, leaf=leaf)
            d = jnp.diagonal(P)
            B = -P / d[None, :]
            return B - jnp.diag(jnp.diagonal(B))  # exact-zero diagonal

        fn = jax.jit(run)
        _weights_jit_cache[key] = fn
    return fn(G, jnp.float32(lam))


_weights_sharded_jit_cache: dict = {}


NS_ITEM_THRESHOLD = 16384  # Schur below, Newton–Schulz at/above


def ease_weights_sharded(G: jax.Array, lam: float, mesh,
                         leaf: str = "xla", inverse: str = "auto",
                         ns_tol: float = 1e-5) -> jax.Array:
    """The closed form with the (I_p, I_p) system GSPMD-sharded over the
    mesh — the scale path past the single-chip O(items²) bound.

    ``inverse``: ``'schur'`` — the recursion; pure batched matmuls +
    concats, distributed by the SPMD partitioner from annotations alone,
    BUT the partitioner replicates temporaries across the concat
    boundaries to ~1.3x the FULL matrix per device regardless of
    sharding pins (measured via ``compiled.memory_analysis()``,
    tests/test_ease.py) — fine to ~32k items on a v5e-8, no further.
    ``'ns'`` — host-driven Newton–Schulz with shard_map slab matmuls
    (``spd.spd_inverse_ns_sharded``): per-device peak = 3 row-shards +
    one (I_p, blk) slab, so a 64k catalog fits a v5e-8 (round-4
    capacity lift; more FLOPs per inverse — ~log2(cond) extra matmul
    pairs — which multi-chip MXUs absorb where HBM cannot).
    ``'auto'`` picks by size (NS at >= ``NS_ITEM_THRESHOLD`` items).
    The Pallas leaf is NOT used here (a ``pallas_call`` inside a
    GSPMD-partitioned program would force the leaf blocks replicated).
    Returns ``B`` sharded like ``G``'s spec."""
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    ip = G.shape[-1]
    if inverse == "auto":
        inverse = "ns" if ip >= NS_ITEM_THRESHOLD else "schur"
    if inverse not in ("schur", "ns"):
        raise ValueError(f"unknown inverse {inverse!r}")
    names = mesh.axis_names
    spec = Pspec(names[0], names[1] if len(names) > 1 else None)
    shard = NamedSharding(mesh, spec)
    row_spec = NamedSharding(mesh, Pspec(names[0]))

    def closed_form(P):
        d = jnp.diagonal(P)
        B = -P / d[None, :]
        return B - jnp.diag(jnp.diagonal(B))

    if inverse == "ns":
        # host-driven: ridge + inverse + closed form are separate jits
        # so the NS steps run under shard_map with the slab schedule
        key = (ip, tuple(names), tuple(mesh.devices.shape), "ns-parts")
        fns = _weights_sharded_jit_cache.get(key)
        if fns is None:
            ridge = jax.jit(
                lambda G, lam: G + lam * jnp.eye(ip, dtype=jnp.float32),
                in_shardings=(shard, None), out_shardings=row_spec)
            finish = jax.jit(closed_form, in_shardings=(row_spec,),
                             out_shardings=shard)
            fns = (ridge, finish)
            _weights_sharded_jit_cache[key] = fns
        ridge, finish = fns
        from matrix_factorization_tpu.ops.spd import spd_inverse_ns_sharded

        A = ridge(jax.device_put(G, shard), jnp.float32(lam))
        P = spd_inverse_ns_sharded(A, mesh, tol=ns_tol)
        return finish(P)

    key = (ip, tuple(names), tuple(mesh.devices.shape), leaf, inverse,
           ns_tol)
    fn = _weights_sharded_jit_cache.get(key)
    if fn is None:

        def run(G, lam):
            A = G + lam * jnp.eye(ip, dtype=jnp.float32)
            P = spd_inverse_scaled(A, leaf=leaf, spec=row_spec)
            return closed_form(P)

        fn = jax.jit(run, in_shardings=(shard, None),
                     out_shardings=shard)
        _weights_sharded_jit_cache[key] = fn
    return fn(jax.device_put(G, shard), jnp.float32(lam))


_weights_multi_jit_cache: dict = {}


def ease_weights_multi(G: jax.Array, lams) -> jax.Array:
    """The closed form for SEVERAL ridge candidates at once: the gram
    is lam-independent, so a lam sweep is ONE batched Schur-recursion
    inverse over the stacked systems ``G + lam_l I`` — the TPU-native
    shape of EASE hyperparameter tuning (every candidate inverts
    simultaneously; compare ``ops/sweep.py`` for the SGD analogue).

    Returns (L, I_p, I_p).  Batches are chunked so the recursion's ~4
    live (chunk, I_p, I_p) temporaries stay within a few GB: at 2k
    items dozens of candidates run in one program, at 16k they fall
    back to one-at-a-time — same result, more dispatches."""
    lams = np.asarray(lams, np.float32)
    ip = G.shape[-1]
    chunk = max(1, int((2 << 30) // (16 * ip * ip)))
    key = (ip, min(chunk, len(lams)))
    fn = _weights_multi_jit_cache.get(key)
    if fn is None:

        def run(G, lam_v):
            A = G[None] + lam_v[:, None, None] * jnp.eye(ip, dtype=jnp.float32)
            P = spd_inverse_scaled(A)
            d = jnp.diagonal(P, axis1=-2, axis2=-1)
            B = -P / d[:, None, :]
            eye = jnp.eye(ip, dtype=bool)
            return jnp.where(eye[None], 0.0, B)

        fn = jax.jit(run)
        _weights_multi_jit_cache[key] = fn
    outs = []
    for lo in range(0, len(lams), chunk):
        part = lams[lo : lo + chunk]
        if len(part) < min(chunk, len(lams)):  # pad the tail bucket
            pad = np.full(min(chunk, len(lams)) - len(part), part[-1],
                          np.float32)
            outs.append(fn(G, jnp.asarray(np.concatenate([part, pad])))
                        [: len(part)])
        else:
            outs.append(fn(G, jnp.asarray(part)))
    return jnp.concatenate(outs, axis=0)


_score_jit_cache: dict = {}


def _scatter_block(ids: jax.Array, w: jax.Array, ip: int) -> jax.Array:
    """(nb, L) padded histories -> dense (nb, I_p) interaction block
    (weight-0 pads inert)."""
    nb, L = ids.shape
    rows = jnp.repeat(jnp.arange(nb, dtype=jnp.int32)[:, None], L, 1)
    X = jnp.zeros((nb, ip), jnp.float32)
    return X.at[rows, ids].add(w, mode="promise_in_bounds")


def score_history_block(B: jax.Array, ids: jax.Array, w: jax.Array):
    """Traced body shared by the full-score and top-k dispatches:
    scatter the (nb, L) padded histories into a dense (nb, I_p) block
    and score the catalog as one MXU matmul.

    The history block is cast to ``B``'s dtype so a bf16-resident B
    streams half the bytes (the MXU still accumulates in f32 via
    ``preferred_element_type``).  Binary history weights are exact in
    bf16; ``binarize=False`` rating-valued weights additionally round
    to bf16 here (~0.4% relative — the same order as the intended
    B-matrix rounding, documented on the model's ``serving_dtype``)."""
    X = _scatter_block(ids, w, B.shape[0])
    return jnp.matmul(X.astype(B.dtype), B,
                      preferred_element_type=jnp.float32)


_eval_topk_jit_cache: dict = {}


def history_topk_unseen(B: jax.Array, ids: np.ndarray, w: np.ndarray,
                        k: int, n_valid: int):
    """Top-``k`` UNSEEN items per history row — the ranking-eval
    primitive (leave-out protocols score a user's catalog with their
    own training items and the pad columns masked to -inf).  One
    dispatch; returns host (vals, idx), each (nb, k)."""
    ip = int(B.shape[0])
    key = (ip, ids.shape, k, n_valid, str(B.dtype))
    fn = _eval_topk_jit_cache.get(key)
    if fn is None:

        def run(B, ids, w):
            X = _scatter_block(ids, w, ip)
            s = jnp.matmul(X.astype(B.dtype), B,
                           preferred_element_type=jnp.float32)
            s = jnp.where(X > 0, -jnp.inf, s)
            if n_valid < ip:
                s = jnp.where(jnp.arange(ip)[None, :] < n_valid, s,
                              -jnp.inf)
            return jax.lax.top_k(s, k)

        fn = jax.jit(run)
        _eval_topk_jit_cache[key] = fn
    vals, idx = fn(B, jnp.asarray(ids), jnp.asarray(w))
    return np.asarray(vals), np.asarray(idx)


def history_scores(B: jax.Array, ids: np.ndarray, w: np.ndarray):
    """Host-facing full catalog scores ``x_u B`` for a cohort of user
    histories; ``ids``/``w``: (n_users, L) padded item ids and weights
    (weight-0 pads inert), one device dispatch.  The top-k variant
    lives on the model (``EASE._catalog_topk``) via the shared
    ``ops.scoring.topk_harness``."""
    key = (B.shape[0], ids.shape, str(B.dtype))
    fn = _score_jit_cache.get(key)
    if fn is None:
        fn = jax.jit(score_history_block)
        _score_jit_cache[key] = fn
    return fn(B, jnp.asarray(ids), jnp.asarray(w))
