"""Alternating least squares for the full factor model (linear kernel).

The reference only has ALS for the bias model (``baseline_model.py:283``).
This extends closed-form alternation to the factors themselves — the
iALS family (cf. "iALS++: Speeding up Matrix Factorization with Subspace
Optimization", arXiv:2110.14044, consulted for the method shape only) —
which is a *much* better fit for the TPU than SGD: each half-sweep is a
batch of dense normal-equation solves (MXU einsums + batched Cholesky),
with no scatter in sight.

Bias folding (see ``ops/segment_sgd.py``) makes the bias a free extra
column: for the user sweep each rating's design row is
``x_i = [q_i, 1]`` (d = k+1) with target ``y_i = r - mu - b_i``, and the
solution ``[p_u, b_u]`` writes straight back into the extended user row.
The item sweep is symmetric.

Layout: ratings are grouped per entity on the host and padded to the max
count L, giving (E, L) index/rating/mask arrays; the device pass gathers
(E, L, d) design blocks, forms per-entity grams via one einsum, and
solves.  v1 materializes the (E, L, d) gather — fine up to ~10M ratings /
moderate L; count-bucketing for 25M+ scale is a round-2 follow-up.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops.spd import solve_spd
from matrix_factorization_tpu.ops.segment_sgd import (
    MFParams,
    RatingBatches,
    bias_col,
    const_col,
    masked_sse,
    round_up,
)


class GroupedRatings(NamedTuple):
    """Per-entity padded rating lists: all arrays (n_entities, L)."""

    other_ids: jax.Array  # int32: the counterpart entity per rating
    ratings: jax.Array  # f32
    mask: jax.Array  # f32 1/0


def _native_counts(ids: np.ndarray, n_entities: int):
    """Per-entity counts via the native O(n) pass (None if lib missing)."""
    from matrix_factorization_tpu.data.loader import get_native_lib

    lib = get_native_lib()
    if lib is None:
        return None, None
    counts = np.zeros(n_entities, np.int32)
    lib.mf_entity_counts(np.ascontiguousarray(ids, np.int32), len(ids),
                         n_entities, counts)
    return lib, counts


def _native_pack(lib, ids, other_ids, ratings, chunk_of, row_of,
                 L_of_chunk, chunk_base, pool_size, n_entities):
    """One native pass filling every chunk's (E_c, L_c) buffers at once."""
    oi = np.zeros(pool_size, np.int32)
    rr = np.zeros(pool_size, np.float32)
    mm = np.zeros(pool_size, np.float32)
    fill = np.zeros(n_entities, np.int32)
    lib.mf_pack_grouped(
        np.ascontiguousarray(ids, np.int32),
        np.ascontiguousarray(other_ids, np.int32),
        np.ascontiguousarray(ratings, np.float32),
        len(ids),
        np.ascontiguousarray(chunk_of, np.int32),
        np.ascontiguousarray(row_of, np.int32),
        np.ascontiguousarray(L_of_chunk, np.int32),
        np.ascontiguousarray(chunk_base, np.int64),
        oi, rr, mm, fill,
    )
    return oi, rr, mm


def _native_pack_wire(lib, ids, other_ids, ratings, chunk_of, row_of,
                      L_of_chunk, chunk_base, pool_size, n_entities):
    """One native pass emitting the compressed wire pools directly
    (``loader.cpp::mf_pack_grouped_wire`` — no mask pool, no f32/int32
    intermediate): returns ``(lo, hi|None, ratings_enc, half)`` or None
    when ids exceed the 24-bit hi-plane range (fall back to the
    uncompressed pack + host-side encode)."""
    o_max = int(other_ids.max()) if len(other_ids) else 0
    if o_max >= (1 << 24):
        return None
    twice = ratings * 2.0
    rint = np.rint(twice)
    half = bool(len(ratings)) and bool(
        (np.abs(twice - rint) < 1e-6).all() and (np.abs(rint) < 127).all())
    wide = o_max >= (1 << 16)
    lo = np.zeros(pool_size, np.uint16)
    hi = np.zeros(pool_size if wide else 1, np.uint8)
    r8 = np.zeros(pool_size if half else 1, np.int8)
    rf = np.zeros(1 if half else pool_size, np.float32)
    fill = np.zeros(n_entities, np.int32)
    lib.mf_pack_grouped_wire(
        np.ascontiguousarray(ids, np.int32),
        np.ascontiguousarray(other_ids, np.int32),
        np.ascontiguousarray(ratings, np.float32),
        len(ids),
        np.ascontiguousarray(chunk_of, np.int32),
        np.ascontiguousarray(row_of, np.int32),
        np.ascontiguousarray(L_of_chunk, np.int32),
        np.ascontiguousarray(chunk_base, np.int64),
        lo, hi, int(wide), r8, rf, int(half), fill,
    )
    return lo, (hi if wide else None), (r8 if half else rf), half


def group_by_entity(
    ids: np.ndarray, other_ids: np.ndarray, ratings: np.ndarray,
    n_entities: int,
) -> GroupedRatings:
    """(n_entities, L) padded per-entity rating lists, input order kept.

    Packing is a single native O(n) pass (``native/loader.cpp::
    mf_pack_grouped``) when the lib is available — the numpy fallback
    costs two stable argsorts + a Python loop over entities.
    """
    lib, counts = _native_counts(np.asarray(ids, np.int32), n_entities)
    if lib is not None:
        L = round_up(max(1, int(counts.max())), 8)
        layout = dict(
            chunk_of=np.zeros(n_entities, np.int32),
            row_of=np.arange(n_entities, dtype=np.int32),
            L_of_chunk=np.asarray([L], np.int32),
            chunk_base=np.asarray([0], np.int64),
            pool_size=n_entities * L,
            n_entities=n_entities,
        )
        wire = _native_pack_wire(lib, ids, other_ids, ratings, **layout)
        if wire is not None:
            lo, hi, renc, half = wire
            return GroupedRatings(
                *_ship_wire(lo, hi, renc, counts, n_entities, L, half))
        oi, rr, mm = _native_pack(lib, ids, other_ids, ratings, **layout)
        return GroupedRatings(
            *_ship_grouped(oi, rr, counts, n_entities, L))
    order = np.argsort(ids, kind="stable")
    ids_s, other_s, r_s = ids[order], other_ids[order], ratings[order]
    counts = np.bincount(ids_s, minlength=n_entities)
    L = round_up(max(1, int(counts.max())), 8)
    oi = np.zeros((n_entities, L), np.int32)
    rr = np.zeros((n_entities, L), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for e in range(n_entities):
        c = int(counts[e])
        if c:
            sl = slice(starts[e], starts[e] + c)
            oi[e, :c] = other_s[sl]
            rr[e, :c] = r_s[sl]
    return GroupedRatings(*_ship_grouped(oi, rr, counts, n_entities, L))


def ials_train(
    params: MFParams,
    by_user: GroupedRatings,
    by_item: GroupedRatings,
    data: RatingBatches,
    cfg: SGDConfig,
    n_epochs: int,
    update_user_params: bool = True,
    update_item_params: bool = True,
    reg_scale: str = "absolute",
) -> Tuple[MFParams, jax.Array]:
    """Alternate exact user/item sweeps; returns (params, per-epoch RMSE).
    ``reg_scale``: see :func:`_reg_diag`."""
    if cfg.kernel != "linear":
        raise ValueError("factor ALS requires the linear kernel")
    if reg_scale not in _REG_SCALES:
        raise ValueError(f"reg_scale must be one of {_REG_SCALES}")
    mu = params.global_mean

    def sweep(own, other, grouped, own_side):
        k = cfg.n_factors
        d = k + 1
        o_bias = bias_col(cfg, "item" if own_side == "user" else "user")
        o_const = const_col(cfg, "item" if own_side == "user" else "user")
        rows = other[grouped.other_ids]
        X = jnp.concatenate(
            [rows[..., :k], rows[..., o_const:o_const + 1]], axis=-1
        )
        y = (grouped.ratings - mu - rows[..., o_bias]) * grouped.mask
        Xm = X * grouped.mask[..., None]
        A = jnp.einsum("eld,elf->edf", Xm, Xm,
                       preferred_element_type=jnp.float32)
        A = A + _reg_diag(cfg.reg, grouped.mask, d, reg_scale)
        b = jnp.einsum("eld,el->ed", Xm, y,
                       preferred_element_type=jnp.float32)
        # A is SPD (gram + reg*I): batched Cholesky beats generic LU
        sol = solve_spd(A, b)
        has_data = grouped.mask.sum(axis=1) > 0
        own_b = bias_col(cfg, own_side)
        E = grouped.other_ids.shape[0]
        own_live = own[:E]
        upd = own_live.at[:, :k].set(
            jnp.where(has_data[:, None], sol[:, :k], own_live[:, :k])
        )
        upd = upd.at[:, own_b].set(
            jnp.where(has_data, sol[:, k], own_live[:, own_b])
        )
        return own.at[:E].set(upd)

    def epoch(p: MFParams, _):
        P, Q = p.user_features, p.item_features
        if update_user_params:
            P = sweep(P, Q, by_user, "user")
        if update_item_params:
            Q = sweep(Q, P, by_item, "item")
        p = MFParams(P, Q, mu)
        rmse = (
            jnp.sqrt(masked_sse(p, data, cfg) / max(data.n_real, 1))
            if cfg.compute_epoch_rmse else jnp.float32(0.0)
        )
        return p, rmse

    return jax.lax.scan(epoch, params, None, length=n_epochs)


# ---------------------------------------------------------------------------
# Scale path: count-bucketed sweeps (bounds padding waste and memory)
# ---------------------------------------------------------------------------


class Bucket(NamedTuple):
    entity_ids: jax.Array  # (E_b,) int32 — which rows this bucket solves
    other_ids: jax.Array  # (E_b, L_b)
    ratings: jax.Array
    mask: jax.Array


_decode_cache: dict = {}


def _grouped_decoder(L: int, has_hi: bool, half: bool):
    """jit'd device-side decoder for one wire layout (cached per shape
    class — L values are pow2-bucketed so this stays small)."""
    key = (L, has_hi, half)
    fn = _decode_cache.get(key)
    if fn is None:
        def decode(oi_lo, oi_hi, rr_enc, counts):
            oi = oi_lo.astype(jnp.int32)
            if has_hi:
                oi = oi + (oi_hi.astype(jnp.int32) << 16)
            rr = rr_enc.astype(jnp.float32)
            if half:
                rr = rr * 0.5
            mm = (jnp.arange(L, dtype=jnp.int32)[None, :]
                  < counts[:, None]).astype(jnp.float32)
            return oi, rr, mm

        fn = jax.jit(decode)
        _decode_cache[key] = fn
    return fn


def _ship_wire(lo: np.ndarray, hi, rr_enc: np.ndarray, counts: np.ndarray,
               E: int, L: int, half: bool):
    """Ship pools already in wire layout (from ``mf_pack_grouped_wire``)
    and decode on device — same decoder jits as ``_ship_grouped``."""
    has_hi = hi is not None
    fn = _grouped_decoder(L, has_hi, half)
    return fn(
        jnp.asarray(lo.reshape(E, L)),
        jnp.asarray(hi.reshape(E, L)) if has_hi else jnp.zeros((), jnp.uint8),
        jnp.asarray(rr_enc.reshape(E, L)),
        jnp.asarray(counts.astype(np.int32)),
    )


def _ship_grouped(oi: np.ndarray, rr: np.ndarray, counts: np.ndarray,
                  E: int, L: int):
    """Compressed host->device transfer of one (E, L) grouped block.

    The padded bucket streams were the iALS prep bottleneck on
    remote-tunnel images: 12 bytes/slot (int32 other-ids + f32 ratings
    + f32 masks) at single-digit MB/s was 36-40s of every 25M-rating
    sweep's wall-clock (RESULTS.md, ials_vs_sgd).  Wire format here
    (the ``pack_ratings`` ``_ship_*`` idea applied to grouped blocks):

    * other-ids: uint16, plus a uint8 high-byte plane only when ids
      exceed 65535 (covers 16.7M entities) — 2-3B instead of 4B
    * ratings: int8 half-steps when exactly representable (MovieLens
      scales), else raw f32
    * mask: NOT shipped — both pack paths fill each entity's row
      left-contiguously, so the mask is rebuilt on device from the
      per-entity counts ((E,) int32 instead of (E, L) f32)

    Decoding runs on device in one jit; the resident arrays are
    bit-identical to the uncompressed path (regression-tested).
    """
    oi = oi.reshape(E, L)
    rr = rr.reshape(E, L)
    hi_max = int(oi.max()) if oi.size else 0
    if hi_max < (1 << 16):
        lo, hi, has_hi = oi.astype(np.uint16), None, False
    elif hi_max < (1 << 24):
        lo = (oi & 0xFFFF).astype(np.uint16)
        hi = (oi >> 16).astype(np.uint8)
        has_hi = True
    else:  # ids beyond 16.7M: ship raw (still mask-free on the wire)
        lo, hi, has_hi = oi, None, False
    twice = rr * 2.0
    rint = np.rint(twice)
    half = bool(rr.size) and bool(
        (np.abs(twice - rint) < 1e-6).all() and (np.abs(rint) < 127).all())
    rr_enc = rint.astype(np.int8) if half else rr
    fn = _grouped_decoder(L, has_hi, half)
    return fn(jnp.asarray(lo),
              jnp.asarray(hi) if has_hi else jnp.zeros((), jnp.uint8),
              jnp.asarray(rr_enc), jnp.asarray(counts.astype(np.int32)))


def group_both_sides_bucketed(
    u: np.ndarray,
    i: np.ndarray,
    r: np.ndarray,
    n_users: int,
    n_items: int,
    max_block_rows: int = 4_000_000,
) -> Tuple[list, list]:
    """Both grouped views (by user, by item) with the two native O(n)
    packs overlapped in worker threads — ctypes releases the GIL during
    the C pass, so the host work runs concurrently while the device
    transfers serialize safely inside the JAX runtime.  Results are
    identical to two sequential ``group_by_entity_bucketed`` calls
    (regression-tested)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        fu = ex.submit(group_by_entity_bucketed, u, i, r, n_users,
                       max_block_rows)
        fi = ex.submit(group_by_entity_bucketed, i, u, r, n_items,
                       max_block_rows)
        return fu.result(), fi.result()


def group_by_entity_bucketed(
    ids: np.ndarray,
    other_ids: np.ndarray,
    ratings: np.ndarray,
    n_entities: int,
    max_block_rows: int = 4_000_000,
) -> list:
    """Bucket entities by rating count (power-of-two L), chunking each
    bucket so E_b * L_b stays under ``max_block_rows`` — (E, L, Kp)
    gathers never exceed ~2GB regardless of the heaviest entity.

    Packing is ONE native O(n) pass over the raw (unsorted) entries when
    the native lib is available (``mf_pack_grouped``): input order within
    each entity is preserved, byte-identical to the argsort layout the
    numpy fallback produces (regression-tested).  At 25M ratings this
    replaces two stable argsorts + several full-stream gathers.
    """
    lib, counts = _native_counts(np.asarray(ids, np.int32), n_entities)
    if lib is None:
        order = np.argsort(ids, kind="stable")
        ids_s, other_s, r_s = ids[order], other_ids[order], ratings[order]
        counts = np.bincount(ids_s, minlength=n_entities)
        starts = np.concatenate([[0], np.cumsum(counts)])
        pos_in_entity = np.arange(len(ids_s), dtype=np.int64) - starts[ids_s]

    active = np.nonzero(counts)[0]
    # bucket label = next power of two >= count (min 8)
    L_of = np.maximum(8, 1 << np.ceil(np.log2(np.maximum(counts[active], 1))
                                      ).astype(int))
    chunk_of = np.full(n_entities, -1, np.int64)
    row_of = np.full(n_entities, -1, np.int64)
    chunk_meta = []  # (L, entity_ids)
    for L in np.unique(L_of):
        members = active[L_of == L]
        max_e = max(1, int(max_block_rows // L))
        for lo in range(0, len(members), max_e):
            chunk = members[lo:lo + max_e]
            chunk_of[chunk] = len(chunk_meta)
            row_of[chunk] = np.arange(len(chunk))
            chunk_meta.append((int(L), chunk))

    if lib is not None:
        L_of_chunk = np.asarray([L for L, _ in chunk_meta], np.int32)
        sizes = np.asarray(
            [L * len(chunk) for L, chunk in chunk_meta], np.int64)
        chunk_base = np.concatenate([[0], np.cumsum(sizes)])
        layout = dict(
            chunk_of=chunk_of.astype(np.int32),
            row_of=row_of.astype(np.int32),
            L_of_chunk=L_of_chunk,
            chunk_base=chunk_base[:-1],
            pool_size=int(sizes.sum()),
            n_entities=n_entities,
        )
        wire = _native_pack_wire(lib, ids, other_ids, ratings, **layout)
        buckets = []
        if wire is not None:
            wlo, whi, wrenc, half = wire
            for c, (L, chunk) in enumerate(chunk_meta):
                E = len(chunk)
                a, b = int(chunk_base[c]), int(chunk_base[c] + E * L)
                doi, drr, dmm = _ship_wire(
                    wlo[a:b], whi[a:b] if whi is not None else None,
                    wrenc[a:b], counts[chunk], E, L, half)
                buckets.append(Bucket(
                    jnp.asarray(chunk.astype(np.int32)), doi, drr, dmm))
            return buckets
        oi, rr, mm = _native_pack(lib, ids, other_ids, ratings, **layout)
        for c, (L, chunk) in enumerate(chunk_meta):
            E = len(chunk)
            a, b = int(chunk_base[c]), int(chunk_base[c] + E * L)
            doi, drr, dmm = _ship_grouped(
                oi[a:b], rr[a:b], counts[chunk], E, L)
            buckets.append(Bucket(
                jnp.asarray(chunk.astype(np.int32)), doi, drr, dmm))
        return buckets

    # numpy fallback: three O(nnz) passes + a flat scatter per chunk
    entry_chunk = chunk_of[ids_s]
    entry_row = row_of[ids_s]
    order2 = np.argsort(entry_chunk, kind="stable")
    ec_s = entry_chunk[order2]
    bounds = np.searchsorted(ec_s, np.arange(len(chunk_meta) + 1))

    buckets = []
    for c, (L, chunk) in enumerate(chunk_meta):
        sl = order2[bounds[c]:bounds[c + 1]]
        E = len(chunk)
        flat = entry_row[sl] * L + pos_in_entity[sl]
        oi = np.zeros(E * L, np.int32)
        rr = np.zeros(E * L, np.float32)
        oi[flat] = other_s[sl]
        rr[flat] = r_s[sl]
        doi, drr, dmm = _ship_grouped(oi, rr, counts[chunk], E, L)
        buckets.append(Bucket(
            jnp.asarray(chunk.astype(np.int32)), doi, drr, dmm))
    return buckets


_sweep_cache: dict = {}


def _gram(Xg, gram_dtype: str):
    """(E, d, d) design gram at the requested precision.

    TPU finding (benchmarks/ials_bf16.py): XLA's DEFAULT f32 matmul on
    v5e already feeds the MXU bf16 operands — an explicit bf16 cast is
    bit-identical and no faster, so 'bf16' and 'f32' coincide here.  The
    meaningful knob is the opposite one: ``'highest'`` requests exact
    f32 MACs (multi-pass, slower) for reproducibility-sensitive solves.
    """
    precision = (jax.lax.Precision.HIGHEST if gram_dtype == "highest"
                 else jax.lax.Precision.DEFAULT)
    if gram_dtype == "bf16":
        Xg = Xg.astype(jnp.bfloat16)
    return jnp.einsum("eld,elf->edf", Xg, Xg,
                      preferred_element_type=jnp.float32,
                      precision=precision)


_GRAM_DTYPES = ("f32", "bf16", "highest")

_REG_SCALES = ("absolute", "per_obs")


def _reg_diag(reg: float, mask: jax.Array, d: int, reg_scale: str):
    """Ridge term for the per-entity normal equations.

    ``'absolute'`` adds ``reg*I`` — the reference bias-ALS convention
    (`/root/reference/matrix_factorization/baseline_model.py:329-348`
    divides by ``reg + count`` with absolute reg).  ``'per_obs'`` adds
    ``reg*n_obs(entity)*I`` — the exact ALS counterpart of SGD's
    PER-RATING L2 (`kernels.py:156-178` subtracts ``lr*reg*p`` once per
    rating, i.e. the objective is sum_obs err^2 + reg*sum_obs |.|^2),
    so an ALS solve with 'per_obs' minimizes the same objective the SGD
    trainer descends.  With absolute reg and k >= ratings-per-entity
    the solve interpolates the noise (measured: val RMSE 1.2 at k=200
    on 25M ratings, benchmarks/ials_vs_sgd.py)."""
    eye = jnp.eye(d, dtype=jnp.float32)[None]
    if reg_scale == "per_obs":
        n_obs = jnp.maximum(mask.sum(axis=1), 1.0)
        return reg * n_obs[:, None, None] * eye
    return reg * eye


def _jit_bucket_sweep(cfg: SGDConfig, own_side: str, gram_dtype: str = "f32",
                      reg_scale: str = "absolute"):
    """``gram_dtype``: see :func:`_gram`; ``reg_scale``: :func:`_reg_diag`."""
    key = (cfg, own_side, gram_dtype, reg_scale)
    if key in _sweep_cache:
        return _sweep_cache[key]

    def sweep(own, other, entity_ids, other_ids, ratings, mask, mu):
        k = cfg.n_factors
        d = k + 1
        o_bias = bias_col(cfg, "item" if own_side == "user" else "user")
        o_const = const_col(cfg, "item" if own_side == "user" else "user")
        rows = other.at[other_ids].get(mode="promise_in_bounds")
        X = jnp.concatenate(
            [rows[..., :k], rows[..., o_const:o_const + 1]], axis=-1
        )
        y = (ratings - mu - rows[..., o_bias]) * mask
        Xm = X * mask[..., None]
        A = _gram(Xm, gram_dtype)
        A = A + _reg_diag(cfg.reg, mask, d, reg_scale)
        b = jnp.einsum("eld,el->ed", Xm, y,
                       preferred_element_type=jnp.float32)
        sol = solve_spd(A, b)
        own_b = bias_col(cfg, own_side)
        new_rows = own.at[entity_ids].get(mode="promise_in_bounds")
        new_rows = new_rows.at[:, :k].set(sol[:, :k])
        new_rows = new_rows.at[:, own_b].set(sol[:, k])
        return own.at[entity_ids].set(new_rows)

    fn = jax.jit(sweep, donate_argnums=(0,))
    _sweep_cache[key] = fn
    return fn


def ials_train_bucketed(
    params: MFParams,
    buckets_user: list,
    buckets_item: list,
    data: RatingBatches,
    cfg: SGDConfig,
    n_epochs: int,
    update_user_params: bool = True,
    update_item_params: bool = True,
    gram_dtype: str = "f32",
    reg_scale: str = "absolute",
) -> Tuple[MFParams, np.ndarray]:
    """Python-level epoch loop over per-bucket jitted sweeps (one compile
    per bucket shape; scales to heavy-tailed rating counts).
    ``gram_dtype='bf16'``: see :func:`_jit_bucket_sweep`; ``reg_scale``:
    see :func:`_reg_diag`."""
    if cfg.kernel != "linear":
        raise ValueError("factor ALS requires the linear kernel")
    if gram_dtype not in _GRAM_DTYPES:
        raise ValueError(f"gram_dtype must be one of {_GRAM_DTYPES}")
    if reg_scale not in _REG_SCALES:
        raise ValueError(f"reg_scale must be one of {_REG_SCALES}")
    mu = params.global_mean
    P, Q = params.user_features, params.item_features
    u_sweep = _jit_bucket_sweep(cfg, "user", gram_dtype, reg_scale)
    i_sweep = _jit_bucket_sweep(cfg, "item", gram_dtype, reg_scale)
    # data must be an ARGUMENT, not a closure: closed-over arrays embed as
    # program constants (a 25M-rating stream blows compile-request limits)
    rmse_fn = jax.jit(
        lambda p, d: jnp.sqrt(masked_sse(p, d, cfg) / max(data.n_real, 1))
    )
    hist = []
    for _ in range(n_epochs):
        if update_user_params:
            for b in buckets_user:
                P = u_sweep(P, Q, b.entity_ids, b.other_ids, b.ratings,
                            b.mask, mu)
        if update_item_params:
            for b in buckets_item:
                Q = i_sweep(Q, P, b.entity_ids, b.other_ids, b.ratings,
                            b.mask, mu)
        if cfg.compute_epoch_rmse:
            hist.append(float(rmse_fn(MFParams(P, Q, mu), data)))
        else:
            hist.append(0.0)
    return MFParams(P, Q, mu), np.asarray(hist, np.float32)


# ---------------------------------------------------------------------------
# Data-parallel ALS: entity solves sharded across the mesh
# ---------------------------------------------------------------------------


def _pad_bucket_for_mesh(b: Bucket, n_dev: int) -> Tuple[Bucket, np.ndarray]:
    """Pad a bucket's entity dim to a multiple of ``n_dev``.

    Pads repeat entity_ids[0] with a 0 keep-flag; the sharded sweep
    applies solutions additively under the keep mask, so duplicate pad
    ids contribute exact zeros."""
    E = b.entity_ids.shape[0]
    Ep = round_up(E, n_dev)
    keep = np.zeros(Ep, np.float32)
    keep[:E] = 1.0
    if Ep == E:
        return b, keep

    def pad(x, fill):
        out = np.full((Ep,) + x.shape[1:], fill, x.dtype)
        out[:E] = np.asarray(x)
        return jnp.asarray(out)

    return Bucket(
        pad(b.entity_ids, int(b.entity_ids[0])),
        pad(b.other_ids, 0),
        pad(b.ratings, 0.0),
        pad(b.mask, 0.0),
    ), keep


_dp_sweep_cache: dict = {}


def _jit_dp_bucket_sweep(cfg: SGDConfig, own_side: str, mesh,
                         gram_dtype: str = "f32",
                         reg_scale: str = "absolute"):
    """Sharded per-bucket sweep: each device solves E_b/n_dev entities
    (the nnz*d^2 gram FLOPs are what sharding buys); one small
    all_gather of the (E_b, d) solutions, applied identically on every
    device so the updated table stays replicated."""
    from jax.sharding import PartitionSpec
    from matrix_factorization_tpu.parallel.mesh import data_axes_of

    key = (cfg, own_side, mesh, gram_dtype, reg_scale)
    if key in _dp_sweep_cache:
        return _dp_sweep_cache[key]
    axes = data_axes_of(mesh)

    def local(own, other, entity_ids, other_ids, ratings, mask, keep, mu):
        k = cfg.n_factors
        d = k + 1
        o_bias = bias_col(cfg, "item" if own_side == "user" else "user")
        o_const = const_col(cfg, "item" if own_side == "user" else "user")
        rows = other.at[other_ids].get(mode="promise_in_bounds")
        X = jnp.concatenate(
            [rows[..., :k], rows[..., o_const:o_const + 1]], axis=-1
        )
        y = (ratings - mu - rows[..., o_bias]) * mask
        Xm = X * mask[..., None]
        A = _gram(Xm, gram_dtype)
        A = A + _reg_diag(cfg.reg, mask, d, reg_scale)
        b = jnp.einsum("eld,el->ed", Xm, y,
                       preferred_element_type=jnp.float32)
        sol = solve_spd(A, b)
        # gather every device's solutions; apply identically (replicated)
        sol_g = jax.lax.all_gather(sol, axes, axis=0, tiled=True)
        eids_g = jax.lax.all_gather(entity_ids, axes, axis=0, tiled=True)
        keep_g = jax.lax.all_gather(keep, axes, axis=0, tiled=True)
        own_b = bias_col(cfg, own_side)
        old = own.at[eids_g].get(mode="promise_in_bounds")
        delta = jnp.zeros_like(old)
        delta = delta.at[:, :k].set(sol_g[:, :k] - old[:, :k])
        delta = delta.at[:, own_b].set(sol_g[:, k] - old[:, own_b])
        return own.at[eids_g].add(delta * keep_g[:, None],
                                  mode="promise_in_bounds")

    shard = PartitionSpec(axes)
    rep = PartitionSpec()
    fn = jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(rep, rep, shard, shard, shard, shard, shard, rep),
        out_specs=rep,
        check_vma=False,
    ))
    _dp_sweep_cache[key] = fn
    return fn


def dp_ials_train_bucketed(
    params: MFParams,
    buckets_user: list,
    buckets_item: list,
    data: RatingBatches,
    cfg: SGDConfig,
    n_epochs: int,
    mesh,
    update_user_params: bool = True,
    update_item_params: bool = True,
    gram_dtype: str = "f32",
    reg_scale: str = "absolute",
) -> Tuple[MFParams, np.ndarray]:
    """Data-parallel bucketed iALS: both tables replicated, the per-
    entity normal-equation solves (the PFLOP-scale gram work) sharded
    over the mesh's data axes.  Per bucket the only collective is one
    all_gather of the (E_b, d) solutions.

    The reference has no ALS beyond the bias model and nothing
    distributed; this is the scale path for 100M-rating factor ALS."""
    if cfg.kernel != "linear":
        raise ValueError("factor ALS requires the linear kernel")
    from matrix_factorization_tpu.parallel.mesh import data_axes_of

    n_dev = 1
    for a in data_axes_of(mesh):
        n_dev *= mesh.shape[a]
    mu = params.global_mean
    P, Q = params.user_features, params.item_features
    if reg_scale not in _REG_SCALES:
        raise ValueError(f"reg_scale must be one of {_REG_SCALES}")
    u_sweep = _jit_dp_bucket_sweep(cfg, "user", mesh, gram_dtype, reg_scale)
    i_sweep = _jit_dp_bucket_sweep(cfg, "item", mesh, gram_dtype, reg_scale)
    bu = [_pad_bucket_for_mesh(b, n_dev) for b in buckets_user]
    bi = [_pad_bucket_for_mesh(b, n_dev) for b in buckets_item]
    rmse_fn = jax.jit(
        lambda p, d: jnp.sqrt(masked_sse(p, d, cfg) / max(data.n_real, 1))
    )
    hist = []
    for _ in range(n_epochs):
        if update_user_params:
            for b, keep in bu:
                P = u_sweep(P, Q, b.entity_ids, b.other_ids, b.ratings,
                            b.mask, jnp.asarray(keep), mu)
        if update_item_params:
            for b, keep in bi:
                Q = i_sweep(Q, P, b.entity_ids, b.other_ids, b.ratings,
                            b.mask, jnp.asarray(keep), mu)
        if cfg.compute_epoch_rmse:
            hist.append(float(rmse_fn(MFParams(P, Q, mu), data)))
        else:
            hist.append(0.0)
    return MFParams(P, Q, mu), np.asarray(hist, np.float32)


# ---------------------------------------------------------------------------
# Implicit feedback (confidence-weighted) ALS
# ---------------------------------------------------------------------------


def implicit_sweep(
    own: jax.Array,
    other: jax.Array,
    grouped: GroupedRatings,
    n_other_live: int,
    cfg: SGDConfig,
    alpha: float,
) -> jax.Array:
    """One implicit-ALS half-sweep (Hu/Koren/Volinsky 2008, "Collaborative
    Filtering for Implicit Feedback Datasets" — method shape only).

    Preferences are 1 for observed pairs, 0 elsewhere; confidences are
    ``c = 1 + alpha * strength``.  The normal equations over ALL items
    decompose as ``A_u = YᵀY + Σ_obs (c-1) y yᵀ + reg I`` and
    ``b_u = Σ_obs c y`` — the dense YᵀY gram is one MXU matmul shared by
    every entity, and only observed pairs need per-entity work.  Entities
    with no observations solve to exactly zero (the implicit prior).
    """
    k = cfg.n_factors
    Y = other[:n_other_live, :k]
    G = jnp.einsum("ik,if->kf", Y, Y, preferred_element_type=jnp.float32)
    rows = other.at[grouped.other_ids].get(
        mode="promise_in_bounds")[..., :k]  # (E, L, k)
    cm1 = (alpha * grouped.ratings) * grouped.mask  # c - 1, masked
    A = G[None] + jnp.einsum(
        "elk,elf->ekf", rows * cm1[..., None], rows,
        preferred_element_type=jnp.float32,
    )
    A = A + cfg.reg * jnp.eye(k, dtype=jnp.float32)[None]
    b = jnp.einsum("elk,el->ek", rows, (1.0 + cm1) * grouped.mask,
                   preferred_element_type=jnp.float32)
    sol = solve_spd(A, b)
    E = grouped.other_ids.shape[0]
    return own.at[:E, :k].set(sol)


def implicit_loss(
    P: jax.Array, Q: jax.Array, by_user: GroupedRatings,
    n_users: int, n_items: int, cfg: SGDConfig, alpha: float,
) -> jax.Array:
    """Exact confidence-weighted loss over ALL (user, item) pairs.

    ``Σ_all (x·y)²`` has the closed form ``Σ_u x_uᵀ (YᵀY) x_u``; observed
    pairs add ``c(1 - x·y)² - (x·y)²``.  Plus L2 on both tables."""
    k = cfg.n_factors
    X, Y = P[:n_users, :k], Q[:n_items, :k]
    G = jnp.einsum("ik,if->kf", Y, Y, preferred_element_type=jnp.float32)
    base = jnp.einsum("uk,kf,uf->", X, G, X,
                      preferred_element_type=jnp.float32)
    rows = Q.at[by_user.other_ids].get(mode="promise_in_bounds")[..., :k]
    xy = jnp.einsum("elk,ek->el", rows, X,
                    preferred_element_type=jnp.float32)
    c = 1.0 + alpha * by_user.ratings
    obs = by_user.mask * (c * (1.0 - xy) ** 2 - xy ** 2)
    l2 = cfg.reg * (jnp.sum(X * X) + jnp.sum(Y * Y))
    return base + jnp.sum(obs) + l2


def implicit_als_train(
    params: MFParams,
    by_user: GroupedRatings,
    by_item: GroupedRatings,
    cfg: SGDConfig,
    n_epochs: int,
    alpha: float = 40.0,
    update_user_params: bool = True,
    update_item_params: bool = True,
) -> Tuple[MFParams, jax.Array]:
    """Alternating implicit sweeps; returns (params, per-epoch loss).

    The rating values in ``by_*`` are interaction *strengths* (play
    counts, hours, clicks — any non-negative signal); predictions are
    preference scores in ~[0, 1], not ratings."""
    if cfg.kernel != "linear":
        raise ValueError("implicit ALS requires the linear kernel")
    n_users = by_user.other_ids.shape[0]
    n_items = by_item.other_ids.shape[0]

    def epoch(p: MFParams, _):
        P, Q = p.user_features, p.item_features
        if update_user_params:
            P = implicit_sweep(P, Q, by_user, n_items, cfg, alpha)
        if update_item_params:
            Q = implicit_sweep(Q, P, by_item, n_users, cfg, alpha)
        loss = (
            implicit_loss(P, Q, by_user, n_users, n_items, cfg, alpha)
            if cfg.compute_epoch_rmse else jnp.float32(0.0)
        )
        return MFParams(P, Q, p.global_mean), loss

    return jax.lax.scan(epoch, params, None, length=n_epochs)


_implicit_cache: dict = {}


def jit_implicit_als_train(cfg: SGDConfig, n_epochs: int, alpha: float,
                           update_user_params=True, update_item_params=True):
    key = (cfg, n_epochs, alpha, update_user_params, update_item_params)
    if key not in _implicit_cache:
        _implicit_cache[key] = jax.jit(
            lambda p, bu, bi: implicit_als_train(
                p, bu, bi, cfg, n_epochs, alpha, update_user_params,
                update_item_params,
            )
        )
    return _implicit_cache[key]


_ials_cache: dict = {}


def jit_ials_train(cfg: SGDConfig, n_epochs: int, update_user_params=True,
                   update_item_params=True, reg_scale="absolute"):
    key = (cfg, n_epochs, update_user_params, update_item_params, reg_scale)
    if key not in _ials_cache:
        _ials_cache[key] = jax.jit(
            lambda p, bu, bi, d: ials_train(
                p, bu, bi, d, cfg, n_epochs, update_user_params,
                update_item_params, reg_scale,
            )
        )
    return _ials_cache[key]
