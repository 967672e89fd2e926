"""Microbenchmarks for the k=200 (256-lane) SGD row-op candidates.

Config 3 (ML-25M, k=200) is the slowest BASELINE config: at 256-lane rows
the per-row gathers are no longer ~free and the batch-internal
permutation gather of delta rows costs as much as a table gather.  This
bench measures every candidate primitive for the redesigned wide-row
step at the exact config-3 tile shapes chosen by ``pack_ratings``
(order='user': agg_user=(512, 32), agg_item=(512, 288)).

Run: PYTHONPATH=/root/repo python -u benchmarks/micro_k200.py
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    BS = 131_072
    N_USERS = 162_000
    N_ITEMS = 59_392
    KP = 256
    S_U, C_U = 512, 32     # user tiles (chunk-sorted side)
    S_I, C_I = 512, 288    # item tiles (in-batch sorted side)
    T_U, T_I = BS // S_U, BS // S_I

    rng = np.random.default_rng(0)
    # user ids: narrow window per batch (chunk-sorted) -> tile span < C_U
    u_sorted = np.sort(rng.integers(0, 2048, BS).astype(np.int32))
    u_tiles = u_sorted.reshape(T_U, S_U)
    u_base = np.minimum(u_tiles[:, 0], N_USERS - C_U).astype(np.int32)
    u_lidx = u_tiles - u_base[:, None]
    assert u_lidx.max() < C_U
    # item ids: random over the catalog; item-sorted view for the agg path
    i_rand = rng.integers(0, N_ITEMS, BS).astype(np.int32)
    i_sorted = np.sort(i_rand)
    # fake per-tile bases with span <= C_I (real packs guarantee this)
    i_tiles = i_sorted.reshape(T_I, S_I)
    i_base = np.minimum(i_tiles[:, 0], N_ITEMS - C_I).astype(np.int32)
    i_lidx = np.minimum(i_tiles - i_base[:, None], C_I - 1)

    P = jnp.asarray(rng.normal(size=(N_USERS, KP)).astype(np.float32))
    Q = jnp.asarray(rng.normal(size=(N_ITEMS, KP)).astype(np.float32))
    rows = jnp.asarray(rng.normal(size=(BS, KP)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(BS).astype(np.int32))
    uj = jnp.asarray(rng.integers(0, N_USERS, BS).astype(np.int32))
    ij = jnp.asarray(i_rand)
    u_base_j = jnp.asarray(u_base)
    u_lidx_j = jnp.asarray(u_lidx)
    i_base_j = jnp.asarray(i_base)
    i_lidx_j = jnp.asarray(i_lidx)
    r_tgt = jnp.asarray(rng.uniform(1, 5, BS).astype(np.float32))

    NB = 16

    def make(fn, n_state):
        def run(*args):
            def body(c, _):
                return fn(*c), None
            out, _ = jax.lax.scan(body, args, None, length=NB)
            return sum(jnp.sum(out[k]) for k in range(n_state)
                       if out[k].dtype == jnp.float32)
        return jax.jit(run)

    null = make(lambda o: (o + 1.0,), 1)
    g_row_u = make(
        lambda o, t, i: (o + t.at[i].get(mode="promise_in_bounds").sum(0), t, i), 1)
    g_row_i = g_row_u
    s_plain = make(
        lambda t, i, r: (t.at[i].add(r, mode="promise_in_bounds"), i, r), 1)
    permute = make(lambda o, r, p: (o + r[p].sum(0), r, p), 1)

    def g_expand_fn(o, t, base, lidx):
        # block gather (T, C, KP) + one-hot expand on the MXU
        T, S = lidx.shape
        C = C_U if S == S_U and lidx.shape == u_lidx_j.shape else C_I
        idx = base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
        blk = t.at[idx.reshape(-1)].get(mode="promise_in_bounds")
        blk = blk.reshape(T, C, KP)
        oh = (lidx[:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
              ).astype(jnp.float32)
        out = jnp.einsum("tsc,tck->tsk", oh, blk,
                         preferred_element_type=jnp.float32)
        return o + out.sum((0, 1)), t, base, lidx
    g_expand_u = make(g_expand_fn, 1)

    def agg_fn(dtype):
        def f(t, base, lidx, r):
            T, S = lidx.shape
            C = C_I
            oh = (lidx[:, :, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
                  ).astype(dtype)
            agg = jnp.einsum("tsc,tsk->tck", oh,
                             r.reshape(T, S, KP).astype(dtype),
                             preferred_element_type=jnp.float32)
            idx = base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
            t = t.at[idx.reshape(-1)].add(agg.reshape(-1, KP),
                                          mode="promise_in_bounds")
            return t, base, lidx, r
        return f
    agg_i_f32 = make(agg_fn(jnp.float32), 1)
    agg_i_bf16 = make(agg_fn(jnp.bfloat16), 1)

    # current full step at config-3 shapes (sigmoid kernel, both sides,
    # per-row gathers + perm + both tile scatters) for calibration
    def step_cur(Pt, Qt, u, i, r, up, ub, ul, ib, il):
        pu = Pt.at[u].get(mode="promise_in_bounds")
        qi = Qt.at[i].get(mode="promise_in_bounds")
        x = 3.5 + jnp.sum(pu * qi, -1)
        sig = jax.nn.sigmoid(x)
        err = (0.5 + 4.5 * sig) - r
        base = sig * (1 - sig)
        gP = (err * base)[:, None] * qi + 0.005 * pu
        gQ = (err * base)[:, None] * pu + 0.005 * qi
        # user: perm to user-sorted then tile scatter
        dP = (-0.01 * gP)[up]
        ohu = (ul[:, :, None]
               == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_U), 2)
               ).astype(jnp.float32)
        aggu = jnp.einsum("tsc,tsk->tck", ohu, dP.reshape(T_U, S_U, KP),
                          preferred_element_type=jnp.float32)
        idxu = ub[:, None] + jnp.arange(C_U, dtype=jnp.int32)[None, :]
        Pt = Pt.at[idxu.reshape(-1)].add(aggu.reshape(-1, KP),
                                         mode="promise_in_bounds")
        ohi = (il[:, :, None]
               == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_I), 2)
               ).astype(jnp.float32)
        aggi = jnp.einsum("tsc,tsk->tck", ohi, (-0.01 * gQ).reshape(T_I, S_I, KP),
                          preferred_element_type=jnp.float32)
        idxi = ib[:, None] + jnp.arange(C_I, dtype=jnp.int32)[None, :]
        Qt = Qt.at[idxi.reshape(-1)].add(aggi.reshape(-1, KP),
                                         mode="promise_in_bounds")
        return Pt, Qt, u, i, r, up, ub, ul, ib, il
    step_current = make(step_cur, 2)

    # NEW candidate step: batch stored user-sorted; pu via tile expand;
    # qi per-row gather; user tile scatter (no perm); item plain scatter
    def step_new(Pt, Qt, i, r, ub, ul):
        idxu = ub[:, None] + jnp.arange(C_U, dtype=jnp.int32)[None, :]
        blk = Pt.at[idxu.reshape(-1)].get(mode="promise_in_bounds")
        blk = blk.reshape(T_U, C_U, KP)
        ohu = (ul[:, :, None]
               == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_U), 2)
               ).astype(jnp.float32)
        pu = jnp.einsum("tsc,tck->tsk", ohu, blk,
                        preferred_element_type=jnp.float32).reshape(BS, KP)
        qi = Qt.at[i].get(mode="promise_in_bounds")
        x = 3.5 + jnp.sum(pu * qi, -1)
        sig = jax.nn.sigmoid(x)
        err = (0.5 + 4.5 * sig) - r
        base = sig * (1 - sig)
        gP = (err * base)[:, None] * qi + 0.005 * pu
        gQ = (err * base)[:, None] * pu + 0.005 * qi
        aggu = jnp.einsum("tsc,tsk->tck", ohu,
                          (-0.01 * gP).reshape(T_U, S_U, KP),
                          preferred_element_type=jnp.float32)
        Pt = Pt.at[idxu.reshape(-1)].add(aggu.reshape(-1, KP),
                                         mode="promise_in_bounds")
        Qt = Qt.at[i].add(-0.01 * gQ, mode="promise_in_bounds")
        return Pt, Qt, i, r, ub, ul
    step_usersorted = make(step_new, 2)

    def bench(name, fn, *args, rows_per_iter, base=0.0):
        float(fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = max(best - base, 1e-9) / NB
        print(f"{name:14s} {per*1e6:9.1f} us/iter  "
              f"{per/rows_per_iter*1e9:7.2f} ns/row ({rows_per_iter} rows)")
        return best

    o = jnp.zeros((KP,), jnp.float32)
    base = bench("null", null, jnp.float32(0.0), rows_per_iter=1)
    bench("g_row_P", g_row_u, o, P, uj, rows_per_iter=BS, base=base)
    bench("g_row_Q", g_row_i, o, Q, ij, rows_per_iter=BS, base=base)
    bench("s_plain_Q", s_plain, Q, ij, rows, rows_per_iter=BS, base=base)
    bench("perm_bs", permute, o, rows, perm, rows_per_iter=BS, base=base)
    bench("g_expand_u", g_expand_u, o, P, u_base_j, u_lidx_j,
          rows_per_iter=BS, base=base)
    bench("agg_i_f32", agg_i_f32, Q, i_base_j, i_lidx_j, rows,
          rows_per_iter=BS, base=base)
    bench("agg_i_bf16", agg_i_bf16, Q, i_base_j, i_lidx_j, rows,
          rows_per_iter=BS, base=base)
    bench("step_current", step_current, P, Q, uj, ij, r_tgt, perm,
          u_base_j, u_lidx_j, i_base_j, i_lidx_j, rows_per_iter=BS, base=base)
    bench("step_newlayout", step_usersorted, P, Q, ij, r_tgt,
          u_base_j, u_lidx_j, rows_per_iter=BS, base=base)


if __name__ == "__main__":
    main()
