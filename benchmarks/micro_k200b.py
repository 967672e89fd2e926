"""Round 2 of the k=200 microbenchmarks: loop-carried (non-hoistable)
variants of the primitives, plus full-step candidates.

micro_k200.py's isolated gather/perm numbers were loop-invariant and got
hoisted out of the scan; here every op consumes the carried state so the
compiler must re-execute it per iteration.

Run: PYTHONPATH=/root/repo python -u benchmarks/micro_k200b.py
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
    S_U, C_U = 512, 32
    S_I, C_I = 512, 288
    T_U, T_I = BS // S_U, BS // S_I

    rng = np.random.default_rng(0)
    u_sorted = np.sort(rng.integers(0, 2048, BS).astype(np.int32))
    u_tiles = u_sorted.reshape(T_U, S_U)
    u_base = np.minimum(u_tiles[:, 0], N_USERS - C_U).astype(np.int32)
    u_lidx = u_tiles - u_base[:, None]
    i_rand = rng.integers(0, N_ITEMS, BS).astype(np.int32)
    isort = np.argsort(i_rand).astype(np.int32)
    i_sorted = i_rand[isort]
    i_tiles = i_sorted.reshape(T_I, S_I)
    i_base = np.minimum(i_tiles[:, 0], N_ITEMS - C_I).astype(np.int32)
    i_lidx = np.minimum(i_tiles - i_base[:, None], C_I - 1)

    P = jnp.asarray(rng.normal(size=(N_USERS, KP)).astype(np.float32))
    Q = jnp.asarray(rng.normal(size=(N_ITEMS, KP)).astype(np.float32))
    Qb = Q.astype(jnp.bfloat16)
    rows = jnp.asarray(rng.normal(size=(BS, KP)).astype(np.float32))
    uj = jnp.asarray(rng.integers(0, N_USERS, BS).astype(np.int32))
    ij = jnp.asarray(i_rand)
    isort_j = jnp.asarray(isort)
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
            return sum(jnp.sum(out[k].astype(jnp.float32))
                       for k in range(n_state))
        return jax.jit(run)

    null = make(lambda o: (o + 1.0,), 1)
    # gather rows that depend on the carried table (t is updated each iter)
    g_real = make(
        lambda t, i: (t.at[i].get(mode="promise_in_bounds")
                      .sum(0, keepdims=True) * 1e-9 + t, i), 1)
    # permute carried rows (the (bs,256) delta permutation, real)
    perm_real = make(lambda r, p: (r[p], p), 1)
    s_plain_f32 = make(
        lambda t, i, r: (t.at[i].add(r, mode="promise_in_bounds"), i, r), 1)
    s_plain_bf16 = make(
        lambda t, i, r: (t.at[i].add(r.astype(jnp.bfloat16),
                                     mode="promise_in_bounds"), i, r), 1)
    g_row_bf16 = make(
        lambda t, i: ((t.at[i].get(mode="promise_in_bounds")
                       .astype(jnp.float32).sum(0, keepdims=True) * 1e-9
                       ).astype(t.dtype) + t, i), 1)

    def step_B(Pt, Qt, i, r, ub, ul, sp, ib, il):
        """user-sorted storage; P tile expand+agg; Q perm + tile scatter."""
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
        dQ = (-0.01 * gQ)[sp]  # to item-sorted order
        ohi = (il[:, :, None]
               == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_I), 2)
               ).astype(jnp.float32)
        aggi = jnp.einsum("tsc,tsk->tck", ohi, dQ.reshape(T_I, S_I, KP),
                          preferred_element_type=jnp.float32)
        idxi = ib[:, None] + jnp.arange(C_I, dtype=jnp.int32)[None, :]
        Qt = Qt.at[idxi.reshape(-1)].add(aggi.reshape(-1, KP),
                                         mode="promise_in_bounds")
        return Pt, Qt, i, r, ub, ul, sp, ib, il
    step_b = make(step_B, 2)

    def step_Qbf16(Pt, Qt, i, r, ub, ul):
        """new layout with Q stored bf16 (f32 compute, bf16 scatter-add)."""
        idxu = ub[:, None] + jnp.arange(C_U, dtype=jnp.int32)[None, :]
        blk = Pt.at[idxu.reshape(-1)].get(mode="promise_in_bounds")
        blk = blk.reshape(T_U, C_U, KP)
        ohu = (ul[:, :, None]
               == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_U), 2)
               ).astype(jnp.float32)
        pu = jnp.einsum("tsc,tck->tsk", ohu, blk,
                        preferred_element_type=jnp.float32).reshape(BS, KP)
        qi = Qt.at[i].get(mode="promise_in_bounds").astype(jnp.float32)
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
        Qt = Qt.at[i].add((-0.01 * gQ).astype(jnp.bfloat16),
                          mode="promise_in_bounds")
        return Pt, Qt, i, r, ub, ul
    step_qbf16 = make(step_Qbf16, 2)

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

    base = bench("null", null, jnp.float32(0.0), rows_per_iter=1)
    bench("g_real_Q", g_real, Q, ij, rows_per_iter=BS, base=base)
    bench("g_real_Qbf16", g_row_bf16, Qb, ij, rows_per_iter=BS, base=base)
    bench("perm_real", perm_real, rows, isort_j, rows_per_iter=BS, base=base)
    bench("s_plain_f32", s_plain_f32, Q, ij, rows, rows_per_iter=BS, base=base)
    bench("s_plain_bf16", s_plain_bf16, Qb, ij, rows, rows_per_iter=BS,
          base=base)
    bench("step_B", step_b, P, Q, ij, r_tgt, u_base_j, u_lidx_j, isort_j,
          i_base_j, i_lidx_j, rows_per_iter=BS, base=base)
    bench("step_Qbf16", step_qbf16, P, Qb, ij, r_tgt, u_base_j, u_lidx_j,
          rows_per_iter=BS, base=base)


if __name__ == "__main__":
    main()
