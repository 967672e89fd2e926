"""Step variant C for the k=200 path: avoid the (bs, 256) delta perm by
recomputing the item-side gradient directly in item-sorted order from
two fresh table gathers (gathers measured ~3.8ns/row vs ~15ns for the
batch-local permutation in micro_k200b.py).

Run: PYTHONPATH=/root/repo python -u benchmarks/micro_k200c.py
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
    u_by_item = u_sorted[isort]  # user ids in item-sorted order
    i_tiles = i_sorted.reshape(T_I, S_I)
    i_base = np.minimum(i_tiles[:, 0], N_ITEMS - C_I).astype(np.int32)
    i_lidx = np.minimum(i_tiles - i_base[:, None], C_I - 1)

    P = jnp.asarray(rng.normal(size=(N_USERS, KP)).astype(np.float32))
    Q = jnp.asarray(rng.normal(size=(N_ITEMS, KP)).astype(np.float32))
    ij = jnp.asarray(i_rand)
    isort_j = jnp.asarray(isort)
    i_sorted_j = jnp.asarray(i_sorted)
    u_by_item_j = jnp.asarray(u_by_item)
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

    def step_C(Pt, Qt, i, r, ub, ul, sp, i_s, u_s, ib, il):
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
        aggu = jnp.einsum("tsc,tsk->tck", ohu,
                          (-0.01 * gP).reshape(T_U, S_U, KP),
                          preferred_element_type=jnp.float32)
        Pt = Pt.at[idxu.reshape(-1)].add(aggu.reshape(-1, KP),
                                         mode="promise_in_bounds")
        # item grad recomputed in item-sorted order: scalar perm + two
        # fresh row gathers instead of a (bs, 256) delta permutation
        eb_s = (err * base)[sp]
        w_s = jnp.float32(1.0)  # weights folded elsewhere in the real step
        pu_s = Pt.at[u_s].get(mode="promise_in_bounds")
        qi_s = Qt.at[i_s].get(mode="promise_in_bounds")
        gQ_s = eb_s[:, None] * pu_s + (0.005 * w_s) * qi_s
        ohi = (il[:, :, None]
               == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_I), 2)
               ).astype(jnp.float32)
        aggi = jnp.einsum("tsc,tsk->tck", ohi,
                          (-0.01 * gQ_s).reshape(T_I, S_I, KP),
                          preferred_element_type=jnp.float32)
        idxi = ib[:, None] + jnp.arange(C_I, dtype=jnp.int32)[None, :]
        Qt = Qt.at[idxi.reshape(-1)].add(aggi.reshape(-1, KP),
                                         mode="promise_in_bounds")
        return Pt, Qt, i, r, ub, ul, sp, i_s, u_s, ib, il
    step_c = make(step_C, 2)

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
    bench("step_C", step_c, P, Q, ij, r_tgt, u_base_j, u_lidx_j, isort_j,
          i_sorted_j, u_by_item_j, i_base_j, i_lidx_j,
          rows_per_iter=BS, base=base)


if __name__ == "__main__":
    main()
