"""Step variant D: kill the (bs, KP) delta permutation by recomputing
the secondary-side gradient in sorted order from PRE-update table
gathers (scalar perm of err*base + two fresh row gathers at ~3.8ns/row,
instead of materialize + permute at ~15ns/row).

micro_k200c.py's step_C tested this idea but gathered ``pu_s`` from the
POST-scatter P — semantically wrong for a synchronous minibatch (both
sides must see pre-update values) and it serialized the Q side behind
the P scatter (74ns/row).  Here every table read happens before any
scatter, so XLA can overlap freely.

FINDING (v5e): still loses, and by the same margin — 74.0 ns/row at
KP=256 (ship 34.5), 40.1 at KP=128 (ship 19.5).  Adding two per-row
table gathers costs ~+20ns/row EACH in step context, not the ~3.8ns an
isolated gather measures: with three random-gather streams plus two
scatters in flight, the row-op units saturate and the isolated-cost
model breaks down.  Conclusion: the (bs, KP) delta permutation is the
CHEAPEST way to reorder the secondary side; the shipped layout stands.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_k200d.py
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
    S_U, C_U = 512, 32
    S_I, C_I = 512, 288
    T_U, T_I = BS // S_U, BS // S_I
    NB = 16

    rng = np.random.default_rng(0)
    u_sorted = np.sort(rng.integers(0, 2048, BS).astype(np.int32))
    u_tiles = u_sorted.reshape(T_U, S_U)
    u_base = np.minimum(u_tiles[:, 0], N_USERS - C_U).astype(np.int32)
    u_lidx = u_tiles - u_base[:, None]
    i_rand = rng.integers(0, N_ITEMS, BS).astype(np.int32)
    isort = np.argsort(i_rand).astype(np.int32)
    i_sorted = i_rand[isort]
    u_by_item = u_sorted[isort]  # host-precomputable: u[sp]
    i_tiles = i_sorted.reshape(T_I, S_I)
    i_base = np.minimum(i_tiles[:, 0], N_ITEMS - C_I).astype(np.int32)
    i_lidx = np.minimum(i_tiles - i_base[:, None], C_I - 1)

    isort_j = jnp.asarray(isort)
    i_sorted_j = jnp.asarray(i_sorted)
    u_by_item_j = jnp.asarray(u_by_item)
    u_base_j = jnp.asarray(u_base)
    u_lidx_j = jnp.asarray(u_lidx)
    i_base_j = jnp.asarray(i_base)
    i_lidx_j = jnp.asarray(i_lidx)
    r_tgt = jnp.asarray(rng.uniform(1, 5, BS).astype(np.float32))

    def make(fn, n_state):
        def run(*args):
            def body(c, _):
                return fn(*c), None
            out, _ = jax.lax.scan(body, args, None, length=NB)
            return sum(jnp.sum(out[k].astype(jnp.float32))
                       for k in range(n_state))
        return jax.jit(run)

    null = make(lambda o: (o + 1.0,), 1)

    def bench(name, fn, *args, rows_per_iter, base=0.0):
        float(fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = max(best - base, 1e-9) / NB
        print(f"{name:14s} {per*1e6:9.1f} us/iter  "
              f"{per/rows_per_iter*1e9:7.2f} ns/row ({rows_per_iter} rows)",
              flush=True)
        return best

    base = bench("null", null, jnp.float32(0.0), rows_per_iter=1)

    for KP in (256, 128):
        P = jnp.asarray(rng.normal(size=(N_USERS, KP)).astype(np.float32))
        Q = jnp.asarray(rng.normal(size=(N_ITEMS, KP)).astype(np.float32))
        ij = jnp.asarray(i_rand)

        def step_B(Pt, Qt, i, r, ub, ul, sp, ib, il):
            """SHIPPED layout: P tile expand+agg; Q delta perm + tile
            scatter (micro_k200b.py step_B, re-timed here for a fair
            same-harness comparison)."""
            idxu = ub[:, None] + jnp.arange(C_U, dtype=jnp.int32)[None, :]
            blk = Pt.at[idxu.reshape(-1)].get(mode="promise_in_bounds")
            blk = blk.reshape(T_U, C_U, KP)
            ohu = (ul[:, :, None]
                   == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_U), 2)
                   ).astype(jnp.float32)
            pu = jnp.einsum("tsc,tck->tsk", ohu, blk,
                            preferred_element_type=jnp.float32
                            ).reshape(BS, KP)
            qi = Qt.at[i].get(mode="promise_in_bounds")
            x = 3.5 + jnp.sum(pu * qi, -1)
            sig = jax.nn.sigmoid(x)
            err = (0.5 + 4.5 * sig) - r
            bse = sig * (1 - sig)
            gP = (err * bse)[:, None] * qi + 0.005 * pu
            gQ = (err * bse)[:, None] * pu + 0.005 * qi
            aggu = jnp.einsum("tsc,tsk->tck", ohu,
                              (-0.01 * gP).reshape(T_U, S_U, KP),
                              preferred_element_type=jnp.float32)
            Pt = Pt.at[idxu.reshape(-1)].add(aggu.reshape(-1, KP),
                                             mode="promise_in_bounds")
            dQ = (-0.01 * gQ)[sp]
            ohi = (il[:, :, None]
                   == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_I), 2)
                   ).astype(jnp.float32)
            aggi = jnp.einsum("tsc,tsk->tck", ohi, dQ.reshape(T_I, S_I, KP),
                              preferred_element_type=jnp.float32)
            idxi = ib[:, None] + jnp.arange(C_I, dtype=jnp.int32)[None, :]
            Qt = Qt.at[idxi.reshape(-1)].add(aggi.reshape(-1, KP),
                                             mode="promise_in_bounds")
            return Pt, Qt, i, r, ub, ul, sp, ib, il

        def step_D(Pt, Qt, i, r, ub, ul, sp, i_s, u_s, ib, il):
            """No perm: secondary grad recomputed in sorted order from
            PRE-update gathers P[u_s], Q[i_s] + a scalar perm of
            err*base.  u_s = u[sp] is host-precomputed."""
            idxu = ub[:, None] + jnp.arange(C_U, dtype=jnp.int32)[None, :]
            blk = Pt.at[idxu.reshape(-1)].get(mode="promise_in_bounds")
            blk = blk.reshape(T_U, C_U, KP)
            ohu = (ul[:, :, None]
                   == jax.lax.broadcasted_iota(jnp.int32, (1, 1, C_U), 2)
                   ).astype(jnp.float32)
            pu = jnp.einsum("tsc,tck->tsk", ohu, blk,
                            preferred_element_type=jnp.float32
                            ).reshape(BS, KP)
            qi = Qt.at[i].get(mode="promise_in_bounds")
            # PRE-update reads for the sorted-order recompute
            pu_s = Pt.at[u_s].get(mode="promise_in_bounds")
            qi_s = Qt.at[i_s].get(mode="promise_in_bounds")
            x = 3.5 + jnp.sum(pu * qi, -1)
            sig = jax.nn.sigmoid(x)
            err = (0.5 + 4.5 * sig) - r
            bse = sig * (1 - sig)
            gP = (err * bse)[:, None] * qi + 0.005 * pu
            aggu = jnp.einsum("tsc,tsk->tck", ohu,
                              (-0.01 * gP).reshape(T_U, S_U, KP),
                              preferred_element_type=jnp.float32)
            Pt = Pt.at[idxu.reshape(-1)].add(aggu.reshape(-1, KP),
                                             mode="promise_in_bounds")
            eb_s = (err * bse)[sp]  # 1-lane perm
            gQ_s = eb_s[:, None] * pu_s + 0.005 * qi_s
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

        step_b = make(step_B, 2)
        step_d = make(step_D, 2)
        print(f"--- KP={KP}")
        bench("step_B(ship)", step_b, P, Q, ij, r_tgt, u_base_j, u_lidx_j,
              isort_j, i_base_j, i_lidx_j, rows_per_iter=BS, base=base)
        bench("step_D(noperm)", step_d, P, Q, ij, r_tgt, u_base_j, u_lidx_j,
              isort_j, i_sorted_j, u_by_item_j, i_base_j, i_lidx_j,
              rows_per_iter=BS, base=base)


if __name__ == "__main__":
    main()
