"""Tile-shape (S, C) sweep for the shipped k=200 step layout.

The pack-time cost model caps tile span at ``c_max=512``, which excludes
larger secondary tiles (S_I=1024 needs C_I~544 for random items over a
59k catalog).  This sweeps (S_U, C_U) x (S_I, C_I) combinations of the
SHIPPED step (micro_k200d.py step_B) to check whether bigger tiles —
fewer, wider scatter blocks — beat the model's pick on-chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_k200e.py
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
    NB = 16

    rng = np.random.default_rng(0)
    u_sorted = np.sort(rng.integers(0, 2048, BS).astype(np.int32))
    i_rand = rng.integers(0, N_ITEMS, BS).astype(np.int32)
    isort = np.argsort(i_rand).astype(np.int32)
    i_sorted = i_rand[isort]

    P = jnp.asarray(rng.normal(size=(N_USERS, KP)).astype(np.float32))
    Q = jnp.asarray(rng.normal(size=(N_ITEMS, KP)).astype(np.float32))
    ij = jnp.asarray(i_rand)
    isort_j = jnp.asarray(isort)
    r_tgt = jnp.asarray(rng.uniform(1, 5, BS).astype(np.float32))

    def tile_meta(ids_sorted, S, C, max_id):
        T = BS // S
        tiles = ids_sorted.reshape(T, S)
        span = int((tiles[:, -1] - tiles[:, 0]).max()) + 1
        assert span <= C, f"S={S} needs C>={span}"
        base = np.minimum(tiles[:, 0], max_id + 1 - C).astype(np.int32)
        lidx = np.minimum(tiles - base[:, None], C - 1)
        return jnp.asarray(base), jnp.asarray(lidx)

    def make(fn, n_state):
        def run(*args):
            def body(c, _):
                return fn(*c), None
            out, _ = jax.lax.scan(body, args, None, length=NB)
            return sum(jnp.sum(out[k].astype(jnp.float32))
                       for k in range(n_state))
        return jax.jit(run)

    null = make(lambda o: (o + 1.0,), 1)

    def bench(name, fn, *args, base=0.0):
        float(fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = max(best - base, 1e-9) / NB
        print(f"{name:28s} {per*1e6:9.1f} us/iter  "
              f"{per/BS*1e9:7.2f} ns/row", flush=True)
        return best

    base = bench("null", null, jnp.float32(0.0))

    def build_step(S_U, C_U, S_I, C_I):
        T_U, T_I = BS // S_U, BS // S_I

        def step(Pt, Qt, i, r, ub, ul, sp, ib, il):
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

        return make(step, 2)

    COMBOS = [
        (512, 32, 512, 288),     # shipped (model's pick, c_max=512)
        (1024, 32, 512, 288),    # bigger primary tiles
        (512, 32, 1024, 544),    # bigger secondary tiles (over c_max)
        (1024, 32, 1024, 544),
        (512, 32, 2048, 1056),   # much bigger secondary
    ]
    for S_U, C_U, S_I, C_I in COMBOS:
        ub, ul = tile_meta(u_sorted, S_U, C_U, N_USERS - 1)
        ib, il = tile_meta(i_sorted, S_I, C_I, N_ITEMS - 1)
        fn = build_step(S_U, C_U, S_I, C_I)
        bench(f"S_U={S_U} C_U={C_U} S_I={S_I} C_I={C_I}",
              fn, P, Q, ij, r_tgt, ub, ul, isort_j, ib, il, base=base)


if __name__ == "__main__":
    main()
