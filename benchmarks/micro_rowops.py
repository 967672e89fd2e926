"""Microbenchmarks of the row-op primitives that bound SGD throughput.

Each candidate runs NB iterations inside ONE jitted scan and returns a
single scalar (axon host fetches are tunnel round-trips — one per call).
A null benchmark measures harness overhead to subtract.  Absolute times
move +-2x with tunnel load; compare RATIOS within one run, and calibrate
against the `step` row (the real minibatch step used by bench.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/micro_rowops.py
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
    N_ITEMS = 20_000
    KP = 128
    T, S = 128, BS // 128  # tiles x entries-per-tile (S=1024)
    C = 512  # one-hot width per tile

    rng = np.random.default_rng(0)
    ids = rng.integers(0, N_ITEMS, BS).astype(np.int32)
    ids_sorted = np.sort(ids)
    tile_ids = ids_sorted.reshape(T, S)
    bases = tile_ids[:, 0]
    span = int((tile_ids[:, -1] - tile_ids[:, 0]).max())
    print(f"max tile span: {span} (C={C})")
    lidx = tile_ids - bases[:, None]

    tbl = jnp.asarray(rng.normal(size=(N_ITEMS, KP)).astype(np.float32))
    small = jnp.asarray(rng.normal(size=(1024, KP)).astype(np.float32))
    rows = jnp.asarray(rng.normal(size=(BS, KP)).astype(np.float32))
    trows = rows.reshape(T, S, KP)
    ids_j = jnp.asarray(ids)
    ids_small = jnp.asarray(ids % 1024)
    ids_sorted_j = jnp.asarray(ids_sorted)
    lidx_j = jnp.asarray(lidx)
    B = 512
    tbl3 = tbl[: (N_ITEMS // B) * B].reshape(-1, B, KP)
    blk_idx = jnp.asarray((bases // B).astype(np.int32))
    blkrows = jnp.asarray(rng.normal(size=(T, C, KP)).astype(np.float32))
    bases_safe = jnp.asarray(np.minimum(bases, N_ITEMS - C).astype(np.int32))

    NB = 16

    def make(fn, n_state):
        """scan NB iterations of fn over carried state; return one scalar."""
        def run(*args):
            def body(c, _):
                return fn(*c), None
            out, _ = jax.lax.scan(body, args, None, length=NB)
            return sum(jnp.sum(out[k]) for k in range(n_state)
                       if out[k].dtype == jnp.float32)
        return jax.jit(run)

    # --- candidates (state element 0 is what the op produces) --------------
    null = make(lambda o: (o + 1.0,), 1)

    g_big = make(
        lambda o, t, i: (o + t.at[i].get(mode="promise_in_bounds").sum(0), t, i), 1)
    g_small = g_big
    g_blocks = make(
        lambda o, t3, b: (o + t3.at[b].get(mode="promise_in_bounds").sum((0, 1)),
                          t3, b), 1)
    s_big = make(
        lambda t, i, r: (t.at[i].add(r, mode="promise_in_bounds"), i, r), 1)
    s_small = s_big
    s_sorted = make(
        lambda t, i, r: (t.at[i].add(r, mode="promise_in_bounds",
                                     indices_are_sorted=True), i, r), 1)
    s_blocks = make(
        lambda t, b, br: (t.at[(b[:, None] + jnp.arange(C)[None, :]).reshape(-1)]
                          .add(br.reshape(-1, KP), mode="promise_in_bounds"),
                          b, br), 1)

    def onehot_fn(o, li, tr):
        oh = (li[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.float32)
        agg = jnp.einsum("tsc,tsk->tck", oh, tr,
                         preferred_element_type=jnp.float32)
        exp = jnp.einsum("tsc,tck->tsk", oh, agg,
                         preferred_element_type=jnp.float32)
        return o + exp.sum((0, 1)).sum() + agg.sum((0, 1)).sum(), li, tr
    onehot = make(onehot_fn, 1)

    # the real minibatch step (linear kernel shape, both sides)
    utbl = jnp.asarray(rng.normal(size=(10_000, KP)).astype(np.float32))
    uids = jnp.asarray(rng.integers(0, 10_000, BS).astype(np.int32))
    r_tgt = jnp.asarray(rng.uniform(1, 5, BS).astype(np.float32))

    def step_fn(P, Q, u, i, r):
        pu = P.at[u].get(mode="promise_in_bounds")
        qi = Q.at[i].get(mode="promise_in_bounds")
        err = (3.5 + jnp.sum(pu * qi, -1)) - r
        gP = err[:, None] * qi + 0.005 * pu
        gQ = err[:, None] * pu + 0.005 * qi
        P = P.at[u].add(-0.002 * gP, mode="promise_in_bounds")
        Q = Q.at[i].add(-0.002 * gQ, mode="promise_in_bounds")
        return P, Q, u, i, r
    step = make(step_fn, 2)

    def bench(name, fn, *args, rows_per_iter, base=0.0):
        float(fn(*args))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = max(best - base, 1e-9) / NB
        print(f"{name:10s} {per*1e6:9.1f} us/iter  "
              f"{per/rows_per_iter*1e9:7.2f} ns/row ({rows_per_iter} rows)")
        return best

    o = jnp.zeros((KP,), jnp.float32)
    base = bench("null", null, jnp.float32(0.0), rows_per_iter=1)
    bench("g_big", g_big, o, tbl, ids_j, rows_per_iter=BS, base=base)
    bench("g_small", g_small, o, small, ids_small, rows_per_iter=BS, base=base)
    bench("g_blocks", g_blocks, o, tbl3, blk_idx, rows_per_iter=T, base=base)
    bench("s_big", s_big, tbl, ids_j, rows, rows_per_iter=BS, base=base)
    bench("s_small", s_small, small, ids_small, rows, rows_per_iter=BS, base=base)
    bench("s_sorted", s_sorted, tbl, ids_sorted_j, rows, rows_per_iter=BS,
          base=base)
    bench("s_blocks", s_blocks, tbl, bases_safe, blkrows, rows_per_iter=T * C,
          base=base)
    bench("onehot", onehot, o, lidx_j, trows, rows_per_iter=BS, base=base)
    bench("step", step, utbl, tbl, uids, ids_j, r_tgt, rows_per_iter=BS,
          base=base)


if __name__ == "__main__":
    main()
