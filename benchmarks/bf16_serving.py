"""bf16-resident catalog serving: measure the HBM-bandwidth win on-chip.

Catalog scoring is Q-streaming bound (``benchmarks/pallas_vs_xla.py``
measured the f32 path at ~640-1090 effective GB/s vs the v5e 819GB/s
roof), so storing the item table in bf16 halves the streamed bytes —
the candidate ~2x for batch serving.  The MXU accumulates in f32 either
way (on v5e XLA's default f32 matmul already feeds bf16 operands to the
MXU — ``benchmarks/ials_bf16.py`` — so the DOT results barely move; the
quality question is only the bf16 rounding of the stored table values).

Methodology is pallas_vs_xla.py's RTT-cancelling two-window scan timing
(per-pass time = (t_2M - t_M) / M, distinct user blocks so nothing
hoists).  For each combo also reports top-64 agreement and max |score
diff| between the f32- and bf16-resident paths on the same data.

Reference counterpart being accelerated: the full-catalog ``recommend``
scan (``/root/reference/matrix_factorization/recommender_base.py:253-254``).
"""

import argparse
import json
import time

import numpy as np


M = 128
N_ITEMS = 100_000
TRIALS = 5
K_AGREE = 64


def combos():
    out = []
    for nf in (64, 200):
        for kernel in ("linear", "sigmoid", "rbf"):
            for B in (1, 256):
                out.append((nf, kernel, B))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--compile-only", action="store_true")
    p.add_argument("--shard", default="0/1")
    a = p.parse_args()
    si, sn = (int(x) for x in a.shard.split("/"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd
    from matrix_factorization_tpu.ops.scoring import score_catalog

    rng = np.random.default_rng(0)
    for idx, (nf, kernel, B) in enumerate(combos()):
        if idx % sn != si:
            continue
        cfg = SGDConfig(kernel=kernel, n_factors=nf, gamma=1.0 / nf)
        kp = cfg.padded_factors
        Q = np.zeros((N_ITEMS, kp), np.float32)
        Q[:, :nf] = rng.normal(0, 0.3, (N_ITEMS, nf))
        if kernel != "rbf":
            Q[:, sgd.const_col(cfg, "item")] = 1.0
            Q[:, sgd.bias_col(cfg, "item")] = rng.normal(0, 0.2, N_ITEMS)
        Qd = jnp.asarray(Q)
        Qb = jnp.asarray(Q, jnp.bfloat16)
        mu = jnp.float32(3.5)
        pus = np.zeros((2 * M, B, kp), np.float32)
        pus[:, :, :nf] = rng.normal(0, 0.3, (2 * M, B, nf))
        if kernel != "rbf":
            pus[:, :, sgd.const_col(cfg, "user")] = 1.0
        pud = jnp.asarray(pus)
        pud_short = pud[:M]

        def timed(Qres, cast):
            def step(carry, pu):
                pu = pu.astype(jnp.bfloat16) if cast else pu
                return carry + jnp.sum(score_catalog(cfg, mu, pu, Qres)), None

            run = jax.jit(
                lambda ps: jax.lax.scan(step, jnp.float32(0), ps)[0]
            )
            t0 = time.perf_counter()
            float(run(pud_short))
            float(run(pud))
            warm_s = time.perf_counter() - t0
            if a.compile_only:
                return warm_s
            ts = []
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                float(run(pud_short))
                t1 = time.perf_counter()
                float(run(pud))
                t2 = time.perf_counter()
                ts.append(((t2 - t1) - (t1 - t0)) / M)
            return float(np.median(ts))

        t32 = timed(Qd, cast=False)
        t16 = timed(Qb, cast=True)
        rec = {"kernel": kernel, "n_factors": nf, "B": B}
        if a.compile_only:
            rec.update({"warm_f32_s": round(t32, 1),
                        "warm_bf16_s": round(t16, 1)})
            print(json.dumps(rec), flush=True)
            continue

        # quality: same user block scored both ways, on device
        @jax.jit
        def both(pu):
            s32 = score_catalog(cfg, mu, pu, Qd)
            s16 = score_catalog(cfg, mu, pu.astype(jnp.bfloat16), Qb)
            v32, i32 = jax.lax.top_k(s32, K_AGREE)
            v16, i16 = jax.lax.top_k(s16, K_AGREE)
            return jnp.max(jnp.abs(s32 - s16)), i32, i16

        dmax, i32, i16 = both(pud[0])
        agree = np.mean([
            len(set(np.asarray(i32)[b]) & set(np.asarray(i16)[b])) / K_AGREE
            for b in range(B)
        ])
        bytes32 = N_ITEMS * kp * 4
        rec.update({
            "xla_f32_us": round(t32 * 1e6, 1),
            "bf16_us": round(t16 * 1e6, 1),
            "speedup": round(t32 / t16, 3),
            "f32_GBps": round(bytes32 / t32 / 1e9, 0),
            "bf16_eff_GBps": round(bytes32 / 2 / t16 / 1e9, 0),
            "max_score_diff": float(dmax),
            f"top{K_AGREE}_agree": round(float(agree), 4),
        })
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
