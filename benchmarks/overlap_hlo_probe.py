"""Compiler-level evidence for the overlap_psum claim (VERDICT r3 #10).

One real chip cannot time a multi-chip collective, so the round-3 claim
("up to ~16% of the step if the compiler hides the all-reduce") rested
on the comm-volume model alone.  This probe adds the strongest evidence
this image allows: it lowers BOTH schedules of the dp tiled trainer on
the virtual 8-device mesh at several local batch sizes and inspects the
OPTIMIZED HLO's dataflow —

* ``deps``: does the all-reduce's operand come from the loop CARRY
  (a ``get-tuple-element``/``parameter`` chain — the deferred schedule:
  the collective has no producer inside the current window, so a
  latency-hiding scheduler is FREE to start it before/behind the
  window's compute) or from the window's own gradient chain (the
  synchronous schedule: the collective cannot start until the window's
  scatters finish)?
* ``consumers``: in the synchronous schedule the all-reduce feeds the
  SAME iteration's table update that the next window reads; deferred,
  its only consumer is the carry tuple.
* ``n_allreduce``: windows (psum_every=T) divide the per-epoch
  all-reduce count by T — the amortization is visible in the op count.

On a real TPU backend these dataflow facts are exactly what XLA's
latency-hiding scheduler keys on when it splits collectives into
async start/done pairs (the CPU backend lowers collectives
synchronously, so pair placement itself cannot be shown here — the
dataflow freedom is the transferable evidence).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/overlap_hlo_probe.py
"""

from __future__ import annotations

import json
import re


def _op_of(defline: str) -> str:
    """HLO opcode of a definition line '  %name = type opcode(...)'."""
    m = re.search(r"=\s+\S+\s+([a-z0-9\-]+)\(", defline)
    return m.group(1) if m else "?"


def analyze(hlo: str) -> dict:
    """Per-all-reduce operand/consumer opcodes from optimized HLO text."""
    defs: dict = {}
    for ln in hlo.splitlines():
        m = re.match(r"\s*(%?[\w\.\-]+)\s*=", ln)
        if m:
            defs[m.group(1).lstrip("%")] = ln
    out = []
    other = 0
    for ln in hlo.splitlines():
        if re.search(r"=\s+.*?\ball-reduce(?:-start)?\(", ln):
            args = re.search(r"all-reduce(?:-start)?\(([^)]*)\)", ln)
            ops = []
            for a in (args.group(1).split(",") if args else []):
                name = a.strip().split(" ")[-1].lstrip("%")
                ops.append(_op_of(defs.get(name, "?")))
            out.append(ops)
        elif re.search(r"=\s+.*?\b(reduce-scatter|all-gather)", ln):
            # XLA sometimes decomposes an all-reduce into
            # reduce-scatter + all-gather; count so no collective hides
            other += 1
    return {"n_allreduce": len(out), "operand_opcodes": out,
            "n_rs_ag": other}


def main() -> None:
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd
    from matrix_factorization_tpu.parallel import distributed as dist
    from matrix_factorization_tpu.parallel.mesh import (
        data_axes_of, make_mesh,
    )

    mesh = make_mesh(n_data=8)
    n_users, n_items, n = 1024, 512, 65536
    rng = np.random.default_rng(0)
    u = rng.integers(0, n_users, n).astype(np.int32)
    i = rng.integers(0, n_items, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    ucap = sgd.round_up(n_users, 8 * 8)
    shard = NamedSharding(mesh, P(data_axes_of(mesh)))

    for bs in (512, 2048):
        cfg = SGDConfig(kernel="linear", n_factors=16, lr=0.01, reg=0.01,
                        batch_size=bs, shuffle="none",
                        compute_epoch_rmse=False)
        data = sgd.pack_ratings(u, i, r, bs, shuffle_seed=0, order="item",
                                row_width=cfg.padded_factors, n_dev=8,
                                users_per_dev=ucap // 8)
        data = jax.tree.map(lambda a: jax.device_put(a, shard), data)
        params = dist.place_params(
            sgd.init_params(jax.random.PRNGKey(0), n_users, n_items, cfg,
                            3.0, user_capacity=ucap), mesh)
        for name, kw in (
            ("sync", {}),
            ("overlap", {"overlap_psum": True}),
            ("win_auto", {"psum_every": "auto"}),
            ("win_auto_overlap", {"psum_every": "auto", "overlap_psum": True}),
        ):
            fn = jax.jit(lambda p, d, k, kw=kw: dist.dp_sgd_train_tiled(
                p, d, k, cfg, 1, cfg.lr, mesh, **kw))
            comp = fn.lower(params, data, jax.random.PRNGKey(1)).compile()
            hlo = comp.as_text()
            rep = analyze(hlo)
            # classify each all-reduce: carry-fed (schedulable early)
            # vs compute-fed (on the critical path)
            carry_fed = sum(
                1 for ops in rep["operand_opcodes"]
                if all(o in ("get-tuple-element", "parameter", "copy",
                             "bitcast", "tuple") for o in ops))
            print(json.dumps({
                "schedule": name, "local_bs": bs,
                "n_allreduce": rep["n_allreduce"],
                "n_rs_ag": rep["n_rs_ag"],
                "carry_fed_allreduces": carry_fed,
                "operand_opcodes": rep["operand_opcodes"],
            }), flush=True)


if __name__ == "__main__":
    main()
