"""Per-step collective-volume accounting for the multi-chip trainers
(VERDICT r2 #8: quantify the >=50M/chip x 8 story, don't assert it).

Lowers the actual ``dp_sgd_train`` / ``dp_tp_sgd_train`` step programs
on a virtual 8-device mesh with the BASELINE config-3 and config-5
TABLE shapes (factor tables enter as ShapeDtypeStructs — nothing big is
materialized), walks the compiled HLO, and sums the bytes moved by
every collective (all-reduce / all-gather / reduce-scatter /
collective-permute) per epoch.  With one mini-batch step per epoch in
the lowered program, per-epoch volume == per-step volume.

Analytical expectations (the model these numbers validate — see the
derivation in benchmarks/RESULTS.md):

* dp over D devices: one psum of the full Q-delta table per step
  -> n_items_pad x Kp x 4 bytes entering the all-reduce per chip.
* dp x tp (D x M): one psum(dP over model) of the LOCAL P shard
  (n_users_pad/D x Kp x 4) + one psum(dQ over data) of the LOCAL Q
  shard (n_items_pad/M x Kp x 4).
* 2-slice multislice: same volumes; the slice-major mesh keeps the
  ring's high-volume stage on the intra-slice (ICI) axis.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       PYTHONPATH=/root/repo python -u benchmarks/comm_volume.py
"""

import json
import re

import numpy as np


def _dtype_bytes(s: str) -> int:
    return {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
            "s8": 1, "u8": 1, "u16": 2, "s16": 2, "pred": 1}.get(s, 4)


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OP_RE = re.compile(
    r"= ([^ ]+) (all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every collective op in an HLO module text."""
    out: dict = {}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m or "-start" in line or "-done" in line:
            continue
        shapes, op = m.group(1), m.group(2)
        total = 0
        for dt, dims in _SHAPE_RE.findall(shapes):
            n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims \
                else 1
            total += n * _dtype_bytes(dt)
        out[op] = out.get(op, 0) + total
    return out


def main():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) >= 8, \
        "run with xla_force_host_platform_device_count=8"

    import jax.numpy as jnp  # noqa: F401

    from matrix_factorization_tpu.core.config import SGDConfig
    from matrix_factorization_tpu.ops import segment_sgd as sgd
    from matrix_factorization_tpu.parallel import distributed as dist
    from matrix_factorization_tpu.parallel.mesh import (
        MODEL_AXIS, data_axes_of, make_mesh, make_multislice_mesh,
    )

    CASES = {
        "config3_sigmoid_k200": (162_000, 59_392, SGDConfig(
            kernel="sigmoid", n_factors=200, lr=0.01, reg=0.005,
            gamma=1 / 200, min_rating=0.5, max_rating=5.0, batch_size=4096,
            compute_epoch_rmse=False)),
        "config5_linear_k64": (1_000_000, 100_000, SGDConfig(
            kernel="linear", n_factors=64, lr=0.002, reg=0.005,
            batch_size=4096, compute_epoch_rmse=False)),
    }
    MESHES = {
        "dp8": (lambda: make_mesh(n_data=8), False),
        "dp4_tp2": (lambda: make_mesh(n_data=4, n_model=2), True),
        "multislice_2x4_dp": (lambda: make_multislice_mesh(2, 4), False),
    }

    rng = np.random.default_rng(0)
    for cname, (nu, ni, cfg) in CASES.items():
        kp = cfg.padded_factors
        for mname, (mk, is_2d) in MESHES.items():
            mesh = mk()
            data_axes = data_axes_of(mesh)
            n_data = int(np.prod([mesh.shape[a] for a in data_axes]))
            n_model = mesh.shape.get(MODEL_AXIS, 1)
            ucap = sgd.round_up(nu, 8 * n_data)
            icap = sgd.round_up(ni, 8 * max(n_model, 1))
            n_r = n_data * n_model * cfg.batch_size  # 1 step per epoch
            u = rng.integers(0, nu, n_r).astype(np.int32)
            i = rng.integers(0, ni, n_r).astype(np.int32)
            r = (rng.integers(1, 11, n_r) / 2).astype(np.float32)

            pspec = NamedSharding(mesh, P(data_axes))
            qspec = NamedSharding(mesh, P(MODEL_AXIS) if is_2d else P())
            rep = NamedSharding(mesh, P())
            params_sds = sgd.MFParams(
                jax.ShapeDtypeStruct((ucap, kp), np.float32, sharding=pspec),
                jax.ShapeDtypeStruct((icap, kp), np.float32, sharding=qspec),
                jax.ShapeDtypeStruct((), np.float32, sharding=rep),
            )
            if is_2d:
                su, si, sr, sw, _ = dist.shard_ratings_2d(
                    u, i, r, ucap, icap, n_data, n_model, cfg.batch_size)
                dshard = NamedSharding(mesh, P(data_axes + (MODEL_AXIS,)))
                train = lambda p, d, k: dist.dp_tp_sgd_train(  # noqa: E731
                    p, d, k, cfg, 1, cfg.lr, mesh, n_r)
            else:
                su, si, sr, sw, _ = dist.shard_ratings_by_user(
                    u, i, r, ucap, n_data, cfg.batch_size)
                dshard = NamedSharding(mesh, P(data_axes))
                train = lambda p, d, k: dist.dp_sgd_train(  # noqa: E731
                    p, d, k, cfg, 1, cfg.lr, mesh, n_r)
            data = dist.ShardedRatings(
                jax.device_put(su, dshard), jax.device_put(si, dshard),
                jax.device_put(sr, dshard), jax.device_put(sw, dshard))
            lowered = jax.jit(train).lower(
                params_sds, data, jax.random.PRNGKey(0))
            vol = collective_bytes(lowered.compile().as_text())
            print(json.dumps({
                "case": cname, "mesh": mname,
                "collective_bytes_per_step": vol,
                "total_MB_per_step": round(sum(vol.values()) / 1e6, 2),
                "table_shapes": {"P": [ucap, kp], "Q": [icap, kp]},
            }), flush=True)


if __name__ == "__main__":
    main()
