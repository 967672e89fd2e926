"""SGD pack prep-time probe: native chunk-sort pipeline vs pure numpy
(VERDICT r4 #3 — "prep seconds alongside fit rate with the
numpy-vs-native delta recorded").

``pack_ratings`` is the SGD-side host prep (shuffle gather, device-major
chunk sort, per-batch primary sort, secondary argsort, wire encode).
Every sort/gather/encode phase routes through ``native/loader.cpp``
(counting sorts, byte-identical to numpy's stable argsort —
``tests/test_native_loader.py::test_native_pack_ratings_byte_identical_to_numpy``);
``MF_TPU_DISABLE_NATIVE=1`` forces the numpy fallback for the A/B.

Caveat recorded in the artifact: this image exposes ONE host core
(``nproc`` = 1), so the native pack's 16-way threading is inert here —
the measured delta is the single-thread algorithmic gap (counting sort
vs comparison argsort + fewer copies); a production TPU host with
dozens of cores widens it by roughly the core count on the threaded
phases.

Run: PYTHONPATH=/root/repo python -u benchmarks/sgd_pack_probe.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

SHAPES = {
    "config3": (162_000, 59_392, 25_000_000, 2_097_152, "item", 256),
    "config5": (1_000_000, 100_000, 100_000_000, 2_097_152, "user", 128),
}


def one_pack(shape_key: str) -> float:
    from matrix_factorization_tpu.ops import segment_sgd as sgd

    n_u, n_i, n_r, bs, order, rw = SHAPES[shape_key]
    rng = np.random.default_rng(0)
    u = rng.integers(0, n_u, n_r).astype(np.int32)
    i = rng.integers(0, n_i, n_r).astype(np.int32)
    r = np.round(rng.uniform(0.5, 5, n_r) * 2).astype(np.float32) / 2
    t0 = time.perf_counter()
    sgd.pack_ratings(u, i, r, bs, order=order, row_width=rw)
    return time.perf_counter() - t0


def main():
    if len(sys.argv) > 1:  # child mode: one timed pack, print seconds
        print(json.dumps({"seconds": round(one_pack(sys.argv[1]), 2)}))
        return
    rows = []
    for shape in SHAPES:
        row = {"shape": shape}
        for mode, env in (("native", {}), ("numpy",
                                          {"MF_TPU_DISABLE_NATIVE": "1"})):
            # fresh process per measurement: no allocator warm-up bleed,
            # and the env toggle is read at lib-load time
            out = subprocess.run(
                [sys.executable, "-u", __file__, shape],
                env={**os.environ, "JAX_PLATFORMS": "cpu", **env},
                capture_output=True, text=True, timeout=1800)
            if out.returncode != 0:
                raise SystemExit(out.stderr[-2000:])
            row[f"{mode}_pack_seconds"] = json.loads(
                out.stdout.strip().splitlines()[-1])["seconds"]
        row["speedup"] = round(row["numpy_pack_seconds"]
                               / row["native_pack_seconds"], 2)
        row["host_cores"] = os.cpu_count()
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("benchmarks/results/sgd_pack_probe.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
