"""iALS bucket-prep wall-clock at 25M — the wire-format re-measurement.

Round-2 recorded the two-sided bucket prep (host pack + host->device
ship of the (E, L) pools) at 36-40s of every 25M-rating iALS run
(RESULTS.md "iALS vs SGD"), with 12B/slot uncompressed pools dominating
the shared tunnel.  Round 3 shipped `mf_pack_grouped_wire` (3-4B/slot:
uint16[+uint8] ids, int8 half-step ratings, masks rebuilt on device
from counts) + `group_both_sides_bucketed` (the two native packs
overlapped in threads).  This probe times the shipped path end-to-end
at the exact ials_vs_sgd shape, median of ``--trials``:

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/ials_prep_probe.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


N_U, N_I, N_R = 162_000, 59_392, 25_000_000  # ials_vs_sgd.py shape


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--n", type=int, default=N_R)
    args = p.parse_args()

    import jax
    from matrix_factorization_tpu.ops import ials

    rng = np.random.default_rng(0)
    u = rng.integers(0, N_U, args.n).astype(np.int32)
    i = rng.integers(0, N_I, args.n).astype(np.int32)
    r = (rng.integers(1, 11, args.n) * 0.5).astype(np.float32)  # half-steps

    # count the bytes that actually cross the tunnel (load-independent,
    # unlike the wall-clock below): wrap the two ship paths
    wire = {"bytes": 0, "slots": 0}
    orig_ship_wire, orig_ship_grouped = ials._ship_wire, ials._ship_grouped

    def counting_ship_wire(lo, hi, rr_enc, counts, E, L, half):
        wire["bytes"] += (lo.nbytes + (hi.nbytes if hi is not None else 0)
                          + rr_enc.nbytes + counts.size * 4)
        wire["slots"] += E * L
        return orig_ship_wire(lo, hi, rr_enc, counts, E, L, half)

    def counting_ship_grouped(oi, rr, counts, E, L):
        wire["bytes"] += oi.nbytes + rr.nbytes + counts.size * 4
        wire["slots"] += E * L
        return orig_ship_grouped(oi, rr, counts, E, L)

    ials._ship_wire = counting_ship_wire
    ials._ship_grouped = counting_ship_grouped
    try:
        times = []
        for t in range(args.trials):
            if t == 1:  # count one pass only
                ials._ship_wire, ials._ship_grouped = (orig_ship_wire,
                                                       orig_ship_grouped)
            t0 = time.perf_counter()
            bu, bi = ials.group_both_sides_bucketed(u, i, r, N_U, N_I)
            for b in bu + bi:
                jax.block_until_ready(b.other_ids)
            times.append(time.perf_counter() - t0)
            del bu, bi
    finally:
        ials._ship_wire, ials._ship_grouped = (orig_ship_wire,
                                               orig_ship_grouped)
    times.sort()
    print(json.dumps({
        "metric": "ials_two_sided_prep_seconds_25M",
        "value": round(times[len(times) // 2], 2),
        "unit": "s",
        "trials": [round(x, 2) for x in times],
        "wire_mb": round(wire["bytes"] / 1e6, 1),
        "uncompressed_mb": round(wire["slots"] * 12 / 1e6, 1),
        "note": "host pack + wire ship + device decode, both sides; "
                "wall-clock is tunnel-load dependent (see ROADMAP), the "
                "byte counts are not",
    }), flush=True)


if __name__ == "__main__":
    main()
