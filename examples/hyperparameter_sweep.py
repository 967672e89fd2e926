"""Vmapped hyperparameter grid search — TPU-native GridSearchCV.

The reference tunes KernelMF with sklearn GridSearchCV (81 candidates x
5 folds, sequential — examples/recommender-system.ipynb cells 29-30).
Here the whole (lr x reg) grid trains SIMULTANEOUSLY in one compiled
program; the sklearn path still works too (RecommenderBase is a
BaseEstimator), shown at the end.
"""

import numpy as np

from matrix_factorization_tpu import grid_search_kernel_mf
from matrix_factorization_tpu.data.synthetic import movielens_shaped


def main() -> None:
    X, y = movielens_shaped(n_users=943, n_items=1682, n_ratings=100_000,
                            seed=0)
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(y))
    cut = int(0.8 * len(y))
    tr, va = perm[:cut], perm[cut:]

    model, results = grid_search_kernel_mf(
        X.iloc[tr], y.iloc[tr], X.iloc[va], y.iloc[va],
        lrs=[0.002, 0.005, 0.01, 0.02],
        regs=[0.005, 0.05, 0.2],
        n_epochs=20, n_factors=50, batch_size=8192,
    )
    print("candidates (best first):")
    for row in results[:5]:
        print(f"  lr={row['lr']:<6g} reg={row['reg']:<6g} "
              f"val_rmse={row['val_rmse']:.4f}")
    print(f"\nbest: lr={model.lr} reg={model.reg}")
    recs = model.recommend(user=X["user_id"].iloc[0], amount=5)
    print("top-5 for one user:\n", recs.to_string(index=False))


if __name__ == "__main__":
    main()
