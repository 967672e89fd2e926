"""End-to-end usage example, mirroring the reference's
``examples/example.py`` lifecycle: split -> fit -> update_users ->
predict -> RMSE -> recommend — on TPU.

Run:  PYTHONPATH=. python examples/example.py [--ratings path.parquet]
With no --ratings it uses a MovieLens-100K-shaped synthetic dataset
(this image has no network egress to download the real one).
"""

import argparse

import numpy as np
import pandas as pd

from matrix_factorization_tpu import KernelMF, train_update_test_split
from matrix_factorization_tpu.utils.metrics import rmse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ratings", type=str, default=None,
                   help="parquet with user_id,item_id,rating")
    p.add_argument("--epochs", type=int, default=20)
    a = p.parse_args()

    if a.ratings:
        data = pd.read_parquet(a.ratings)
    else:
        from matrix_factorization_tpu.data.synthetic import movielens_shaped

        X, y = movielens_shaped(n_users=943, n_items=1682,
                                n_ratings=100_000, seed=0)
        data = X.copy()
        data["rating"] = y

    (
        X_train_initial, y_train_initial,
        X_train_update, y_train_update,
        X_test_update, y_test_update,
    ) = train_update_test_split(data, frac_new_users=0.2, seed=1)

    matrix_fact = KernelMF(
        n_epochs=a.epochs, n_factors=100, verbose=1, lr=0.001, reg=0.005,
        batch_size=1024,
    )
    matrix_fact.fit(X_train_initial, y_train_initial)

    # online update with the new users' first half of ratings
    matrix_fact.update_users(
        X_train_update, y_train_update, lr=0.001, n_epochs=a.epochs, verbose=1
    )
    pred = matrix_fact.predict(X_test_update)
    print(f"\nTest RMSE (new users): {rmse(y_test_update, pred):.4f}")
    print(
        "Global-mean baseline:  "
        f"{rmse(y_test_update, np.full(len(y_test_update), float(np.mean(y_train_initial)))):.4f}"
    )

    user = X_test_update["user_id"].iloc[0]
    known = set(data.loc[data['user_id'] == user, 'item_id'])
    print(f"\nTop-5 recommendations for user {user}:")
    print(matrix_fact.recommend(user=user, amount=5, items_known=known)
          .to_string(index=False))


if __name__ == "__main__":
    main()
