"""User-user and item-item CF usage — script version of the reference's
user-user-cf.ipynb / item-item-cf.ipynb."""

import numpy as np

from matrix_factorization_tpu import ItemItemCF, UserUserCF
from matrix_factorization_tpu.data.synthetic import movielens_shaped
from matrix_factorization_tpu.utils.metrics import rmse


def main() -> None:
    X, y = movielens_shaped(n_users=500, n_items=700, n_ratings=40_000, seed=0)
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(y))
    cut = int(0.8 * len(y))
    tr, te = perm[:cut], perm[cut:]

    for name, model in (
        ("UserUserCF", UserUserCF(n_neighbors=50, min_rating=0.5)),
        ("ItemItemCF", ItemItemCF(n_neighbors=50, min_rating=0.5)),
    ):
        model.fit(X.iloc[tr], y.iloc[tr])
        err = rmse(y.iloc[te], model.predict(X.iloc[te]))
        print(f"{name}: test RMSE = {err:.4f}")

    model = ItemItemCF(n_neighbors=50, min_rating=0.5).fit(X.iloc[tr], y.iloc[tr])
    user = X["user_id"].iloc[0]
    known = set(X.loc[X["user_id"] == user, "item_id"])
    print(f"\nItemItemCF top-5 for user {user}:")
    print(model.recommend(user=user, amount=5, items_known=known)
          .to_string(index=False))


if __name__ == "__main__":
    main()
