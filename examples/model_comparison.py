"""Cross-model comparison on one split — the script version of the
reference's recommender-evaluation.ipynb harness (RMSE, P/R/F1@10,
coverage, diversity)."""

import numpy as np

from matrix_factorization_tpu import (
    BaselineModel,
    ContentBasedRecommender,
    ItemItemCF,
    KernelMF,
    Popularity,
    UserUserCF,
)
from matrix_factorization_tpu.data.synthetic import movielens_shaped
from matrix_factorization_tpu.eval.evaluator import RecommenderEvaluator


def main() -> None:
    X, y = movielens_shaped(n_users=400, n_items=600, n_ratings=30_000, seed=0)
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(y))
    cut = int(0.8 * len(y))
    tr, te = perm[:cut], perm[cut:]

    models = {
        "popularity": Popularity(score="mean"),
        "baseline_als": BaselineModel(method="als", n_epochs=20, reg=0.5),
        "baseline_sgd": BaselineModel(method="sgd", n_epochs=20, reg=0.005,
                                      lr=0.01),
        "kernel_mf_linear": KernelMF(n_factors=64, n_epochs=20, lr=0.002,
                                     reg=0.005, batch_size=1024),
        "kernel_mf_sigmoid": KernelMF(n_factors=64, n_epochs=20, lr=0.01,
                                      reg=0.005, kernel="sigmoid",
                                      batch_size=1024),
        "user_user_cf": UserUserCF(n_neighbors=50),
        "item_item_cf": ItemItemCF(n_neighbors=50),
        "content_based": ContentBasedRecommender(),
    }
    ev = RecommenderEvaluator(k=10, positive_threshold=4.0, max_users=100)
    table = ev.compare(models, X.iloc[tr], y.iloc[tr], X.iloc[te], y.iloc[te])
    print(table.round(4).to_string())


if __name__ == "__main__":
    main()
