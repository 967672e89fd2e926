"""sklearn interoperability: get_params/set_params/clone + GridSearchCV,
matching the reference's advertised compatibility
(recommender_base.py:14, demonstrated in recommender-system.ipynb)."""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from sklearn.base import clone
from sklearn.model_selection import GridSearchCV

from matrix_factorization_tpu import BaselineModel, KernelMF
from matrix_factorization_tpu.data.synthetic import lowrank_ratings


def test_get_set_params_and_clone():
    m = KernelMF(n_factors=7, n_epochs=3, lr=0.05, reg=0.1, batch_size=64)
    params = m.get_params()
    assert params["n_factors"] == 7 and params["lr"] == 0.05
    m2 = clone(m)
    assert m2.get_params()["reg"] == 0.1
    m2.set_params(lr=0.2)
    assert m2.lr == 0.2 and m.lr == 0.05


def test_gridsearchcv_kernelmf():
    X, y = lowrank_ratings(n_users=60, n_items=40, density=0.5, seed=12)
    grid = GridSearchCV(
        KernelMF(n_epochs=8, batch_size=128, verbose=0),
        param_grid={"n_factors": [4, 8], "reg": [0.01, 0.1]},
        scoring="neg_root_mean_squared_error",
        cv=2,
        error_score="raise",
    )
    grid.fit(X, y)
    assert grid.best_score_ < 0  # neg RMSE
    assert set(grid.best_params_) == {"n_factors", "reg"}
    preds = grid.best_estimator_.predict(X.iloc[:10])
    assert len(preds) == 10


def test_gridsearchcv_baseline():
    X, y = lowrank_ratings(n_users=50, n_items=30, density=0.5, seed=13)
    grid = GridSearchCV(
        BaselineModel(method="als", n_epochs=5),
        param_grid={"reg": [0.1, 1.0]},
        scoring="neg_mean_absolute_error",
        cv=2,
        error_score="raise",
    )
    grid.fit(X, y)
    assert grid.best_params_["reg"] in (0.1, 1.0)
