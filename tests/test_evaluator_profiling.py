import numpy as np
import pandas as pd

from matrix_factorization_tpu import BaselineModel, KernelMF
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.eval.evaluator import RecommenderEvaluator
from matrix_factorization_tpu.utils.profiling import (
    EpochLogger,
    ThroughputMeter,
    Timer,
    trace,
)


def _split():
    X, y = lowrank_ratings(n_users=60, n_items=40, density=0.5, seed=21)
    n = len(X)
    cut = int(0.8 * n)
    return X.iloc[:cut], y.iloc[:cut], X.iloc[cut:], y.iloc[cut:]


def test_evaluator_report_fields():
    Xtr, ytr, Xte, yte = _split()
    model = BaselineModel(method="als", n_epochs=10, reg=0.5).fit(Xtr, ytr)
    rep = RecommenderEvaluator(k=5, positive_threshold=3.0).evaluate(
        model, Xtr, Xte, yte
    )
    d = rep.as_dict()
    assert set(d) == {"rmse", "mae", "precision", "recall", "f1", "ndcg",
                      "coverage", "diversity", "n_users"}
    assert d["rmse"] > 0 and 0 <= d["coverage"] <= 1
    assert 0 <= d["diversity"] <= 1


def test_evaluator_compare_table():
    Xtr, ytr, Xte, yte = _split()
    ev = RecommenderEvaluator(k=5, positive_threshold=3.0, max_users=20)
    table = ev.compare(
        {
            "baseline": BaselineModel(method="als", n_epochs=5, reg=0.5),
            "kernel_mf": KernelMF(n_factors=6, n_epochs=10, lr=0.02,
                                  reg=0.02, batch_size=128),
        },
        Xtr, ytr, Xte, yte,
    )
    assert list(table.index) == ["baseline", "kernel_mf"]
    assert "rmse" in table.columns


def test_throughput_meter_and_timer():
    m = ThroughputMeter(n_chips=4)
    m.record(1_000_000, 0.5)
    m.record(1_000_000, 0.5)
    assert m.updates_per_sec == 2_000_000
    assert m.updates_per_sec_per_chip == 500_000
    with Timer() as t:
        sum(range(1000))
    assert t.seconds >= 0

    log = EpochLogger(verbose=0)
    log.log(1, 0.95, n_updates=100, seconds=0.1)
    assert log.history[0]["updates_per_sec"] == 1000

    with trace(None):  # no-op path
        pass
