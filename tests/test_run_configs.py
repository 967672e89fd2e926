"""Protocol tests for the benchmark config harness.

The long-window protocol (benchmarks/run_configs.py::_fit_throughput,
round 4) chains ``window_calls`` async dispatches of one compiled
``epochs``-epoch program per timed trial.  The semantics that must hold
for the reported number to mean "updates/s of a real fit": params
thread through the chain, so the timed window IS a single
``epochs * window_calls``-epoch training run.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

import run_configs  # noqa: E402

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd


@pytest.fixture(scope="module")
def tiny():
    u, i, r = run_configs._gen(50, 40, 600, seed=3)
    cfg = SGDConfig(kernel="linear", n_factors=8, lr=0.01, reg=0.005,
                    batch_size=128, compute_epoch_rmse=False)
    return u, i, r, cfg


def test_windowed_fit_threads_params(tiny):
    """window_calls=3 of a 1-epoch program == one sequential 3-epoch
    chain with the same keys (bit-exact)."""
    u, i, r, cfg = tiny
    out, _, stats = run_configs._fit_throughput(
        u, i, r, 50, 40, cfg, epochs=1, lr=cfg.lr, trials=1,
        window_calls=3)
    assert stats["window_epochs"] == 3
    assert stats["updates_per_sec"] > 0

    data = sgd.pack_ratings(u, i, r, cfg.batch_size, order="auto",
                            row_width=cfg.padded_factors)
    train = sgd.jit_sgd_train(cfg, 1)
    params = sgd.init_params(jax.random.PRNGKey(0), 50, 40, cfg,
                             float(r.mean()))
    for c in range(3):
        params, _ = train(params, data, jax.random.PRNGKey(1 + c), cfg.lr)
    np.testing.assert_array_equal(np.asarray(out.user_features),
                                  np.asarray(params.user_features))
    np.testing.assert_array_equal(np.asarray(out.item_features),
                                  np.asarray(params.item_features))


def test_config_smoke_small_scale():
    """config 1 runs end-to-end at small scale and reports the protocol
    fields."""
    res = run_configs.config1("small")
    assert res["updates_per_sec"] > 0
    assert res["trials"] == 3
    assert res["window_epochs"] == 20
