"""Pallas scoring kernel vs the XLA reference implementation (interpret
mode on the CPU mesh; the real-TPU path is exercised by bench/verify)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.ops import segment_sgd as sgd
from matrix_factorization_tpu.ops.pallas_scores import (
    pallas_score_catalog,
    recommend_topk,
)
from matrix_factorization_tpu.ops.scoring import score_catalog


def _rows(cfg, n, rng, side):
    kp = cfg.padded_factors
    m = np.zeros((n, kp), np.float32)
    m[:, : cfg.n_factors] = rng.normal(0, 0.4, (n, cfg.n_factors))
    if cfg.kernel != "rbf":
        m[:, sgd.bias_col(cfg, side)] = rng.normal(0, 0.2, n)
        m[:, sgd.const_col(cfg, side)] = 1.0
    return m


@pytest.mark.parametrize("kernel", ["linear", "sigmoid", "rbf"])
@pytest.mark.parametrize("shape", [(5, 37), (16, 512), (3, 1000)])
def test_pallas_matches_xla(kernel, shape):
    rng = np.random.default_rng(1)
    cfg = SGDConfig(kernel=kernel, n_factors=12, gamma=0.05,
                    min_rating=1.0, max_rating=5.0)
    B, I = shape
    pu = jnp.asarray(_rows(cfg, B, rng, "user"))
    Q = jnp.asarray(_rows(cfg, I, rng, "item"))
    mu = jnp.float32(3.4)
    want = np.asarray(score_catalog(cfg, mu, pu, Q))
    got = np.asarray(
        pallas_score_catalog(cfg, mu, pu, Q, item_tile=256, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_serving_gate_shapes(monkeypatch):
    """The serving router sends exactly the measured-win shapes to
    Pallas (B-tile <= 8 sublanes, rows <= 128 lanes, linear/sigmoid)
    and never routes on a CPU mesh."""
    from matrix_factorization_tpu.ops import scoring

    lin = SGDConfig(kernel="linear", n_factors=64)
    sig = SGDConfig(kernel="sigmoid", n_factors=64)
    rbf = SGDConfig(kernel="rbf", n_factors=64)
    # the test mesh is CPU: everything takes the XLA path
    assert not scoring._pallas_serving_wins(lin, 1, 128)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert scoring._pallas_serving_wins(lin, 1, 128)
    assert scoring._pallas_serving_wins(sig, 8, 128)
    assert not scoring._pallas_serving_wins(rbf, 1, 128)  # XLA hoists |Q|^2
    assert not scoring._pallas_serving_wins(lin, 16, 128)  # batch: XLA wins
    assert not scoring._pallas_serving_wins(lin, 1, 256)  # k=200 rows: tie


def test_catalog_topk_pallas_path_parity(monkeypatch):
    """catalog_topk with the Pallas scorer forced (interpret mode)
    returns the same (values, indices) as the XLA path."""
    import functools

    from matrix_factorization_tpu.ops import pallas_scores, scoring

    rng = np.random.default_rng(3)
    cfg = SGDConfig(kernel="sigmoid", n_factors=9, min_rating=1.0,
                    max_rating=5.0)

    class P:
        user_features = jnp.asarray(_rows(cfg, 24, rng, "user"))
        item_features = jnp.asarray(_rows(cfg, 300, rng, "item"))
        global_mean = jnp.float32(3.1)

    u = np.arange(3, dtype=np.int32)
    want_v, want_i = scoring.catalog_topk(cfg, P, 300, u, 7)
    monkeypatch.setattr(scoring, "_pallas_serving_wins",
                        lambda *a: True)
    monkeypatch.setattr(
        pallas_scores, "pallas_score_catalog",
        functools.partial(pallas_scores.pallas_score_catalog,
                          item_tile=128, interpret=True),
    )
    got_v, got_i = scoring.catalog_topk(cfg, P, 300, u, 7)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_v, want_v, atol=1e-4)


def test_recommend_topk_masks_invalid():
    rng = np.random.default_rng(2)
    cfg = SGDConfig(kernel="linear", n_factors=8)
    pu = jnp.asarray(_rows(cfg, 4, rng, "user"))
    Q = jnp.asarray(_rows(cfg, 40, rng, "item"))
    valid = jnp.asarray((np.arange(40) < 30).astype(np.float32))
    vals, idx = recommend_topk(cfg, jnp.float32(3.0), pu, Q, valid, k=5,
                               use_pallas=True, interpret=True)
    assert np.asarray(idx).max() < 30
    dense = np.asarray(score_catalog(cfg, jnp.float32(3.0), pu, Q))[:, :30]
    want = np.sort(dense, axis=1)[:, ::-1][:, :5]
    np.testing.assert_allclose(np.sort(np.asarray(vals))[:, ::-1], want,
                               atol=1e-4)
