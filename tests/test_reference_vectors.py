"""Hand-transcribed reference test vectors (VERDICT r1 #7).

The three per-rating SGD update rules were transcribed BY HAND from the
reference listings (``matrix_factorization/kernels.py``: linear :108-180,
sigmoid :185-264, rbf :267-327) into float64 arithmetic, run for three
sequential ratings, and the resulting parameters embedded below as
literals.  Both the C++ oracle (``native/oracle.cpp``) and the JAX engine
(batch_size=1, shuffle='none' — the exact-sequential mode) must reproduce
them.  A shared misreading between oracle and JAX port would fail here.

Setup: K=2, mu=3.0, lr=0.1, reg=0.1; a=0.5, c=4.5 (min 0.5 / max 5.0);
gamma=0.5 (rbf).  P0=[[0.1,-0.2],[0.3,0.0]], Q0=[[0.2,0.1],[-0.1,0.4]],
bu0=[0.05,-0.05], bi0=[0.1,0.0].
Ratings in order: (u0,i0,4.0), (u1,i0,2.5), (u0,i1,5.0) — item 0 is hit
twice, so the second update must see the first one's result.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_factorization_tpu.core.config import SGDConfig
from matrix_factorization_tpu.native.oracle import get_lib, sequential_sgd
from matrix_factorization_tpu.ops import segment_sgd as sgd

U = np.array([0, 1, 0], np.int32)
I = np.array([0, 0, 1], np.int32)
R = np.array([4.0, 2.5, 5.0])
P0 = np.array([[0.1, -0.2], [0.3, 0.0]])
Q0 = np.array([[0.2, 0.1], [-0.1, 0.4]])
BU0 = np.array([0.05, -0.05])
BI0 = np.array([0.1, 0.0])
MU, LR, REG, GAMMA, A, CMAX = 3.0, 0.1, 0.1, 0.5, 0.5, 5.0

# hand-computed from the reference update equations (float64)
EXPECTED = {
    "linear": dict(
        P=[[0.095311, -0.109489], [0.2826286325, -0.00570679]],
        Q=[[0.1835565, 0.08118], [-0.07634636, 0.358992545]],
        bu=[0.328445, -0.119095],
        bi=[0.112565, 0.19529],
    ),
    "sigmoid": dict(
        P=[[0.09726969270426473, -0.19592037648926539],
           [0.2951276255737162, -0.0009437923078482418]],
        Q=[[0.19286050371697755, 0.09864591237160145],
           [-0.09889731959100437, 0.3957929627672666]],
        bu=[0.04686938738333119, -0.058971800324072475],
        bi=[0.08535863781792036, 0.0010439492413383644],
    ),
    "rbf": dict(
        P=[[0.07739206714146228, -0.17511423043283444],
           [0.3198714203855325, -0.02932802130298184]],
        Q=[[0.18049898702901976, 0.14938924354663863],
           [-0.08573247455601453, 0.35304300818917767]],
        bu=[0.05, -0.05],  # rbf never touches biases (reference :267-327)
        bi=[0.1, 0.0],
    ),
}


@pytest.mark.skipif(get_lib() is None, reason="native oracle unavailable")
@pytest.mark.parametrize("kernel", ["linear", "sigmoid", "rbf"])
def test_oracle_matches_hand_vectors(kernel):
    exp = EXPECTED[kernel]
    P, Q, bu, bi, _ = sequential_sgd(
        kernel, U, I, R, 2, 2, 2, MU, LR, REG, GAMMA, A, CMAX,
        n_epochs=1, P0=P0, Q0=Q0, shuffle=False, bu0=BU0, bi0=BI0,
    )
    np.testing.assert_allclose(P, exp["P"], rtol=1e-12)
    np.testing.assert_allclose(Q, exp["Q"], rtol=1e-12)
    np.testing.assert_allclose(bu, exp["bu"], rtol=1e-12)
    np.testing.assert_allclose(bi, exp["bi"], rtol=1e-12)


@pytest.mark.parametrize("kernel", ["linear", "sigmoid", "rbf"])
def test_jax_engine_matches_hand_vectors(kernel):
    """batch_size=1 + shuffle='none' reproduces the sequential trajectory."""
    exp = EXPECTED[kernel]
    cfg = SGDConfig(kernel=kernel, n_factors=2, lr=LR, reg=REG, gamma=GAMMA,
                    min_rating=A, max_rating=CMAX, batch_size=1,
                    shuffle="none", compute_epoch_rmse=False)
    kp = cfg.padded_factors
    uf = np.zeros((8, kp), np.float32)
    itf = np.zeros((8, kp), np.float32)
    uf[:2, :2] = P0
    itf[:2, :2] = Q0
    if kernel != "rbf":
        uf[:2, sgd.bias_col(cfg, "user")] = BU0
        itf[:2, sgd.bias_col(cfg, "item")] = BI0
        uf[:, sgd.const_col(cfg, "user")] = 1.0
        itf[:, sgd.const_col(cfg, "item")] = 1.0
    params = sgd.MFParams(jnp.asarray(uf), jnp.asarray(itf), jnp.float32(MU))
    data = sgd.pack_ratings(U, I, R.astype(np.float32), 1, shuffle_seed=None,
                            aggregate=False)
    params, _ = sgd.jit_sgd_train(cfg, 1)(params, data, jax.random.PRNGKey(0),
                                          LR)
    np.testing.assert_allclose(
        np.asarray(params.user_features[:2, :2]), exp["P"], atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(params.item_features[:2, :2]), exp["Q"], atol=2e-6)
    if kernel != "rbf":
        np.testing.assert_allclose(
            np.asarray(params.user_features[:2, sgd.bias_col(cfg, "user")]),
            exp["bu"], atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(params.item_features[:2, sgd.bias_col(cfg, "item")]),
            exp["bi"], atol=2e-6)
