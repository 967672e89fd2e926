"""Multi-chip training walkthrough.

On real multi-chip hardware `make_mesh()` picks up every chip; on a single
host you can emulate a mesh with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_training.py
"""

import jax
import numpy as np

# emulate 8 devices when running CPU-only (JAX_PLATFORMS=cpu): the knob
# must be set BEFORE any backend initializes — probing
# jax.default_backend()/jax.devices() here would itself initialize one,
# so gate on the platform config instead
if (jax.config.jax_platforms or "").startswith("cpu"):
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # a backend is already live (e.g. interactive session)

from matrix_factorization_tpu import KernelMF
from matrix_factorization_tpu.data.synthetic import movielens_shaped
from matrix_factorization_tpu.parallel import make_mesh
from matrix_factorization_tpu.utils.metrics import rmse


def main() -> None:
    X, y = movielens_shaped(n_users=800, n_items=600, n_ratings=60_000, seed=0)
    mesh = make_mesh()  # all devices on the 'data' axis
    print(f"devices: {len(jax.devices())}, mesh: {dict(mesh.shape)}")

    model = KernelMF(n_factors=32, n_epochs=15, lr=0.005, reg=0.01,
                     batch_size=512, mesh=mesh)
    model.fit(X, y)  # user-sharded P, psum'd item deltas over the mesh
    print(f"train RMSE: {model.train_rmse[0]:.4f} -> {model.train_rmse[-1]:.4f}")
    print(f"refit (all data) RMSE: {rmse(y, model.predict(X)):.4f}")
    print(model.recommend(user=X['user_id'].iloc[0], amount=3).to_string(index=False))


if __name__ == "__main__":
    main()
