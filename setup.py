from setuptools import find_packages, setup

setup(
    name="matrix-factorization-tpu",
    version="0.1.0",
    description=(
        "TPU-native recommender-system framework: kernel matrix "
        "factorization, bias baselines, neighborhood CF, content-based and "
        "hybrid retrieval/rerank/serving — JAX/XLA/Pallas, sharded via pjit."
    ),
    packages=find_packages(include=["matrix_factorization_tpu*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "pandas",
        "flax",
    ],
    extras_require={
        "eval": ["scikit-learn", "scipy", "pyarrow"],
        "serve": ["fastapi", "uvicorn"],
        "test": ["pytest"],
    },
)
