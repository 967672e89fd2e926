"""matrix_factorization_tpu — a TPU-native recommender-system framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``SHEEPididoo/matrix-factorization`` (reference mounted at /root/reference):

* Five rating models sharing one ``fit / predict / recommend / update_users``
  lifecycle (reference ``matrix_factorization/__init__.py:1-16``):
  :class:`KernelMF`, :class:`BaselineModel`, :class:`UserUserCF`,
  :class:`ItemItemCF`, :class:`ContentBasedRecommender`.
* The reference's sequential Numba per-rating SGD loops
  (``kernels.py:108-327``) become vectorized mini-batch updates via
  ``jax.lax.scan`` over rating shards with segment-sum gradient
  accumulation into the factor tables (``ops.segment_sgd``).
* BaselineModel's ALS becomes two batched closed-form segment reductions
  per epoch (``ops.als``).
* Full-catalog scoring / recommend runs as tiled MXU matmuls with fused
  kernel epilogues (``ops.pallas_scores``), distributed top-k in
  ``parallel.topk``.
* Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` data /
  table parallelism (``parallel/``) — XLA collectives over ICI, not a
  port of any host-side threading.

The public API mirrors the reference package surface.
"""

from matrix_factorization_tpu.models.baseline import BaselineModel
from matrix_factorization_tpu.models.kernel_mf import KernelMF
from matrix_factorization_tpu.models.base import RecommenderBase
from matrix_factorization_tpu.models.collaborative import ItemItemCF, UserUserCF
from matrix_factorization_tpu.models.content_based import ContentBasedRecommender
from matrix_factorization_tpu.models.cf_topk import TopKItemItemCF, TopKUserUserCF
from matrix_factorization_tpu.models.bpr import BPR
from matrix_factorization_tpu.models.implicit import ImplicitALS
from matrix_factorization_tpu.models.svdpp import SVDpp
from matrix_factorization_tpu.models.nmf import NMF
from matrix_factorization_tpu.models.ease import EASE
from matrix_factorization_tpu.models.popularity import Popularity
from matrix_factorization_tpu.models.grid_search import (
    grid_search_ease,
    grid_search_kernel_mf,
)
from matrix_factorization_tpu.utils.splits import train_update_test_split

__version__ = "0.1.0"

__all__ = [
    "BaselineModel",
    "KernelMF",
    "RecommenderBase",
    "train_update_test_split",
    "ContentBasedRecommender",
    "UserUserCF",
    "ItemItemCF",
    "TopKItemItemCF",
    "TopKUserUserCF",
    "BPR",
    "ImplicitALS",
    "SVDpp",
    "NMF",
    "EASE",
    "Popularity",
    "grid_search_kernel_mf",
    "grid_search_ease",
]
