"""Model library: the rating models on one lifecycle protocol."""

from matrix_factorization_tpu.models.base import RecommenderBase
from matrix_factorization_tpu.models.baseline import BaselineModel
from matrix_factorization_tpu.models.kernel_mf import KernelMF
from matrix_factorization_tpu.models.collaborative import ItemItemCF, UserUserCF
from matrix_factorization_tpu.models.content_based import ContentBasedRecommender
from matrix_factorization_tpu.models.cf_topk import TopKItemItemCF, TopKUserUserCF
from matrix_factorization_tpu.models.bpr import BPR
from matrix_factorization_tpu.models.implicit import ImplicitALS
from matrix_factorization_tpu.models.svdpp import SVDpp
from matrix_factorization_tpu.models.nmf import NMF
from matrix_factorization_tpu.models.ease import EASE
from matrix_factorization_tpu.models.popularity import Popularity

__all__ = [
    "RecommenderBase",
    "BaselineModel",
    "KernelMF",
    "UserUserCF",
    "ItemItemCF",
    "TopKItemItemCF",
    "TopKUserUserCF",
    "ContentBasedRecommender",
    "BPR",
    "ImplicitALS",
    "SVDpp",
    "NMF",
    "EASE",
    "Popularity",
]
