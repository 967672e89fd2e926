"""Retrieval: item indexes (dense + TF-IDF), query encoding, top-k search.

Reference: ``project_template/app/retrieval.py`` (two index types behind
one interface, dot-product scoring + argpartition top-k).  Here dense
scoring/top-k runs on TPU (MXU matmul + ``lax.top_k``); TF-IDF scoring
uses the sparse host path (queries touch only a handful of columns) with
a dense TPU path when the matrix is small enough to densify.
"""

from matrix_factorization_tpu.retrieval.index import (
    DenseItemIndex,
    TfidfItemIndex,
    load_item_index,
    save_item_index,
)
from matrix_factorization_tpu.retrieval.search import (
    encode_query_for_index,
    search_topk,
    search_topk_pos,
)
