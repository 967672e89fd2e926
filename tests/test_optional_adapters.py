"""Optional-dependency adapter tier (VERDICT r4 #8).

Every test here ``importorskip``s its optional package: in this image
(fastapi / streamlit / sentence-transformers / openai all absent) the
tier skips cleanly; in an image WITH the extras it exercises the gated
adapters so a signature drift in ``create_fastapi_app`` or the encoder
contract cannot ship silently.  The hermetic halves (stdlib HTTP server,
the Streamlit widget-stub drive, hash encoder, keywords judge) are
covered unconditionally elsewhere (``tests/test_serve_checkpoint.py``,
``tests/test_streamlit_app.py``); what is ONLY checkable with the deps
installed lives here.
"""

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu.retrieval.encode import hash_embed
from matrix_factorization_tpu.retrieval.index import build_dense_index
from matrix_factorization_tpu.serve.service import RecommendService


@pytest.fixture()
def service():
    texts = [f"recipe {i} protein p{i % 5} quick meal" for i in range(30)]
    index = build_dense_index([str(i) for i in range(30)], texts,
                              hash_embed(texts, dim=32))
    return RecommendService(index=index)


def test_fastapi_routes_match_stdlib_contract(service):
    """The FastAPI adapter must expose the same routes + request schema
    the stdlib server serves (serve/api.py handlers)."""
    fastapi = pytest.importorskip("fastapi")
    pytest.importorskip("pydantic")
    from fastapi.testclient import TestClient

    from matrix_factorization_tpu.serve.api import create_fastapi_app

    app = create_fastapi_app(service)
    paths = {r.path for r in app.routes}
    assert {"/health", "/recommend"} <= paths

    client = TestClient(app)
    h = client.get("/health").json()
    # same schema as the stdlib handler's service.health() payload
    assert {"status", "index_type", "n_items", "has_model",
            "has_reranker"} <= set(h)
    assert h["status"] == "ok" and h["n_items"] == 30

    r = client.post("/recommend", json={"query": "protein p3", "k": 5})
    assert r.status_code == 200
    results = r.json()["results"]
    assert len(results) == 5
    assert {"item_id", "score", "reason"} <= set(results[0])

    # request bounds enforced by the pydantic model (k <= 50), matching
    # _validate_recommend_body's stdlib-side clamp contract
    bad = client.post("/recommend", json={"query": "x", "k": 10_000})
    assert bad.status_code == 422


def test_streamlit_import_path(monkeypatch, tmp_path):
    """serve/app.py's real-streamlit import path: streamlit_main(st=None)
    imports streamlit and builds the page in bare mode without raising.
    (The full widget flow is driven hermetically by the recording stub
    in tests/test_streamlit_app.py; THIS checks the real module import
    + bare-mode widget calls that the stub cannot.)"""
    pytest.importorskip("streamlit")

    from matrix_factorization_tpu.retrieval.index import save_item_index
    from matrix_factorization_tpu.serve.app import streamlit_main

    art = tmp_path / "workdir" / "artifacts"
    art.mkdir(parents=True)
    texts = [f"recipe {i} protein p{i % 5}" for i in range(12)]
    save_item_index(
        build_dense_index([str(i) for i in range(12)], texts,
                          hash_embed(texts, dim=16)),
        art / "item_index.pkl")
    monkeypatch.chdir(tmp_path)  # bare-mode default "workdir/artifacts"
    streamlit_main(st=None)


def test_sentence_transformer_encoder_contract():
    """retrieval/encode.py's gated transformer path must honor the
    embed_texts contract: (n, dim) float32, L2-normalized rows."""
    pytest.importorskip("sentence_transformers")

    from matrix_factorization_tpu.retrieval.encode import embed_texts

    out = embed_texts(["grilled chicken", "tofu salad"],
                      model_name="sentence-transformers/all-MiniLM-L6-v2")
    assert out.dtype == np.float32 and out.ndim == 2 and len(out) == 2
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)


def test_openai_judge_requires_key(monkeypatch):
    """The gated judge raises actionably without a key and exposes the
    per-item fallback contract."""
    pytest.importorskip("openai")

    from matrix_factorization_tpu.eval.judge import openai_judge

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(Exception) as e:
        openai_judge(query="q", item_id="1", text="t")
    assert "OPENAI_API_KEY" in str(e.value) or "api" in str(e.value).lower()
