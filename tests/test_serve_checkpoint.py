"""Serving (service core + stdlib HTTP API + meal planner) and
checkpoint/resume."""

import json
import pickle
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from matrix_factorization_tpu import BaselineModel, KernelMF
from matrix_factorization_tpu.core.checkpoint import (
    fit_resumable,
    load_model,
    save_model,
)
from matrix_factorization_tpu.data.synthetic import lowrank_ratings
from matrix_factorization_tpu.retrieval.index import build_tfidf_index, save_item_index
from matrix_factorization_tpu.serve.api import serve
from matrix_factorization_tpu.serve.planner import (
    PlanRequest,
    build_query_from_needs,
    plan_meals,
)
from matrix_factorization_tpu.serve.service import RecommendService

TEXTS = [
    "title: grilled chicken bowl\ningredients: chicken breast; rice\ndirections: grill 15 minutes",
    "title: peanut noodles\ningredients: peanut butter; noodle\ndirections: boil 10 minutes",
    "title: salmon salad\ningredients: salmon; lettuce\ndirections: bake 20 minutes",
    "title: tofu curry\ningredients: tofu; curry; rice\ndirections: simmer 25 minutes",
    "title: beef stew\ningredients: beef; potato; carrot\ndirections: cook 2 hours",
    "title: egg fried rice\ningredients: egg; rice; soy sauce\ndirections: fry 8 minutes",
]
IDS = ["r1", "r2", "r3", "r4", "r5", "r6"]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    art = root / "artifacts"
    art.mkdir()
    save_item_index(build_tfidf_index(IDS, TEXTS, min_df=1), art / "item_index.pkl")

    # a tiny rating model over the same item ids
    rng = np.random.default_rng(0)
    n = 60
    X = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, n),
            "item_id": [IDS[j % len(IDS)] for j in range(n)],
        }
    ).drop_duplicates()
    y = pd.Series(rng.uniform(1, 5, len(X)))
    model = BaselineModel(method="als", n_epochs=5).fit(X, y)
    with (art / "model.pkl").open("wb") as f:
        pickle.dump(model, f)
    return art


def test_service_health_and_recommend(artifacts):
    svc = RecommendService.from_artifacts(artifacts)
    h = svc.health()
    assert h["status"] == "ok" and h["index_type"] == "tfidf"
    assert h["has_model"]
    res = svc.recommend("grilled chicken rice", user_id=0, k=3, alpha=0.5)
    assert len(res) == 3
    assert res[0]["item_id"] == "r1"
    assert "hybrid" in res[0]["reason"]
    res2 = svc.recommend("peanut noodles", k=2)
    assert res2[0]["item_id"] == "r2"
    assert res2[0]["reason"] == "embedding similarity recall"


def test_missing_artifacts_actionable_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="build_tfidf_index"):
        RecommendService.from_artifacts(tmp_path)


def test_http_api(artifacts):
    svc = RecommendService.from_artifacts(artifacts)
    httpd = serve(svc, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/health") as r:
            h = json.loads(r.read())
            assert h["status"] == "ok"

        body = json.dumps({"query": "salmon salad", "k": 2}).encode()
        req = urllib.request.Request(
            f"{base}/recommend", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
            assert out["results"][0]["item_id"] == "r3"

        # probe: missing query -> 422 with message
        bad = urllib.request.Request(f"{base}/recommend", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 422
        # probe: k out of bounds -> 422
        bad2 = urllib.request.Request(
            f"{base}/recommend",
            data=json.dumps({"query": "x", "k": 999}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as exc2:
            urllib.request.urlopen(bad2)
        assert exc2.value.code == 422
        # probe: unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as exc3:
            urllib.request.urlopen(f"{base}/nope")
        assert exc3.value.code == 404
    finally:
        httpd.shutdown()


def test_planner_daily_plan(artifacts):
    svc = RecommendService.from_artifacts(artifacts)
    req = PlanRequest(
        goal="", meals=["早餐", "午餐"], avoid=["peanut"], per_meal_k=2,
        candidate_k=6, use_reranker=False, strict_filters=True,
    )
    rows = plan_meals(svc, req)
    assert rows, "planner returned no rows"
    assert all(r["item_id"] != "r2" for r in rows)  # peanut filtered
    assert {r["meal"] for r in rows} <= {"早餐", "午餐"}
    # cross-meal diversity: no item repeats across the plan
    ids = [r["item_id"] for r in rows]
    assert len(ids) == len(set(ids)) or len(set(ids)) > 1


def test_build_query_from_needs_mappings():
    q = build_query_from_needs(
        goal="增肌/高蛋白", meal_type="午餐", cuisines=["日式"],
        dietary=["素食"], must_include=["tofu"], avoid=["milk"],
        max_time_min=30,
    )
    assert "high protein" in q and "lunch" in q
    assert "japanese" in q and "vegetarian" in q
    assert "ready in 30 minutes" in q


# ----------------------------- checkpointing -------------------------------


def test_checkpoint_roundtrip_kernelmf(tmp_path):
    X, y = lowrank_ratings(n_users=40, n_items=30, density=0.5, seed=6)
    m = KernelMF(n_factors=6, n_epochs=10, lr=0.02, reg=0.02, batch_size=128)
    m.fit(X, y)
    want = m.predict(X.iloc[:50])
    save_model(m, tmp_path / "ckpt")
    m2 = load_model(tmp_path / "ckpt")
    got = m2.predict(X.iloc[:50])
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert m2.train_rmse == m.train_rmse
    assert m2.known_users == m.known_users


def test_checkpoint_to_new_nested_directory(tmp_path):
    """Regression (ADVICE r1): saving under a not-yet-existing parent used
    to mkdtemp on the system tmp and fail the cross-directory rename."""
    X, y = lowrank_ratings(n_users=20, n_items=15, density=0.5, seed=8)
    m = BaselineModel(method="als", n_epochs=3).fit(X, y)
    deep = tmp_path / "a" / "b" / "ckpt"
    save_model(m, deep)
    m2 = load_model(deep)
    np.testing.assert_allclose(m2.predict(X.iloc[:10]), m.predict(X.iloc[:10]),
                               atol=1e-6)
    # overwrite of an existing checkpoint still works (rename-aside path)
    save_model(m, deep)
    assert load_model(deep) is not None
    leftovers = [p for p in deep.parent.iterdir() if p.name != "ckpt"]
    assert not leftovers, f"stale temp dirs left behind: {leftovers}"


def test_checkpoint_roundtrip_baseline(tmp_path):
    X, y = lowrank_ratings(n_users=30, n_items=20, density=0.5, seed=7)
    m = BaselineModel(method="als", n_epochs=5).fit(X, y)
    save_model(m, tmp_path / "b")
    m2 = load_model(tmp_path / "b")
    np.testing.assert_allclose(m2.predict(X.iloc[:20]), m.predict(X.iloc[:20]),
                               atol=1e-6)


def test_fit_resumable_resumes(tmp_path):
    X, y = lowrank_ratings(n_users=40, n_items=30, density=0.5, seed=9)
    ckpt = tmp_path / "resume"

    m1 = KernelMF(n_factors=6, n_epochs=8, lr=0.02, reg=0.02, batch_size=128)
    m1 = fit_resumable(m1, X, y, ckpt, total_epochs=8, segment_epochs=4)
    assert m1._epochs_done == 8
    assert len(m1.train_rmse) == 8

    # "crash" after the first segment: simulate by rolling the checkpoint
    # back to 4 epochs, then resume
    m2 = KernelMF(n_factors=6, n_epochs=8, lr=0.02, reg=0.02, batch_size=128)
    m2.fit(X, y, n_epochs=4)
    m2._epochs_done = 4
    save_model(m2, ckpt)
    m3 = KernelMF(n_factors=6, n_epochs=8, lr=0.02, reg=0.02, batch_size=128)
    m3 = fit_resumable(m3, X, y, ckpt, total_epochs=8, segment_epochs=4)
    assert m3._epochs_done == 8
    assert len(m3.train_rmse) == 8
    # resumed training kept improving
    assert m3.train_rmse[-1] <= m3.train_rmse[0]


def _implicit_interactions(seed=0, n_users=40, n_items=48, n=700):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n)
    grp = u % 4
    i = rng.integers(0, n_items // 4, n) + grp * (n_items // 4)
    return pd.DataFrame({"user_id": u, "item_id": i}).drop_duplicates()


def test_checkpoint_roundtrip_bpr(tmp_path):
    from matrix_factorization_tpu.models import BPR

    X = _implicit_interactions()
    m = BPR(n_factors=8, n_epochs=15, lr=0.1, reg=0.002, batch_size=256,
            seed=2).fit(X)
    save_model(m, tmp_path / "bpr")
    m2 = load_model(tmp_path / "bpr")
    np.testing.assert_array_equal(m2.user_features, m.user_features)
    np.testing.assert_array_equal(m2.item_features, m.item_features)
    assert m2.train_loss == m.train_loss
    # auc needs the restored _train_pairs for negative rejection
    assert abs(m2.auc(X, n_neg=10, seed=0) - m.auc(X, n_neg=10, seed=0)) < 1e-9
    uid = int(X.user_id.iloc[0])
    pd.testing.assert_frame_equal(m2.recommend(user=uid, amount=5),
                                  m.recommend(user=uid, amount=5))


def test_checkpoint_roundtrip_implicit_als(tmp_path):
    from matrix_factorization_tpu.models import ImplicitALS

    X = _implicit_interactions(seed=3)
    y = pd.Series(np.random.default_rng(3).uniform(1, 20, len(X)))
    m = ImplicitALS(n_factors=8, n_epochs=4, seed=1).fit(X, y)
    save_model(m, tmp_path / "ials")
    m2 = load_model(tmp_path / "ials")
    np.testing.assert_allclose(m2.predict(X.iloc[:30]), m.predict(X.iloc[:30]),
                               atol=1e-6)
    assert m2.train_loss == m.train_loss


def test_checkpoint_strips_mesh_coupled_flags(tmp_path):
    """Regression: a dp+overlap model checkpoint must be LOADABLE — the
    saved config nulls the mesh, so flags whose constructor guards
    require one (overlap_psum, keep_sharded) must be stripped too."""
    from matrix_factorization_tpu.models import BPR
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X = _implicit_interactions()
    mesh = make_mesh(n_data=8)
    m = BPR(n_factors=8, n_epochs=5, lr=0.1, batch_size=256, seed=1,
            mesh=mesh, overlap_psum=True).fit(X)
    save_model(m, tmp_path / "dp_bpr")
    m2 = load_model(tmp_path / "dp_bpr")  # used to raise ValueError
    assert m2.mesh is None and m2.overlap_psum is False
    np.testing.assert_array_equal(m2.item_features, m.item_features)


def test_fit_resumable_bpr(tmp_path):
    from matrix_factorization_tpu.models import BPR

    X = _implicit_interactions(seed=4)
    ckpt = tmp_path / "bpr_resume"
    m = BPR(n_factors=8, n_epochs=6, lr=0.1, reg=0.002, batch_size=256,
            seed=5)
    m = fit_resumable(m, X, None, ckpt, total_epochs=6, segment_epochs=2)
    assert m._epochs_done == 6
    assert len(m.train_loss) == 6
    assert m.train_loss[-1] < m.train_loss[0]

    # roll back to the 2-epoch checkpoint and resume: epochs 3-6 retrain
    m2 = BPR(n_factors=8, n_epochs=6, lr=0.1, reg=0.002, batch_size=256,
             seed=5).fit(X, n_epochs=2)
    m2._epochs_done = 2
    save_model(m2, ckpt)
    m3 = fit_resumable(
        BPR(n_factors=8, n_epochs=6, lr=0.1, reg=0.002, batch_size=256,
            seed=5), X, None, ckpt, total_epochs=6, segment_epochs=2)
    assert m3._epochs_done == 6
    assert len(m3.train_loss) == 6


def test_bpr_warm_start_continues(tmp_path):
    from matrix_factorization_tpu.models import BPR

    X = _implicit_interactions(seed=6)
    m = BPR(n_factors=8, n_epochs=4, lr=0.1, batch_size=256, seed=7).fit(X)
    P1 = m.user_features.copy()
    m.fit(X, n_epochs=3, warm_start=True)
    assert len(m.train_loss) == 7
    assert not np.array_equal(m.user_features, P1)  # actually trained on
    # unknown ids under warm_start are a strict-encode error
    bad = pd.DataFrame({"user_id": [999999], "item_id": [0]})
    with pytest.raises(Exception):
        m.fit(bad, warm_start=True)
    # fresh fit resets the loss history
    m.fit(X)
    assert len(m.train_loss) == 4


def test_service_degrades_on_corrupt_model(tmp_path):
    """Failure handling: a corrupt model.pkl degrades to retrieval-only
    (reference api.py soft-fallback policy)."""
    from matrix_factorization_tpu.retrieval.index import (
        build_tfidf_index, save_item_index,
    )

    art = tmp_path / "artifacts"
    art.mkdir()
    save_item_index(build_tfidf_index(IDS, TEXTS, min_df=1),
                    art / "item_index.pkl")
    (art / "model.pkl").write_bytes(b"not a pickle at all")
    svc = RecommendService.from_artifacts(art)
    assert svc.health()["has_model"] is False
    res = svc.recommend("salmon salad", k=2)
    assert res[0]["item_id"] == "r3"


def test_service_model_exception_falls_back_to_zeros(artifacts):
    """A model that raises at predict time contributes zero scores."""

    class Exploding:
        def contains_user(self, u):
            return True

        def predict(self, X, bound_ratings=True):
            raise RuntimeError("boom")

    svc = RecommendService.from_artifacts(artifacts)
    svc.model = Exploding()
    res = svc.recommend("salmon salad", user_id=1, k=2, alpha=0.9)
    assert res[0]["item_id"] == "r3"  # similarity still ranks


def test_checkpoint_mesh_model(tmp_path):
    """A mesh-configured model must checkpoint (mesh is runtime state,
    not persisted)."""
    import jax
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y = lowrank_ratings(n_users=32, n_items=20, density=0.5, seed=22)
    m = KernelMF(n_factors=4, n_epochs=5, lr=0.03, batch_size=64,
                 mesh=make_mesh(n_data=8))
    m.fit(X, y)
    save_model(m, tmp_path / "mesh_ckpt")
    m2 = load_model(tmp_path / "mesh_ckpt")
    assert m2.mesh is None
    np.testing.assert_allclose(m2.predict(X.iloc[:10]), m.predict(X.iloc[:10]),
                               atol=1e-6)


def test_http_batch_and_plan_endpoints(artifacts):
    svc = RecommendService.from_artifacts(artifacts)
    httpd = serve(svc, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/recommend_batch",
            data=json.dumps({"queries": ["salmon salad", "tofu curry"],
                             "k": 2}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["results"][0][0]["item_id"] == "r3"
        assert out["results"][1][0]["item_id"] == "r4"

        req2 = urllib.request.Request(
            f"{base}/plan",
            data=json.dumps({"meals": ["午餐"], "per_meal_k": 2,
                             "avoid": ["peanut"], "use_reranker": False}).encode(),
        )
        with urllib.request.urlopen(req2) as r:
            plan = json.loads(r.read())["plan"]
        assert plan and all(row["item_id"] != "r2" for row in plan)

        # probe: unknown plan field -> 422
        bad = urllib.request.Request(
            f"{base}/plan", data=json.dumps({"nope": 1}).encode()
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 422
    finally:
        httpd.shutdown()


def test_orbax_checkpoint_roundtrip(tmp_path):
    from matrix_factorization_tpu.core.checkpoint import (
        load_model_orbax,
        save_model_orbax,
    )

    X, y = lowrank_ratings(n_users=30, n_items=20, density=0.5, seed=24)
    m = KernelMF(n_factors=4, n_epochs=5, lr=0.02, batch_size=64).fit(X, y)
    save_model_orbax(m, tmp_path / "ock")
    m2 = load_model_orbax(tmp_path / "ock")
    np.testing.assert_allclose(m2.predict(X.iloc[:15]), m.predict(X.iloc[:15]),
                               atol=1e-6)
    assert m2.known_items == m.known_items

    # BPR through orbax: params + aux train pairs round-trip
    from matrix_factorization_tpu.models import BPR

    Xi = _implicit_interactions(seed=9)
    b = BPR(n_factors=8, n_epochs=8, lr=0.1, batch_size=256, seed=3).fit(Xi)
    save_model_orbax(b, tmp_path / "ock_bpr")
    b2 = load_model_orbax(tmp_path / "ock_bpr")
    np.testing.assert_array_equal(b2.item_features, b.item_features)
    assert abs(b2.auc(Xi, n_neg=10, seed=0) - b.auc(Xi, n_neg=10, seed=0)) < 1e-9

    # Popularity through orbax: no params tuple, only aux arrays — must
    # still restore (regression: aux restore was gated on params_class)
    from matrix_factorization_tpu.models import Popularity

    p = Popularity(score="mean").fit(X, y)
    save_model_orbax(p, tmp_path / "ock_pop")
    p2 = load_model_orbax(tmp_path / "ock_pop")
    np.testing.assert_allclose(p2.predict(X.iloc[:15]), p.predict(X.iloc[:15]),
                               atol=1e-6)
    np.testing.assert_array_equal(
        p2.recommend(user=X["user_id"].iloc[0], amount=5)["item_id"].values,
        p.recommend(user=X["user_id"].iloc[0], amount=5)["item_id"].values,
    )


def test_orbax_sharded_native_roundtrip(tmp_path):
    """Sharded-native checkpointing (VERDICT r3 #7): a keep_sharded
    dp_tp_fit-trained KernelMF saves per-shard and restores into the
    SAME sharding on the mesh — no single device ever holds the full
    item table on either side — and serving works from the restore."""
    from matrix_factorization_tpu.core.checkpoint import (
        load_model_orbax,
        save_model_orbax,
    )
    from matrix_factorization_tpu.models.kernel_mf import KernelMF
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y = lowrank_ratings(n_users=64, n_items=48, density=0.5, seed=9)
    mesh = make_mesh(n_data=4, n_model=2)
    m = KernelMF(n_factors=8, n_epochs=8, lr=0.05, reg=0.01, batch_size=64,
                 mesh=mesh, keep_sharded=True, seed=0)
    m.fit(X, y)
    Q = m._params.item_features
    assert len(Q.sharding.device_set) > 1  # actually sharded pre-save
    full_rows = Q.shape[0]
    assert Q.addressable_shards[0].data.shape[0] < full_rows

    save_model_orbax(m, tmp_path / "sharded_ck")

    m2 = load_model_orbax(tmp_path / "sharded_ck", mesh=mesh)
    Q2 = m2._params.item_features
    # restored INTO the sharding: multi-device, per-shard rows < full
    assert len(Q2.sharding.device_set) > 1
    assert Q2.addressable_shards[0].data.shape[0] < full_rows
    assert Q2.sharding == Q.sharding
    np.testing.assert_array_equal(np.asarray(Q2), np.asarray(Q))
    assert m2.keep_sharded and m2.mesh is mesh
    # serving state rebuilt: device top-k answers from the restore
    uid = X["user_id"].iloc[0]
    pd.testing.assert_frame_equal(m2.recommend(user=uid, amount=5),
                                  m.recommend(user=uid, amount=5))
    p1 = m.predict(X.iloc[:50])
    p2 = m2.predict(X.iloc[:50])
    np.testing.assert_allclose(p1, p2, atol=1e-6)

    # meshless fallback restores host-gathered single-device arrays
    m3 = load_model_orbax(tmp_path / "sharded_ck")
    np.testing.assert_allclose(
        np.asarray(m3._params.item_features), np.asarray(Q), atol=0)
    assert not m3.keep_sharded


def test_fit_resumable_carries_mesh(tmp_path):
    """fit_resumable under a mesh: the restored segment re-attaches the
    caller's mesh (runtime objects are never checkpointed)."""
    from matrix_factorization_tpu.core.checkpoint import fit_resumable
    from matrix_factorization_tpu.models.kernel_mf import KernelMF
    from matrix_factorization_tpu.parallel.mesh import make_mesh

    X, y = lowrank_ratings(n_users=48, n_items=32, density=0.5, seed=4)
    mesh = make_mesh(n_data=8)
    m = KernelMF(n_factors=8, n_epochs=8, lr=0.05, reg=0.01, batch_size=64,
                 mesh=mesh, seed=0)
    m = fit_resumable(m, X, y, tmp_path / "ck", total_epochs=8,
                      segment_epochs=4)
    assert m._epochs_done == 8
    assert m.mesh is mesh  # re-attached across the segment reload
    assert m.train_rmse[-1] < m.train_rmse[0]
