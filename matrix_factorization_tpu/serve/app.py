"""Meal-planner frontends over :mod:`serve.planner`.

The reference UI is Streamlit (``project_template/app/streamlit_app.py``);
this module provides:

* ``main()`` — a CLI frontend (always available; prints the plan table);
* ``streamlit_main()`` — the Streamlit UI when the package is installed
  (gated import; absent in this image).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from matrix_factorization_tpu.rank.recipe_features import split_terms
from matrix_factorization_tpu.serve.planner import PlanRequest, plan_meals
from matrix_factorization_tpu.serve.service import RecommendService


def main() -> None:
    p = argparse.ArgumentParser(description="Daily meal-plan recommender")
    p.add_argument("--artifacts", type=str, default="workdir/artifacts")
    p.add_argument("--features", type=str, default="workdir/features")
    p.add_argument("--query", default="",
                   help="free-text mode: retrieve for this query directly "
                   "(the reference UI's second tab)")
    p.add_argument("--goal", default="")
    p.add_argument("--meals", default="早餐,午餐,晚餐")
    p.add_argument("--cuisines", default="")
    p.add_argument("--dietary", default="")
    p.add_argument("--must-include", default="")
    p.add_argument("--avoid", default="")
    p.add_argument("--max-time-min", type=int, default=0)
    p.add_argument("--per-meal-k", type=int, default=3)
    p.add_argument("--alpha", type=float, default=0.0)
    p.add_argument("--no-reranker", action="store_true")
    p.add_argument("--diversity-penalty", type=float, default=0.6)
    p.add_argument("--json", action="store_true", help="print JSON rows")
    a = p.parse_args()

    service = RecommendService.from_artifacts(
        Path(a.artifacts),
        Path(a.features) if Path(a.features).exists() else None,
    )
    req = PlanRequest(
        goal=a.goal,
        meals=["不限"] if a.query else split_terms(a.meals),
        extra=a.query,
        cuisines=split_terms(a.cuisines),
        dietary=split_terms(a.dietary),
        must_include=split_terms(a.must_include),
        avoid=split_terms(a.avoid),
        max_time_min=a.max_time_min,
        per_meal_k=a.per_meal_k,
        alpha=a.alpha,
        use_reranker=not a.no_reranker,
        diversity_penalty=a.diversity_penalty,
    )
    rows = plan_meals(service, req)
    if a.json:
        print(json.dumps(rows, ensure_ascii=False, default=str))
        return
    if not rows:
        print("no candidates after filtering — relax the constraints or "
              "increase candidate_k")
        return
    current = None
    for r in rows:
        if r["meal"] != current:
            current = r["meal"]
            print(f"\n== {current} ==")
        extras = " ".join(
            f"{k}={r[k]:.1f}" for k in ("time_min", "protein_score",
                                        "low_calorie_score") if k in r
        )
        print(f"  {r['rank']}. [{r['item_id']}] score={r['score']:.3f} "
              f"{extras}\n     {r['preview']}")


def streamlit_main() -> None:  # pragma: no cover - needs streamlit
    try:
        import streamlit as st
    except ImportError as e:
        raise ImportError(
            "streamlit is not installed; use the CLI frontend: "
            "python -m matrix_factorization_tpu.serve.app"
        ) from e

    st.title("Meal-plan recommender")
    artifacts = st.sidebar.text_input("artifacts dir", "workdir/artifacts")
    features = st.sidebar.text_input("features dir", "workdir/features")
    service = RecommendService.from_artifacts(
        Path(artifacts), Path(features) if Path(features).exists() else None
    )
    goal = st.selectbox("goal", ["随便推荐", "减脂/低卡", "增肌/高蛋白",
                                 "控糖/低碳", "清淡/低盐"])
    daily = st.checkbox("daily plan (3 meals)", True)
    must = st.text_input("must include (comma separated)", "")
    avoid = st.text_input("avoid (comma separated)", "")
    max_time = st.number_input("max cook time (min, 0=any)", 0, 240, 0)
    if st.button("recommend"):
        req = PlanRequest(
            goal=goal,
            meals=["早餐", "午餐", "晚餐"] if daily else ["不限"],
            must_include=split_terms(must),
            avoid=split_terms(avoid),
            max_time_min=int(max_time),
        )
        rows = plan_meals(service, req)
        import pandas as pd

        st.dataframe(pd.DataFrame(rows))


if __name__ == "__main__":
    main()
