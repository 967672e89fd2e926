"""Reranker A/B: logreg (reference parity) vs the on-device MLP upgrade
(VERDICT r2 #9 — "Done = P/R/NDCG comparison in RESULTS.md").

Protocol mirrors the weak-supervision eval the reference's reranker is
judged by (``project_template/pipeline/train_reranker.py`` +
``evaluate_llm.py``-style ranking): a synthetic recipe corpus, queries
synthesized from HELD-OUT seed items (never seen in training), the seed
item is the single relevant document, candidates come from TF-IDF
retrieval, and each ranker re-orders the candidate list.  Metrics:
hit-rate@5 (== recall@5 with one relevant item), precision@5, NDCG@10,
and MRR, plus the sim-only (no reranker) baseline.

Deterministic and CPU-friendly (host featurization dominates), so the
numbers are machine-stable.  Run:
    PYTHONPATH=/root/repo python -u benchmarks/reranker_ab.py
"""

import json
import random

import numpy as np
import pandas as pd

PROTEINS = ["chicken breast", "salmon", "tofu", "beef", "shrimp", "lentils",
            "turkey", "egg", "tuna", "pork"]
CARBS = ["pasta", "rice", "quinoa", "potato", "flour", "oats", "noodles",
         "bread"]
VEG = ["broccoli", "lettuce", "spinach", "tomato", "onion", "pepper",
       "mushroom", "zucchini", "kale", "carrot"]
FATS = ["olive oil", "butter", "cream", "cheese", "peanut butter", "walnut",
        "almond", "coconut milk"]
METHODS = [("grill", 15), ("bake", 35), ("fry", 10), ("roast", 50),
           ("steam", 20), ("simmer", 40)]


def make_corpus(n_items: int, seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for j in range(n_items):
        prot = rng.choice(PROTEINS)
        carb = rng.choice(CARBS)
        vegs = rng.sample(VEG, rng.randint(1, 3))
        fat = rng.choice(FATS)
        method, t = rng.choice(METHODS)
        t += rng.randint(-5, 10)
        title = f"{method}ed {prot} with {carb}"
        ing = "; ".join([prot, carb, fat] + vegs)
        text = (f"title: {title}\ningredients: {ing}\n"
                f"directions: {method} {prot} {t} minutes and serve")
        rows.append({"item_id": str(j), "text": text})
    return pd.DataFrame(rows)


def evaluate(payload, index, items, seed_rows, rng, candidate_k=30, k=5):
    """Rank candidates for queries from held-out seeds; the seed is the
    one relevant item."""
    from matrix_factorization_tpu.rank.reranker import (
        generate_queries, rerank_scores,
    )
    from matrix_factorization_tpu.retrieval.search import (
        encode_query_for_index, search_topk_pos,
    )

    hits = ndcg = mrr = 0.0
    n_q = 0
    for _, row in seed_rows.iterrows():
        for q in generate_queries(row["text"], rng):
            qvec = encode_query_for_index(index, q)
            cand = search_topk_pos(index, qvec, k=candidate_k)
            ids = [str(c[1]) for c in cand]
            if row["item_id"] not in ids:
                continue
            n_q += 1
            texts_sims = [(index.texts[c[0]], float(c[2])) for c in cand]
            if payload is None:  # sim-only baseline: retrieval order
                order = np.arange(len(cand))
            else:
                scores = rerank_scores(payload, q, texts_sims,
                                       item_ids=[c[1] for c in cand])
                order = np.argsort(-scores, kind="stable")
            ranked = [ids[j] for j in order]
            rank = ranked.index(row["item_id"]) + 1
            hits += 1.0 if rank <= k else 0.0
            ndcg += 1.0 / np.log2(rank + 1) if rank <= 10 else 0.0
            mrr += 1.0 / rank
    return {
        "n_queries": n_q,
        f"hit_rate@{k}": round(hits / n_q, 4),
        f"precision@{k}": round(hits / n_q / k, 4),
        "ndcg@10": round(ndcg / n_q, 4),
        "mrr": round(mrr / n_q, 4),
    }


def main():
    from matrix_factorization_tpu.pipeline.train_reranker import train_reranker
    from matrix_factorization_tpu.retrieval.index import build_tfidf_index

    items = make_corpus(600, seed=0)
    train_items = items.iloc[:400].reset_index(drop=True)
    test_items = items.iloc[400:500].reset_index(drop=True)
    index = build_tfidf_index(items["item_id"].tolist(),
                              items["text"].tolist(), min_df=1)

    # the query sampler injects noise (~±0.03 hit@5 between eval seeds),
    # so each ranker is scored on 3 query draws and the mean reported
    EVAL_SEEDS = (123, 7, 99)
    for model_type in (None, "logreg", "mlp"):
        if model_type is None:
            payload = None
            name = "sim_only"
        else:
            payload = train_reranker(items=train_items, index=index,
                                     n_seed_items=400, candidate_k=30,
                                     n_neg=3, seed=0,
                                     model_type=model_type)
            name = model_type
        runs = [evaluate(payload, index, items, test_items,
                         random.Random(s)) for s in EVAL_SEEDS]
        mean = {k: round(float(np.mean([r[k] for r in runs])), 4)
                for k in runs[0]}
        print(json.dumps({"ranker": name, "eval_seeds": len(EVAL_SEEDS),
                          **mean}), flush=True)


if __name__ == "__main__":
    main()
