"""Recipes and Steam dataset preparation stages."""

import sys

import numpy as np
import pandas as pd


def run_cli(module, argv):
    old = sys.argv
    sys.argv = [module.__name__] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def test_prepare_recipes(tmp_path):
    from matrix_factorization_tpu.pipeline import prepare_recipes

    csv = tmp_path / "full_dataset.csv"
    pd.DataFrame(
        {
            "title": ["Pancakes", "Soup"],
            "ingredients": ['["flour", "milk", "eggs"]', '["water", "salt"]'],
            "directions": ['["Mix well.", "Cook 10 minutes."]', '["Boil 1 hour."]'],
            "link": ["a", "b"],
            "NER": ['["flour"]', '["salt"]'],
        }
    ).to_csv(csv, index=False)
    run_cli(prepare_recipes, ["--root", str(tmp_path), "--csv", str(csv)])
    items = pd.read_parquet(tmp_path / "data" / "items.parquet")
    assert len(items) == 2
    t = items["text"].iloc[0]
    assert t.startswith("title: Pancakes")
    assert "ingredients: flour; milk; eggs" in t
    assert "directions: Mix well. Cook 10 minutes." in t

    # parsers downstream understand the produced format
    from matrix_factorization_tpu.rank.recipe_features import (
        extract_ingredient_phrases,
        extract_time_minutes,
    )

    assert extract_ingredient_phrases(t) == {"flour", "milk", "eggs"}
    assert extract_time_minutes(t) == 10
    assert extract_time_minutes(items["text"].iloc[1]) == 60


def test_prepare_steam(tmp_path):
    from matrix_factorization_tpu.pipeline import prepare_steam

    csv = tmp_path / "steam-200k.csv"
    rows = [
        "101,Half-Life,purchase,1.0,0",
        "101,Half-Life,play,50.0,0",
        "101,Half-Life,play,10.0,0",  # dedup by max -> 50
        "102,Portal,play,5.0,0",
        "103,Portal,purchase,1.0,0",  # purchase only: no rating row
    ]
    csv.write_text("\n".join(rows) + "\n")
    run_cli(prepare_steam, ["--root", str(tmp_path), "--csv", str(csv)])
    ratings = pd.read_parquet(tmp_path / "data" / "ratings.parquet")
    items = pd.read_parquet(tmp_path / "data" / "items.parquet")
    assert len(ratings) == 2  # two (user, game) play pairs after dedup
    assert set(items["item_id"]) == {"Half-Life", "Portal"}
    # log1p + minmax onto [0.5, 5]: max hours (50) -> 5.0, min (5) -> 0.5
    by_user = ratings.set_index("user_id")["rating"]
    assert by_user[101] == 5.0
    assert by_user[102] == 0.5
