"""Datasets: synthetic generators, MovieLens/recipes/steam preparation."""
