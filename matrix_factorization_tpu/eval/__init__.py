"""Offline evaluation: rating metrics, Top-K harness, hybrid ablation,
constraint-violation judge (keywords + optional LLM)."""
