"""Host-side utilities: splits, metrics, timing/profiling."""
