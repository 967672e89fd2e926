"""Core infrastructure: id vocabularies, config, rng, checkpointing."""
