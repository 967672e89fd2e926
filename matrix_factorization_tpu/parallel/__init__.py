"""Multi-chip scaling: device meshes, sharded training, distributed top-k.

The reference has no distributed layer at all (SURVEY.md §2.4: its training
loop is intentionally single-threaded serial SGD).  This package is the
TPU-native replacement: ``jax.sharding.Mesh`` + ``shard_map`` with XLA
collectives over ICI (``psum`` for gradient/segment reductions,
``all_gather`` for catalog scoring, ``ppermute`` where a ring helps) —
never host-side threading.
"""

from matrix_factorization_tpu.parallel.mesh import make_mesh
