"""Batch pipeline CLIs (``python -m matrix_factorization_tpu.pipeline.<stage>``).

Stateless file-to-file transforms over the ``data/ features/ artifacts/``
directory contract, mirroring the reference's
``project_template/pipeline/`` stages P2-P16 (SURVEY.md §2.3).
"""
