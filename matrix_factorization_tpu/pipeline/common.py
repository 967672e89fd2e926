"""Shared pipeline plumbing: directory contract + schema guards.

Reference: ``project_template/pipeline/common.py:7-34``.
"""

from __future__ import annotations

from pathlib import Path

from matrix_factorization_tpu.core.config import Paths, require_columns  # noqa: F401


def default_paths(root: str | Path | None = None) -> Paths:
    """Paths rooted at the given dir (default: cwd /workdir)."""
    return Paths(Path(root) if root else Path.cwd() / "workdir").ensure()


def add_paths_arg(parser) -> None:
    parser.add_argument(
        "--root", type=str, default=None,
        help="pipeline root dir (creates data/ features/ artifacts/)",
    )
    parser.add_argument(
        "--platform", type=str, default=None, choices=["cpu", "tpu", "axon"],
        help="force the jax platform (env vars are too late here: this "
        "image's sitecustomize imports jax before any CLI code runs)",
    )


def cli_setup(args) -> Paths:
    """Apply --platform and return the directory contract."""
    platform = getattr(args, "platform", None)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return default_paths(args.root)
