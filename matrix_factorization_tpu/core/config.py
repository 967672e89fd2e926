"""Typed configuration shared by the library, CLIs and serving.

The reference scatters configuration across constructor kwargs, 13 argparse
CLIs and a ``Paths`` dataclass (``project_template/pipeline/common.py:7-28``).
Here one typed-config module covers all of it.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# TPU tiling constants (f32 min tile is 8 x 128 — see pallas guide).
LANE = 128
SUBLANE = 8


@dataclass(frozen=True)
class SGDConfig:
    """Static (trace-time) configuration of a segment-SGD run."""

    kernel: str = "linear"  # linear | sigmoid | rbf
    n_factors: int = 100
    lr: float = 0.01
    reg: float = 1.0
    gamma: float = 0.01
    min_rating: float = 0.0
    max_rating: float = 5.0
    batch_size: int = 1024
    update_user_params: bool = True
    update_item_params: bool = True
    compute_epoch_rmse: bool = True
    # 'batch' = host pre-shuffle once + per-epoch batch-order shuffle (fast);
    # 'full'  = per-epoch element permutation (reference-exact semantics);
    # 'none'  = fixed visit order (debugging / sequential-parity mode)
    shuffle: str = "batch"
    # 'auto' = use tile-aggregated updates when the packed data carries
    # tile metadata (MXU one-hot aggregation instead of per-row scatter;
    # identical update up to float summation order); 'none' = always
    # per-row scatter.  'full' shuffle always uses the scatter path.
    aggregate: str = "auto"

    @property
    def padded_factors(self) -> int:
        """Extended row width: factors + bias + const column, lane-padded."""
        return max(LANE, _round_up(self.n_factors + 2, LANE))

    @property
    def a(self) -> float:
        """Rescale offset for sigmoid/rbf kernels (reference kernels.py:67)."""
        return self.min_rating

    @property
    def c(self) -> float:
        """Rescale range for sigmoid/rbf kernels (reference kernels.py:68)."""
        return self.max_rating - self.min_rating


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. ``data`` shards the rating stream, ``model``
    shards the item table for full-catalog scoring."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1 = all devices
    model_parallel: int = 1


@dataclass
class Paths:
    """Directory contract for the batch pipeline (reference common.py:7-28)."""

    root: Path
    data: Path = field(init=False)
    features: Path = field(init=False)
    artifacts: Path = field(init=False)

    def __post_init__(self):
        self.root = Path(self.root)
        self.data = self.root / "data"
        self.features = self.root / "features"
        self.artifacts = self.root / "artifacts"

    def ensure(self) -> "Paths":
        for p in (self.data, self.features, self.artifacts):
            p.mkdir(parents=True, exist_ok=True)
        return self


def require_columns(df, columns, name: str = "dataframe") -> None:
    """Schema guard used by every pipeline stage (reference common.py:31-34)."""
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"{name} is missing required columns: {missing}")


def config_to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Any, path: os.PathLike) -> None:
    Path(path).write_text(json.dumps(config_to_dict(cfg), indent=2, default=str))


def load_json(path: os.PathLike) -> Dict[str, Any]:
    return json.loads(Path(path).read_text())
