"""Mesh-parallel scene sweeps (the rebuild's data-parallel axis — the
reference has no distributed execution at all, SURVEY.md §2.4)."""

from .checkpoint import (  # noqa: F401
    run_sweep_checkpointed,
    save_checkpoint,
    load_checkpoint,
)
from . import multihost  # noqa: F401
from .sweep import (  # noqa: F401
    SweepSpec,
    SceneResult,
    SweepSummary,
    make_mesh,
    run_scene,
    localize_batch,
    monte_carlo_sweep,
)

__all__ = [
    "multihost",
    "run_sweep_checkpointed",
    "save_checkpoint",
    "load_checkpoint",
    "SweepSpec",
    "SceneResult",
    "SweepSummary",
    "make_mesh",
    "run_scene",
    "localize_batch",
    "monte_carlo_sweep",
]
