"""Checkpoint / resume for pipeline state.

The reference persists nothing mid-run except frames on disk — the
inter-batch ``record_latents`` are memory-only, so a crash loses the
whole diffusion phase (SURVEY.md §5).  Here the translated-batch state
(record latents, batch index, keys) checkpoints via orbax so long-video
runs resume mid-sequence, and converted model params can be cached to
avoid re-converting torch checkpoints every launch.
"""
from __future__ import annotations

import os
from typing import Any


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_pipeline_state(path: str, state: dict[str, Any]) -> None:
    """state: {'batch_ind': int, 'keys': list[int], 'record': array|None}."""
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def load_pipeline_state(path: str) -> dict[str, Any] | None:
    if not os.path.exists(path):
        return None
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def save_params(path: str, params) -> None:
    ocp = _ocp()
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), params, force=True)


def load_params(path: str):
    if not os.path.exists(path):
        return None
    ocp = _ocp()
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
