"""Failure detection: numerical-health guards for long pipeline runs.

The reference surfaces failures only as uncaught exceptions (SURVEY.md
§5 "failure detection: none").  Here batch outputs are checked for
non-finite values and out-of-range latents between device calls, so a
diverging batch (bad checkpoint, fp overflow) fails fast with a useful
message instead of writing black frames for an hour.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class NumericalHealthError(RuntimeError):
    pass


def check_finite(name: str, *arrays, max_abs: float | None = None) -> None:
    """Host-side check (forces a sync — call once per batch, not per step)."""
    for i, a in enumerate(arrays):
        if a is None:
            continue
        x = np.asarray(a)
        if not np.all(np.isfinite(x)):
            n_bad = int(np.sum(~np.isfinite(x)))
            raise NumericalHealthError(
                f"{name}[{i}]: {n_bad}/{x.size} non-finite values "
                f"(dtype {x.dtype}, shape {x.shape})"
            )
        if max_abs is not None and np.abs(x).max() > max_abs:
            raise NumericalHealthError(
                f"{name}[{i}]: |max| {np.abs(x).max():.3g} exceeds {max_abs}"
            )


def finite_or_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side sanitation (no sync): replace non-finite with 0."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
