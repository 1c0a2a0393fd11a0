"""Device-mesh and sharding helpers.

The FRESCO workload's natural parallel axes on TPU:
  * ``data``  — the frame axis of a keyframe batch (and the CFG axis).
    The reference is single-GPU (SURVEY.md §2.6); here the frame axis is
    sharded over ICI and XLA inserts the all-gathers needed by
    cross-frame / trajectory attention.
  * ``model`` — tensor parallelism over attention heads / MLP channels
    of the UNet (optional; SD1.5 fits one chip, used for scale-out).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: int = 1,
    *,
    devices: list | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, (data_axis, model_axis))


def shard_frames(x, mesh: Mesh, data_axis: str = "data"):
    """Shard a [F, ...] (frame-major) array over the data axis."""
    spec = P(data_axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def frame_spec(ndim: int, data_axis: str = "data") -> P:
    return P(data_axis, *([None] * (ndim - 1)))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
