"""SPMD sharding for the FRESCO-TPU stack.

The reference is single-GPU (SURVEY.md §2.6); its only distribution is
the vendored GMFlow trainer's NCCL DDP.  Here scaling is mesh-native:

  * ``data`` axis — frames (and the CFG pair) of a keyframe batch.
    Cross-frame/trajectory attention gathers across it; XLA inserts the
    all-gathers over ICI from the shardings alone.
  * ``model`` axis — tensor parallelism: attention QKV/out and MLP
    kernels are sharded over heads/channels (Megatron-style column/row
    split); GSPMD places the psum at each pair boundary.

No explicit collectives anywhere — shardings + pjit only (the
TPU-native replacement for the reference's dist_utils.py NCCL/MPI/Slurm
backends, SURVEY.md §2.6).
"""
from __future__ import annotations

import re

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int, model: int = 1, *, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


# Megatron split: column-parallel for QKV / up-projections, row-parallel
# for output / down-projections.
_COLUMN_PAT = re.compile(
    r"(to_q|to_k|to_v|q_proj|k_proj|v_proj|proj_in|linear_1|ff_geglu|mlp_fc1|mlp_0)"
)
_ROW_PAT = re.compile(r"(to_out|out_proj|proj_out|linear_2|ff_out|mlp_fc2|mlp_2|merge)")


def _spec_for(path: tuple[str, ...], value) -> P:
    name = "/".join(path)
    if value.ndim == 2:
        if _COLUMN_PAT.search(name):
            return P(None, "model")
        if _ROW_PAT.search(name):
            return P("model", None)
    if value.ndim == 4 and value.shape[-1] % 2 == 0 and "conv" in name.lower():
        # conv kernels: shard output channels; GSPMD all-gathers before
        # the following GroupNorm
        return P(None, None, None, "model")
    return P()


def shard_model_params(params, mesh: Mesh):
    """NamedShardings for a model param tree (TP over the 'model' axis)."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        spec = _spec_for(path, tree)
        # only shard if divisible
        for ax, name in enumerate(spec):
            if name == "model" and tree.shape[ax] % mesh.shape["model"] != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return walk(params)


def frame_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard a frame-major array's leading axis over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
