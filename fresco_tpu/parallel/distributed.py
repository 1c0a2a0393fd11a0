"""Multi-host (multi-slice / DCN) initialization and mesh layout.

TPU-native replacement for the reference's launcher-specific
distributed init (reference src/ebsynth/deps/gmflow/utils/dist_utils.py:
12-71 — torch.distributed over NCCL with pytorch/MPI/Slurm rendezvous):
one ``initialize()`` built on ``jax.distributed`` (coordinator-based
rendezvous; autodetects TPU pod environments), plus a host-aware mesh
builder that keeps the ``model`` (tensor-parallel) axis inside a host's
ICI domain and spans hosts only along ``data`` — collectives for TP ride
ICI, only the (rare, small) data-parallel traffic crosses DCN, per the
standard TPU scaling recipe.
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


# env vars whose presence marks a multi-process launch we can rendezvous
# from without arguments: TPU pod runtimes export worker topology; Slurm
# exports rank (reference dist_utils.py:40-71 reads the same Slurm vars).
_CLUSTER_ENV_VARS = (
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "SLURM_PROCID",
)


def _already_initialized() -> bool:
    """Whether jax.distributed.initialize has already run — WITHOUT
    touching backend-initializing APIs (jax.process_count() would
    initialize XLA and make a later initialize() impossible)."""
    try:
        from jax._src import distributed as _jd

        return getattr(_jd.global_state, "client", None) is not None
    except Exception:  # pragma: no cover - private-API drift
        return False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join (or start) the multi-host cluster.

    All-None on TPU pods autodetects from the runtime environment
    (the jax.distributed contract); explicit args mirror the
    reference's MPI/Slurm rendezvous (dist_utils.py:33-71) for
    CPU/GPU fleets.  Returns True if distributed mode is active,
    False for the single-process fallback (never raises — single-host
    dev boxes just proceed locally).

    Must run before any backend-initializing JAX call: this function
    deliberately avoids jax.process_count()/jax.default_backend() and
    decides the no-args autodetect path from cluster env vars instead
    (r2 advisor: probing the backend first made initialize() always a
    no-op that silently degraded N-host launches to N independent runs).
    """
    if _already_initialized():
        return jax.process_count() > 1
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif "SLURM_PROCID" in os.environ and num_processes is not None:
        # Slurm rendezvous parity (dist_utils.py:40-71)
        kwargs["process_id"] = int(os.environ["SLURM_PROCID"])
    if not kwargs and not any(v in os.environ for v in _CLUSTER_ENV_VARS):
        return False  # single-process launch: nothing to rendezvous with
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError, TypeError) as e:  # pragma: no cover
        # expected failures ("never raises" contract): RuntimeError when
        # XLA was already initialized by an earlier import; ValueError/
        # TypeError from jax.distributed's argument validation on
        # incomplete rendezvous info — fall back, loudly
        print(f"[fresco_tpu] single-process mode ({e})")
        return False
    return jax.process_count() > 1


def is_main_process() -> bool:
    """rank-0 check (dist_utils.py:74-86 get_dist_info + master-only
    print convention)."""
    return jax.process_index() == 0


def make_global_mesh(model: int = 1, *, data: int | None = None) -> Mesh:
    """(data × model) mesh over ALL processes' devices.

    Device order is host-major (jax.devices() global order), so with
    ``model`` ≤ devices-per-host each model group sits inside one
    host's ICI domain and the data axis is the only one crossing DCN.
    """
    devices = jax.devices()
    per_host = max(jax.local_device_count(), 1)
    if model > per_host or per_host % model != 0:
        # non-divisors would make the row-major (data, model) reshape
        # straddle host boundaries even when model < per_host
        raise ValueError(
            f"model={model} must divide devices-per-host ({per_host}); "
            "TP groups must stay inside the ICI domain"
        )
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def shard_batch_per_process(n_items: int) -> slice:
    """This process's contiguous slice of a globally-ordered batch —
    the loader-side counterpart of frame_sharding for multi-host input
    pipelines (each host feeds only its addressable shard)."""
    per = n_items // max(jax.process_count(), 1)
    start = jax.process_index() * per
    return slice(start, start + per)
