"""GMFlow fine-tuning on TPU meshes.

The reference vendors GMFlow's full torch-DDP training harness
(reference src/ebsynth/deps/gmflow/main.py, loss.py, utils/dist_utils.py
— NCCL/MPI/Slurm, SURVEY.md §2.3 #20-21), unused at FRESCO runtime.
This is the mesh-native equivalent: the standard supervised EPE
objective plus an unsupervised photometric+smoothness objective for
video adaptation, one pjit-able train step, dp over the pair batch.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from fresco_tpu.ops.warp import flow_warp


def epe_loss(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Average end-point error (gmflow loss.py semantics).

    pred/gt: [B, H, W, 2]; valid: [B, H, W] or None."""
    epe = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1) + 1e-12)
    if valid is None:
        return jnp.mean(epe)
    return jnp.sum(epe * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def flow_sequence_loss(
    flow_preds: list[jnp.ndarray] | jnp.ndarray,
    gt: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    gamma: float = 0.9,
    max_flow: float = 400.0,
):
    """Reference training objective (gmflow loss.py:4-38): gamma-weighted
    L1 over the prediction sequence, pixels masked by validity AND
    gt-magnitude < max_flow.  Returns (loss, metrics dict with epe and
    >1/3/5px rates on the final prediction)."""
    if not isinstance(flow_preds, (list, tuple)):
        flow_preds = [flow_preds]
    mag = jnp.sqrt(jnp.sum(gt**2, axis=-1))
    v = (mag < max_flow)
    if valid is not None:
        v = v & (valid >= 0.5)
    vf = v.astype(jnp.float32)[..., None]
    n = len(flow_preds)
    loss = 0.0
    for i, p in enumerate(flow_preds):
        w = gamma ** (n - i - 1)
        loss = loss + w * jnp.mean(vf * jnp.abs(p - gt))
    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - gt) ** 2, axis=-1))
    denom = jnp.maximum(jnp.sum(vf[..., 0]), 1.0)
    metrics = {
        "epe": jnp.sum(epe * vf[..., 0]) / denom,
        "1px": jnp.sum((epe > 1) * vf[..., 0]) / denom,
        "3px": jnp.sum((epe > 3) * vf[..., 0]) / denom,
        "5px": jnp.sum((epe > 5) * vf[..., 0]) / denom,
    }
    return loss, metrics


def photometric_smoothness_loss(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    flow: jnp.ndarray,
    smooth_weight: float = 0.1,
):
    """Unsupervised objective: census-free photometric L1 + first-order
    edge-aware smoothness (for adapting flow to a style domain)."""
    warped = flow_warp(img1, flow)
    photo = jnp.mean(jnp.abs(img0 - warped))
    gx_i = jnp.mean(jnp.abs(img0[:, :, 1:] - img0[:, :, :-1]), axis=-1, keepdims=True)
    gy_i = jnp.mean(jnp.abs(img0[:, 1:] - img0[:, :-1]), axis=-1, keepdims=True)
    gx_f = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1])
    gy_f = jnp.abs(flow[:, 1:] - flow[:, :-1])
    smooth = jnp.mean(gx_f * jnp.exp(-gx_i)) + jnp.mean(gy_f * jnp.exp(-gy_i))
    return photo + smooth_weight * smooth


@flax.struct.dataclass
class FlowTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_flow_train_state(params, tx):
    return FlowTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def flow_train_step(
    gmflow,
    tx: optax.GradientTransformation,
    state: FlowTrainState,
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    gt_flow: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
):
    """One step; supervised when gt_flow given, else unsupervised.
    Shard (img0, img1, gt) over the 'data' mesh axis and params with
    parallel.sharding.shard_model_params for distributed runs."""

    def loss_fn(params):
        flow_bidir = gmflow.apply(params, img0, img1)
        b = img0.shape[0]
        fwd = flow_bidir[:b]
        if gt_flow is not None:
            loss, _ = flow_sequence_loss(fwd, gt_flow, valid)
            return loss
        return photometric_smoothness_loss(img0 / 255.0, img1 / 255.0, fwd)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return FlowTrainState(params, opt_state, state.step + 1), loss
