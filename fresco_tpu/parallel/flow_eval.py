"""GMFlow evaluation harness (TPU-native).

Replaces the reference's torch evaluation stack (reference
src/ebsynth/deps/gmflow/evaluate.py:108-565 and loss.py:4-38): the
standard flow benchmarks' metrics — EPE, >1/3/5px rates, speed-bucketed
EPE (s0-10 / s10-40 / s40+), KITTI F1-all = (epe>3 & epe/mag>0.05) —
plus the replicate-pad InputPadder equivalence (utils/utils.py:5-23)
so arbitrary frame sizes hit a small set of jit shapes.
"""
from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

import jax
import jax.numpy as jnp


def pad_to_multiple(img: np.ndarray, factor: int = 16, mode: str = "sintel"):
    """Replicate-pad H/W up to a multiple of ``factor``.

    Returns (padded, crop) where ``crop`` recovers the original region
    (sintel: centered; kitti: pad bottom only — utils/utils.py:8-23).
    Default 16 = upsample_factor 8 x attn_splits 2: the 1/8-res feature
    map must split evenly into GMFlow's swin windows."""
    h, w = img.shape[-3:-1]
    ph = (-h) % factor
    pw = (-w) % factor
    if mode == "sintel":
        pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
    else:  # kitti: reference F.pad(..., [.., .., 0, pad_ht]) — the height
        # pair is (top, bottom), i.e. BOTTOM-only padding (r2 advisor fix)
        pads = ((0, ph), (pw // 2, pw - pw // 2))
    full = [(0, 0)] * (img.ndim - 3) + [pads[0], pads[1], (0, 0)]
    out = np.pad(img, full, mode="edge")
    crop = (slice(pads[0][0], pads[0][0] + h), slice(pads[1][0], pads[1][0] + w))
    return out, crop


def flow_metrics(pred: np.ndarray, gt: np.ndarray,
                 valid: np.ndarray | None = None,
                 speed_buckets: bool = False) -> dict:
    """Per-pair metrics over valid pixels (evaluate.py:144-176,518-536)."""
    epe = np.sqrt(((pred - gt) ** 2).sum(-1))
    mag = np.sqrt((gt ** 2).sum(-1))
    v = np.ones_like(epe, bool) if valid is None else (valid >= 0.5)
    e = epe[v]
    out = {
        "epe": float(e.mean()) if e.size else float("nan"),
        "1px": float((e > 1).mean()) if e.size else float("nan"),
        "3px": float((e > 3).mean()) if e.size else float("nan"),
        "5px": float((e > 5).mean()) if e.size else float("nan"),
        "f1_all": float(
            100.0 * ((e > 3.0) & (e / np.maximum(mag[v], 1e-12) > 0.05)).mean()
        ) if e.size else float("nan"),
        "n_valid": int(e.size),
    }
    if speed_buckets:
        for name, m in (
            ("s0_10", v & (mag < 10)),
            ("s10_40", v & (mag >= 10) & (mag <= 40)),
            ("s40plus", v & (mag > 40)),
        ):
            out[name] = float(epe[m].mean()) if m.any() else float("nan")
    return out


def make_flow_fn(gmflow, params) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """Jitted forward returning the FORWARD flow only ([B,H,W,2]);
    shapes are padded to /8 so jit variants stay bounded."""

    @jax.jit
    def fwd(img0, img1):
        bi = gmflow.apply(params, img0, img1)
        return bi[: img0.shape[0]]

    def run(img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        p0, crop = pad_to_multiple(img0)
        p1, _ = pad_to_multiple(img1)
        flow = np.asarray(fwd(jnp.asarray(p0), jnp.asarray(p1)))
        return flow[:, crop[0], crop[1]]

    return run


def validate(
    gmflow,
    params,
    samples: Iterable,
    *,
    speed_buckets: bool = False,
    max_samples: int | None = None,
    pad_mode: str = "sintel",
) -> dict:
    """Dataset validation: mean metrics over per-pixel pools, matching
    the reference's concatenate-then-mean protocol (evaluate.py:161-176).

    ``samples`` yields (img1, img2, flow_gt, valid_or_None) numpy tuples
    — e.g. ``(idx.load(i) for i in range(len(idx)))`` with a
    ``flow_data.FlowIndex``."""

    @jax.jit
    def fwd(img0, img1):
        return gmflow.apply(params, img0, img1)[:1]

    epes, outs = [], []
    buckets = {"s0_10": [], "s10_40": [], "s40plus": []}
    for n, (img1, img2, gt, valid) in enumerate(samples):
        if max_samples is not None and n >= max_samples:
            break
        p0, crop = pad_to_multiple(
            np.asarray(img1, np.float32)[None], mode=pad_mode
        )
        p1, _ = pad_to_multiple(np.asarray(img2, np.float32)[None], mode=pad_mode)
        flow = np.asarray(fwd(jnp.asarray(p0), jnp.asarray(p1)))[0]
        flow = flow[crop[0], crop[1]]

        epe = np.sqrt(((flow - gt) ** 2).sum(-1)).ravel()
        mag = np.sqrt((gt ** 2).sum(-1)).ravel()
        v = np.ones_like(epe, bool) if valid is None else (valid.ravel() >= 0.5)
        epes.append(epe[v])
        outs.append(((epe[v] > 3.0) & (epe[v] / np.maximum(mag[v], 1e-12) > 0.05)))
        if speed_buckets:
            for name, m in (
                ("s0_10", v & (mag < 10)),
                ("s10_40", v & (mag >= 10) & (mag <= 40)),
                ("s40plus", v & (mag > 40)),
            ):
                if m.any():
                    buckets[name].append(epe[m])

    if not epes:
        return {}
    epe_all = np.concatenate(epes)
    out = {
        "epe": float(epe_all.mean()),
        "1px": float((epe_all > 1).mean()),
        "3px": float((epe_all > 3).mean()),
        "5px": float((epe_all > 5).mean()),
        "f1_all": float(100.0 * np.concatenate(outs).mean()),
        "n_pairs": len(epes),
    }
    if speed_buckets:
        for k, vals in buckets.items():
            out[k] = float(np.concatenate(vals).mean()) if vals else float("nan")
    return out
