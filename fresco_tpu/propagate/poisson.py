"""Screened-Poisson gradient fusion on device.

Equivalent of reference src/ebsynth/blender/poisson_fusion.py: fuse the
gradients of the two propagated candidates by the selection mask and
solve min ||w∇x − w g||² + ||x − blend||² per Lab channel.  The
reference builds an explicit sparse system and runs CPU ``lsqr`` per
frame (SURVEY.md #32, a CPU hot spot); here the normal equations
(w²∇ᵀ∇ + I) x = w²∇ᵀg + blend are solved in CLOSED FORM by DCT-II
diagonalization of the Neumann Laplacian — exact in one forward +
inverse transform pair, batched over the 3 channels at once (the
earlier matrix-free CG formulation is superseded; see
``screened_poisson``).

Gradient convention matches the reference (poisson_fusion.py:64-70):
gx[i,j] = x[i,j] − x[i+1,j] (rows), gy[i,j] = x[i,j] − x[i,j+1] (cols),
defined on the first h−1 rows / w−1 cols.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _grad(x):
    gx = x[:-1, :, :] - x[1:, :, :]
    gy = x[:, :-1, :] - x[:, 1:, :]
    return gx, gy


def _grad_T(gx, gy, h, w):
    """Adjoint of _grad: scatter the divergence."""
    out = jnp.zeros((h, w, gx.shape[-1]), gx.dtype)
    out = out.at[:-1].add(gx)
    out = out.at[1:].add(-gx)
    out = out.at[:, :-1].add(gy)
    out = out.at[:, 1:].add(-gy)
    return out


@functools.partial(jax.jit, static_argnames=("iters",))
def screened_poisson(
    blend: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 100,
):
    """Solve (w²∇ᵀ∇ + I)x = w²∇ᵀg + blend EXACTLY via DCT
    diagonalization.  blend [H,W,3] (mean-centered per channel by
    caller), gx [H-1,W,3], gy [H,W-1,3], weights [3].

    ``_grad``/``_grad_T`` form the 5-point Neumann Laplacian, whose 1-D
    factors tridiag(−1,2,−1)-with-reflecting-corners are diagonalized by
    the DCT-II basis with eigenvalues 2−2cos(πk/n).  The screened system
    is therefore solved in closed form: one 2-D DCT, a pointwise divide
    by (1 + w²λ), one inverse DCT — the true optimum of the same
    least-squares objective the reference approximates with CPU ``lsqr``
    (poisson_fusion.py:54-93), at two FFT passes instead of ``iters``
    CG sweeps contending with patch synthesis for the device (the r5
    e2e measured 1,199 s of poisson queue+compute inside the
    propagation wall).  ``iters`` is kept for API compatibility and
    ignored."""
    del iters
    h, w, _ = blend.shape
    w2 = (weights**2)[None, None, :]

    b = _grad_T(w2 * gx, w2 * gy, h, w) + blend
    lam = (
        (2.0 - 2.0 * jnp.cos(jnp.pi * jnp.arange(h) / h))[:, None, None]
        + (2.0 - 2.0 * jnp.cos(jnp.pi * jnp.arange(w) / w))[None, :, None]
    )
    from jax.scipy.fft import dctn, idctn

    spec = dctn(b, axes=(0, 1), norm="ortho")
    x = idctn(spec / (1.0 + w2 * lam), axes=(0, 1), norm="ortho")
    return x


def poisson_fusion(
    blend_bgr: np.ndarray,
    i1_bgr: np.ndarray,
    i2_bgr: np.ndarray,
    mask: np.ndarray,
    grad_weight=(2.5, 0.5, 0.5),
    iters: int = 100,
) -> np.ndarray:
    """Full fusion (poisson_fusion.py:54-93): Lab conversion, masked
    gradient fusion (clipped to ±100), per-channel screened solve."""
    lab = lambda x: cv2.cvtColor(x, cv2.COLOR_BGR2LAB).astype(np.float32)
    Iab, Ia, Ib = lab(blend_bgr), lab(i1_bgr), lab(i2_bgr)
    m = (mask > 0).astype(np.float32)[:, :, None]

    gx = (Ia[:-1] - Ia[1:]) * (1 - m[:-1]) + (Ib[:-1] - Ib[1:]) * m[:-1]
    gy = (Ia[:, :-1] - Ia[:, 1:]) * (1 - m[:, :-1]) + (
        Ib[:, :-1] - Ib[:, 1:]
    ) * m[:, :-1]
    gx = np.clip(gx, -100, 100)
    gy = np.clip(gy, -100, 100)

    mean = Iab.mean(axis=(0, 1), keepdims=True)
    x = screened_poisson(
        jnp.asarray(Iab - mean),
        jnp.asarray(gx),
        jnp.asarray(gy),
        jnp.asarray(grad_weight, jnp.float32),
        iters=iters,
    )
    out = np.clip(np.asarray(x) + mean, 0, 255).astype(np.uint8)
    return cv2.cvtColor(out, cv2.COLOR_LAB2BGR)
