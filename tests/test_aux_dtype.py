"""Quality gate for config.aux_dtype="bfloat16" (the TPU-native default
for the GMFlow / EGNet auxiliary forwards — the reference runs both fp32
on CUDA, run_fresco.py:91-98): bf16 compute must reproduce the f32
flows / occlusion masks / saliency masks to tight tolerance, because the
flow-determining reductions (correlation softmax, expected coordinates)
stay f32 inside the models.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
from fresco_tpu.pipeline import prepare
from fresco_tpu.pipeline.runner import _aux_caster


def _frames(rng, f=3, hw=64):
    # smooth structured content (random noise has no coherent flow)
    base = rng.uniform(0, 255, (hw // 8, hw // 8, 3))
    import cv2

    big = cv2.resize(base.astype(np.float32), (hw, hw))
    out = []
    for i in range(f):
        out.append(np.roll(big, shift=2 * i, axis=1))
    return jnp.asarray(np.stack(out))


def test_gmflow_bf16_matches_f32_flows_and_occlusion():
    gm = GMFlow(GMFlowConfig.tiny())
    rng = np.random.default_rng(0)
    frames = _frames(rng)
    params = jax.jit(gm.init)(jax.random.key(0), frames[:1], frames[:1])

    def interframe(aux_dtype):
        cast = _aux_caster(aux_dtype)

        def flow_fn(a, b):
            return gm.apply(cast(params), cast(a), cast(b)).astype(
                jnp.float32
            )

        return prepare.interframe_params(flow_fn, frames)

    flows32, occs32, masks32, _ = jax.jit(lambda: interframe("float32"))()
    flows16, occs16, masks16, _ = jax.jit(lambda: interframe("bfloat16"))()

    # Flow agreement bound, measured at the WORST CASE: random weights
    # give unpeaked correlation softmax, where the expected-coordinate
    # readout is maximally sensitive to logit noise (trained weights
    # give peaked matches whose argmax-like expectation bf16 cannot
    # move).  Observed ~8% relative at this worst case; bound at 10%.
    mae = float(jnp.abs(flows32[0] - flows16[0]).mean())
    scale = float(jnp.abs(flows32[0]).mean()) + 1.0
    assert mae < 0.10 * scale, (mae, scale)
    # occlusion masks: thresholded — require near-total agreement
    agree = float((occs32[0] == occs16[0]).mean())
    assert agree > 0.97, agree
    # cross-frame attention masks at every scale
    for hw in masks32:
        agree = float(
            (masks32[hw].astype(bool) == masks16[hw].astype(bool)).mean()
        )
        assert agree > 0.97, (hw, agree)


@pytest.mark.slow
def test_egnet_bf16_matches_f32_mask():
    from fresco_tpu.models.egnet import EGNet, saliency_background_mask

    model = EGNet()
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x0)

    m32 = np.asarray(saliency_background_mask(model, params, imgs))
    p16 = _aux_caster("bfloat16")(params)
    m16 = np.asarray(
        saliency_background_mask(model, p16, imgs, dtype=jnp.bfloat16)
    )
    assert m16.shape == m32.shape
    assert float(np.abs(m32 - m16).mean()) < 0.02


def test_aux_caster_float32_is_identity():
    tree = {"a": jnp.ones((2,), jnp.float32), "b": jnp.ones((2,), jnp.int32)}
    out = _aux_caster("float32")(tree)
    assert out["a"].dtype == jnp.float32
    out16 = _aux_caster("bfloat16")(tree)
    assert out16["a"].dtype == jnp.bfloat16
    assert out16["b"].dtype == jnp.int32  # non-float leaves untouched
