"""Fused sign-gram kernel (ops/gram_kernel.py) vs the plain einsum math.

Runs the Pallas kernel in interpret mode on CPU.  The non-square-hw
cases are the regression for a silent-truncation bug: the tile picker
could return 512-wide tiles for hw values that 512 does not divide
(512x640 clips give the c=640 decoder stage hw=1280), and the grid's
floor division then dropped the remainder rows/columns.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fresco_tpu.ops.gram_kernel import _pick_tiles, sign_gram_apply


def _make_case(hw: int, c: int, seed: int = 0):
    """v plus a corr built so sign(v·vᵀ − corr) is a known ±1 matrix M
    with huge margin (|g − corr ∓ 1| ≲ 1e-2), making the expected
    output exact regardless of accumulation order."""
    k1, k2 = jax.random.split(jax.random.key(seed))
    v = jax.random.normal(k1, (1, hw, c), jnp.float32).astype(jnp.bfloat16)
    g = jnp.einsum(
        "bic,bjc->bij", v, v, preferred_element_type=jnp.float32
    )
    m = jnp.where(jax.random.bernoulli(k2, 0.5, g.shape), 1.0, -1.0)
    corr = (g - m).astype(jnp.bfloat16)
    expected = jnp.einsum(
        "bij,bjc->bic", m.astype(jnp.bfloat16), v,
        preferred_element_type=jnp.float32,
    )
    return v, corr, expected


@pytest.mark.parametrize("hw", [768, 1280])
def test_non_square_hw_exact(hw):
    v, corr, expected = _make_case(hw, 64)
    out = sign_gram_apply(v, corr, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-2, atol=1e-2
    )
    # the old bug left whole rows unwritten — every row must be live
    assert np.all(np.any(np.asarray(out) != 0.0, axis=-1))


def test_auto_tiles_divide_hw():
    for hw in (256, 768, 1024, 1280, 4096, 5120):
        for c in (64, 320, 640, 1280):
            bm, bn = _pick_tiles(hw, c, 2)
            assert hw % bm == 0 and hw % bn == 0, (hw, c, bm, bn)


def test_explicit_bad_tiles_raise():
    v, corr, _ = _make_case(768, 64)
    with pytest.raises(ValueError):
        sign_gram_apply(v, corr, bm=512, bn=512, interpret=True)
