"""Pallas flash attention vs naive attention (interpreter mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from fresco_tpu.attention.flash import flash_attention, naive_attention


@pytest.mark.parametrize("sq,sk,d", [(128, 128, 32), (200, 300, 40), (64, 512, 80)])
def test_flash_matches_naive(rng, sq, sk, d):
    b, h = 2, 2
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    out = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block_q=128, block_k=128)
    )
    ref = np.asarray(naive_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_key_mask(rng):
    b, h, sq, sk, d = 1, 2, 64, 256, 32
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    mask = rng.uniform(0, 1, (b, sk)) > 0.5
    out = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
            block_q=64, block_k=128,
        )
    )
    ref = np.asarray(
        naive_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_all_masked_is_zero(rng):
    b, h, sq, sk, d = 1, 1, 128, 128, 16
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    mask = np.zeros((b, sk), dtype=bool)
    out = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    )
    assert np.all(np.isfinite(out))


def test_flash_bf16(rng):
    b, h, sq, sk, d = 1, 2, 128, 256, 40
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    out = np.asarray(
        flash_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16),
        ).astype(jnp.float32)
    )
    ref = np.asarray(naive_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_cross_frame_compaction_matches_dense(rng):
    """Valid-key compaction (sorted perm + static cap) must equal the
    dense masked cross-frame path exactly when n_valid <= cap."""
    from fresco_tpu.attention.fresco_attention import cross_frame_attention

    f, hw, c, heads, chunk = 4, 64, 32, 4, 2
    q = jnp.asarray(rng.standard_normal((chunk * f, hw, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((chunk * f, hw, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((chunk * f, hw, c)), jnp.float32)
    mask = np.zeros((f, hw), dtype=bool)
    mask[0] = True
    mask[1:] = rng.uniform(size=(f - 1, hw)) < 0.2
    mask = jnp.asarray(mask)

    dense = cross_frame_attention(q, k, v, mask, chunk, heads)

    cap = 2 * hw
    flat = mask.reshape(-1)
    perm = jnp.argsort(~flat, stable=True)[:cap]
    comp = cross_frame_attention(
        q, k, v, mask, chunk, heads, key_perm=(perm, jnp.take(flat, perm))
    )
    np.testing.assert_allclose(np.asarray(comp), np.asarray(dense), atol=1e-5)
