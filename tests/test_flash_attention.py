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
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            block_q=128, block_k=128, interpret=True,
        )
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
            block_q=64, block_k=128, interpret=True,
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
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
            interpret=True,
        )
    )
    assert np.all(np.isfinite(out))
    # the kernel's l==0 guard outputs exact zeros for fully-masked rows;
    # naive_attention must match (it used to return mean(v) there, which
    # diverged CPU goldens and the custom-VJP backward from the kernel)
    assert np.all(out == 0.0)
    out_naive = np.asarray(
        naive_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)
        )
    )
    assert np.all(out_naive == 0.0)


def test_flash_bf16(rng):
    b, h, sq, sk, d = 1, 2, 128, 256, 40
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    out = np.asarray(
        flash_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), interpret=True,
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


def test_auto_cap_exact_on_real_flow_masks(rng):
    """cf_key_cap='auto' on masks built from REAL flows (bundled clip +
    Farneback) must never truncate, and the compacted cross-frame
    attention must equal the dense masked path exactly (VERDICT r2
    item 4 done-criterion)."""
    import cv2

    from conftest import REFERENCE, has_reference
    from fresco_tpu.attention.fresco_attention import cross_frame_attention
    from fresco_tpu.pipeline import prepare
    from fresco_tpu.utils.classic_flow import make_flow_fn

    if not has_reference():
        pytest.skip("reference repo (bundled clip) not mounted")
    cap = cv2.VideoCapture(str(REFERENCE / "data/music.mp4"))
    frames = []
    for _ in range(16):
        ok, f = cap.read()
        assert ok
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    keys = [cv2.resize(frames[i], (128, 128)) for i in range(0, 16, 5)]

    flow_fn = make_flow_fn(keys)
    _, _, cf_masks, _ = prepare.interframe_params(
        flow_fn, jnp.asarray(np.stack(keys), jnp.float32)
    )
    attn = prepare.build_attn_params(
        cf_masks, None, None, cf_key_cap="auto"
    )
    assert attn.cf_perms is not None and attn.cf_perms.keys() == cf_masks.keys()

    f = len(keys)
    for hw, mask in cf_masks.items():
        perm, pmask = attn.cf_perms[hw]
        n_valid = int(np.asarray(mask).sum())
        assert n_valid <= perm.shape[0], "auto cap must never truncate"
        assert int(np.asarray(pmask).sum()) == n_valid
        # realistic masks are sparse: the cap should be well under dense
        if hw >= 64:
            assert perm.shape[0] <= (f // 2) * hw

    hw = sorted(cf_masks.keys())[-1]
    c, heads, chunk = 16, 4, 2
    q = jnp.asarray(rng.standard_normal((chunk * f, hw, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((chunk * f, hw, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((chunk * f, hw, c)), jnp.float32)
    dense = cross_frame_attention(q, k, v, cf_masks[hw], chunk, heads)
    comp = cross_frame_attention(
        q, k, v, cf_masks[hw], chunk, heads, key_perm=attn.cf_perms[hw]
    )
    np.testing.assert_allclose(np.asarray(comp), np.asarray(dense), atol=1e-5)


def test_auto_cf_key_cap_sizing():
    from fresco_tpu.pipeline.prepare import auto_cf_key_cap

    # never truncates: cap >= n_valid, rounded to hw/2 granularity
    assert auto_cf_key_cap(5198, 4096, 8) == 6144   # 1.27*hw -> 1.5*hw
    assert auto_cf_key_cap(4096, 4096, 8) == 4096   # exactly hw
    assert auto_cf_key_cap(1, 4096, 8) == 2048      # floor: hw/2
    assert auto_cf_key_cap(8 * 4096, 4096, 8) == 8 * 4096  # dense bound
    assert auto_cf_key_cap(100, 64, 4) == 128       # min granularity 128
    for n in (1, 100, 5198, 9000, 32768):
        assert auto_cf_key_cap(n, 4096, 8) >= min(n, 8 * 4096)


def test_truncation_warning_fires_once(capsys):
    import jax.numpy as jnp

    from fresco_tpu.pipeline import prepare

    prepare._CF_TRUNCATION_WARNED.clear()
    masks = {16: jnp.ones((4, 16), bool)}
    for _ in range(3):
        prepare.build_attn_params(masks, None, None, cf_key_cap=1.0)
    out = capsys.readouterr().out
    assert out.count("cf compaction") == 1


def test_flash_valid_prefix_mask(rng):
    """Compaction-style masks (valid-first prefix) hit the kernel's
    fully-valid fast path on whole blocks plus one mixed boundary block —
    must match naive exactly like scattered masks do."""
    b, h, sq, sk, d = 1, 2, 64, 384, 40
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    for nvalid in (384, 300, 128):  # all-valid / mixed tail / aligned prefix
        mask = np.arange(sk)[None, :] < nvalid
        out = np.asarray(
            flash_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(mask), block_q=64, block_k=128, interpret=True,
            )
        )
        ref = np.asarray(
            naive_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)
            )
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
