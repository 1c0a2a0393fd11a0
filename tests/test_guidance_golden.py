"""Golden parity of the feature-optimization loop against the reference's
optimize_feature (src/diffusion_hacked.py:416-488), imported read-only
(diffusers stubbed)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fresco_tpu.diffusion.guidance import GuidanceConfig, optimize_feature  # noqa: E402


def _import_reference_dh():
    from test_fresco_attention_golden import _import_reference_processor

    return _import_reference_processor()


@pytest.mark.slow
def test_optimize_feature_matches_reference():
    dh = _import_reference_dh()
    rng = np.random.default_rng(0)
    chunk, f, c, h, w = 2, 3, 8, 8, 8
    H, W = 16, 16  # "full-res" flows at 2x the feature resolution

    sample = rng.standard_normal((chunk * f, h, w, c)).astype(np.float32)
    fwd_flow = (rng.standard_normal((f, H, W, 2)) * 2).astype(np.float32)
    bwd_flow = (rng.standard_normal((f, H, W, 2)) * 2).astype(np.float32)
    fwd_occ = (rng.uniform(0, 1, (f, H, W)) > 0.8).astype(np.float32)
    bwd_occ = (rng.uniform(0, 1, (f, H, W)) > 0.8).astype(np.float32)
    # a plausible correlation target: gram of a random feature
    vr = rng.standard_normal((chunk * f, h * w, c)).astype(np.float32)
    vr /= np.linalg.norm(vr, axis=2, keepdims=True)
    corr = np.einsum("bic,bjc->bij", vr, vr).astype(np.float32)

    cfg = GuidanceConfig(
        iters=10, lr=0.2, intra_weight=1e2, optimize_temporal=True,
        chunk=chunk, gram_dtype="float32",
    )
    ours = np.asarray(
        optimize_feature(
            jnp.asarray(sample),
            jnp.asarray(fwd_flow), jnp.asarray(bwd_flow),
            jnp.asarray(fwd_occ), jnp.asarray(bwd_occ),
            jnp.asarray(corr), cfg,
        )
    )

    # reference call (NCHW): flows [N,2,H,W], occs [N,H,W], sample [2N,C,h,w]
    t_sample = torch.from_numpy(sample).permute(0, 3, 1, 2)
    flows = [
        torch.from_numpy(fwd_flow).permute(0, 3, 1, 2),
        torch.from_numpy(bwd_flow).permute(0, 3, 1, 2),
    ]
    occs = [torch.from_numpy(fwd_occ), torch.from_numpy(bwd_occ)]
    ref = dh.optimize_feature(
        t_sample, flows, occs, [torch.from_numpy(corr)],
        intra_weight=1e2, iters=10, unet_chunk_size=chunk,
        optimize_temporal=True,
    )
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)


def test_spatial_loss_factored_matches_dense(rng):
    """Factored reference correlations (normalized features) must give the
    same loss AND gradient as the dense gram (fp32)."""
    import jax

    from fresco_tpu.diffusion.guidance import spatial_loss

    b, h, w, c = 2, 8, 8, 16  # hw=64 != C=16 -> factored detectable
    cs = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    vr = rng.standard_normal((b, h * w, c)).astype(np.float32)
    vr /= np.linalg.norm(vr, axis=2, keepdims=True)
    dense = jnp.asarray(np.einsum("bic,bjc->bij", vr, vr))

    f_dense = lambda x: spatial_loss(x, dense, jnp.float32)
    f_fact = lambda x: spatial_loss(x, jnp.asarray(vr), jnp.float32)
    np.testing.assert_allclose(
        float(f_dense(cs)), float(f_fact(cs)), rtol=1e-5
    )
    gd = np.asarray(jax.grad(f_dense)(cs))
    gf = np.asarray(jax.grad(f_fact)(cs))
    np.testing.assert_allclose(gd, gf, atol=1e-5, rtol=1e-4)


def test_spatial_loss_analytic_grad_matches_autodiff(rng):
    """The custom-vjp analytic gradient equals plain autodiff of the
    unchunked loss (fp32, chunked over 2 row blocks)."""
    import jax

    from fresco_tpu.diffusion.guidance import spatial_loss

    b, h, w, c = 2, 4, 8, 16  # hw=32, chunk to 16-row blocks
    cs = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    vr = rng.standard_normal((b, h * w, c)).astype(np.float32)
    vr /= np.linalg.norm(vr, axis=2, keepdims=True)
    dense = jnp.asarray(np.einsum("bic,bjc->bij", vr, vr))

    def naive(x):
        v = x.reshape(b, h * w, c)
        v = v / jnp.sqrt(jnp.sum(v * v, axis=2, keepdims=True))
        g = jnp.einsum("bic,bjc->bij", v, v)
        return jnp.mean(jnp.abs(g - dense))

    ours = lambda x: spatial_loss(x, dense, jnp.float32, chunk_rows=16)
    np.testing.assert_allclose(float(ours(cs)), float(naive(cs)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(ours)(cs)), np.asarray(jax.grad(naive)(cs)),
        atol=1e-5, rtol=1e-4,
    )


def test_sparse_warp_matches_dense(rng):
    """4-tap sparse warp (fwd + custom backward) == dense warp-matrix
    matmul, values and gradients."""
    import jax

    from fresco_tpu.diffusion.guidance import (
        apply_sparse_warp, make_sparse_warp, warp_matrix,
    )

    f, h, w, d = 3, 6, 7, 5
    flow = jnp.asarray(rng.standard_normal((f, h, w, 2)) * 2.5, jnp.float32)
    x = jnp.asarray(rng.standard_normal((f, h * w, d)), jnp.float32)

    dense = warp_matrix(flow, jnp.float32)
    y_dense = jnp.einsum("fij,fjd->fid", dense, x)
    sw = make_sparse_warp(flow)
    y_sparse = apply_sparse_warp(x, *sw)
    np.testing.assert_allclose(
        np.asarray(y_sparse), np.asarray(y_dense), atol=1e-5, rtol=1e-5
    )

    ct = jnp.asarray(rng.standard_normal(y_dense.shape), jnp.float32)
    g_dense = jax.grad(lambda a: jnp.sum(jnp.einsum("fij,fjd->fid", dense, a) * ct))(x)
    g_sparse = jax.grad(lambda a: jnp.sum(apply_sparse_warp(a, *sw) * ct))(x)
    np.testing.assert_allclose(
        np.asarray(g_sparse), np.asarray(g_dense), atol=1e-5, rtol=1e-5
    )


def test_temporal_loss_sparse_matches_dense(rng):
    import jax

    from fresco_tpu.diffusion.guidance import (
        make_sparse_warp, temporal_loss, warp_matrix,
    )

    chunk, f, h, w, c = 2, 3, 4, 5, 6
    cs = jnp.asarray(rng.standard_normal((chunk * f, h, w, c)), jnp.float32)
    fwd_flow = jnp.asarray(rng.standard_normal((f, h, w, 2)), jnp.float32)
    bwd_flow = jnp.asarray(rng.standard_normal((f, h, w, 2)), jnp.float32)
    fwd_occ = jnp.zeros((f, h, w, 1))
    bwd_occ = jnp.zeros((f, h, w, 1))

    dense = lambda x: temporal_loss(
        x, warp_matrix(fwd_flow, jnp.float32), warp_matrix(bwd_flow, jnp.float32),
        fwd_occ, bwd_occ, chunk,
    )
    sparse = lambda x: temporal_loss(
        x, make_sparse_warp(fwd_flow), make_sparse_warp(bwd_flow),
        fwd_occ, bwd_occ, chunk,
    )
    np.testing.assert_allclose(float(sparse(cs)), float(dense(cs)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(sparse)(cs)), np.asarray(jax.grad(dense)(cs)),
        atol=1e-5, rtol=1e-4,
    )


def test_temporal_grad_folded_matches_autodiff(rng):
    """The folded analytic temporal gradient (fwd+bwd warps stacked into
    one batched GEMM each way, diffusion.rejected.temporal_grad — kept as
    a measured-rejected negative-result record) == autodiff of
    temporal_loss, with binary occlusion masks (the dilated masks the
    sampler feeds) and f32 warp matrices."""
    import jax

    from fresco_tpu.diffusion.guidance import temporal_loss, warp_matrix
    from fresco_tpu.diffusion.rejected import temporal_grad

    chunk, f, h, w, c = 2, 3, 6, 5, 4
    cs = jnp.asarray(rng.standard_normal((chunk * f, h, w, c)), jnp.float32)
    fwd_flow = jnp.asarray(rng.standard_normal((f, h, w, 2)) * 1.5, jnp.float32)
    bwd_flow = jnp.asarray(rng.standard_normal((f, h, w, 2)) * 1.5, jnp.float32)
    fwd_occ = jnp.asarray(
        rng.uniform(size=(f, h, w, 1)) < 0.3, jnp.float32
    )
    bwd_occ = jnp.asarray(
        rng.uniform(size=(f, h, w, 1)) < 0.3, jnp.float32
    )
    wf = warp_matrix(fwd_flow, jnp.float32)
    wb = warp_matrix(bwd_flow, jnp.float32)

    g_auto = jax.grad(
        lambda x: temporal_loss(x, wf, wb, fwd_occ, bwd_occ, chunk)
    )(cs)
    g_fold = temporal_grad(cs, wf, wb, fwd_occ, bwd_occ, chunk)
    np.testing.assert_allclose(
        np.asarray(g_fold), np.asarray(g_auto), atol=1e-6, rtol=1e-5
    )


def test_spatial_grad_only_path_matches(rng):
    """The grad-only Adam path (spatial_grad: one gram pass, no loss
    value) must equal jax.grad(spatial_loss) exactly."""
    import jax

    from fresco_tpu.diffusion.guidance import spatial_grad, spatial_loss

    b, h, w, c = 2, 4, 8, 16
    cs = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    vr = rng.standard_normal((b, h * w, c)).astype(np.float32)
    vr /= np.linalg.norm(vr, axis=2, keepdims=True)
    dense = jnp.asarray(np.einsum("bic,bjc->bij", vr, vr))

    g_auto = jax.grad(lambda x: spatial_loss(x, dense, jnp.float32,
                                             chunk_rows=16))(cs)
    g_only = spatial_grad(cs, dense, jnp.float32, chunk_rows=16)
    np.testing.assert_allclose(
        np.asarray(g_only), np.asarray(g_auto), atol=1e-6, rtol=1e-5
    )
    # factored correlation form too
    g_only_f = spatial_grad(cs, jnp.asarray(vr), jnp.float32, chunk_rows=16)
    np.testing.assert_allclose(
        np.asarray(g_only_f), np.asarray(g_auto), atol=1e-5, rtol=1e-4
    )


def test_banded_warp_matches_dense(rng):
    """Block-banded warp (the finest-stage FLOP cut) must equal the
    dense warp matrix exactly while banded_warp_ok holds, in both the
    forward product and the autodiff backward."""
    import jax

    from fresco_tpu.diffusion.guidance import (
        apply_banded_warp,
        banded_warp_ok,
        warp_matrix,
        warp_matrix_banded,
    )

    f, h, w, d = 2, 64, 8, 12
    hw = h * w
    # flows bounded so the band guard holds at this (h, w)
    flow = jnp.asarray(
        rng.uniform(-3.5, 3.5, (f, h, w, 2)).astype(np.float32)
    )
    assert banded_warp_ok(flow, (h, w))

    dense = warp_matrix(flow, jnp.float32)
    tag, wb, block = warp_matrix_banded(flow, jnp.float32)
    assert tag == "banded" and block == hw // 8

    x = jnp.asarray(rng.standard_normal((f, hw, d)), jnp.float32)
    y_dense = jnp.einsum("fij,fjd->fid", dense, x)
    y_band = apply_banded_warp(wb, block, x)
    np.testing.assert_allclose(
        np.asarray(y_band), np.asarray(y_dense), atol=1e-5, rtol=1e-5
    )

    g_dense = jax.grad(lambda x_: jnp.sum(jnp.einsum("fij,fjd->fid", dense, x_) ** 2))(x)
    g_band = jax.grad(lambda x_: jnp.sum(apply_banded_warp(wb, block, x_) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_band), np.asarray(g_dense), atol=1e-4, rtol=1e-4
    )


def test_banded_warp_ok_rejects_large_flow(rng):
    from fresco_tpu.diffusion.guidance import banded_warp_ok

    f, h, w = 1, 64, 8
    flow = jnp.full((f, h, w, 2), 30.0, jnp.float32)
    assert not banded_warp_ok(flow, (h, w))


def test_factored_corr_with_hw_equal_channels(rng):
    """A factored correlation whose channel count EQUALS hw is shape-
    ambiguous (looks square); the explicit is_dense flag must route it
    through the factored math (regression: the shape sniff misread it
    as a dense gram and computed sign(G − v̂) garbage).  The sampler
    passes corr_is_dense=False for everything intraframe_params emits."""
    import jax

    from fresco_tpu.diffusion.guidance import (
        optimize_feature, spatial_loss,
    )

    b, h, w, c = 1, 4, 4, 16  # hw == C == 16: ambiguous shape
    cs = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    vr = rng.standard_normal((b, h * w, c)).astype(np.float32)
    vr /= np.linalg.norm(vr, axis=2, keepdims=True)
    dense = jnp.asarray(np.einsum("bic,bjc->bij", vr, vr))

    l_dense = float(spatial_loss(cs, dense, jnp.float32, is_dense=True))
    l_fact = float(
        spatial_loss(cs, jnp.asarray(vr), jnp.float32, is_dense=False)
    )
    np.testing.assert_allclose(l_dense, l_fact, rtol=1e-5)

    from fresco_tpu.diffusion.guidance import GuidanceConfig

    # float32 grams: the bf16 default rounds the materialized dense C
    # differently from a caller-provided f32 dense (documented near-tie
    # divergence), which would mask the routing equivalence under test
    cfg = GuidanceConfig(
        iters=2, optimize_temporal=False, gram_dtype="float32"
    )
    out_d = optimize_feature(
        cs, None, None, None, None, dense, cfg, corr_is_dense=True
    )
    out_f = optimize_feature(
        cs, None, None, None, None, jnp.asarray(vr), cfg,
        corr_is_dense=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_f), atol=1e-5, rtol=1e-4
    )
