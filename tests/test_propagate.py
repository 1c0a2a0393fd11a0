"""Propagation engine tests: patch synthesis properties, error masks,
histogram blend and Poisson fusion math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize
from fresco_tpu.propagate.video_blend import error_mask


def _checker(h, w, sq=8):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = ((yy // sq + xx // sq) % 2) * 200.0 + 30
    return np.stack([base, 255 - base, (yy * 255 / h)], axis=-1).astype(np.float32)


def test_patchmatch_identity_reconstruction(rng):
    """With target guides == source guides, synthesis must reproduce the
    style (the NNF can lock onto the identity match with zero error)."""
    h = w = 48
    guides = _checker(h, w)
    noise = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    guides = 0.8 * guides + 0.2 * noise  # make matches unambiguous
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)

    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=4, sv_iters=4, uniformity=0.0, num_pyramid_levels=2
    )
    out, err, nnf = synthesize(
        jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
        jnp.full((3,), 2.0), cfg, rng=jax.random.key(1),
    )
    out = np.asarray(out)
    # interior must match the style almost exactly (borders vote-averaged)
    m = 6
    diff = np.abs(out[m:-m, m:-m] - style[m:-m, m:-m]).mean()
    assert diff < 10.0, f"mean abs diff {diff}"
    # identity NNF in the interior
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    nnf = np.asarray(nnf)
    frac_id = np.mean(
        (nnf[m:-m, m:-m, 0] == ys[m:-m, m:-m]) & (nnf[m:-m, m:-m, 1] == xs[m:-m, m:-m])
    )
    assert frac_id > 0.8, f"identity fraction {frac_id}"


def test_patchmatch_table_uint8_reconstruction(rng):
    """table_dtype='uint8' (quantized gather table + fixed-point omega,
    VERDICT r3 #7) must still lock onto the identity match and
    reproduce the style — with uniformity ON so the two-column omega
    fixed-point path is exercised."""
    h = w = 48
    guides = 0.8 * _checker(h, w) + 0.2 * rng.uniform(0, 255, (h, w, 3)).astype(
        np.float32
    )
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)

    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=4, sv_iters=4, uniformity=3500.0,
        num_pyramid_levels=2, table_dtype="uint8",
    )
    out, _, nnf = synthesize(
        jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
        jnp.full((3,), 2.0), cfg, rng=jax.random.key(1),
    )
    out = np.asarray(out)
    m = 6
    diff = np.abs(out[m:-m, m:-m] - style[m:-m, m:-m]).mean()
    assert diff < 10.0, f"mean abs diff {diff}"


def test_patchmatch_shifted_reconstruction(rng):
    """Target = source shifted: output should be style shifted likewise."""
    h = w = 48
    shift = 6
    src_g = 0.7 * _checker(h, w) + 0.3 * rng.uniform(0, 255, (h, w, 3)).astype(
        np.float32
    )
    tgt_g = np.roll(src_g, (-shift, 0), axis=(0, 1))
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=5, sv_iters=4, uniformity=0.0, num_pyramid_levels=2
    )
    out, _, _ = synthesize(
        jnp.asarray(style), jnp.asarray(src_g), jnp.asarray(tgt_g),
        jnp.full((3,), 2.0), cfg, rng=jax.random.key(2),
    )
    out = np.asarray(out)
    expected = np.roll(style, (-shift, 0), axis=(0, 1))
    m = 10
    diff = np.abs(out[m:-m, m:-m] - expected[m:-m, m:-m]).mean()
    assert diff < 25.0, f"mean abs diff {diff}"


def test_error_mask_semantics():
    d1 = np.array([[1.0, 5.0], [2.0, 2.0]])
    d2 = np.array([[2.0, 1.0], [2.0, 3.0]])
    m = error_mask(d1, d2, 1.0, 1.0)
    np.testing.assert_array_equal(m, [[0, 1], [1, 0]])
    assert error_mask(d1, d2, 0.0, 1.0).max() == 0  # weight1==0 -> all fwd
    assert error_mask(d1, d2, 1.0, 0.0).min() == 1  # weight2==0 -> all bwd


def test_histogram_blend_stats():
    cv2 = pytest.importorskip("cv2")
    from fresco_tpu.propagate.histogram import histogram_blend

    rng = np.random.default_rng(0)
    a = rng.integers(40, 200, (32, 32, 3)).astype(np.uint8)
    b = rng.integers(40, 200, (32, 32, 3)).astype(np.uint8)
    me = rng.integers(40, 200, (32, 32, 3)).astype(np.uint8)
    out = histogram_blend(a, b, me, 0.5, 0.5)
    assert out.shape == a.shape and out.dtype == np.uint8
    # output statistics must approximately match the min-error image's
    lab = lambda x: cv2.cvtColor(x, cv2.COLOR_BGR2Lab).astype(np.float32)
    np.testing.assert_allclose(
        lab(out).mean((0, 1)), lab(me).mean((0, 1)), atol=6.0
    )


def test_screened_poisson_matches_dense_solve():
    """The DCT-diagonalized solve must equal the dense normal-equations
    solution (w²∇ᵀ∇ + I)x = w²∇ᵀg + blend on a small grid — validating
    the Neumann-Laplacian eigenbasis (2−2cos(πk/n)) including the
    boundary rows the reference's lsqr system encodes implicitly."""
    from fresco_tpu.propagate.poisson import screened_poisson

    h, w = 8, 6
    rng = np.random.default_rng(3)
    blend = rng.standard_normal((h, w, 3)).astype(np.float32)
    gx = rng.standard_normal((h - 1, w, 3)).astype(np.float32)
    gy = rng.standard_normal((h, w - 1, 3)).astype(np.float32)
    weights = np.array([2.5, 0.5, 0.5], np.float32)

    # dense ∇ per channel: D stacks row-diffs then col-diffs over vec(x)
    n = h * w
    rows = []
    for i in range(h - 1):
        for j in range(w):
            r = np.zeros(n)
            r[i * w + j] = 1.0
            r[(i + 1) * w + j] = -1.0
            rows.append(r)
    for i in range(h):
        for j in range(w - 1):
            r = np.zeros(n)
            r[i * w + j] = 1.0
            r[i * w + j + 1] = -1.0
            rows.append(r)
    D = np.stack(rows)

    out = np.asarray(screened_poisson(
        jnp.asarray(blend), jnp.asarray(gx), jnp.asarray(gy),
        jnp.asarray(weights),
    ))
    for c in range(3):
        w2 = float(weights[c]) ** 2
        A = w2 * (D.T @ D) + np.eye(n)
        g = np.concatenate([gx[..., c].ravel(), gy[..., c].ravel()])
        b = w2 * (D.T @ g) + blend[..., c].ravel()
        x = np.linalg.solve(A, b).reshape(h, w)
        np.testing.assert_allclose(out[..., c], x, atol=1e-4)


def test_poisson_fusion_identity():
    """With both candidates equal to the blend image, the screened solve
    must return (approximately) the input."""
    pytest.importorskip("cv2")
    from fresco_tpu.propagate.poisson import poisson_fusion

    rng = np.random.default_rng(0)
    img = rng.integers(60, 190, (32, 32, 3)).astype(np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    out = poisson_fusion(img, img, img, mask, iters=60)
    diff = np.abs(out.astype(int) - img.astype(int)).mean()
    assert diff < 3.0, diff


def test_patchmatch_extra_pass_3x3(rng):
    """The -extrapass3x3 mode (finest-level rerun, patch 3, uniformity 0
    — ebsynth_cpu.cpp:983-989) must run and preserve an identity match."""
    h = w = 32
    guides = 0.8 * _checker(h, w) + 0.2 * rng.uniform(
        0, 255, (h, w, 3)
    ).astype(np.float32)
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=3, sv_iters=3, uniformity=0.0,
        num_pyramid_levels=1, extra_pass_3x3=True,
    )
    out, err, nnf = synthesize(
        jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
        jnp.full((3,), 2.0), cfg, rng=jax.random.key(1),
    )
    m = 4
    diff = np.abs(np.asarray(out)[m:-m, m:-m] - style[m:-m, m:-m]).mean()
    assert diff < 10.0, f"mean abs diff {diff}"


def test_patchmatch_trim_tier2_reconstruction(rng):
    """trim_seeded_levels=2 (the throughput knob: shifts [1,2] + fewer
    random scales at seeded levels) still reconstructs the identity
    match — the trimmed candidate set must stay able to refine an
    upsample-seeded NNF."""
    h = w = 48
    guides = _checker(h, w)
    noise = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    guides = 0.8 * guides + 0.2 * noise
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)

    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=4, sv_iters=4, uniformity=0.0,
        num_pyramid_levels=2, trim_seeded_levels=2,
    )
    out, _, _ = synthesize(
        jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
        jnp.full((3,), 2.0), cfg, rng=jax.random.key(1),
    )
    m = 6
    diff = np.abs(np.asarray(out)[m:-m, m:-m] - style[m:-m, m:-m]).mean()
    assert diff < 12.0, f"mean abs diff {diff}"


def test_patchmatch_compact_tiers_reconstruction(rng):
    """Freeze-compacted pm scans (compact_tiers) must keep the identity
    reconstruction exact: the compact path evaluates the same shift
    candidates (via the full-grid NNF) and freezes padding rows, so a
    converged match must survive every tier, including caps smaller
    than the pixel count."""
    from fresco_tpu.propagate.patchmatch import _synthesize_level

    h = w = 40
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    guides = 0.8 * _checker(h, w) + 0.2 * rng.uniform(0, 255, (h, w, 3)).astype(
        np.float32
    )
    src_all = jnp.asarray(np.concatenate([style, guides], -1))
    nnf0 = jnp.stack(
        [
            jax.random.randint(jax.random.key(1), (h, w), 2, h - 2),
            jax.random.randint(jax.random.key(2), (h, w), 2, w - 2),
        ],
        axis=-1,
    )
    kw = dict(
        patch=5, pm_iters=4, sv_iters=4, uniformity=3500.0,
        rand_candidates=3, stop_threshold=5.0, seeded=0,
    )
    for tiers in ((), (1,), (1, 2)):
        _, out, _ = _synthesize_level(
            src_all, jnp.asarray(guides), jnp.asarray(style),
            jnp.full((3,), 2.0), jnp.full((3,), 1.0 / 3),
            nnf0, jax.random.key(3), compact_tiers=tiers, **kw,
        )
        m = 5
        diff = np.abs(np.asarray(out)[m:-m, m:-m] - style[m:-m, m:-m]).mean()
        assert diff < 10.0, f"tiers {tiers}: mean abs diff {diff}"


def test_video_blend_cli_propagation_knobs(monkeypatch):
    """--trim/--stop-threshold reach blend_video as a PatchMatchConfig;
    omitting them keeps the library defaults."""
    from fresco_tpu.propagate import video_blend
    from fresco_tpu.propagate.patchmatch import PatchMatchConfig

    seen = {}
    monkeypatch.setattr(
        video_blend, "blend_video",
        lambda *a, **kw: seen.update(kw),
    )
    video_blend.main(["clip", "--key_ind", "0", "7",
                      "--trim", "2", "--stop-threshold", "3.5"])
    cfg = seen["patch_cfg"]
    assert cfg.trim_seeded_levels == 2 and cfg.stop_threshold == 3.5

    video_blend.main(["clip", "--key_ind", "0", "7"])
    assert seen["patch_cfg"] == PatchMatchConfig()


def test_warp_nearest_bool_mask():
    """Bool masks ride a float round-trip (the reference warp supports
    2-D masks the same way; cv2.remap rejects bool arrays directly)."""
    from fresco_tpu.propagate.guides import warp_nearest

    mask = np.zeros((8, 8), bool)
    mask[2:4, 3:5] = True
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = -1.0  # content shifts right by 1
    out = warp_nearest(mask, flow)
    assert out.dtype == np.bool_
    assert out[2, 4] and out[3, 5] and not out[2, 3]


def test_default_flow_fn_farneback_fallback(tmp_path):
    """With no GMFlow checkpoint, blend_video's default flow source is
    per-pair Farneback (random-weight GMFlow flows are degenerate —
    utils/classic_flow.py docstring), honoring the _FlowCache contract:
    [1,H,W,3] pair -> [2,H,W,2] (fwd, bwd)."""
    pytest.importorskip("cv2")
    from fresco_tpu.propagate.video_blend import default_flow_fn

    flow_fn = default_flow_fn(str(tmp_path / "missing.pth"))
    import cv2

    r = np.random.default_rng(3)
    # band-limited noise texture (trackable) and a +4px horizontal shift
    base = r.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (7, 7), 2.0)
    base = 255 * (base - base.min()) / (base.max() - base.min())
    shifted = np.roll(base, 4, axis=1)
    flow = np.asarray(flow_fn(base[None], shifted[None]))
    assert flow.shape == (2, 48, 64, 2)
    # interior forward flow should be ~(+4, 0)
    inner = flow[0, 12:36, 16:48]
    assert abs(float(inner[..., 0].mean()) - 4.0) < 1.0
    assert abs(float(inner[..., 1].mean())) < 1.0


def test_flow_cache_get_batch_matches_get(tmp_path):
    """_FlowCache.get_batch (one device consistency call per chunk, tail
    padded to a fixed batch shape) must return exactly what per-pair .get
    returns, land in the same disk cache, and respect idxs order."""
    from fresco_tpu.propagate.video_blend import _FlowCache

    r = np.random.default_rng(7)
    frames = [r.uniform(0, 255, (16, 24, 3)).astype(np.float32)
              for _ in range(6)]

    calls = []

    def flow_fn(a, b):
        # _FlowCache contract: [N,H,W,3] pairs -> [2N,H,W,2] fwd|bwd
        calls.append(int(a.shape[0]))
        a = jnp.asarray(a)
        fwd = a[..., :2] * 0.01
        bwd = -jnp.asarray(b)[..., :2] * 0.01
        return jnp.concatenate([fwd, bwd], axis=0)

    ref = _FlowCache(flow_fn, {}, None)
    want = [ref.get(frames, j, tag=f"t{j}") for j in range(5)]

    fc = _FlowCache(flow_fn, {}, str(tmp_path))
    got = fc.get_batch(frames, list(range(5)), [f"t{j}" for j in range(5)],
                       max_batch=3)
    assert len(got) == 5
    for (gf, go), (wf, wo) in zip(got, want):
        np.testing.assert_allclose(gf, wf, atol=1e-5)
        np.testing.assert_allclose(go, wo, atol=1e-5)
    # tail chunk (2 pairs) padded to the full chunk shape: one batch size
    assert calls[5:] == [3, 3], calls[5:]
    # disk cache populated -> a fresh cache re-serves without flow_fn
    fc2 = _FlowCache(flow_fn, {}, str(tmp_path))
    n_calls = len(calls)
    out2 = fc2.get_batch(frames, list(range(5)), [f"t{j}" for j in range(5)])
    assert len(calls) == n_calls
    np.testing.assert_allclose(out2[2][0], want[2][0], atol=1e-5)
