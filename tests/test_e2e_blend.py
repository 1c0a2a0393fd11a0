"""End-to-end propagation smoke: stylized keyframes -> full-video blend
through the video_blend surface (tiny flow model, small frames)."""
import os
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_blend_video_end_to_end(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
    from fresco_tpu.propagate.patchmatch import PatchMatchConfig
    from fresco_tpu.propagate.video_blend import blend_video

    # synthetic moving-square clip, 7 frames, keys at 0 and 6
    h = w = 64
    os.makedirs(tmp_path / "video")
    os.makedirs(tmp_path / "keys")
    base = rng.integers(30, 120, (h, w, 3)).astype(np.uint8)
    for i in range(7):
        f = base.copy()
        x0 = 8 + 4 * i
        f[20:36, x0 : x0 + 16] = (220, 60, 60)
        cv2.imwrite(str(tmp_path / "video" / ("%04d.png" % i)), f)
        if i in (0, 6):
            # "stylized": inverted colors
            cv2.imwrite(str(tmp_path / "keys" / ("%04d.png" % i)), 255 - f)

    model = GMFlow(GMFlowConfig.tiny())
    z = jnp.zeros((1, h, w, 3))
    params = model.init(jax.random.key(0), z, z)
    flow_fn = jax.jit(lambda a, b: model.apply(params, a, b))

    out_dir = blend_video(
        str(tmp_path),
        key_ind=[0, 6],
        output=str(tmp_path / "blend.mp4"),
        fps=10,
        poisson=True,
        flow_fn=flow_fn,
        patch_cfg=PatchMatchConfig(
            patch_size=5, pm_iters=2, sv_iters=2, num_pyramid_levels=2
        ),
    )
    frames = sorted(pathlib.Path(out_dir).glob("*.png"))
    assert len(frames) == 7
    mid = cv2.imread(str(frames[3]))
    assert mid is not None and mid.shape == (h, w, 3)
    # blended interior frames should resemble the inverted style domain
    key = cv2.imread(str(tmp_path / "keys" / "0000.png")).astype(np.float32)
    diff_style = np.abs(mid.astype(np.float32) - key).mean()
    diff_input = np.abs(
        mid.astype(np.float32)
        - cv2.imread(str(tmp_path / "video" / "0003.png")).astype(np.float32)
    ).mean()
    assert diff_style < diff_input, (diff_style, diff_input)
    assert (tmp_path / "blend.mp4").exists()

    # consistency metrics as a regression bound (BASELINE.md acceptance
    # metrics, wired the same way the CLI reports them after propagation)
    from fresco_tpu.metrics import evaluate_translation

    blended = np.stack(
        [cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB) for f in frames]
    )
    report = evaluate_translation(blended, flow_fn)
    assert np.isfinite(report["warp_error"])
    assert np.isfinite(report["frame_similarity"])
    # blended output frames must stay strongly self-similar frame to frame;
    # a candidate-indexing regression (ghosting) drags this down
    assert report["frame_similarity"] > 0.5, report
    assert report["warp_error"] < 100.0, report


@pytest.mark.slow
def test_blend_video_multi_interval_prefetch(tmp_path, rng):
    """Multiple keyframe intervals through the depth-1 prefetch pipeline
    (interval k+1 synthesizes while interval k blends) — all frames must
    be written and ordered, matching the sequential semantics."""
    cv2 = pytest.importorskip("cv2")
    from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
    from fresco_tpu.propagate.patchmatch import PatchMatchConfig
    from fresco_tpu.propagate.video_blend import blend_video

    h = w = 48
    os.makedirs(tmp_path / "video")
    os.makedirs(tmp_path / "keys")
    base = rng.integers(30, 120, (h, w, 3)).astype(np.uint8)
    for i in range(7):
        f = base.copy()
        f[10 : 10 + 2 * i + 4, 8:24] = (60, 200, 60)
        cv2.imwrite(str(tmp_path / "video" / ("%04d.png" % i)), f)
        if i in (0, 3, 6):
            cv2.imwrite(str(tmp_path / "keys" / ("%04d.png" % i)), 255 - f)

    model = GMFlow(GMFlowConfig.tiny())
    z = jnp.zeros((1, h, w, 3))
    params = model.init(jax.random.key(0), z, z)
    flow_fn = jax.jit(lambda a, b: model.apply(params, a, b))

    out_dir = blend_video(
        str(tmp_path),
        key_ind=[0, 3, 6],
        poisson=False,
        flow_fn=flow_fn,
        patch_cfg=PatchMatchConfig(
            patch_size=5, pm_iters=1, sv_iters=1, num_pyramid_levels=1
        ),
    )
    frames = sorted(pathlib.Path(out_dir).glob("*.png"))
    assert [f.name for f in frames] == ["%04d.png" % i for i in range(7)]
    for f in frames:
        img = cv2.imread(str(f))
        assert img is not None and img.shape == (h, w, 3)
