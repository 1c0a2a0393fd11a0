"""Checkpoint/resume and profiling utility tests."""
import numpy as np

import jax.numpy as jnp


def test_pipeline_state_roundtrip(tmp_path):
    from fresco_tpu.utils.checkpoint import load_pipeline_state, save_pipeline_state

    state = {
        "batch_ind": np.int32(2),
        "keys": np.asarray([0, 10, 20]),
        "record": np.ones((3, 2, 4, 4, 4), np.float32),
    }
    p = str(tmp_path / "state")
    save_pipeline_state(p, state)
    back = load_pipeline_state(p)
    assert int(back["batch_ind"]) == 2
    np.testing.assert_array_equal(np.asarray(back["keys"]), state["keys"])
    np.testing.assert_allclose(np.asarray(back["record"]), state["record"])


def test_load_missing_returns_none(tmp_path):
    from fresco_tpu.utils.checkpoint import load_pipeline_state

    assert load_pipeline_state(str(tmp_path / "nope")) is None


def test_phase_timer_collects():
    from fresco_tpu.utils.profiling import PhaseTimes, phase_timer

    pt = PhaseTimes()
    with phase_timer(pt, "work", sync=False):
        _ = jnp.ones((4,)) + 1
    assert pt.counts["work"] == 1
    assert pt.times["work"] >= 0
    assert "work" in pt.report()

def test_evaluate_consistency_centered_window(tmp_path, monkeypatch):
    """Long clips are sampled as a CENTERED contiguous window — a
    head-truncated window would score only the first (double-anchored)
    keyframe interval."""
    import cv2

    from fresco_tpu import metrics
    from fresco_tpu.core.config import FrescoConfig
    from fresco_tpu.pipeline.runner import FrescoPipeline

    n = 50
    img = np.zeros((8, 8, 3), np.uint8)
    for i in range(n):
        cv2.imwrite(str(tmp_path / ("%04d.png" % i)), img + i)

    seen = {}

    def fake_eval(frames, flow_fn, clip_enc=None):
        seen["frames"] = np.asarray(frames)
        return {"warp_error": 0.0}

    monkeypatch.setattr(metrics, "evaluate_translation", fake_eval)
    pipe = FrescoPipeline.__new__(FrescoPipeline)
    pipe.config = FrescoConfig(gmflow_path="")
    out = pipe.evaluate_consistency(str(tmp_path), max_frames=16)
    assert out == {"warp_error": 0.0}
    f = seen["frames"]
    assert f.shape[0] == 16
    # centered: window starts at (50-16)//2 = 17; frame value encodes index
    assert int(f[0, 0, 0, 0]) == 17 and int(f[-1, 0, 0, 0]) == 32


def test_bundled_clip_prefers_repo_local():
    from pathlib import Path

    from fresco_tpu.utils.clips import bundled_clip, read_frames

    for name in (
        "music.mp4", "car-turn.mp4", "dog.mp4",
        "boxer-punching-towards-camera.mp4",
    ):
        p = bundled_clip(name)
        assert Path(p).exists(), p
        assert "/data/" in p and not p.startswith("/root/reference"), p
    # the clip actually decodes
    frames = read_frames(bundled_clip("music.mp4"), 2)
    assert frames is not None and len(frames) == 2
    assert frames[0].ndim == 3 and frames[0].shape[2] == 3
    # unknown names fall back to the reference checkout path
    assert bundled_clip("nope.mp4") == "/root/reference/data/nope.mp4"
