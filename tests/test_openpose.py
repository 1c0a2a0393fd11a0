"""OpenPose golden tests: model forward vs the reference's model.py
(imported read-only by file path; its decode body.py is unimportable here
— torchvision absent — so the rewritten decode is verified behaviorally
on a synthetic skeleton)."""
import importlib.util

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import REFERENCE, has_reference

torch = pytest.importorskip("torch")

from fresco_tpu.models.openpose import (  # noqa: E402
    _LIMB_SEQ,
    _PAF_IDX,
    BodyPose,
    HandPose,
    body_decode,
    convert_openpose,
    draw_bodypose,
    openpose_detector,
)


def _import_ref_model():
    if not has_reference():
        pytest.skip("reference repo not mounted")
    path = REFERENCE / "src/ControlNet/annotator/openpose/model.py"
    spec = importlib.util.spec_from_file_location("ref_openpose", str(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_body_forward_golden():
    ref = _import_ref_model()
    torch.manual_seed(0)
    tm = ref.bodypose_model().eval()
    params = {"params": convert_openpose(tm.state_dict())}
    x = torch.rand(1, 3, 64, 64) - 0.5
    with torch.no_grad():
        want_paf, want_heat = tm(x)
    paf, heat = BodyPose().apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(paf).transpose(0, 3, 1, 2), want_paf.numpy(),
        atol=5e-4, rtol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(heat).transpose(0, 3, 1, 2), want_heat.numpy(),
        atol=5e-4, rtol=5e-4,
    )


@pytest.mark.slow
def test_hand_forward_golden():
    ref = _import_ref_model()
    torch.manual_seed(1)
    tm = ref.handpose_model().eval()
    params = {"params": convert_openpose(tm.state_dict(), hand=True)}
    x = torch.rand(1, 3, 64, 64) - 0.5
    with torch.no_grad():
        want = tm(x)
    got = HandPose().apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
        atol=5e-4, rtol=5e-4,
    )


def test_body_decode_recovers_synthetic_skeleton(rng):
    pytest.importorskip("scipy")
    H = W = 96
    parts_xy = {}
    # place all 18 parts on a plausible grid
    for p in range(18):
        parts_xy[p] = (20 + 3 * p, 10 + 4 * p)
    heat = np.zeros((H, W, 19), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for p, (x, y) in parts_xy.items():
        heat[:, :, p] = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / 8.0)
    paf = np.zeros((H, W, 38), np.float32)
    for k in range(len(_LIMB_SEQ)):
        a, b = _LIMB_SEQ[k]
        va = np.asarray(parts_xy[b]) - np.asarray(parts_xy[a])
        va = va / max(np.linalg.norm(va), 1e-3)
        paf[:, :, _PAF_IDX[k][0]] = va[0]
        paf[:, :, _PAF_IDX[k][1]] = va[1]

    candidate, subset = body_decode(heat, paf, H)
    assert len(subset) == 1
    assert subset[0][-1] == 18  # all parts assembled into one person
    for p, (x, y) in parts_xy.items():
        idx = int(subset[0][p])
        assert abs(candidate[idx][0] - x) <= 1 and abs(candidate[idx][1] - y) <= 1

    cv2 = pytest.importorskip("cv2")
    canvas = draw_bodypose(np.zeros((H, W, 3), np.uint8), candidate, subset)
    assert canvas.sum() > 0


@pytest.mark.slow
def test_openpose_detector_smoke(rng):
    pytest.importorskip("cv2")
    pytest.importorskip("scipy")
    ref = _import_ref_model()
    torch.manual_seed(0)
    tm = ref.bodypose_model().eval()
    params = {"params": convert_openpose(tm.state_dict())}
    img = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)
    canvas = openpose_detector(BodyPose(), params, img)
    assert canvas.shape == img.shape
