"""MLSD golden tests vs the reference model itself (imported read-only by
file path; reference src/ControlNet/annotator/mlsd/models/mbv2_mlsd_large.py
has no package-relative imports)."""
import importlib.util

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import REFERENCE, has_reference

torch = pytest.importorskip("torch")

from fresco_tpu.models.mlsd import (  # noqa: E402
    MLSDLarge,
    convert_mlsd,
    decode_center_displacement,
    mlsd_detector,
)


def _import_ref_mlsd():
    if not has_reference():
        pytest.skip("reference repo not mounted")
    path = REFERENCE / "src/ControlNet/annotator/mlsd/models/mbv2_mlsd_large.py"
    spec = importlib.util.spec_from_file_location("ref_mlsd", str(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_and_params():
    ref = _import_ref_mlsd()
    torch.manual_seed(0)
    tm = ref.MobileV2_MLSD_Large().eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    params = {"params": convert_mlsd(sd)}
    return tm, params


@pytest.mark.slow
def test_mlsd_forward_golden(ref_and_params, rng):
    tm, params = ref_and_params
    model = MLSDLarge()
    x = torch.rand(1, 4, 64, 64) * 2 - 1
    with torch.no_grad():
        want = tm(x).numpy()
    got = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=5e-4
    )


@pytest.mark.slow
def test_mlsd_decode_matches_reference(ref_and_params, rng):
    """decode_center_displacement vs utils.py deccode_output_score_and_ptss
    on the same model output."""
    tm, params = ref_and_params
    x = torch.rand(1, 4, 64, 64) * 2 - 1
    with torch.no_grad():
        tp = tm(x)

    import torch.nn.functional as F

    heat = torch.sigmoid(tp[:, 0])
    hmax = F.max_pool2d(heat, (3, 3), stride=1, padding=1)
    heat = (heat * (hmax == heat).float()).reshape(-1)
    want_scores, want_idx = torch.topk(heat, 16, dim=-1, largest=True)

    out = jnp.asarray(tp.numpy().transpose(0, 2, 3, 1))
    scores, yx, disp = decode_center_displacement(out, topk=16, ksize=3)
    w = tp.shape[-1]
    got_idx = np.asarray(yx[:, 0]) * w + np.asarray(yx[:, 1])
    np.testing.assert_allclose(
        np.asarray(scores), want_scores.numpy(), atol=1e-5
    )
    # top-k tie order can differ; compare as sets weighted by score
    assert set(got_idx.tolist()) == set(want_idx.numpy().tolist())
    np.testing.assert_allclose(
        np.asarray(disp), tp[0, 1:5].numpy().transpose(1, 2, 0), atol=1e-5
    )


def test_mlsd_detector_shapes(ref_and_params, rng):
    pytest.importorskip("cv2")
    _, params = ref_and_params
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    out = mlsd_detector(MLSDLarge(), params, img, input_shape=(64, 64))
    assert out.shape == (64, 96)
    assert out.dtype == np.uint8
