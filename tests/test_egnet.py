"""EGNet structural tests + golden parity vs the reference torch model
(random weights through the converter)."""
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fresco_tpu.models.egnet import EGNet, convert_egnet  # noqa: E402

EGNET_DIR = pathlib.Path("/root/reference/src/EGNet")


@pytest.mark.slow
def test_egnet_matches_reference_torch():
    if not EGNET_DIR.exists():
        pytest.skip("reference EGNet not mounted")
    if str(EGNET_DIR) not in sys.path:
        sys.path.insert(0, str(EGNET_DIR))
    from model import build_model

    torch.manual_seed(0)
    tm = build_model("resnet").eval()
    # bound the random batchnorm stats so activations stay finite
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_var.fill_(1.0)
            m.running_mean.zero_()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 10
    with torch.no_grad():
        up_edge, up_sal, up_sal_f = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = up_sal_f[-1][0, 0].numpy()

    model = EGNet()
    params = {"params": convert_egnet(tm.state_dict())}
    _, _, up_score = model.apply(params, jnp.asarray(x))
    out = np.asarray(up_score[-1])[0, :, :, 0]
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-2)


def test_saliency_mask_range(rng):
    from fresco_tpu.models.egnet import saliency_background_mask

    model = EGNet()
    imgs = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    from fresco_tpu.models.egnet import saliency_input

    x = saliency_input(imgs)
    params = model.init(jax.random.key(0), x)
    mask = saliency_background_mask(model, params, imgs)
    assert mask.shape == (1, 32, 32, 1)
    assert float(mask.min()) >= 0.0 and float(mask.max()) <= 1.0


def test_make_saliency_fn_matches_eager(rng):
    """The jitted runner path (make_saliency_fn) must be numerically
    identical to the documented eager formulation."""
    from fresco_tpu.models.egnet import (
        make_saliency_fn, saliency_background_mask, saliency_input,
    )

    model = EGNet()
    imgs = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    params = model.init(jax.random.key(0), saliency_input(imgs))

    ref = np.asarray(saliency_background_mask(model, params, imgs))
    out = np.asarray(make_saliency_fn(model, params)(imgs))
    assert out.shape == (2, 32, 32, 1)
    # jit fusion reassociates float ops: observed max |diff| ~1e-6
    np.testing.assert_allclose(out, ref, atol=1e-4)
