"""HED parity against the reference torch implementation (random
weights, converted)."""
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fresco_tpu.models.hed import HED, convert_hed  # noqa: E402

ANNOT = pathlib.Path("/root/reference/src/ControlNet")


def test_hed_matches_reference_torch():
    if not ANNOT.exists():
        pytest.skip("reference annotators not mounted")
    if str(ANNOT) not in sys.path:
        sys.path.insert(0, str(ANNOT))
    # the reference module pulls cv2/einops at import; model class only
    from annotator.hed import ControlNetHED_Apache2

    torch.manual_seed(0)
    tm = ControlNetHED_Apache2().float().eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.mul_(0.05)  # keep activations in a sane range

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        edges = tm(torch.from_numpy(img).permute(0, 3, 1, 2))
        ups = [
            torch.nn.functional.interpolate(
                e, size=(32, 32), mode="bilinear", align_corners=False
            )[0, 0].numpy()
            for e in edges
        ]
        ref = 1.0 / (1.0 + np.exp(-np.mean(np.stack(ups, 0), axis=0)))

    model = HED()
    params = {"params": convert_hed(tm.state_dict())}
    out = np.asarray(model.apply(params, jnp.asarray(img)))[0]
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_hed_shapes(rng):
    model = HED()
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 16, 16)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
