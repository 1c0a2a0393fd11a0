"""GMFlow numerical parity against the reference torch implementation
(random weights, converted), plus functional properties."""
import pathlib
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig  # noqa: E402
from fresco_tpu.models.gmflow.convert import convert_gmflow  # noqa: E402

REFERENCE = pathlib.Path("/root/reference/src/ebsynth/deps/gmflow")


def _load_reference_gmflow():
    if not REFERENCE.exists():
        pytest.skip("reference gmflow not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from gmflow.gmflow import GMFlow as TorchGMFlow

    torch.manual_seed(0)
    model = TorchGMFlow(
        feature_channels=128, num_scales=1, upsample_factor=8, num_head=1,
        attention_type="swin", ffn_dim_expansion=4, num_transformer_layers=6,
    ).eval()
    return model


@pytest.mark.slow
def test_gmflow_matches_reference_torch():
    tm = _load_reference_gmflow()
    rng = np.random.default_rng(0)
    h, w = 64, 64
    img0 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        res = tm(
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(img1).permute(0, 3, 1, 2),
            attn_splits_list=[2], corr_radius_list=[-1], prop_radius_list=[-1],
            pred_bidir_flow=True,
        )
    ref_flow = res["flow_preds"][-1].permute(0, 2, 3, 1).numpy()  # [2,h,w,2]

    model = GMFlow(GMFlowConfig())
    params = {"params": convert_gmflow(tm.state_dict())}
    out = np.asarray(model.apply(params, jnp.asarray(img0), jnp.asarray(img1)))

    assert out.shape == ref_flow.shape
    np.testing.assert_allclose(out, ref_flow, atol=5e-3, rtol=1e-3)


def test_gmflow_tiny_shapes(rng):
    model = GMFlow(GMFlowConfig.tiny())
    import jax

    img = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.key(0), img, img)
    flow = model.apply(params, img, img)
    assert flow.shape == (4, 32, 32, 2)  # bidirectional
    assert np.all(np.isfinite(np.asarray(flow)))
