"""Guards for bench.py's workload honesty.

Round-5 review finding: the full-row cost-parity GMFlow call was traced
inside the jitted _interframe with its result discarded, so jaxpr DCE
removed the forward entirely — the bench reported the "full workload"
row while paying zero GMFlow device cost.  These tests pin the fix
(bench.make_cost_parity_flow_fn): the GMFlow compute must survive into
the traced program, and the residual coupling must be numerically an
exact identity on the Farneback values.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _count_dots(fn, *args) -> int:
    """dot/conv op count in the LOWERED module.  make_jaxpr keeps
    discarded inner-pjit calls; the DCE that killed the round-5 bench
    workload happens at lowering — so that is the layer to inspect."""
    text = jax.jit(fn).lower(*args).as_text()
    return text.count("stablehlo.dot_general") + text.count(
        "stablehlo.convolution"
    )


@pytest.fixture(scope="module")
def tiny_gmflow():
    from fresco_tpu.models.gmflow.model import GMFlow, GMFlowConfig

    model = GMFlow(GMFlowConfig.tiny())
    a = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), a, a)
    return model, params, a


def test_cost_parity_flow_fn_survives_dce(tiny_gmflow):
    sys.path.insert(0, "/root/repo")
    import bench

    model, params, a = tiny_gmflow
    fb = jnp.ones((4, 32, 32, 2))
    fb_flow = lambda x, y: fb
    gm_cost = jax.jit(lambda p, x, y: model.apply(p, x, y))
    flow_fn = bench.make_cost_parity_flow_fn(gm_cost, params, fb_flow)

    # the lowered program must contain the GMFlow matmuls/convs
    assert _count_dots(flow_fn, a, a) > 10, (
        "GMFlow forward was dead-code-eliminated from the cost-parity "
        "flow_fn — the bench full row would not pay its device cost"
    )
    # ... and a discarded call (the round-5 bug) would NOT:
    def buggy(x, y):
        gm_cost(params, x, y)
        return fb_flow(x, y)

    assert _count_dots(buggy, a, a) == 0

    # value identity: the sub-ulp residual must not change the f32
    # Farneback values (nonzero flows; exact bit equality required)
    out = np.asarray(jax.jit(flow_fn)(a, a))
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, np.asarray(fb))
