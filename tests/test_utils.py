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
