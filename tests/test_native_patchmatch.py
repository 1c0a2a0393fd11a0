"""Native C++ serpentine backend: build, run, and reconstruction parity
with the TPU jump-flood backend."""
import numpy as np
import pytest

import jax.numpy as jnp

from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize


@pytest.fixture(scope="module")
def native_available():
    from fresco_tpu.propagate.native import is_available

    if not is_available():
        pytest.skip("g++/OpenMP unavailable")
    return True


def test_native_identity_reconstruction(native_available, rng):
    h = w = 48
    guides = (
        0.8 * np.tile(
            ((np.add.outer(np.arange(h) // 8, np.arange(w) // 8) % 2) * 200 + 30)[
                :, :, None
            ],
            (1, 1, 3),
        )
        + 0.2 * rng.uniform(0, 255, (h, w, 3))
    ).astype(np.float32)
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)

    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=3, sv_iters=3, uniformity=0.0, num_pyramid_levels=2
    )
    out, err, nnf = synthesize(
        jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
        jnp.full((3,), 2.0), cfg, backend="native",
    )
    out = np.asarray(out)
    m = 6
    diff = np.abs(out[m:-m, m:-m] - style[m:-m, m:-m]).mean()
    assert diff < 10.0, diff
    assert np.all(np.asarray(err) >= 0)


def test_native_and_tpu_backends_agree_on_easy_case(native_available, rng):
    """Both backends must find the same (identity) solution when the
    guides make it unambiguous."""
    h = w = 40
    guides = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=4, sv_iters=3, uniformity=0.0, num_pyramid_levels=1
    )
    out_n, _, _ = synthesize(
        jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
        jnp.full((3,), 2.0), cfg, backend="native",
    )
    out_t, _, _ = synthesize(
        jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
        jnp.full((3,), 2.0), cfg, backend="tpu",
    )
    m = 6
    d = np.abs(np.asarray(out_n)[m:-m, m:-m] - np.asarray(out_t)[m:-m, m:-m]).mean()
    assert d < 8.0, d
