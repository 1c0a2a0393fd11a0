"""Pipelined keyframe-batch orchestration (translate_keyframes).

Batch k+1's prep overlaps batch k's denoise on a prep thread; these
tests pin the orchestration semantics against the reference's serial
loop (run_fresco.py:180-269): anchor-frame carry ([first overall
keyframe, previous batch's last] prepended to propagation batches,
run_fresco.py:262-265), latent-record threading
(pipe_FRESCO.py:175-179), propagation flags, and output writing —
using recording fakes for the heavy prep/denoise so no model compiles.
"""
import os
import types

import numpy as np
import pytest

import jax.numpy as jnp

from fresco_tpu.core.config import FrescoConfig, default_prompts

MUSIC = "/root/reference/data/music.mp4"


def _make_pipe(tmp_path):
    from fresco_tpu.pipeline.runner import FrescoPipeline
    from fresco_tpu.utils.profiling import PhaseTimes

    cfg = FrescoConfig(
        file_path=MUSIC,
        save_path=str(tmp_path) + "/",
        resolution=64,
        frame_count=24,
        mininterv=2,
        maxinterv=2,      # uniform stride-2 keys -> 12 keys -> 2 batches
        batch_size=8,
        prompt="p",
    )
    pipe = object.__new__(FrescoPipeline)
    pipe.config = cfg
    pipe.bundle = types.SimpleNamespace(params=None)
    pipe.phases = PhaseTimes()
    return pipe, cfg


@pytest.mark.skipif(not os.path.exists(MUSIC), reason="demo clip missing")
def test_pipelined_batches_match_serial_semantics(tmp_path):
    pipe, cfg = _make_pipe(tmp_path)

    prep_calls = []
    run_calls = []

    def fake_prep(imgs, prompts, n_prompts, rng):
        prep_calls.append((list(imgs), list(prompts), list(n_prompts)))
        return {"imgs": list(imgs), "k": len(prep_calls) - 1}

    def fake_run(prepared, record, propagation, rng):
        run_calls.append((prepared["k"], record, propagation))
        n = len(prepared["imgs"])
        return jnp.zeros((n, 8, 8, 4)), f"record{prepared['k']}"

    pipe._prepare_batch = fake_prep
    pipe._run_batch = fake_run
    pipe._decode_jit = lambda params, lat: jnp.zeros(
        (lat.shape[0], 64, 64, 3)
    )

    keys = pipe.translate_keyframes(verbose=False)
    assert len(keys) == 12

    frames = pipe.read_frames()
    from fresco_tpu.core.config import keyframe_sublists

    sublists = keyframe_sublists(keys, cfg.batch_size)
    assert len(sublists) == 2
    assert len(prep_calls) == 2 and len(run_calls) == 2

    # batch 0: exactly its keyframes, no anchors
    imgs0, prompts0, _ = prep_calls[0]
    assert len(imgs0) == len(sublists[0])
    assert all(
        np.array_equal(im, frames[i]) for im, i in zip(imgs0, sublists[0])
    )

    # batch 1 prepends [first overall keyframe, batch 0's last keyframe]
    # as INPUT anchors (run_fresco.py:262-265)
    imgs1, prompts1, _ = prep_calls[1]
    assert len(imgs1) == 2 + len(sublists[1])
    assert np.array_equal(imgs1[0], frames[sublists[0][0]])
    assert np.array_equal(imgs1[1], frames[sublists[0][-1]])
    assert all(
        np.array_equal(im, frames[i])
        for im, i in zip(imgs1[2:], sublists[1])
    )
    a_prompt, _ = default_prompts(cfg.sd_path)
    assert prompts1[0] == prompts0[0] == cfg.prompt + a_prompt
    assert prompts1[1] == prompts0[-1]

    # record threading + propagation flags (pipe_FRESCO.py:175-179)
    assert run_calls[0] == (0, None, False)
    assert run_calls[1] == (1, "record0", True)

    # every keyframe PNG written
    written = sorted(os.listdir(os.path.join(cfg.save_path, "keys")))
    assert written == ["%04d.png" % k for k in keys]


@pytest.mark.skipif(not os.path.exists(MUSIC), reason="demo clip missing")
def test_pipelined_failure_does_not_hang(tmp_path):
    """A denoise failure surfaces immediately (the prep executor is shut
    down with cancel_futures, same policy as blend_video)."""
    pipe, cfg = _make_pipe(tmp_path)
    pipe._prepare_batch = lambda *a: {"imgs": [None] * 8}

    def boom(prepared, record, propagation, rng):
        raise RuntimeError("denoise failed")

    pipe._run_batch = boom
    pipe._decode_jit = lambda params, lat: lat
    with pytest.raises(RuntimeError, match="denoise failed"):
        pipe.translate_keyframes(verbose=False)


@pytest.mark.skipif(not os.path.exists(MUSIC), reason="demo clip missing")
def test_sync_phases_disables_prep_overlap(tmp_path):
    """sync_phases=True must run prep SERIALLY on the main thread:
    an overlapped prep timer blocks behind the in-flight denoise scan
    on the single device stream and reports queue wait as phase cost
    (cli.py --sync-phases contract)."""
    import threading

    pipe, cfg = _make_pipe(tmp_path)
    pipe.sync_phases = True
    events = []
    main = threading.get_ident()

    def fake_prep(imgs, prompts, n_prompts, rng):
        events.append(("prep", threading.get_ident() == main))
        return {"imgs": list(imgs)}

    def fake_run(prepared, record, propagation, rng):
        events.append(("run", threading.get_ident() == main))
        n = len(prepared["imgs"])
        return jnp.zeros((n, 8, 8, 4)), record

    pipe._prepare_batch = fake_prep
    pipe._run_batch = fake_run
    pipe._decode_jit = lambda params, lat: jnp.zeros(
        (lat.shape[0], 64, 64, 3)
    )
    keys = pipe.translate_keyframes(verbose=False)
    assert len(keys) == 12
    # strict prep->run interleaving, every call on the main thread
    assert events == [("prep", True), ("run", True)] * 2
