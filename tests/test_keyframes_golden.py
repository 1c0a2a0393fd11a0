"""Keyframe selection golden parity vs the reference's get_keyframe_ind
(src/keyframe_selection.py:20-60) on the bundled clip."""
import pathlib
import sys

import pytest

torch = pytest.importorskip("torch")

MUSIC = "/root/reference/data/music.mp4"


@pytest.mark.slow
def test_keyframe_selection_matches_reference():
    if not pathlib.Path(MUSIC).exists():
        pytest.skip("reference clip not mounted")
    torch.Tensor.cuda = lambda self, *a, **k: self  # reference calls .cuda()
    for p in ("/root/reference", "/root/reference/src/ebsynth/deps/gmflow"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    ks = importlib.import_module("src.keyframe_selection")
    ref = [int(k) for k in ks.get_keyframe_ind(MUSIC, 240, 10, 30)]

    from fresco_tpu.pipeline.keyframes import select_keyframes

    mine = select_keyframes(MUSIC, 240, 10, 30)
    assert mine == ref
