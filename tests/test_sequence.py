"""VideoSequence path bookkeeping (SURVEY component #29) and video_util
helpers (#34)."""
import os

import numpy as np
import pytest

from fresco_tpu.propagate.sequence import VideoSequence


def test_layout_and_sequences(tmp_path):
    vs = VideoSequence(str(tmp_path), [0, 5, 9])
    assert vs.beg_frame == 0 and vs.end_frame == 9 and vs.n_seq == 2
    assert vs.interval(0) == 5 and vs.interval(1) == 4
    # out_<k> lifecycle (reference video_sequence.py:180-187)
    for k in (0, 5, 9):
        assert os.path.isdir(tmp_path / f"out_{k}")
        assert os.path.isdir(tmp_path / "tmp" / f"out_{k}")
    assert os.path.isdir(vs.blending_dir)

    # reference-exact ids (video_sequence.py:63-75): forward beg..end-1,
    # backward end..beg+1 — NOT the forward list reversed
    fwd = vs.get_input_sequence(0)
    assert [os.path.basename(p) for p in fwd] == [
        "%04d.png" % i for i in range(5)
    ]
    bwd = vs.get_input_sequence(0, is_forward=False)
    assert [os.path.basename(p) for p in bwd] == [
        "%04d.png" % i for i in (5, 4, 3, 2, 1)
    ]

    # forward outputs land in out_<beg>, backward in out_<end>
    assert vs.get_output_sequence(0)[0].startswith(str(tmp_path / "out_0"))
    assert vs.get_output_sequence(0, is_forward=False)[0].startswith(
        str(tmp_path / "out_5")
    )

    # flows: one per consecutive pair (video_sequence.py:138-152)
    ff = [os.path.basename(p) for p in vs.get_flow_sequence(0)]
    assert ff == ["flow_f_%04d.npy" % i for i in range(4)]
    fb = [os.path.basename(p) for p in vs.get_flow_sequence(0, False)]
    assert fb == ["flow_b_%04d.npy" % i for i in (5, 4, 3, 2)]

    assert os.path.basename(vs.get_key_img(1)) == "0005.png"
    assert os.path.basename(vs.get_temporal_sequence(1)[0]) == "temporal_0005.png"

    vs.remove_out_and_tmp()
    assert not os.path.isdir(tmp_path / "out_0")
    assert not os.path.isdir(tmp_path / "tmp")


def test_video_round_trip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from fresco_tpu.propagate.video_blend import (
        frames_to_video, get_fps, get_frame_count, video_to_frames,
    )

    src = tmp_path / "in"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(
            str(src / ("%04d.png" % i)),
            rng.integers(0, 255, (32, 48, 3)).astype(np.uint8),
        )
    mp4 = str(tmp_path / "clip.mp4")
    frames_to_video(str(src), mp4, fps=8)
    assert get_frame_count(mp4) == 4
    assert get_fps(mp4) == pytest.approx(8, abs=0.5)
    out = tmp_path / "out"
    n = video_to_frames(mp4, str(out))
    assert n == 4
    assert sorted(os.listdir(out)) == ["%04d.png" % i for i in range(4)]
