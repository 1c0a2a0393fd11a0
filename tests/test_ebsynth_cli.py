"""ebsynth-compatible CLI: flag semantics + end-to-end file outputs."""
import struct

import numpy as np
import pytest

from fresco_tpu.propagate.ebsynth_cli import main, parse_args


def test_parse_args_weight_binds_to_preceding():
    o = parse_args(
        "-style s.png -weight 2 -guide a.png b.png -weight 6 "
        "-guide c.png d.png -output o.png -uniformity 1000 -patchsize 7 "
        "-searchvoteiters 12 -patchmatchiters 6 -extrapass3x3 "
        "-backend cpu".split()
    )
    assert o["style_weight"] == 2
    assert [g["weight"] for g in o["guides"]] == [6, 1.0]
    assert o["uniformity"] == 1000 and o["patchsize"] == 7
    assert o["searchvoteiters"] == 12 and o["patchmatchiters"] == 6
    assert o["extrapass3x3"] is True
    assert o["backend"] == "native"  # cpu maps to the serpentine backend
    assert parse_args("-style s -guide a b".split())["backend"] == "tpu"


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    tgt = np.roll(img, 4, axis=1)
    style = 255 - img
    for name, data in (("s.png", style), ("a.png", img), ("b.png", tgt)):
        cv2.imwrite(str(tmp_path / name), data)
    out = tmp_path / "out.png"
    main(
        f"-style {tmp_path}/s.png -guide {tmp_path}/a.png {tmp_path}/b.png "
        f"-weight 6 -output {out} -patchsize 5 -pyramidlevels 2 "
        f"-searchvoteiters 2 -patchmatchiters 2 -backend cpu".split()
    )
    assert out.exists()
    res = cv2.imread(str(out))
    assert res.shape == (48, 48, 3)
    # error map in the reference .bin format (video_blend.py:159-169)
    with open(tmp_path / "out.bin", "rb") as f:
        raw = f.read()
    (n,) = struct.unpack("q", raw[:8])
    assert n == 48 * 48
    err = np.frombuffer(raw[8:], np.float32)
    assert err.size == n and np.all(np.isfinite(err))
