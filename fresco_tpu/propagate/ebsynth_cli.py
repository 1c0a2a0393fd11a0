"""Standalone ebsynth-compatible CLI.

Drop-in equivalent of the reference's native binary
(reference src/ebsynth/deps/ebsynth/src/ebsynth.cpp:290-498): same flags,
same "-weight applies to the preceding -style/-guide" semantics, writes
the stylized PNG plus the serialized float error map ``<output>.bin``
(int64 pixel count + float32 array — the format video_blend.py:159-169
consumes).

    python -m fresco_tpu.propagate.ebsynth_cli \
        -style style.png -guide src.png tgt.png -weight 6 \
        -output out.png -searchvoteiters 12 -patchmatchiters 6 \
        -backend tpu

``-backend tpu`` (default) runs the jump-flood device synthesizer with
the reference CUDA backend's ``-stopthreshold`` semantics (per-pixel
freeze mask + whole-level early exit, ebsynth_cuda.cu:538-583);
``-backend cpu`` runs the C++ serpentine parity backend, which — like
the reference CPU backend — compiles the stop mask out.  ``cuda`` is
accepted and mapped to tpu.
"""
from __future__ import annotations

import struct
import sys

import numpy as np


def _fail(msg: str) -> "NoReturn":  # noqa: F821
    print(f"error: {msg}", file=sys.stderr)
    sys.exit(1)


def parse_args(argv: list[str]) -> dict:
    style = None
    style_weight = None
    guides: list[dict] = []
    opts = dict(
        output="output.png", uniformity=3500.0, patchsize=5,
        pyramidlevels=-1, searchvoteiters=6, patchmatchiters=4,
        stopthreshold=5, extrapass3x3=False, backend="tpu",
    )
    i = 0
    prev_weight_slot = None
    while i < len(argv):
        a = argv[i]
        if a == "-style":
            style = argv[i + 1]
            prev_weight_slot = "style"
            i += 2
        elif a == "-guide":
            guides.append(dict(source=argv[i + 1], target=argv[i + 2], weight=None))
            prev_weight_slot = "guide"
            i += 3
        elif a == "-weight":
            w = float(argv[i + 1])
            if prev_weight_slot == "style":
                style_weight = w
            elif prev_weight_slot == "guide":
                guides[-1]["weight"] = w
            else:
                _fail("-weight must follow -style or -guide")
            i += 2
        elif a == "-output":
            opts["output"] = argv[i + 1]
            i += 2
        elif a == "-uniformity":
            opts["uniformity"] = float(argv[i + 1])
            i += 2
        elif a in ("-patchsize", "-pyramidlevels", "-searchvoteiters",
                   "-patchmatchiters", "-stopthreshold"):
            opts[a[1:]] = int(argv[i + 1])
            i += 2
        elif a == "-extrapass3x3":
            opts["extrapass3x3"] = True
            i += 1
        elif a == "-backend":
            b = argv[i + 1].lower()
            opts["backend"] = {"cpu": "native", "cuda": "tpu"}.get(b, b)
            i += 2
        else:
            _fail(f"unknown option {a}")
    if style is None:
        _fail("missing -style")
    if not guides:
        _fail("missing -guide")
    opts.update(
        style=style,
        style_weight=1.0 if style_weight is None else style_weight,
        guides=[
            dict(g, weight=1.0 if g["weight"] is None else g["weight"])
            for g in guides
        ],
    )
    return opts


def write_error_bin(path: str, err: np.ndarray):
    """Reference error-map format (ebsynth.cpp:739-752 /
    video_blend.py:159-169): int64 count then float32 values."""
    err = np.asarray(err, np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("q", err.size))
        f.write(err.tobytes())


def main(argv=None):
    opts = parse_args(sys.argv[1:] if argv is None else argv)
    import cv2
    import jax
    import jax.numpy as jnp

    from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize

    style = cv2.imread(opts["style"]).astype(np.float32)
    srcs, tgts, wpc = [], [], []
    for g in opts["guides"]:
        s = cv2.imread(g["source"]).astype(np.float32)
        t = cv2.imread(g["target"]).astype(np.float32)
        srcs.append(s)
        tgts.append(t)
        wpc.append(np.full(s.shape[-1], g["weight"] / s.shape[-1], np.float32))

    cfg = PatchMatchConfig(
        patch_size=opts["patchsize"],
        uniformity=opts["uniformity"],
        pm_iters=opts["patchmatchiters"],
        sv_iters=opts["searchvoteiters"],
        style_weight=opts["style_weight"],
        num_pyramid_levels=opts["pyramidlevels"],
        extra_pass_3x3=opts["extrapass3x3"],
        stop_threshold=float(opts["stopthreshold"]),
    )
    out, err, _ = synthesize(
        jnp.asarray(style),
        jnp.asarray(np.concatenate(srcs, axis=-1)),
        jnp.asarray(np.concatenate(tgts, axis=-1)),
        jnp.asarray(np.concatenate(wpc)),
        cfg,
        rng=jax.random.key(0),
        backend=opts["backend"],
    )
    cv2.imwrite(opts["output"], np.clip(np.asarray(out), 0, 255).astype(np.uint8))
    base = opts["output"].rsplit(".", 1)[0]
    write_error_bin(base + ".bin", np.asarray(err))
    print(f"wrote {opts['output']} and {base}.bin")


if __name__ == "__main__":
    main()
