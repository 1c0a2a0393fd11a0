"""CLI entry point, reference-compatible.

``python -m fresco_tpu.cli <config.yaml>`` mirrors
``python run_fresco.py <config.yaml>`` (reference run_fresco.py:302-318):
keyframe translation followed by full-video propagation.
"""
from __future__ import annotations

import argparse
import os

from fresco_tpu.core.config import load_config


def run_config(config, tiny: bool = False, keyframes_only: bool = False,
               reuse_synthesis: bool = False, sync_phases: bool = False):
    """Run one config end-to-end: keyframe translation, then (when
    ``config.run_ebsynth``) propagation + blending + the BASELINE.md
    consistency metrics.  Returns the metrics report dict (also written
    to ``save_path/metrics.json``) or None when propagation was skipped.

    Shared by ``main`` and scripts/parity_report.py."""
    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from fresco_tpu.pipeline.runner import FrescoPipeline

    import time

    t0 = time.time()
    pipe = FrescoPipeline(config, tiny=tiny)
    # profiling runs block on each phase's outputs so the phase table
    # reads true device time, not async-dispatch time; also disables the
    # prep/denoise overlap in translate_keyframes — an overlapped prep
    # timer would block behind the in-flight scan on the single device
    # stream and report queue wait as phase cost (runner.py:385)
    pipe.sync_phases = sync_phases
    print(f"[fresco_tpu] model build: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    keys = pipe.translate_keyframes(reuse=reuse_synthesis)
    print(f"[fresco_tpu] keyframe translation: {time.time() - t0:.1f}s",
          flush=True)

    if keyframes_only or not config.run_ebsynth:
        return None

    from fresco_tpu.propagate.video_blend import blend_video, get_fps

    # flow source: the bundle's GMFlow when its checkpoint was loaded
    # (reference FlowCalc always uses GMFlow, flow/flow_utils.py:165-191);
    # blend_video's Farneback fallback otherwise (offline)
    flow_fn = None
    gpath = str(config.gmflow_path or "")
    if gpath and os.path.exists(gpath):
        import jax

        b = pipe.bundle
        flow_fn = jax.jit(
            lambda x, y: b.gmflow.apply(b.params["gmflow"], x, y)
        )

    fps = get_fps(config.file_path) or 30
    prop_phases: dict = {}
    blend_dir = blend_video(
        config.save_path,
        key_ind=keys,
        key_dir="keys",
        output=os.path.join(config.save_path, "blend.mp4"),
        fps=fps,
        n_proc=config.max_process,
        poisson=True,
        flow_fn=flow_fn,
        n_devices="auto" if config.max_process > 1 else 1,
        # reference -ne resume (video_blend.py:299-303): cached interval
        # synthesis + flows in save_path/tmp survive an interrupted run
        reuse_synthesis=reuse_synthesis,
        timers_out=prop_phases,
    )

    # parity metrics (BASELINE.md): consistency of the translated clip
    # vs the input clip, written next to the outputs
    import json

    # machine-readable wall-clock attribution next to the outputs
    # (keyframe phases from the runner + propagation phases from
    # blend_video; propagation phases overlap across its threads)
    phases = {
        "keyframes": {
            k: round(v, 3) for k, v in pipe.phases.times.items()
        },
        "propagation": {k: round(v, 3) for k, v in prop_phases.items()},
    }
    with open(os.path.join(config.save_path, "phases.json"), "w") as f:
        json.dump(phases, f, indent=2)

    report = {
        "translated": pipe.evaluate_consistency(blend_dir),
        "input": pipe.evaluate_consistency(
            os.path.join(config.save_path, "video")
        ),
    }
    with open(os.path.join(config.save_path, "metrics.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"[fresco_tpu] consistency metrics: {report}")
    return report


def main(argv=None):
    parser = argparse.ArgumentParser(description="FRESCO-TPU video translation")
    parser.add_argument("config_path", type=str, help="YAML configuration file")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random-weight models (smoke runs)")
    parser.add_argument("--keyframes-only", action="store_true",
                        help="skip full-video propagation")
    opt = parser.parse_args(argv)

    config = load_config(opt.config_path)
    print("=" * 80)
    for k, v in sorted(vars(config).items()):
        print(f"{k}: {v}")
    print("=" * 80)

    run_config(config, tiny=opt.tiny, keyframes_only=opt.keyframes_only)
    print("Done")


if __name__ == "__main__":
    main()
