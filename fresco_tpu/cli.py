"""CLI entry point, reference-compatible.

``python -m fresco_tpu.cli <config.yaml>`` mirrors
``python run_fresco.py <config.yaml>`` (reference run_fresco.py:302-318):
keyframe translation followed by full-video propagation.
"""
from __future__ import annotations

import argparse
import os

from fresco_tpu.core.config import load_config


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

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from fresco_tpu.pipeline.runner import FrescoPipeline

    pipe = FrescoPipeline(config, tiny=opt.tiny)
    keys = pipe.translate_keyframes()

    if not opt.keyframes_only and config.run_ebsynth:
        from fresco_tpu.propagate.video_blend import blend_video, get_fps

        fps = get_fps(config.file_path) or 30
        blend_dir = blend_video(
            config.save_path,
            key_ind=keys,
            key_dir="keys",
            output=os.path.join(config.save_path, "blend.mp4"),
            fps=fps,
            n_proc=config.max_process,
            poisson=True,
        )

        # parity metrics (BASELINE.md): consistency of the translated clip
        # vs the input clip, written next to the outputs
        import json

        report = {
            "translated": pipe.evaluate_consistency(blend_dir),
            "input": pipe.evaluate_consistency(
                os.path.join(config.save_path, "video")
            ),
        }
        with open(os.path.join(config.save_path, "metrics.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(f"[fresco_tpu] consistency metrics: {report}")
    print("Done")


if __name__ == "__main__":
    main()
