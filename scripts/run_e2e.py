"""Steady-state end-to-end artifact run (VERDICT r3 #2).

Runs the full reference workload — ``config_music`` 240 frames at the
config's resolution, keyframe translation + propagation + blending +
metrics — through the real CLI path (cli.run_config) with propagation
forced on, printing per-phase wall clock.  Meant to run AFTER
``scripts/warm_cache.py`` so compiles are off the critical path.

    python scripts/run_e2e.py [config/config_music.yaml] [--keyframes-only]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="config/config_music.yaml")
    ap.add_argument("--keyframes-only", action="store_true")
    ap.add_argument("--save-path", default=None)
    ap.add_argument("--reuse", action="store_true",
                    help="resume: reuse cached interval synthesis + flows "
                         "(reference -ne)")
    ap.add_argument("--sync-phases", action="store_true",
                    help="block on each phase's outputs so the phase "
                         "table reads true device time (profiling runs; "
                         "adds one host sync per phase)")
    args = ap.parse_args()

    from fresco_tpu.cli import run_config
    from fresco_tpu.core.config import load_config

    cfg = load_config(args.config)
    kw = {"run_ebsynth": True}
    if args.save_path:
        kw["save_path"] = args.save_path
    cfg = cfg.replace(**kw)
    print(f"[e2e] config={args.config} save_path={cfg.save_path}", flush=True)

    t0 = time.time()
    report = run_config(cfg, keyframes_only=args.keyframes_only,
                        reuse_synthesis=args.reuse,
                        sync_phases=args.sync_phases)
    wall = time.time() - t0
    print(f"[e2e] TOTAL wall {wall:.1f}s ({wall / 60:.1f} min)")
    if report is not None:
        print(f"[e2e] metrics: {report}")


if __name__ == "__main__":
    main()
