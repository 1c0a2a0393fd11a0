"""One-command quality-parity report (BASELINE.md metrics table).

Runs every bundled config end-to-end — keyframe translation, then
propagation + blending — and computes the BASELINE.md acceptance
metrics (flow-warp error under GMFlow; CLIP frame-to-frame similarity,
pixel-cosine proxy when no CLIP checkpoint is present) for BOTH the
input clip and the translated clip of each config.  Emits the table as
markdown (PARITY.md) and JSON (parity_report.json).

With real checkpoints (scripts/fetch_weights.py, needs egress) this is
the single command that produces the BASELINE.md "temporal consistency"
parity row for all four reference configs
(/root/reference/config/config_*.yaml; the reference publishes no
harness for these metrics — SURVEY.md §6):

    python scripts/fetch_weights.py            # once, downloads weights
    python scripts/parity_report.py            # all four configs

Useful flags:
    --reuse   reuse save_path/metrics.json from a previous run when
              present (per config) instead of re-running the pipeline
    --tiny    tiny random-weight models (offline smoke; metrics are then
              regression bounds, not quality parity)
    --configs config/config_music.yaml ...     (default: all bundled)
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt(v) -> str:
    return f"{v:.4g}" if isinstance(v, (int, float)) else "—"


def make_table(rows: list[dict]) -> str:
    """Markdown table matching BASELINE.md's metrics-to-establish row."""
    lines = [
        "| Config | warp error (input) | warp error (translated) | "
        "frame similarity (input) | frame similarity (translated) | "
        "similarity metric | wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        inp, tr = r.get("input") or {}, r.get("translated") or {}
        is_clip = tr.get("frame_similarity_is_clip",
                         inp.get("frame_similarity_is_clip"))
        lines.append(
            "| {} | {} | {} | {} | {} | {} | {} |".format(
                r["config"],
                _fmt(inp.get("warp_error")),
                _fmt(tr.get("warp_error")),
                _fmt(inp.get("frame_similarity")),
                _fmt(tr.get("frame_similarity")),
                "CLIP" if is_clip else "pixel proxy",
                _fmt(r.get("wall_s")),
            )
        )
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--configs", nargs="*", default=None,
                    help="config YAMLs (default: config/config_*.yaml)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random-weight models (offline smoke)")
    ap.add_argument("--reuse", action="store_true",
                    help="reuse existing save_path/metrics.json when present")
    ap.add_argument("--frame-count", type=int, default=None,
                    help="cap input frames per config (smoke runs)")
    ap.add_argument("--resolution", type=int, default=None,
                    help="override the working resolution (smoke runs; "
                         "the parity numbers are defined at the configs' "
                         "own resolution)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override num_inference_steps (smoke runs); "
                         "warmup is rescaled proportionally")
    ap.add_argument("--out-root", default=None,
                    help="rebase each config's save_path under this dir "
                         "(hermetic smoke runs)")
    ap.add_argument("--out", default="output/parity/report.json")
    ap.add_argument("--md", default="PARITY.md")
    ap.add_argument("--platform", default=None, choices=("cpu", "axon", "tpu"),
                    help="JAX platform override (env vars are pre-empted by "
                         "the site's TPU plugin; this uses jax.config)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from fresco_tpu.cli import run_config
    from fresco_tpu.core.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_paths = args.configs or sorted(
        glob.glob(os.path.join(repo, "config", "config_*.yaml"))
    )

    rows = []
    for path in cfg_paths:
        name = os.path.splitext(os.path.basename(path))[0]
        config = load_config(path)
        # the parity metrics are defined on the fully-blended clip:
        # force propagation on even for configs that ship run_ebsynth=false
        config = config.replace(run_ebsynth=True)
        if args.frame_count:
            config = config.replace(frame_count=args.frame_count)
        if args.resolution:
            config = config.replace(resolution=args.resolution)
        if args.steps:
            frac = config.num_warmup_steps / max(config.num_inference_steps, 1)
            config = config.replace(
                num_inference_steps=args.steps,
                num_warmup_steps=int(args.steps * frac),
            )
        if args.out_root:
            config = config.replace(
                save_path=os.path.join(args.out_root, name) + os.sep
            )
        mpath = os.path.join(config.save_path, "metrics.json")
        t0 = time.time()
        if args.reuse and os.path.exists(mpath):
            with open(mpath) as f:
                report = json.load(f)
            print(f"[parity] {name}: reusing {mpath}", flush=True)
        else:
            print(f"[parity] {name}: running end-to-end...", flush=True)
            report = run_config(config, tiny=args.tiny)
        rows.append({
            "config": name,
            "wall_s": round(time.time() - t0, 1),
            **(report or {}),
        })

    os.makedirs(os.path.dirname(os.path.join(repo, args.out)) or ".",
                exist_ok=True)
    table = make_table(rows)
    header = (
        "# Quality-parity report (BASELINE.md metrics)\n\n"
        "Flow-warp error (lower = more temporally consistent) and "
        "frame-to-frame similarity (higher = more consistent) for the "
        "input vs the translated clip of each bundled config.  Parity "
        "means the translated scores track the reference's translated "
        "scores; with no checkpoints (offline) these are plumbing-level "
        "regression numbers on random-weight translations.\n\n"
    )
    with open(os.path.join(repo, args.md), "w") as f:
        f.write(header + table + "\n")
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(rows, f, indent=2)
    print(table)
    print(f"[parity] wrote {args.md} and {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
