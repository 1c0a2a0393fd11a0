"""GMFlow training driver (TPU mesh-native).

Equivalent of the reference's vendored trainer (reference
src/ebsynth/deps/gmflow/main.py:29-460: AdamW wd=1e-4, OneCycle LR,
grad-clip 1.0, DDP over NCCL) rebuilt on jax: one pjit-able train step,
data parallel over the mesh's ``data`` axis, optax one-cycle cosine
schedule + global-norm clipping, orbax checkpoints, and periodic
validation with the reference's metric protocol.

Supervised (with --dataset chairs/sintel/kitti/things + --data-root) or
unsupervised video adaptation (--frame-dir) per flow_train.py.

Usage (smoke, CPU, synthetic):
  python scripts/train_gmflow.py --synthetic --steps 2 --tiny
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_index(args):
    from fresco_tpu.parallel import flow_data as fd

    if args.frame_dir:
        return fd.index_frame_dir(args.frame_dir)
    builders = {
        "chairs": lambda: fd.index_flying_chairs(args.data_root),
        "sintel": lambda: fd.index_sintel(args.data_root, dstype=args.dstype),
        "things": lambda: fd.index_flying_things(args.data_root),
        "kitti": lambda: fd.index_kitti(args.data_root),
    }
    return builders[args.dataset]()


class SyntheticIndex:
    """Random image pairs + warp-consistent flow for offline smoke runs."""

    sparse = False

    def __init__(self, size=8, hw=(64, 64), seed=0):
        self.size, self.hw = size, hw
        self.rng = __import__("numpy").random.default_rng(seed)

    def __len__(self):
        return self.size

    def load(self, i):
        import numpy as np

        h, w = self.hw
        img1 = self.rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        flow = self.rng.uniform(-2, 2, (h, w, 2)).astype(np.float32)
        img2 = np.roll(img1, 1, axis=1)
        return img1, img2, flow, np.ones((h, w), np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="chairs",
                    choices=["chairs", "sintel", "things", "kitti"])
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--frame-dir", default=None,
                    help="unlabelled frames: unsupervised adaptation")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--crop", type=int, nargs=2, default=None)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--warmup-frac", type=float, default=0.05)
    ap.add_argument("--data-par", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=10_000)
    ap.add_argument("--val-every", type=int, default=10_000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.synthetic or args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
    from fresco_tpu.parallel import flow_data as fd
    from fresco_tpu.parallel.flow_train import (
        FlowTrainState, flow_train_step, make_flow_train_state,
    )
    from fresco_tpu.parallel.sharding import make_mesh, shard_model_params
    from fresco_tpu.utils.checkpoint import load_params, save_params

    gcfg = GMFlowConfig.tiny() if args.tiny else GMFlowConfig()
    gmflow = GMFlow(gcfg)

    index = SyntheticIndex() if args.synthetic else build_index(args)
    supervised = args.frame_dir is None
    crop = tuple(args.crop) if args.crop else ((64, 64) if args.synthetic
                                               else (384, 512))
    augment = None
    if supervised and not args.synthetic:
        augment = fd.FlowAugmentor(
            fd.AugmentConfig(crop_size=crop), sparse=index.sparse,
            seed=args.seed,
        )

    mesh = make_mesh(args.data_par) if args.data_par > 1 else None
    loader = fd.FlowLoader(
        index, args.batch_size, augment=augment, mesh=mesh, seed=args.seed
    )

    # init / resume
    rng = jax.random.key(args.seed)
    probe = jnp.zeros((1, crop[0], crop[1], 3))
    params = jax.jit(gmflow.init)(rng, probe, probe)
    if args.resume:
        restored = load_params(args.resume)
        if restored is not None:
            params = restored
            print(f"[train_gmflow] resumed params from {args.resume}")
    if mesh is not None:
        params = jax.device_put(params, shard_model_params(params, mesh))

    # optimizer: one-cycle cosine + AdamW + global-norm clip (main.py:188,353,409)
    # warmup must span >= 1 whole step or the onecycle boundaries
    # collide and the schedule divides by zero
    steps = max(args.steps, 2)
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=steps,
        peak_value=args.lr,
        pct_start=min(max(args.warmup_frac, 1.0 / steps), 0.5),
    )
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adamw(schedule, weight_decay=args.weight_decay),
    )
    state = make_flow_train_state(params, tx)

    @jax.jit
    def step_sup(state, img0, img1, gt, valid):
        return flow_train_step(gmflow, tx, state, img0, img1, gt, valid)

    @jax.jit
    def step_unsup(state, img0, img1):
        return flow_train_step(gmflow, tx, state, img0, img1)

    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        for batch in loader:
            if done >= args.steps:
                break
            if supervised:
                state, loss = step_sup(
                    state, batch["img0"], batch["img1"],
                    batch["flow"], batch["valid"],
                )
            else:
                state, loss = step_unsup(state, batch["img0"], batch["img1"])
            done += 1
            if done % args.log_every == 0 or done == args.steps:
                loss_v = float(loss)
                rate = done / (time.perf_counter() - t0)
                print(
                    f"[train_gmflow] step {done}/{args.steps} "
                    f"loss={loss_v:.4f} lr={float(schedule(done)):.2e} "
                    f"{rate:.2f} it/s",
                    flush=True,
                )
                assert np.isfinite(loss_v), "training diverged (non-finite loss)"
            if args.ckpt_dir and done % args.ckpt_every == 0:
                save_params(os.path.join(args.ckpt_dir, f"step_{done}"),
                            jax.device_get(state.params))
            if args.val_every and done % args.val_every == 0 and supervised \
                    and not args.synthetic:
                from fresco_tpu.parallel.flow_eval import validate

                res = validate(
                    gmflow, state.params,
                    (index.load(i) for i in range(len(index))),
                    max_samples=50,
                )
                print(f"[train_gmflow] val@{done}: {res}", flush=True)

    if args.ckpt_dir:
        save_params(os.path.join(args.ckpt_dir, "final"),
                    jax.device_get(state.params))
    print(f"[train_gmflow] done: {done} steps")


if __name__ == "__main__":
    main()
