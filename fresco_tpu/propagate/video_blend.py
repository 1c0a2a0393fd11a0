"""Full-video propagation: keyframe style -> all frames, then blend.

Equivalent of reference video_blend.py: for every keyframe interval,
propagate the stylized keyframe to in-between frames from both ends
(guided patch synthesis), then per frame pick/blend the two candidates
(error mask -> histogram blend -> optional Poisson fusion) and write the
output video.

TPU re-design: the per-frame ebsynth *subprocess* (video_blend.py:96-106)
becomes an in-process device call (fresco_tpu.propagate.patchmatch);
optical flow is our GMFlow (jitted, one call per pair); the numba
per-pixel loops (video_blend.py:40-58,142-155) are jnp.where; Poisson
fusion runs as matrix-free CG on device instead of scipy lsqr.
"""
from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from fresco_tpu.ops.warp import forward_backward_consistency
from fresco_tpu.propagate.guides import (
    GUIDE_WEIGHTS,
    edge_guide,
    inpaint_occluded,
    positional_chain,
    temporal_guide,
    warp_nearest,
)
from fresco_tpu.propagate.histogram import histogram_blend
from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize
from fresco_tpu.propagate.poisson import poisson_fusion

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class PhaseTimers:
    """Cumulative per-phase wall clock for the propagation pipeline
    (VERDICT r3 missing #2: every e2e minute must be attributed).
    Thread-safe: the prefetch thread runs device synthesis while the
    main thread blends, so phase sums can exceed total wall (overlap —
    that is the point of the pipelining)."""

    def __init__(self):
        import threading

        self.t: dict[str, float] = {}
        self._lock = threading.Lock()

    def __call__(self, phase: str):
        import contextlib

        @contextlib.contextmanager
        def _cm():
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                with self._lock:
                    self.t[phase] = self.t.get(phase, 0.0) + dt

        return _cm()

    def table(self, total: float) -> str:
        rows = sorted(self.t.items(), key=lambda kv: -kv[1])
        body = "\n".join(
            f"  {k:<12s} {v:8.1f}s  ({100*v/total:5.1f}% of wall)"
            for k, v in rows
        )
        return (
            f"[fresco_tpu] propagation phase wall (total {total:.1f}s; "
            f"phases overlap across the prefetch thread):\n{body}"
        )


def error_mask(dist1, dist2, weight1: float, weight2: float) -> np.ndarray:
    """Candidate selection mask (video_blend.py:40-58): 0 selects the
    forward candidate, 1 the backward one."""
    out = (weight1 * dist1 >= weight2 * dist2).astype(np.uint8)
    if weight1 == 0:
        out[:] = 0
    elif weight2 == 0:
        out[:] = 1
    return out


@dataclasses.dataclass
class _FlowCache:
    """Flow computation with optional on-disk caching, like the
    reference's FlowCalc tmp/*.npy cache (flow/flow_utils.py:185-191)."""

    flow_fn: object  # jitted GMFlow apply on [1,H,W,3] pairs
    cache: dict
    tmp_dir: str | None = None
    timers: "PhaseTimers | None" = None

    def _path(self, tag: str):
        if self.tmp_dir is None:
            return None
        return os.path.join(self.tmp_dir, f"flow_{tag}.npz")

    def get(self, frames: list[np.ndarray], i: int, tag: str | None = None):
        """bwd flow + occlusion for pair (frame i -> i+1)."""
        key = tag if tag is not None else i
        if key not in self.cache:
            path = self._path(str(key)) if tag is not None else None
            if path and os.path.exists(path):
                z = np.load(path)
                self.cache[key] = (z["flow"], z["occ"])
            else:
                import contextlib

                with (self.timers("flow") if self.timers
                      else contextlib.nullcontext()):
                    a = jnp.asarray(frames[i], jnp.float32)[None]
                    b = jnp.asarray(frames[i + 1], jnp.float32)[None]
                    flow = self.flow_fn(a, b)  # [2,H,W,2] fwd,bwd
                    fwd, bwd = flow[0:1], flow[1:2]
                    _, bwd_occ = forward_backward_consistency(fwd, bwd)
                    self.cache[key] = (
                        np.asarray(bwd[0]), np.asarray(bwd_occ[0])
                    )
                if path:
                    np.savez(path, flow=self.cache[key][0], occ=self.cache[key][1])
        return self.cache[key]

    def get_batch(self, frames: list[np.ndarray], idxs: list[int],
                  tags: list[str], max_batch: int = 8):
        """Batched ``get``: one flow_fn dispatch + ONE device consistency
        call per ``max_batch`` uncached pairs, instead of per pair.

        Per-pair device calls pay the tunnel's ~60-70 ms fetch RTT several
        times each (CLAUDE.md measurement gotcha) — at 64px that made
        flows 44% of propagation wall.  Returns [(flow, occ)] in ``idxs``
        order; results land in the same memory/disk cache as ``get``."""
        import contextlib

        missing = [
            (i, t) for i, t in zip(idxs, tags)
            if t not in self.cache and not (
                self._path(t) and os.path.exists(self._path(t))
            )
        ]
        # pad the tail chunk to a full max_batch (repeating the last pair)
        # so a jitted flow_fn compiles for ONE batch shape, not one per
        # distinct tail length — full-res GMFlow compiles cost minutes
        pad_n = min(len(missing), max_batch)
        for lo in range(0, len(missing), max_batch):
            chunk = missing[lo:lo + max_batch]
            n = len(chunk)
            pads = chunk + [chunk[-1]] * (pad_n - n)
            with (self.timers("flow") if self.timers
                  else contextlib.nullcontext()):
                a = jnp.asarray(
                    np.stack([frames[i] for i, _ in pads]), jnp.float32
                )
                b = jnp.asarray(
                    np.stack([frames[i + 1] for i, _ in pads]), jnp.float32
                )
                flow = self.flow_fn(a, b)  # [2N,H,W,2] fwd block, bwd block
                fwd, bwd = flow[:pad_n], flow[pad_n:]
                _, bwd_occ = forward_backward_consistency(fwd, bwd)
                bwd_h, occ_h = np.asarray(bwd[:n]), np.asarray(bwd_occ[:n])
            for j, (_, t) in enumerate(chunk):
                self.cache[t] = (bwd_h[j], occ_h[j])
                p = self._path(t)
                if p:
                    np.savez(p, flow=bwd_h[j], occ=occ_h[j])
        return [self.get(frames, i, tag=t) for i, t in zip(idxs, tags)]


def _synthesize_chain_pair(key_imgs, frames_pair, flows_pair, cfg, rng,
                           backend: str = "tpu",
                           inpaint_method: str = "pushpull",
                           timers: PhaseTimers | None = None):
    """Advance the forward and backward chains of one interval in
    lockstep — replaces the reference's per-direction subprocess
    fan-out (video_blend.py:67-106).  Directions run as two single-job
    device calls per position (measured faster than the vmapped
    batch-2 program: 11.9 vs 15.1 s/frame at 512px).

    Each chain synthesizes positions 1..interval-1 only: the forward
    chain's last position would be the ``end`` keyframe and the backward
    chain's last would be ``beg`` — neither is ever blended (the blend
    loop writes c_id = beg+1..end-1), so they are skipped entirely
    (the reference likewise never synthesizes the far keyframe:
    video_sequence.py:64-89 sequences exclude it)."""
    outs = ([], [])
    errs = ([], [])
    prev_stylized = [key_imgs[0], key_imgs[1]]
    h, w = frames_pair[0][0].shape[:2]

    import contextlib

    tick = timers if timers is not None else (
        lambda _phase: contextlib.nullcontext()
    )
    pos_guides = []
    edge_srcs = []
    src_stacks = []
    with tick("guides"):
        for d in range(2):
            frames, flows = frames_pair[d], flows_pair[d]
            pg = positional_chain(
                h, w, [f for f, _ in flows], [o for _, o in flows],
                method=inpaint_method,
            )
            pos_guides.append(pg)
            edge_srcs.append(edge_guide(frames[0]))
            src_stacks.append(
                np.concatenate(
                    [frames[0], edge_srcs[d], key_imgs[d], pg[0]], axis=-1
                ).astype(np.float32)
            )
    wpc = [
        np.full(3, GUIDE_WEIGHTS["color"] / 3),
        np.full(3, GUIDE_WEIGHTS["edge"] / 3),
        np.full(3, GUIDE_WEIGHTS["temporal"] / 3),
        np.full(3, GUIDE_WEIGHTS["positional"] / 3),
    ]
    weights = jnp.asarray(np.concatenate(wpc), jnp.float32)
    styles = jnp.asarray(np.stack([k.astype(np.float32) for k in key_imgs]))
    src_guides = jnp.asarray(np.stack(src_stacks))

    interval = len(frames_pair[0]) - 1
    for j in range(1, interval):
        tgt_stacks = []
        with tick("guides"):
            for d in range(2):
                frames, flows = frames_pair[d], flows_pair[d]
                bwd_flow, bwd_occ = flows[j - 1]
                temporal = temporal_guide(
                    prev_stylized[d], bwd_flow, bwd_occ, method=inpaint_method
                )
                tgt_stacks.append(
                    np.concatenate(
                        [frames[j], edge_guide(frames[j]), temporal,
                         pos_guides[d][j]],
                        axis=-1,
                    ).astype(np.float32)
                )
        # per-direction calls: the vmapped batch-2 program measured SLOWER
        # than two batch-1 runs (15.1 vs 11.9 s/frame at 512px — batched
        # gathers scale with rows and add vmap overhead).  Both directions
        # are DISPATCHED before either is fetched (direction 0's result
        # fetch overlaps direction 1's device compute), the two target
        # stacks go up as ONE transfer, and clip+uint8 happens on device
        # so the output fetch is 1 MB instead of 3.9 MB of f32 (the
        # r4 probe measured ~22 MB/s tunnel fetch + 0.5 s/position of
        # serialized fetch stalls — PERF.md round-4 chain attribution).
        with tick("synth"):
            tgt_d = jnp.asarray(np.stack(tgt_stacks))
            pend = []
            for d in range(2):
                out, err, _ = synthesize(
                    styles[d], src_guides[d], tgt_d[d],
                    weights, cfg,
                    rng=jax.random.fold_in(jax.random.fold_in(rng, j), d),
                    backend=backend,
                )
                # XLA f32->u8 convert truncates toward zero, same as the
                # former np.clip(...).astype(np.uint8)
                pend.append((jnp.clip(out, 0, 255).astype(jnp.uint8), err))
            for d, (out_u8, err) in enumerate(pend):
                out_np = np.asarray(out_u8)
                outs[d].append(out_np)
                errs[d].append(np.asarray(err))
                prev_stylized[d] = out_np
    return (outs[0], errs[0]), (outs[1], errs[1])


def _synthesize_chain_wave(wave, cfg, rng, devices, inpaint_method="pushpull",
                           timers: PhaseTimers | None = None):
    """Advance ALL chains of a wave of intervals in lockstep, one chain
    per device — the TPU-native equivalent of the reference's 8-process
    worker fan-out over intervals (reference video_blend.py:114-139,
    MAX_PROCESS=8 :25).

    ``wave``: list of (seq_i, key_imgs(2), frames_pair(2), flows_pair(2))
    exactly as `_synthesize_chain_pair` takes per interval.  Each
    interval contributes two jobs (forward + backward chain); every
    pyramid level of every step runs as ONE shard_map program over a
    ``jobs`` mesh, with per-job rng streams identical to the serial
    path so outputs match `_synthesize_chain_pair` bit-for-bit (chains
    are independent: zero collectives — tests/test_parallel_propagation).

    Shorter intervals that finish early re-feed their last target (the
    discarded output keeps shapes static); the scheduler in blend_video
    groups intervals of similar length per wave to bound that waste.

    Returns {seq_i: ((fwd_out, fwd_err), (bwd_out, bwd_err))} with the
    backward lists in chain order (caller reverses, as for the serial
    path)."""
    from fresco_tpu.propagate.parallel import jobs_mesh, synthesize_sharded

    jobs = []
    for seq_i, key_imgs, frames_pair, flows_pair in wave:
        for d in range(2):
            if len(frames_pair[d]) - 1 <= 1:
                continue  # interval 1: nothing to synthesize
            jobs.append(
                dict(
                    seq_i=seq_i, d=d, key=key_imgs[d],
                    frames=frames_pair[d], flows=flows_pair[d],
                    outs=[], errs=[],
                )
            )
    results = {seq_i: [([], []), ([], [])] for seq_i, *_ in wave}
    if not jobs:
        return {k: tuple(v) for k, v in results.items()}
    mesh = jobs_mesh(len(jobs), devices)
    h, w = jobs[0]["frames"][0].shape[:2]

    import contextlib

    tick = timers if timers is not None else (
        lambda _phase: contextlib.nullcontext()
    )
    with tick("guides"):
        for job in jobs:
            pg = positional_chain(
                h, w,
                [f for f, _ in job["flows"]], [o for _, o in job["flows"]],
                method=inpaint_method,
            )
            job["pos"] = pg
            job["src_stack"] = np.concatenate(
                [job["frames"][0], edge_guide(job["frames"][0]), job["key"],
                 pg[0]], axis=-1,
            ).astype(np.float32)
            job["prev"] = job["key"]
    wpc = [
        np.full(3, GUIDE_WEIGHTS["color"] / 3),
        np.full(3, GUIDE_WEIGHTS["edge"] / 3),
        np.full(3, GUIDE_WEIGHTS["temporal"] / 3),
        np.full(3, GUIDE_WEIGHTS["positional"] / 3),
    ]
    weights = jnp.asarray(np.concatenate(wpc), jnp.float32)
    styles = jnp.asarray(
        np.stack([j["key"].astype(np.float32) for j in jobs])
    )
    src_guides = jnp.asarray(np.stack([j["src_stack"] for j in jobs]))

    max_interval = max(len(j["frames"]) - 1 for j in jobs)
    for step in range(1, max_interval):
        tgt_stacks, keys = [], []
        with tick("guides"):
            for job in jobs:
                interval = len(job["frames"]) - 1
                jj = min(step, interval - 1)  # finished chains re-feed last
                bwd_flow, bwd_occ = job["flows"][jj - 1]
                temporal = temporal_guide(
                    job["prev"], bwd_flow, bwd_occ, method=inpaint_method
                )
                tgt_stacks.append(
                    np.concatenate(
                        [job["frames"][jj], edge_guide(job["frames"][jj]),
                         temporal, job["pos"][jj]], axis=-1,
                    ).astype(np.float32)
                )
                # identical stream to the serial path:
                # fold_in(fold_in(fold_in(rng, seq_i), j), d)
                keys.append(
                    jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(rng, job["seq_i"]), jj
                        ),
                        job["d"],
                    )
                )
        with tick("synth"):
            out, err, _ = synthesize_sharded(
                styles, src_guides, jnp.asarray(np.stack(tgt_stacks)),
                weights, cfg, jnp.stack(keys), mesh=mesh,
            )
            # Same device-side clip+uint8 as the serial chain (above):
            # one conversion semantics for the wave==serial invariant,
            # and the fetch is 1 MB/job instead of 3.9 MB of f32.
            out_np = np.asarray(jnp.clip(out, 0, 255).astype(jnp.uint8))
            err_np = np.asarray(err)
        for bi, job in enumerate(jobs):
            if step < len(job["frames"]) - 1:
                job["outs"].append(out_np[bi])
                job["errs"].append(err_np[bi])
                job["prev"] = out_np[bi]
    for job in jobs:
        results[job["seq_i"]][job["d"]] = (job["outs"], job["errs"])
    return {k: tuple(v) for k, v in results.items()}


def default_flow_fn(gmflow_path: str | None = None):
    """Propagation flow source, mirroring the reference's FlowCalc
    (flow/flow_utils.py:165-191, always GMFlow): a converted-checkpoint
    GMFlow jitted apply when weights exist at ``gmflow_path`` (or the
    FrescoConfig default location), else per-pair host Farneback —
    random-weight GMFlow flows are degenerate (utils/classic_flow.py
    docstring) and a full-res GMFlow compile costs minutes."""
    from fresco_tpu.core.config import FrescoConfig

    path = gmflow_path or FrescoConfig.gmflow_path
    if path and os.path.exists(path):
        from fresco_tpu.models import convert as C
        from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
        from fresco_tpu.models.gmflow.convert import convert_gmflow

        model = GMFlow(GMFlowConfig())
        params = {"params": convert_gmflow(C.load_torch_state_dict(path))}
        return jax.jit(lambda a, b: model.apply(params, a, b))
    from fresco_tpu.utils.classic_flow import pairwise_flow_fn

    return pairwise_flow_fn()


def blend_video(
    base_dir: str,
    key_ind: list[int],
    key_dir: str = "keys",
    output: str | None = None,
    fps: float = 30,
    n_proc: int = 8,  # accepted for CLI parity; device batching instead
    poisson: bool = True,
    use_histogram: bool = True,
    flow_fn=None,
    patch_cfg: PatchMatchConfig = PatchMatchConfig(),
    seed: int = 0,
    reuse_synthesis: bool = False,
    keep_tmp: bool = True,
    synth_backend: str = "tpu",
    inpaint_method: str = "pushpull",
    n_devices: int | str = 1,
    timers_out: dict | None = None,
):
    """Reference video_blend.py main flow.  Reads base_dir/video/%04d.png
    and base_dir/<key_dir>/%04d.png, writes base_dir/blend/%04d.png and
    optionally an mp4.

    ``reuse_synthesis`` is the reference's ``-ne`` resume affordance
    (video_blend.py:299-303): cached per-interval synthesis outputs and
    flows in base_dir/tmp are loaded instead of recomputed.
    ``synth_backend``: 'tpu' (jump-flood on device) or 'native' (the
    C++/OpenMP serpentine backend — the better choice on many-core
    hosts without a chip, mirroring the reference's CPU path).
    ``inpaint_method``: 'pushpull' (fast pyramid fill, default) or
    'telea' (reference guide.py:40,99-101 exact parity, ~450x slower
    per guide).
    ``n_devices``: interval-parallel synthesis over a device mesh — the
    reference's MAX_PROCESS=8 worker fan-out (video_blend.py:114-139)
    as one SPMD wave per step (propagate/parallel.py).  1 = serial
    (single-chip); 'auto' = all local devices.  Outputs are identical
    either way (per-job rng streams match the serial path).
    ``timers_out``: optional dict, filled with the per-phase wall
    seconds (plus ``wall_total``) on return."""
    video_dir = os.path.join(base_dir, "video")
    blend_dir = os.path.join(base_dir, "blend")
    tmp_dir = os.path.join(base_dir, "tmp")
    os.makedirs(blend_dir, exist_ok=True)
    os.makedirs(tmp_dir, exist_ok=True)

    read = lambda p: cv2.imread(p)  # BGR, matching reference cv2 use
    frames = {
        i: read(os.path.join(video_dir, "%04d.png" % i))
        for i in range(key_ind[0], key_ind[-1] + 1)
    }
    keys = {i: read(os.path.join(base_dir, key_dir, "%04d.png" % i)) for i in key_ind}

    if flow_fn is None:
        flow_fn = default_flow_fn()

    timers = PhaseTimers()
    fcache = _FlowCache(flow_fn, {}, tmp_dir, timers=timers)
    rng = jax.random.key(seed)
    n_seq = len(key_ind) - 1
    if n_devices == "auto":
        n_devices = len(jax.local_devices())
    n_devices = max(int(n_devices), 1)

    def interval_inputs(seq_i):
        """(key_imgs, frames_pair, flows_pair, cache_path) for interval
        seq_i; computes/loads the pair flows (disk-cached)."""
        beg, end = key_ind[seq_i], key_ind[seq_i + 1]
        interval = end - beg
        seq_frames = [frames[i] for i in range(beg, end + 1)]
        rev_frames = seq_frames[::-1]
        synth_cache = os.path.join(tmp_dir, f"synth_{beg}_{end}.npz")
        js = list(range(max(interval - 1, 0)))
        fwd_flows = fcache.get_batch(
            seq_frames, js, [f"f{beg}_{j}" for j in js]
        )
        bwd_flows = None
        if not (reuse_synthesis and os.path.exists(synth_cache)):
            bwd_flows = fcache.get_batch(
                rev_frames, js, [f"b{end}_{j}" for j in js]
            )
        return (
            (keys[key_ind[seq_i]], keys[key_ind[seq_i + 1]]),
            (seq_frames, rev_frames),
            (fwd_flows, bwd_flows),
            synth_cache,
        )

    def save_synth(cache_path, fwd_out, fwd_err, bwd_out, bwd_err):
        if keep_tmp and fwd_out:
            np.savez(
                cache_path,
                fwd_out=np.stack(fwd_out), fwd_err=np.stack(fwd_err),
                bwd_out=np.stack(bwd_out), bwd_err=np.stack(bwd_err),
            )

    def synth_interval(seq_i, inputs):
        """Synthesize both chains of one interval (device-heavy half).

        ``inputs`` is an interval_inputs() tuple (computed ahead on the
        flow thread).  Returns (fwd_out, fwd_err, bwd_out, bwd_err,
        fwd_flows)."""
        key_imgs, frames_pair, flows_pair, synth_cache = inputs
        fwd_flows = flows_pair[0]
        if reuse_synthesis and os.path.exists(synth_cache):
            z = np.load(synth_cache)
            return (list(z["fwd_out"]), list(z["fwd_err"]),
                    list(z["bwd_out"]), list(z["bwd_err"]), fwd_flows)

        # both directions advance in lockstep as one device batch
        (fwd_out, fwd_err), (bwd_out, bwd_err) = _synthesize_chain_pair(
            key_imgs, frames_pair, flows_pair, patch_cfg,
            jax.random.fold_in(rng, seq_i),
            backend=synth_backend,
            inpaint_method=inpaint_method,
            timers=timers,
        )
        bwd_out, bwd_err = bwd_out[::-1], bwd_err[::-1]
        save_synth(synth_cache, fwd_out, fwd_err, bwd_out, bwd_err)
        return fwd_out, fwd_err, bwd_out, bwd_err, fwd_flows

    def synth_wave(wave_idx, inputs_list):
        """Synthesize a wave of intervals concurrently over the mesh.

        ``inputs_list`` holds each interval's interval_inputs() tuple
        (computed ahead on the flow thread).  Returns
        {seq_i: (fwd_out, fwd_err, bwd_out, bwd_err, fwd_flows)}
        in the same per-interval format as synth_interval."""
        results, wave, meta = {}, [], {}
        for seq_i, inputs in zip(wave_idx, inputs_list):
            key_imgs, frames_pair, flows_pair, synth_cache = inputs
            if reuse_synthesis and os.path.exists(synth_cache):
                z = np.load(synth_cache)
                results[seq_i] = (
                    list(z["fwd_out"]), list(z["fwd_err"]),
                    list(z["bwd_out"]), list(z["bwd_err"]), flows_pair[0],
                )
                continue
            wave.append((seq_i, key_imgs, frames_pair, flows_pair))
            meta[seq_i] = (flows_pair[0], synth_cache)
        if wave:
            wave_out = _synthesize_chain_wave(
                wave, patch_cfg, rng, jax.local_devices()[:n_devices],
                inpaint_method=inpaint_method, timers=timers,
            )
            for seq_i, ((fo, fe), (bo, be)) in wave_out.items():
                bo, be = bo[::-1], be[::-1]
                fwd_flows, synth_cache = meta[seq_i]
                save_synth(synth_cache, fo, fe, bo, be)
                results[seq_i] = (fo, fe, bo, be, fwd_flows)
        return results

    def blend_interval(seq_i, fwd_out, fwd_err, bwd_out, bwd_err, fwd_flows):
        """Per-frame candidate selection + blending (reference
        video_blend.py:212-255) for one interval."""
        beg, end = key_ind[seq_i], key_ind[seq_i + 1]
        interval = end - beg
        cv2.imwrite(os.path.join(blend_dir, "%04d.png" % beg), keys[beg])
        p_mask = None
        for i in range(interval - 1):
            c_id = beg + i + 1
            # Both chains hold positions 1..interval-1, so after the
            # reversal fwd_out[i] and bwd_out[i] BOTH depict frame c_id
            # (the reference reshuffles obs so ob=obs[i+1] is frame c_id,
            # video_blend.py:186,218; its dist2 load predates that
            # reshuffle and reads frame end-i-1's error — we use the
            # error map that matches the candidate).
            oa, ob = fwd_out[i], bwd_out[i]
            dist1, dist2 = fwd_err[i], bwd_err[i]
            weight1 = i / (interval - 1) if interval > 1 else 0.5
            weight2 = 1 - weight1
            mask = error_mask(dist1, dist2, weight1, weight2)
            if p_mask is not None:
                bwd_flow, _ = fwd_flows[i]
                p_mask = warp_nearest(p_mask, bwd_flow)
                mask = p_mask | mask
            p_mask = mask

            min_error_img = np.where(mask[:, :, None] == 0, oa, ob)
            with timers("blend"):
                if use_histogram:
                    hb = histogram_blend(
                        oa, ob, min_error_img, weight2, weight1
                    )
                else:
                    hb = (weight2 * oa.astype(np.float32)
                          + weight1 * ob.astype(np.float32)).astype(np.uint8)
            with timers("poisson"):
                res = poisson_fusion(hb, oa, ob, mask) if poisson else hb
            cv2.imwrite(os.path.join(blend_dir, "%04d.png" % c_id), res)

    # Interval concurrency (replaces the reference's 8-process fan-out,
    # video_blend.py:114-139): intervals are independent.  Three-stage
    # thread pipeline:
    #   flow thread  — interval_inputs (host Farneback / cached flows),
    #                  kept FLOW_AHEAD intervals ahead so flow compute
    #                  overlaps device synthesis (flows were 21.7% of
    #                  the r4 e2e propagation wall when run serially
    #                  before each interval's synthesis — PERF.md);
    #   synth thread — device patch synthesis for interval/wave k+1;
    #   main thread  — host blending for interval k.
    # With a mesh, WAVES of up to n_devices//2 intervals (2 chains each)
    # run concurrently — one chain per device, zero collectives.
    from concurrent.futures import ThreadPoolExecutor

    executor = ThreadPoolExecutor(max_workers=1)
    flow_ex = ThreadPoolExecutor(max_workers=1)
    FLOW_AHEAD = 2  # intervals of flows held ready beyond the one synthesizing
    inputs_fut: dict = {}

    def queue_inputs(order, pos):
        """Enqueue interval_inputs on the flow thread for synthesis-order
        positions up to ``pos + FLOW_AHEAD`` (idempotent)."""
        for i in order[: pos + 1 + FLOW_AHEAD]:
            if i not in inputs_fut:
                inputs_fut[i] = flow_ex.submit(interval_inputs, i)

    def take_inputs(seq_i):
        """Resolve + release one interval's prefetched inputs (runs on
        the synth thread so the main thread never blocks on flows)."""
        inp = inputs_fut[seq_i].result()
        inputs_fut[seq_i] = _CONSUMED
        return inp

    _CONSUMED = object()
    t0 = time.time()
    try:
        if n_devices > 1 and synth_backend == "tpu" and n_seq > 0:
            per_wave = max(n_devices // 2, 1)
            # group intervals of similar length per wave: finished chains
            # idle their device until the wave's longest chain completes
            order = sorted(
                range(n_seq), key=lambda i: key_ind[i + 1] - key_ind[i]
            )
            waves = [order[i:i + per_wave] for i in range(0, n_seq, per_wave)]
            flat_order = [i for w in waves for i in w]

            def launch_wave(wi):
                queue_inputs(flat_order, min((wi + 1) * per_wave, n_seq) - 1)
                return executor.submit(
                    lambda: synth_wave(
                        waves[wi], [take_inputs(i) for i in waves[wi]]
                    )
                )

            nxt = launch_wave(0)
            for wi, wave_idx in enumerate(waves):
                results = nxt.result()
                if wi + 1 < len(waves):
                    nxt = launch_wave(wi + 1)
                for seq_i in sorted(wave_idx):
                    blend_interval(seq_i, *results[seq_i])
        elif n_seq > 0:
            order = list(range(n_seq))

            def launch(seq_i):
                queue_inputs(order, seq_i)
                return executor.submit(
                    lambda: synth_interval(seq_i, take_inputs(seq_i))
                )

            nxt = launch(0)
            for seq_i in range(n_seq):
                res = nxt.result()
                if seq_i + 1 < n_seq:
                    nxt = launch(seq_i + 1)
                blend_interval(seq_i, *res)
    finally:
        # cancel_futures so a synthesis/blend failure doesn't hang the
        # process while queued flow/synth work (minutes of device calls
        # over the tunnel) drains on the non-daemon worker threads.
        executor.shutdown(wait=False, cancel_futures=True)
        flow_ex.shutdown(wait=False, cancel_futures=True)
    cv2.imwrite(
        os.path.join(blend_dir, "%04d.png" % key_ind[-1]), keys[key_ind[-1]]
    )
    total = time.time() - t0
    print(f"[fresco_tpu] propagation+blend: {total:.1f}s")
    if timers.t:
        print(timers.table(total))
    if timers_out is not None:
        timers_out.update(timers.t)
        timers_out["wall_total"] = total

    if output:
        frames_to_video(blend_dir, output, fps)
    return blend_dir


def video_to_frames(
    video_path: str,
    frame_dir: str,
    filename_pattern: str = "%04d.png",
    frame_edit_func=None,
) -> int:
    """Decode a video to numbered frames on disk; returns frame count
    (equivalent of reference src/ebsynth/src/video_util.py:8-32)."""
    os.makedirs(frame_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    count = 0
    while True:
        ok, img = cap.read()
        if not ok:
            break
        if frame_edit_func is not None:
            img = frame_edit_func(img)
        cv2.imwrite(os.path.join(frame_dir, filename_pattern % count), img)
        count += 1
    cap.release()
    return count


def get_fps(video_path: str) -> float:
    """Container frame rate (reference video_util.py:59-64)."""
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    return fps


def get_frame_count(video_path: str) -> int:
    """Container frame count (reference video_util.py:67-73)."""
    cap = cv2.VideoCapture(video_path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def frames_to_video(frame_dir: str, output: str, fps: float):
    """Equivalent of reference src/ebsynth/src/video_util.py:35-56."""
    files = sorted(
        f for f in os.listdir(frame_dir) if f.endswith((".png", ".jpg"))
    )
    if not files:
        return
    first = cv2.imread(os.path.join(frame_dir, files[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(
        output, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in files:
        vw.write(cv2.imread(os.path.join(frame_dir, f)))
    vw.release()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="fresco_tpu video blending")
    p.add_argument("name", type=str)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--backend", type=str, default="tpu",
                   choices=["tpu", "native"],
                   help="patch-synthesis backend (native = C++ serpentine)")
    p.add_argument("--inpaint", type=str, default="pushpull",
                   choices=["pushpull", "telea"],
                   help="guide inpainting (telea = reference parity)")
    p.add_argument("--fps", type=float, default=30)
    p.add_argument("--key_ind", type=int, nargs="+", required=True)
    p.add_argument("--key", type=str, default="keys")
    p.add_argument("--n_proc", type=int, default=8)
    p.add_argument("--n_devices", type=str, default="1",
                   help="interval-parallel synthesis over this many "
                        "devices ('auto' = all local devices; the "
                        "reference's max_process fan-out, TPU-native)")
    p.add_argument("-ps", action="store_true")
    p.add_argument("-ne", action="store_true",
                   help="reuse previous synthesis outputs (resume)")
    p.add_argument("-tmp", action="store_true", help="keep tmp caches")
    p.add_argument("--trim", type=int, default=None,
                   help="trim_seeded_levels tier (0 = full reference "
                        "candidate sweep, 2 = throughput-first)")
    p.add_argument("--stop-threshold", type=float, default=None,
                   help="ebsynth -stopthreshold (0 disables freezing)")
    p.add_argument("--gmflow", type=str, default=None,
                   help="GMFlow checkpoint for flows (default: the "
                        "FrescoConfig location; Farneback fallback when "
                        "absent)")
    a = p.parse_args(argv)
    pm_kw = {}
    if a.trim is not None:
        pm_kw["trim_seeded_levels"] = a.trim
    if a.stop_threshold is not None:
        pm_kw["stop_threshold"] = a.stop_threshold
    blend_video(
        a.name, a.key_ind, a.key, a.output, a.fps, a.n_proc, poisson=a.ps,
        reuse_synthesis=a.ne, keep_tmp=True, synth_backend=a.backend,
        inpaint_method=a.inpaint, patch_cfg=PatchMatchConfig(**pm_kw),
        n_devices=a.n_devices if a.n_devices == "auto" else int(a.n_devices),
        flow_fn=default_flow_fn(a.gmflow) if a.gmflow else None,
    )


if __name__ == "__main__":
    main()
