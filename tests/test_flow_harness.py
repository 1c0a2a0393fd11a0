"""GMFlow data/eval/train harness (SURVEY component #20): file-format
round trips, augmentor semantics, the prefetching loader, the reference
sequence loss, and dataset validation with the tiny model."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.parallel import flow_data as fd


def test_flo_round_trip(tmp_path, rng):
    flow = rng.standard_normal((13, 17, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    fd.write_flo(p, flow)
    np.testing.assert_array_equal(fd.read_flo(p), flow)


def test_flo_matches_reference_reader(tmp_path, rng):
    sys.path.insert(0, "/root/reference/src/ebsynth/deps/gmflow")
    try:
        from utils import frame_utils
    except Exception:
        pytest.skip("reference gmflow utils not importable")
    flow = rng.standard_normal((7, 9, 2)).astype(np.float32)
    p = str(tmp_path / "b.flo")
    fd.write_flo(p, flow)
    np.testing.assert_allclose(frame_utils.readFlow(p), flow)


def test_kitti_png_round_trip(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    flow = (rng.standard_normal((8, 12, 2)) * 10).astype(np.float32)
    p = str(tmp_path / "k.png")
    fd.write_kitti_flow(p, flow)
    got, valid = fd.read_kitti_flow(p)
    np.testing.assert_allclose(got, flow, atol=1 / 64.0)
    assert valid.min() == 1.0


def test_pfm_reader(tmp_path, rng):
    data = rng.standard_normal((6, 10)).astype(np.float32)
    p = tmp_path / "x.pfm"
    with open(p, "wb") as f:
        f.write(b"Pf\n10 6\n-1.0\n")
        np.flipud(data).astype("<f").tofile(f)
    np.testing.assert_allclose(fd.read_pfm(str(p)), data)


def _synth_sample(rng, h=40, w=56):
    img1 = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    img2 = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    flow = rng.uniform(-3, 3, (h, w, 2)).astype(np.float32)
    return img1, img2, flow


def test_augmentor_crop_and_flip(rng):
    img1, img2, flow = _synth_sample(rng, 80, 96)
    aug = fd.FlowAugmentor(
        fd.AugmentConfig(crop_size=(32, 48), spatial_aug_prob=0.0,
                         h_flip_prob=1.0, v_flip_prob=0.0, eraser_prob=0.0),
        seed=1,
    )
    a1, a2, af, av = aug(img1.astype(np.float32), img2.astype(np.float32),
                         flow.copy())
    assert a1.shape == (32, 48, 3) and af.shape == (32, 48, 2)
    assert av.shape == (32, 48)
    # h-flip negates dx: a flipped constant-flow field keeps |dx|
    const = np.full((80, 96, 2), 2.0, np.float32)
    _, _, cf, _ = aug(img1.astype(np.float32), img2.astype(np.float32), const)
    np.testing.assert_allclose(cf[..., 0], -2.0)
    np.testing.assert_allclose(cf[..., 1], 2.0)


def test_sparse_resize_keeps_validity(rng):
    aug = fd.FlowAugmentor(fd.AugmentConfig(crop_size=(16, 16)), sparse=True)
    flow = np.zeros((20, 20, 2), np.float32)
    valid = np.zeros((20, 20), np.float32)
    valid[5:10, 5:10] = 1.0
    flow[5:10, 5:10] = 3.0
    f2, v2 = aug._resize_sparse(flow, valid, 1.5)
    assert f2.shape == (30, 30, 2)
    assert v2.sum() > 0
    np.testing.assert_allclose(f2[v2 > 0], 4.5)  # flow scales with the map


def test_loader_batches(tmp_path, rng):
    from PIL import Image

    # tiny on-disk frame dir (unsupervised index)
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(tmp_path / f"{i:04d}.png")
    idx = fd.index_frame_dir(str(tmp_path))
    assert len(idx) == 4
    loader = fd.FlowLoader(idx, batch_size=2, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["img0"].shape == (2, 16, 16, 3)
    assert "flow" not in batches[0]


def test_chairs_index(tmp_path, rng):
    from PIL import Image

    data = tmp_path / "data"
    data.mkdir()
    for i in range(1, 4):
        for k in (1, 2):
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
            ).save(data / f"{i:05d}_img{k}.ppm")
        fd.write_flo(str(data / f"{i:05d}_flow.flo"),
                     np.zeros((8, 8, 2), np.float32))
    np.savetxt(tmp_path / "chairs_split.txt", [1, 2, 1], fmt="%d")
    tr = fd.index_flying_chairs(str(tmp_path), "train")
    va = fd.index_flying_chairs(str(tmp_path), "val")
    assert len(tr) == 2 and len(va) == 1
    img1, img2, flow, valid = tr.load(0)
    assert img1.shape == (8, 8, 3) and flow.shape == (8, 8, 2)


def test_sequence_loss_reference_semantics(rng):
    from fresco_tpu.parallel.flow_train import flow_sequence_loss

    gt = jnp.asarray(rng.standard_normal((1, 6, 6, 2)), jnp.float32)
    p1 = gt + 1.0
    p2 = gt + 0.5
    loss, metrics = flow_sequence_loss([p1, p2], gt, gamma=0.9)
    # gamma-weighted L1: 0.9*1.0 + 1.0*0.5
    np.testing.assert_allclose(float(loss), 0.9 * 1.0 + 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(metrics["epe"]),
                               np.sqrt(0.5**2 + 0.5**2), rtol=1e-5)
    # pixels with |gt| >= max_flow are excluded entirely
    gt_big = gt.at[0, 0, 0].set(jnp.asarray([500.0, 0.0]))
    loss2, m2 = flow_sequence_loss([gt_big + 1.0], gt_big, max_flow=400.0)
    assert float(m2["epe"]) == pytest.approx(np.sqrt(2.0), rel=1e-5)
    assert float(loss2) < np.sqrt(2.0)  # masked pixel contributes 0


def test_validate_tiny_gmflow(rng):
    from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
    from fresco_tpu.parallel.flow_eval import flow_metrics, validate

    gmflow = GMFlow(GMFlowConfig.tiny())
    probe = jnp.zeros((1, 32, 32, 3))
    params = gmflow.init(jax.random.key(0), probe, probe)

    def samples():
        for _ in range(2):
            img = rng.uniform(0, 255, (30, 34, 3)).astype(np.float32)
            yield img, img, np.zeros((30, 34, 2), np.float32), None

    res = validate(gmflow, params, samples())
    assert res["n_pairs"] == 2
    assert np.isfinite(res["epe"]) and 0 <= res["3px"] <= 1
    # metrics helper: exact zero-error case
    m = flow_metrics(np.zeros((4, 4, 2)), np.zeros((4, 4, 2)))
    assert m["epe"] == 0.0 and m["f1_all"] == 0.0


def test_pad_to_multiple_modes():
    from fresco_tpu.parallel.flow_eval import pad_to_multiple

    x = np.arange(5 * 6 * 3, dtype=np.float32).reshape(1, 5, 6, 3)
    p, crop = pad_to_multiple(x, 8, "sintel")
    assert p.shape == (1, 8, 8, 3)
    np.testing.assert_array_equal(p[:, crop[0], crop[1]], x)
    pk, crop_k = pad_to_multiple(x, 8, "kitti")
    assert pk.shape == (1, 8, 8, 3)
    np.testing.assert_array_equal(pk[:, crop_k[0], crop_k[1]], x)


@pytest.mark.slow
def test_train_gmflow_synthetic_smoke():
    """End-to-end driver: 2 synthetic supervised steps on the tiny model."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_gmflow.py"),
         "--synthetic", "--tiny", "--steps", "2", "--batch-size", "2",
         "--log-every", "1"],
        capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "step 2/2" in out.stdout
