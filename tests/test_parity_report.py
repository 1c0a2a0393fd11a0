"""scripts/parity_report.py: the one-command BASELINE.md metrics table.

Covers the table assembly and the --reuse path (fabricated
metrics.json); the underlying pipeline run is covered by
tests/test_e2e_tiny.py / test_e2e_blend.py through the same
cli.run_config code path.
"""
import importlib.util
import json
import os
import sys

import yaml


def _load_parity_module():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "parity_report.py",
    )
    spec = importlib.util.spec_from_file_location("parity_report", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_make_table_formats_all_columns():
    mod = _load_parity_module()
    rows = [
        {
            "config": "config_music",
            "wall_s": 12.3,
            "input": {"warp_error": 1.39, "frame_similarity": 0.999,
                      "frame_similarity_is_clip": False},
            "translated": {"warp_error": 32.3, "frame_similarity": 0.911,
                           "frame_similarity_is_clip": False},
        },
        {"config": "config_dog", "wall_s": 1.0},  # missing metrics -> dashes
    ]
    table = mod.make_table(rows)
    lines = table.splitlines()
    assert lines[0].count("|") == 8  # 7 columns
    assert "config_music" in lines[2] and "32.3" in lines[2]
    assert "pixel proxy" in lines[2]
    assert "config_dog" in lines[3] and "—" in lines[3]


import pytest


@pytest.mark.slow
def test_tiny_four_config_sweep_offline(tmp_path, monkeypatch):
    """All four bundled demo configs run end-to-end from the repo alone
    (VERDICT r4 #5): tiny random-weight models, 9 frames at 64px, real
    keyframe translation + propagation + metrics per config, yielding a
    4-row PARITY table."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for clip in ("music", "dog", "car-turn", "boxer-punching-towards-camera"):
        if not os.path.exists(os.path.join(repo, "data", clip + ".mp4")):
            pytest.skip(f"demo clip {clip} not bundled")
    monkeypatch.chdir(repo)  # configs use ./data/... relative paths
    mod = _load_parity_module()
    out_json = tmp_path / "report.json"
    out_md = tmp_path / "PARITY_tiny.md"
    rc = mod.main([
        "--tiny", "--frame-count", "9", "--resolution", "64",
        "--steps", "4", "--out-root", str(tmp_path / "runs"),
        "--out", str(out_json), "--md", str(out_md),
    ])
    assert rc == 0
    rows = json.loads(out_json.read_text())
    assert [r["config"] for r in rows] == [
        "config_boxer", "config_carturn", "config_dog", "config_music",
    ]
    for r in rows:
        assert r["translated"]["warp_error"] is not None
        assert 0.0 < r["translated"]["frame_similarity"] <= 1.0
        assert r["input"]["warp_error"] is not None
    md = out_md.read_text()
    assert md.count("config_") == 4


def test_reuse_path_builds_report_without_running(tmp_path, monkeypatch):
    mod = _load_parity_module()
    # fabricate a config + a previous run's metrics.json
    save = tmp_path / "out"
    save.mkdir()
    metrics = {
        "translated": {"warp_error": 2.0, "frame_similarity": 0.95,
                       "frame_similarity_is_clip": True},
        "input": {"warp_error": 1.0, "frame_similarity": 0.99,
                  "frame_similarity_is_clip": True},
    }
    (save / "metrics.json").write_text(json.dumps(metrics))
    cfg_path = tmp_path / "config_fake.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "file_path": "/nonexistent.mp4",
        "save_path": str(save) + "/",
        "prompt": "x",
    }))

    # run_config must NOT be called on the reuse path
    import fresco_tpu.cli as cli

    def boom(*a, **k):
        raise AssertionError("run_config called despite --reuse")

    monkeypatch.setattr(cli, "run_config", boom)
    out_json = tmp_path / "report.json"
    out_md = tmp_path / "PARITY_test.md"
    rc = mod.main([
        "--configs", str(cfg_path), "--reuse",
        "--out", str(out_json), "--md", str(out_md),
    ])
    assert rc == 0
    rows = json.loads(out_json.read_text())
    assert rows[0]["config"] == "config_fake"
    assert rows[0]["translated"]["warp_error"] == 2.0
    md = out_md.read_text()
    assert "CLIP" in md and "config_fake" in md
