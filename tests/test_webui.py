"""WebUI control-to-config mapping (reference webUI.py:115-146,337-338)
and offline execution of the full Blocks app under a recording-fake
gradio (gradio_stub.py) — every line of webui.launch() runs in tests
even though gradio itself is not installable here."""
import inspect
import os
import sys

import pytest

from fresco_tpu.webui import GlobalState, ui_to_config

#: ui_to_config's positional parameter order == the Blocks `inputs`
#: wiring order (reference webUI.py:447-578 ips)
UI_PARAM_NAMES = [
    p.name for p in inspect.signature(ui_to_config).parameters.values()
]


def _launch_stubbed(**kwargs):
    """Run fresco_tpu.webui.launch() with the recording-fake gradio
    installed; returns the stub Blocks app."""
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        import gradio_stub
    finally:
        sys.path.pop(0)
    old = sys.modules.get("gradio")
    sys.modules["gradio"] = gradio_stub
    try:
        import fresco_tpu.webui as w

        return w.launch(**kwargs)
    finally:
        if old is not None:
            sys.modules["gradio"] = old
        else:
            sys.modules.pop("gradio", None)


def _base_args(**over):
    args = dict(
        file_path="v.mp4", prompt="p", sd_path="runwayml/stable-diffusion-v1-5",
        seed=3, resolution=512, cond_scale=0.7, controlnet_type="hed",
        x0_strength=0.75, num_inference_steps=20, batch_size=8,
        mininterv=5, maxinterv=20, use_controlnet=True, use_cfattn=True,
        use_intraattn=True, use_interattn=True, use_optflow=True,
        use_saliency=True, use_freeu=False, save_path="./out/",
    )
    args.update(over)
    return list(args.values())


def test_x0_strength_maps_to_warmup():
    cfg = ui_to_config(*_base_args(x0_strength=0.75, num_inference_steps=20))
    # num_warmup_steps = int(steps * (1 - strength)) (webUI.py:337-338)
    assert cfg.num_warmup_steps == 5
    cfg = ui_to_config(*_base_args(x0_strength=1.0))
    assert cfg.num_warmup_steps == 0


def test_mechanism_toggles():
    cfg = ui_to_config(*_base_args(use_interattn=False))
    assert cfg.step_interattn_end > 1000  # never reached -> disabled
    cfg = ui_to_config(*_base_args(use_intraattn=False))
    assert cfg.num_intraattn_steps == 0
    cfg = ui_to_config(
        *_base_args(use_cfattn=False, use_intraattn=False, use_interattn=False)
    )
    assert cfg.use_fresco_attn is False
    cfg = ui_to_config(*_base_args(use_optflow=False))
    assert cfg.use_fresco_opt is False


def test_global_state_rebuild_policy():
    gs = GlobalState()
    cfg = ui_to_config(*_base_args())

    class FakePipe:
        def __init__(self, config, tiny=False):
            self.config = config
            self.sampler_cfg_rebuilt = 0

        def set_config(self, config):
            self.config = config
            self.sampler_cfg_rebuilt += 1

    import fresco_tpu.webui as w

    orig = None
    try:
        import fresco_tpu.pipeline.runner as runner

        orig = runner.FrescoPipeline
        runner.FrescoPipeline = FakePipe
        p1 = gs.get_pipeline(cfg)
        p2 = gs.get_pipeline(cfg.replace(prompt="other"))
        assert p1 is p2  # same models -> reuse (webUI hot-swap semantics)
        # sampler-level controls must be adopted via set_config, NOT
        # just a config attribute swap (a stale _base_sampler_cfg made
        # steps/strength/toggle changes silently no-ops)
        assert p2.sampler_cfg_rebuilt == 1
        p2b = gs.get_pipeline(cfg.replace(num_inference_steps=30))
        assert p2b is p1 and p2b.config.num_inference_steps == 30
        assert p2b.sampler_cfg_rebuilt == 2
        # model-affecting toggles force a rebuild
        p2c = gs.get_pipeline(cfg.replace(use_freeu=True))
        assert p2c is not p1
        p3 = gs.get_pipeline(cfg.replace(sd_path="stablediffusionapi/rev-animated"))
        assert p3 is not p1  # base swap -> rebuild (webUI.py:168-200)
    finally:
        if orig is not None:
            runner.FrescoPipeline = orig


def test_x0_strength_above_one_gives_negative_warmup():
    """Slider max 1.05 (reference semantics: pure-noise init, all steps);
    the sampler consumes the negative warmup as pipe_FRESCO.py:155-157."""
    cfg = ui_to_config(*_base_args(x0_strength=1.05, num_inference_steps=20))
    assert cfg.num_warmup_steps < 0


def test_advanced_controls_map_to_config():
    """Control-for-control parity with reference webUI.py:447-578 ips:
    every advanced control reaches its typed-config field."""
    cfg = ui_to_config(
        *_base_args(),
        guidance_scale=11.5, a_prompt="ap", n_prompt="np",
        canny_low=10, canny_high=200,
        freeu_b1=1.3, freeu_b2=1.4, freeu_s1=0.9, freeu_s2=0.2,
        use_poisson=False, max_process=8, frame_count=120,
    )
    assert cfg.guidance_scale == 11.5
    assert cfg.a_prompt == "ap" and cfg.n_prompt == "np"
    assert (cfg.canny_low, cfg.canny_high) == (10, 200)
    assert (cfg.freeu_b1, cfg.freeu_b2, cfg.freeu_s1, cfg.freeu_s2) == (
        1.3, 1.4, 0.9, 0.2
    )
    assert cfg.use_poisson is False
    assert cfg.max_process == 8
    assert cfg.frame_count == 120


def test_advanced_controls_defaults():
    """Omitted advanced controls keep the typed-config defaults (the
    reference's run_fresco.py values), incl. frame_count 0 -> None (all
    frames) and FreeU factors untouched by the no-op slider value."""
    from fresco_tpu.core.config import FrescoConfig

    cfg = ui_to_config(*_base_args())
    d = FrescoConfig()
    assert cfg.guidance_scale == d.guidance_scale == 7.5
    assert cfg.a_prompt is None and cfg.n_prompt is None
    assert (cfg.canny_low, cfg.canny_high) == (50, 100)
    assert cfg.freeu_b1 == d.freeu_b1 and cfg.freeu_s2 == d.freeu_s2
    assert cfg.use_poisson is True
    assert cfg.frame_count is None


def test_launch_constructs_under_stub():
    """webui.launch() builds the full Blocks app (reference
    webUI.py:418-637) without error: 34-control `inputs` wiring in
    ui_to_config order, three buttons with handlers, example gallery
    rows for every demo config, and launch kwargs passed through."""
    app = _launch_stubbed(tiny=True, server_port=7861)
    assert app.launched == {"server_port": 7861}

    # three actions wired (reference webUI.py:631-635), sharing ONE
    # inputs list
    labels = [b[0] for b in app.buttons]
    assert labels == ["Run Key Frames", "Run Propagation", "Run All"]
    inputs = app.buttons[0][2]
    assert all(b[2] is inputs for b in app.buttons)
    assert len(inputs) == len(UI_PARAM_NAMES) == 34

    # the control defaults, fed positionally, must land on the right
    # config fields — this pins the inputs order to ui_to_config's
    # signature (a swapped pair would scramble these values)
    cfg = ui_to_config(*[c.value for c in inputs])
    assert cfg.file_path == "./data/music.mp4"
    assert cfg.save_path == "./output/ui/"
    assert cfg.sd_path == "runwayml/stable-diffusion-v1-5"
    assert cfg.controlnet_type == "hed"
    assert cfg.num_inference_steps == 20 and cfg.num_warmup_steps == 5
    assert cfg.batch_size == 8
    assert (cfg.mininterv, cfg.maxinterv) == (5, 20)
    assert (cfg.canny_low, cfg.canny_high) == (50, 100)
    assert cfg.guidance_scale == 7.5
    assert cfg.use_poisson is True and cfg.max_process == 4
    assert cfg.frame_count is None

    # example gallery: one row per demo config, each a full inputs row
    assert app.examples, "example gallery missing"
    rows, ex_inputs = app.examples[0]
    assert ex_inputs is inputs
    import glob

    n_cfgs = len(glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "config", "*.yaml")
    ))
    assert len(rows) == n_cfgs >= 4
    assert all(len(r) == 34 for r in rows)


@pytest.mark.slow
def test_launch_handlers_run_tiny(tmp_path):
    """Each button's real click handler runs end-to-end against a tiny
    config: Run Key Frames translates, Run Propagation blends from the
    written keys, Run All does both (reference webUI.py:203-207)."""
    import fresco_tpu.webui as w

    app = _launch_stubbed(tiny=True)
    inputs = app.buttons[0][2]
    v = dict(zip(UI_PARAM_NAMES, [c.value for c in inputs]))
    v.update(
        file_path="/root/reference/data/music.mp4",
        save_path=str(tmp_path) + "/",
        prompt="a cartoon",
        resolution=64,
        num_inference_steps=4,
        x0_strength=0.5,
        mininterv=4,
        maxinterv=4,
        frame_count=9,             # keys 0,4,8 -> 2 tiny intervals
        controlnet_type="canny",   # no detector weights needed
        use_saliency=False,        # no EGNet weights offline
        use_freeu=False,
        use_poisson=False,
        max_process=1,
    )
    if not os.path.exists(v["file_path"]):
        pytest.skip("demo clip not mounted")
    args = [v[n] for n in UI_PARAM_NAMES]
    handlers = {label: fn for label, fn, _, _ in app.buttons}

    old_state = w.STATE
    w.STATE = GlobalState()
    try:
        log = handlers["Run Key Frames"](*args)
        assert "translated" in log
        keys_dir = os.path.join(v["save_path"], "keys")
        assert len(os.listdir(keys_dir)) == 3

        out = handlers["Run Propagation"](*args)
        assert os.path.exists(out) and out.endswith("blend.mp4")

        out2 = handlers["Run All"](*args)
        assert os.path.exists(out2)
    finally:
        w.STATE = old_state


def test_example_inputs_roundtrip():
    """The example gallery rows (reference webUI.py cfg_to_input) feed
    ui_to_config positionally and reproduce the YAML config's values."""
    import glob
    import os

    from fresco_tpu.webui import example_inputs

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "config")
    paths = sorted(glob.glob(os.path.join(cfg_dir, "*.yaml")))
    assert paths, "demo configs missing"
    for p in paths:
        row = example_inputs(p)
        cfg = ui_to_config(*row)
        from fresco_tpu.core.config import load_config

        want = load_config(p)
        assert cfg.prompt == want.prompt
        assert cfg.sd_path == want.sd_path
        assert cfg.controlnet_type == want.controlnet_type
        assert cfg.num_inference_steps == want.num_inference_steps
        assert cfg.num_warmup_steps == want.num_warmup_steps
        assert cfg.batch_size == want.batch_size
        assert (cfg.mininterv, cfg.maxinterv) == (want.mininterv, want.maxinterv)
