"""WebUI control-to-config mapping (reference webUI.py:115-146,337-338)."""
from fresco_tpu.webui import GlobalState, ui_to_config


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
