"""Gradio WebUI, reference-parity (reference webUI.py).

Same interactive surface as the reference: prompt/seed/resolution
controls, per-mechanism toggles (cross-frame / spatial-guided /
temporal-guided attention, feature optimization, background smoothing),
SDEdit strength, ControlNet type + scale, FreeU, SD base hot-swap, and
the three actions Run Key Frames / Run Propagation / Run All
(webUI.py:631-635).

gradio is an optional dependency (not installed in minimal/TPU-pod
images): importing this module is safe; ``launch()`` raises a clear
error if gradio is unavailable.
"""
from __future__ import annotations

import dataclasses
import os

from fresco_tpu.core.config import FrescoConfig


@dataclasses.dataclass
class GlobalState:
    """Lazy model store with hot-swap (reference webUI.py:149-200)."""

    config: FrescoConfig | None = None
    pipeline: object | None = None
    sd_path: str | None = None
    controlnet_type: str | None = None
    lora_path: str | None = None
    lora_scale: float | None = None

    def get_pipeline(self, config: FrescoConfig, tiny: bool = False):
        from fresco_tpu.pipeline.runner import FrescoPipeline

        # model-affecting fields force a rebuild (webUI.py:168-200
        # hot-swap); everything else is adopted in place via set_config
        # so sampler-level controls (steps, strength, toggles) take
        # effect without reloading weights
        old = self.config
        rebuild = (
            self.pipeline is None
            or self.sd_path != config.sd_path
            or self.controlnet_type != config.controlnet_type
            or self.lora_path != config.lora_path
            or self.lora_scale != config.lora_scale
            or old is None
            or old.use_freeu != config.use_freeu
            or old.use_saliency != config.use_saliency
            or old.dtype != config.dtype
        )
        if rebuild:
            self.pipeline = FrescoPipeline(config, tiny=tiny)
            self.sd_path = config.sd_path
            self.controlnet_type = config.controlnet_type
            self.lora_path = config.lora_path
            self.lora_scale = config.lora_scale
        else:
            self.pipeline.set_config(config)
        self.config = config
        return self.pipeline


STATE = GlobalState()


def ui_to_config(
    file_path, prompt, sd_path, seed, resolution, cond_scale, controlnet_type,
    x0_strength, num_inference_steps, batch_size, mininterv, maxinterv,
    use_controlnet, use_cfattn, use_intraattn, use_interattn, use_optflow,
    use_saliency, use_freeu, save_path, lora_path="", lora_scale=1.0,
) -> FrescoConfig:
    """UI controls -> typed config (reference webUI.py:115-146 inverse).

    x0_strength maps to warmup steps:
    num_warmup_steps = int(steps * (1 - x0_strength)) (webUI.py:337-338).
    """
    return FrescoConfig(
        file_path=file_path,
        save_path=save_path,
        prompt=prompt,
        sd_path=sd_path,
        seed=int(seed),
        resolution=int(resolution),
        cond_scale=float(cond_scale),
        controlnet_type=controlnet_type,
        num_inference_steps=int(num_inference_steps),
        num_warmup_steps=int(num_inference_steps * (1 - x0_strength)),
        batch_size=int(batch_size),
        mininterv=int(mininterv),
        maxinterv=int(maxinterv),
        use_controlnet=bool(use_controlnet),
        use_fresco_attn=bool(use_cfattn or use_intraattn or use_interattn),
        use_cfattn=bool(use_cfattn),
        num_intraattn_steps=(
            FrescoConfig.num_intraattn_steps if use_intraattn else 0
        ),
        # > max timestep 1000 = never fires; the enabled value comes from
        # the typed config default (CLAUDE.md: no re-hardcoded reference
        # magic numbers)
        step_interattn_end=(
            FrescoConfig.step_interattn_end if use_interattn else 1001
        ),
        use_fresco_opt=bool(use_optflow),
        use_saliency=bool(use_saliency),
        use_freeu=bool(use_freeu),
        lora_path=str(lora_path) or None,
        lora_scale=float(lora_scale),
    )


def process1(config: FrescoConfig, tiny: bool = False):
    """Run Key Frames (reference webUI.py:210-374)."""
    pipe = STATE.get_pipeline(config, tiny=tiny)
    keys = pipe.translate_keyframes()
    return keys


def process2(config: FrescoConfig, keys):
    """Run Propagation (reference webUI.py:377-407)."""
    from fresco_tpu.propagate.video_blend import blend_video

    import cv2

    cap = cv2.VideoCapture(config.file_path)
    fps = int(cap.get(cv2.CAP_PROP_FPS)) or 30
    cap.release()
    out = os.path.join(config.save_path, "blend.mp4")
    blend_video(config.save_path, list(keys), "keys", out, fps,
                config.max_process, poisson=True)
    return out


def process(config: FrescoConfig, tiny: bool = False):
    """Run All."""
    keys = process1(config, tiny=tiny)
    return process2(config, keys)


def launch(tiny: bool = False, **launch_kwargs):
    """Build and launch the gradio Blocks app."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "gradio is not installed in this environment; the WebUI requires "
            "`pip install gradio`. The same functionality is available via "
            "`python -m fresco_tpu.cli <config.yaml>`."
        ) from e

    with gr.Blocks() as app:
        gr.Markdown("## FRESCO-TPU video-to-video translation")
        with gr.Row():
            file_path = gr.Textbox(label="Input video", value="./data/music.mp4")
            save_path = gr.Textbox(label="Output dir", value="./output/ui/")
        prompt = gr.Textbox(label="Prompt")
        with gr.Row():
            sd_path = gr.Dropdown(
                label="SD base",
                choices=[
                    "runwayml/stable-diffusion-v1-5",
                    "stablediffusionapi/rev-animated",
                    "SG161222/Realistic_Vision_V2.0",
                    "wavymulder/flat-2d-animerge",
                ],
                value="runwayml/stable-diffusion-v1-5",
                allow_custom_value=True,
            )
            controlnet_type = gr.Radio(
                ["hed", "canny", "depth"], label="ControlNet", value="hed"
            )
        with gr.Row():
            lora_path = gr.Textbox(
                label="LoRA checkpoint (kohya .safetensors, optional)", value=""
            )
            lora_scale = gr.Slider(0.0, 2.0, value=1.0, label="LoRA scale")
        with gr.Row():
            seed = gr.Number(label="Seed", value=0, precision=0)
            resolution = gr.Slider(256, 768, value=512, step=64, label="Resolution")
            cond_scale = gr.Slider(0.0, 2.0, value=0.7, label="ControlNet scale")
            x0_strength = gr.Slider(0.0, 1.05, value=0.75, label="Denoise strength")
        with gr.Row():
            num_steps = gr.Slider(1, 50, value=20, step=1, label="DDPM steps")
            batch_size = gr.Slider(1, 8, value=8, step=1, label="Keyframe batch")
            mininterv = gr.Slider(1, 50, value=5, step=1, label="Min interval")
            maxinterv = gr.Slider(1, 100, value=20, step=1, label="Max interval")
        with gr.Accordion("FRESCO constraints", open=False):
            use_controlnet = gr.Checkbox(label="ControlNet", value=True)
            use_cfattn = gr.Checkbox(label="Cross-frame attention", value=True)
            use_intraattn = gr.Checkbox(label="Spatial-guided attention", value=True)
            use_interattn = gr.Checkbox(label="Temporal-guided attention", value=True)
            use_optflow = gr.Checkbox(label="Feature optimization", value=True)
            use_saliency = gr.Checkbox(label="Background smoothing", value=True)
            use_freeu = gr.Checkbox(label="FreeU", value=False)
        with gr.Row():
            btn_keys = gr.Button("Run Key Frames")
            btn_prop = gr.Button("Run Propagation")
            btn_all = gr.Button("Run All")
        result = gr.Video(label="Result")
        log = gr.Textbox(label="Log")

        inputs = [
            file_path, prompt, sd_path, seed, resolution, cond_scale,
            controlnet_type, x0_strength, num_steps, batch_size, mininterv,
            maxinterv, use_controlnet, use_cfattn, use_intraattn,
            use_interattn, use_optflow, use_saliency, use_freeu, save_path,
            lora_path, lora_scale,
        ]

        def _run_keys(*args):
            cfg = ui_to_config(*args)
            keys = process1(cfg, tiny=tiny)
            return f"translated {len(keys)} keyframes: {keys}"

        def _run_prop(*args):
            cfg = ui_to_config(*args)
            keys = sorted(
                int(f.split(".")[0])
                for f in os.listdir(os.path.join(cfg.save_path, "keys"))
                if f.endswith(".png")
            )
            return process2(cfg, keys)

        def _run_all(*args):
            cfg = ui_to_config(*args)
            return process(cfg, tiny=tiny)

        btn_keys.click(_run_keys, inputs, log)
        btn_prop.click(_run_prop, inputs, result)
        btn_all.click(_run_all, inputs, result)

    app.launch(**launch_kwargs)
    return app


if __name__ == "__main__":
    launch()
