"""Download the model weights FRESCO needs (reference install.py:52-95).

The pipeline converts the reference's exact torch checkpoints on the fly
(fresco_tpu/models/convert.py, golden-tested), so this tool only has to
place the SAME files the reference downloads into the layout
`FrescoConfig` expects:

    model/gmflow_sintel-0c07dcb3.pth       (gmflow_path default)
    model/epoch_resnet.pth                 (sod_path default — EGNet)
    model/ControlNetHED.pth                (hed detector, optional)
    model/dpt_hybrid-midas-501f0c75.pt     (depth detector, optional)
    model/mlsd_large_512_fp32.pth          (mlsd detector, optional)
    model/body_pose_model.pth              (openpose detector, optional)
    <sd_path>/{unet,vae,text_encoder,tokenizer,scheduler}/...  (diffusers)
    <controlnet_path>/diffusion_pytorch_model.safetensors
    <vae_path>/diffusion_pytorch_model.safetensors (sd-vae-ft-mse)

No ebsynth binary is needed: the propagation engine is native to this
framework (TPU jump-flood + the bundled C++ serpentine backend built by
propagate/native/build.sh).

    python scripts/fetch_weights.py                    # aux models only
    python scripts/fetch_weights.py --sd --controlnet hed
    python scripts/fetch_weights.py --dest /data/models

Diffusers-format downloads use huggingface_hub when importable (it ships
with transformers); the direct-URL checkpoints use plain urllib.
"""
from __future__ import annotations

import argparse
import os
import sys
import urllib.request

AUX = {
    # filename -> URL (reference install.py:50-69 + ControlNet annotators)
    "gmflow_sintel-0c07dcb3.pth":
        "https://huggingface.co/PKUWilliamYang/Rerender/resolve/main/"
        "models/gmflow_sintel-0c07dcb3.pth",
    "epoch_resnet.pth":
        "https://huggingface.co/PKUWilliamYang/Rerender/resolve/main/"
        "models/epoch_resnet.pth",
    "ControlNetHED.pth":
        "https://huggingface.co/lllyasviel/Annotators/resolve/main/"
        "ControlNetHED.pth",
    "dpt_hybrid-midas-501f0c75.pt":
        "https://huggingface.co/lllyasviel/ControlNet/resolve/main/"
        "annotator/ckpts/dpt_hybrid-midas-501f0c75.pt",
    "mlsd_large_512_fp32.pth":
        "https://huggingface.co/lllyasviel/ControlNet/resolve/main/"
        "annotator/ckpts/mlsd_large_512_fp32.pth",
    "body_pose_model.pth":
        "https://huggingface.co/lllyasviel/ControlNet/resolve/main/"
        "annotator/ckpts/body_pose_model.pth",
}
CORE_AUX = ("gmflow_sintel-0c07dcb3.pth", "epoch_resnet.pth")

# runwayml/stable-diffusion-v1-5 was removed from the Hub; the community
# re-upload is the canonical mirror.  Configs naming the old id keep
# working — pass --sd-repo to override.
SD_REPO = "stable-diffusion-v1-5/stable-diffusion-v1-5"
VAE_REPO = "stabilityai/sd-vae-ft-mse"
CONTROLNET_REPOS = {
    "hed": "lllyasviel/sd-controlnet-hed",
    "canny": "lllyasviel/sd-controlnet-canny",
    "depth": "lllyasviel/sd-controlnet-depth",
}


def _urlretrieve(url: str, dest: str) -> bool:
    tmp = dest + ".part"

    def hook(blocks, bs, total):
        done = blocks * bs
        if total > 0 and blocks % 256 == 0:
            print(f"\r  {done/2**20:7.1f} / {total/2**20:.1f} MB", end="",
                  flush=True)

    try:
        urllib.request.urlretrieve(url, tmp, reporthook=hook)
    except Exception as e:  # no egress / transient network failure
        print(f"\n  FAILED {url}: {e}")
        if os.path.exists(tmp):
            os.remove(tmp)
        return False
    os.replace(tmp, dest)
    print(f"\r  -> {dest}" + " " * 24)
    return True


def fetch_aux(dest: str, all_detectors: bool) -> int:
    os.makedirs(dest, exist_ok=True)
    failed = 0
    for name, url in AUX.items():
        if not all_detectors and name not in CORE_AUX:
            continue
        path = os.path.join(dest, name)
        if os.path.exists(path):
            print(f"  have {path}")
            continue
        print(f"  downloading {name}")
        failed += 0 if _urlretrieve(url, path) else 1
    return failed


def fetch_diffusers(repo: str, dest: str, subfolders=None) -> bool:
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print(f"  huggingface_hub not installed — fetch {repo} manually "
              f"into {dest} (git lfs clone or the hf CLI)")
        return False
    patterns = ["*.json", "*.txt"]
    for sub in subfolders or [""]:
        patterns += [f"{sub}/*.safetensors" if sub else "*.safetensors",
                     f"{sub}/*.json" if sub else "*.json"]
    try:
        snapshot_download(repo, local_dir=dest, allow_patterns=patterns)
    except Exception as e:
        print(f"  FAILED {repo}: {e}")
        return False
    print(f"  -> {dest}")
    return True


def main(argv=None):
    p = argparse.ArgumentParser(
        description="download FRESCO model weights (install.py parity)")
    p.add_argument("--dest", default="./model",
                   help="aux-checkpoint directory (FrescoConfig default)")
    p.add_argument("--all-detectors", action="store_true",
                   help="also HED/MiDaS/MLSD/OpenPose (default: "
                        "gmflow+EGNet only; canny needs no weights)")
    p.add_argument("--sd", action="store_true",
                   help="also the SD1.5 diffusers checkpoint")
    p.add_argument("--sd-repo", default=SD_REPO)
    p.add_argument("--sd-dest", default="./stable-diffusion-v1-5")
    p.add_argument("--controlnet", choices=sorted(CONTROLNET_REPOS),
                   default=None, help="also this ControlNet variant")
    p.add_argument("--vae", action="store_true",
                   help="also the sd-vae-ft-mse VAE override")
    a = p.parse_args(argv)

    failed = fetch_aux(a.dest, a.all_detectors)
    if a.sd:
        ok = fetch_diffusers(
            a.sd_repo, a.sd_dest,
            subfolders=["unet", "vae", "text_encoder", "tokenizer",
                        "scheduler"],
        )
        failed += 0 if ok else 1
    if a.controlnet:
        repo = CONTROLNET_REPOS[a.controlnet]
        failed += 0 if fetch_diffusers(
            repo, os.path.join(a.dest, f"sd-controlnet-{a.controlnet}")
        ) else 1
    if a.vae:
        failed += 0 if fetch_diffusers(
            VAE_REPO, os.path.join(a.dest, "sd-vae-ft-mse")
        ) else 1
    if failed:
        print(f"{failed} download(s) failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
