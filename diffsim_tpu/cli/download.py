"""Pretrained DiT checkpoint resolution — the reference's ``DiT/download.py`` rebuilt
without the torchvision dependency (stdlib urllib; /root/reference/DiT/download.py:15-43).

``find_model(name)`` resolves the two published DiT checkpoints by name (downloading into
``pretrained_models/`` on first use, exactly the reference's layout) or loads a local
checkpoint path, unwrapping the train-format ``{"ema": ...}`` wrapper. The torch state
dict it returns feeds ``cli.convert dit --model ...`` to produce this framework's ``.npz``.

In an offline environment the download raises a RuntimeError carrying the exact public URL
so the checkpoint can be fetched out of band and dropped into ``pretrained_models/``.
"""

from __future__ import annotations

import argparse
import os

PRETRAINED_MODELS = ("DiT-XL-2-512x512.pt", "DiT-XL-2-256x256.pt")
WEB_ROOT = "https://dl.fbaipublicfiles.com/DiT/models"


def _torch_load(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "ema" in ckpt:  # train.py-format checkpoint
        ckpt = ckpt["ema"]
    return ckpt


def download_model(model_name: str, root: str = "pretrained_models") -> str:
    """Ensure the named published checkpoint exists under ``root``; return its path."""
    if model_name not in PRETRAINED_MODELS:
        raise ValueError(f"unknown pretrained model {model_name!r}; "
                         f"choose from {PRETRAINED_MODELS}")
    local_path = os.path.join(root, model_name)
    if not os.path.isfile(local_path):
        os.makedirs(root, exist_ok=True)
        url = f"{WEB_ROOT}/{model_name}"
        import urllib.error
        import urllib.request

        tmp = local_path + ".part"
        try:
            print(f"downloading {url} -> {local_path}")
            # explicit socket timeout: a blackholed network must raise (and show the
            # out-of-band remedy below), not hang forever in connect/recv
            import shutil

            with urllib.request.urlopen(url, timeout=60) as resp, open(tmp, "wb") as f:
                shutil.copyfileobj(resp, f)
            os.replace(tmp, local_path)
        except (urllib.error.URLError, OSError) as e:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise RuntimeError(
                f"could not download {url} ({e}); if this machine is offline, fetch it "
                f"elsewhere and place it at {local_path}"
            ) from e
    return local_path


def find_model(model_name: str, root: str = "pretrained_models"):
    """Published name -> download + load; anything else -> local path load with the
    train-format EMA unwrap (reference semantics, /root/reference/DiT/download.py:18-29)."""
    if model_name in PRETRAINED_MODELS:
        return _torch_load(download_model(model_name, root))
    if not os.path.isfile(model_name):
        raise FileNotFoundError(f"could not find DiT checkpoint at {model_name}")
    return _torch_load(model_name)


def main(argv=None):
    ap = argparse.ArgumentParser(description="download published DiT checkpoints")
    ap.add_argument("models", nargs="*", default=list(PRETRAINED_MODELS),
                    help=f"names to fetch (default: all of {PRETRAINED_MODELS})")
    ap.add_argument("--root", default="pretrained_models")
    args = ap.parse_args(argv)
    for name in (args.models or PRETRAINED_MODELS):
        print(download_model(name, args.root))
    print("Done.")


if __name__ == "__main__":
    main()
