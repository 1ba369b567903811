"""Published U^2-Net checkpoints (u2net.pth / u2netp.pth torch state_dict) -> models.u2net
trees. Naming follows the published u2net repo (REBNCONV holds conv_s1/bn_s1; stages are
stage1..stage6 and stage5d..stage1d; six side convs plus outconv)."""

from __future__ import annotations

import numpy as np


def _rebnconv(sd, used, base):
    for suffix in ("conv_s1.weight", "conv_s1.bias", "bn_s1.weight", "bn_s1.bias",
                   "bn_s1.running_mean", "bn_s1.running_var"):
        used.add(f"{base}.{suffix}")
    used.add(f"{base}.bn_s1.num_batches_tracked")  # torch bookkeeping, unused
    return {
        "conv": {
            "w": np.asarray(sd[f"{base}.conv_s1.weight"]).transpose(2, 3, 1, 0),
            "b": np.asarray(sd[f"{base}.conv_s1.bias"]),
        },
        "bn": {
            "scale": np.asarray(sd[f"{base}.bn_s1.weight"]),
            "bias": np.asarray(sd[f"{base}.bn_s1.bias"]),
            "mean": np.asarray(sd[f"{base}.bn_s1.running_mean"], np.float32),
            "var": np.asarray(sd[f"{base}.bn_s1.running_var"], np.float32),
        },
    }


def _rsu(sd, used, base, height):
    p = {"rebnconvin": _rebnconv(sd, used, f"{base}.rebnconvin")}
    names = (
        ["rebnconv1", "rebnconv2", "rebnconv3", "rebnconv4",
         "rebnconv3d", "rebnconv2d", "rebnconv1d"]
        if height == 0
        else [f"rebnconv{i}" for i in range(1, height + 1)]
        + [f"rebnconv{i}d" for i in range(height - 1, 0, -1)]
    )
    for n in names:
        p[n] = _rebnconv(sd, used, f"{base}.{n}")
    return p


def convert_u2net(sd: dict, cfg, strict: bool = True) -> dict:
    """cfg: models.u2net.U2NetConfig (u2netp() for the 4.7 MB lite checkpoint)."""
    used: set[str] = set()
    p: dict = {}
    for i, (h, *_rest) in enumerate(cfg.encoder, start=1):
        p[f"stage{i}"] = _rsu(sd, used, f"stage{i}", h)
    for i, (h, *_rest) in zip(range(5, 0, -1), cfg.decoder):
        p[f"stage{i}d"] = _rsu(sd, used, f"stage{i}d", h)
    for i in range(1, 7):
        p[f"side{i}"] = {
            "w": np.asarray(sd[f"side{i}.weight"]).transpose(2, 3, 1, 0),
            "b": np.asarray(sd[f"side{i}.bias"]),
        }
        used.update({f"side{i}.weight", f"side{i}.bias"})
    p["outconv"] = {
        "w": np.asarray(sd["outconv.weight"]).transpose(2, 3, 1, 0),
        "b": np.asarray(sd["outconv.bias"]),
    }
    used.update({"outconv.weight", "outconv.bias"})
    leftover = set(sd) - used
    if strict and leftover:
        raise ValueError(f"unconsumed u2net keys: {sorted(leftover)[:10]}")
    return p
