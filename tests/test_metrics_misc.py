"""Tests for the long-tail metrics: vgg_gram, lpips, ffa, diffeats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from diffsim_tpu.convert import torch_import as TI
from diffsim_tpu.models import vgg


def _torchvision_style_vgg(cfg):
    """Rebuild torchvision's make_layers Sequential so we can golden-test without
    torchvision installed."""
    layers = []
    cin = 3
    for item in cfg:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, item, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = item
    return nn.Sequential(*layers)


TINY_CFG = [8, "M", 16, "M"]


def test_vgg_features_parity_with_torch():
    torch.manual_seed(0)
    model = _torchvision_style_vgg(TINY_CFG).eval()
    params = TI.convert_vgg_features(TI.state_dict_numpy(model), TINY_CFG)
    x = np.random.default_rng(0).standard_normal((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        # capture after module idx 3 (= conv2 output, pre-relu) and final
        ref_tap = None
        h = xt
        for i, m in enumerate(model):
            h = m(h)
            if i == 3:
                ref_tap = h.clone()
        final = h
    ours_final, taps = vgg.features(params, jnp.asarray(x), TINY_CFG, taps=(3,))
    # taps early-exit: final is None when all taps collected before the end
    assert ours_final is None
    np.testing.assert_allclose(
        np.asarray(taps[3]), ref_tap.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )
    ours_final, _ = vgg.features(params, jnp.asarray(x), TINY_CFG)
    np.testing.assert_allclose(
        np.asarray(ours_final), final.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_vgg19_tap_indices():
    """conv5_1 must be torchvision index 28 for VGG19; LPIPS relu taps for VGG16."""
    idx = 0
    conv_count = 0
    conv5_1_idx = None
    for item in vgg.VGG19_CFG:
        if item == "M":
            idx += 1
        else:
            conv_count += 1
            if conv_count == 13:  # conv5_1 is the 13th conv in VGG19
                conv5_1_idx = idx
            idx += 2
    assert conv5_1_idx == vgg.VGG19_CONV5_1 == 28


def test_vgg_gram_metric():
    from diffsim_tpu.metrics.vgg_gram import VGGGram

    g2 = VGGGram(init_seed=0)
    rng = np.random.default_rng(0)
    pa = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    pb = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    s = g2.score_batch(pa, pb)
    assert s.shape == (2,)
    np.testing.assert_allclose(g2.score_batch(pa, pa.copy()), 1.0, atol=1e-4)
    # ragged list input (aspect-ratio-preserving preprocessing)
    s_list = g2.score_batch([pa[0], pb[0][:48]], [pa[1], pb[1][:48]])
    assert s_list.shape == (2,)


def test_lpips_metric():
    from diffsim_tpu.metrics.lpips import LPIPS

    m = LPIPS()
    rng = np.random.default_rng(1)
    pa = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    pb = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    d_same = m.score_batch(pa, pa.copy())
    d_diff = m.score_batch(pa, pb)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert np.all(d_diff > 0)


def test_lpips_converter():
    sd = {f"lin{i}.model.1.weight": np.abs(np.random.default_rng(i).standard_normal((1, c, 1, 1))).astype(np.float32)
          for i, c in enumerate((64, 128, 256, 512, 512))}
    p = TI.convert_lpips(sd, vgg.VGG16_CFG)
    assert len(p["lins"]) == 5
    assert p["lins"][2]["w"].shape == (256,)


def test_ffa_metric():
    from diffsim_tpu.metrics.ffa import ForegroundFeatureAveraging, heuristic_matting
    from diffsim_tpu.models.dinov2 import DinoConfig
    from PIL import Image

    # tiny DINOv2 cfg with patch 14 so 336 -> 24x24 grid holds
    cfg = DinoConfig(hidden=32, layers=2, heads=2, intermediate=64, patch=14, pos_grid=4)
    ffa = ForegroundFeatureAveraging(cfg=cfg)

    rng = np.random.default_rng(0)
    arr = np.zeros((100, 100, 3), np.uint8)
    arr[30:70, 30:70] = rng.integers(100, 255, (40, 40, 3), dtype=np.uint8)  # object on black bg
    img = Image.fromarray(arr)
    matted = heuristic_matting(img)
    assert matted.mode == "RGBA"
    alpha = np.asarray(matted)[..., 3]
    assert alpha[:10, :10].mean() < alpha[40:60, 40:60].mean()  # border = background

    rgba = ffa.preprocess(img)
    assert rgba.shape == (1, 336, 336, 4)
    score = ffa.score_batch("Crop-Feat", rgba, rgba.copy())
    np.testing.assert_allclose(score, 1.0, atol=1e-4)
    # reference-shaped call
    val = ffa("Crop-Feat", [img], [img.rotate(90)])
    assert -1.0 <= val <= 1.0


def test_diffeats_scorer():
    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15
    from diffsim_tpu.models import clip_text, unet, vae

    sc = DiffSimSD15(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
        vae_mode=True,
    )
    rng = np.random.default_rng(2)
    pa = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    pb = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    s = sc.score_feats_batch(pa, pb, target_layer=[0], target_step=600)
    assert s.shape == (2,)
    assert np.all(np.isfinite(s))
    # diffeats unwraps target_layer correctly (no collapse-to-0 bug): layer [1] != layer [0]
    s0 = sc.score_feats_batch(pa, pb, target_block="down_blocks", target_layer=[0], target_step=600)
    s_up = sc.score_feats_batch(pa, pb, target_block="up_blocks", target_layer=[0], target_step=600)
    assert not np.allclose(s0, s_up)


def test_attention_heatmap(tmp_path):
    from diffsim_tpu.runtime.viz import attention_heatmap

    tap = np.random.default_rng(0).standard_normal((2, 4, 64, 8)).astype(np.float32)
    out = str(tmp_path / "heat.png")
    heat = attention_heatmap(tap, out)
    assert heat.shape == (8, 8)
    assert abs(heat.sum() - 1.0) < 1e-5
    import os

    assert os.path.exists(out)
