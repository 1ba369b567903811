"""SAM: torch-golden forward parity (tiny config, live torch mirror), converter strict
accounting at the published vit_b scale, and the mask-generation surface used by --use_mask."""

import numpy as np
import pytest

from diffsim_tpu.convert.sam_import import convert_sam
from diffsim_tpu.models import sam

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_pair():
    """(torch Sam, converted JAX params, cfg) at tiny scale with shared random weights."""
    import sys

    sys.path.insert(0, "tools")
    from tools.torch_sam import Sam

    cfg = sam.SamConfig.tiny()
    torch.manual_seed(0)
    tm = Sam(
        image_size=cfg.image_size, patch=cfg.patch, encoder_dim=cfg.encoder_dim,
        encoder_depth=cfg.encoder_depth, encoder_heads=cfg.encoder_heads,
        global_attn=cfg.global_attn, window=cfg.window, prompt_dim=cfg.prompt_dim,
        decoder_heads=cfg.decoder_heads, decoder_depth=cfg.decoder_depth,
        decoder_mlp=cfg.decoder_mlp,
    ).eval()
    # randomize every parameter AND buffer (embeddings/rel_pos init to zeros otherwise)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for t in list(tm.parameters()) + list(tm.buffers()):
            t.copy_(torch.randn(t.shape, generator=g) * 0.05)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_sam(sd, cfg, strict=True)
    return tm, params, cfg


def test_sam_encoder_golden(tiny_pair):
    import jax.numpy as jnp

    tm, params, cfg = tiny_pair
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = np.asarray(sam.encoder_apply(params["image_encoder"], jnp.asarray(pix), cfg))
    with torch.no_grad():
        ref = tm.image_encoder(torch.from_numpy(pix.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4)


def test_sam_predict_golden(tiny_pair):
    """Full predict (encoder -> prompts -> two-way decoder -> upscaled mask logits + IoU)
    matches the torch mirror end to end."""
    import jax.numpy as jnp

    tm, params, cfg = tiny_pair
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    coords = np.asarray([[[10.0, 20.0], [5.0, 7.0]]], np.float32)
    labels = np.asarray([[1, 0]], np.int32)

    ours_masks, ours_iou = sam.predict(
        params, cfg, jnp.asarray(pix), jnp.asarray(coords), jnp.asarray(labels)
    )
    with torch.no_grad():
        ref_masks, ref_iou = tm.predict(
            torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            torch.from_numpy(coords), torch.from_numpy(labels.astype(np.int64)),
        )
    np.testing.assert_allclose(np.asarray(ours_iou), ref_iou.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_masks), ref_masks.numpy(), rtol=2e-3, atol=2e-3)


def test_sam_converter_structural_vit_b_fullscale(tiny_pair):
    """Strict key accounting over the full published sam_vit_b layout (zeros-backed)."""
    import sys

    from tools.torch_sam import Sam

    cfg = sam.SamConfig.vit_b()
    tm = Sam(
        image_size=cfg.image_size, patch=cfg.patch, encoder_dim=cfg.encoder_dim,
        encoder_depth=cfg.encoder_depth, encoder_heads=cfg.encoder_heads,
        global_attn=cfg.global_attn, window=cfg.window, prompt_dim=cfg.prompt_dim,
        decoder_heads=cfg.decoder_heads, decoder_depth=cfg.decoder_depth,
        decoder_mlp=cfg.decoder_mlp,
    )
    sd = {k: np.zeros(tuple(v.shape), np.float32) for k, v in tm.state_dict().items()}
    params = convert_sam(sd, cfg, strict=True)
    assert len(params["image_encoder"]["blocks"]) == 12
    assert params["image_encoder"]["pos_embed"].shape == (64, 64, 768)
    # windowed blocks store (2*14-1) rel-pos tables, global blocks (2*64-1)
    assert params["image_encoder"]["blocks"][0]["attn"]["rel_pos_h"].shape == (27, 64)
    assert params["image_encoder"]["blocks"][2]["attn"]["rel_pos_h"].shape == (127, 64)
    assert params["mask_decoder"]["upscale"]["convt1"]["w"].shape == (2, 2, 256, 64)
    # a converted tree carries enough structure to recover its variant (CLI --sam_weights)
    from diffsim_tpu.metrics.sam_masking import infer_config

    assert infer_config(params) == cfg


def test_sam_masking_surface(tiny_pair):
    """SamMasking: PIL image -> RGBA matte via a center-point prompt — the score-time mask
    generator the reference's --use_mask help describes (argprocess.py:16)."""
    from PIL import Image

    from diffsim_tpu.core.image import mask_from_matting
    from diffsim_tpu.metrics.sam_masking import SamMasking

    _tm, params, cfg = tiny_pair
    masking = SamMasking(params, cfg)
    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (40, 48, 3), np.uint8))
    rgba = masking(img)
    assert rgba.mode == "RGBA" and rgba.size == img.size
    m = mask_from_matting(masking, img, 32)
    assert m.shape == (1, 32, 32)
    assert set(np.unique(m)).issubset({0.0, 1.0})


def test_sam_rel_pos_interpolation_matches_torch():
    """_get_rel_pos with a stored table of the wrong length linearly resizes it (SAM loads
    1024-trained tables at other resolutions); must match the published torch interpolation
    semantics (F.interpolate mode='linear', half-pixel centers)."""
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, "tools")
    from tools.torch_sam import get_rel_pos

    from diffsim_tpu.models.sam import _get_rel_pos

    rng = np.random.default_rng(11)
    table = rng.standard_normal((7, 8)).astype(np.float32)  # stored for size 4
    size = 5  # needs max_rel 9 -> resize 7 -> 9
    ours = np.asarray(_get_rel_pos(size, jnp.asarray(table)))
    ref = get_rel_pos(size, size, torch.from_numpy(table)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
