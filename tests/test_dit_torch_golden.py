"""DiT torch-golden forward parity: the converted checkpoint layout (patch-conv flatten
order, sincos position table, timestep-embedding orientation, adaLN chunk order, (p, q, c)
unpatchify) must reproduce an independent torch implementation of the published architecture
(tools/torch_dit.py) — the numerical converter evidence the structural tests can't give."""

import numpy as np
import pytest

from diffsim_tpu.convert import diffusion_import as DI
from diffsim_tpu.models import dit

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def pair():
    from tools.torch_dit import DiT

    cfg = dit.DiTConfig.tiny(input_size=8, learn_sigma=True, num_classes=10)
    torch.manual_seed(0)
    tm = DiT(input_size=cfg.input_size, patch=cfg.patch_size, in_channels=cfg.in_channels,
             hidden=cfg.hidden, depth=cfg.depth, heads=cfg.heads,
             num_classes=cfg.num_classes, learn_sigma=True, mlp_ratio=cfg.mlp_ratio).eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for t in tm.parameters():
            t.copy_(torch.randn(t.shape, generator=g) * 0.05)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = DI.convert_dit(sd, cfg, strict=True)
    return tm, sd, params, cfg


def test_dit_forward_golden(pair):
    import jax.numpy as jnp

    tm, _sd, params, cfg = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cfg.input_size, cfg.input_size, cfg.in_channels)).astype(np.float32)
    t = np.asarray([17.0, 940.0], np.float32)
    y = np.asarray([3, 10], np.int64)  # incl. the null class

    ours, _ = dit.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(y), cfg)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
             torch.from_numpy(y))
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4
    )


def test_dit_pos_embed_matches_published_formula(pair):
    """Our computed sincos table (used when a checkpoint omits pos_embed) equals the
    published get_2d_sincos_pos_embed — and therefore the checkpoint's own buffer."""
    import jax.numpy as jnp

    tm, sd, _params, cfg = pair
    ours = dit.pos_embed_2d(cfg.hidden, cfg.tokens_per_side)
    np.testing.assert_allclose(ours, sd["pos_embed"][0], rtol=1e-5, atol=1e-6)

    # converting WITHOUT the buffer falls back to the computed table: same forward
    sd2 = {k: v for k, v in sd.items() if k != "pos_embed"}
    params2 = DI.convert_dit(sd2, cfg, strict=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, cfg.input_size, cfg.input_size, cfg.in_channels)).astype(np.float32)
    out_ckpt, _ = dit.apply(
        DI.convert_dit(sd, cfg, strict=True), jnp.asarray(x),
        jnp.asarray([100.0]), jnp.asarray([1]), cfg,
    )
    out_fallback, _ = dit.apply(
        params2, jnp.asarray(x), jnp.asarray([100.0]), jnp.asarray([1]), cfg
    )
    np.testing.assert_allclose(np.asarray(out_ckpt), np.asarray(out_fallback),
                               rtol=1e-5, atol=1e-5)
