"""Real-width numerical goldens (always run): SD-1.5 blocks at production channel widths,
compared in bf16-as-deployed.

The committed tiny fixtures (test_torch_parity_tiny.py) prove converter layouts and op
semantics, but tiny dims cannot surface the bf16/eps/accumulation effects that appear at
real widths (320/640/1280 channels, up to 4096 attention tokens). These tests build ONE
resnet + spatial-transformer block per width with seeded torch weights, push the state_dict
through the real converter, run our block stack in bfloat16 exactly as deployed, and compare
against the torch fp32 ground truth with a tolerance CALIBRATED from torch's own bf16
deviation — if our bf16 numerics drifted beyond what bf16 itself costs torch, we fail.

Sites follow the scored path (/root/reference/diffsim/diffsim.py:122-157): the 4096-token
down_blocks[0] geometry and the canonical up_blocks-tap geometry at 1280 channels.
"""

import numpy as np
import pytest
import torch

from diffsim_tpu.convert.diffusion_import import _SD, _resnet, _spatial_transformer
from tools.torch_mirror import ResnetBlock2D, Transformer2D

TED = 1280  # SD-1.5 time-embedding dim
CTX = 768  # SD-1.5 cross-attention dim

# (channels, spatial side, heads): down_blocks[0] @512px = 64x64 = 4096 tokens;
# down_blocks[1]; the canonical up-tap site at 1280 channels
SITES = [(320, 64, 8), (640, 32, 8), (1280, 16, 8)]


def _to_bf16_tree(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_bf16_tree(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_bf16_tree(v) for v in tree]
    return jnp.asarray(np.asarray(tree), jnp.bfloat16)


@pytest.mark.parametrize("ch,side,heads", SITES)
def test_realwidth_block_bf16_golden(ch, side, heads):
    import jax.numpy as jnp

    from diffsim_tpu.ops import blocks as B
    from diffsim_tpu.ops.taps import QKV

    torch.manual_seed(ch)
    res = ResnetBlock2D(ch, ch, TED).eval()
    tr = Transformer2D(ch, heads, CTX).eval()
    # capture the fp32 state_dict in diffusers naming BEFORE any casting
    sd = {}
    for k, v in res.state_dict().items():
        sd[f"resnets.0.{k}"] = v.numpy()
    for k, v in tr.state_dict().items():
        sd[f"attentions.0.{k}"] = v.numpy()

    rng = np.random.default_rng(ch)
    x = (rng.standard_normal((1, ch, side, side)) * 0.5).astype(np.float32)
    temb = rng.standard_normal((1, TED)).astype(np.float32)
    ctx = rng.standard_normal((1, 77, CTX)).astype(np.float32)

    with torch.no_grad():
        h32 = res(torch.from_numpy(x), torch.from_numpy(temb))
        out32 = tr(h32, torch.from_numpy(ctx)).numpy()
        tap32 = [t.float().numpy() for t in tr.transformer_blocks[-1].attn1.last_qkv]
        # torch's own bf16 run calibrates the tolerance envelope
        res16, tr16 = res.to(torch.bfloat16), tr.to(torch.bfloat16)
        h16 = res16(torch.from_numpy(x).to(torch.bfloat16),
                    torch.from_numpy(temb).to(torch.bfloat16))
        out16 = tr16(h16, torch.from_numpy(ctx).to(torch.bfloat16)).float().numpy()
        tap16 = [t.float().numpy() for t in tr16.transformer_blocks[-1].attn1.last_qkv]

    s = _SD(sd)
    rp = _to_bf16_tree(_resnet(s, "resnets.0"))
    tp = _to_bf16_tree(_spatial_transformer(s, "attentions.0", linear_proj=False))
    s.finish(strict=True)  # every real-width tensor consumed by the converter

    xh = jnp.asarray(x.transpose(0, 2, 3, 1), jnp.bfloat16)
    h = B.resnet_block(rp, xh, jnp.asarray(temb, jnp.bfloat16), eps=1e-5)
    ours, taps = B.spatial_transformer(
        tp, h, jnp.asarray(ctx, jnp.bfloat16), heads=heads,
        tap={"tblock": -1, "attn": "attn1", "capture": QKV},
    )
    ours = np.asarray(ours, np.float32).transpose(0, 3, 1, 2)

    # envelope: the max deviation bf16 costs torch itself, padded 2x for independent
    # rounding paths (XLA fuses differently than eager torch); guard against a degenerate
    # (all-fp32) envelope
    env = float(np.abs(out16 - out32).max())
    assert env > 0, "torch bf16 path did not actually run in bf16"
    err = float(np.abs(ours - out32).max())
    assert err <= 2.0 * env, (ch, err, env)

    for name, t32, t16, t_ours in zip("qkv", tap32, tap16, [taps["q"], taps["k"], taps["v"]]):
        t_ours = np.asarray(t_ours, np.float32)
        tap_env = float(np.abs(t16 - t32).max())
        tap_err = float(np.abs(t_ours - t32).max())
        assert tap_err <= 2.0 * tap_env, (ch, name, tap_err, tap_env)
