"""IP-Adapter path tests (tiny configs, CPU)."""

import jax
import numpy as np
import pytest

from diffsim_tpu.convert.torch_import import convert_ip_adapter
from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15
from diffsim_tpu.models import clip_text, clip_vision, ip_adapter as ipm, unet, vae


def test_attn2_site_order_counts():
    # SD-1.5: 6 down + 1 mid + 9 up cross-attention sites
    sites = ipm.attn2_site_order(unet.UNetConfig.sd15())
    assert len(sites) == 16
    assert sites[0] == ("down", 0, 0, 0) and sites[6] == ("mid", 0, 0, 0)
    # SDXL: down (2*2 + 2*10) + mid 10 + up (3*2 + 3*10) = 70
    assert len(ipm.attn2_site_order(unet.UNetConfig.sdxl())) == 70


def test_resampler_shapes():
    cfg = ipm.ResamplerConfig.tiny()
    p = ipm.resampler_init(jax.random.PRNGKey(0), cfg)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (3, 10, cfg.embedding_dim))
    out = ipm.resampler_apply(p, embeds, cfg)
    assert out.shape == (3, cfg.num_queries, cfg.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_image_projection_shapes():
    p = ipm.image_projection_init(jax.random.PRNGKey(0), image_embed_dim=16, cross_dim=8, num_tokens=4)
    out = ipm.image_projection_apply(p, jax.random.normal(jax.random.PRNGKey(1), (2, 16)))
    assert out.shape == (2, 4, 8)


def test_convert_ip_adapter_plus_layout():
    ucfg = unet.UNetConfig.tiny()
    sites = ipm.attn2_site_order(ucfg)
    rng = np.random.default_rng(0)
    dim, emb, nq, depth, inner = 16, 32, 4, 2, 16
    proj = {
        "latents": rng.standard_normal((1, nq, dim)).astype(np.float32),
        "proj_in.weight": rng.standard_normal((dim, emb)).astype(np.float32),
        "proj_in.bias": rng.standard_normal(dim).astype(np.float32),
        "proj_out.weight": rng.standard_normal((dim, dim)).astype(np.float32),
        "proj_out.bias": rng.standard_normal(dim).astype(np.float32),
        "norm_out.weight": np.ones(dim, np.float32),
        "norm_out.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        for nm in ("norm1", "norm2"):
            proj[f"layers.{i}.0.{nm}.weight"] = np.ones(dim, np.float32)
            proj[f"layers.{i}.0.{nm}.bias"] = np.zeros(dim, np.float32)
        proj[f"layers.{i}.0.to_q.weight"] = rng.standard_normal((inner, dim)).astype(np.float32)
        proj[f"layers.{i}.0.to_kv.weight"] = rng.standard_normal((2 * inner, dim)).astype(np.float32)
        proj[f"layers.{i}.0.to_out.weight"] = rng.standard_normal((dim, inner)).astype(np.float32)
        proj[f"layers.{i}.1.0.weight"] = np.ones(dim, np.float32)
        proj[f"layers.{i}.1.0.bias"] = np.zeros(dim, np.float32)
        proj[f"layers.{i}.1.1.weight"] = rng.standard_normal((dim * 2, dim)).astype(np.float32)
        proj[f"layers.{i}.1.3.weight"] = rng.standard_normal((dim, dim * 2)).astype(np.float32)
    ip = {}
    for s_i, (kind, bi, ai, ti) in enumerate(sites):
        hidden = 32 if kind == "down" and bi == 0 else 64
        # resolve channel like the model does
        n = len(ucfg.block_out_channels)
        di = (n - 1 - bi) if kind == "up" else bi
        hidden = ucfg.block_out_channels[di if kind != "mid" else -1]
        ip[f"{2 * s_i + 1}.to_k_ip.weight"] = rng.standard_normal((hidden, ucfg.cross_attention_dim)).astype(np.float32)
        ip[f"{2 * s_i + 1}.to_v_ip.weight"] = rng.standard_normal((hidden, ucfg.cross_attention_dim)).astype(np.float32)
    sd = {f"image_proj.{k}": v for k, v in proj.items()}
    sd.update({f"ip_adapter.{k}": v for k, v in ip.items()})

    out = convert_ip_adapter(sd, ucfg)
    assert out["plus"] is True
    assert len(out["ip_weights"]) == len(sites)
    assert len(out["image_proj"]["layers"]) == depth
    # weights are usable: insert into a unet tree and run with ip embeds
    params = unet.init(jax.random.PRNGKey(0), ucfg)
    ipm.insert_ip_into_unet(params, ucfg, out["ip_weights"])
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, ucfg.cross_attention_dim))
    ip_tokens = [jax.random.normal(jax.random.PRNGKey(3), (1, nq, ucfg.cross_attention_dim))]
    out1, _ = unet.apply(params, x, jnp.float32(1.0), ctx, ucfg, ip_embeds=ip_tokens, ip_scale=[0.5])
    out0, _ = unet.apply(params, x, jnp.float32(1.0), ctx, ucfg, ip_embeds=ip_tokens, ip_scale=[0.0])
    assert not np.allclose(np.asarray(out1), np.asarray(out0))


@pytest.fixture(scope="module")
def ip_scorer():
    sc = DiffSimSD15(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )
    sc.enable_ip_adapter(
        scale=0.5,
        encoder_cfg=clip_vision.CLIPVisionConfig.tiny(),
        resampler_cfg=ipm.ResamplerConfig.tiny(),
    )
    return sc


def test_ip_scorer_end_to_end(ip_scorer):
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    s = ip_scorer.score_batch(a, b, target_block="up_blocks", target_layer=(0,),
                              target_step=600, ip_adapter=True)
    assert s.shape == (2,)
    assert np.all(np.isfinite(s)) and np.all(np.abs(s) <= 1 + 1e-5)
    # deterministic
    s2 = ip_scorer.score_batch(a, b, target_block="up_blocks", target_layer=(0,),
                               target_step=600, ip_adapter=True)
    np.testing.assert_allclose(s, s2, atol=0)
    # mse path exercises the list-sum variant (reference quirk Q4 implemented correctly)
    s_mse = ip_scorer.score_batch(a, b, target_step=600, ip_adapter=True, similarity="mse")
    assert s_mse.shape == (2,) and np.all(s_mse >= 0)


def test_non_ip_scoring_still_works_after_enable(ip_scorer):
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    s = ip_scorer.score_batch(a, b, target_step=600, ip_adapter=False)
    assert s.shape == (1,) and np.isfinite(s[0])


@pytest.fixture(scope="module")
def xl_ip_scorer():
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

    sc = DiffSimXL(
        # cross_attention_dim 64 = the two tiny text towers' hidden (32) concatenated
        unet_cfg=unet.UNetConfig.tiny_xl(cross_attention_dim=64),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        # tower 2 is CLIPTextModelWithProjection: projection_dim makes it emit text_embeds
        text2_cfg=clip_text.CLIPTextConfig(
            vocab_size=1000, hidden=32, layers=2, heads=2, intermediate=64, projection_dim=16,
        ),
        img_size=32,
        dtype=np.float32,
    )
    import dataclasses as _dc

    sc.enable_ip_adapter(
        scale=0.5,
        encoder_cfg=clip_vision.CLIPVisionConfig.tiny(),
        # IP tokens must match the UNet cross dim (the published sdxl resampler outputs 2048)
        resampler_cfg=_dc.replace(ipm.ResamplerConfig.tiny(), output_dim=64),
    )
    return sc


def test_xl_ip_scorer_end_to_end(xl_ip_scorer):
    """SDXL IP-Adapter scoring (the reference's diffsim_xl ip_adapter=True path,
    /root/reference/diffsim/diffsim_xl.py:52-55,78-94): attn2 taps carry per-adapter
    ip_k/ip_v lists and the IP readout produces finite, deterministic scores that differ
    from the attn1 (non-IP) path."""
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    kw = dict(target_block="up_blocks", target_layer=(0, 0, 0), target_step=900)
    s_ip = xl_ip_scorer.score_batch(a, b, ip_adapter=True, **kw)
    assert s_ip.shape == (2,)
    assert np.all(np.isfinite(s_ip)) and np.all(np.abs(s_ip) <= 1 + 1e-5)
    np.testing.assert_allclose(
        s_ip, xl_ip_scorer.score_batch(a, b, ip_adapter=True, **kw), atol=0
    )
    # non-IP scoring still works on the ip-augmented params and differs
    s_plain = xl_ip_scorer.score_batch(a, b, **kw)
    assert not np.allclose(s_ip, s_plain)
    # mse exercises the list-sum variant (quirk Q4 implemented correctly)
    s_mse = xl_ip_scorer.score_batch(a, b, ip_adapter=True, similarity="mse", **kw)
    assert s_mse.shape == (2,) and np.all(s_mse >= 0)


def test_ip_embed_interleave_order():
    """The ip_embeds batch must interleave EXACTLY like x_in/ctx: per image [uncond, cond],
    images in pair order -> [a_u, a_c, b_u, b_c] (both scorers build it through this one
    helper, so a swapped uncond/cond or A/B order would corrupt every IP score)."""
    import jax.numpy as jnp

    from diffsim_tpu.metrics.scorer_base import ScorerBase

    P, T, D = 2, 3, 4
    # markers: cond[p, img] filled with 10*p + img + 1; uncond is all zeros
    cond = jnp.asarray(
        np.stack([[np.full((T, D), 10 * p + i + 1.0) for i in range(2)] for p in range(P)])
    )
    uncond = jnp.zeros((1, T, D))
    out = np.asarray(ScorerBase._interleave_ip_embeds(cond, uncond, True, jnp.float32))
    assert out.shape == (P * 4, T, D)
    # pair 0: [a_u, a_c, b_u, b_c] = [0, 1, 0, 2]; pair 1: [0, 11, 0, 12]
    np.testing.assert_array_equal(out[:, 0, 0], [0, 1, 0, 2, 0, 11, 0, 12])
    # cfg_parity off: cond only, same image order
    out2 = np.asarray(ScorerBase._interleave_ip_embeds(cond, uncond, False, jnp.float32))
    np.testing.assert_array_equal(out2[:, 0, 0], [1, 2, 11, 12])
