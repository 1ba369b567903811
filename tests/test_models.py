import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.models import clip_text, dit, unet, vae
from diffsim_tpu.ops.taps import QKV, TapSpec


def test_vae_encoder_shapes():
    cfg = vae.VAEConfig.tiny()
    p = vae.encoder_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    moments = vae.encoder_apply(p, x)
    assert moments.shape == (2, 16, 16, 8)
    z = vae.sample_latents(moments, jax.random.PRNGKey(2), cfg.scaling_factor)
    assert z.shape == (2, 16, 16, 4)


def test_vae_roundtrip_shapes():
    cfg = vae.VAEConfig.tiny()
    ep = vae.encoder_init(jax.random.PRNGKey(0), cfg)
    dp = vae.decoder_init(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    z = vae.sample_latents(vae.encoder_apply(ep, x), jax.random.PRNGKey(3), cfg.scaling_factor)
    y = vae.decoder_apply(dp, z / cfg.scaling_factor, cfg)
    assert y.shape == (1, 32, 32, 3)


def test_clip_text_causal():
    cfg = clip_text.CLIPTextConfig.tiny()
    p = clip_text.init(jax.random.PRNGKey(0), cfg)
    ids1 = jnp.asarray([[1, 2, 3, 4, 5]])
    ids2 = jnp.asarray([[1, 2, 3, 9, 9]])  # change only later tokens
    h1 = clip_text.apply(p, ids1, cfg)["last_hidden_state"]
    h2 = clip_text.apply(p, ids2, cfg)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(h1[:, :3]), np.asarray(h2[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(h1[:, 3:]), np.asarray(h2[:, 3:]))


def test_clip_text_projection_tower():
    cfg = clip_text.CLIPTextConfig.tiny()
    cfg = clip_text.CLIPTextConfig(**{**cfg.__dict__, "projection_dim": 24})
    p = clip_text.init(jax.random.PRNGKey(0), cfg)
    out = clip_text.apply(p, jnp.asarray([[5, 3, 999]]), cfg, output_hidden_states=True)
    assert out["text_embeds"].shape == (1, 24)
    assert len(out["hidden_states"]) == cfg.layers + 1
    # pooled comes from the argmax(ids) position (=999 here, index 2)
    np.testing.assert_allclose(np.asarray(out["pooled"]), np.asarray(out["last_hidden_state"][:, 2]))


def _unet_setup(cfg):
    p = unet.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, cfg.cross_attention_dim))
    return p, x, ctx


def test_unet_sd15_tiny_forward_and_taps():
    cfg = unet.UNetConfig.tiny()
    p, x, ctx = _unet_setup(cfg)
    out, taps = unet.apply(p, x, jnp.float32(401.0), ctx, cfg)
    assert out.shape == x.shape
    assert taps == {}
    for spec, seq in [
        (TapSpec("down", (0, -1, -1), "attn1", QKV), 16 * 16),
        (TapSpec("mid", (0, -1, -1), "attn1", QKV), 8 * 8),
        (TapSpec("up", (1, -1, -1), "attn1", QKV), 16 * 16),
    ]:
        out2, taps = unet.apply(p, x, jnp.float32(401.0), ctx, cfg, tap=spec)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
        assert set(taps) == {"q", "k", "v"}
        assert taps["q"].shape == (2, cfg.heads[0], seq, 32 // cfg.heads[0]) or taps["q"].shape[2] == seq


def test_unet_cross_attention_tap():
    cfg = unet.UNetConfig.tiny()
    p, x, ctx = _unet_setup(cfg)
    spec = TapSpec("mid", (0, -1, -1), "attn2", QKV)
    _, taps = unet.apply(p, x, jnp.float32(1.0), ctx, cfg, tap=spec)
    # cross-attention K/V come from the 7-token context
    assert taps["k"].shape[2] == 7
    assert taps["q"].shape[2] == 8 * 8


def test_unet_sdxl_tiny_forward():
    cfg = unet.UNetConfig.tiny_xl()
    p = unet.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, cfg.cross_attention_dim))
    added = {
        "text_embeds": jax.random.normal(jax.random.PRNGKey(3), (2, 16)),
        "time_ids": jnp.tile(jnp.asarray([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]]), (2, 1)),
    }
    out, taps = unet.apply(
        p, x, jnp.float32(100.0), ctx, cfg, added_cond=added,
        tap=TapSpec("down", (1, 0, 1), "attn1", QKV),
    )
    assert out.shape == x.shape
    assert set(taps) == {"q", "k", "v"}
    assert taps["q"].shape[2] == 8 * 8  # down block 1 runs at 8x8


def test_unet_tap_tblock_addressing():
    """With depth-2 transformers, tblock -1 and 1 address the same site; 0 differs."""
    cfg = unet.UNetConfig.tiny_xl()
    p = unet.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.cross_attention_dim))
    added = {
        "text_embeds": jnp.zeros((1, 16)),
        "time_ids": jnp.zeros((1, 6)),
    }
    def q_at(tb):
        _, taps = unet.apply(p, x, jnp.float32(1.0), ctx, cfg, added_cond=added,
                             tap=TapSpec("mid", (0, 0, tb), "attn1", QKV))
        return np.asarray(taps["q"])
    np.testing.assert_allclose(q_at(-1), q_at(1))
    assert not np.allclose(q_at(0), q_at(1))


def test_dit_tiny_forward_and_tap():
    cfg = dit.DiTConfig.tiny()
    p = dit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.asarray([667.0, 667.0])
    y = jnp.asarray([1, cfg.num_classes])  # cond + null class, the scorer's layout
    out, taps = dit.apply(p, x, t, y, cfg, tap=TapSpec("blocks", (1,), "attn1", QKV))
    assert out.shape == (2, 8, 8, 4)
    n_tokens = (8 // cfg.patch_size) ** 2
    assert taps["q"].shape == (2, cfg.heads, n_tokens, cfg.hidden // cfg.heads)


def test_dit_learn_sigma_channels():
    cfg = dit.DiTConfig.tiny(learn_sigma=True)
    p = dit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    out, _ = dit.apply(p, x, jnp.asarray([10.0]), jnp.asarray([0]), cfg)
    assert out.shape == (1, 8, 8, 8)


def test_dit_forward_with_cfg():
    cfg = dit.DiTConfig.tiny(in_channels=4, learn_sigma=True)
    p = dit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    out = dit.forward_with_cfg(p, x, jnp.full((4,), 10.0), jnp.asarray([1, 2, 10, 10]), cfg, 4.0)
    assert out.shape == (4, 8, 8, 8)
    # guided eps halves must be identical (reference forward_with_cfg semantics)
    np.testing.assert_allclose(np.asarray(out[:2, ..., :3]), np.asarray(out[2:, ..., :3]), atol=1e-6)


def test_dit_pos_embed_nonconstant():
    pe = dit.pos_embed_2d(16, 4)
    assert pe.shape == (16, 16)
    assert np.std(pe) > 0.1
