"""Golden parity tests vs HuggingFace transformers (random weights, tiny configs, CPU).

These validate the converter layouts and forward-math of our towers against the exact torch
implementations the reference uses (transformers CLIP / Dinov2)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffsim_tpu.convert import torch_import as TI
from diffsim_tpu.models import clip_text, clip_vision, dinov2


def test_clip_text_parity():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    hf_cfg = HFCfg(vocab_size=100, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77)
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    cfg = clip_text.CLIPTextConfig(vocab_size=100, hidden=32, layers=2, heads=2, intermediate=64)
    params = TI.convert_clip_text(TI.state_dict_numpy(model.text_model), cfg)

    ids = np.array([[49, 3, 7, 99, 0], [49, 5, 99, 0, 0]], np.int32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    ours = np.asarray(clip_text.apply(params, jnp.asarray(ids), cfg)["last_hidden_state"])
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=2, image_size=32, patch_size=8)
    torch.manual_seed(1)
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = clip_vision.CLIPVisionConfig(hidden=32, layers=2, heads=2, intermediate=64,
                                       patch=8, image_size=32, projection_dim=32)
    params = TI.convert_clip_vision(TI.state_dict_numpy(model.vision_model), cfg)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(pix).permute(0, 3, 1, 2))
    ours = clip_vision.apply(params, jnp.asarray(pix), cfg)
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["pooled"]), out.pooler_output.numpy(), rtol=1e-4, atol=1e-4
    )


def test_clip_vision_qkv_tap_matches_reference_hook():
    """The reference hook computes Q/K/V on the layer's RAW input (no layer_norm1) — verify our
    tap equals that exact computation on the torch side
    (/root/reference/metrics/hooks.py:3-17)."""
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=2, image_size=32, patch_size=8)
    torch.manual_seed(2)
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = clip_vision.CLIPVisionConfig(hidden=32, layers=2, heads=2, intermediate=64,
                                       patch=8, image_size=32, projection_dim=32)
    params = TI.convert_clip_vision(TI.state_dict_numpy(model.vision_model), cfg)

    stores = {}

    def hook(module, args, output):
        hidden = args[0]
        attn = module.self_attn
        bsz, tgt, emb = hidden.shape
        q = attn.q_proj(hidden).view(bsz, -1, 2, emb // 2).transpose(1, 2)
        k = attn.k_proj(hidden).view(bsz, -1, 2, emb // 2).transpose(1, 2)
        v = attn.v_proj(hidden).view(bsz, -1, 2, emb // 2).transpose(1, 2)
        stores["qkv"] = (q.detach().numpy(), k.detach().numpy(), v.detach().numpy())

    model.vision_model.encoder.layers[1].register_forward_hook(hook)
    rng = np.random.default_rng(3)
    pix = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        model(torch.from_numpy(pix).permute(0, 3, 1, 2))

    ours = clip_vision.apply(params, jnp.asarray(pix), cfg, tap_layer=1, capture="qkv")["taps"]
    for name, theirs in zip("qkv", stores["qkv"]):
        np.testing.assert_allclose(np.asarray(ours[name]), theirs, rtol=1e-4, atol=1e-4)


def test_dinov2_parity():
    from transformers import Dinov2Config as HFCfg, Dinov2Model

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=2, image_size=32, patch_size=8)
    torch.manual_seed(3)
    model = Dinov2Model(hf_cfg).eval()
    cfg = dinov2.DinoConfig(hidden=32, layers=2, heads=2, intermediate=64, patch=8, pos_grid=4)
    params = TI.convert_dinov2(TI.state_dict_numpy(model), cfg)

    rng = np.random.default_rng(4)
    pix = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(pix).permute(0, 3, 1, 2))
    ours = dinov2.apply(params, jnp.asarray(pix), cfg)
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["cls"]), out.last_hidden_state[:, 0].numpy(), rtol=1e-4, atol=1e-4
    )


def test_dinov2_pos_interpolation():
    """Stored 4x4 grid, 48x48 input (6x6 grid) -> bicubic interpolation path runs and shapes
    line up."""
    cfg = dinov2.DinoConfig.tiny()
    import jax

    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    pix = np.random.default_rng(0).standard_normal((1, 48, 48, 3)).astype(np.float32)
    out = dinov2.apply(params, jnp.asarray(pix), cfg)
    assert out["last_hidden_state"].shape == (1, 37, 32)  # 6*6 + 1 tokens


def test_clip_tokenizer_matches_hf(tmp_path):
    from transformers import CLIPTokenizer as HFTok

    from diffsim_tpu.core.tokenizer import CLIPTokenizer, bytes_to_unicode

    # minimal but complete CLIP-style vocab: every byte char and its </w> form + merges
    b2u = bytes_to_unicode()
    chars = sorted(set(b2u.values()))
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>"), ("o", "f</w>")]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    for s in ("<|startoftext|>", "<|endoftext|>"):
        vocab[s] = len(vocab)

    vj = tmp_path / "vocab.json"
    mt = tmp_path / "merges.txt"
    vj.write_text(json.dumps(vocab))
    mt.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")

    ours = CLIPTokenizer.from_files(str(vj), str(mt))
    theirs = HFTok(str(vj), str(mt))

    for text in ("the cat", "The Photo of a cat!", "thecat of the", ""):
        hf_ids = theirs(text, padding="max_length", max_length=77, truncation=True)["input_ids"]
        np.testing.assert_array_equal(ours([text])[0], np.asarray(hf_ids, np.int32), err_msg=text)


def test_clip_score_metric_shapes():
    from diffsim_tpu.metrics.clip_i import CLIPScore

    sc = CLIPScore(vision_cfg=clip_vision.CLIPVisionConfig.tiny(),
                   text_cfg=clip_text.CLIPTextConfig.tiny())
    rng = np.random.default_rng(0)
    pa = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    pb = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    s = sc.clipi_score_batch(pa, pb)
    assert s.shape == (3,)
    assert np.all(np.abs(s) <= 100.0 + 1e-3)
    s_self = sc.clipi_score_batch(pa, pa.copy())
    np.testing.assert_allclose(s_self, 100.0, atol=0.01)
    cross = sc.clip_cross_score_batch(pa, pb, [1])
    assert cross.shape == (3,)
    cross_self = sc.clip_cross_score_batch(pa, pa.copy(), [1])
    np.testing.assert_allclose(cross_self, 1.0, atol=1e-5)
    feats = sc.clip_feature_score_batch(pa, pb, [0])
    assert feats.shape == (3,)


def test_dino_score_metric_shapes():
    from diffsim_tpu.metrics.dino import Dinov2Score

    sc = Dinov2Score(cfg=dinov2.DinoConfig.tiny())
    rng = np.random.default_rng(1)
    pa = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    pb = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    assert sc.dino_score_batch(pa, pb).shape == (2,)
    np.testing.assert_allclose(sc.dino_score_batch(pa, pa.copy()), 100.0, atol=0.01)
    np.testing.assert_allclose(sc.dino_cross_score_batch(pa, pa.copy(), [1]), 1.0, atol=1e-5)
    assert sc.dino_feature_score_batch(pa, pb, [0]).shape == (2,)


def test_params_store_roundtrip(tmp_path):
    import jax

    from diffsim_tpu.convert import load_params, save_params

    params = dinov2.init(jax.random.PRNGKey(0), dinov2.DinoConfig.tiny())
    path = str(tmp_path / "p.npz")
    save_params(path, params)
    loaded = load_params(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dino_v1_torch_golden():
    """convert_dino_v1 + models.dinov2.apply vs a hand-built torch DINO-v1 ViT (timm layout:
    fused qkv, pre-LN, no layerscale — /root/reference/metrics/dino.py:38-92 loads this
    architecture from torch.hub). timm/hub are absent in this image, so the mirror is built
    here with the published parameter naming the converter consumes."""
    import torch.nn as nn
    import torch.nn.functional as F

    H, HEADS, LAYERS, PATCH, GRID = 32, 2, 2, 8, 4  # input 32x32 -> 4x4 grid == pos grid

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(H, eps=1e-6)
            self.attn = nn.Module()
            self.attn.qkv = nn.Linear(H, 3 * H)
            self.attn.proj = nn.Linear(H, H)
            self.norm2 = nn.LayerNorm(H, eps=1e-6)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(H, 2 * H)
            self.mlp.fc2 = nn.Linear(2 * H, H)

        def forward(self, x):
            b, n, _ = x.shape
            qkv = self.attn.qkv(self.norm1(x)).reshape(b, n, 3, HEADS, H // HEADS)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            ctx = F.scaled_dot_product_attention(q, k, v)
            x = x + self.attn.proj(ctx.transpose(1, 2).reshape(b, n, H))
            return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))

    class Vit(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv2d(3, H, PATCH, stride=PATCH)
            self.cls_token = nn.Parameter(torch.randn(1, 1, H) * 0.02)
            self.pos_embed = nn.Parameter(torch.randn(1, GRID * GRID + 1, H) * 0.02)
            self.blocks = nn.ModuleList([Block() for _ in range(LAYERS)])
            self.norm = nn.LayerNorm(H, eps=1e-6)

        def forward(self, x):
            b = x.shape[0]
            p = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls_token.expand(b, -1, -1), p], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)

    torch.manual_seed(0)
    vit = Vit().eval()
    sd = {k: v.detach().numpy() for k, v in vit.state_dict().items()}
    cfg = dinov2.DinoConfig(hidden=H, layers=LAYERS, heads=HEADS, intermediate=2 * H,
                            patch=PATCH, pos_grid=GRID, layerscale=False)
    params = TI.convert_dino_v1(sd, cfg)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = vit(torch.from_numpy(pix.transpose(0, 3, 1, 2))).numpy()
    out = dinov2.apply(params, jnp.asarray(pix), cfg, tap_layer=1)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), theirs, rtol=1e-4, atol=1e-4)
    # taps carry real attention inputs: (B, heads, tokens, head_dim)
    assert out["taps"]["q"].shape == (2, HEADS, GRID * GRID + 1, H // HEADS)


def test_sdxl_dual_tower_prompt_encoding_vs_hf():
    """The XL prompt-encoding path against REAL HF CLIP text towers: penultimate-hidden
    concat of both towers + tower-2's projected pooled EOS embedding, with the uncond rows
    force-zeroed (SDXL base's force_zeros_for_empty_prompt —
    /root/reference/diffsim/diffsim_xl_pipeline.py:173-192)."""
    import jax
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel, CLIPTextModelWithProjection

    from diffsim_tpu.core.tokenizer import HashTokenizer
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL
    from diffsim_tpu.models import unet as unet_mod, vae as vae_mod

    torch.manual_seed(1)
    # eos=99 == HashTokenizer(100)'s EOS/pad id, so HF's eos-position pooling and our
    # argmax pooling select the same token
    hf1 = CLIPTextModel(HFCfg(vocab_size=100, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              max_position_embeddings=77, eos_token_id=99,
                              bos_token_id=98, pad_token_id=99)).eval()
    hf2 = CLIPTextModelWithProjection(
        HFCfg(vocab_size=100, hidden_size=48, intermediate_size=96, num_hidden_layers=3,
              num_attention_heads=2, max_position_embeddings=77, projection_dim=16,
              eos_token_id=99, bos_token_id=98, pad_token_id=99)).eval()
    cfg1 = clip_text.CLIPTextConfig(vocab_size=100, hidden=32, layers=2, heads=2, intermediate=64)
    cfg2 = clip_text.CLIPTextConfig(vocab_size=100, hidden=48, layers=3, heads=2,
                                    intermediate=96, projection_dim=16)
    p1 = TI.convert_clip_text(TI.state_dict_numpy(hf1.text_model), cfg1)
    p2 = TI.convert_clip_text(TI.state_dict_numpy(hf2), cfg2)

    tok = HashTokenizer(100)
    scorer = DiffSimXL(
        params={
            "unet": unet_mod.init(jax.random.PRNGKey(0),
                                  unet_mod.UNetConfig.tiny_xl(cross_attention_dim=80),
                                  np.float32),
            "vae": vae_mod.encoder_init(jax.random.PRNGKey(1), vae_mod.VAEConfig.tiny(),
                                        np.float32),
            "text": p1,
            "text2": p2,
        },
        unet_cfg=unet_mod.UNetConfig.tiny_xl(cross_attention_dim=80),
        vae_cfg=vae_mod.VAEConfig.tiny(),
        text_cfg=cfg1, text2_cfg=cfg2, img_size=32, dtype=np.float32,
        tokenizer=tok, tokenizer2=tok,
    )
    prompt = "The photo of a golden cat"
    embeds, pooled = scorer.encode_prompt(prompt)

    ids = torch.from_numpy(tok([prompt]).astype(np.int64))
    with torch.no_grad():
        o1 = hf1(ids, output_hidden_states=True)
        o2 = hf2(ids, output_hidden_states=True)
    want_embeds = np.concatenate(
        [o1.hidden_states[-2].numpy(), o2.hidden_states[-2].numpy()], axis=-1
    )
    want_pooled = o2.text_embeds.numpy()

    assert embeds.shape == (2, 77, 32 + 48) and pooled.shape == (2, 16)
    # uncond rows force-zeroed
    assert not embeds[0].any() and not pooled[0].any()
    np.testing.assert_allclose(embeds[1], want_embeds[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pooled[1], want_pooled[0], rtol=1e-4, atol=1e-4)


def test_tokenizer_with_pad_token_shares_tables(tmp_path):
    """SDXL tokenizer-2 view: same parsed tables, different pad id (no asset re-parse)."""
    import json as _json

    from diffsim_tpu.core.tokenizer import CLIPTokenizer, bytes_to_unicode

    chars = sorted(set(bytes_to_unicode().values()))
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for s in ("<|startoftext|>", "<|endoftext|>"):
        vocab[s] = len(vocab)
    vj, mt = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vj.write_text(_json.dumps(vocab))
    mt.write_text("#version: 0.2\n")
    tok = CLIPTokenizer.from_files(str(vj), str(mt))
    tok2 = tok.with_pad_token("!")
    assert tok2.encoder is tok.encoder and tok2.bpe_ranks is tok.bpe_ranks
    assert tok2.pad_id == vocab["!"] and tok.pad_id == tok.eos_id
    ids2 = tok2(["a"])[0]
    assert ids2[0] == tok.bos_id and (ids2[3:] == vocab["!"]).all()
    # a missing pad token must FAIL, not silently fall back to EOS (which would restore the
    # non-parity SDXL tokenizer-2 padding)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pad token"):
        tok.with_pad_token("<|not-in-vocab|>")


def test_xl_scorer_derives_bang_padded_tokenizer2(tmp_path):
    """Library users constructing DiffSimXL with only ``tokenizer`` get the "!"-padded
    tokenizer-2 view automatically (previously only the CLI registry applied it)."""
    import json as _json

    from diffsim_tpu.core.tokenizer import CLIPTokenizer, bytes_to_unicode
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

    chars = sorted(set(bytes_to_unicode().values()))
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for s in ("<|startoftext|>", "<|endoftext|>"):
        vocab[s] = len(vocab)
    vj, mt = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vj.write_text(_json.dumps(vocab))
    mt.write_text("#version: 0.2\n")
    tok = CLIPTokenizer.from_files(str(vj), str(mt))
    import numpy as _np

    from diffsim_tpu.models import clip_text as _ct, unet as _unet, vae as _vae

    scorer = DiffSimXL(
        unet_cfg=_unet.UNetConfig.tiny_xl(cross_attention_dim=64),
        vae_cfg=_vae.VAEConfig.tiny(),
        text_cfg=_ct.CLIPTextConfig.tiny(),
        text2_cfg=_ct.CLIPTextConfig(
            vocab_size=1000, hidden=32, layers=2, heads=2, intermediate=64, projection_dim=16
        ),
        img_size=32,
        dtype=_np.float32,
        tokenizer=tok,
    )
    assert scorer.tokenizer2.pad_id == vocab["!"]
    assert scorer.tokenizer.pad_id == tok.eos_id
