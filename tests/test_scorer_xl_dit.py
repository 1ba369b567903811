"""SDXL and DiT scorer tests (tiny configs, CPU)."""

import numpy as np
import pytest

from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT
from diffsim_tpu.metrics.diffsim_xl import DiffSimXL, sdxl_tap
from diffsim_tpu.models import clip_text, dit, unet, vae


def _pix(seed, n=1, size=32):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij")
    out = np.stack(
        [
            np.stack(
                [np.sin(rng.uniform(1, 4) * 6.28 * (xx + yy) + rng.uniform(0, 6)) for _ in range(3)],
                axis=-1,
            )
            for _ in range(n)
        ]
    ).astype(np.float32)
    return np.clip(out, -1, 1)


def test_sdxl_tap_addressing():
    assert sdxl_tap("down_blocks", [0, 1, 2]).address == (1, 1, 2)  # down_blocks[1:][0] -> abs 1
    assert sdxl_tap("up_blocks", [1, 0, 3]).address == (1, 0, 3)  # up_blocks[:-1][1] -> abs 1
    assert sdxl_tap("mid_blocks", [0, 5]).block == "mid"
    with pytest.raises(ValueError):
        sdxl_tap("down_blocks", [1])


@pytest.fixture(scope="module")
def xl_scorer():
    return DiffSimXL(
        # cross-attention width = concat of both text towers (32 + 32)
        unet_cfg=unet.UNetConfig.tiny_xl(cross_attention_dim=64),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        text2_cfg=clip_text.CLIPTextConfig(
            vocab_size=1000, hidden=32, layers=2, heads=2, intermediate=64, projection_dim=16
        ),
        img_size=32,
        dtype=np.float32,
    )


def test_xl_score_batch(xl_scorer):
    a, b = _pix(0, 2), _pix(1, 2)
    s = xl_scorer.score_batch(a, b, prompt="a style", target_block="up_blocks",
                              target_layer=[0, 0, 1], target_step=900)
    assert s.shape == (2,)
    assert np.all(np.isfinite(s))
    s2 = xl_scorer.score_batch(a, b, prompt="a style", target_block="up_blocks",
                               target_layer=[0, 0, 1], target_step=900)
    np.testing.assert_allclose(s, s2, atol=0)


def test_xl_mid_tap_and_mse(xl_scorer):
    a, b = _pix(2), _pix(3)
    s = xl_scorer.score_batch(a, b, target_block="mid_blocks", target_layer=[0, 0],
                              target_step=900, similarity="mse")
    assert s.shape == (1,) and s[0] >= 0


def test_xl_uncond_half_is_zeroed(xl_scorer):
    embeds, pooled = xl_scorer.encode_prompt("hello")
    assert np.all(embeds[0] == 0) and np.all(pooled[0] == 0)  # force_zeros_for_empty_prompt
    assert not np.all(embeds[1] == 0)
    assert embeds.shape[-1] == 32 + 32  # concat of both towers


def test_xl_time_ids_static():
    np.testing.assert_array_equal(
        DiffSimXL.default_time_ids(), [1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]
    )


@pytest.fixture(scope="module")
def dit_scorer():
    return DiffSimDiT(
        dit_cfg=dit.DiTConfig.tiny(input_size=16, num_classes=1000),
        vae_cfg=vae.VAEConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )


def test_dit_score_batch(dit_scorer):
    a, b = _pix(4, 3), _pix(5, 3)
    s = dit_scorer.score_batch(a, b, target_layer=[1], target_step=750)
    assert s.shape == (3,)
    assert np.all(np.isfinite(s)) and np.all(np.abs(s) <= 1.0 + 1e-5)
    # layer addressing is live (no collapse bug): layer 0 != layer 1
    s0 = dit_scorer.score_batch(a, b, target_layer=[0], target_step=750)
    assert not np.allclose(s, s0)


def test_dit_rejects_small_target_step(dit_scorer):
    with pytest.raises(ValueError):
        dit_scorer.score_batch(_pix(6), _pix(7), target_layer=[0], target_step=400)


def test_dit_batch_matches_single(dit_scorer):
    a, b = _pix(8, 2), _pix(9, 2)
    batched = dit_scorer.score_batch(a, b, target_layer=[1], target_step=750)
    singles = [
        dit_scorer.score_batch(a[i : i + 1], b[i : i + 1], target_layer=[1], target_step=750)[0]
        for i in range(2)
    ]
    np.testing.assert_allclose(batched, singles, atol=1e-5)


def test_xl_triplet_bit_identical(xl_scorer):
    a, b, c = _pix(20, 2), _pix(21, 2), _pix(22, 2)
    kw = dict(prompt="s", target_block="up_blocks", target_layer=[0, 0, 1], target_step=900)
    s_ab, s_ac = xl_scorer.score_triplet_batch(a, b, c, **kw)
    np.testing.assert_array_equal(s_ab, xl_scorer.score_batch(a, b, **kw))
    np.testing.assert_array_equal(s_ac, xl_scorer.score_batch(a, c, **kw))


def test_dit_triplet_bit_identical(dit_scorer):
    a, b, c = _pix(23, 2), _pix(24, 2), _pix(25, 2)
    kw = dict(target_layer=[1], target_step=750)
    s_ab, s_ac = dit_scorer.score_triplet_batch(a, b, c, **kw)
    np.testing.assert_array_equal(s_ab, dit_scorer.score_batch(a, b, **kw))
    np.testing.assert_array_equal(s_ac, dit_scorer.score_batch(a, c, **kw))


def test_xl_bf16_vae_mode(xl_scorer):
    """vae_fp32=False (CLI --xl_vae_bf16): the VAE tree is cast to the compute dtype and
    scores track the fp32-VAE default within bf16 tolerance (the reference's fp32-VAE
    workaround targets fp16 overflow, which bf16's exponent range does not have)."""
    import jax
    import jax.numpy as jnp

    text2_cfg = clip_text.CLIPTextConfig(
        vocab_size=1000, hidden=32, layers=2, heads=2, intermediate=64, projection_dim=16
    )
    kw = dict(
        unet_cfg=unet.UNetConfig.tiny_xl(cross_attention_dim=64),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        text2_cfg=text2_cfg,
        img_size=32,
        dtype=jnp.bfloat16,
    )
    ref = DiffSimXL(**kw)
    fast = DiffSimXL(params=jax.device_get(ref.params), vae_fp32=False, **kw)
    leaf = jax.tree_util.tree_leaves(fast.params["vae"])[0]
    assert leaf.dtype == jnp.bfloat16
    assert jax.tree_util.tree_leaves(ref.params["vae"])[0].dtype == jnp.float32

    a, b = _pix(70, 3), _pix(71, 3)
    s_ref = ref.score_batch(a, b, target_layer=(0, 1, 1), target_step=900)
    s_fast = fast.score_batch(a, b, target_layer=(0, 1, 1), target_step=900)
    np.testing.assert_allclose(s_fast, s_ref, atol=0.05)
