import jax
import numpy as np
import pytest

from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15, sd15_tap
from diffsim_tpu.models import clip_text, unet, vae
from diffsim_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def scorer():
    return DiffSimSD15(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )


@pytest.fixture(scope="module")
def det_scorer():
    """Deterministic-latent scorer for discrimination tests: a randomly-initialized VAE has
    posterior std ~1 (the real VAE's is ~e^-10), so .sample() noise would swamp the image
    signal; vae_mode uses the posterior mean."""
    sc = DiffSimSD15(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
        vae_mode=True,
    )
    # a random VAE emits ~0.05-scale latents, comparable to even the t~2 q_sample noise;
    # boost the final projection so the image signal dominates as it does with real weights
    sc.params["vae"]["quant_conv"]["w"] = sc.params["vae"]["quant_conv"]["w"] * 30.0
    return sc


def _pix(seed, n=1, size=32):
    """Smooth structured images (random low-frequency sinusoid mixtures) — iid pixel noise
    would collapse to near-identical latents after VAE downsampling and score flat."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij")
    out = np.zeros((n, size, size, 3), np.float32)
    for i in range(n):
        for c in range(3):
            img = sum(
                rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * (rng.uniform(0.5, 3) * xx + rng.uniform(0.5, 3) * yy) + rng.uniform(0, 6.28))
                for _ in range(4)
            )
            out[i, :, :, c] = img / 4.0
    return np.clip(out, -1, 1)


def test_tap_translation_replicates_collapse_bug():
    # Q2: a length-1 list always collapses to layer 0
    assert sd15_tap("down_blocks", [5]).address[0] == 0
    assert sd15_tap("down_blocks", [5], fix_layer_collapse=True).address[0] == 5
    # up_blocks[1:][L] -> absolute L+1
    assert sd15_tap("up_blocks", 0).address[0] == 1
    assert sd15_tap("mid_blocks", 0).block == "mid"


def test_identical_images_score_highest(det_scorer):
    """score(A, A) is NOT exactly 1 (role A and role B consume different draws of the seeded
    stream, mirroring the reference's sequential generator use,
    /root/reference/diffsim/diffsim.py:112-113), but it must beat any other pairing."""
    a = _pix(0)
    # random weights carry no semantic signal at heavy noise levels, so discrimination tests
    # run at target_step=999 (t~2, minimal noising); protocol tests use the canonical 600
    s_self = det_scorer.score_batch(a, a.copy(), target_block="up_blocks", target_layer=(0,), target_step=999)
    assert s_self.shape == (1,)
    assert -1.0 <= s_self[0] <= 1.0 + 1e-6
    s_other = det_scorer.score_batch(a, _pix(99), target_block="up_blocks", target_layer=(0,), target_step=999)
    assert s_self[0] > s_other[0]


def test_scores_deterministic(scorer):
    a, b = _pix(1), _pix(2)
    s1 = scorer.score_batch(a, b, target_step=600, seed=2334)
    s2 = scorer.score_batch(a, b, target_step=600, seed=2334)
    np.testing.assert_allclose(s1, s2, atol=0)


def test_batch_matches_single(scorer):
    a, b = _pix(3, n=3), _pix(4, n=3)
    batched = scorer.score_batch(a, b, target_step=600)
    singles = [scorer.score_batch(a[i : i + 1], b[i : i + 1], target_step=600)[0] for i in range(3)]
    np.testing.assert_allclose(batched, np.asarray(singles), atol=1e-5)


def test_similar_beats_dissimilar(det_scorer):
    """Near-duplicate images should outscore unrelated ones even with random weights (the
    cross-attention of nearly-identical taps is nearly the self-attention)."""
    a = _pix(5)
    near = np.clip(a + 0.01 * _pix(6), -1, 1)
    far = _pix(7)
    s_near = det_scorer.score_batch(a, near, target_step=999)[0]
    s_far = det_scorer.score_batch(a, far, target_step=999)[0]
    assert s_near > s_far


def test_mse_similarity_readout_direction():
    """MSE semantics verified at the readout level (scale-sensitive MSE rankings are not
    robust under random model weights): identical taps give 0; different taps give > 0."""
    from diffsim_tpu.metrics.readout import cross_attention_score

    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 2, 4, 16, 8)).astype(np.float32)
    k = rng.standard_normal((1, 2, 4, 16, 8)).astype(np.float32)
    v = rng.standard_normal((1, 2, 4, 16, 8)).astype(np.float32)
    k2 = rng.standard_normal(k.shape).astype(np.float32)
    v2 = rng.standard_normal(v.shape).astype(np.float32)
    same = cross_attention_score(q, k, v, q.copy(), k.copy(), v.copy(), "mse")
    diff = cross_attention_score(q, k, v, q, k2, v2, "mse")
    assert float(same[0]) == pytest.approx(0.0, abs=1e-10)
    assert float(diff[0]) > float(same[0])
    # and identical taps give cosine exactly 1
    cos_same = cross_attention_score(q, k, v, q.copy(), k.copy(), v.copy(), "cosine")
    assert float(cos_same[0]) == pytest.approx(1.0, abs=1e-6)


def test_mse_similarity_scorer_smoke(det_scorer):
    a, b = _pix(8), _pix(10)
    s = det_scorer.score_batch(a, b, target_step=999, similarity="mse")
    assert s.shape == (1,) and float(s[0]) >= 0.0


def test_cfg_parity_vs_fast_mode():
    kwargs = dict(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )
    parity = DiffSimSD15(cfg_parity=True, **kwargs)
    fast = DiffSimSD15(cfg_parity=False, **kwargs)
    a, b = _pix(11), _pix(12)
    s_parity = parity.score_batch(a, b, target_step=600)
    s_fast = fast.score_batch(a, b, target_step=600)
    assert s_parity.shape == s_fast.shape == (1,)
    assert abs(float(s_parity[0])) <= 1.001 and abs(float(s_fast[0])) <= 1.001


def test_sharded_scoring_matches_single_device():
    mesh = meshlib.make_mesh()
    assert mesh.shape["data"] == 8, "conftest must provide 8 virtual CPU devices"
    kwargs = dict(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )
    single = DiffSimSD15(**kwargs)
    sharded = DiffSimSD15(mesh=mesh, **kwargs)
    a, b = _pix(13, n=5), _pix(14, n=5)  # 5 pairs -> padded to 8 on the mesh
    s1 = single.score_batch(a, b, target_step=600)
    s2 = sharded.score_batch(a, b, target_step=600)
    assert s2.shape == (5,)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_tap_values_shapes(scorer, tmp_path):
    from PIL import Image

    img = Image.fromarray((np.random.default_rng(0).uniform(0, 255, (40, 40, 3))).astype(np.uint8))
    path = tmp_path / "img.png"
    img.save(path)
    q, k, v = scorer.tap_values(str(path), target_step=600)
    assert q.shape[0] == 2  # CFG-doubled batch, reference stores layout
    assert q.shape == k.shape == v.shape


def test_masked_query_scoring(scorer):
    """mask_query capability: precomputed foreground masks weight the tapped queries
    (/root/reference/metrics/diffeats.py:75-87, the SAM use_mask path with masks supplied)."""
    a, b = _pix(20, 2), _pix(21, 2)
    mask = np.zeros((2, 32, 32), np.float32)
    mask[:, 8:24, 8:24] = 1.0
    s_masked = scorer.score_batch(a, b, target_step=600, mask_a=mask, mask_b=mask)
    s_plain = scorer.score_batch(a, b, target_step=600)
    assert s_masked.shape == (2,)
    assert not np.allclose(s_masked, s_plain)
    # all-ones mask stays in [0,1]-weight land but dilation keeps it exactly 1 -> identical
    ones = np.ones((2, 32, 32), np.float32)
    s_ones = scorer.score_batch(a, b, target_step=600, mask_a=ones, mask_b=ones)
    np.testing.assert_allclose(s_ones, s_plain, atol=2e-5)


def test_mask_to_latent_shapes():
    import jax.numpy as jnp

    from diffsim_tpu.metrics.readout import mask_to_latent

    m = np.zeros((3, 2, 64, 64), np.float32)
    m[..., 20:40, 20:40] = 1.0
    w = np.asarray(mask_to_latent(jnp.asarray(m), 8))
    assert w.shape == (3, 2, 64)
    assert w.max() <= 1.0 + 1e-6 and w.min() >= 0.0
    assert w.sum() > 0


def test_triplet_path_bit_identical_to_pairs(scorer):
    """The fused triplet graph shares image A's latents/noise/forwards; scores must equal the
    pair path exactly (the reference reseeds per call, so A's draws repeat across its pairs)."""
    a, b, c = _pix(30, 2), _pix(31, 2), _pix(32, 2)
    s_ab, s_ac = scorer.score_triplet_batch(a, b, c, target_step=600, prompt="p")
    np.testing.assert_array_equal(s_ab, scorer.score_batch(a, b, target_step=600, prompt="p"))
    np.testing.assert_array_equal(s_ac, scorer.score_batch(a, c, target_step=600, prompt="p"))


def test_triplet_scan_chunks_match_plain(scorer):
    """chunk= scans T//chunk chunks in one jitted program (one relay launch/fetch per batch);
    scores must match the per-batch path up to XLA fusion-order rounding."""
    a, b, c = _pix(40, 6), _pix(41, 6), _pix(42, 6)
    s_ab, s_ac = scorer.score_triplet_batch(a, b, c, target_step=600, prompt="p")
    t_ab, t_ac = scorer.score_triplet_batch(a, b, c, target_step=600, prompt="p", chunk=2)
    np.testing.assert_allclose(s_ab, t_ab, atol=2e-6)
    np.testing.assert_allclose(s_ac, t_ac, atol=2e-6)


def test_scores_invariant_across_mesh_sizes():
    """Scaling evidence (virtual CPU mesh): the same pairs score identically on meshes of
    1, 2, 4 and 8 devices — the sharded graph is a pure data-parallel decomposition."""
    kwargs = dict(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )
    a, b = _pix(50, n=8), _pix(51, n=8)
    ref = None
    for n in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(n) if n > 1 else None
        s = DiffSimSD15(mesh=mesh, **kwargs).score_batch(a, b, target_step=600)
        if ref is None:
            ref = s
        else:
            np.testing.assert_allclose(s, ref, atol=1e-5), n


def test_tap_values_jit_is_cached(scorer, tmp_path):
    """Retrieval loops call tap_values per image: repeated calls must reuse ONE compiled
    program (round-2 review: jax.jit(fn) inside the method recompiled per call)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    paths = []
    for i in range(2):
        p = tmp_path / f"tv{i}.png"
        Image.fromarray(rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    tap = sd15_tap("up_blocks", (0,))
    assert scorer._tap_values_fn(tap) is scorer._tap_values_fn(tap)
    q1, _, _ = scorer.tap_values(paths[0], target_step=600)
    q2, _, _ = scorer.tap_values(paths[1], target_step=600)
    assert q1.shape == q2.shape
    # same image -> identical taps (deterministic seeded noise through the cached program)
    q1b, _, _ = scorer.tap_values(paths[0], target_step=600)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q1b), atol=0)


def test_hash_tokenizer_footgun_warns(scorer, capsys):
    """Supplying a params tree without a tokenizer must print the loud garbage-scores
    warning (round-2 review: silent HashTokenizer fallback with real weights)."""
    params = jax.device_get(scorer.params)
    capsys.readouterr()
    DiffSimSD15(
        params,
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )
    out = capsys.readouterr().out
    assert "GARBAGE" in out and "tokenizer" in out

    # no params (random-weight/test mode): silent, as before
    DiffSimSD15(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )
    assert "GARBAGE" not in capsys.readouterr().out


def test_use_text_attn_taps_cross_attention(scorer):
    """--use_text_attn (declared but dead in the reference, argprocess.py:17): taps the
    attn2 text cross-attention Q/K/V through the same readout; scores are finite, valid
    cosines, and differ from the attn1 path."""
    a, b = _pix(60, 3), _pix(61, 3)
    s_self = scorer.score_batch(a, b, prompt="a cat", target_step=600)
    s_text = scorer.score_batch(a, b, prompt="a cat", target_step=600, text_attn=True)
    assert np.all(np.isfinite(s_text)) and np.all(np.abs(s_text) <= 1.0 + 1e-5)
    assert not np.allclose(s_text, s_self, atol=1e-4)
    # triplet path consistency: pair scores == triplet scores under text_attn
    c = _pix(62, 3)
    t_ab, t_ac = scorer.score_triplet_batch(a, b, c, prompt="a cat", target_step=600,
                                            text_attn=True)
    np.testing.assert_allclose(t_ab, s_text, atol=2e-5)


def test_fast_softmax_flag_reaches_the_graph(tmp_path):
    """--bf16_softmax (scorer fast_softmax=True): scores shift by bf16-softmax rounding —
    close to, but NOT bit-equal with, the canonical f32-softmax graph (proving the
    trace-time context actually reroutes the attention math). Ranking agreement at full
    scale is benched on-chip (BENCH_FAST.json)."""
    import numpy as np

    from diffsim_tpu.models import clip_text, unet, vae

    def scorer(fast):
        return DiffSimSD15(
            unet_cfg=unet.UNetConfig.tiny(), vae_cfg=vae.VAEConfig.tiny(),
            text_cfg=clip_text.CLIPTextConfig.tiny(), img_size=32,
            dtype=np.float32, fast_softmax=fast,
        )

    rng = np.random.default_rng(11)
    pix = [rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8) for _ in range(3)]
    kw = dict(prompt="p", target_step=600)
    ref = scorer(False).score_triplet_batch(*pix, **kw)
    fast = scorer(True).score_triplet_batch(*pix, **kw)
    np.testing.assert_allclose(fast[0], ref[0], atol=0.05)
    np.testing.assert_allclose(fast[1], ref[1], atol=0.05)
    assert not np.array_equal(np.asarray(fast[0]), np.asarray(ref[0])), (
        "fast mode produced bit-identical scores — the flag never reached the graph"
    )
