"""DiT diffusion/training/sampling tests (tiny configs, 8-device CPU mesh)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffsim_tpu.data.imagefolder import ImageFolderDataset, center_crop_arr
from diffsim_tpu.models import diffusion as gd, dit, vae
from diffsim_tpu.parallel import mesh as meshlib
from diffsim_tpu.train.dit_trainer import DiTTrainer, TrainConfig


def test_respaced_betas_recover_alphas():
    full = gd.create_diffusion(None)
    sub = gd.create_diffusion("100")
    assert sub.num_steps == 100 and full.num_steps == 1000
    # respacing preserves the cumulative alphas at the kept steps
    ac_full = np.cumprod(1 - full.betas)
    ac_sub = np.cumprod(1 - sub.betas)
    np.testing.assert_allclose(ac_sub, ac_full[sub.timestep_map], rtol=1e-10)


def test_ddim_respacing():
    d = gd.create_diffusion("ddim50")
    assert d.num_steps == 50
    assert d.timestep_map[0] == 0 and np.all(np.diff(d.timestep_map) == d.timestep_map[1])


def test_q_sample_matches_closed_form():
    d = gd.create_diffusion(None)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 0.5)
    t = jnp.asarray([100, 900])
    xt = d.q_sample(x0, t, noise)
    ac = np.cumprod(1 - d.betas)
    expected0 = np.sqrt(ac[100]) + 0.5 * np.sqrt(1 - ac[100])
    np.testing.assert_allclose(np.asarray(xt[0, 0, 0, 0]), expected0, rtol=1e-5)


def test_training_losses_finite_and_learned_sigma():
    cfg = dit.DiTConfig.tiny(learn_sigma=True)
    params = dit.init(jax.random.PRNGKey(0), cfg)
    d = gd.create_diffusion(None, learn_sigma=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    t = jnp.asarray([0, 10, 500, 999])
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)

    def model_fn(x, model_t):
        out, _ = dit.apply(params, x, model_t, jnp.zeros((4,), jnp.int32), cfg)
        return out

    losses = d.training_losses(model_fn, x0, t, noise)
    assert losses["loss"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(losses["loss"])))
    assert np.all(np.asarray(losses["vb"]) >= 0)


def test_p_sample_loop_and_ddim():
    cfg = dit.DiTConfig.tiny(learn_sigma=True)
    params = dit.init(jax.random.PRNGKey(0), cfg)
    d = gd.create_diffusion("8", learn_sigma=True)

    def model_fn(x, model_t):
        out, _ = dit.apply(params, x, model_t, jnp.zeros((2,), jnp.int32), cfg)
        return out

    shape = (2, 8, 8, 4)
    x_ddpm = d.p_sample_loop(model_fn, shape, jax.random.PRNGKey(3))
    x_ddim = d.ddim_sample_loop(model_fn, shape, jax.random.PRNGKey(3))
    assert x_ddpm.shape == shape and x_ddim.shape == shape
    assert np.all(np.isfinite(np.asarray(x_ddpm)))
    assert np.all(np.isfinite(np.asarray(x_ddim)))


def _tiny_trainer(mesh=None, **cfg_kw):
    cfg = TrainConfig(image_size=16, model="DiT-S/2", global_batch=8, lr=1e-3, **cfg_kw)
    return DiTTrainer(
        cfg,
        mesh=mesh,
        dit_cfg=dit.DiTConfig.tiny(input_size=8, learn_sigma=True, num_classes=10),
        vae_cfg=vae.VAEConfig.tiny(),
    )


def test_remat_is_numerics_preserving():
    """cfg.remat wraps every DiT block in jax.checkpoint (the TPU HBM/FLOPs trade the
    reference's f32 DDP trainer lacks); the loss trajectory must be identical."""
    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (8,)).astype(np.int32)
    losses = {}
    for remat in (False, True):
        trainer = _tiny_trainer(remat=remat)
        losses[remat] = [
            float(trainer.train_step(pixels, labels, jax.random.PRNGKey(0))["loss"])
            for _ in range(3)
        ]
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-6)


def test_bf16_compute_keeps_f32_master_state():
    """cfg.compute_dtype='bfloat16': model compute in bf16, but params/EMA/opt stay f32
    master copies and the loss remains finite and trainable."""
    trainer = _tiny_trainer(compute_dtype="bfloat16")
    rng = np.random.default_rng(6)
    pixels = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (8,)).astype(np.int32)
    m0 = trainer.train_step(pixels, labels, jax.random.PRNGKey(0))
    losses = [float(trainer.train_step(pixels, labels, jax.random.PRNGKey(0))["loss"])
              for _ in range(20)]
    assert np.isfinite(losses).all()
    assert losses[-1] < float(m0["loss"])  # still overfits the fixed batch
    for leaf in jax.tree_util.tree_leaves(trainer.state["params"]):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(trainer.state["ema"]):
        assert leaf.dtype == jnp.float32


def test_train_step_reduces_loss_and_updates_ema():
    trainer = _tiny_trainer()
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (8,)).astype(np.int32)
    key = jax.random.PRNGKey(0)
    m0 = trainer.train_step(pixels, labels, key)
    losses = [float(trainer.train_step(pixels, labels, key)["loss"]) for _ in range(30)]
    assert int(trainer.state["step"]) == 31
    assert losses[-1] < float(m0["loss"])  # overfits the fixed batch
    # ema drifted from params but more slowly
    diff = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                  trainer.state["params"], trainer.state["ema"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_sharded_over_mesh():
    mesh = meshlib.make_mesh()
    trainer = _tiny_trainer(mesh=mesh)
    rng = np.random.default_rng(1)
    pixels = rng.integers(0, 256, (16, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (16,)).astype(np.int32)
    m = trainer.train_step(pixels, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    trainer = _tiny_trainer()
    rng = np.random.default_rng(2)
    pixels = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (8,)).astype(np.int32)
    trainer.train_step(pixels, labels, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    trainer.save(ckpt)

    trainer2 = _tiny_trainer()
    trainer2.restore(ckpt)
    assert int(trainer2.state["step"]) == 1
    a = jax.tree_util.tree_leaves(trainer.state["params"])
    b = jax.tree_util.tree_leaves(trainer2.state["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # training continues from the restored state
    trainer2.train_step(pixels, labels, jax.random.PRNGKey(0))
    assert int(trainer2.state["step"]) == 2


def test_sampling_with_cfg():
    trainer = _tiny_trainer()
    out = trainer.sample(np.asarray([1, 2]), jax.random.PRNGKey(0), cfg_scale=4.0, num_steps=4)
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(out))
    out_ddim = trainer.sample(np.asarray([1, 2]), jax.random.PRNGKey(0), num_steps=4, ddim=True)
    assert out_ddim.shape == (2, 8, 8, 4)


def test_imagefolder_dataset(tmp_path):
    for cls in ("a", "b"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(5):
            Image.fromarray(
                np.random.default_rng(i).integers(0, 255, (40, 60, 3)).astype(np.uint8)
            ).save(d / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path / "data"), image_size=16, seed=0)
    assert len(ds) == 10 and ds.classes == ["a", "b"]
    batches = list(ds.epoch_batches(4))
    assert len(batches) == 2  # drop_last
    pixels, labels = batches[0]
    assert pixels.shape == (4, 16, 16, 3) and pixels.dtype == np.uint8
    assert labels.shape == (4,)


def test_center_crop_arr():
    img = Image.fromarray(np.zeros((100, 70, 3), np.uint8))
    out = center_crop_arr(img, 16)
    assert out.shape == (16, 16, 3)


def test_sampling_with_decoder():
    trainer = _tiny_trainer()
    from diffsim_tpu.models import vae as vae_mod

    dec = vae_mod.decoder_init(jax.random.PRNGKey(7), vae_mod.VAEConfig.tiny())
    out = trainer.sample(np.asarray([1]), jax.random.PRNGKey(0), num_steps=4, vae_decoder=dec)
    # tiny VAE downscale is 2: 8x8 latents -> 16x16 pixels
    assert out.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(out))


def test_timestep_samplers():
    from diffsim_tpu.train.timestep_sampler import LossSecondMomentSampler, UniformSampler

    rng = np.random.default_rng(0)
    u = UniformSampler(100)
    t, w = u.sample(rng, 32)
    assert t.shape == (32,) and np.all(w == 1.0) and t.max() < 100

    s = LossSecondMomentSampler(10, history=2)
    assert not s.warmed_up
    t, w = s.sample(rng, 16)
    np.testing.assert_allclose(w, 1.0)  # uniform warm-up => unit weights
    # warm up with timestep-dependent losses: high loss at t=9
    for _ in range(3):
        tt = np.arange(10, dtype=np.int32)
        s.update(tt, np.where(tt == 9, 10.0, 0.1))
    assert s.warmed_up
    p = s.weights()
    assert p[9] > p[0] * 5  # importance concentrates on the lossy timestep
    t, w = s.sample(rng, 4096)
    assert (t == 9).mean() > 0.3
    # unbiasedness: exact expectation E_p[1/(T p)] == 1; the empirical mean carries
    # Monte-Carlo error, so compare statistically
    assert np.sum(p * (1 / (10 * p))) == pytest.approx(1.0, abs=1e-12)
    assert float(np.mean(w)) == pytest.approx(1.0, abs=0.15)


def test_trainer_with_loss_aware_sampler():
    from diffsim_tpu.train.timestep_sampler import LossSecondMomentSampler

    cfg = TrainConfig(image_size=16, model="DiT-S/2", global_batch=8, lr=1e-3)
    trainer = DiTTrainer(
        cfg,
        dit_cfg=dit.DiTConfig.tiny(input_size=8, learn_sigma=True, num_classes=10),
        vae_cfg=vae.VAEConfig.tiny(),
        timestep_sampler=LossSecondMomentSampler(1000, history=1),
    )
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (8,)).astype(np.int32)
    m = trainer.train_step(pixels, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(trainer.timestep_sampler._counts.sum()) == 8  # history updated host-side


def test_imagefolder_process_slice_partitions_global_batches(tmp_path):
    """Multi-host feeding: every process derives the SAME global epoch order from the shared
    seed and decodes a disjoint contiguous slice of each global batch; the union of all
    process slices equals the single-process batch (pixel- and label-exact). Flip draws come
    from a separate stream, so consuming different counts per host cannot desync the order."""
    for cls in ("a", "b"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                np.random.default_rng(100 + i).integers(0, 255, (24, 24, 3)).astype(np.uint8)
            ).save(d / f"{i}.png")

    def run(process_slice):
        ds = ImageFolderDataset(str(tmp_path / "data"), image_size=16, seed=3, hflip=False)
        return list(ds.epoch_batches(8, process_slice=process_slice))

    full = run(None)
    parts = [run((p, 4)) for p in range(4)]
    assert len(full) == 2
    for bi in range(len(full)):
        pix = np.concatenate([parts[p][bi][0] for p in range(4)], axis=0)
        lab = np.concatenate([parts[p][bi][1] for p in range(4)], axis=0)
        np.testing.assert_array_equal(pix, full[bi][0])
        np.testing.assert_array_equal(lab, full[bi][1])

    # epochs reshuffle (fresh per-epoch order stream)
    ds = ImageFolderDataset(str(tmp_path / "data"), image_size=16, seed=3, hflip=False)
    e0 = [lab.tolist() for _, lab in ds.epoch_batches(8)]
    e1 = [lab.tolist() for _, lab in ds.epoch_batches(8)]
    assert e0 != e1


def test_global_batch_from_local_feeds_sharded_train_step():
    """parallel.mesh.global_batch_from_local produces a 'data'-sharded global array the jitted
    step consumes without re-transfer; loss matches feeding the raw numpy batch."""
    mesh = meshlib.make_mesh()
    rng = np.random.default_rng(9)
    pixels = rng.integers(0, 256, (16, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (16,)).astype(np.int32)

    t1 = _tiny_trainer(mesh=mesh)
    m_np = t1.train_step(pixels, labels, jax.random.PRNGKey(0))
    t2 = _tiny_trainer(mesh=mesh)
    gp = meshlib.global_batch_from_local(mesh, pixels)
    gl = meshlib.global_batch_from_local(mesh, labels)
    assert gp.sharding == meshlib.data_sharding(mesh)
    m_arr = t2.train_step(gp, gl, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m_np["loss"]), float(m_arr["loss"]), rtol=1e-6)


def test_sampling_shards_over_mesh():
    """trainer.sample on a mesh shards the sample batch over 'data' (the reference's
    sample_ddp role) and matches single-device sampling for the same key."""
    single = _tiny_trainer()
    meshed = _tiny_trainer(mesh=meshlib.make_mesh())
    # identical weights: same seed/init path
    labels = np.arange(8) % 10
    key = jax.random.PRNGKey(4)
    lat_s = single.sample(labels, key, num_steps=4, ddim=True)
    lat_m = meshed.sample(labels, key, num_steps=4, ddim=True)
    np.testing.assert_allclose(lat_s, lat_m, atol=1e-5)
