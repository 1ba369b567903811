"""DiT training, TPU-native.

The reference trains with torch DDP over NCCL: per-rank DataLoader, DDP gradient buckets,
rank-0 checkpointing behind barriers (/root/reference/DiT/train.py:110-250). The SPMD
equivalent: one jitted train step with the batch sharded over the mesh 'data' axis and params
replicated — XLA emits the gradient all-reduces over ICI; there are no barriers and no ranks.
EMA is a pure pytree lerp inside the same step. Checkpoints go through orbax (async-safe,
resumable), storing {params, ema, opt_state, step}.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffsim_tpu.models import dit, diffusion as gd, vae
from diffsim_tpu.parallel import mesh as meshlib


@dataclasses.dataclass
class TrainConfig:
    image_size: int = 256
    model: str = "DiT-XL/2"
    lr: float = 1e-4  # the published DiT recipe: AdamW, constant 1e-4, no weight decay
    weight_decay: float = 0.0
    ema_decay: float = 0.9999
    global_batch: int = 256
    seed: int = 0
    vae_scaling: float = 0.18215
    # TPU memory/compute policy (the reference trains plain f32 DDP):
    remat: bool = False  # jax.checkpoint every DiT block — activations recomputed in backward
    compute_dtype: str | None = None  # "bfloat16": bf16 model compute, f32 master weights/opt


class DiTTrainer:
    def __init__(self, cfg: TrainConfig, mesh=None, dit_cfg=None, vae_params=None,
                 vae_cfg=None, dtype=jnp.float32, timestep_sampler=None):
        from diffsim_tpu.train.timestep_sampler import UniformSampler

        self.cfg = cfg
        self.mesh = mesh
        self.dit_cfg = dit_cfg or dit.MODELS[cfg.model](
            input_size=cfg.image_size // 8, learn_sigma=True
        )
        self.vae_cfg = vae_cfg or vae.VAEConfig.sd()
        self.diffusion = gd.create_diffusion(None, learn_sigma=self.dit_cfg.learn_sigma)
        self.optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)

        from diffsim_tpu.metrics.scorer_base import init_random_on_device

        key = jax.random.PRNGKey(cfg.seed)

        def build():
            params = dit.init(key, self.dit_cfg, dtype)
            state = {
                "params": params,
                "opt": self.optimizer.init(params),
                "step": jnp.zeros((), jnp.int32),
            }
            vp = (vae.encoder_init(jax.random.fold_in(key, 1), self.vae_cfg, dtype)
                  if vae_params is None else None)
            return state, vp

        state, vp = init_random_on_device(build, mesh)
        # ema = copy of params with guaranteed-distinct buffers: a separate un-donated jit
        # call cannot alias its argument's buffers (returning tree_map(copy, params) from
        # `build` itself could let XLA share the two output tuples' storage, which the
        # donated train step must not see)
        place = (meshlib.replicated(mesh) if mesh is not None
                 else jax.sharding.SingleDeviceSharding(jax.devices()[0]))
        state["ema"] = jax.jit(
            lambda p: jax.tree_util.tree_map(jnp.copy, p), out_shardings=place
        )(state["params"])
        self.state = state
        if vae_params is None:
            self.vae_params = vp
        else:
            # converted VAE weights are host arrays: kept OUT of the jitted build
            # (closed-over trees serialize into the HLO as literals — CLAUDE.md relay trap)
            self.vae_params = jax.device_put(vae_params, place if mesh is not None
                                             else jax.devices()[0])
        self.timestep_sampler = timestep_sampler or UniformSampler(self.diffusion.num_steps)
        # per-host stream: in multi-host runs each process draws t only for its local batch
        # slice, so the streams must be disjoint across hosts
        self._t_rng = np.random.default_rng((cfg.seed, jax.process_index()))
        self._step_fn = self._build_step()

    def _build_step(self):
        diffusion = self.diffusion
        dit_cfg = self.dit_cfg
        ema_decay = self.cfg.ema_decay
        scaling = self.cfg.vae_scaling
        vae_cfg = self.vae_cfg
        optimizer = self.optimizer
        remat = self.cfg.remat
        compute_dtype = (
            jnp.dtype(self.cfg.compute_dtype) if self.cfg.compute_dtype else None
        )

        def loss_fn(params, latents, labels, t, t_weights, noise, dropout_key):
            # mixed precision: master weights (and the loss/targets below) stay f32; the
            # model compute runs in compute_dtype. Grads come back f32 via the cast's vjp.
            model_params = params
            if compute_dtype is not None:
                model_params = jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    params,
                )

            def model_fn(x, model_t):
                if compute_dtype is not None:
                    x = x.astype(compute_dtype)
                out, _ = dit.apply(
                    model_params, x, model_t, labels, dit_cfg, train=True,
                    dropout_key=dropout_key, remat=remat,
                )
                return out.astype(jnp.float32)

            losses = diffusion.training_losses(model_fn, latents, t, noise)
            # importance-sampling weights keep the objective unbiased under non-uniform t
            return jnp.mean(losses["loss"] * t_weights), losses

        def step(state, vae_params, pixels, labels, t, t_weights, key):
            # pixels (B, H, W, 3) in [-1,1] or uint8; encode with the frozen VAE in-graph
            if pixels.dtype == jnp.uint8:
                pixels = pixels.astype(jnp.float32) / 127.5 - 1.0
            k_vae, k_noise, k_drop = jax.random.split(
                jax.random.fold_in(key, state["step"]), 3
            )
            moments = vae.encoder_apply(vae_params, pixels)
            latents = vae.sample_latents(moments, k_vae, scaling)
            noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], latents, labels, t, t_weights, noise, k_drop
            )
            updates, opt = optimizer.update(grads, state["opt"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay), state["ema"], params
            )
            new_state = {"params": params, "ema": ema, "opt": opt, "step": state["step"] + 1}
            return new_state, {"loss": loss, "mse": jnp.mean(losses["mse"]),
                               "per_example_loss": losses["loss"]}

        if self.mesh is not None:
            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(
                step,
                self.mesh,
                in_shardings=(rs, rs, ds, ds, ds, ds, rs),
                out_shardings=(rs, {"loss": rs, "mse": rs, "per_example_loss": ds}),
                donate_argnums=(0,),
            )
        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, pixels: np.ndarray, labels: np.ndarray, key) -> dict:
        """One step. Single-process: pixels/labels are host arrays. Multi-host: pixels/labels
        are GLOBAL jax.Arrays (parallel.mesh.global_batch_from_local); t/t_weights are drawn
        for the local slice only and assembled the same way, and the loss-aware sampler
        updates from this host's addressable shard of the per-example losses (its state is
        per-host — each host importance-samples its own slice, unbiased via the weights)."""
        multihost = jax.process_count() > 1
        if multihost:
            local_n = pixels.shape[0] // jax.process_count()
            t_local, w_local = self.timestep_sampler.sample(self._t_rng, local_n)
            t = meshlib.global_batch_from_local(self.mesh, t_local)
            t_weights = meshlib.global_batch_from_local(self.mesh, w_local)
        else:
            t_local, t_weights = self.timestep_sampler.sample(self._t_rng, pixels.shape[0])
            t = t_local
        self.state, metrics = self._step_fn(
            self.state, self.vae_params, pixels, labels, t, t_weights, key
        )
        pel = metrics.pop("per_example_loss")
        if multihost:
            shards = sorted(pel.addressable_shards, key=lambda s: s.index[0].start or 0)
            pel_np = np.concatenate([np.asarray(s.data).reshape(-1) for s in shards])
        else:
            pel_np = np.asarray(pel)
        self.timestep_sampler.update(t_local, pel_np)
        return metrics

    # ------------------------------------------------------------------

    def _place_tree(self, tree):
        return jax.device_put(
            tree, meshlib.replicated(self.mesh) if self.mesh else jax.devices()[0]
        )

    def save(self, ckpt_dir: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(ckpt_dir, jax.device_get(self.state), force=True)

    def restore(self, ckpt_dir: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        # restore into the live state's structure so optax NamedTuple states keep their types
        template = jax.device_get(self.state)
        restored = ckptr.restore(ckpt_dir, item=template)
        self.state = jax.device_put(
            restored, meshlib.replicated(self.mesh) if self.mesh else jax.devices()[0]
        )

    # ------------------------------------------------------------------

    @functools.lru_cache(maxsize=8)
    def _sample_fn(self, n: int, cfg_scale, num_steps: int, ddim: bool, decode: bool):
        """Compiled-once sampling program per (batch, cfg, steps, sampler, decode) shape.

        Params and labels are arguments, not closures: the FID loop
        (cli/dit_sample.py) calls ``sample`` once per batch, and a per-call jit would both
        re-trace every batch and bake the parameter tree into the HLO as literals (which the
        relay's remote-compile helper rejects at full scale — see CLAUDE.md)."""
        dit_cfg = self.dit_cfg
        diffusion = gd.create_diffusion(str(num_steps), learn_sigma=dit_cfg.learn_sigma)
        size = dit_cfg.input_size
        shape = (n, size, size, dit_cfg.in_channels)

        def fn(params, decoder, labels, key):
            if cfg_scale is not None:
                y = jnp.concatenate([labels, jnp.full_like(labels, dit_cfg.num_classes)])

                def model_fn(x, model_t):
                    xx = jnp.concatenate([x, x])
                    t = jnp.concatenate([jnp.broadcast_to(model_t, (n,))] * 2)
                    out, _ = dit.apply(params, xx, t, y, dit_cfg)
                    eps, rest = out[..., :3], out[..., 3:]
                    cond, uncond = jnp.split(eps, 2)
                    guided = uncond + cfg_scale * (cond - uncond)
                    return jnp.concatenate([guided, rest[:n]], axis=-1)
            else:

                def model_fn(x, model_t):
                    t = jnp.broadcast_to(model_t, (n,))
                    out, _ = dit.apply(params, x, t, labels, dit_cfg)
                    return out

            loop = diffusion.ddim_sample_loop if ddim else diffusion.p_sample_loop
            latents = loop(model_fn, shape, key)
            if decode:
                return vae.decoder_apply(decoder, latents / self.cfg.vae_scaling, self.vae_cfg)
            return latents

        if self.mesh is not None:
            # FID-scale mass sampling (the reference's sample_ddp): the sample batch shards
            # over the mesh 'data' axis — each chip runs its slice of the denoising loop
            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh, in_shardings=(rs, rs, rs, rs),
                                      out_shardings=ds)
        return jax.jit(fn)

    def sample(self, labels: np.ndarray, key, cfg_scale: float | None = None,
               num_steps: int = 250, use_ema: bool = True, vae_decoder=None,
               ddim: bool = False) -> np.ndarray:
        """Class-conditional sampling (the reference's sample.py flow,
        /root/reference/DiT/sample.py:21-68). Returns latents, or images if a decoder tree is
        given."""
        params = self.state["ema"] if use_ema else self.state["params"]
        fn = self._sample_fn(len(labels), cfg_scale, int(num_steps), bool(ddim),
                             vae_decoder is not None)
        out = fn(params, vae_decoder, jnp.asarray(labels), key)
        return np.asarray(jax.device_get(out))
