"""DiffSim scorer, DiT-XL/2 backbone.

Torch reference: /root/reference/diffsim/diffsim_dit.py. Per image the reference builds a
batch-1 latent and a batch-2 class vector y=[1, 1000] (cond + null class) whose embeddings
broadcast the whole transformer to batch 2 — the tapped Q/K/V carry both rows, exactly like
the SD path's CFG halves. We materialize that as an explicit batch-2 duplication.

Noising uses the SD-1.5 DDIM table at raw ``t = target_step``; the model timestep is the
respaced ``timestep_map[1000 - target_step]`` (core.schedulers.dit_noise_spec). The reference's
``p_sample`` call is gutted to a bare forward (/root/reference/DiT/diffusion/
gaussian_diffusion.py:279-280,403-411) — implemented here honestly as noise + one forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.core import prng, schedulers
from diffsim_tpu.core.image import load_and_process
from diffsim_tpu.metrics import readout
from diffsim_tpu.metrics.scorer_base import ScorerBase, fetchable_pair
from diffsim_tpu.models import dit, vae
from diffsim_tpu.ops.taps import QKV, TapSpec


class DiffSimDiT(ScorerBase):
    # DiT-XL/2 vs SD-1.5 at 512px: 3.22 / 2.84 = 1.13 TFLOP/pair (tools/flops_ratio.py),
    # deployed rounded UP (hbm_guard's convention for the activation-scale constants)
    hbm_scale = 1.15

    def __init__(
        self,
        params=None,
        *,
        dit_cfg: dit.DiTConfig | None = None,
        vae_cfg: vae.VAEConfig | None = None,
        img_size: int = 512,
        dtype=jnp.bfloat16,
        mesh=None,
        vae_mode: bool = False,
        init_seed: int = 0,
    ):
        # DiT_models["DiT-XL/2"](input_size=img_size//8, in_channels=4, num_classes=1000)
        # (/root/reference/diffsim/diffsim_dit.py:31-35); VAE is sd-vae-ft-mse (same arch as SD)
        self.dit_cfg = dit_cfg or dit.DiTConfig.xl2(input_size=img_size // 8)
        self.vae_cfg = vae_cfg or vae.VAEConfig.sd()
        self.img_size = img_size
        self.dtype = dtype
        self.mesh = mesh
        self.vae_mode = vae_mode
        if params is None:
            # one jitted on-device build (scorer_base._init_random): no bulk relay upload
            def build():
                kd, kv = jax.random.split(jax.random.PRNGKey(init_seed))
                return {
                    "dit": dit.init(kd, self.dit_cfg, dtype),
                    "vae": vae.encoder_init(kv, self.vae_cfg, dtype),
                }

            self.params = self._init_random(build)
        else:
            self.params = self._place(params)

    @functools.lru_cache(maxsize=16)
    def _score_fn(self, tap: TapSpec, similarity: str, inject_noise: bool = False):
        cfg, vae_cfg = self.dit_cfg, self.vae_cfg
        latent_c = vae_cfg.latent_channels
        down = vae_cfg.downscale

        def fn(params, pix, noise_sab, key):
            model_t, a, b = noise_sab
            P, two, H, W, _ = pix.shape
            h = H // down
            if pix.dtype == jnp.uint8:
                pix = (pix.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
            moments = vae.encoder_apply_chunked(params["vae"], pix.reshape(P * 2, H, W, 3))
            moments = moments.reshape(P, 2, h, h, 2 * latent_c)
            if inject_noise:
                # cross-framework parity mode: ``key`` carries explicit per-role noise
                # (eps_vae (2,h,h,C), eps_n (2,h,h,C)) shared by both frameworks
                eps_vae, eps_n = (e[None] for e in key)
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, noise=eps_vae)
            elif self.vae_mode:
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, mode=True)
            else:
                eps_vae = jnp.stack(
                    [
                        jax.random.normal(prng.role_key(key, prng.VAE_A), (h, h, latent_c)),
                        jax.random.normal(prng.role_key(key, prng.VAE_B), (h, h, latent_c)),
                    ]
                )[None]
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, noise=eps_vae)
            if not inject_noise:
                eps_n = jnp.stack(
                    [
                        jax.random.normal(prng.role_key(key, prng.NOISE_A), (h, h, latent_c)),
                        jax.random.normal(prng.role_key(key, prng.NOISE_B), (h, h, latent_c)),
                    ]
                )[None]
            x = (a * z.astype(jnp.float32) + b * eps_n).astype(z.dtype)

            # per image: duplicate to batch 2 with y = [cond class 1, null class 1000]
            # (/root/reference/diffsim/diffsim_dit.py:95-98 via embedding broadcast)
            x_in = x[:, jnp.array([0, 0, 1, 1])].reshape(P * 4, h, h, latent_c)
            y = jnp.tile(jnp.asarray([1, cfg.num_classes]), (P * 2,))
            t = jnp.broadcast_to(jnp.float32(model_t), (P * 4,))
            _, taps = dit.apply(params["dit"], x_in, t, y, cfg, tap=tap)

            q, k, v = (t_.reshape((P, 4) + t_.shape[1:]) for t_ in (taps["q"], taps["k"], taps["v"]))
            return readout.cross_attention_score(
                q[:, :2], k[:, :2], v[:, :2], q[:, 2:], k[:, 2:], v[:, 2:], similarity
            )

        return self._jit_pairs(fn, n_data=1)

    @functools.lru_cache(maxsize=16)
    def _triplet_tail(self, tap: TapSpec, similarity: str):
        """moments (T,3,h,h,2C) pair-major -> (s_ab, s_ac): everything downstream of the
        VAE encode, shared verbatim by the pixel path (_triplet_fn) and the cached-moment
        path (_cached_triplet_fn) so cache hits score bit-identically."""
        cfg, vae_cfg = self.dit_cfg, self.vae_cfg
        latent_c = vae_cfg.latent_channels

        def fn(params, moments, noise_sab, key):
            model_t, a, b = noise_sab
            T, three, h, _, _ = moments.shape
            eps_a = jax.random.normal(prng.role_key(key, prng.VAE_A), (h, h, latent_c))
            eps_b = jax.random.normal(prng.role_key(key, prng.VAE_B), (h, h, latent_c))
            if self.vae_mode:
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, mode=True)
            else:
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor,
                                       noise=jnp.stack([eps_a, eps_b, eps_b])[None])
            n_a = jax.random.normal(prng.role_key(key, prng.NOISE_A), (h, h, latent_c))
            n_b = jax.random.normal(prng.role_key(key, prng.NOISE_B), (h, h, latent_c))
            x = (a * z.astype(jnp.float32) + b * jnp.stack([n_a, n_b, n_b])[None]).astype(z.dtype)

            x_in = x[:, jnp.array([0, 0, 1, 1, 2, 2])].reshape(T * 6, h, h, latent_c)
            y = jnp.tile(jnp.asarray([1, cfg.num_classes]), (T * 3,))
            t = jnp.broadcast_to(jnp.float32(model_t), (T * 6,))
            _, taps = dit.apply(params["dit"], x_in, t, y, cfg, tap=tap)
            q, k, v = (t_.reshape((T, 6) + t_.shape[1:]) for t_ in (taps["q"], taps["k"], taps["v"]))
            sa, sb, sc = slice(0, 2), slice(2, 4), slice(4, 6)
            s_ab = readout.cross_attention_score(
                q[:, sa], k[:, sa], v[:, sa], q[:, sb], k[:, sb], v[:, sb], similarity)
            s_ac = readout.cross_attention_score(
                q[:, sa], k[:, sa], v[:, sa], q[:, sc], k[:, sc], v[:, sc], similarity)
            return s_ab, s_ac

        return fn

    @functools.lru_cache(maxsize=16)
    def _triplet_fn(self, tap: TapSpec, similarity: str):
        """Triplet-fused variant: image A's latents/noise/forwards are shared between
        sim(A,B) and sim(A,C) — bit-identical to two pair calls (the reference reseeds its
        generator per call): VAE-encode fresh pixels, then the shared tail."""
        vae_cfg = self.vae_cfg
        latent_c = vae_cfg.latent_channels
        down = vae_cfg.downscale
        tail = self._triplet_tail(tap, similarity)

        def fn(params, pix, noise_sab, key):
            T, three, H, W, _ = pix.shape
            h = H // down
            if pix.dtype == jnp.uint8:
                pix = (pix.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
            moments = vae.encoder_apply_chunked(params["vae"], pix.reshape(T * 3, H, W, 3))
            moments = moments.reshape(T, 3, h, h, 2 * latent_c)
            return tail(params, moments, noise_sab, key)

        if self.mesh is not None:
            from diffsim_tpu.parallel import mesh as meshlib

            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh, in_shardings=(rs, ds, rs, rs),
                                      out_shardings=(ds, ds))
        return jax.jit(fn)

    # ------------------------------------------------------------------
    # device-resident moment cache (same design as DiffSimSD15 — runtime/device_cache.py)
    # ------------------------------------------------------------------

    _moment_cache = None
    moment_cache_mb: float | None = None  # None => $DIFFSIM_TPU_MOMENT_CACHE_MB or 512

    def _ensure_moment_cache(self):
        if self._moment_cache is None:
            from diffsim_tpu.runtime.device_cache import make_moment_cache

            self._moment_cache = make_moment_cache(self, self.dtype)
        return self._moment_cache

    @functools.lru_cache(maxsize=16)
    def _cached_triplet_fn(self, tap: TapSpec, similarity: str):
        """Triplet scoring from cached moments: gather pool[idx] on device, then the shared
        tail."""
        tail = self._triplet_tail(tap, similarity)

        def fn(params, pool, idx3, noise_sab, key):
            return tail(params, pool[idx3], noise_sab, key)

        if self.mesh is not None:
            from diffsim_tpu.parallel import mesh as meshlib

            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh, in_shardings=(rs, rs, ds, rs, rs),
                                      out_shardings=(ds, ds))
        return jax.jit(fn)

    @functools.lru_cache(maxsize=16)
    def _cached_triplet_scan_fn(self, tap: TapSpec, similarity: str):
        """Scan-chunked variant of _cached_triplet_fn: one launch + one fetch for the
        whole window instead of one per chunk (~0.5 s relay latency each); shared
        wrapper: runtime.device_cache.make_window_scan."""
        from diffsim_tpu.runtime.device_cache import make_window_scan

        tail = self._triplet_tail(tap, similarity)

        def invoke(params, pool, idx3, noise_sab, key):
            return tail(params, pool[idx3], noise_sab, key)

        # args after (params, pool): idx3*, noise_sab, key (* = chunked)
        return make_window_scan(self.mesh, invoke, chunked=(0,), n_args=3)

    def score_triplet_paths(
        self,
        paths_a,
        paths_b,
        paths_c,
        pix_a: np.ndarray | None = None,
        pix_b: np.ndarray | None = None,
        pix_c: np.ndarray | None = None,
        *,
        loader=None,
        row_map: dict | None = None,
        target_layer=13,
        target_step: int = 600,
        similarity: str = "cosine",
        seed: int = 2333,
        blocking: bool = True,
        chunk: int | None = None,
    ):
        """(s_ab, s_ac) for T triplets given image PATHS through the device-resident moment
        cache — each unique image uploaded + VAE-encoded ONCE (see DiffSimSD15's docstring;
        DiT@512 was relay-transport-bound, so hits lift it directly)."""
        from diffsim_tpu.core.image import load_and_process_u8
        from diffsim_tpu.runtime.device_cache import ensure_image_slots

        tap = TapSpec("blocks", (self._resolve_layer(target_layer),), "attn1", QKV)
        spec = schedulers.dit_noise_spec(target_step)
        T = len(paths_a)
        assert len(paths_b) == T and len(paths_c) == T
        cache = self._ensure_moment_cache()
        idx3 = ensure_image_slots(cache, (paths_a, paths_b, paths_c), (pix_a, pix_b, pix_c),
                                  loader, lambda k: load_and_process_u8(k, self.img_size),
                                  row_map=row_map)
        from diffsim_tpu.runtime.device_cache import resolve_cached_chunk

        step, n = resolve_cached_chunk(self.mesh, T, chunk, self.img_size, scorer=self)
        pad = n - T
        if pad:
            idx3 = np.concatenate([idx3, np.repeat(idx3[-1:], pad, 0)], axis=0)
        sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
        key = jax.random.PRNGKey(int(seed))
        if step < n:
            fn = self._cached_triplet_scan_fn(tap, similarity)
            s_ab, s_ac = fn(self.params, cache.pool,
                            idx3.reshape(n // step, step, 3), sab, key)
        else:
            fn = self._cached_triplet_fn(tap, similarity)
            s_ab, s_ac = fn(self.params, cache.pool, idx3, sab, key)
        return fetchable_pair(s_ab, s_ac, T, pad, blocking)

    @staticmethod
    def _resolve_layer(target_layer):
        if isinstance(target_layer, (list, tuple)):
            return int(target_layer[0])  # diffsim_dit.py:75 — unwraps correctly
        return int(target_layer)

    def score_batch(
        self,
        pix_a: np.ndarray,
        pix_b: np.ndarray,
        *,
        target_layer=0,
        target_step: int = 600,
        similarity: str = "cosine",
        seed: int = 2333,
        blocking: bool = True,
        noise_override: tuple | None = None,
        **_,
    ):
        """``noise_override``: (eps_vae, eps_noise), each (2, h, h, latent_c) per-role arrays
        replacing the seed-derived draws (cross-framework parity mode)."""
        tap = TapSpec("blocks", (self._resolve_layer(target_layer),), "attn1", QKV)
        spec = schedulers.dit_noise_spec(target_step)
        pix, _, P, pad = self._pad_pairs(pix_a, pix_b, None)
        if noise_override is not None:
            key = tuple(jnp.asarray(e, jnp.float32) for e in noise_override)
        else:
            key = jax.random.PRNGKey(int(seed))
        fn = self._score_fn(tap, similarity, inject_noise=noise_override is not None)
        scores = fn(
            self.params,
            jnp.asarray(pix),
            (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b)),
            key,
        )

        def fetch():
            out = np.asarray(jax.device_get(scores), np.float32)
            return out[:P] if pad else out

        return fetch() if blocking else fetch

    def score_triplet_batch(
        self,
        pix_a: np.ndarray,
        pix_b: np.ndarray,
        pix_c: np.ndarray,
        *,
        target_layer=0,
        target_step: int = 600,
        similarity: str = "cosine",
        seed: int = 2333,
        blocking: bool = True,
        chunk: int | None = None,
        **_,
    ):
        from diffsim_tpu.runtime.device_cache import resolve_cached_chunk

        tap = TapSpec("blocks", (self._resolve_layer(target_layer),), "attn1", QKV)
        spec = schedulers.dit_noise_spec(target_step)
        T = pix_a.shape[0]
        transport = np.uint8 if pix_a.dtype == np.uint8 else self.dtype
        pix = np.stack([pix_a, pix_b, pix_c], axis=1).astype(transport)
        # shared chunk policy + pre-flight HBM guard (runtime.hbm_guard): large T is
        # dispatched as step-sized launches instead of one over-budget monolith
        step, n = resolve_cached_chunk(self.mesh, T, chunk, self.img_size, scorer=self,
                                       arg_itemsize=np.dtype(transport).itemsize)
        pad = n - T
        if pad:
            pix = np.concatenate([pix, np.repeat(pix[-1:], pad, 0)], axis=0)
        fn = self._triplet_fn(tap, similarity)
        sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
        key = jax.random.PRNGKey(int(seed))
        outs = [fn(self.params, jnp.asarray(pix[i:i + step]), sab, key)
                for i in range(0, n, step)]

        def fetch():
            got = jax.device_get(outs)  # one relay round-trip for all chunks
            a_ = np.concatenate([np.asarray(o[0], np.float32) for o in got])
            c_ = np.concatenate([np.asarray(o[1], np.float32) for o in got])
            return (a_[:T], c_[:T]) if pad else (a_, c_)

        return fetch() if blocking else fetch

    def diffsim_score(self, image_a, image_b, img_size=None, prompt="", target_block=None,
                      target_layer=(0,), target_step=600, similarity="cosine", seed=2333):
        """Reference-shaped single-pair API (/root/reference/diffsim/diffsim_dit.py:74)."""
        size = img_size or self.img_size
        pa = load_and_process(image_a, size)
        pb = load_and_process(image_b, size)
        return float(
            self.score_batch(pa, pb, target_layer=target_layer, target_step=target_step,
                             similarity=similarity, seed=seed)[0]
        )
