"""DiffSim scorer, SDXL backbone.

Torch reference: /root/reference/diffsim/diffsim_xl.py + diffsim_xl_pipeline.py. Differences
from the SD-1.5 path, all preserved:

* dual text encoders; conditioning = concat of both towers' PENULTIMATE hidden states (2048)
  plus tower-2's projected pooled embedding; empty negative prompt is force-zeroed
  (SDXL base's ``force_zeros_for_empty_prompt``).
* micro-conditioning ``add_time_ids`` built from the UNet-default 1024x1024 canvas — the
  pipeline derives height/width from the UNet config, not the actual latents
  (/root/reference/diffsim/diffsim_xl_pipeline.py:229-262), so they are static.
* Euler "leading" noising with the ``init_noise_sigma`` latent amplification (quirk Q6,
  core.schedulers.sdxl_noise_spec).
* VAE encodes in fp32 then casts (/root/reference/diffsim/diffsim_xl.py:58-63).
* 3-index tap addressing [block, attention, transformer] over down_blocks[1:] /
  up_blocks[:-1] / mid (/root/reference/diffsim/diffsim_xl.py:85-107).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.core import prng, schedulers
from diffsim_tpu.core.image import load_and_process
from diffsim_tpu.core.tokenizer import HashTokenizer
from diffsim_tpu.metrics import readout
from diffsim_tpu.metrics.scorer_base import ScorerBase, fetchable_pair
from diffsim_tpu.models import clip_text, unet, vae
from diffsim_tpu.ops.taps import IP_QKV, QKV, TapSpec


def sdxl_tap(target_block: str, target_layer, ip_adapter: bool = False) -> TapSpec:
    """[block, attention, transformer] -> absolute TapSpec. down_blocks[1:][b] == absolute
    b+1; up_blocks[:-1][b] == absolute b; mid takes [attention, transformer] only."""
    tl = list(target_layer) if isinstance(target_layer, (list, tuple)) else [target_layer]
    attn = "attn2" if ip_adapter else "attn1"
    capture = IP_QKV if ip_adapter else QKV
    if target_block == "mid_blocks":
        a, t = (tl + [0, 0])[:2]
        return TapSpec("mid", (0, int(a), int(t)), attn, capture)
    if len(tl) != 3:
        raise ValueError("SDXL down/up taps take 3 indices: block, attention, transformer")
    b, a, t = (int(x) for x in tl)
    if target_block == "down_blocks":
        return TapSpec("down", (b + 1, a, t), attn, capture)
    if target_block == "up_blocks":
        return TapSpec("up", (b, a, t), attn, capture)
    raise ValueError(f"unknown target_block: {target_block}")


class DiffSimXL(ScorerBase):
    # SDXL activations vs SD-1.5 at EQUAL resolution: 19.08 / 2.84 / 4 (tools/flops_ratio.py
    # measured TFLOP/pair, xl@1024 vs sd15@512, divided by the 4x resolution factor)
    hbm_scale = 1.7

    def __init__(
        self,
        params=None,
        *,
        unet_cfg: unet.UNetConfig | None = None,
        vae_cfg: vae.VAEConfig | None = None,
        text_cfg: clip_text.CLIPTextConfig | None = None,
        text2_cfg: clip_text.CLIPTextConfig | None = None,
        img_size: int = 512,
        dtype=jnp.bfloat16,
        mesh=None,
        tokenizer=None,
        tokenizer2=None,
        cfg_parity: bool = True,
        vae_mode: bool = False,
        vae_fp32: bool = True,
        init_seed: int = 0,
    ):
        # vae_fp32: the reference encodes with a float32 VAE because SDXL's VAE is unstable
        # in float16 (/root/reference/diffsim/diffsim_xl.py:58-63 — activation overflow past
        # fp16's 65504 max). bf16 has float32's exponent RANGE, so that failure mode does not
        # exist on TPU; vae_fp32=False (CLI --xl_vae_bf16) encodes in bf16. Measured at
        # 1024px (tools/profile_xl.py): the encode is 55% of per-pair compute but
        # RESOLUTION-bound, not precision-bound — bf16 buys only ~4% there (520->500 ms,
        # flat across chunk sizes too); the option matters mainly for HBM headroom. Default
        # stays fp32 for exact reference parity.
        self.vae_fp32 = vae_fp32
        self.unet_cfg = unet_cfg or unet.UNetConfig.sdxl()
        self.vae_cfg = vae_cfg or vae.VAEConfig.sdxl()
        self.text_cfg = text_cfg or clip_text.CLIPTextConfig.sd15()
        self.text2_cfg = text2_cfg or clip_text.CLIPTextConfig.sdxl_big_g()
        self.img_size = img_size
        self.dtype = dtype
        self.mesh = mesh
        self.cfg_parity = cfg_parity
        self.vae_mode = vae_mode
        if tokenizer is None and params is not None:
            print("[tokenizer] weights were supplied but no CLIP tokenizer — falling back to "
                  "the HashTokenizer, so prompt embeddings are GARBAGE and scores are "
                  "meaningless. Pass tokenizer=/tokenizer2= (CLI: --tokenizer_dir) for real "
                  "scoring.")
        self.tokenizer = tokenizer or HashTokenizer(self.text_cfg.vocab_size)
        # tokenizer_2 pads with token 0 ("!") rather than EOS: when a real CLIPTokenizer is
        # given without an explicit tokenizer2, derive the "!"-padded view here so library
        # users get parity padding without going through the CLI registry
        if tokenizer2 is None and hasattr(tokenizer, "with_pad_token"):
            tokenizer2 = tokenizer.with_pad_token("!")
        self.tokenizer2 = tokenizer2 or tokenizer or HashTokenizer(self.text2_cfg.vocab_size)
        self._enc_dtype = jnp.float32 if vae_fp32 else dtype
        if params is None:
            # one jitted on-device build (scorer_base._init_random): no bulk relay upload
            def build():
                ku, kv, k1, k2 = jax.random.split(jax.random.PRNGKey(init_seed), 4)
                return {
                    "unet": unet.init(ku, self.unet_cfg, dtype),
                    "vae": vae.encoder_init(kv, self.vae_cfg, self._enc_dtype),
                    "text": clip_text.init(k1, self.text_cfg, dtype),
                    "text2": clip_text.init(k2, self.text2_cfg, dtype),
                }

            self.params = self._init_random(build)
        else:
            if not vae_fp32:
                params = dict(params)
                params["vae"] = jax.tree_util.tree_map(
                    lambda a: np.asarray(a, self._enc_dtype)
                    if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
                    params["vae"],
                )
            self.params = self._place(params)
        self._prompt_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        def _encode(p, ids1, ids2):
            out1 = clip_text.apply(p["text"], ids1, self.text_cfg, output_hidden_states=True)
            out2 = clip_text.apply(p["text2"], ids2, self.text2_cfg, output_hidden_states=True)
            embeds = jnp.concatenate(
                [out1["hidden_states"][-2], out2["hidden_states"][-2]], axis=-1
            )
            return embeds, out2["text_embeds"]

        self._encode_jit = jax.jit(_encode)

    def encode_prompt(self, prompt: str) -> tuple[np.ndarray, np.ndarray]:
        """((2, 77, 2048) embeds, (2, pooled_dim) pooled) for [uncond(zeros), cond]."""
        if prompt not in self._prompt_cache:
            ids1 = jnp.asarray(self.tokenizer([prompt]))
            ids2 = jnp.asarray(self.tokenizer2([prompt]))
            embeds, pooled = self._encode_jit(self.params, ids1, ids2)
            embeds = np.asarray(jax.device_get(embeds.astype(self.dtype)))
            pooled = np.asarray(jax.device_get(pooled.astype(self.dtype)))
            # force_zeros_for_empty_prompt: the uncond half is all-zeros
            embeds = np.concatenate([np.zeros_like(embeds), embeds], axis=0)
            pooled = np.concatenate([np.zeros_like(pooled), pooled], axis=0)
            self._prompt_cache[prompt] = (embeds, pooled)
        return self._prompt_cache[prompt]

    @staticmethod
    def default_time_ids() -> np.ndarray:
        """(1024, 1024, 0, 0, 1024, 1024): original size, crop, target size — from the UNet
        default canvas, independent of --image_size (pipeline quirk, see module docstring)."""
        return np.asarray([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0], np.float32)

    @functools.lru_cache(maxsize=16)
    def _score_fn(self, tap: TapSpec, similarity: str, inject_noise: bool = False):
        unet_cfg, vae_cfg = self.unet_cfg, self.vae_cfg
        cfg_parity = self.cfg_parity
        latent_c = vae_cfg.latent_channels
        down = vae_cfg.downscale

        ip_enabled = tap.capture == IP_QKV

        def fn(params, pix, embeds, pooled, noise_sab, key, ip_uncond):
            model_t, a, b = noise_sab
            P, two, H, W, _ = pix.shape
            h = H // down
            if pix.dtype == jnp.uint8:
                pix = pix.astype(jnp.float32) / 127.5 - 1.0
            # fp32 VAE encode by default, cast latents down (diffsim_xl.py:58-63);
            # bf16 when vae_fp32=False (see __init__)
            moments = vae.encoder_apply_chunked(
                params["vae"], pix.astype(self._enc_dtype).reshape(P * 2, H, W, 3))
            moments = moments.reshape(P, 2, h, h, 2 * latent_c)
            if inject_noise:
                # cross-framework parity mode: ``key`` carries explicit per-role noise
                # (eps_vae (2,h,w,C), eps_n (2,h,w,C)) shared by both frameworks
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
            z = z.astype(self.dtype)
            if not inject_noise:
                eps_n = jnp.stack(
                    [
                        jax.random.normal(prng.role_key(key, prng.NOISE_A), (h, h, latent_c)),
                        jax.random.normal(prng.role_key(key, prng.NOISE_B), (h, h, latent_c)),
                    ]
                )[None]
            x = (a * z.astype(jnp.float32) + b * eps_n).astype(self.dtype)

            seq, hid = embeds.shape[-2:]
            time_ids = jnp.asarray(self.default_time_ids())
            if cfg_parity:
                x_in = x[:, jnp.array([0, 0, 1, 1])].reshape(P * 4, h, h, latent_c)
                ctx = embeds[:, jnp.array([0, 1, 0, 1])].reshape(P * 4, seq, hid)
                pool = pooled[:, jnp.array([0, 1, 0, 1])].reshape(P * 4, -1)
                n_in = P * 4
                per_img = 2
            else:
                x_in = x.reshape(P * 2, h, h, latent_c)
                ctx = embeds[:, jnp.array([1, 1])].reshape(P * 2, seq, hid)
                pool = pooled[:, jnp.array([1, 1])].reshape(P * 2, -1)
                n_in = P * 2
                per_img = 1

            added = {
                "text_embeds": pool.astype(self.dtype),
                "time_ids": jnp.tile(time_ids[None], (n_in, 1)),
            }
            ip_embeds = ip_scale = None
            if ip_enabled:
                # IP-Adapter image embeds from the scored images themselves; uncond half
                # uses the zero-image embedding (/root/reference/diffsim/diffsim_xl.py:78-94)
                cond = self._ip_embed(params, pix.reshape(P * 2, H, W, 3))
                t_tok, d_tok = cond.shape[-2:]
                cond = cond.reshape(P, 2, t_tok, d_tok)
                ip_embeds = [self._interleave_ip_embeds(cond, ip_uncond, cfg_parity, self.dtype)]
                ip_scale = [self._ip["scale"]]
            _, taps = unet.apply(
                params["unet"], x_in, jnp.float32(model_t), ctx, unet_cfg,
                tap=tap, added_cond=added, ip_embeds=ip_embeds, ip_scale=ip_scale,
            )
            nb = 2 * per_img
            if tap.capture == IP_QKV:
                q = taps["q"].reshape((P, nb) + taps["q"].shape[1:])
                ip_k = [t_.reshape((P, nb) + t_.shape[1:]) for t_ in taps["ip_k"]]
                ip_v = [t_.reshape((P, nb) + t_.shape[1:]) for t_ in taps["ip_v"]]
                return readout.cross_attention_score_ip(
                    q[:, :per_img], [t_[:, :per_img] for t_ in ip_k],
                    [t_[:, :per_img] for t_ in ip_v],
                    q[:, per_img:], [t_[:, per_img:] for t_ in ip_k],
                    [t_[:, per_img:] for t_ in ip_v], similarity,
                )
            q, k, v = taps["q"], taps["k"], taps["v"]
            q = q.reshape((P, nb) + q.shape[1:])
            k = k.reshape((P, nb) + k.shape[1:])
            v = v.reshape((P, nb) + v.shape[1:])
            return readout.cross_attention_score(
                q[:, :per_img], k[:, :per_img], v[:, :per_img],
                q[:, per_img:], k[:, per_img:], v[:, per_img:], similarity,
            )

        return self._jit_pairs(fn, n_data=3)

    def _default_resampler_cfg(self):
        from diffsim_tpu.models import ip_adapter as ipm

        return ipm.ResamplerConfig.sdxl_plus()

    @functools.lru_cache(maxsize=16)
    def _triplet_tail(self, tap: TapSpec, similarity: str):
        """moments (T,3,h,h,2C) pair-major + per-T embeds/pooled -> (s_ab, s_ac): everything
        downstream of the VAE encode, shared verbatim by the pixel path (_triplet_fn) and
        the cached-moment path (_cached_triplet_fn) so cache hits score bit-identically."""
        unet_cfg, vae_cfg = self.unet_cfg, self.vae_cfg
        cfg_parity = self.cfg_parity
        latent_c = vae_cfg.latent_channels

        def fn(params, moments, embeds, pooled, noise_sab, key):
            model_t, a, b = noise_sab
            T, three, h, _, _ = moments.shape
            eps_a = jax.random.normal(prng.role_key(key, prng.VAE_A), (h, h, latent_c))
            eps_b = jax.random.normal(prng.role_key(key, prng.VAE_B), (h, h, latent_c))
            if self.vae_mode:
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, mode=True)
            else:
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor,
                                       noise=jnp.stack([eps_a, eps_b, eps_b])[None])
            z = z.astype(self.dtype)
            n_a = jax.random.normal(prng.role_key(key, prng.NOISE_A), (h, h, latent_c))
            n_b = jax.random.normal(prng.role_key(key, prng.NOISE_B), (h, h, latent_c))
            x = (a * z.astype(jnp.float32) + b * jnp.stack([n_a, n_b, n_b])[None]).astype(self.dtype)

            seq, hid = embeds.shape[-2:]
            time_ids = jnp.asarray(self.default_time_ids())
            if cfg_parity:
                x_in = x[:, jnp.array([0, 0, 1, 1, 2, 2])].reshape(T * 6, h, h, latent_c)
                ctx = embeds[:, jnp.array([0, 1, 0, 1, 0, 1])].reshape(T * 6, seq, hid)
                pool = pooled[:, jnp.array([0, 1, 0, 1, 0, 1])].reshape(T * 6, -1)
                n_in, per_img = T * 6, 2
            else:
                x_in = x.reshape(T * 3, h, h, latent_c)
                ctx = embeds[:, jnp.array([1, 1, 1])].reshape(T * 3, seq, hid)
                pool = pooled[:, jnp.array([1, 1, 1])].reshape(T * 3, -1)
                n_in, per_img = T * 3, 1
            added = {
                "text_embeds": pool.astype(self.dtype),
                "time_ids": jnp.tile(time_ids[None], (n_in, 1)),
            }
            _, taps = unet.apply(params["unet"], x_in, jnp.float32(model_t), ctx, unet_cfg,
                                 tap=tap, added_cond=added)
            nb = 3 * per_img
            q, k, v = (t_.reshape((T, nb) + t_.shape[1:]) for t_ in (taps["q"], taps["k"], taps["v"]))
            sa = slice(0, per_img)
            sb = slice(per_img, 2 * per_img)
            sc = slice(2 * per_img, 3 * per_img)
            s_ab = readout.cross_attention_score(
                q[:, sa], k[:, sa], v[:, sa], q[:, sb], k[:, sb], v[:, sb], similarity)
            s_ac = readout.cross_attention_score(
                q[:, sa], k[:, sa], v[:, sa], q[:, sc], k[:, sc], v[:, sc], similarity)
            return s_ab, s_ac

        return fn

    @functools.lru_cache(maxsize=16)
    def _triplet_fn(self, tap: TapSpec, similarity: str):
        """Triplet-fused variant sharing image A's work — bit-identical to two pair calls
        (the reference reseeds its generator per call): VAE-encode fresh pixels, then the
        shared tail."""
        vae_cfg = self.vae_cfg
        latent_c = vae_cfg.latent_channels
        down = vae_cfg.downscale
        tail = self._triplet_tail(tap, similarity)

        def fn(params, pix, embeds, pooled, noise_sab, key):
            T, three, H, W, _ = pix.shape
            h = H // down
            if pix.dtype == jnp.uint8:
                pix = pix.astype(jnp.float32) / 127.5 - 1.0
            moments = vae.encoder_apply_chunked(
                params["vae"], pix.astype(self._enc_dtype).reshape(T * 3, H, W, 3)
            )
            moments = moments.reshape(T, 3, h, h, 2 * latent_c)
            return tail(params, moments, embeds, pooled, noise_sab, key)

        if self.mesh is not None:
            from diffsim_tpu.parallel import mesh as meshlib

            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh, in_shardings=(rs, ds, ds, ds, rs, rs),
                                      out_shardings=(ds, ds))
        return jax.jit(fn)

    # ------------------------------------------------------------------
    # device-resident moment cache: skip upload AND VAE encode for repeated images
    # (same design as DiffSimSD15 — runtime/device_cache.py; the fp32 XL encode is 55%
    # of per-pair compute at 1024px, so hits are an even bigger win here)
    # ------------------------------------------------------------------

    _moment_cache = None
    moment_cache_mb: float | None = None  # None => $DIFFSIM_TPU_MOMENT_CACHE_MB or 512

    def _ensure_moment_cache(self):
        if self._moment_cache is None:
            from diffsim_tpu.runtime.device_cache import make_moment_cache

            self._moment_cache = make_moment_cache(self, self._enc_dtype)
        return self._moment_cache

    @functools.lru_cache(maxsize=16)
    def _cached_triplet_fn(self, tap: TapSpec, similarity: str):
        """Triplet scoring from cached moments: gather pool[idx] on device, index the
        unique-prompt tables by pidx, then the shared tail."""
        tail = self._triplet_tail(tap, similarity)

        def fn(params, pool, idx3, embeds_u, pooled_u, pidx, noise_sab, key):
            # idx3 (T,3) slot indices; embeds_u (U,2,77,hid); pooled_u (U,2,proj); pidx (T,)
            return tail(params, pool[idx3], embeds_u[pidx], pooled_u[pidx], noise_sab, key)

        if self.mesh is not None:
            from diffsim_tpu.parallel import mesh as meshlib

            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh,
                                      in_shardings=(rs, rs, ds, rs, rs, ds, rs, rs),
                                      out_shardings=(ds, ds))
        return jax.jit(fn)

    @functools.lru_cache(maxsize=16)
    def _cached_triplet_scan_fn(self, tap: TapSpec, similarity: str):
        """Scan-chunked variant of _cached_triplet_fn: the whole window is ONE jitted
        program — one launch + one fetch instead of one per chunk (the relay charges
        ~0.5 s latency per launch/fetch, which dominated the XL@1024 cached window at
        4-6 chunks); shared wrapper: runtime.device_cache.make_window_scan."""
        from diffsim_tpu.runtime.device_cache import make_window_scan

        tail = self._triplet_tail(tap, similarity)

        def invoke(params, pool, idx3, embeds_u, pooled_u, pidx, noise_sab, key):
            return tail(params, pool[idx3], embeds_u[pidx], pooled_u[pidx],
                        noise_sab, key)

        # args after (params, pool): idx3*, embeds_u, pooled_u, pidx*, noise_sab, key
        return make_window_scan(self.mesh, invoke, chunked=(0, 3), n_args=6)

    def _embeds_and_idx(self, prompts):
        """Unique-prompt tables ((U,2,77,hid), (U,2,proj)) + per-item int32 index —
        benchmarks reuse a handful of prompts across thousands of comparisons, so the
        per-batch embed upload shrinks from (T,...) to (U,...) + T ints."""
        uniq, index, idx = [], {}, []
        for p in prompts:
            if p not in index:
                index[p] = len(uniq)
                uniq.append(self.encode_prompt(p))
            idx.append(index[p])
        embeds_u = np.stack([e for e, _ in uniq])
        pooled_u = np.stack([q for _, q in uniq])
        return embeds_u, pooled_u, np.asarray(idx, np.int32)

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
        prompt="",
        target_block: str = "up_blocks",
        target_layer=(0, 0, 0),
        target_step: int = 900,
        similarity: str = "cosine",
        seed: int = 2333,
        blocking: bool = True,
        chunk: int | None = None,
    ):
        """(s_ab, s_ac) for T triplets given image PATHS through the device-resident moment
        cache — each unique image uploaded + fp32-VAE-encoded ONCE (see DiffSimSD15's
        docstring; the XL encode is the dominant per-pair stage at 1024px, so hits skip
        even more work here)."""
        from diffsim_tpu.core.image import load_and_process_u8
        from diffsim_tpu.runtime.device_cache import ensure_image_slots

        tap = sdxl_tap(target_block, target_layer, False)
        spec = schedulers.sdxl_noise_spec(target_step)
        T = len(paths_a)
        assert len(paths_b) == T and len(paths_c) == T
        cache = self._ensure_moment_cache()
        idx3 = ensure_image_slots(cache, (paths_a, paths_b, paths_c), (pix_a, pix_b, pix_c),
                                  loader, lambda k: load_and_process_u8(k, self.img_size),
                                  row_map=row_map)

        prompts = [prompt] * T if isinstance(prompt, str) else list(prompt)
        from diffsim_tpu.runtime.device_cache import resolve_cached_chunk

        step, n = resolve_cached_chunk(self.mesh, T, chunk, self.img_size, scorer=self)
        pad = n - T
        if pad:
            idx3 = np.concatenate([idx3, np.repeat(idx3[-1:], pad, 0)], axis=0)
            prompts = prompts + [prompts[-1]] * pad
        embeds_u, pooled_u, pidx = self._embeds_and_idx(prompts)
        sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
        key = jax.random.PRNGKey(int(seed))
        if step < n:
            shape = (n // step, step)
            fn = self._cached_triplet_scan_fn(tap, similarity)
            s_ab, s_ac = fn(self.params, cache.pool, idx3.reshape(shape + (3,)),
                            embeds_u, pooled_u, pidx.reshape(shape), sab, key)
        else:
            fn = self._cached_triplet_fn(tap, similarity)
            s_ab, s_ac = fn(self.params, cache.pool, idx3, embeds_u, pooled_u, pidx,
                            sab, key)
        return fetchable_pair(s_ab, s_ac, T, pad, blocking)

    def score_batch(
        self,
        pix_a: np.ndarray,
        pix_b: np.ndarray,
        *,
        prompt="",
        target_block: str = "up_blocks",
        target_layer=(0, 0, 0),
        target_step: int = 900,
        similarity: str = "cosine",
        seed: int = 2333,
        ip_adapter: bool = False,
        blocking: bool = True,
        noise_override: tuple | None = None,
    ):
        """``noise_override``: (eps_vae, eps_noise), each (2, h, h, latent_c) per-role arrays
        replacing the seed-derived draws — the cross-framework parity mode where torch and
        JAX consume identical noise (SURVEY.md "PRNG parity")."""
        tap = sdxl_tap(target_block, target_layer, ip_adapter)
        spec = schedulers.sdxl_noise_spec(target_step)
        prompts = [prompt] * pix_a.shape[0] if isinstance(prompt, str) else list(prompt)
        pix, prompts, P, pad = self._pad_pairs(pix_a, pix_b, prompts)
        enc = [self.encode_prompt(p) for p in prompts]
        embeds = np.stack([e for e, _ in enc])
        pooled = np.stack([p for _, p in enc])
        if ip_adapter:
            self._auto_enable_ip()
        ip_uncond = (jnp.asarray(self._ip_uncond) if ip_adapter
                     else jnp.zeros((1, 1, 1), self.dtype))
        if noise_override is not None:
            key = tuple(jnp.asarray(e, jnp.float32) for e in noise_override)
        else:
            key = jax.random.PRNGKey(int(seed))
        fn = self._score_fn(tap, similarity, inject_noise=noise_override is not None)
        scores = fn(
            self.params,
            jnp.asarray(pix),
            embeds,
            pooled,
            (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b)),
            key,
            ip_uncond,
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
        prompt="",
        target_block: str = "up_blocks",
        target_layer=(0, 0, 0),
        target_step: int = 900,
        similarity: str = "cosine",
        seed: int = 2333,
        blocking: bool = True,
        chunk: int | None = None,
    ):
        from diffsim_tpu.runtime.device_cache import resolve_cached_chunk

        tap = sdxl_tap(target_block, target_layer, False)
        spec = schedulers.sdxl_noise_spec(target_step)
        T = pix_a.shape[0]
        transport = np.uint8 if pix_a.dtype == np.uint8 else self.dtype
        pix = np.stack([pix_a, pix_b, pix_c], axis=1).astype(transport)
        prompts = [prompt] * T if isinstance(prompt, str) else list(prompt)
        # shared chunk policy + pre-flight HBM guard (runtime.hbm_guard): large T is
        # dispatched as step-sized launches (same host-level loop as the cached path)
        # instead of first-compiling a monolithic over-budget graph
        step, n = resolve_cached_chunk(self.mesh, T, chunk, self.img_size, scorer=self,
                                       arg_itemsize=np.dtype(transport).itemsize)
        pad = n - T
        if pad:
            pix = np.concatenate([pix, np.repeat(pix[-1:], pad, 0)], axis=0)
            prompts = prompts + [prompts[-1]] * pad
        enc = [self.encode_prompt(p) for p in prompts]
        embeds = np.stack([e for e, _ in enc])
        pooled = np.stack([p for _, p in enc])
        fn = self._triplet_fn(tap, similarity)
        sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
        key = jax.random.PRNGKey(int(seed))
        outs = [
            fn(self.params, jnp.asarray(pix[i:i + step]), embeds[i:i + step],
               pooled[i:i + step], sab, key)
            for i in range(0, n, step)
        ]

        def fetch():
            got = jax.device_get(outs)  # one relay round-trip for all chunks
            a_ = np.concatenate([np.asarray(o[0], np.float32) for o in got])
            c_ = np.concatenate([np.asarray(o[1], np.float32) for o in got])
            return (a_[:T], c_[:T]) if pad else (a_, c_)

        return fetch() if blocking else fetch

    def diffsim_score(self, image_a, image_b, img_size=None, prompt="", target_block="up_blocks",
                      target_layer=(0, 0, 0), target_step=900, similarity="cosine", seed=2333,
                      ip_adapter=False):
        """Reference-shaped single-pair API (/root/reference/diffsim/diffsim_xl.py:65)."""
        size = img_size or self.img_size
        pa = load_and_process(image_a, size)
        pb = load_and_process(image_b, size)
        return float(
            self.score_batch(pa, pb, prompt=prompt, target_block=target_block,
                             target_layer=target_layer, target_step=target_step,
                             similarity=similarity, seed=seed, ip_adapter=ip_adapter)[0]
        )
