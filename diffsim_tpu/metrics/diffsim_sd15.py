"""DiffSim scorer, SD-1.5 backbone — the flagship metric.

Torch reference: /root/reference/diffsim/diffsim.py (class DiffSim) driving a single-UNet-step
pipeline (/root/reference/diffsim/diffsim_pipeline.py:32-224) with hook-based Q/K/V extraction.

TPU design: one jitted graph per (pair-batch, tap, similarity):

    pixels (P,2,H,W,3) -> VAE encode -> DiagonalGaussian sample -> q_sample to t
    -> UNet forward over the CFG-doubled batch (4P) -> functional taps
    -> 4-way cross/self attention readout -> (P,) scores

batched over the pair axis and sharded over the mesh 'data' axis. Scores are 1:1 with the
reference protocol (including the CFG-doubled tap batch and the per-call generator reseed —
every pair sees the same seed-derived noise), up to PRNG stream differences (ranking parity,
not bitwise parity; see SURVEY.md "PRNG parity").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.core import prng, schedulers
from diffsim_tpu.core.image import load_and_process, load_and_process_u8
from diffsim_tpu.core.tokenizer import HashTokenizer
from diffsim_tpu.metrics import readout
from diffsim_tpu.models import clip_text, unet, vae
from diffsim_tpu.metrics.scorer_base import ScorerBase, fetchable_pair
from diffsim_tpu.ops.taps import IP_QKV, OUTPUT, QKV, TapSpec
from diffsim_tpu.parallel import mesh as meshlib


def sd15_tap(target_block: str, target_layer, ip_adapter: bool = False,
             fix_layer_collapse: bool = False, text_attn: bool = False) -> TapSpec:
    """Translate the reference CLI addressing into an absolute TapSpec.

    Reference semantics (/root/reference/diffsim/diffsim.py:99-145):
    * ``target_layer`` arrives as a list (argparse nargs='+'); a length-1 list is collapsed to
      layer **0** — the reference's Q2 bug, replicated by default so published configs (e.g.
      ipref --target_layer 5) score identically; pass ``fix_layer_collapse=True`` for the fix.
    * down taps address ``down_blocks[:-1][L]`` == absolute down block L;
      up taps address ``up_blocks[1:][L]`` == absolute up block L+1; always
      ``attentions[-1].transformer_blocks[-1]``.
    * ``text_attn`` taps the TEXT cross-attention (attn2) Q/K/V instead of attn1 — the
      reference declares ``--use_text_attn`` but never implements it
      (/root/reference/argprocess.py:17 is its only occurrence); this is the capability it
      promises, run through the same 4xSDPA readout.
    """
    if isinstance(target_layer, (list, tuple)):
        if len(target_layer) == 1:
            target_layer = target_layer[0] if fix_layer_collapse else 0
        else:
            raise ValueError("SD-1.5 takes a single target_layer index")
    attn = "attn2" if (ip_adapter or text_attn) else "attn1"
    capture = IP_QKV if ip_adapter else QKV
    if target_block == "down_blocks":
        return TapSpec("down", (int(target_layer), -1, -1), attn, capture)
    if target_block == "mid_blocks":
        return TapSpec("mid", (0, -1, -1), attn, capture)
    if target_block == "up_blocks":
        return TapSpec("up", (int(target_layer) + 1, -1, -1), attn, capture)
    raise ValueError(f"unknown target_block: {target_block}")


class DiffSimSD15(ScorerBase):
    """Batched SD-1.5 DiffSim. ``params`` is {'unet','vae','text'}; if None, randomly
    initialized (tests / throughput benchmarking — scores are meaningless without converted
    weights, rankings/throughput machinery is identical)."""

    def __init__(
        self,
        params=None,
        *,
        unet_cfg: unet.UNetConfig | None = None,
        vae_cfg: vae.VAEConfig | None = None,
        text_cfg: clip_text.CLIPTextConfig | None = None,
        img_size: int = 512,
        dtype=jnp.bfloat16,
        mesh=None,
        tokenizer=None,
        cfg_parity: bool = True,
        guidance_scale: float = 7.5,
        vae_mode: bool = False,
        fast_softmax: bool = False,
        init_seed: int = 0,
    ):
        # vae_mode=True uses the posterior mean (diffusers .mode()) instead of sampling —
        # deterministic latents; the reference always samples (diffsim.py:94)
        self.vae_mode = vae_mode
        self.unet_cfg = unet_cfg or unet.UNetConfig.sd15()
        self.vae_cfg = vae_cfg or vae.VAEConfig.sd()
        self.text_cfg = text_cfg or clip_text.CLIPTextConfig.sd15()
        self.img_size = img_size
        self.dtype = dtype
        self.mesh = mesh
        # CFG parity: guidance_scale=7.5 in the reference turns on classifier-free guidance,
        # so the tapped batch contains [uncond, cond] halves and both enter the score
        # (quirk Q1, /root/reference/diffsim/diffsim_pipeline.py:140-141,208). cfg_parity=False
        # drops the uncond half for a ~2x speedup at the cost of exact score parity.
        self.cfg_parity = cfg_parity and guidance_scale > 1.0
        # fast mode (--bf16_softmax): UNet attention probabilities in bf16
        # (ops.attention.fast_softmax) — faster, NOT torch-f32-softmax-parity; the VAE
        # encode stays f32-softmax so cached moments are identical across modes.
        # Set at construction only: the graph builders are lru_cached per (self, tap, ...).
        self.fast_softmax = fast_softmax
        if tokenizer is None and params is not None:
            # same loud-warning contract as _auto_enable_ip: the run keeps working (tests,
            # throughput) but converted weights + hash-tokenized prompts score garbage
            print("[tokenizer] weights were supplied but no CLIP tokenizer — falling back to "
                  "the HashTokenizer, so prompt embeddings are GARBAGE and scores are "
                  "meaningless. Pass tokenizer=CLIPTokenizer.from_files(vocab.json, "
                  "merges.txt) (CLI: --tokenizer_dir) for real scoring.")
        self.tokenizer = tokenizer or HashTokenizer(self.text_cfg.vocab_size)
        if params is None:
            # one jitted on-device build (scorer_base._init_random): no 1.8 GB relay upload
            def build():
                k = jax.random.PRNGKey(init_seed)
                ku, kv, kt = jax.random.split(k, 3)
                return {
                    "unet": unet.init(ku, self.unet_cfg, dtype),
                    "vae": vae.encoder_init(kv, self.vae_cfg, dtype),
                    "text": clip_text.init(kt, self.text_cfg, dtype),
                }

            self.params = self._init_random(build)
        else:
            self.params = self._place(params)
        self._prompt_cache: dict[str, jax.Array] = {}
        self._encode_jit = jax.jit(
            lambda p, ids: clip_text.apply(p, ids, self.text_cfg)["last_hidden_state"]
        )

    def _default_resampler_cfg(self):
        from diffsim_tpu.models import ip_adapter as ipm

        return ipm.ResamplerConfig.sd15_plus()

    # ------------------------------------------------------------------
    # prompt encoding (cached per prompt string; the reference re-encodes per step call)
    # ------------------------------------------------------------------

    def encode_prompt(self, prompt: str) -> np.ndarray:
        """(2, 77, hidden): [uncond(""), cond(prompt)] final-LN hidden states, cached as host
        arrays so batched stacks can be placed under any sharding."""
        if prompt not in self._prompt_cache:
            ids = jnp.asarray(self.tokenizer(["", prompt]))
            embeds = self._encode_jit(self.params["text"], ids).astype(self.dtype)
            self._prompt_cache[prompt] = np.asarray(jax.device_get(embeds))
        return self._prompt_cache[prompt]

    def _embeds_and_idx(self, prompts):
        """Unique-prompt embedding table (U,2,77,hid) + per-item int32 index. Benchmarks reuse
        a handful of prompts across thousands of comparisons; uploading the unique table plus
        indices replaces a per-batch (P,2,77,hid) host stack + upload."""
        uniq, index, idx = [], {}, []
        for p in prompts:
            if p not in index:
                index[p] = len(uniq)
                uniq.append(self.encode_prompt(p))
            idx.append(index[p])
        return np.stack(uniq), np.asarray(idx, np.int32)

    @functools.lru_cache(maxsize=256)
    def _noise_consts(self, target_step: int, seed: int):
        """Device-resident (noise_sab, key) per (step, seed): tiny per-call uploads have
        multi-ms latency on the host<->device relay and add up across queued batches."""
        spec = schedulers.sd15_noise_spec(target_step)
        sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
        return sab, jax.random.PRNGKey(int(seed))

    # ------------------------------------------------------------------
    # the fused scoring graph
    # ------------------------------------------------------------------

    @functools.lru_cache(maxsize=32)
    def _score_fn(self, tap: TapSpec, similarity: str, ip_enabled: bool = False,
                  use_mask: bool = False, inject_noise: bool = False):
        unet_cfg, vae_cfg = self.unet_cfg, self.vae_cfg
        cfg_parity = self.cfg_parity
        latent_c = vae_cfg.latent_channels
        down = vae_cfg.downscale

        def fn(params, pix_a, pix_b, embeds_u, pidx, ip_uncond, masks, noise_sab, key):
            # pix_a/pix_b (P,H,W,3) — uploaded as separate role arrays so the host never
            # materializes a stacked batch (a 56 MB np.stack costs ~1.8 s on this 1-core
            # host, more than the whole device compute); the interleave happens on device.
            # embeds_u (U,2,77,hidden) unique [neg,pos] embeds; pidx (P,) prompt index.
            model_t, a, b = noise_sab
            P, H, W, _ = pix_a.shape
            h, w = H // down, W // down

            pix = jnp.concatenate([pix_a, pix_b], axis=0)  # (2P,H,W,3) role-major
            if pix.dtype == jnp.uint8:
                # transport-optimized path: pixels travel as uint8 (4x less relay traffic),
                # the [-1, 1] mapping is fused into the graph
                pix = (pix.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
            moments = vae.encoder_apply_chunked(params["vae"], pix)
            # (2P,h,w,2C) role-major -> (P,2,h,w,2C) pair-major (tiny device transpose)
            moments = moments.reshape(2, P, h, w, 2 * latent_c).transpose(1, 0, 2, 3, 4)
            embeds = embeds_u[pidx]  # (P,2,seq,hid)
            # reference draw order per pair: vae_A, vae_B, noise_A, noise_B — one seeded
            # stream reused for every pair (the generator is reseeded per call)
            if inject_noise:
                # cross-framework parity mode: ``key`` carries explicit role noise
                # (eps_vae (2,h,w,C), eps_n (2,h,w,C)) shared by both frameworks
                # (SURVEY.md "PRNG parity")
                eps_vae, eps_n = (e[None] for e in key)
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, noise=eps_vae)
            elif self.vae_mode:
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, mode=True)
            else:
                eps_vae = jnp.stack(
                    [
                        jax.random.normal(prng.role_key(key, prng.VAE_A), (h, w, latent_c)),
                        jax.random.normal(prng.role_key(key, prng.VAE_B), (h, w, latent_c)),
                    ]
                )[None]
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, noise=eps_vae)

            if not inject_noise:
                eps_n = jnp.stack(
                    [
                        jax.random.normal(prng.role_key(key, prng.NOISE_A), (h, w, latent_c)),
                        jax.random.normal(prng.role_key(key, prng.NOISE_B), (h, w, latent_c)),
                    ]
                )[None]
            x = (a * z.astype(jnp.float32) + b * eps_n).astype(z.dtype)

            seq, hid = embeds.shape[-2:]
            if cfg_parity:
                # per-image CFG doubling: [uncond_a, cond_a, uncond_b, cond_b]
                x_in = x[:, jnp.array([0, 0, 1, 1])].reshape(P * 4, h, w, latent_c)
                ctx = embeds[:, jnp.array([0, 1, 0, 1])].reshape(P * 4, seq, hid)
                per_img = 2
            else:
                x_in = x.reshape(P * 2, h, w, latent_c)
                ctx = embeds[:, jnp.array([1, 1])].reshape(P * 2, seq, hid)
                per_img = 1

            ip_embeds = ip_scale = None
            if ip_enabled:
                # IP-Adapter image embeds from the scored images themselves (the reference
                # passes ip_A = A, /root/reference/diffsim/diffsim.py:115-117); the uncond
                # half uses the zero-image embedding, as diffusers' encode_image does
                cond = self._ip_embed(params, pix)  # (2P,...) role-major
                t_tok, d_tok = cond.shape[-2:]
                cond = cond.reshape(2, P, t_tok, d_tok).transpose(1, 0, 2, 3)
                ip_embeds = [self._interleave_ip_embeds(cond, ip_uncond, cfg_parity, self.dtype)]
                ip_scale = [self._ip["scale"]]

            _, taps = unet.apply(
                params["unet"], x_in, jnp.float32(model_t), ctx, unet_cfg, tap=tap,
                ip_embeds=ip_embeds, ip_scale=ip_scale,
            )
            nb = 2 * per_img
            if tap.capture == IP_QKV:
                q = taps["q"].reshape((P, nb) + taps["q"].shape[1:])
                ip_k = [t_.reshape((P, nb) + t_.shape[1:]) for t_ in taps["ip_k"]]
                ip_v = [t_.reshape((P, nb) + t_.shape[1:]) for t_ in taps["ip_v"]]
                return readout.cross_attention_score_ip(
                    q[:, :per_img], [t_[:, :per_img] for t_ in ip_k], [t_[:, :per_img] for t_ in ip_v],
                    q[:, per_img:], [t_[:, per_img:] for t_ in ip_k], [t_[:, per_img:] for t_ in ip_v],
                    similarity,
                )
            if tap.capture == OUTPUT:
                # diffeats readout: attn1 output features, per-image min-max normalize,
                # cosine (/root/reference/metrics/diffeats.py:136-205)
                out = taps["out"]
                out = out.reshape((P, nb) + out.shape[1:])
                return readout.feature_score(
                    out[:, :per_img], out[:, per_img:], similarity, minmax_normalize=True
                )
            q, k, v = taps["q"], taps["k"], taps["v"]
            q = q.reshape((P, nb) + q.shape[1:])
            k = k.reshape((P, nb) + k.shape[1:])
            v = v.reshape((P, nb) + v.shape[1:])
            qa, qb = q[:, :per_img], q[:, per_img:]
            ka, kb = k[:, :per_img], k[:, per_img:]
            va, vb = v[:, :per_img], v[:, per_img:]
            if use_mask:
                # mask-weighted queries (the reference's SAM use_mask capability with
                # precomputed masks, metrics/diffeats.py:75-87): taps at self-attention
                # sites have one token per latent cell
                side = int(round(q.shape[-2] ** 0.5))
                w_lat = readout.mask_to_latent(masks, side)  # (P, 2, S)
                qa = qa * w_lat[:, 0, None, None, :, None].astype(qa.dtype)
                qb = qb * w_lat[:, 1, None, None, :, None].astype(qb.dtype)
            return readout.cross_attention_score(qa, ka, va, qb, kb, vb, similarity)

        # fast mode wraps the WHOLE pair graph (VAE included) — unlike the triplet
        # path, whose VAE encode stays f32 (cached moments must be mode-independent)
        fn = self._wrap_fast_softmax(fn)
        if self.mesh is not None:
            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(
                fn,
                self.mesh,
                in_shardings=(rs, ds, ds, rs, ds, rs, rs, rs, rs),
                out_shardings=ds,
            )
        return jax.jit(fn)


    def _wrap_fast_softmax(self, fn):
        """Enter the bf16-softmax context while TRACING fn (same trace-time-context
        pattern as parallel.mesh.kernel_jit)."""
        if not self.fast_softmax:
            return fn
        from diffsim_tpu.ops import attention as attention_mod

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with attention_mod.fast_softmax(True):
                return fn(*args, **kwargs)

        return wrapped

    @functools.lru_cache(maxsize=32)
    def _triplet_tail(self, tap: TapSpec, similarity: str):
        """moments (T,3,h,w,2C) pair-major -> (s_ab, s_ac): everything downstream of the VAE
        encode, shared verbatim by the pixel path (_triplet_body) and the cached-moment path
        (_cached_triplet_fn) so cache hits score bit-identically to fresh encodes."""
        unet_cfg, vae_cfg = self.unet_cfg, self.vae_cfg
        cfg_parity = self.cfg_parity
        latent_c = vae_cfg.latent_channels

        def fn(params, moments, embeds_u, pidx, noise_sab, key):
            model_t, a, b = noise_sab
            T, _, h, w, _ = moments.shape
            embeds = embeds_u[pidx]  # (T,2,seq,hid)
            # roles: A keeps its draws; B and C each play "image B" of their own pair
            eps_a = jax.random.normal(prng.role_key(key, prng.VAE_A), (h, w, latent_c))
            eps_b = jax.random.normal(prng.role_key(key, prng.VAE_B), (h, w, latent_c))
            if self.vae_mode:
                z = vae.sample_latents(moments, None, vae_cfg.scaling_factor, mode=True)
            else:
                z = vae.sample_latents(
                    moments, None, vae_cfg.scaling_factor,
                    noise=jnp.stack([eps_a, eps_b, eps_b])[None],
                )
            n_a = jax.random.normal(prng.role_key(key, prng.NOISE_A), (h, w, latent_c))
            n_b = jax.random.normal(prng.role_key(key, prng.NOISE_B), (h, w, latent_c))
            x = (a * z.astype(jnp.float32) + b * jnp.stack([n_a, n_b, n_b])[None]).astype(z.dtype)

            seq, hid = embeds.shape[-2:]
            if cfg_parity:
                x_in = x[:, jnp.array([0, 0, 1, 1, 2, 2])].reshape(T * 6, h, w, latent_c)
                ctx = embeds[:, jnp.array([0, 1, 0, 1, 0, 1])].reshape(T * 6, seq, hid)
                per_img = 2
            else:
                x_in = x.reshape(T * 3, h, w, latent_c)
                ctx = embeds[:, jnp.array([1, 1, 1])].reshape(T * 3, seq, hid)
                per_img = 1

            _, taps = unet.apply(
                params["unet"], x_in, jnp.float32(model_t), ctx, unet_cfg, tap=tap
            )
            nb = 3 * per_img
            q, k, v = (
                t_.reshape((T, nb) + t_.shape[1:]) for t_ in (taps["q"], taps["k"], taps["v"])
            )
            sl_a = slice(0, per_img)
            sl_b = slice(per_img, 2 * per_img)
            sl_c = slice(2 * per_img, 3 * per_img)
            s_ab = readout.cross_attention_score(
                q[:, sl_a], k[:, sl_a], v[:, sl_a], q[:, sl_b], k[:, sl_b], v[:, sl_b], similarity
            )
            s_ac = readout.cross_attention_score(
                q[:, sl_a], k[:, sl_a], v[:, sl_a], q[:, sl_c], k[:, sl_c], v[:, sl_c], similarity
            )
            return s_ab, s_ac

        return self._wrap_fast_softmax(fn)

    @functools.lru_cache(maxsize=32)
    def _triplet_body(self, tap: TapSpec, similarity: str):
        """Unjitted per-chunk body of the triplet-fused scoring graph (see _triplet_fn):
        VAE-encode fresh pixels, then the shared tail."""
        vae_cfg = self.vae_cfg
        latent_c = vae_cfg.latent_channels
        down = vae_cfg.downscale
        tail = self._triplet_tail(tap, similarity)

        def fn(params, pix_a, pix_b, pix_c, embeds_u, pidx, noise_sab, key):
            # pix_a/b/c (T,H,W,3) separate role arrays (no host-side stacking — see _score_fn);
            # embeds_u (U,2,77,hidden) unique [neg,pos] embeds; pidx (T,) prompt index
            T, H, W, _ = pix_a.shape
            h, w = H // down, W // down
            pix = jnp.concatenate([pix_a, pix_b, pix_c], axis=0)  # (3T,H,W,3) role-major
            if pix.dtype == jnp.uint8:
                pix = (pix.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
            moments = vae.encoder_apply_chunked(params["vae"], pix)
            moments = moments.reshape(3, T, h, w, 2 * latent_c).transpose(1, 0, 2, 3, 4)
            return tail(params, moments, embeds_u, pidx, noise_sab, key)

        return fn

    @functools.lru_cache(maxsize=32)
    def _triplet_fn(self, tap: TapSpec, similarity: str):
        """Triplet-fused variant of the scoring graph for the benchmarks' 2AFC structure:
        sim(A,B) and sim(A,C) share image A's VAE encode, noising and UNet forwards exactly
        (the reference reseeds its generator per call, so A's draws are identical in both
        pairs — /root/reference/diffsim/diffsim.py:109-169). 3 images / 6 CFG forwards per
        triplet instead of 4 / 8: ~25% less compute and host->device traffic."""
        fn = self._triplet_body(tap, similarity)
        if self.mesh is not None:
            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh, in_shardings=(rs, ds, ds, ds, rs, ds, rs, rs),
                                      out_shardings=(ds, ds))
        return jax.jit(fn)

    @functools.lru_cache(maxsize=32)
    def _triplet_scan_fn(self, tap: TapSpec, similarity: str):
        """lax.scan over fixed-size chunks of triplets inside ONE jitted program.

        The host<->device relay in this environment charges ~0.5 s of latency per program
        launch and per device_get; scanning N chunks in one launch amortizes that to once per
        window (pixels live in HBM as uint8 and are normalized chunk-by-chunk inside the
        scan, so peak activation memory stays at chunk size). Scores match N separate
        _triplet_fn calls up to XLA fusion-order rounding (~1e-7 in fp32): every pair sees
        the same seed-derived role noise."""
        body = self._triplet_body(tap, similarity)

        def fn(params, pix_a, pix_b, pix_c, embeds_u, pidx, noise_sab, key):
            # pix_* (N, chunk, H, W, 3); pidx (N, chunk) -> (N, chunk) score pairs
            def step(_, xs):
                a_, b_, c_, idx = xs
                return None, body(params, a_, b_, c_, embeds_u, idx, noise_sab, key)

            _, out = jax.lax.scan(step, None, (pix_a, pix_b, pix_c, pidx))
            return out

        if self.mesh is not None:
            cs = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec(None, "data"))
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh, in_shardings=(rs, cs, cs, cs, rs, cs, rs, rs),
                                      out_shardings=(cs, cs))
        return jax.jit(fn)

    # ------------------------------------------------------------------
    # device-resident moment cache: skip upload AND VAE encode for repeated images
    # ------------------------------------------------------------------

    _moment_cache = None
    moment_cache_mb: float | None = None  # None => $DIFFSIM_TPU_MOMENT_CACHE_MB or 512

    def _ensure_moment_cache(self):
        """Lazily build the path-keyed VAE-moment pool (runtime.device_cache.make_moment_cache
        — shared across the SD-1.5/SDXL/DiT scorers)."""
        if self._moment_cache is None:
            from diffsim_tpu.runtime.device_cache import make_moment_cache

            self._moment_cache = make_moment_cache(self, self.dtype)
        return self._moment_cache

    @functools.lru_cache(maxsize=32)
    def _cached_triplet_fn(self, tap: TapSpec, similarity: str):
        """Triplet scoring from cached moments: gather pool[idx] on device, then the shared
        tail — numerically the fresh-encode graph with the encode amortized away."""
        tail = self._triplet_tail(tap, similarity)

        def fn(params, pool, idx3, embeds_u, pidx, noise_sab, key):
            # idx3 (T,3) slot indices [a,b,c] per triplet
            return tail(params, pool[idx3], embeds_u, pidx, noise_sab, key)

        if self.mesh is not None:
            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return meshlib.kernel_jit(fn, self.mesh, in_shardings=(rs, rs, ds, rs, ds, rs, rs),
                                      out_shardings=(ds, ds))
        return jax.jit(fn)

    @functools.lru_cache(maxsize=32)
    def _cached_triplet_scan_fn(self, tap: TapSpec, similarity: str):
        """Scan-chunked variant of _cached_triplet_fn (one launch + one fetch per window,
        see _triplet_scan_fn); shared wrapper: runtime.device_cache.make_window_scan."""
        from diffsim_tpu.runtime.device_cache import make_window_scan

        tail = self._triplet_tail(tap, similarity)

        def invoke(params, pool, idx3, embeds_u, pidx, noise_sab, key):
            return tail(params, pool[idx3], embeds_u, pidx, noise_sab, key)

        # args after (params, pool): idx3*, embeds_u, pidx*, noise_sab, key (* = chunked)
        return make_window_scan(self.mesh, invoke, chunked=(0, 2), n_args=5)

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
        target_layer=0,
        target_step: int = 600,
        similarity: str = "cosine",
        seed: int = 2333,
        fix_layer_collapse: bool = False,
        blocking: bool = True,
        chunk: int | None = None,
        text_attn: bool = False,
    ):
        """(s_ab, s_ac) for T triplets given image PATHS — the transport-eliminating entry
        point. Each unique path is uploaded + VAE-encoded ONCE into the device-resident
        moment pool; the scoring graph takes slot indices and gathers on device, so repeated
        images (every 2AFC protocol reuses them heavily) cost zero relay traffic and zero
        encode compute. Scores match score_triplet_batch up to XLA fusion-order rounding.

        ``pix_a/b/c``: optionally the already-decoded (T,H,W,3) uint8 arrays (the runner's
        prefetch pipeline has them in hand) — rows of first occurrence feed cache misses.
        Otherwise misses are decoded from disk via ``loader`` (or process_image_u8)."""
        from diffsim_tpu.runtime.device_cache import ensure_image_slots

        tap = sd15_tap(target_block, target_layer, False, fix_layer_collapse, text_attn)
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
        embeds_u, pidx = self._embeds_and_idx(prompts)
        sab, key = self._noise_consts(int(target_step), int(seed))
        if step < n:
            shape = (n // step, step)
            fn = self._cached_triplet_scan_fn(tap, similarity)
            s_ab, s_ac = fn(self.params, cache.pool, idx3.reshape(shape + (3,)),
                            embeds_u, pidx.reshape(shape), sab, key)
        else:
            fn = self._cached_triplet_fn(tap, similarity)
            s_ab, s_ac = fn(self.params, cache.pool, idx3, embeds_u, pidx, sab, key)
        return fetchable_pair(s_ab, s_ac, T, pad, blocking)

    def score_triplet_batch(
        self,
        pix_a: np.ndarray,
        pix_b: np.ndarray,
        pix_c: np.ndarray,
        *,
        prompt="",
        target_block: str = "up_blocks",
        target_layer=0,
        target_step: int = 600,
        similarity: str = "cosine",
        seed: int = 2333,
        fix_layer_collapse: bool = False,
        blocking: bool = True,
        chunk: int | None = None,
        text_attn: bool = False,
    ):
        """(s_ab, s_ac) for T 2AFC triplets — numerically identical to two score_batch calls,
        sharing A's work. Returns the two (T,) arrays (or a fetch callable).

        ``chunk``: process the batch as T//chunk scan steps of ``chunk`` triplets inside one
        jitted program — one launch + one fetch for the whole batch (the relay charges ~0.5 s
        latency per launch/fetch), with peak activation memory bounded by the chunk size.
        Matches the unchunked path up to XLA fusion-order float rounding."""
        from diffsim_tpu.runtime.device_cache import resolve_cached_chunk

        tap = sd15_tap(target_block, target_layer, False, fix_layer_collapse, text_attn)
        T = pix_a.shape[0]
        transport = np.uint8 if pix_a.dtype == np.uint8 else self.dtype
        roles = [np.asarray(p).astype(transport, copy=False) for p in (pix_a, pix_b, pix_c)]
        prompts = [prompt] * T if isinstance(prompt, str) else list(prompt)
        # shared chunk policy + pre-flight HBM guard: a large T auto-chunks onto the scan
        # path instead of first-compiling a monolithic over-budget graph (the round-4
        # 96-triplet wedge class); explicit over-budget chunks are refused on the host
        step, n = resolve_cached_chunk(self.mesh, T, chunk, self.img_size, scorer=self,
                                       arg_itemsize=np.dtype(transport).itemsize)
        pad = n - T
        if pad:
            roles = [np.concatenate([r, np.repeat(r[-1:], pad, 0)], axis=0) for r in roles]
            prompts = prompts + [prompts[-1]] * pad
        embeds_u, pidx = self._embeds_and_idx(prompts)
        sab, key = self._noise_consts(int(target_step), int(seed))
        if step < n:
            shape = (n // step, step)
            fn = self._triplet_scan_fn(tap, similarity)
            s_ab, s_ac = fn(
                self.params,
                *(r.reshape(shape + r.shape[1:]) for r in roles),
                embeds_u, pidx.reshape(shape), sab, key,
            )
        else:
            fn = self._triplet_fn(tap, similarity)
            s_ab, s_ac = fn(self.params, roles[0], roles[1], roles[2], embeds_u, pidx, sab, key)
        return fetchable_pair(s_ab, s_ac, T, pad, blocking)

    # enable_ip_adapter / _ip_embed live on ScorerBase (shared with the SDXL scorer —
    # /root/reference/diffsim/diffsim.py:86-89 and diffsim_xl.py:52-55 load the same stack)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def score_batch(
        self,
        pix_a: np.ndarray,
        pix_b: np.ndarray,
        *,
        prompt: str = "",
        target_block: str = "up_blocks",
        target_layer=0,
        target_step: int = 600,
        similarity: str = "cosine",
        seed: int = 2333,
        ip_adapter: bool = False,
        fix_layer_collapse: bool = False,
        blocking: bool = True,
        mask_a: np.ndarray | None = None,
        mask_b: np.ndarray | None = None,
        noise_override: tuple | None = None,
        text_attn: bool = False,
    ):
        """Score P pairs. pix_a/pix_b: (P, H, W, 3) float32 in [-1, 1] (see core.image).
        ``prompt`` is one string for all pairs or a list of P per-pair strings.

        ``blocking=False`` returns a zero-arg callable that fetches the (P,) scores — the
        dispatch is asynchronous, so callers can overlap the next batch's host work (decode,
        upload) with this batch's device compute.

        ``noise_override``: (eps_vae, eps_noise), each (2, h, w, latent_c) per-role arrays
        replacing the seed-derived draws — the cross-framework parity mode where torch and
        JAX consume identical noise (SURVEY.md "PRNG parity")."""
        from diffsim_tpu.runtime import hbm_guard

        tap = sd15_tap(target_block, target_layer, ip_adapter, fix_layer_collapse, text_attn)
        P = pix_a.shape[0]
        transport_dtype = np.uint8 if pix_a.dtype == np.uint8 else self.dtype
        # refuse over-budget graphs (at the PADDED size the mesh compiles) pre-build
        quantum = meshlib.data_axis_size(self.mesh) if self.mesh is not None else 1
        hbm_guard.check_pairs(self, meshlib.pad_to_multiple(P, quantum),
                              np.dtype(transport_dtype).itemsize)
        roles = [np.asarray(p).astype(transport_dtype, copy=False) for p in (pix_a, pix_b)]
        prompts = [prompt] * P if isinstance(prompt, str) else list(prompt)
        assert len(prompts) == P, (len(prompts), P)
        pad = 0
        if self.mesh is not None:
            target = meshlib.pad_to_multiple(P, meshlib.data_axis_size(self.mesh))
            pad = target - P
            if pad:
                roles = [np.concatenate([r, np.repeat(r[-1:], pad, 0)], axis=0) for r in roles]
                prompts = prompts + [prompts[-1]] * pad
        embeds_u, pidx = self._embeds_and_idx(prompts)
        sab, key = self._noise_consts(int(target_step), int(seed))
        if ip_adapter:
            self._auto_enable_ip()
        ip_enabled = bool(ip_adapter and self._ip is not None)
        use_mask = mask_a is not None
        if use_mask:
            masks = np.stack([mask_a, mask_b], axis=1).astype(np.float32)
            if pad:
                masks = np.concatenate([masks, np.repeat(masks[-1:], pad, 0)], axis=0)
        else:
            masks = np.zeros((1, 2, 1, 1), np.float32)
        if noise_override is not None:
            key = tuple(jnp.asarray(e, jnp.float32) for e in noise_override)
        fn = self._score_fn(tap, similarity, ip_enabled, use_mask,
                            inject_noise=noise_override is not None)
        ip_uncond = jnp.asarray(self._ip_uncond) if ip_enabled else jnp.zeros((1, 1, 1), self.dtype)
        scores = fn(self.params, roles[0], roles[1], embeds_u, pidx, ip_uncond,
                    jnp.asarray(masks), sab, key)

        def fetch():
            out = np.asarray(jax.device_get(scores), np.float32)
            return out[:P] if pad else out

        return fetch() if blocking else fetch

    def score_feats_batch(
        self,
        pix_a: np.ndarray,
        pix_b: np.ndarray,
        *,
        prompt="",
        target_block: str = "up_blocks",
        target_layer=0,
        target_step: int = 600,
        similarity: str = "cosine",
        seed: int = 2333,
        blocking: bool = True,
    ) -> np.ndarray:
        """DiffFeats ablation: attn1 OUTPUT features, min-max normalized, cosine
        (/root/reference/metrics/diffeats.py:142-205). Unlike the diffsim path, the
        length-1 target_layer list unwraps correctly (diffeats.py:143-144)."""
        if isinstance(target_layer, (list, tuple)):
            target_layer = target_layer[0]
        base = sd15_tap(target_block, int(target_layer), fix_layer_collapse=True)
        tap = TapSpec(base.block, base.address, "attn1", OUTPUT)
        P = pix_a.shape[0]
        transport_dtype = np.uint8 if pix_a.dtype == np.uint8 else self.dtype
        roles = [np.asarray(p).astype(transport_dtype, copy=False) for p in (pix_a, pix_b)]
        prompts = [prompt] * P if isinstance(prompt, str) else list(prompt)
        pad = 0
        if self.mesh is not None:
            target = meshlib.pad_to_multiple(P, meshlib.data_axis_size(self.mesh))
            pad = target - P
            if pad:
                roles = [np.concatenate([r, np.repeat(r[-1:], pad, 0)], axis=0) for r in roles]
                prompts = prompts + [prompts[-1]] * pad
        embeds_u, pidx = self._embeds_and_idx(prompts)
        sab, key = self._noise_consts(int(target_step), int(seed))
        fn = self._score_fn(tap, similarity)
        scores = fn(self.params, roles[0], roles[1], embeds_u, pidx,
                    jnp.zeros((1, 1, 1), self.dtype), jnp.zeros((1, 2, 1, 1), np.float32),
                    sab, key)
        from diffsim_tpu.metrics.scorer_base import fetchable

        return fetchable(scores, pad, blocking)

    def diffsim(self, image_a, image_b, img_size=None, prompt="", target_block="up_blocks",
                target_layer=(0,), target_step=600, ip_adapter=False, seed=2333,
                similarity="cosine", **_):
        """Reference-shaped single-pair entry point (paths or PIL images in, float out) —
        /root/reference/diffsim/diffsim.py:98."""
        size = img_size or self.img_size
        pa = load_and_process(image_a, size)
        pb = load_and_process(image_b, size)
        return float(
            self.score_batch(
                pa, pb, prompt=prompt, target_block=target_block, target_layer=target_layer,
                target_step=target_step, similarity=similarity, seed=seed,
                ip_adapter=ip_adapter,
            )[0]
        )

    @functools.lru_cache(maxsize=32)
    def _tap_values_fn(self, tap: TapSpec):
        """Compiled-once Q/K/V extraction graph per tap address; the noise constants travel
        as arguments so retrieval loops calling ``tap_values`` per image reuse one program."""

        def fn(params, pix, embeds, noise_sab, key):
            model_t, a, b = noise_sab
            moments = vae.encoder_apply(params["vae"], pix)
            eps = jax.random.normal(
                prng.role_key(key, prng.VAE_A),
                moments.shape[:1] + moments.shape[1:-1] + (moments.shape[-1] // 2,),
            )
            z = vae.sample_latents(moments, None, self.vae_cfg.scaling_factor, noise=eps)
            eps_n = jax.random.normal(prng.role_key(key, prng.NOISE_A), z.shape)
            x = (a * z.astype(jnp.float32) + b * eps_n).astype(z.dtype)
            if self.cfg_parity:
                x = jnp.concatenate([x, x], axis=0)
                ctx = embeds
            else:
                x, ctx = x, embeds[1:2]
            _, taps = unet.apply(params["unet"], x, jnp.float32(model_t), ctx, self.unet_cfg, tap=tap)
            return taps["q"], taps["k"], taps["v"]

        return jax.jit(fn)

    def tap_values(self, image_a, *, prompt="", target_block="up_blocks", target_layer=(0,),
                   target_step=600, seed=2333):
        """Q/K/V for one image (the reference's ``diffsim_value`` retrieval helper,
        /root/reference/diffsim/diffsim.py:201-258 — implemented with the standard block
        slicing rather than its swapped-slice quirk Q3)."""
        tap = sd15_tap(target_block, target_layer)
        pix = load_and_process(image_a, self.img_size)
        embeds = self.encode_prompt(prompt)
        sab, key = self._noise_consts(int(target_step), int(seed))
        fn = self._tap_values_fn(tap)
        return fn(self.params, jnp.asarray(pix, self.dtype), embeds, sab, key)
