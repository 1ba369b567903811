"""Shared machinery for the diffusion-backbone scorers (SD-1.5 / SDXL / DiT)."""

from __future__ import annotations

import jax
import numpy as np

from diffsim_tpu.parallel import mesh as meshlib


def fetchable(scores, pad: int, blocking: bool):
    """The MetricAdapter async contract in one place: ``blocking=True`` fetches the (N,)
    scores now; ``blocking=False`` returns a zero-arg fetch callable so dispatch overlaps
    the caller's host work. ``pad`` rows (mesh padding) are stripped on fetch."""

    def fetch():
        out = np.asarray(jax.device_get(scores), np.float32)
        return out[: out.shape[0] - pad] if pad else out

    return fetch() if blocking else fetch


def fetchable_pair(s_ab, s_ac, t: int, pad: int, blocking: bool):
    """Triplet-path variant of ``fetchable``: one device_get for both score arrays
    (possibly scan-stacked — flattened), padding stripped to the true triplet count."""

    def fetch():
        out_ab, out_ac = (np.asarray(o, np.float32).reshape(-1)
                          for o in jax.device_get((s_ab, s_ac)))
        return (out_ab[:t], out_ac[:t]) if pad else (out_ab, out_ac)

    return fetch() if blocking else fetch


def init_random_on_device(build, mesh=None):
    """Random-init a parameter tree ON the accelerator via one jitted program.

    ``build() -> params`` must be a pure jax.random tree (every model's ``*_init`` is).
    Host-CPU init + bulk ``device_put`` ships the whole tree over the relay — ~1.8 GB for
    SD-1.5 bf16 at the relay's 9-40 MB/s is 45-200 s of one-time upload per process
    (measured: the dominant cold-start term of every full-scale capture; ~5 GB for SDXL).
    A single jitted build materializes the tree on-device in under a second and its
    compile lands in the persistent cache. On the CPU backend (tests, virtual mesh) the
    upload is free — keep host init so tiny-config construction never pays a jit and the
    historical numpy value stream tests pin stays intact. The two paths draw different
    (each deterministic) random streams — see ops.blocks.rand_normal; nothing compares
    random-weight scores across backends.
    """
    if jax.default_backend() == "cpu":
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            params = build()
        if mesh is None:
            return jax.device_put(params, jax.devices()[0])
        return jax.device_put(params, meshlib.replicated(mesh))
    sharding = (
        jax.sharding.SingleDeviceSharding(jax.devices()[0])
        if mesh is None
        else meshlib.replicated(mesh)
    )
    return jax.jit(build, out_shardings=sharding)()


class ScorerBase:
    mesh = None
    dtype = None
    _ip = None  # set by enable_ip_adapter
    # peak-activation multiplier vs the SD-1.5 calibration graph at equal resolution,
    # consumed by runtime.hbm_guard's pre-flight budget (same-resolution FLOPs ratio
    # from tools/flops_ratio.py compiled cost analysis)
    hbm_scale = 1.0

    def _place(self, params):
        if self.mesh is None:
            return jax.device_put(params, jax.devices()[0])
        return jax.device_put(params, meshlib.replicated(self.mesh))

    def _init_random(self, build):
        return init_random_on_device(build, self.mesh)

    def _pad_pairs(self, pix_a: np.ndarray, pix_b: np.ndarray, prompts: list[str] | None):
        """Stack to (P, 2, H, W, C) in the transport dtype and pad P to the data-axis size.
        Pre-flight HBM guard: an over-budget P (at its PADDED size — the graph the mesh
        actually compiles) is refused before any graph is built."""
        from diffsim_tpu.runtime import hbm_guard

        P = pix_a.shape[0]
        transport = np.uint8 if pix_a.dtype == np.uint8 else self.dtype
        quantum = meshlib.data_axis_size(self.mesh) if self.mesh is not None else 1
        hbm_guard.check_pairs(self, meshlib.pad_to_multiple(P, quantum),
                              np.dtype(transport).itemsize)
        pix = np.stack([pix_a, pix_b], axis=1).astype(transport)
        pad = 0
        if self.mesh is not None:
            target = meshlib.pad_to_multiple(P, meshlib.data_axis_size(self.mesh))
            pad = target - P
            if pad:
                pix = np.concatenate([pix, np.repeat(pix[-1:], pad, 0)], axis=0)
                if prompts is not None:
                    prompts = prompts + [prompts[-1]] * pad
        return pix, prompts, P, pad

    def _jit_pairs(self, fn, n_data: int = 2):
        """jit with the first arg replicated (params), the next ``n_data`` args data-sharded,
        the rest replicated."""
        if self.mesh is None:
            return jax.jit(fn)
        ds = meshlib.data_sharding(self.mesh)
        rs = meshlib.replicated(self.mesh)
        argc = fn.__code__.co_argcount
        in_sh = tuple(rs if i == 0 else (ds if i <= n_data else rs) for i in range(argc))
        return jax.jit(fn, in_shardings=in_sh, out_shardings=ds)

    # ------------------------------------------------------------------
    # IP-Adapter attachment, shared by the SD-1.5 and SDXL scorers
    # (/root/reference/diffsim/diffsim.py:86-89, diffsim_xl.py:52-55)
    # ------------------------------------------------------------------

    def _default_resampler_cfg(self):
        raise NotImplementedError  # per backbone: sd15_plus / sdxl_plus

    def enable_ip_adapter(
        self,
        converted=None,
        *,
        scale: float = 0.5,
        encoder_params=None,
        encoder_cfg=None,
        resampler_cfg=None,
        plus: bool = True,
        init_seed: int = 1,
    ):
        """Attach IP-Adapter projections to every attn2 (the reference's load_ip_adapter +
        set_ip_adapter_scale(0.5)). ``converted`` is convert_ip_adapter()'s output; None =>
        random weights (tests/throughput)."""
        import jax.numpy as jnp

        from diffsim_tpu.models import clip_vision, ip_adapter as ipm

        encoder_cfg = encoder_cfg or clip_vision.CLIPVisionConfig.h14()
        key = jax.random.PRNGKey(init_seed)
        if encoder_params is None:
            # random encoder tree built on-device (no relay upload)
            encoder_params = init_random_on_device(
                lambda: clip_vision.init(key, encoder_cfg, self.dtype), self.mesh
            )
        if converted is not None:
            plus = converted["plus"]
            ip_weights = converted["ip_weights"]
            proj = converted["image_proj"]
            if plus and resampler_cfg is None:
                lat = np.asarray(proj["latents"])
                resampler_cfg = ipm.ResamplerConfig(
                    dim=lat.shape[-1], depth=len(proj["layers"]),
                    dim_head=64,
                    heads=np.asarray(proj["layers"][0]["to_q"]["w"]).shape[1] // 64,
                    num_queries=lat.shape[-2],
                    embedding_dim=np.asarray(proj["proj_in"]["w"]).shape[0],
                    output_dim=np.asarray(proj["proj_out"]["w"]).shape[1],
                )
        else:
            if resampler_cfg is None:
                import dataclasses as _dc

                # random-weight mode must emit IP tokens of the UNet's cross dim, whatever
                # config this scorer runs (the published cfgs assume the full-scale dims)
                resampler_cfg = _dc.replace(
                    self._default_resampler_cfg(),
                    output_dim=self.unet_cfg.cross_attention_dim,
                )

            def build_ip():
                if plus:
                    proj_ = ipm.resampler_init(jax.random.fold_in(key, 1), resampler_cfg,
                                               self.dtype)
                else:
                    proj_ = ipm.image_projection_init(
                        jax.random.fold_in(key, 1), encoder_cfg.projection_dim,
                        self.unet_cfg.cross_attention_dim, dtype=self.dtype,
                    )
                return proj_, ipm.random_ip_weights(
                    jax.random.fold_in(key, 2), self.unet_cfg, dtype=self.dtype
                )

            proj, ip_weights = init_random_on_device(build_ip, self.mesh)
        # copy the CONTAINERS of the resident tree (leaves stay device arrays): the insert
        # below only adds dict entries, so the old device_get → mutate → re-upload pattern
        # moved ~2×1.8 GB over the relay for no reason
        params = jax.tree_util.tree_map(lambda a: a, self.params)
        ipm.insert_ip_into_unet(params["unet"], self.unet_cfg, ip_weights)
        params["ip_proj"] = proj
        params["ip_encoder"] = encoder_params
        self._ip = {"scale": scale, "plus": plus, "encoder_cfg": encoder_cfg,
                    "resampler_cfg": resampler_cfg}
        self.params = self._place(params)
        self._score_fn.cache_clear()

        # uncond ip embedding: zeros in NORMALIZED space (diffusers encode_image zeroes the
        # preprocessed pixel_values, not the raw image); computed once
        size = encoder_cfg.image_size

        def _uncond(params):
            zero = jnp.zeros((1, size, size, 3), self.dtype)
            out = clip_vision.apply(params["ip_encoder"], zero, encoder_cfg,
                                    output_hidden_states=plus)
            if plus:
                return ipm.resampler_apply(params["ip_proj"], out["hidden_states"][-2],
                                           self._ip["resampler_cfg"])
            return ipm.image_projection_apply(params["ip_proj"], out["image_embeds"])

        self._ip_uncond = np.asarray(jax.device_get(jax.jit(_uncond)(self.params)))

    def _auto_enable_ip(self):
        """Called by score paths when ip_adapter=True but nothing is attached: random
        weights keep throughput/test runs working, but the scores are meaningless — say so."""
        if self._ip is None:
            print("[ip_adapter] no adapter attached — enabling RANDOM weights; scores are "
                  "meaningless. Call enable_ip_adapter(converted) with cli.convert output "
                  "for real IP-Adapter scoring.")
            self.enable_ip_adapter()

    @staticmethod
    def _interleave_ip_embeds(cond, ip_uncond, cfg_parity: bool, dtype):
        """(P, n_img, T, D) per-image cond tokens -> the UNet batch's ip_embeds, matching the
        x_in/ctx CFG interleave exactly: per image [uncond, cond] when cfg_parity
        ([a_u, a_c, b_u, b_c, ...]), else just the cond tokens per image."""
        import jax.numpy as jnp

        P, n_img, t_tok, d_tok = cond.shape
        if cfg_parity:
            u = jnp.broadcast_to(ip_uncond, cond.shape)
            inter = jnp.stack([u, cond], axis=2)  # (P, img, [uncond|cond], T, D)
            return inter.reshape(P * n_img * 2, t_tok, d_tok).astype(dtype)
        return cond.reshape(P * n_img, t_tok, d_tok).astype(dtype)

    def _ip_embed(self, params, pix):
        """[-1,1] pixels at the scoring resolution -> adapter tokens. The reference feeds the
        original PIL image through CLIPImageProcessor; we resize the scoring-resolution
        pixels on device (bilinear, documented divergence)."""
        import jax.numpy as jnp

        from diffsim_tpu.core.image import CLIP_MEAN, CLIP_STD
        from diffsim_tpu.models import clip_vision, ip_adapter as ipm

        ip = self._ip
        size = ip["encoder_cfg"].image_size
        x = jax.image.resize(pix.astype(jnp.float32), pix.shape[:1] + (size, size, 3), "bilinear")
        x = ((x + 1.0) / 2.0 - CLIP_MEAN) / CLIP_STD
        out = clip_vision.apply(params["ip_encoder"], x.astype(self.dtype), ip["encoder_cfg"],
                                output_hidden_states=ip["plus"])
        if ip["plus"]:
            return ipm.resampler_apply(params["ip_proj"], out["hidden_states"][-2],
                                       ip["resampler_cfg"])
        return ipm.image_projection_apply(params["ip_proj"], out["image_embeds"])
