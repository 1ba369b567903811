"""Metric registry: the ``--metric`` CLI surface mapped to scorer adapters.

Mirrors the reference's lazy per-metric construction switch (/root/reference/cute_main.py:30-45
and the identical blocks in every driver). Each adapter bundles the batched scoring callable,
its score direction, and its (optional) metric-specific host preprocessing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

METRICS = [
    "diffsim", "diffsim_xl", "clip_i", "clip_cross", "dino", "dinov1", "dino_cross",
    "cute", "lpips", "gram", "diffeats", "clipfeats", "dinofeats", "ensemble", "dit",
]


@dataclasses.dataclass
class MetricAdapter:
    """score_pairs(pix_a (N,H,W,C), pix_b, prompts, blocking=True) -> (N,) scores.

    EVERY adapter's score_pairs accepts ``blocking=False`` and then returns a zero-arg fetch
    callable — the dispatch is asynchronous so the runner overlaps the next batch's host
    work with this batch's device compute (no synchronous fallback exists in the runner).

    ``score_triplets(pix_a, pix_b, pix_c, prompts, blocking=...) -> (s_ab, s_ac)`` is the
    optional fused 2AFC path (image A's work shared across both pairs).

    ``score_triplet_paths(paths_a, paths_b, paths_c, pix_a, pix_b, pix_c, prompts,
    blocking=..., loader=...)`` is the device-cache-aware variant: images are keyed by path
    and each unique image is uploaded + encoded once into a device-resident pool
    (runtime.device_cache) — repeated images (every 2AFC protocol reuses them heavily) cost
    zero relay transport and zero encode compute. ``pix_*`` may be None; decoded uint8 rows,
    when the runner's prefetch already has them, feed cache misses without a re-decode."""

    score_pairs: Callable[[np.ndarray, np.ndarray, list[str]], np.ndarray]
    lower_better: bool
    preprocess: Callable | None = None  # None => default lanczos/[-1,1] at image_size
    score_triplets: Callable | None = None
    wants_masks: bool = False  # --use_mask supported: score_pairs accepts mask_a=/mask_b=
    score_triplet_paths: Callable | None = None
    # prewarm(paths_roles, loader): threaded decode of the NEXT chunk's device-cache
    # misses while the current chunk scores (runner cached-path mode)
    prewarm: Callable | None = None


def _make_prewarm(scorer):
    def prewarm(paths_roles, loader):
        from diffsim_tpu.runtime.device_cache import prewarm_missing

        prewarm_missing(scorer._ensure_moment_cache(), paths_roles, loader)

    return prewarm


def _attach_ip(scorer, args, tiny: bool):
    """Attach the IP-Adapter per the CLI flags (one implementation for the SD-1.5 and SDXL
    branches). Tiny mode sizes the random resampler to the scorer's actual cross dim."""
    ip_kw = {}
    if tiny:
        import dataclasses as _dc

        from diffsim_tpu.models import clip_vision as _cv, ip_adapter as _ipm

        ip_kw = dict(
            encoder_cfg=_cv.CLIPVisionConfig.tiny(),
            resampler_cfg=_dc.replace(
                _ipm.ResamplerConfig.tiny(),
                output_dim=scorer.unet_cfg.cross_attention_dim,
            ),
        )
    ip_weights = getattr(args, "ip_weights", None)
    converted = None
    if ip_weights:
        from diffsim_tpu.convert import load_params as _lp

        converted = _lp(ip_weights)
    scorer.enable_ip_adapter(converted, scale=0.5, **ip_kw)


def build_metric(args, mesh=None) -> MetricAdapter:
    """Construct the adapter for ``args.metric``; args carries the argprocess surface
    (image_size, target_block/layer/step, similarity, prompt, ip_adapter, seed) plus framework
    extensions (weights, cfg_parity)."""
    name = args.metric
    similarity = args.similarity
    lower = similarity == "mse"

    tiny = getattr(args, "model_scale", "full") == "tiny"

    if name in ("diffsim", "diffeats"):
        from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15

        _require_tokenizer(args)
        kw = {}
        if tiny:
            import numpy as _np

            from diffsim_tpu.models import clip_text as _ct, unet as _unet, vae as _vae

            kw = dict(
                unet_cfg=_unet.UNetConfig.tiny(),
                vae_cfg=_vae.VAEConfig.tiny(),
                text_cfg=_ct.CLIPTextConfig.tiny(),
                dtype=_np.float32,
            )
        scorer = DiffSimSD15(
            params=_load_params(getattr(args, "weights", None)),
            img_size=args.image_size,
            mesh=mesh,
            cfg_parity=getattr(args, "cfg_parity", True),
            fast_softmax=getattr(args, "bf16_softmax", False),
            tokenizer=_load_tokenizer(getattr(args, "tokenizer_dir", None)),
            **kw,
        )
        if args.ip_adapter:
            _attach_ip(scorer, args, tiny)
        if getattr(args, "moment_cache_mb", None):
            scorer.moment_cache_mb = args.moment_cache_mb

        from diffsim_tpu.core.image import process_image_u8

        u8 = lambda img: process_image_u8(img, args.image_size)

        if name == "diffsim":
            text_attn = bool(getattr(args, "use_text_attn", False))

            def score_pairs(pa, pb, prompts, blocking=True, mask_a=None, mask_b=None):
                return scorer.score_batch(
                    pa, pb, prompt=prompts, target_block=args.target_block,
                    target_layer=args.target_layer, target_step=args.target_step,
                    similarity=similarity, seed=args.seed, ip_adapter=args.ip_adapter,
                    blocking=blocking, mask_a=mask_a, mask_b=mask_b, text_attn=text_attn,
                )

            score_triplets = None
            score_triplet_paths = None
            prewarm = None
            if not args.ip_adapter:
                def score_triplets(pa, pb, pc, prompts, blocking=True):
                    return scorer.score_triplet_batch(
                        pa, pb, pc, prompt=prompts, target_block=args.target_block,
                        target_layer=args.target_layer, target_step=args.target_step,
                        similarity=similarity, seed=args.seed, blocking=blocking,
                        text_attn=text_attn,
                    )

                if getattr(args, "device_cache", True):
                    def score_triplet_paths(paths_a, paths_b, paths_c, pix_a=None,
                                            pix_b=None, pix_c=None, prompts="",
                                            blocking=True, loader=None):
                        return scorer.score_triplet_paths(
                            paths_a, paths_b, paths_c, pix_a, pix_b, pix_c, loader=loader,
                            prompt=prompts, target_block=args.target_block,
                            target_layer=args.target_layer, target_step=args.target_step,
                            similarity=similarity, seed=args.seed, blocking=blocking,
                            text_attn=text_attn,
                        )

                    prewarm = _make_prewarm(scorer)
        else:
            def score_pairs(pa, pb, prompts, blocking=True):
                return scorer.score_feats_batch(
                    pa, pb, prompt=prompts, target_block=args.target_block,
                    target_layer=args.target_layer, target_step=args.target_step,
                    similarity=similarity, seed=args.seed, blocking=blocking,
                )

        if name == "diffsim":
            return MetricAdapter(score_pairs, lower, preprocess=u8, score_triplets=score_triplets,
                                 wants_masks=bool(getattr(args, "use_mask", False)),
                                 score_triplet_paths=score_triplet_paths,
                                 prewarm=prewarm)
        return MetricAdapter(score_pairs, lower, preprocess=u8)

    if name == "dit":
        from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT

        kw = {}
        if tiny:
            import numpy as _np

            from diffsim_tpu.models import dit as _dit, vae as _vae

            kw = dict(
                dit_cfg=_dit.DiTConfig.tiny(input_size=args.image_size // 2, num_classes=1000),
                vae_cfg=_vae.VAEConfig.tiny(),
                dtype=_np.float32,
            )
        scorer = DiffSimDiT(
            params=_load_params(getattr(args, "weights", None)),
            img_size=args.image_size,
            mesh=mesh,
            **kw,
        )

        def score_pairs(pa, pb, prompts, blocking=True):
            return scorer.score_batch(
                pa, pb, target_layer=args.target_layer, target_step=args.target_step,
                similarity=similarity, seed=args.seed, blocking=blocking,
            )

        def score_triplets(pa, pb, pc, prompts, blocking=True):
            return scorer.score_triplet_batch(
                pa, pb, pc, target_layer=args.target_layer, target_step=args.target_step,
                similarity=similarity, seed=args.seed, blocking=blocking,
            )

        score_triplet_paths = None
        prewarm = None
        if getattr(args, "device_cache", True):
            if getattr(args, "moment_cache_mb", None):
                scorer.moment_cache_mb = args.moment_cache_mb
            prewarm = _make_prewarm(scorer)

            def score_triplet_paths(paths_a, paths_b, paths_c, pix_a=None, pix_b=None,
                                    pix_c=None, prompts="", blocking=True, loader=None):
                return scorer.score_triplet_paths(
                    paths_a, paths_b, paths_c, pix_a, pix_b, pix_c, loader=loader,
                    target_layer=args.target_layer, target_step=args.target_step,
                    similarity=similarity, seed=args.seed, blocking=blocking,
                )

        from diffsim_tpu.core.image import process_image_u8 as _p8

        return MetricAdapter(score_pairs, lower, preprocess=lambda img: _p8(img, args.image_size),
                             score_triplets=score_triplets,
                             score_triplet_paths=score_triplet_paths, prewarm=prewarm)

    if name == "diffsim_xl":
        from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

        _require_tokenizer(args)
        kw = {}
        if tiny:
            import numpy as _np

            from diffsim_tpu.models import clip_text as _ct, unet as _unet, vae as _vae

            kw = dict(
                unet_cfg=_unet.UNetConfig.tiny_xl(cross_attention_dim=64),
                vae_cfg=_vae.VAEConfig.tiny(),
                text_cfg=_ct.CLIPTextConfig.tiny(),
                text2_cfg=_ct.CLIPTextConfig(
                    vocab_size=1000, hidden=32, layers=2, heads=2, intermediate=64,
                    projection_dim=16,
                ),
                dtype=_np.float32,
            )
        tokenizer = _load_tokenizer(getattr(args, "tokenizer_dir", None))
        scorer = DiffSimXL(
            params=_load_params(getattr(args, "weights", None)),
            img_size=args.image_size,
            mesh=mesh,
            cfg_parity=getattr(args, "cfg_parity", True),
            vae_fp32=not getattr(args, "xl_vae_bf16", False),
            tokenizer=tokenizer,
            # tokenizer_2 pads with "!" (token 0), not EOS — SDXL's published quirk
            tokenizer2=tokenizer.with_pad_token("!") if tokenizer else None,
            **kw,
        )
        if args.ip_adapter:
            # same attachment as the SD-1.5 branch (the reference loads
            # ip-adapter-plus_sdxl_vit-h here, diffsim_xl.py:52-55)
            _attach_ip(scorer, args, tiny)

        def score_pairs(pa, pb, prompts, blocking=True):
            return scorer.score_batch(
                pa, pb, prompt=prompts, target_block=args.target_block,
                target_layer=args.target_layer, target_step=args.target_step,
                similarity=similarity, seed=args.seed, ip_adapter=args.ip_adapter,
                blocking=blocking,
            )

        score_triplets = None
        score_triplet_paths = None
        prewarm = None
        if not args.ip_adapter:
            def score_triplets(pa, pb, pc, prompts, blocking=True):
                return scorer.score_triplet_batch(
                    pa, pb, pc, prompt=prompts, target_block=args.target_block,
                    target_layer=args.target_layer, target_step=args.target_step,
                    similarity=similarity, seed=args.seed, blocking=blocking,
                )

            if getattr(args, "device_cache", True):
                if getattr(args, "moment_cache_mb", None):
                    scorer.moment_cache_mb = args.moment_cache_mb
                prewarm = _make_prewarm(scorer)

                def score_triplet_paths(paths_a, paths_b, paths_c, pix_a=None, pix_b=None,
                                        pix_c=None, prompts="", blocking=True, loader=None):
                    return scorer.score_triplet_paths(
                        paths_a, paths_b, paths_c, pix_a, pix_b, pix_c, loader=loader,
                        prompt=prompts, target_block=args.target_block,
                        target_layer=args.target_layer, target_step=args.target_step,
                        similarity=similarity, seed=args.seed, blocking=blocking,
                    )

        from diffsim_tpu.core.image import process_image_u8 as _p8

        return MetricAdapter(score_pairs, lower, preprocess=lambda img: _p8(img, args.image_size),
                             score_triplets=score_triplets,
                             score_triplet_paths=score_triplet_paths, prewarm=prewarm)

    if name in ("clip_i", "clip_cross", "clipfeats"):
        from diffsim_tpu.metrics.clip_i import CLIPScore

        kw = {}
        if tiny:
            from diffsim_tpu.models import clip_text as _ct, clip_vision as _cv

            kw = dict(vision_cfg=_cv.CLIPVisionConfig.tiny(), text_cfg=_ct.CLIPTextConfig.tiny())
        scorer = CLIPScore(params=_load_params(getattr(args, "weights", None)), mesh=mesh, **kw)
        if name == "clip_i":
            fn = lambda pa, pb, prompts, blocking=True: scorer.clipi_score_batch(
                pa, pb, blocking=blocking)
            return MetricAdapter(fn, False, preprocess=scorer.preprocess)
        if name == "clip_cross":
            fn = lambda pa, pb, prompts, blocking=True: scorer.clip_cross_score_batch(
                pa, pb, args.target_layer, blocking=blocking)
            return MetricAdapter(fn, False, preprocess=scorer.preprocess)
        fn = lambda pa, pb, prompts, blocking=True: scorer.clip_feature_score_batch(
            pa, pb, args.target_layer, blocking=blocking)
        return MetricAdapter(fn, False, preprocess=scorer.preprocess)

    if name in ("dino", "dino_cross", "dinofeats", "dinov1"):
        from diffsim_tpu.metrics.dino import DinoScore, Dinov2Score

        kw = {}
        if tiny:
            from diffsim_tpu.models import dinov2 as _d2

            kw = dict(cfg=_d2.DinoConfig.tiny())
        scorer = (DinoScore if name == "dinov1" else Dinov2Score)(
            params=_load_params(getattr(args, "weights", None)), mesh=mesh, **kw
        )
        if name in ("dino", "dinov1"):
            fn = lambda pa, pb, prompts, blocking=True: scorer.dino_score_batch(
                pa, pb, blocking=blocking)
            return MetricAdapter(fn, False, preprocess=scorer.preprocess)
        if name == "dino_cross":
            fn = lambda pa, pb, prompts, blocking=True: scorer.dino_cross_score_batch(
                pa, pb, args.target_layer, blocking=blocking)
            return MetricAdapter(fn, False, preprocess=scorer.preprocess)
        fn = lambda pa, pb, prompts, blocking=True: scorer.dino_feature_score_batch(
            pa, pb, args.target_layer, blocking=blocking)
        return MetricAdapter(fn, False, preprocess=scorer.preprocess)

    if name == "lpips":
        from diffsim_tpu.metrics.lpips import LPIPS

        scorer = LPIPS(params=_load_params(getattr(args, "weights", None)), mesh=mesh)
        return MetricAdapter(
            lambda pa, pb, prompts, blocking=True: scorer.score_batch(pa, pb, blocking=blocking),
            True,
        )

    if name == "gram":
        from diffsim_tpu.metrics.vgg_gram import VGGGram

        scorer = VGGGram(params=_load_params(getattr(args, "weights", None)), mesh=mesh)
        return MetricAdapter(
            lambda pa, pb, prompts, blocking=True: scorer.score_batch(pa, pb, blocking=blocking),
            False,
        )

    if name == "cute":
        from diffsim_tpu.metrics.ffa import ForegroundFeatureAveraging, U2NetMatting

        matting = None
        matting_weights = getattr(args, "matting_weights", None)
        if matting_weights:
            matting = U2NetMatting(_load_params(matting_weights))
        kw = {}
        if tiny:
            import dataclasses as _dc

            from diffsim_tpu.models import dinov2 as _d2

            # patch 14 keeps the 336 -> 24x24 patch grid the masked pooling assumes
            kw = dict(cfg=_dc.replace(_d2.DinoConfig.tiny(), patch=14))
        scorer = ForegroundFeatureAveraging(params=_load_params(getattr(args, "weights", None)),
                                            mesh=mesh, matting=matting, **kw)
        return MetricAdapter(
            lambda pa, pb, prompts, blocking=True: scorer.score_batch(
                "Crop-Feat", pa, pb, blocking=blocking),
            False,
            preprocess=scorer.preprocess,
        )

    raise ValueError(f"unknown metric: {name}")


def _load_params(path):
    if not path:
        return None
    from diffsim_tpu.convert import load_params

    return load_params(path)


def _load_tokenizer(path, pad_token: str = "<|endoftext|>"):
    if not path:
        return None
    import os

    from diffsim_tpu.core.tokenizer import CLIPTokenizer

    return CLIPTokenizer.from_files(
        os.path.join(path, "vocab.json"), os.path.join(path, "merges.txt"), pad_token
    )


def _require_tokenizer(args):
    """Converted weights + the HashTokenizer fallback silently produce garbage prompt
    embeddings (the reference encodes prompts inside the scored graph,
    /root/reference/diffsim/diffsim_pipeline.py:125-141) — refuse unless opted in."""
    if (getattr(args, "weights", None) and not getattr(args, "tokenizer_dir", None)
            and not getattr(args, "allow_hash_tokenizer", False)):
        raise SystemExit(
            "--weights without --tokenizer_dir: prompt embeddings would be hash-tokenized "
            "garbage and every score meaningless. Pass --tokenizer_dir DIR (vocab.json + "
            "merges.txt), or --allow_hash_tokenizer to override for throughput runs."
        )
