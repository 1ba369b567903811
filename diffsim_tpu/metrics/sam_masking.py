"""Score-time mask generation with SAM — the generator the reference's ``--use_mask`` help
names ("SAM-CLIP to segment the target region first", /root/reference/argprocess.py:16) but
never wires. A center-point prompt segments the dominant object; the best-IoU mask becomes
the alpha channel, so it plugs into the same matting interface as U2NetMatting /
heuristic_matting (core.image.mask_from_matting, metrics/ffa.py preprocessing).

Preprocessing mirrors the published predictor: resize longest side to cfg.image_size,
SAM pixel normalization, zero-pad bottom/right to square; mask logits (image_size/4) are
un-padded and resized back to the original image size, thresholded at 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffsim_tpu.models import sam


def infer_config(params) -> sam.SamConfig:
    """Recover the SamConfig from a converted tree: encoder width/depth from the blocks,
    encoder heads from the stored rel-pos head_dim, the global-attention layer set and
    window size from the rel-pos table lengths (windowed blocks store (2*window-1)-row
    tables, global blocks (2*grid-1)). decoder_heads is not recoverable from shapes and is
    fixed at the published 8 (all sam_vit_* checkpoints)."""
    enc = params["image_encoder"]
    grid = np.asarray(enc["pos_embed"]).shape[0]
    dim = np.asarray(enc["pos_embed"]).shape[-1]
    patch = np.asarray(enc["patch_embed"]["w"]).shape[0]
    blocks = enc["blocks"]
    # rel-pos tables are (2*size-1, head_dim): head count falls out of the stored head_dim
    heads = dim // np.asarray(blocks[0]["attn"]["rel_pos_h"]).shape[1]
    global_attn = tuple(
        i for i, b in enumerate(blocks)
        if np.asarray(b["attn"]["rel_pos_h"]).shape[0] == 2 * grid - 1
    )
    win_rows = [np.asarray(b["attn"]["rel_pos_h"]).shape[0]
                for i, b in enumerate(blocks) if i not in global_attn]
    window = (win_rows[0] + 1) // 2 if win_rows else grid
    pd = np.asarray(params["prompt_encoder"]["no_mask"]).shape[0]
    n_tok = np.asarray(params["mask_decoder"]["mask_tokens"]).shape[0]
    mlp = np.asarray(params["mask_decoder"]["layers"][0]["mlp"]["fc1"]["w"]).shape[1]
    return sam.SamConfig(
        image_size=grid * patch, patch=patch, encoder_dim=dim, encoder_depth=len(blocks),
        encoder_heads=heads, global_attn=global_attn, window=window, prompt_dim=pd,
        decoder_heads=8, decoder_depth=len(params["mask_decoder"]["layers"]),
        decoder_mlp=mlp, num_mask_tokens=n_tok,
    )


class SamMasking:
    def __init__(self, params, cfg=None, *, dtype=jnp.float32):
        self.cfg = cfg or infer_config(params)
        self.params = jax.device_put(params, jax.devices()[0])

        def fn(p, pixels, coords, labels):
            masks, iou = sam.predict(p, self.cfg, pixels, coords, labels, multimask=True)
            best = jnp.argmax(iou, axis=1)
            return jnp.take_along_axis(masks, best[:, None, None, None], axis=1)[:, 0]

        self._fn = jax.jit(fn)

    def __call__(self, image: Image.Image) -> Image.Image:
        rgb = image.convert("RGB")
        w, h = rgb.size
        size = self.cfg.image_size
        scale = size / max(w, h)
        nw, nh = max(1, int(round(w * scale))), max(1, int(round(h * scale)))
        resized = np.asarray(rgb.resize((nw, nh), Image.BILINEAR), np.float32)
        # published predictor order: normalize FIRST, then zero-pad bottom/right — pad
        # pixels must be exactly 0 in normalized space, not -mean/std
        resized = (resized - np.asarray(sam.PIXEL_MEAN)) / np.asarray(sam.PIXEL_STD)
        pixels = np.zeros((size, size, 3), np.float32)
        pixels[:nh, :nw] = resized

        # center-point prompt in resized coordinates, label 1 (foreground)
        coords = np.asarray([[[nw / 2.0, nh / 2.0]]], np.float32)
        labels = np.asarray([[1]], np.int32)
        logits = np.asarray(
            self._fn(self.params, jnp.asarray(pixels[None]), jnp.asarray(coords),
                     jnp.asarray(labels))
        )[0]  # (size/4, size/4)

        # un-pad, resize the FLOAT logits to the original size, THEN threshold at 0 (the
        # published predictor's resample-then-threshold order). Original-size RGBA is the
        # shared matting interface (FFA consumes it too); the scoring path's
        # mask_from_matting downsamples the binary alpha afterwards — NEAREST on a label
        # map, no interpolation loss.
        q = logits.shape[0] / size  # = 1/4
        crop = logits[: max(1, int(round(nh * q))), : max(1, int(round(nw * q)))]
        alpha_img = Image.fromarray(crop.astype(np.float32), "F").resize((w, h), Image.BILINEAR)
        alpha = (np.asarray(alpha_img) > 0).astype(np.uint8) * 255
        rgba = np.dstack([np.asarray(rgb, np.uint8), alpha])
        return Image.fromarray(rgba, "RGBA")
