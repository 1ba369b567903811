"""Quantify the matting stand-ins for Foreground Feature Averaging (--metric cute).

The reference mats with carvekit TracerB7+FBA (/root/reference/metrics/
foreground_feature_averaging.py:20-29), a torch-only stack this build replaces with U^2-Net
(when weights are supplied) or a border-statistics heuristic. This tool measures how far the
stand-ins sit on a deterministic 20-image synthetic fixture with KNOWN foreground masks,
spanning the failure modes that matter: centered high-contrast objects, objects touching the
border (the heuristic's blind spot), low-contrast objects, and textured backgrounds.

Reported per category:
  * mask IoU at full resolution (matting quality, weight-independent);
  * 24x24 patch-grid IoU (what the FFA pooling actually consumes);
  * |Crop-Feat delta|: the pooled-feature cosine between ground-truth-matted and
    stand-in-matted versions of the SAME image through the production FFA pipeline — 1.0
    means the matting error does not move the metric at all. This measures the pooling
    pipeline's sensitivity to matting errors; end-benchmark accuracy impact additionally
    needs real DINOv2 weights + the CUTE data (not available offline).

Run:  python tools/matting_eval.py            # prints the table
The committed numbers live in README.md (parity notes) and are pinned (with slack) by
tests/test_matting_quality.py.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

CATEGORIES = ("centered", "border", "low_contrast", "textured_bg")
SIZE = 128
PER_CAT = 5


def _ellipse_mask(size, cx, cy, rx, ry):
    yy, xx = np.mgrid[0:size, 0:size]
    return (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0).astype(np.uint8)


def make_fixture(seed: int = 0):
    """20 (image, gt_mask) pairs: PER_CAT per category, deterministic."""
    rng = np.random.default_rng(seed)
    out = []
    for cat in CATEGORIES:
        for i in range(PER_CAT):
            bg_color = rng.integers(10, 80, 3)
            if cat == "textured_bg":
                bg = (bg_color + rng.normal(0, 25, (SIZE, SIZE, 3))).clip(0, 255)
            else:
                bg = np.broadcast_to(bg_color, (SIZE, SIZE, 3)).astype(np.float64).copy()
            if cat == "border":
                # large close-up object spanning most of the frame edge (the carvekit-style
                # inputs the heuristic cannot handle: border statistics are object-dominated)
                cx = SIZE // 2 + int(rng.integers(-10, 10))
                cy = SIZE - 1
                rx = int(SIZE * 1.2) + int(rng.integers(-6, 6))
                ry = int(SIZE * 0.8) + int(rng.integers(-6, 6))
            else:
                cx, cy = rng.integers(40, SIZE - 40, 2)
                rx, ry = rng.integers(22, 40, 2)
            mask = _ellipse_mask(SIZE, cx, cy, rx, ry)
            if cat == "low_contrast":
                fg_color = bg_color + rng.integers(25, 45, 3)  # near the background
            else:
                fg_color = rng.integers(150, 255, 3)
            img = bg.copy()
            img[mask == 1] = fg_color + rng.normal(0, 8, 3)
            # object texture so DINOv2 features are not constant
            tex = rng.normal(0, 12, (SIZE, SIZE, 3))
            img[mask == 1] += tex[mask == 1]
            out.append((cat, Image.fromarray(img.clip(0, 255).astype(np.uint8)), mask))
    return out


def iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = float(np.logical_and(a, b).sum())
    union = float(np.logical_or(a, b).sum())
    return inter / union if union else 1.0


def grid_mask(alpha: np.ndarray, grid: int = 24) -> np.ndarray:
    """The FFA pooling's 24x24 thresholded patch mask (metrics/ffa.py:_mask_from_rgb)."""
    m = Image.fromarray((alpha > 0).astype(np.uint8) * 255).resize((grid, grid), Image.BILINEAR)
    return (np.asarray(m, np.float32) / 255.0 > 0.5).astype(np.uint8)


def gt_matting(mask):
    """Ground-truth RGBA matting callable for one fixture image."""

    def matte(image: Image.Image) -> Image.Image:
        rgb = np.asarray(image.convert("RGB"), np.uint8)
        return Image.fromarray(np.dstack([rgb, (mask * 255).astype(np.uint8)]), "RGBA")

    return matte


def evaluate(matting=None, ffa=None, seed: int = 0):
    """-> {category: {'iou': mean full-res IoU, 'grid_iou': ..., 'score_delta': ...}}.

    ``matting``: the stand-in to evaluate (None = heuristic). ``ffa``: a
    ForegroundFeatureAveraging instance used for the Crop-Feat sensitivity column (any
    weights; pass a tiny-config one in tests)."""
    from diffsim_tpu.metrics.ffa import ForegroundFeatureAveraging, heuristic_matting

    matting = matting or heuristic_matting
    results: dict[str, dict[str, list]] = {c: {"iou": [], "grid_iou": [], "delta": []}
                                           for c in CATEGORIES}
    for cat, img, gt in make_fixture(seed):
        pred_rgba = np.asarray(matting(img))
        pred = (pred_rgba[..., 3] > 0).astype(np.uint8)
        results[cat]["iou"].append(iou(pred, gt))
        results[cat]["grid_iou"].append(iou(grid_mask(pred_rgba[..., 3]), grid_mask(gt * 255)))
        if ffa is not None:
            gt_ffa_in = _prep(ffa, gt_matting(gt), img)
            pred_ffa_in = _prep(ffa, matting, img)
            # cosine between the SAME image pooled under gt vs stand-in masks
            score = float(ffa.score_batch("Crop-Feat", gt_ffa_in, pred_ffa_in)[0])
            results[cat]["delta"].append(1.0 - score)
    return {
        c: {k: float(np.mean(v)) if v else None for k, v in d.items()}
        for c, d in results.items()
    }


def _prep(ffa, matting, img):
    saved = ffa.matting
    ffa.matting = matting
    try:
        return ffa.preprocess(img)
    finally:
        ffa.matting = saved


def main():
    from diffsim_tpu.metrics.ffa import ForegroundFeatureAveraging, heuristic_matting
    from diffsim_tpu.models.dinov2 import DinoConfig
    import dataclasses

    # tiny DINOv2 (patch 14 keeps the 24x24 grid); the delta column measures pooling
    # sensitivity, which needs consistent (not pretrained) features
    ffa = ForegroundFeatureAveraging(cfg=dataclasses.replace(DinoConfig.tiny(), patch=14))
    table = evaluate(heuristic_matting, ffa)
    print(f"{'category':<14} {'mask IoU':>9} {'24x24 IoU':>10} {'1-CropFeat':>11}")
    for cat, row in table.items():
        print(f"{cat:<14} {row['iou']:>9.3f} {row['grid_iou']:>10.3f} {row['delta']:>11.4f}")


if __name__ == "__main__":
    main()
